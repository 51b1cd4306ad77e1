package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest preceding right, null before first right, tie goes to max tiebreak") {
    val left = Seq(
      (1L, 100L, 5L),   // before any right for key 100 → nulls
      (2L, 100L, 15L),  // after r1 (t=10) → picks r1
      (3L, 100L, 20L),  // at exactly t=20 (two rights tie) → max tiebreak wins
      (4L, 100L, 99L),  // far after → still the t=20 winner
      (5L, 200L, 50L)   // other key, no rights at all → nulls
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (100L, 10L, 1L, "r1"),
      (100L, 20L, 2L, "r2a"),
      (100L, 20L, 3L, "r2b")
    ).toDF("rk", "rt", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, leftKey = "k", rightKey = "rk",
        leftTime = col("t"), rightTime = col("rt"),
        rightPayload = Seq("rid", "rv"), rightTiebreak = col("rid"))
      .select("event_id", "rid", "rv")
      .as[(Long, Option[Long], Option[String])].collect().toMap2
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(1L), Some("r1"))))
    assert(out(3L) == ((Some(3L), Some("r2b"))))
    assert(out(4L) == ((Some(3L), Some("r2b"))))
    assert(out(5L) == ((None, None)))
  }

  test("a right row with a NULL payload field carries the null as a unit (no torn rows)") {
    val left = Seq((1L, 100L, 30L)).toDF("event_id", "k", "t")
    val right = Seq(
      (100L, 10L, 1L, Some("r1")),
      (100L, 20L, 2L, None: Option[String]) // newer right with NULL rv
    ).toDF("rk", "rt", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, leftKey = "k", rightKey = "rk",
        leftTime = col("t"), rightTime = col("rt"),
        rightPayload = Seq("rid", "rv"), rightTiebreak = col("rid"))
      .select("rid", "rv").as[(Option[Long], Option[String])].collect().head
    // must be (2, null) from the newest right — not (2, "r1") mixing rows
    assert(out == ((Some(2L), None)))
  }

  private implicit class TupleOps(rows: Array[(Long, Option[Long], Option[String])]) {
    def toMap2: Map[Long, (Option[Long], Option[String])] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
