package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** q132/q133 semantics on hand-checkable fixtures. */
class FunnelScd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("funnel is strictly ordered: a click BEFORE the first view never converts") {
    // user 1: view(10:10) -> click(10:20) -> purchase(10:30): full path
    // user 2: click(10:05) BEFORE view(10:10): view counts, click doesn't
    // user 3: view only
    // user 4: no view at all: enters no step
    val ev = Seq(
      (1L, "view", t(10)), (1L, "click", t(20)), (1L, "purchase", t(30)),
      (2L, "click", t(5)), (2L, "view", t(10)),
      (3L, "view", t(15)),
      (4L, "purchase", t(1)))
      .toDF("user_id", "event_type", "ts")
    // replicate the operator core on the synthetic frame (the dir-bound
    // entry point reads the fixture tables; the chain is identical)
    val step1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val step2 = ev.filter(col("event_type") === "click")
      .join(step1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val step3 = ev.filter(col("event_type") === "purchase")
      .join(step2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    assert(step1.count() == 3) // users 1, 2, 3
    assert(step2.as[(Long, Timestamp)].collect().map(_._1).toSet == Set(1L))
    assert(step3.as[(Long, Timestamp)].collect().map(_._1).toSet == Set(1L))
  }

  test("scd2 history: intervals tile each user's timeline; exactly one open row per user") {
    val dir = "/root/testdata/sf0.001"
    val h = Analytics.scd2History(spark, dir)
      .select("user_id", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(h.nonEmpty)
    val byUser = h.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      // exactly one current (open) row per user
      assert(rows.count(_._4) == 1, s"user $u open rows")
      // sorted by valid_from, each close matches the next open — the
      // tiling property that makes point-in-time lookups exact
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"user $u gap: $a -> $b")
        case _ => ()
      }
      assert(sorted.last._3.isEmpty)
    }
  }

  test("funnel counts are monotone non-increasing across steps on the fixture tables") {
    val out = Analytics.funnel(spark, "/root/testdata/sf0.001")
      .select("step", "n_users").as[(String, Long)].collect().toMap
    assert(out.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(out("1_view") >= out("2_click") && out("2_click") >= out("3_purchase"),
      s"funnel must narrow: $out")
  }
}
