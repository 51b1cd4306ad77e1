package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q106: Deequ-style constraint audit. Clean sf tables must pass every
  * check; injected nulls / duplicate keys / orphan FKs must flip
  * exactly the targeted check with the exact observed ratio (single
  * IEEE division of exact counts — the cross-engine contract).
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def reportMap(df: org.apache.spark.sql.DataFrame): Map[String, (Option[Double], Int)] =
    df.collect().map(r => (r.getString(0),
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getInt(2)))).toMap

  test("clean sf tables pass all eight checks") {
    val rep = reportMap(DataQuality.auditReport(spark, dir))
    assert(rep.size == 8)
    assert(rep.values.forall(_._2 == 1), s"failing checks: ${rep.filter(_._2._2 == 0).keys}")
    assert(rep("orders.o_orderkey.uniqueness")._1.contains(1.0))
    assert(rep("lineitem.l_orderkey.ri_orders")._1.contains(1.0))
  }

  test("injected violations flip exactly the targeted checks with exact ratios") {
    val orders = Seq(
      (1L, Option(10L), 100.0),
      (2L, Option(20L), 200.0),
      (2L, None, -5.0), // dup key, null custkey, negative price
      (3L, Option(30L), 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Seq(
      (1L, 5.0, Option(10.0)),
      (2L, 99.0, Option(20.0)),   // quantity out of range
      (7L, 3.0, None))            // orphan FK, null price
      .toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val rep = reportMap(DataQuality.audit(orders, lineitem))
    assert(rep("orders.row_count") == (Some(4.0), 1))
    assert(rep("orders.o_orderkey.uniqueness") == (Some(3.0 / 4.0), 0))
    assert(rep("orders.o_custkey.completeness") == (Some(3.0 / 4.0), 0))
    assert(rep("orders.o_totalprice.non_negative") == (Some(3.0 / 4.0), 0))
    assert(rep("lineitem.row_count") == (Some(3.0), 1))
    assert(rep("lineitem.l_quantity.in_range") == (Some(2.0 / 3.0), 0))
    assert(rep("lineitem.l_extendedprice.completeness") == (Some(2.0 / 3.0), 0))
    assert(rep("lineitem.l_orderkey.ri_orders") == (Some(2.0 / 3.0), 0))
  }

  test("empty tables fail the row_count checks instead of dividing by zero") {
    val orders = Seq.empty[(Long, Option[Long], Double)]
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Seq.empty[(Long, Double, Option[Double])]
      .toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val rep = reportMap(DataQuality.audit(orders, lineitem))
    assert(rep("orders.row_count")._2 == 0)
    assert(rep("lineitem.row_count")._2 == 0)
    // ratio checks over zero rows: observed is NULL (try_divide) but
    // the verdicts (count equalities 0 = 0) hold — an empty table
    // violates no per-row constraint
    assert(rep("lineitem.l_orderkey.ri_orders") == (None, 1))
    assert(rep("orders.o_orderkey.uniqueness") == (None, 1))
  }

  test("q119 skew report: exact ratios and deterministic heavy key on the sf tables") {
    val rep = DataQuality.skewReport(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep.size == 3)
    rep.values.foreach { r =>
      val (nKeys, nRows, maxCnt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKeys > 0 && nRows >= nKeys && maxCnt >= 1)
      // mean and skew re-derive exactly from the counts
      assert(r.getDouble(5) == nRows.toDouble / nKeys.toDouble)
      assert(r.getDouble(6) == maxCnt.toDouble / (nRows.toDouble / nKeys.toDouble))
      assert(r.getDouble(6) >= 1.0)
    }
    // the heavy key really is a max-count key (spot check on events)
    val ev = graft.Tables.events(spark, dir).groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    val heavy = rep("events.user_id").getLong(4)
    assert(ev(heavy) == ev.values.max)
    // tie-break: among max-count keys, the LARGEST key id wins
    val tied = ev.filter(_._2 == ev.values.max).keys.max
    assert(heavy == tied)
  }

  test("q107 monitor: two-level state fold equals the direct batch aggregate") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value"))
    val folded = DataQuality.monitorFinal(DataQuality.monitorState(ev))
    val direct = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"),
      sum(floor(col("value") * lit(1e6)).cast("long")).as("sum_value_micro"))
    assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty)
  }
}
