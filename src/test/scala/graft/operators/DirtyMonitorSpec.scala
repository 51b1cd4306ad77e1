package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the null-user-key contract of the monitor folds (q107's
  * [[DataQuality.monitorFinal]] and q113's orphan rollup share it):
  * the state table holds one row per (event_type, user_id) pair
  * INCLUDING a user_id=NULL group, and the DuckDB oracles count users
  * via `count(DISTINCT user_id)`, which skips NULL — so the engine
  * fold must count the KEY (`count(user_id)`), never the state row.
  * A `count(*)`-style fold would report the NULL group as a user and
  * diverge exactly on fixtures the clean test tables never contain —
  * the null-key fixture-dependence the oracle comments warn about.
  */
class DirtyMonitorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_type", StringType, nullable = false),
    StructField("user_id", LongType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  // 3 'click' rows across TWO real users plus TWO null-user rows (the
  // null rows must fold into ONE state group and ZERO users); 'view'
  // has one real user only
  private def events = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("click", 1L, 1.5), Row("click", 1L, 2.5), Row("click", 2L, 3.0),
      Row("click", null, 10.0), Row("click", null, 20.0),
      Row("view", 7L, 0.5)),
    schema)

  test("monitor fold: a NULL user_id group contributes events but never a user") {
    val state = DataQuality.monitorState(events)
    // the state itself keeps the NULL group (its events are real and
    // must stay visible in n_events / min / max / sum)
    assert(state.filter(col("user_id").isNull).count() == 1)
    val out = DataQuality.monitorFinal(state)
      .select("event_type", "n_events", "n_users", "max_value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // 5 click events but only 2 click USERS; the null rows' values
    // still surface through the value cells
    assert(out("click") == ((5L, 2L, 20.0)), out)
    assert(out("view") == ((1L, 1L, 0.5)), out)
  }

  test("monitor fold matches the oracle's count(DISTINCT user_id) on the dirty fixture") {
    // the oracle formulation, emulated in-engine: DISTINCT over a
    // nullable key skips the NULL group in both engines
    val oracle = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val engine = DataQuality.monitorFinal(DataQuality.monitorState(events))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(engine == oracle, s"engine=$engine oracle=$oracle")
  }
}
