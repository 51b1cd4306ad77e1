package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Pins q127's evicting contract: a (window, type, user) metric row
  * emits exactly once when the watermark passes its window end, its
  * state drops (state rows track OPEN windows, not the entity grid),
  * and the fold over the emitted pairs equals the batch monitor math —
  * including the NULL-user rule (events count, users don't).
  */
class WindowedMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed monitor: emit-once on watermark pass, state evicted to open windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, java.lang.Long, java.lang.Double)]
    val q = DataQuality.windowedMonitorState(
        input.toDS().toDF("ts", "event_type", "user_id", "value"))
      .writeStream.format("memory").queryName("wm_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "a", java.lang.Long.valueOf(1L), java.lang.Double.valueOf(1.5)),
        (ts("2024-01-01 10:20:00"), "a", java.lang.Long.valueOf(1L), java.lang.Double.valueOf(2.5)),
        (ts("2024-01-01 10:25:00"), "a", null, java.lang.Double.valueOf(10.0)),
        (ts("2024-01-01 10:40:00"), "a", java.lang.Long.valueOf(2L), java.lang.Double.valueOf(3.0)))
      q.processAllAvailable()
      // watermark still inside the 10:00 window: nothing emitted, state
      // holds the open window's 3 (type, user) groups
      assert(spark.table("wm_out").count() == 0)
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 3)
      // advance the watermark past the 10:00 window end (11:45 - 30 min)
      input.addData((ts("2024-01-01 11:45:00"), "a", java.lang.Long.valueOf(9L), java.lang.Double.valueOf(0.0)))
      q.processAllAvailable()
      // the finalized pairs emitted once; their state rows DROPPED —
      // only the open 11:00 window's single group remains
      assert(spark.table("wm_out").count() == 3)
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1)
      val folded = DataQuality.windowedMonitorFinal(spark.table("wm_out"))
        .as[(String, String, Long, Long, Double, Double, Long)].collect().toSeq
      // 4 events but 2 USERS (the null-user pair contributes events and
      // value cells, never a user); micro-unit sum is exact
      assert(folded == Seq(("2024-01-01 10", "a", 4L, 2L, 1.5, 10.0, 17000000L)))
    } finally q.stop()
  }
}
