package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Pins q142's evicting RI-orphan contract: only rows that fail the
  * registry lookup (including NULL FKs — they match nothing) reach the
  * windowed state; a (window, type, user) orphan cell emits exactly
  * once when the watermark passes its window end and its state drops
  * (state = OPEN windows' orphan entities, never the full grid); the
  * fold keeps q113's NULL-user rule (orphan events count, orphan users
  * don't).
  */
class OrphanMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("orphan monitor: anti-join gate, emit-once, state evicted to open windows") {
    implicit val sqlCtx = spark.sqlContext
    val active = Seq(1L, 2L).toDF("c_custkey")
    val input = MemoryStream[(Timestamp, String, java.lang.Long)]
    val q = DataQuality.windowedOrphanState(
        input.toDS().toDF("ts", "event_type", "user_id"), active)
      .writeStream.format("memory").queryName("om_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "a", java.lang.Long.valueOf(1L)), // active: filtered
        (ts("2024-01-01 10:10:00"), "a", java.lang.Long.valueOf(3L)), // orphan
        (ts("2024-01-01 10:20:00"), "a", java.lang.Long.valueOf(3L)), // orphan (same cell)
        (ts("2024-01-01 10:25:00"), "a", null))                       // NULL FK: orphan event
      q.processAllAvailable()
      // watermark still inside the 10:00 window: nothing emitted; state
      // holds ONLY the open window's orphan cells — the active user's
      // row never entered state at all
      assert(spark.table("om_out").count() == 0)
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 2)
      // the watermark-advancing row is itself an orphan (it must
      // survive the anti join to reach the watermark node — the q142
      // sentinel-placement lesson)
      input.addData((ts("2024-01-01 11:45:00"), "a", java.lang.Long.valueOf(99L)))
      q.processAllAvailable()
      assert(spark.table("om_out").count() == 2)
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1)
      val folded = DataQuality.windowedOrphanFinal(spark.table("om_out"))
        .as[(String, String, Long, Long)].collect().toSeq
      // 3 orphan events (two user-3 + the NULL), but only ONE orphan user
      assert(folded == Seq(("2024-01-01 10", "a", 3L, 1L)))
    } finally q.stop()
  }
}
