package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Pins q146's evicting contract: a (window, i, pos) counter cell
  * emits exactly once when the watermark passes its window end and its
  * state drops (state = open windows' cells only), and the emitted
  * grid equals the batch windowed grid — sum-merge batching
  * independence.
  */
class WindowedCmsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed CMS: emit-once on watermark pass, state evicted to open windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, java.lang.Long)]
    val q = Sketches.cmsWindowedGrid(input.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("wcms_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), java.lang.Long.valueOf(1L)),
        (ts("2024-01-01 10:20:00"), java.lang.Long.valueOf(1L)),
        (ts("2024-01-01 10:40:00"), java.lang.Long.valueOf(2L)))
      q.processAllAvailable()
      // still inside the 10:00 window: nothing emitted; state = the
      // open window's cells — 2 distinct users × d=4 rows (hash
      // collisions within a row would only shrink this)
      assert(spark.table("wcms_out").count() == 0)
      val open = q.lastProgress.stateOperators(0).numRowsTotal
      assert(open > 0 && open <= 8, s"open-window cells: $open")
      input.addData((ts("2024-01-01 11:45:00"), java.lang.Long.valueOf(9L)))
      q.processAllAvailable()
      // the 10:00 window's cells emitted once and DROPPED
      val emitted = spark.table("wcms_out")
      assert(emitted.count() == open)
      assert(q.lastProgress.stateOperators(0).numRowsTotal < open + 8)
      // emitted grid ≡ the batch derivation over the same rows
      val batch = Sketches.cmsWindowedGrid(
        Seq((ts("2024-01-01 10:05:00"), 1L), (ts("2024-01-01 10:20:00"), 1L),
          (ts("2024-01-01 10:40:00"), 2L)).toDF("ts", "user_id"))
        .collect().map(_.toSeq).toSet
      assert(emitted.collect().map(_.toSeq).toSet == batch)
    } finally q.stop()
  }
}
