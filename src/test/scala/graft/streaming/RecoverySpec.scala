package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Checkpoint-recovery contract: a stateful streaming query killed
  * mid-run and restarted on the SAME checkpoint + file sink resumes
  * where it stopped and delivers each result exactly once — the
  * property that makes every graft streaming operator production-safe
  * on a real cluster (executors die; the checkpoint + sink commit log
  * are the recovery story). The file sink's `_spark_metadata` commit
  * log is what a read sees, so a replayed batch can never surface
  * twice; the dedup STATE also survives the restart, so a duplicate
  * arriving after recovery is still suppressed by a key first seen
  * before the kill.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("kill + restart on the same checkpoint resumes exactly-once (state survives)") {
    val base = java.nio.file.Files.createTempDirectory("graft_recovery").toString
    val staged = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    new java.io.File(staged).mkdirs()
    // four single-file batches with duplicates straddling the kill
    // point (id 1 recurs in batch 3, id 2 in batch 2): whichever batch
    // the stop lands after, every duplicate that arrives post-restart
    // must be suppressed by state that crossed the restart — exactly-
    // once holds only if BOTH the offsets and the dedup state recover
    val batches = Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(1L, 4L), Seq(4L, 5L))
    batches.zipWithIndex.foreach { case (ids, b) =>
      val sub = s"$base/stage_$b"
      ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(sub)
      val f = new java.io.File(sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(staged, f"batch-$b%02d.parquet")
      java.nio.file.Files.move(f.toPath, dest.toPath)
      graft.Fs.stampMtime(dest, (System.currentTimeMillis() / 60000L) * 60000L + b * 60000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .dropDuplicates("id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: stop after exactly two committed batches
    val twoBatches = new java.util.concurrent.CountDownLatch(2)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) twoBatches.countDown()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q1 = start()
    try assert(twoBatches.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "first run never committed two batches")
    finally { q1.stop(); spark.streams.removeListener(listener) }

    // run 2: SAME checkpoint + sink — must pick up at batch 3
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    // each id exactly once — no replay duplicates from the restart, and
    // the post-restart duplicates (1 in batch 3, seen in batch 1 before
    // the kill) suppressed by the RECOVERED state
    assert(got == Seq(1L, 2L, 3L, 4L, 5L), s"expected exactly-once ids, got $got")
    graft.Fs.rmTree(base)
  }

  test("windowed evicting reservoir (q281): kill + restart recovers state, " +
      "watermark, and revision continuity — compacted output = batch rank") {
    import StreamReservoir._
    val W = 1000000000L // 1 s windows
    def ed(win: Long, id: Long, draw: Long, tNs: Long) =
      EvDraw("a", win, id, draw, new java.sql.Timestamp(tNs / 1000000L))
    val base = java.nio.file.Files.createTempDirectory("graft_recovery_winres").toString
    val staged = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    new java.io.File(staged).mkdirs()
    // the kill lands after batch 1: window 0's post-restart emission
    // (rev 3) can only rank id 2's draw 90 if the pre-kill STATE
    // crossed the restart; batch 2 also opens window 5, whose
    // watermark closes (evicts) window 0 — recovery must restore the
    // watermark too, or the eviction timing would drift
    val batches = Seq(
      Seq(ed(0L, 1L, 50L, 100000000L), ed(0L, 2L, 90L, 200000000L)),
      Seq(ed(0L, 3L, 70L, 300000000L)),
      Seq(ed(0L, 4L, 80L, 400000000L), ed(5L, 5L, 10L, 5500000000L)),
      Seq(ed(5L, 6L, 40L, 5600000000L)))
    batches.zipWithIndex.foreach { case (evs, b) =>
      val sub = s"$base/stage_$b"
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(sub)
      val f = new java.io.File(sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(staged, f"batch-$b%02d.parquet")
      java.nio.file.Files.move(f.toPath, dest.toPath)
      graft.Fs.stampMtime(dest, (System.currentTimeMillis() / 60000L) * 60000L + b * 60000L)
    }
    val schema = Seq.empty[EvDraw].toDS().schema
    def start() = windowedReservoirEvicting(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged).as[EvDraw], 2, W)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val twoBatches = new java.util.concurrent.CountDownLatch(2)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) twoBatches.countDown()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q1 = start()
    try assert(twoBatches.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "first run never committed two batches")
    finally { q1.stop(); spark.streams.removeListener(listener) }

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val emits = spark.read.parquet(out).as[WinResEmit].collect().toSeq
    val compacted = emits.groupBy(e => (e.event_type, e.win))
      .map { case (key, v) => key -> v.maxBy(_.rev).ids.toSeq }
    assert(compacted == Map(("a", 0L) -> Seq(2L, 4L), ("a", 5L) -> Seq(6L, 5L)),
      s"compacted post-recovery output must equal the batch per-window rank: $compacted")
    // revision continuity: each key's revs are exactly 1..n with no
    // duplicate — a replayed batch surfacing twice would break this
    // (the file sink's commit log is the exactly-once half; the
    // recovered state's rev counter is the continuity half)
    for (((_, win), v) <- emits.groupBy(e => (e.event_type, e.win)))
      assert(v.map(_.rev).sorted == (1L to v.length).toSeq,
        s"window $win revs must be contiguous and duplicate-free: ${v.map(_.rev).sorted}")
    graft.Fs.rmTree(base)
  }
}
