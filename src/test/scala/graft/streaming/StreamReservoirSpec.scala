package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The bounded-list reservoir state contract (q211's core): state
  * holds EXACTLY the k largest-key items per stratum, converges to the
  * batch top-k under any batching, and never grows past k.
  */
class StreamReservoirSpec extends SparkSpec {
  import spark.implicits._
  import StreamReservoir._

  private var n = 0
  private def run(batches: Seq[Seq[DocKeyed]], k: Int): Seq[ResSnapshot] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocKeyed]
    n += 1
    val name = s"res_out_$n"
    val q = reservoirTopK(input.toDS(), k)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[ResSnapshot].collect().toSeq
  }

  private def d(id: Long, key: Double, src: String = "a") =
    DocKeyed(src, id, 0.5, key)

  test("state is capped at k and keeps the largest keys across batches") {
    val snaps = run(Seq(
      Seq(d(1, -1.0), d(2, -5.0), d(3, -3.0)),
      Seq(d(4, -0.5), d(5, -9.0))), k = 2)
    val last = snaps.filter(_.source == "a").maxBy(_.rev)
    // top-2 keys overall: -0.5 (id 4), -1.0 (id 1); id 2/3/5 evicted
    assert(last.items.map(_.doc_id) == Seq(4L, 1L))
    assert(snaps.forall(_.items.size <= 2))
  }

  test("any batching yields the same converged sample (order independence)") {
    val all = Seq(d(1, -2.0), d(2, -1.0), d(3, -4.0), d(4, -0.1), d(5, -3.0))
    val a = run(Seq(all), k = 3).maxBy(_.rev).items
    val b = run(all.reverse.map(Seq(_)), k = 3).maxBy(_.rev).items
    assert(a == b && a.map(_.doc_id) == Seq(4L, 2L, 1L))
  }

  test("strata are independent reservoirs") {
    val snaps = run(Seq(Seq(d(1, -1.0, "a"), d(2, -2.0, "b"), d(3, -0.5, "b"))), k = 1)
    val bySrc = snaps.groupBy(_.source).map { case (s, v) => s -> v.maxBy(_.rev).items.map(_.doc_id) }
    assert(bySrc == Map("a" -> Seq(1L), "b" -> Seq(3L)))
  }

  test("key ties break by doc_id (deterministic sample)") {
    val last = run(Seq(Seq(d(9, -1.0), d(4, -1.0), d(7, -1.0))), k = 2).maxBy(_.rev)
    assert(last.items.map(_.doc_id) == Seq(4L, 7L))
  }

  // ---- windowed evicting reservoir (q281) ----

  private val W = 1000000000L // 1 s windows
  private def ed(typ: String, tNs: Long, id: Long, draw: Long): EvDraw =
    EvDraw(typ, tNs / W, id, draw, new java.sql.Timestamp(tNs / 1000000L))

  private def runWin(batches: Seq[Seq[EvDraw]], k: Int): (Seq[WinResEmit], Long) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EvDraw]
    n += 1
    val name = s"winres_out_$n"
    val q = windowedReservoirEvicting(input.toDS(), k, W)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rows = try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      (spark.table(name).as[WinResEmit].collect().toSeq,
        q.lastProgress.stateOperators(0).numRowsTotal)
    } finally q.stop()
    rows
  }

  test("windowed reservoir: per-window top-k, closed windows EVICTED, " +
      "compacted output = batch per-window rank (q281)") {
    // window 0 gets 3 events (k=2 keeps draws 90, 50); window 5 opens
    // later — the watermark at t=5.5 s is past window 0's end, so its
    // state must be physically gone while its emissions survive
    val (emits, stateRows) = runWin(Seq(
      Seq(ed("a", 100000000L, 1L, 50L), ed("a", 200000000L, 2L, 90L),
        ed("a", 300000000L, 3L, 10L)),
      Seq(ed("a", 5500000000L, 4L, 70L))), k = 2)
    assert(stateRows == 1L,
      "window 0 closed by the watermark must be evicted from the store")
    val compacted = emits.groupBy(e => (e.event_type, e.win))
      .map { case (key, v) => key -> v.maxBy(_.rev).ids.toSeq }
    assert(compacted == Map(("a", 0L) -> Seq(2L, 1L), ("a", 5L) -> Seq(4L)),
      "compacted (max-rev) snapshots must equal the batch per-window top-k")
  }

  test("windowed reservoir: a late member of an EVICTED window can " +
      "never restart the revision counter — Spark drops it before the " +
      "state function (and the in-function guard backstops)") {
    // the r16 advice-1 hazard, pinned at its actual first line of
    // defense: with EventTimeTimeout, FlatMapGroupsWithStateExec
    // filters rows older than the watermark BEFORE the state function,
    // so a late window-0 member after eviction is dropped — no rev-1
    // partial snapshot can ever reach the max_by(ids, rev) serving
    // compaction. (The in-function watermark guard remains as a second
    // line for any future timeout-mode change; this test proves the
    // scenario is output-invisible end-to-end.)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EvDraw]
    val q = windowedReservoirEvicting(input.toDS(), 2, W)
      .writeStream.format("memory").queryName("winres_late")
      .outputMode("append").start()
    try {
      input.addData(Seq(ed("a", 100000000L, 1L, 50L), ed("a", 5500000000L, 2L, 10L)))
      q.processAllAvailable() // watermark -> 5.5 s
      input.addData(Seq(ed("a", 5600000000L, 3L, 20L)))
      q.processAllAvailable() // timeout sweep: window 0 evicted
      input.addData(Seq(ed("a", 200000000L, 4L, 90L))) // late window-0 member
      q.processAllAvailable()
      val emits = spark.table("winres_late").as[WinResEmit].collect().toSeq
      val win0 = emits.filter(_.win == 0L)
      // exactly the pre-eviction snapshot: rev 1 with id 1 — the late
      // id 4 never surfaces, and no post-eviction restart emits
      assert(win0.map(_.rev) == Seq(1L) && win0.head.ids.toSeq == Seq(1L),
        s"late member must be invisible to window 0's history: $win0")
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L,
        "the evicted window must not be re-created by the late member")
    } finally q.stop()
  }

  test("windowed reservoir: (type, window) keys are independent and " +
      "cross-batch merge keeps the largest draws") {
    val (emits, _) = runWin(Seq(
      Seq(ed("a", 100000000L, 1L, 30L), ed("b", 100000000L, 2L, 80L)),
      Seq(ed("a", 200000000L, 3L, 60L), ed("a", 300000000L, 4L, 5L))), k = 1)
    val compacted = emits.groupBy(e => (e.event_type, e.win))
      .map { case (key, v) => key -> v.maxBy(_.rev).ids.toSeq }
    assert(compacted == Map(("a", 0L) -> Seq(3L), ("b", 0L) -> Seq(2L)),
      "doc 3's draw 60 must displace doc 1's 30 within (a, 0); b untouched")
  }
}
