package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The stateful per-key LAG contract (q207's core): one state row per
  * key carrying the last event, each arrival after the first emits
  * exactly one (previous, current) pair — including ACROSS micro-batch
  * boundaries, which is the part a batch lead() cannot give a stream
  * and the whole reason the state exists.
  */
class StreamSequenceSpec extends SparkSpec {
  import spark.implicits._
  import StreamSequence._

  private var n = 0
  private def run(batches: Seq[Seq[Ev]]): Seq[Transition] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    n += 1
    val name = s"seq_out_$n"
    val q = transitions(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[Transition].collect().toSeq
  }

  test("chains across batch boundaries: state carries the last event") {
    val got = run(Seq(
      Seq(Ev(1L, 10L, 1L, "view"), Ev(1L, 20L, 2L, "click")),
      Seq(Ev(1L, 30L, 3L, "purchase")), // chains from batch-1's click
      Seq(Ev(1L, 40L, 4L, "view"))))
    assert(got.sortBy(_.nxt) == Seq(
      Transition(1L, "view", "click"), Transition(1L, "click", "purchase"),
      Transition(1L, "purchase", "view")).sortBy(_.nxt))
  }

  test("intra-batch arrival order is irrelevant (sorted by ts, event_id)") {
    val shuffled = run(Seq(Seq(
      Ev(7L, 30L, 3L, "c"), Ev(7L, 10L, 1L, "a"), Ev(7L, 20L, 2L, "b"))))
    assert(shuffled == Seq(Transition(7L, "a", "b"), Transition(7L, "b", "c")))
  }

  test("keys are independent; a single-event key emits nothing") {
    val got = run(Seq(
      Seq(Ev(1L, 10L, 1L, "x"), Ev(2L, 10L, 2L, "y")),
      Seq(Ev(1L, 20L, 3L, "z"))))
    assert(got == Seq(Transition(1L, "x", "z")))
  }

  test("ties on ts break by event_id deterministically") {
    val got = run(Seq(Seq(
      Ev(5L, 10L, 2L, "late"), Ev(5L, 10L, 1L, "early"))))
    assert(got == Seq(Transition(5L, "early", "late")))
  }

  test("packed: the cursor carries the running token total across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = packed(input.toDS())
      .writeStream.format("memory").queryName("pack_out").outputMode("append").start()
    try {
      // batch 1: two sources interleaved (and out of order within the
      // batch — the sort must fix it)
      input.addData(Seq(Doc("b", 4L, 10L), Doc("a", 1L, 5L), Doc("a", 2L, 7L)))
      q.processAllAvailable()
      // batch 2: continuations of both sources — starts must resume
      // from the carried cursor, not from zero
      input.addData(Seq(Doc("a", 3L, 2L), Doc("b", 5L, 1L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("pack_out").as[PackedDoc].collect()
      .map(p => (p.source, p.doc_id) -> p.start).toMap
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 5L, ("a", 3L) -> 12L,
      ("b", 4L) -> 0L, ("b", 5L) -> 10L))
  }

  test("funnelStages: the stage machine advances across batches and ignores out-of-order stages") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = funnelStages(input.toDS())
      .writeStream.format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      // user 1: view in batch 1; user 2: click FIRST (no view yet — must
      // not advance past first-seen); user 3: view+click same µs (click
      // not strictly later — stays at stage 1)
      input.addData(Seq(Ev(1L, 1000L, 1L, "view"), Ev(2L, 1000L, 2L, "click"),
        Ev(3L, 5000L, 3L, "view"), Ev(3L, 5000L, 4L, "click")))
      q.processAllAvailable()
      // batch 2: user 1 clicks later then purchases later — full funnel
      // ACROSS batches; user 2 finally views (stage 1 only)
      input.addData(Seq(Ev(1L, 2000L, 5L, "click"), Ev(1L, 3000L, 6L, "purchase"),
        Ev(2L, 9000L, 7L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_out").as[StageReached].collect()
      .groupBy(_.user_id).view.mapValues(_.map(_.stage).toSet).toMap
    assert(got(1L) == Set(0, 1, 2, 3))
    assert(got(2L) == Set(0, 1)) // click-before-view never advanced it
    assert(got(3L) == Set(0, 1)) // same-µs click is not strictly later
  }

  private def evw(uid: Long, tNs: Long, id: Long, typ: String): EvW =
    EvW(uid, tNs, id, typ, new java.sql.Timestamp(tNs / 1000000L))

  test("funnelStagesEvicting: session-gap reset, physical eviction, and the " +
      "evicted-key re-arrival contract") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 1000000000L // 1 s horizon
    val input = MemoryStream[EvW]
    val q = funnelStagesEvicting(input.toDS(), H)
      .writeStream.format("memory").queryName("funnel_evict_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 completes view+click; user 2 views
      input.addData(Seq(evw(1L, 100000000L, 1L, "view"),
        evw(1L, 200000000L, 2L, "click"), evw(2L, 200000000L, 3L, "view")))
      q.processAllAvailable()
      // batch 2 at t=5 s: watermark jumps past user 1's TTL (0.2+1 s)
      // → user 1's state is physically REMOVED; user 2's own arrival
      // has gap 4.8 s > 1 s → in-function reset, a second session
      input.addData(Seq(evw(2L, 5000000000L, 4L, "view")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L,
        "user 1 idle past the horizon must be evicted from the store")
      // batch 3: the EVICTED user re-arrives — fresh state must open a
      // new session and run the full cascade (the re-arrival contract:
      // identical emissions to what the gap reset would have produced)
      input.addData(Seq(evw(1L, 6000000000L, 5L, "view"),
        evw(1L, 6100000000L, 6L, "click"), evw(1L, 6200000000L, 7L, "purchase")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_evict_out").as[StageReached].collect()
      .groupBy(_.user_id).view
      .mapValues(_.groupBy(_.stage).view.mapValues(_.length).toMap).toMap
    // user 1: session 1 = {0,1,2}, session 2 (post-eviction) = {0,1,2,3}
    assert(got(1L) == Map(0 -> 2, 1 -> 2, 2 -> 2, 3 -> 1))
    // user 2: two sessions, each reaching the view stage only
    assert(got(2L) == Map(0 -> 2, 1 -> 2))
  }

  test("funnelStagesEvicting: an intra-batch gap resets the session without " +
      "any eviction involved (the deterministic semantic)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 1000000000L
    val input = MemoryStream[EvW]
    val q = funnelStagesEvicting(input.toDS(), H)
      .writeStream.format("memory").queryName("funnel_gap_out")
      .outputMode("append").start()
    try {
      // t starts at 10 s, NOT 0: a 0-ms event time sits exactly on the
      // stream's initial watermark and is dropped as late before the
      // state function ever sees it
      input.addData(Seq(evw(9L, 10000000000L, 1L, "view"),
        evw(9L, 12000000000L, 2L, "view"),   // gap 2 s > 1 s → new session
        evw(9L, 12500000000L, 3L, "click"))) // same session, strictly later
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_gap_out").as[StageReached].collect()
      .filter(_.user_id == 9L).map(_.stage).sorted.toSeq
    assert(got == Seq(0, 0, 1, 1, 2))
  }

  test("skew guard: one source carrying ~the whole batch still packs " +
      "correctly (hot-key slice materializes, output unchanged)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hot = (0 until 10000).map(i => Doc("hot", i.toLong, (i % 7 + 1).toLong))
    val cold = Seq(Doc("cold", 0L, 5L))
    val input = MemoryStream[Doc]
    val q = packed(input.toDS())
      .writeStream.format("memory").queryName("packed_skew_out")
      .outputMode("append").start()
    try { input.addData(hot ++ cold); q.processAllAvailable() } finally q.stop()
    val got = spark.table("packed_skew_out").as[PackedDoc].collect()
    assert(got.length == 10001)
    // the cursor law holds on the hot key: start(i) = sum of n_tok before i
    val hotGot = got.filter(_.source == "hot").sortBy(_.doc_id)
    var cum = 0L
    for (d <- hotGot) { assert(d.start == cum, s"doc ${d.doc_id}"); cum += d.n_tok }
    assert(got.find(_.source == "cold").get.start == 0L)
  }

  test("topkLeaderboard: cross-batch displacement with versioned emissions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SrcDoc]
    val q = topkLeaderboard(input.toDS(), 2)
      .writeStream.format("memory").queryName("topk_out").outputMode("append").start()
    try {
      input.addData(Seq(SrcDoc("a", 1L, 10L), SrcDoc("a", 2L, 20L), SrcDoc("a", 3L, 5L)))
      q.processAllAvailable()
      input.addData(Seq(SrcDoc("a", 4L, 15L))) // displaces doc 1
      q.processAllAvailable()
      input.addData(Seq(SrcDoc("a", 5L, 1L)))  // too small — board unchanged
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("topk_out").as[TopkEmit].collect().sortBy(_.ver)
    assert(got.map(_.ver).toSeq == Seq(1L, 2L, 3L))
    assert(got(0).ids.toSeq == Seq(2L, 1L) && got(0).ncs.toSeq == Seq(20L, 10L))
    assert(got(1).ids.toSeq == Seq(2L, 4L) && got(1).ncs.toSeq == Seq(20L, 15L))
    // a displaced doc never resurrects; the compacted (max-ver) board
    // is the batch top-2 over everything seen
    assert(got(2).ids.toSeq == Seq(2L, 4L))
  }

  test("transitionsEvicting: horizon guard, physical eviction, and the " +
      "evicted-key re-arrival contract (q272)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 1000000000L // 1 s horizon
    val input = MemoryStream[EvW]
    val q = transitionsEvicting(input.toDS(), H)
      .writeStream.format("memory").queryName("trans_evict_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 chains a→b (gap 0.1 s); user 2 seeds one event
      input.addData(Seq(evw(1L, 100000000L, 1L, "a"),
        evw(1L, 200000000L, 2L, "b"), evw(2L, 200000000L, 3L, "x")))
      q.processAllAvailable()
      // batch 2 at t=5 s: watermark passes user 1's TTL (0.2+1 s) →
      // state evicted; user 2's own arrival has gap 4.8 s > 1 s → the
      // horizon guard drops the would-be x→y pair (no cross-gap
      // transition), state replaced in place
      input.addData(Seq(evw(2L, 5000000000L, 4L, "y")))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L,
        "user 1 idle past the horizon must be evicted from the store")
      // batch 3: the EVICTED user re-arrives — fresh state emits
      // nothing for the first event (exactly what the horizon guard
      // would have produced had the state survived), then chains
      input.addData(Seq(evw(1L, 6000000000L, 5L, "c"),
        evw(1L, 6100000000L, 6L, "d")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans_evict_out").as[Transition].collect().toSet
    assert(got == Set(Transition(1L, "a", "b"), Transition(1L, "c", "d")),
      "no transition may span a gap > horizon, evicted or not")
  }

  test("transitionsEvicting: an intra-batch gap drops the pair without " +
      "any eviction involved (the deterministic semantic)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 1000000000L
    val input = MemoryStream[EvW]
    val q = transitionsEvicting(input.toDS(), H)
      .writeStream.format("memory").queryName("trans_gap_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(evw(9L, 10000000000L, 1L, "a"),
        evw(9L, 12000000000L, 2L, "b"),   // gap 2 s > 1 s → dropped
        evw(9L, 12500000000L, 3L, "c"))) // gap 0.5 s → kept
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans_gap_out").as[Transition].collect().toSeq
    assert(got == Seq(Transition(9L, "b", "c")))
  }

  private def evvw(uid: Long, tNs: Long, id: Long, typ: String,
      v: java.lang.Double): EvVW =
    EvVW(uid, tNs, id, typ, v, new java.sql.Timestamp(tNs / 1000000L))

  test("closedVersionsEvicting: only within-horizon successors close a " +
      "version; eviction and the gap guard agree (q273)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 1000000000L
    val input = MemoryStream[EvVW]
    val q = closedVersionsEvicting(input.toDS(), H)
      .writeStream.format("memory").queryName("scd2_evict_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(evvw(1L, 100000000L, 1L, "a", 1.5),
        evvw(1L, 200000000L, 2L, "b", null), evvw(2L, 200000000L, 3L, "x", 9.0)))
      q.processAllAvailable()
      // t=5 s: user 1 evicted (its open "b" version is never emitted —
      // it is the upsert view's latest row, archival policy's problem);
      // user 2's stale "x" is discarded by the gap guard, same outcome
      input.addData(Seq(evvw(2L, 5000000000L, 4L, "y", 2.0)))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L)
      // the evicted user re-arrives: fresh chain, closes within-horizon
      input.addData(Seq(evvw(1L, 6000000000L, 5L, "c", 3.0),
        evvw(1L, 6100000000L, 6L, "d", 4.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scd2_evict_out").as[ClosedVersion].collect()
      .sortBy(_.valid_from_us)
    assert(got.toSeq == Seq(
      ClosedVersion(1L, 1L, "a", 1.5, 100000L, 200000L),
      ClosedVersion(1L, 5L, "c", 3.0, 6000000L, 6100000L)),
      "cross-gap versions must not close; NULL value survives boxing")
  }

  test("closedVersions: arrivals close the previous version across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EvV]
    val q = closedVersions(input.toDS())
      .writeStream.format("memory").queryName("scd2_out").outputMode("append").start()
    try {
      input.addData(Seq(EvV(1L, 10000L, 1L, "a", 1.5),
        EvV(1L, 20000L, 2L, "b", null)))
      q.processAllAvailable()
      input.addData(Seq(EvV(1L, 30000L, 3L, "c", 2.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scd2_out").as[ClosedVersion].collect().sortBy(_.valid_from_us)
    // version "b" closes at batch-2's arrival — the cross-batch case;
    // "c" stays open (in state), never emitted; NULL value survives boxing
    assert(got.toSeq == Seq(
      ClosedVersion(1L, 1L, "a", 1.5, 10L, 20L),
      ClosedVersion(1L, 2L, "b", null, 20L, 30L)))
  }
}
