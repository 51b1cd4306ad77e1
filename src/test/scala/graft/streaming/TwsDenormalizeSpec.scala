package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState core must reproduce the flatMapGroupsWithState
  * core's semantics exactly (the algorithm is shared; these tests pin
  * that the RocksDB-backed state wiring around it behaves identically).
  */
class TwsDenormalizeSpec extends SparkSpec {
  import spark.implicits._

  private var tableId = 0
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Feed batches through the transformWithState join on RocksDB. */
  private def run(joinType: String)(batches: Seq[IndexRecord]*): Seq[JoinedRecord] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val input = MemoryStream[IndexRecord]
      tableId += 1
      val name = s"tws_out_$tableId"
      val q = TwsDenormalize.joined(input.toDS(), joinType)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[JoinedRecord].collect().sortBy(_.seq).toSeq
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def L(fk: String, key: String, v: String, seq: Long) =
    IndexRecord(fk, isLeft = true, key, v, seq)
  private def R(fk: String, v: String, seq: Long) =
    IndexRecord(fk, isLeft = false, fk, v, seq)

  test("left then right (separate batches) → right arrival re-emits") {
    val out = run("inner")(Seq(L("s1", "c1", "c1v1", 1)), Seq(R("s1", "s1v1", 2)))
    assert(out == Seq(JoinedRecord("c1", "c1v1", "s1v1", 2)))
  }

  test("upsert: latest right wins, fan-out re-emits all lefts") {
    val out = run("inner")(
      Seq(R("s1", "s1v1", 1), L("s1", "c1", "c1v1", 2), L("s1", "c2", "c2v1", 3)),
      Seq(R("s1", "s1v2", 4)))
    // batch 1: both lefts join v1; batch 2: right update re-emits both with v2
    assert(out.count(_.right == "s1v1") == 2)
    assert(out.count(_.right == "s1v2") == 2)
    assert(out.filter(_.right == "s1v2").map(_.outKey).sorted == Seq("c1", "c2"))
  }

  test("right-outer emits null-left only when nothing matched") {
    val out = run("right_outer")(Seq(R("s1", "s1v1", 1)))
    assert(out == Seq(JoinedRecord(null, null, "s1v1", 1)))
  }

  test("state TTL evicts stale lefts: expired state stops re-emitting") {
    // TTL'd run: a left arrives, then after the TTL has elapsed the
    // right arrives IN THE SAME BATCH as a fresh left. The expired left
    // must NOT re-emit on the right's arrival (it would without TTL —
    // pinned by the "left then right" test above), while the fresh left
    // joins normally (same-batch, so its state cannot have aged).
    //
    // Harness note: in processing-time mode transformWithState requests
    // another batch UNCONDITIONALLY (so wall-clock TTL/timer sweeps keep
    // firing) — the query never quiesces, which hangs both
    // processAllAvailable and Trigger.AvailableNow. The harness instead
    // POLLS: consumption is observed via progress numInputRows, the
    // verdict via the output buffer, and the query is stopped
    // explicitly. Once the fresh left's emission has appeared, the
    // absence of the stale left's is final — both would come from the
    // same input batch.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val input = MemoryStream[IndexRecord]
      val out = scala.collection.mutable.ArrayBuffer.empty[JoinedRecord]
      def poll(what: String)(done: => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!done) {
          assert(System.nanoTime() < deadline, s"timed out waiting for $what")
          Thread.sleep(100)
        }
      }
      // left_outer so phase 1 is positively observable: the lone left
      // emits (left, null) immediately, confirming its state write
      // happened BEFORE the TTL sleep (no progress-polling races)
      val q = TwsDenormalize.joined(input.toDS(), "left_outer",
          ttl = Some(java.time.Duration.ofSeconds(2)))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinedRecord], _: Long) =>
          val rows = df.collect()
          out.synchronized { out ++= rows }; ()
        }
        .outputMode("append")
        .start()
      try {
        input.addData(Seq(L("s1", "c1", "c1v1", 1)))
        poll("left+null emitted")(out.synchronized(out.exists(_.outKey == "c1")))
        Thread.sleep(4000) // > TTL; the only timing the test depends on
        input.addData(Seq(R("s1", "s1v1", 2), L("s1", "c2", "c2v1", 3)))
        poll("fresh join emitted")(out.synchronized(out.exists(_.outKey == "c2")))
      } finally q.stop()
      // the stale c1 must NOT re-emit with the right (it would without
      // TTL — pinned by TwsOuterJoinSpec); the fresh c2 joins normally
      assert(out.synchronized(out.sortBy(_.seq).toSeq) == Seq(
        JoinedRecord("c1", "c1v1", null, 1),
        JoinedRecord("c2", "c2v1", "s1v1", 3)), out.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state TTL evicts the right: a late left emits the outer null side") {
    // complement of the stale-left test above: here the RIGHT expires
    // between batches, so a left arriving after expiry must take the
    // `None if emitLeftNull` arm (left+null) instead of joining — the
    // "expired right stops new lefts from joining it" half of the TTL
    // contract in DenormProcessor.init. Same polling harness (see the
    // stale-left test for why processAllAvailable can't be used).
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val input = MemoryStream[IndexRecord]
      val out = scala.collection.mutable.ArrayBuffer.empty[JoinedRecord]
      def poll(what: String)(done: => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!done) {
          assert(System.nanoTime() < deadline, s"timed out waiting for $what")
          Thread.sleep(100)
        }
      }
      val q = TwsDenormalize.joined(input.toDS(), "left_outer",
          ttl = Some(java.time.Duration.ofSeconds(2)))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinedRecord], _: Long) =>
          val rows = df.collect()
          out.synchronized { out ++= rows }; ()
        }
        .outputMode("append")
        .start()
      try {
        // phase 1 is positively observable: the right's arrival joins an
        // accompanying left, confirming the right's state write landed
        // before the TTL sleep
        input.addData(Seq(R("s1", "s1v1", 1), L("s1", "c1", "c1v1", 2)))
        poll("first join emitted")(out.synchronized(out.exists(_.outKey == "c1")))
        Thread.sleep(4000) // > TTL; the only timing the test depends on
        input.addData(Seq(L("s1", "c2", "c2v1", 3)))
        poll("late left emitted")(out.synchronized(out.exists(_.outKey == "c2")))
      } finally q.stop()
      // c1 joined the live right; c2 arrived after the right expired and
      // must carry the null right side, not "s1v1"
      assert(out.synchronized(out.sortBy(_.seq).toSeq) == Seq(
        JoinedRecord("c1", "c1v1", "s1v1", 2),
        JoinedRecord("c2", "c2v1", null, 3)), out.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("tws and fmgws cores agree on a mixed multi-batch sequence") {
    val batches = Seq(
      Seq(L("a", "l1", "v1", 1), R("b", "bv1", 2)),
      Seq(R("a", "av1", 3), L("b", "l2", "v2", 4)),
      Seq(L("a", "l3", "v3", 5), R("a", "av2", 6), L("b", "l2", "v2b", 7)))
    val tws = run("full_outer")(batches: _*)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IndexRecord]
    val q = StreamDenormalize.joined(input.toDS(), "full_outer")
      .writeStream.format("memory").queryName("tws_cmp").outputMode("append").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    val fmgws = spark.table("tws_cmp").as[JoinedRecord].collect().sortBy(_.seq).toSeq
    assert(tws == fmgws)
  }
}

class TwsOuterJoinSpec extends graft.SparkSpec {
  import spark.implicits._
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private var tableId = 100

  private def run(joinType: String)(batches: Seq[IndexRecord]*): Seq[JoinedRecord] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IndexRecord]
      tableId += 1
      val name = s"twso_out_$tableId"
      val q = TwsDenormalize.joined(input.toDS(), joinType)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[JoinedRecord].collect().sortBy(_.seq).toSeq
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def L(fk: String, key: String, v: String, seq: Long) =
    IndexRecord(fk, isLeft = true, key, v, seq)
  private def R(fk: String, v: String, seq: Long) =
    IndexRecord(fk, isLeft = false, fk, v, seq)

  test("left-outer: missing right emits left+null, later right re-emits joined") {
    val out = run("left_outer")(Seq(L("s1", "c1", "v1", 1)), Seq(R("s1", "rv", 2)))
    assert(out == Seq(
      JoinedRecord("c1", "v1", null, 1),
      JoinedRecord("c1", "v1", "rv", 2)))
  }

  test("full-outer: both null-side emission paths work across batches") {
    val out = run("full_outer")(
      Seq(R("a", "av", 1)),        // no lefts yet → null-left emission
      Seq(L("b", "l1", "bv", 2)))  // no right for b → left-null emission
    assert(out == Seq(
      JoinedRecord(null, null, "av", 1),
      JoinedRecord("l1", "bv", null, 2)))
  }
}
