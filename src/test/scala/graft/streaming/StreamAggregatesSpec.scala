package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode windows emit once when the watermark passes, late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StreamAggregates.windowedEventStats(input.toDS().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("sa_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "a", 1.0),
        (ts("2024-01-01 10:20:00"), "a", 2.0),
        (ts("2024-01-01 11:10:00"), "b", 3.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark (11:10 - 1h) hasn't passed any window end
      assert(spark.table("sa_out").count() == 0)
      // sentinel advances the watermark past both real windows
      input.addData((ts("2024-01-01 14:00:00"), "c", 0.0))
      q.processAllAvailable()
      val out = spark.table("sa_out").as[(String, String, Long, Double)].collect().toSet
      assert(out == Set(
        ("2024-01-01 10", "a", 2L, 3.0),
        ("2024-01-01 11", "b", 1L, 3.0)))
      // a late event behind the watermark is dropped, not re-emitted
      input.addData((ts("2024-01-01 10:30:00"), "a", 99.0))
      q.processAllAvailable()
      assert(spark.table("sa_out").count() == 2)
    } finally q.stop()
  }
}

class SkewSaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals unsalted join (inner and left_outer)") {
    import org.apache.spark.sql.functions.col
    // skewed: 90 of 100 lefts share one FK
    val left = ((1 to 90).map(i => (i.toLong, 1L, s"l$i")) ++
      (91 to 100).map(i => (i.toLong, (i % 5 + 2).toLong, s"l$i")))
      .toDF("id", "fk", "payload")
    val right = (1 to 4).map(i => (i.toLong, s"r$i")).toDF("rid", "rv")
    def build = graft.operators.Denormalize.builder(left, right, "rid")
      .joinOn(_("fk"))
    for (jt <- Seq("inner", "left_outer")) {
      val plain = build.join(jt).orderBy(col("id")).collect().toSeq
      val salted = build.withSkewSalting(8).join(jt).orderBy(col("id")).collect().toSeq
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("salting rejects right/full outer") {
    val df = Seq((1L, 1L)).toDF("id", "fk")
    val r = Seq((1L, "x")).toDF("rid", "rv")
    intercept[IllegalArgumentException] {
      graft.operators.Denormalize.builder(df, r, "rid")
        .joinOn(_("fk")).withSkewSalting(4).rightOuter
    }
  }
}

class StreamSessionWindowSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming session windows finalize on watermark and equal the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, ts("2026-01-01 00:00:00"), 1.0),
      (1L, ts("2026-01-01 00:10:00"), 2.0), // same session (10 min gap)
      (1L, ts("2026-01-01 02:00:00"), 3.0), // new session
      (2L, ts("2026-01-01 00:05:00"), 4.0))
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamAggregates.sessionizedEventStats(
        input.toDS().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // sentinel far past every session + delay -> watermark closes them all
      input.addData(Seq((99L, ts("2026-01-02 12:00:00"), 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_out")
      .as[(Long, Long, Long, Double)].collect().toSet
    // true stream-vs-batch parity: the SAME function on the batch frame
    // (withWatermark is a no-op in batch mode)
    val batch = StreamAggregates.sessionizedEventStats(
        events.toDF("user_id", "ts", "value"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == batch)
    assert(got.size == 3) // u1 x 2 sessions + u2 x 1 (sentinel's never closes)
  }

  test("streamed CMS grid (q94): Complete-mode aggregation converges to the batch grid") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(10L, 10L, 10L, 20L, 20L, 30L)
    val input = MemoryStream[Long]
    val grid = graft.operators.Sketches.cmsGrid(input.toDS().toDF("user_id"))
    val q = grid.writeStream.format("memory").queryName("cms_grid_out")
      .outputMode("complete").start()
    try {
      // two micro-batches: counters must ACCUMULATE across them, and
      // Complete mode must replace (not append) the sink contents
      input.addData(events.take(3)); q.processAllAvailable()
      input.addData(events.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_grid_out")
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.operators.Sketches.cmsGrid(events.toDF("user_id"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch)
    // bounded state: never more cells than d*w, and the replace
    // semantics held (no duplicate (i,pos) rows in the sink)
    assert(streamed.size <= 4 * 512)
    assert(streamed.toSeq.map(r => (r._1, r._2)).distinct.size == streamed.size)
  }

  test("streamed HLL registers (q98): Complete-mode max-merge converges to the batch registers") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(("a", 10L), ("a", 11L), ("b", 10L), ("a", 12L), ("b", 99L), ("a", 10L))
    val input = MemoryStream[(String, Long)]
    val regs = graft.operators.Sketches.hllRegistersStream(
      input.toDS().toDF("event_type", "user_id"))
    val q = regs.writeStream.format("memory").queryName("hll_regs_out")
      .outputMode("complete").start()
    try {
      // registers must MERGE (max) across micro-batches
      input.addData(events.take(3)); q.processAllAvailable()
      input.addData(events.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_regs_out")
      .as[(String, Long, Int)].collect().toSet
    val batch = graft.operators.Sketches.hllRegistersStream(
      events.toDF("event_type", "user_id"))
      .as[(String, Long, Int)].collect().toSet
    assert(streamed == batch)
    // bounded state: at most m = 2^5 registers per group
    assert(streamed.groupBy(_._1).values.forall(_.size <= 32))
  }

  test("streamed histogram grid (q100): Complete-mode counter sums converge to the batch grid") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(("a", 1.0), ("a", 9.5), ("b", 3.0), ("a", 1.5), ("b", 700.0), ("a", -2.0))
    val input = MemoryStream[(String, Double)]
    val grid = graft.operators.Sketches.histGrid(
      input.toDS().toDF("event_type", "value"))
    val q = grid.writeStream.format("memory").queryName("hist_grid_out")
      .outputMode("complete").start()
    try {
      // counters must ACCUMULATE across micro-batches
      input.addData(events.take(3)); q.processAllAvailable()
      input.addData(events.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hist_grid_out")
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.operators.Sketches.histGrid(
      events.toDF("event_type", "value"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    // clamping held in the streamed path too: 700.0 -> top bucket,
    // -2.0 -> bucket 0
    assert(streamed.exists { case (t, b, _) => t == "b" && b == 63L })
    assert(streamed.collect { case ("a", 0L, c) => c }.sum == 3L) // 1.0, 1.5, -2.0
  }

  test("streamed KMV state (q101): capped custom state converges to the batch k-minima") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val k = 4
    val users = Seq(("a", 10L), ("a", 11L), ("a", 12L), ("b", 10L),
      ("a", 13L), ("a", 14L), ("a", 10L), ("b", 99L))
    val input = MemoryStream[(String, Long)]
    val q = graft.operators.Sketches.kmvStateStream(
        input.toDS().toDF("event_type", "user_id"), k)
      .writeStream.format("memory").queryName("kmv_state_out")
      .outputMode("update").start()
    try {
      // k-minima must MERGE across micro-batches with state capped at k
      input.addData(users.take(4)); q.processAllAvailable()
      input.addData(users.drop(4)); q.processAllAvailable()
    } finally q.stop()
    // compacted read: latest revision per group
    val latest = spark.table("kmv_state_out")
      .groupBy(col("event_type")).agg(max_by(col("mins"), col("rev")).as("mins"))
      .as[(String, Seq[Long])].collect().toMap
    // reference: batch k smallest distinct md5 hashes per group (the
    // same string-cast-then-digest kernel md5_long(col) applies)
    val batch = users.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(r => graft.functions.Md5Long.hash(
        r._2.toString.getBytes("UTF-8"))).distinct.sorted.take(k)
    }
    assert(latest.keySet == batch.keySet)
    latest.foreach { case (t, mins) =>
      assert(mins.length <= k)
      assert(mins == batch(t), s"group $t")
    }
    // group a saw 5 distinct users (> k=4) -> state capped at exactly k
    assert(latest("a").length == k)
  }

  test("streamed Bloom bits (q102): Complete-mode position counts converge to the batch bit set") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val keys = Seq(1L, 2L, 3L, 2L, 4L)
    val input = MemoryStream[Long]
    val q = graft.operators.Sketches.bloomBits(input.toDS().toDF("key"))
      .writeStream.format("memory").queryName("bloom_bits_out")
      .outputMode("complete").start()
    try {
      input.addData(keys.take(2)); q.processAllAvailable()
      input.addData(keys.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("bloom_bits_out")
      .as[(Long, Long)].collect().toSet
    val batch = graft.operators.Sketches.bloomBits(keys.toDF("key"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    // k=4 hashes over 4 distinct keys -> at most 16 set positions, and
    // the duplicate key contributes counts, not new positions
    assert(streamed.size <= 16)
    assert(streamed.map(_._1) == batch.map(_._1))
  }
}
