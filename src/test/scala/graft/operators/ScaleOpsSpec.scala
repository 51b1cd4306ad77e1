package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within its rsd contract vs exact") {
    val approx = Analytics.approxDistinctUsers(spark, dir, rsd = 0.02)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      val rel = math.abs(a - e).toDouble / e
      assert(rel <= 0.06, s"$k: approx $a vs exact $e (rel err $rel)") // 3× rsd headroom
    }
  }

  test("frameSample covers every stride-th window and digests match substrings") {
    val frames = Multimodal.frameSample(spark, "/root/testdata/sf0.001", frameChars = 100, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(frames.nonEmpty)
    for (((docId, idx), (md5Hex, nChars)) <- frames.take(200)) {
      val t = texts(docId)
      val chunk = t.substring(math.min(idx * 100, t.length),
        math.min(idx * 100 + 100, t.length))
      assert(nChars == chunk.length)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5Hex == md, s"doc $docId frame $idx")
    }
    // stride: only even frame indices present
    assert(frames.keys.forall(_._2 % 2 == 0))
  }

  test("balanceBySize spreads blobs across the requested partitions") {
    val df = Multimodal.balanceBySize(Multimodal.mediaTable(spark, dir), 4)
    assert(df.rdd.getNumPartitions == 4)
    // hash spread: no partition holds more than half the corpus
    val n = df.count()
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(_ <= n / 2), sizes.mkString(","))
  }

  test("bucketed tables co-locate the join: no shuffle in the plan") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").option("path", s"$wh/customer_b")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    try {
      // disable auto-broadcast so the join would OTHERWISE shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == o.join(c, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("q125 association rules: canonical pairs, exact identities vs re-derived baskets") {
    val rules = Analytics.associationRules(spark, dir).collect()
    assert(rules.nonEmpty)
    // re-derive baskets in plain Scala
    val baskets = Tables.events(spark, dir)
      .select($"user_id", $"event_type").distinct()
      .as[(Long, String)].collect()
    val nUsers = baskets.map(_._1).distinct.length.toLong
    val byType = baskets.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val byUser = baskets.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    rules.foreach { r =>
      val (a, b, nAb) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b) // canonicalized
      val expect = byUser.count(s => s.contains(a) && s.contains(b)).toLong
      assert(nAb == expect, s"($a,$b): $nAb != $expect")
      assert(r.getDouble(3) == nAb.toDouble / nUsers.toDouble)
      assert(r.getDouble(4) == nAb.toDouble / byType(a).toDouble)
      assert(r.getDouble(5) == nAb.toDouble / byType(b).toDouble)
      assert(r.getDouble(6) ==
        (nAb.toDouble * nUsers.toDouble) / (byType(a).toDouble * byType(b).toDouble))
    }
  }

  test("q120 outlier gate: fences bracket the bulk; flags match a plain-Scala re-derivation") {
    val rows = Sketches.outlierGate(spark, dir).collect()
    assert(rows.nonEmpty)
    // per type: bounds are constant, lo < hi, and the outlier fraction
    // is a minority (Tukey fences at 1.5 IQR on any non-degenerate data)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val lo = rs.head.getDouble(3); val hi = rs.head.getDouble(4)
      assert(rs.forall(r => r.getDouble(3) == lo && r.getDouble(4) == hi))
      assert(lo < hi)
      val outFrac = rs.count(_.getInt(5) == 1).toDouble / rs.length
      assert(outFrac < 0.5, s"outlier fraction $outFrac")
      // each flag re-derives from the row's own value and bounds
      rs.foreach { r =>
        val expect = if (r.getDouble(2) < lo || r.getDouble(2) > hi) 1 else 0
        assert(r.getInt(5) == expect)
      }
    }
  }

  test("q116: SS+SS-2dot factorization equals the dense-grid distance (missing days = 0)") {
    // the factorization is the whole scale story — pin it against the
    // naive dense computation on the real fixture
    val sr = Tables.events(spark, dir)
      .select($"user_id",
        datediff(to_date($"ts"), lit(java.sql.Date.valueOf("2024-01-01")))
          .cast("long").as("day"),
        floor($"value" * lit(1000)).cast("long").as("vm"))
      .groupBy($"user_id", $"day").agg(sum($"vm").as("v"))
    val series = sr.as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(r => r._2 -> r._3).toMap }
    val got = Analytics.tsSimilarityTopK(spark, dir)
      .as[(Long, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, n, _, d2) =>
      assert(q != n)
      val a = series(q); val b = series(n)
      val days = a.keySet ++ b.keySet
      val dense = days.toSeq.map { d =>
        val diff = a.getOrElse(d, 0L) - b.getOrElse(d, 0L); diff * diff
      }.sum
      assert(d2 == dense, s"query $q neighbor $n: $d2 != dense $dense")
    }
    // ranks are the true k-smallest distances per query
    got.groupBy(_._1).foreach { case (q, rows) =>
      val allD2 = series.keys.filter(_ != q).map { n =>
        val a = series(q); val b = series(n)
        (a.keySet ++ b.keySet).toSeq.map { d =>
          val diff = a.getOrElse(d, 0L) - b.getOrElse(d, 0L); diff * diff
        }.sum
      }.toSeq.sorted
      val kth = allD2.take(rows.length).max
      assert(rows.map(_._4).max <= kth)
    }
  }
}

class SketchesSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("portable HLL estimate stays within the m=32 error contract on the fixture") {
    // standard error for m=32 is 1.04/sqrt(32) = 18.4%; allow 3 sigma.
    // p=5 is the right precision for this corpus: the raw estimator
    // needs n >~ 2.5*m, and the fixture has ~150 distinct users/type
    val rows = Sketches.hllDistinct(spark, dir)
      .select("event_type", "n_exact", "hll_est")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((t, exact, est) <- rows) {
      val rel = math.abs(est - exact) / exact
      assert(rel <= 0.55, s"$t: est $est vs exact $exact (rel err $rel)")
    }
  }

  test("portable HLL at p=8 meets its 6.5% contract on a 10k-distinct synthetic") {
    // the high-cardinality regime (n >> 2.5*m) the fixture can't reach:
    // 10k distinct users per group (evens/odds); 3 sigma = 19.5%
    val ev = spark.range(0, 40000)
      .select((col("id") % 20000).as("user_id"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("event_type"))
    val rows = Sketches.hllFromEvents(ev, p = 8)
      .select("event_type", "n_exact", "hll_est")
      .as[(String, Long, Double)].collect()
    assert(rows.length == 2)
    for ((t, exact, est) <- rows) {
      val rel = math.abs(est - exact) / exact
      assert(rel <= 0.195, s"$t: est $est vs exact $exact (rel err $rel)")
    }
  }

  test("portable HLL registers merge: union of halves == whole") {
    // the defining sketch property, and what makes the two-level
    // groupBy shape correct under ANY partitioning: max() per register
    // commutes with the split. Recompute registers per half in Spark
    // and fold by hand.
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), (graft.functions.md5_long(col("user_id")) % 256).as("bucket"),
        expr("graft_md5_long(cast(cast(user_id as string) as binary)) div 256").as("w"))
      .withColumn("rho", when(col("w") === 0, lit(53))
        .otherwise(lit(53) - length(bin(col("w")))))
    def regs(half: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      half.groupBy("bucket").agg(max("rho").as("mj"))
        .as[(Long, Int)].collect().toMap
    val all = regs(ev)
    val a = regs(ev.filter(col("user_id") % 2 === 0))
    val b = regs(ev.filter(col("user_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    assert(merged == all)
  }

  test("KMV estimate within contract; sketches merge by k-smallest-of-union") {
    // rel std err ~ 1/sqrt(k-2) = 12.7% for k=64; allow 3 sigma
    val rows = Sketches.kmvDistinct(spark, dir)
      .select("event_type", "n_exact", "kmv_est")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((t, exact, est) <- rows) {
      val rel = math.abs(est - exact) / exact
      assert(rel <= 0.38, s"$t: est $est vs exact $exact (rel err $rel)")
    }
    // mergeability: the k smallest hashes of a union == k smallest of
    // the concatenated per-half sketches (what makes KMV distributable)
    val h = Tables.events(spark, dir)
      .select(graft.functions.md5_long(col("user_id")).as("h"),
        (col("user_id") % 2).as("half"))
      .distinct()
    def sketch(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("h").as[Long].collect().sorted.take(64).toSeq
    val whole = sketch(h)
    val merged = (sketch(h.filter(col("half") === 0)) ++ sketch(h.filter(col("half") === 1)))
      .sorted.take(64)
    assert(whole == merged)
  }

  test("CMS estimates are one-sided (est >= exact) and exact for isolated keys") {
    // collisions only ADD to counters, so the min-over-rows estimate can
    // never undercount — the defining CMS guarantee, checked for EVERY
    // user in the fixture (topN large enough to keep them all)
    val rows = Sketches.cmsHeavyHitters(spark, dir, topN = 1000000)
      .select("user_id", "n_exact", "cms_est").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((u, exact, est) <- rows)
      assert(est >= exact, s"user $u: cms_est $est < n_exact $exact")
    // default topN returns exactly 25 rows
    assert(Sketches.cmsHeavyHitters(spark, dir).count() == 25)
  }

  test("CMS grids merge counter-wise: grid(A) + grid(B) == grid(A union B)") {
    // what lets per-partition sketches combine into the global one
    val d = 4; val w = 512
    val is = (0 until d).map(lit(_))
    def grid(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.select(col("user_id"), explode(array(is: _*)).as("i"))
        .select(col("i"),
          (graft.functions.md5_long(concat(col("user_id").cast("string"),
            lit(":"), col("i").cast("string"))) % w).as("pos"))
        .groupBy("i", "pos").agg(count(lit(1)).as("c"))
        .as[(Int, Long, Long)].collect().map { case (i, p, c) => (i, p) -> c }.toMap
    val ev = Tables.events(spark, dir)
    val all = grid(ev)
    val a = grid(ev.filter(col("event_id") % 2 === 0))
    val b = grid(ev.filter(col("event_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == all)
  }

  test("quantile histogram: estimates within one bucket width of the exact quantile") {
    val width = 8.0
    val got = Sketches.quantileHistogram(spark, dir)
      .select("event_type", "p", "q_est").as[(String, Double, Double)].collect()
    assert(got.length == 15) // 5 types x 3 quantiles
    val byType = Tables.events(spark, dir)
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((t, p, est) <- got) {
      val vals = byType(t)
      val exact = vals(math.min(math.ceil(p * vals.length).toInt - 1, vals.length - 1))
      assert(math.abs(est - exact) <= width,
        s"$t p=$p: est $est vs exact $exact (width $width)")
    }
  }

  test("quantile histogram state merges: per-bucket counts add across halves") {
    // bins via the SHIPPED Sketches.histBucket with the op's defaults,
    // so a width/bucket-count change cannot silently detach this test
    def hist(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      df.select(col("event_type"),
          Sketches.histBucket(col("value"), width = 8.0, buckets = 64).as("bucket"))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("cnt"))
        .as[(String, Long, Long)].collect().map { case (t, b, c) => (t, b) -> c }.toMap
    val ev = Tables.events(spark, dir)
    val whole = hist(ev)
    val a = hist(ev.filter(col("event_id") % 2 === 0))
    val b = hist(ev.filter(col("event_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("incremental agg: merged base+delta states equal the scratch path") {
    // the IVM contract, checked in-engine (the DuckDB oracle re-checks
    // it cross-engine): merging per-side partial states must reproduce
    // the one-pass aggregate bit-for-bit
    val got = Sketches.incrementalAgg(spark, dir)
      .select("event_type", "n", "sum_value", "min_value", "max_value", "hll_s")
      .as[(String, Long, Double, Double, Double, Long)].collect().toSet
    val ev = Tables.events(spark, dir)
    val scratchScalars = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    val scratch = Sketches.hllFromEvents(ev, p = 5)
      .select(col("event_type"), col("hll_s"))
      .join(scratchScalars, "event_type")
      .select("event_type", "n", "sum_value", "min_value", "max_value", "hll_s")
      .as[(String, Long, Double, Double, Double, Long)].collect().toSet
    assert(got == scratch)
    assert(got.nonEmpty)
  }

  test("incremental agg: a group present on only one side still merges") {
    // event_ids = 9 mod 10 land in the delta; type 'only_delta' has no
    // base rows at all — the full-outer merge must carry it through
    val ev = Seq(
      (9L, "only_delta", 5L, 2.5), (19L, "only_delta", 6L, 1.5),
      (1L, "both", 7L, 3.0), (29L, "both", 8L, 4.0))
      .toDF("event_id", "event_type", "user_id", "value")
    val got = Sketches.incrementalAggFromEvents(ev)
      .select("event_type", "n", "sum_value", "min_value", "max_value")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("only_delta") == (("only_delta", 2L, 4.0, 1.5, 2.5)))
    assert(got("both") == (("both", 2L, 7.0, 3.0, 4.0)))
  }

  test("bloom prefilter has zero false negatives and sane selectivity") {
    val v = Sketches.bloomPrune(spark, dir)
      .select("bloom_pass", "true_match").as[(Int, Int)].collect()
    assert(v.nonEmpty)
    // no false negatives: every true match passes the filter
    assert(v.forall { case (pass, truth) => truth == 0 || pass == 1 })
    // the filter actually rejects something (it's not all-pass)
    assert(v.exists(_._1 == 0))
    // false-positive rate among true non-matches stays modest for
    // m=65536, k=4 at this key count (theoretical ~<1%; allow 5%)
    val nonMatches = v.count(_._2 == 0)
    val falsePos = v.count { case (pass, truth) => pass == 1 && truth == 0 }
    assert(falsePos.toDouble / nonMatches <= 0.05,
      s"$falsePos false positives over $nonMatches non-matches")
  }
}

class StreamIntervalJoinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  test("stream-stream interval join matches across micro-batches (both arrival orders)") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, Long, Timestamp, String)]
    val right = MemoryStream[(Long, Long, Timestamp, String)]
    def df(m: MemoryStream[(Long, Long, Timestamp, String)]) =
      m.toDS().toDF("event_id", "user_id", "ts", "event_type")
    val q = graft.streaming.StreamAggregates.purchaseErrorJoin(df(left), df(right))
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      val t = (min: Int) => Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      // batch 1: a purchase with no error yet — no output
      left.addData((1L, 7L, t(30), "purchase"))
      q.processAllAvailable()
      assert(spark.table("ssj_out").count() == 0)
      // batch 2: an error 10 min EARLIER arrives late → joins the
      // buffered purchase (purchase-first arrival)
      right.addData((2L, 7L, t(20), "error"))
      q.processAllAvailable()
      assert(spark.table("ssj_out").as[(Long, Long, Long, Long, Long)].collect()
        .toSet == Set((1L, 2L, 7L, tUs(t(30)), tUs(t(20)))))
      // batch 3: error-first arrival — a later purchase joins it; an
      // error AFTER the purchase (outside [p_ts-1h, p_ts]) does not
      right.addData((3L, 7L, t(40), "error"))
      q.processAllAvailable()
      left.addData((4L, 7L, t(45), "purchase"))
      q.processAllAvailable()
      val out = spark.table("ssj_out").as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(out == Set(
        (1L, 2L, 7L, tUs(t(30)), tUs(t(20))),
        (4L, 2L, 7L, tUs(t(45)), tUs(t(20))),
        (4L, 3L, 7L, tUs(t(45)), tUs(t(40)))))
    } finally q.stop()
  }

  test("left-outer interval join: unmatched purchase emits null-extended only after BOTH watermarks clear it") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, Long, Timestamp, String)]
    val right = MemoryStream[(Long, Long, Timestamp, String)]
    def df(m: MemoryStream[(Long, Long, Timestamp, String)]) =
      m.toDS().toDF("event_id", "user_id", "ts", "event_type")
    val q = graft.streaming.StreamAggregates
      .purchaseErrorJoin(df(left), df(right), joinType = "left_outer")
      .writeStream.format("memory").queryName("ssjo_out").outputMode("append").start()
    try {
      val t = (h: Int, min: Int) => Timestamp.valueOf(f"2026-01-01 $h%02d:$min%02d:00")
      left.addData((1L, 7L, t(10, 30), "purchase"))
      right.addData((2L, 9L, t(10, 35), "error")) // other user: no match
      q.processAllAvailable()
      // no emission yet — the purchase could still match a late error
      assert(spark.table("ssjo_out").count() == 0)
      // advancing ONLY the right watermark must not flush (global
      // watermark = min across nodes — the q129 dual-sentinel rule)
      right.addData((3L, 9L, t(14, 0), "error"))
      q.processAllAvailable()
      assert(spark.table("ssjo_out").count() == 0)
      // advancing the left side too clears the interval + delay horizon
      left.addData((4L, 9L, t(14, 0), "purchase"))
      q.processAllAvailable()
      val out = spark.table("ssjo_out")
        .select("purchase_id", "error_id", "user_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -99L else r.getLong(1), r.getLong(2)))
        .toSet
      assert(out.contains((1L, -99L, 7L)), s"unmatched purchase must emit null-extended: $out")
    } finally q.stop()
  }

  private def tUs(t: Timestamp): Long = t.getTime * 1000L
}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunks cover every token with the declared window/stride geometry") {
    val (cw, st) = (64, 48)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val nToks = docs.select(col("doc_id"),
        size(split(lower(col("text")), " ")).as("n")).as[(Long, Int)].collect().toMap
    val chunks = TextAnalysis.chunkDocuments(docs, col("text"), cw, st)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_tokens")
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.nonEmpty)
    for ((doc, cs) <- chunks) {
      val n = nToks(doc)
      // contiguous chunk_idx from 0, starts at the stride grid
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      for ((_, idx, start, len) <- cs) {
        assert(start == idx * st + 1)
        assert(len >= 1 && len <= cw)
        assert(start + len - 1 <= n)
      }
      // all but the last chunk are full windows; the last reaches token n
      for ((_, _, _, len) <- cs.init) assert(len == cw)
      val (_, _, lastStart, lastLen) = cs.last
      assert(lastStart + lastLen - 1 == n, s"doc $doc: last chunk misses tail")
      // no token gap: stride <= window means consecutive chunks overlap
      assert(cs.length == (if (n <= cw) 1 else (n - cw + st - 1) / st + 1))
    }
  }

  test("chunk text round-trips: stitching chunks at stride offsets rebuilds the doc") {
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val rows = TextAnalysis.chunkDocuments(
        Seq((1L, text)).toDF("doc_id", "text"), col("text"), cw = 64, st = 48)
      .select("chunk_idx", "chunk_text").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.length == 3) // 1 + ceil((150-64)/48) = 3
    val stitched = rows.map(_._2.split(" ")).zipWithIndex
      .flatMap { case (toks, i) => if (i == 0) toks else toks.drop(64 - 48) }
    assert(stitched.mkString(" ") == text)
  }
}

class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  test("redaction: typed sentinels, fixed pass order, counts from the original text") {
    val docs = Seq(
      (1L, "mail a.b@example.com or visit https://x.io/path?id=1234567 now"),
      (2L, "card 4111111111111111 twice 4111111111111111"),
      (3L, "clean text with no pii at all"),
      // email inside a URL: the email pass fires first, the URL pass
      // then swallows the sentinel — one <URL> survives, count is 2
      (4L, "see https://host/a.b@example.com here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs, col("text"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "mail <EMAIL> or visit <URL> now", 3))) // 1234567 inside the URL counts
    assert(out(1) == ((2L, "card <DIGITS> twice <DIGITS>", 2)))
    assert(out(2) == ((3L, "clean text with no pii at all", 0)))
    assert(out(3) == ((4L, "see <URL> here", 2)))
  }
}

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    TextAnalysis.winnowingFingerprints(docs.toDF("doc_id", "text"), col("text"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap

  test("winnowing guarantee: shared runs >= w+k-1 tokens share a fingerprint hash") {
    // two docs share a 10-token run embedded in different contexts;
    // with k=3, w=4 any shared run of >= 6 tokens must collide
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d1 = s"one two three $shared four five"
    val d2 = s"xx yy $shared zz"
    val m = fps(Seq((1L, d1), (2L, d2)))
    val h1 = m(1L).map(_._2)
    val h2 = m(2L).map(_._2)
    assert((h1 & h2).nonEmpty, s"h1=$h1 h2=$h2")
  }

  test("winnowing density and domain") {
    // ~2/(w+1) of grams selected on random-ish text; short docs emit none
    val text = (1 to 200).map(i => s"tok${i * 37 % 91}").mkString(" ")
    val m = fps(Seq((1L, text), (2L, "too short doc")))
    val n = m(1L).size.toDouble
    val grams = 200 - 2
    assert(n / grams > 0.2 && n / grams < 0.6, s"density ${n / grams}")
    assert(!m.contains(2L))
    // rightmost-tie rule: all-equal tokens → every full window selects
    // its rightmost gram, so every position from w-1 on is a fingerprint
    val equalToks = Seq((3L, Seq.fill(10)("same").mkString(" ")))
    val m3 = fps(equalToks)(3L)
    assert(m3.map(_._1) == (3L to 7L).toSet, m3.toString) // 8 grams, pos 3..7
  }

  test("winnow_keys nulls out past the position-field capacity instead of corrupting") {
    // > 2^20 grams: packed (2^20-1-pos) would go negative and collide
    // across positions — the expression must return null, not garbage,
    // even for SQL callers who bypass the operator's domain filter
    val big = ("x " * ((1 << 20) + 5)).trim
    val row = spark.range(1).select(
      graft.functions.winnow_keys(split(lit(big), " "), 3, 4).as("sel"),
      graft.functions.winnow_keys(split(lit("a b c d e f"), " "), 3, 4).as("ok"))
      .head()
    assert(row.isNullAt(0))
    assert(!row.isNullAt(1))
  }

  test("native winnow_keys equals the posexplode+window formulation on real docs") {
    val (k, w) = (3, 4)
    val hBits = graft.functions.WinnowKeys.hBits
    val posBits = graft.functions.WinnowKeys.posBits
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = TextAnalysis.winnowingFingerprints(df, col("text"), k, w)
      .as[(Long, Long, Long)].collect().toSet
    // the pre-round-4 formulation, verbatim
    val toks = TextAnalysis.tokens(col("text"))
    val grams = transform(sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))
    val keyed = df
      .filter(size(toks) >= k + w - 1 && size(toks) <= (1L << posBits) + k - 1)
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        ((graft.functions.md5_long(col("gram")) % (1L << hBits)) * (1L << posBits)
          + (lit((1L << posBits) - 1) - col("pos"))).as("key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(-(w - 1), org.apache.spark.sql.expressions.Window.currentRow)
    val old = keyed
      .withColumn("sel", min(col("key")).over(win))
      .filter(col("pos") >= w - 1)
      .select(col("doc_id"), col("sel")).distinct()
      .select(col("doc_id"),
        (lit((1L << posBits) - 1) - col("sel") % (1L << posBits)).as("fp_pos"),
        expr(s"sel div ${1L << posBits}").as("fp_hash"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == old)
    assert(got.nonEmpty)
  }
}

class SessionWindowBoundarySpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("session_window MERGES events exactly one gap apart (pins the oracle's > rule)") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t30 = java.sql.Timestamp.valueOf("2026-01-01 00:30:00") // exactly the gap
    val t61 = java.sql.Timestamp.valueOf("2026-01-01 01:00:01") // just past it
    val df = Seq((1L, t0), (1L, t30), (1L, t61)).toDF("user_id", "ts")
    val sessions = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).collect()
    // t0+t30 merge (closed extent at last+gap); t61 is 30:01 after t30 → new session
    assert(sessions.length == 2, sessions.mkString(","))
    assert(sessions.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
  }
}
