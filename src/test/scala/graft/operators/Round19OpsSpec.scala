package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-19 pins: the true WHITENING output (q295 — the r18 verdict's
  * "complete it or rename it" item, completed: q294 renamed to
  * kept-basis, q295 adds the exact-integer 1/√λ rescale), the
  * decorrelation-payoff recall eval (q296), the live projection
  * (q297), and the covariance gate's operand probe (the r18 ADVICE
  * item: the n-bound alone was proven only under |xq| ≤ 10³).
  */
class Round19OpsSpec extends SparkSpec {

  private val d = Similarity.covDims

  test("isqrt: exact integer square root at boundaries, perfect squares, " +
      "and near the Long ceiling") {
    assert(Similarity.isqrt(0L) == 0L)
    assert(Similarity.isqrt(1L) == 1L)
    assert(Similarity.isqrt(2L) == 1L)
    assert(Similarity.isqrt(3L) == 1L)
    assert(Similarity.isqrt(4L) == 2L)
    for (s <- Seq(7L, 1000L, 999999L, 12345678L)) {
      assert(Similarity.isqrt(s * s) == s)
      assert(Similarity.isqrt(s * s - 1) == s - 1)
      assert(Similarity.isqrt(s * s + 1) == s)
    }
    // near 2⁶²: the double seed is off by ulps here; the correction
    // loop must still land exactly
    val big = 3037000499L // isqrt(Long.MaxValue)
    assert(Similarity.isqrt(Long.MaxValue) == big)
    assert(Similarity.isqrt(big * big) == big)
    assert(Similarity.isqrt(big * big - 1) == big - 1)
  }

  test("integer division contract: Spark's `div` truncates toward zero " +
      "(the DuckDB `//` / Scala Long./ contract the rescale rides on)") {
    val r = spark.sql(
      "SELECT -7L div 2L, 7L div -2L, -7L div -2L, 7L div 2L").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (-3L, -3L, 3L, 3L))
  }

  /** A synthetic dense corpus with exactly two variance axes: dim 0 at
    * σ = 5 (milli 5000) and dim 1 at σ = 4 (milli 4000), orthogonal
    * balanced ±sign patterns (period 2 and 4) so means are exactly
    * zero and the covariance is exactly diagonal — the hand corpus the
    * variance law is provable on.
    */
  private def handCorpus(n: Int = 400) = {
    import spark.implicits._
    require(n % 4 == 0)
    (0 until n).map { i =>
      val s1 = if (i % 2 == 0) 1.0 else -1.0
      val s2 = if (i % 4 < 2) 1.0 else -1.0
      val v = Array.fill(d)(0.0)
      v(0) = 5.0 * s1
      v(1) = 4.0 * s2
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("q295 whitening variance law: on the two-axis hand corpus the " +
      "RAW kept-basis variances sit at the σ²-ratio 25/16 while the " +
      "WHITENED per-component variances are equal within quantization") {
    val raw = handCorpus()
    val grid = Similarity.covAssemble(
      Similarity.covCells(Similarity.kmQuantizeDf(raw)))
    val kept = Similarity.keptBasisOf(grid, 3, 200000L)
    // total variance 25+16 = 41; residual fraction before comp 2 is
    // 16/41 ≈ 390k micro > 200k → kept; before comp 3 ≈ 0 → dropped
    assert(kept.map(_._3) == Seq(1, 2), s"keep mask: ${kept.map(_._3)}")
    def varsOf(df: org.apache.spark.sql.DataFrame, c: String) =
      // coords ≈ ±5·10⁹, so squares must sum as doubles (a Long sum
      // of 400 × 2.5·10¹⁹ would wrap)
      df.select(col("comp"), col(c).cast("double").as("x"))
        .groupBy(col("comp"))
        .agg((sum(col("x") * col("x")) / count(lit(1))).as("v2"),
          (sum(col("x")) / count(lit(1))).as("mu"))
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1) - r.getDouble(2) * r.getDouble(2))).toMap
    val rawVar = varsOf(Similarity.keptProjectOn(raw, kept), "coord")
    val rawRatio = rawVar(1L) / rawVar(2L)
    assert(math.abs(rawRatio - 25.0 / 16.0) < 0.05,
      s"raw kept-basis ratio must be ~σ²-ratio 1.5625: $rawRatio")
    val whVar = varsOf(Similarity.whitenedProjectOn(raw, kept), "coord_w")
    val whRatio = whVar(1L) / whVar(2L)
    assert(whRatio > 0.95 && whRatio < 1.05,
      s"whitened per-component variances must equalize: $whRatio " +
        s"(raw was $rawRatio)")
  }

  test("q295 exactness: every whitened cell equals the q294 cell's " +
      "coord·1000 div (isqrt(max(λ,0))+1), against driver arithmetic") {
    val dir = "/root/testdata/sf0.001"
    val kept = Similarity.keptBasis(spark, dir)
    assert(kept.nonEmpty)
    val dens = kept.map { case (_, lam, c) =>
      c.toLong -> (Similarity.isqrt(math.max(lam, 0L)) + 1L)
    }.toMap
    val base = Similarity.keptBasisProjection(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wh = Similarity.whitenedProjection(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wh.keySet == base.keySet)
    assert(wh.nonEmpty)
    for (((id, c), w) <- wh)
      assert(w == base((id, c)) * 1000L / dens(c),
        s"vec $id comp $c: $w != ${base((id, c))} * 1000 / ${dens(c)}")
    // and the plan stays one map-only corpus pass
    val p = Similarity.whitenedProjection(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the whitened pass must be zero-exchange:\n$p")
  }

  test("empty keep mask short-circuits: both projections return an " +
      "empty correctly-typed frame instead of an unanalyzable array()") {
    val raw = handCorpus(8)
    for ((df, cOut) <- Seq(
        Similarity.keptProjectOn(raw, Nil) -> "coord",
        Similarity.whitenedProjectOn(raw, Nil) -> "coord_w")) {
      assert(df.columns.toSeq == Seq("vec_id", "comp", cOut))
      assert(df.count() == 0)
    }
  }

  test("covariance gate probes the OPERANDS, not just n: a grid under " +
      "the row bound whose sums would wrap BIGINT still promotes") {
    import spark.implicits._
    val tri = d * (d + 1) / 2
    // n = 1000 (far below covNumSafeN) but |s| ≈ 3.4e15, so
    // s_i·s_j ≈ 1.2e31 wraps BIGINT — the n-gate alone would misfire
    val n = 1000L
    def sPair(p: Long) = 3400000000000000L - p
    def sDim(k: Int) = 3400000000000000L + k
    val cells = ((0 until tri).map(p => (p.toLong, n, sPair(p.toLong))) ++
      (0 until d).map(k => ((tri + k).toLong, n, sDim(k)))).toDF("pid", "n", "s")
    val auto = Similarity.covAssemble(cells)
    assert(auto.schema("cov_num").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0),
      s"operand magnitudes past Long.MaxValue/2 must promote: ${auto.schema}")
    val got = auto.select(col("i"), col("j"), col("cov_num")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        BigInt(r.getDecimal(2).toBigIntegerExact)).toMap
    // spot-check exactness against driver BigInt on cells where the
    // BIGINT form provably wraps
    val checked = got.count { case ((i, j), cn) =>
      val i0 = (i - 1).toInt; val j0 = (j - 1).toInt
      val pid = (0 until i0).map(r => d - r).sum + (j0 - i0)
      val want = BigInt(n) * BigInt(sPair(pid.toLong)) -
        BigInt(sDim(i0)) * BigInt(sDim(j0))
      assert(cn == want, s"cell ($i,$j): $cn != $want")
      want.abs > BigInt(Long.MaxValue)
    }
    assert(checked == tri, "fixture self-check: every cell must wrap BIGINT")
  }

  test("q296 consistency: the raw arm equals q234's recall eval " +
      "cell-for-cell, and the kept arm's hits are bounded by n_ref") {
    val dir = "/root/testdata/sf0.001"
    val q234 = Similarity.annRecallEval(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Similarity.basisRecallEval(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (qid, nRef, hRaw, hKept) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(q234(qid) == ((nRef, hRaw)),
        s"raw arm must be q234 verbatim for $qid: ${q234(qid)} != ($nRef, $hRaw)")
      assert(hKept >= 0L && hKept <= nRef)
    }
    assert(rows.map(_.getLong(0)).toSet == q234.keySet)
  }

  test("q297 live projection: converged streamed emissions equal the " +
      "q294 batch output row-for-row, and the per-batch plan is " +
      "zero-exchange") {
    val dir = "/root/testdata/sf0.001"
    val want = Similarity.keptBasisProjection(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val got = Similarity.streamKeptBasisProjection(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == want)
    // the per-batch transform (the exact function foreachBatch runs)
    val kept = Similarity.keptBasis(spark, dir)
    val p = Similarity.keptProjectOn(
      graft.Tables.load(spark, dir, "embeddings"), kept)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the per-batch projection must be map-only:\n$p")
  }
}
