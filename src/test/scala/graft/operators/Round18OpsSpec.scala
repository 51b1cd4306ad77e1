package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Round-18 pins: the n-gated covariance-numerator promotion (the r17
  * verdict's top item) — the shipped default must pick the BIGINT form
  * exactly up to [[Similarity.covNumSafeN]] rows per pair and the
  * DECIMAL(38,0) form past it, and the decimal form must be EXACT
  * where BIGINT arithmetic would have wrapped.
  */
class Round18OpsSpec extends SparkSpec {

  private val d = Similarity.covDims
  private val tri = d * (d + 1) / 2

  /** A synthetic full-shape cell grid (all D(D+1)/2 pair positions +
    * the D linear-tail positions) with every n pinned to `n` and
    * deterministic sums sized by `sPair`/`sDim`.
    */
  private def syntheticCells(n: Long, sPair: Long => Long,
      sDim: Int => Long) = {
    import spark.implicits._
    val pairs = (0 until tri).map(p => (p.toLong, n, sPair(p.toLong)))
    val dims = (0 until d).map(k => ((tri + k).toLong, n, sDim(k)))
    (pairs ++ dims).toDF("pid", "n", "s")
  }

  test("covariance n-gate: AT the proven-exact bound the shipped default " +
      "stays BIGINT and equals the explicit BIGINT form") {
    val cells = syntheticCells(Similarity.covNumSafeN,
      p => 1000L + p, k => 500L + k)
    val auto = Similarity.covAssemble(cells)
    assert(auto.schema("cov_num").dataType == LongType,
      s"n == covNumSafeN must stay on the BIGINT path: ${auto.schema}")
    val want = Similarity.covAssemble(cells, decimalNum = Some(false))
      .select(col("i"), col("j"), col("cov_num"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = auto.select(col("i"), col("j"), col("cov_num"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("covariance n-gate: PAST the bound the shipped default promotes to " +
      "DECIMAL(38,0) and the numerator is exact where BIGINT would wrap") {
    // n·s ≈ 9.2×10¹⁸ and s_i·s_j ≈ 6.25×10²⁴ — both beyond 2⁶³−1, so
    // the BIGINT form would silently wrap; the gated decimal form must
    // equal driver-side BigInt arithmetic cell-for-cell
    val n = 3000000L
    def sPair(p: Long) = 3000000000000L - p
    def sDim(k: Int) = 2500000000000L + k
    val cells = syntheticCells(n, sPair, sDim)
    val auto = Similarity.covAssemble(cells)
    assert(auto.schema("cov_num").dataType == DecimalType(38, 0),
      s"n > covNumSafeN must promote the numerator: ${auto.schema}")
    val got = auto.select(col("i"), col("j"), col("cov_num"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        BigInt(r.getDecimal(2).toBigIntegerExact)).toMap
    assert(got.size == tri)
    for (((i, j), cn) <- got) {
      // pid of (i, j) under the same i ≤ j enumeration covAssemble uses
      val i0 = (i - 1).toInt; val j0 = (j - 1).toInt
      val pid = (0 until i0).map(r => d - r).sum + (j0 - i0)
      val want = BigInt(n) * BigInt(sPair(pid.toLong)) -
        BigInt(sDim(i0)) * BigInt(sDim(j0))
      assert(cn == want, s"cell ($i,$j): $cn != $want")
      assert(want.abs > BigInt(Long.MaxValue),
        "fixture self-check: this cell must actually exceed BIGINT")
    }
  }

  test("q292 eigen top-k: hand-grid law at k = 3 — on a three-variance " +
      "diagonal grid each deflation exposes the next axis, and the " +
      "residual-variance series decays to the quantization floor") {
    import spark.implicits._
    // the q290 hand grid (variances 5e6 > 2e6 > 1e6 on dims 1..3,
    // a-units diagonal (833333, 333333, 166666) after sA = 6): with
    // TWO deflations comp 3 must recover dim 3 — only reachable if
    // the rank-1 subtraction composes, not just applies once
    val grid = Seq(
      (1L, 1L, 5000000L), (2L, 2L, 2000000L), (3L, 3L, 1000000L))
      .toDF("i", "j", "cov_num")
    val comps = Similarity.eigenTopK(grid, 3)
    assert(comps.length == 3)
    val Seq((x1, lam1, r1), (x2, lam2, r2), (x3, lam3, r3)) = comps
    // axes in order, at the ±10⁶ loading scale
    assert(math.abs(x1(0)) >= 999000L && math.abs(x2(1)) >= 999000L &&
      math.abs(x3(2)) >= 999000L, s"axes: ${x1(0)}, ${x2(1)}, ${x3(2)}")
    // comp 3 deflated off BOTH earlier axes — the slack is double the
    // single-deflation one because comp 3 accumulates TWO deflations'
    // floor noise (measured: dim-2 leftover ≈ −6012 of the ±10⁶ scale,
    // i.e. ~0.6%, re-amplified by 8 iterations on the deflated matrix)
    assert(math.abs(x3(0)) <= 10000L && math.abs(x3(1)) <= 10000L,
      s"comp3 must be deflated off dims 1 and 2: ${x3(0)}, ${x3(1)}")
    // eigenvalues sit at the a-units variances, within floor slack
    assert(lam1 >= 833328L && lam1 <= 833333L, s"lam1 $lam1")
    assert(lam2 >= 333323L && lam2 <= 333343L, s"lam2 $lam2")
    assert(lam3 >= 166656L && lam3 <= 166676L, s"lam3 $lam3")
    // the sizing series: residual variance strictly decays and ends at
    // the quantization floor once all real variance is extracted
    assert(r1 > r2 && r2 > r3, s"residuals must decay: $r1, $r2, $r3")
    assert(r1 >= 499000L && r1 <= 503000L, s"r1 ≈ 333333 + 166666: $r1")
    assert(r2 >= 166000L && r2 <= 170000L, s"r2 ≈ 166666: $r2")
    assert(math.abs(r3) <= 3000L, s"r3 must be the floor noise: $r3")
  }

  test("q293 whitening plan: hand-grid sizing law — on the three-variance " +
      "diagonal grid with a 20% threshold the plan keeps exactly the two " +
      "components whose preceding residual still exceeds it") {
    import spark.implicits._
    // total a-units trace = 833333+333333+166666 = 1333332; residual
    // micro fractions: before comp1 ≈ 999999, before comp2 ≈ 375k,
    // before comp3 ≈ 125k — so thr 200000 keeps comps 1-2 and sizes
    // the whitened output at n_keep = 2
    val grid = Seq(
      (1L, 1L, 5000000L), (2L, 2L, 2000000L), (3L, 3L, 1000000L))
      .toDF("i", "j", "cov_num")
    val rows = Similarity.whiteningPlanOf(spark, grid, 3, 200000L)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(1L, 1L, 0L),
      s"keep verdicts must be (1,1,0): $rows")
    assert(rows.forall(_._3 == 2L), s"n_keep must be 2 on every row: $rows")
  }

  test("q64 LSH occupancy sizing: the width grows with log(n), floors at " +
      "the sweep SFs' literal 4, and the auto-sized query equals the " +
      "fixed-width one where they coincide") {
    // the sizing law: 2^bits tracks n/125, so candidate work stays
    // ~n·occupancy (fixed width measured alpha10 = +1.73 at sf1)
    assert(Similarity.lshBitsFor(500) == 4)
    assert(Similarity.lshBitsFor(2000) == 4)
    assert(Similarity.lshBitsFor(20000) == 8)
    assert(Similarity.lshBitsFor(2000000) == 14)
    val dir = "/root/testdata/sf0.001"
    def rows(bits: Int) =
      Similarity.embeddingNearDupLsh(spark, dir, threshold = 0.5,
        bits = bits, tables = 8)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(-4) == rows(4),
      "auto sizing must reproduce the literal width below the floor")
  }

  test("q294 kept-basis projection: coordinates equal independent dot " +
      "products on exactly the q293-kept components, via a zero-exchange " +
      "map-only plan") {
    val dir = "/root/testdata/sf0.001"
    val kept = Similarity.whiteningPlan(spark, dir).collect()
      .filter(_.getLong(4) == 1L).map(_.getLong(0)).toSet
    assert(kept.nonEmpty, "component 1 is always kept at a sane threshold")
    val proj = Similarity.keptBasisProjection(spark, dir)
    val p = proj.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the whitened pass must be one map-only corpus scan:\n$p")
    val got = proj.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keys.map(_._2).toSet == kept,
      s"emitted components ${got.keys.map(_._2).toSet} != kept $kept")
    val loadings = Similarity.eigenTopKPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), z -> cast(round(z * 1000) as long)) xq")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .filter(_._2.length == Similarity.covDims)
    assert(vecs.nonEmpty)
    for ((id, xq) <- vecs.take(30); c <- kept) {
      val want = xq.zip(loadings(c)).map { case (a, b) => a * b }.sum
      assert(got((id, c)) == want, s"vec $id comp $c: ${got((id, c))} != $want")
    }
  }

  test("q292 consistency: components 1–2 of the top-k chain are " +
      "bit-identical to the q290 top-2 chain on the real fixture") {
    val dir = "/root/testdata/sf0.001"
    val grid = Similarity.embeddingCovariance(spark, dir)
    val topk = Similarity.eigenTopK(grid, 3)
    val ((y1, m1), (y2, m2)) = Similarity.eigenVectorsOf(grid)
    assert(topk(0)._1.toSeq == y1.toSeq && topk(0)._2 == m1)
    assert(topk(1)._1.toSeq == y2.toSeq && topk(1)._2 == m2)
  }

  test("eigen chain reads the promoted grid: eigenVectorsOf accepts a " +
      "DECIMAL(38,0) cov_num and matches the BIGINT-grid chain where " +
      "both are exact") {
    // same data, both forms forced — the BigInt rescale must make the
    // chain form-independent wherever BIGINT was exact
    val dir = "/root/testdata/sf0.001"
    val cells = Similarity.covCells(Similarity.kmQuantized(spark, dir))
    val gL = Similarity.covAssemble(cells, decimalNum = Some(false))
    val gD = Similarity.covAssemble(cells, decimalNum = Some(true))
    assert(gD.schema("cov_num").dataType == DecimalType(38, 0))
    val ((x1L, l1L), (x2L, l2L)) = Similarity.eigenVectorsOf(gL)
    val ((x1D, l1D), (x2D, l2D)) = Similarity.eigenVectorsOf(gD)
    assert(x1L.toSeq == x1D.toSeq && l1L == l1D)
    assert(x2L.toSeq == x2D.toSeq && l2L == l2D)
  }
}
