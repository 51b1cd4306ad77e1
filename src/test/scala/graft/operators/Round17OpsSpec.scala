package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 pins: the q289 libm floor-boundary margin (r16 advice 4). */
class Round17OpsSpec extends SparkSpec {

  test("q289 draw chain: no micro-quantized draw lands near a floor " +
      "boundary at the oracle SF (libm 1-ulp divergence cannot flip a cell)") {
    // q289's cell-exactness rests on java.lang.Math.log (Spark) and
    // DuckDB's libm ln agreeing through ONE IEEE chain before a single
    // floor(·1e6). The chains are identical op sequences, but the ln
    // implementations are different code — this pin measures the actual
    // margin: the distance from every pre-floor draw to its nearest
    // integer, in ulps of the draw. A libm that diverges by k ulps can
    // only flip a floor whose input sits within k ulps of a boundary;
    // asserting a ≥10⁴-ulp margin at the oracle SF turns a platform/libm
    // change from a bench-time cell mismatch into this test failing.
    val dir = "/root/testdata/sf0.01"
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
    val u = (graft.functions.md5_long(col("event_id")) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    val d = ev.select((log(u)
      / greatest(coalesce(col("value"), lit(0.0)), lit(0.05))
      * lit(1000000.0)).as("d"))
      .collect().map(_.getDouble(0))
    assert(d.nonEmpty)
    val minMarginUlps = d.map { v =>
      val dist = math.min(v - math.floor(v), math.ceil(v) - v)
      dist / java.lang.Math.ulp(v)
    }.min
    assert(minMarginUlps > 1e4,
      f"a draw sits $minMarginUlps%.0f ulps from a floor boundary — " +
        "q289's cross-libm exactness margin has collapsed")
  }

  test("q290 eigen plan: hand-grid law — on a diagonal grid the deflated " +
      "power iteration recovers the known eigenstructure within " +
      "quantization slack") {
    import spark.implicits._
    // diagonal covariance grid with variances 5e6 > 2e6 > 1e6 (dims
    // 1..3; the remaining dims of the fixed D×D frame carry zero rows):
    // eigenvectors are the axes in closed form, eigenvalues the
    // diagonal. After rescale sA = 5e6 div 1e6 + 1 = 6 the a-units
    // diagonal is (833333, 333333, 166666); 8 iterations decay the
    // off-axis residual of comp 1 by (2/5)^8 ≈ 6.6e-4.
    val grid = Seq(
      (1L, 1L, 5000000L), (2L, 2L, 2000000L), (3L, 3L, 1000000L))
      .toDF("i", "j", "cov_num")
    val out = Similarity.eigenPlanOf(spark, grid)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val comp1 = out.filter(_._1 == 1L)
    val comp2 = out.filter(_._1 == 2L)
    assert(comp1.length == Similarity.covDims && comp2.length == Similarity.covDims)

    val l1 = comp1.map(r => r._2 -> r._3).toMap
    // dominant component concentrates on dim 1 at the ±10⁶ scale
    assert(math.abs(l1(1L)) >= 999000L, s"comp1 dim1 loading: ${l1(1L)}")
    assert(math.abs(l1(2L)) <= 700L && math.abs(l1(3L)) <= 50L,
      s"comp1 residuals must decay by (v_k/v_1)^8: ${l1(2L)}, ${l1(3L)}")
    // eigenvalue = the a-units variance of dim 1, within floor slack
    val lam1 = comp1.head._4
    assert(lam1 >= 833333L - 5L && lam1 <= 833333L,
      s"comp1 Rayleigh must sit at the dominant a-units variance: $lam1")

    // after deflation, comp 2 concentrates on dim 2 with ITS variance
    val l2 = comp2.map(r => r._2 -> r._3).toMap
    assert(math.abs(l2(2L)) >= 999000L, s"comp2 dim2 loading: ${l2(2L)}")
    assert(math.abs(l2(1L)) <= 5000L && math.abs(l2(3L)) <= 5000L,
      s"comp2 must be deflated off dim 1 and decayed off dim 3: " +
        s"${l2(1L)}, ${l2(3L)}")
    val lam2 = comp2.head._4
    assert(lam2 >= 333333L - 10L && lam2 <= 333333L + 10L,
      s"comp2 Rayleigh must sit at the second a-units variance: $lam2")
  }

  test("covariance grid: the DECIMAL(38,0) numerator form (the 100 TB " +
      "path) equals the BIGINT form cell-for-cell at test scale") {
    // only the final D²-bounded cov_num arithmetic differs — the raw
    // cells and the mergeability law are shared — so wherever BIGINT
    // is exact (n below ~10⁶-10⁷ rows) the two forms must agree
    // exactly; past that bound a deployment promotes to the decimal
    // form with zero change to the data pass
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val cells = Similarity.covCells(Similarity.kmQuantized(spark, dir))
    def grid(dec: Boolean) = Similarity.covAssemble(cells, decimalNum = Some(dec))
      .select(col("i"), col("j"), col("cov_num").cast("long").as("cn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(grid(dec = false) == grid(dec = true))
  }

  test("q291 projection wiring: the literal-sum coordinates equal an " +
      "independent driver-side dot product of the q290 loadings") {
    // pins the 64-term getItem·literal expression construction (an
    // off-by-one in the item index or a dropped term would corrupt all
    // coordinates identically and could survive a smoke check): the
    // engine's p1/p2 must equal dot products computed OUTSIDE Spark
    // from the same loadings and the same quantized vectors
    val dir = "/root/testdata/sf0.001"
    val loadings = Similarity.eigenPlan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val x1 = loadings.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val x2 = loadings.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    val got = Similarity.pcaProjection(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), z -> cast(round(z * 1000) as long)) xq")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .filter(_._2.length == Similarity.covDims)
    assert(vecs.nonEmpty && got.size == vecs.length)
    for ((id, xq) <- vecs.take(50)) {
      val want = (xq.zip(x1).map { case (a, b) => a * b }.sum,
        xq.zip(x2).map { case (a, b) => a * b }.sum)
      assert(got(id) == want, s"vec $id: ${got(id)} != $want")
    }
  }
}
