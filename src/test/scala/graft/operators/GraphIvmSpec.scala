package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q130 (integer PageRank) and q131 (delta-join maintenance)
  * semantics on fixtures where the property is hand-checkable.
  */
class GraphIvmSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: well-connected entities outrank peripheral ones; ranks are exact ints") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.pageRank(spark, dir)
      .select("entity", "entity_id", "rank")
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    // both entity spaces present, ids disjointly recovered
    assert(out.exists(_._1 == "customer") && out.exists(_._1 == "supplier"))
    // every node appears exactly once
    assert(out.map(r => (r._1, r._2)).distinct.length == out.length)
    // all ranks positive and above the damping floor
    assert(out.forall(_._3 >= 150000L))
    // centrality varies (the graph isn't degree-regular): max > min
    assert(out.map(_._3).max > out.map(_._3).min)
  }

  test("pagerank: degree monotonicity on a hand-built star (hub outranks leaves)") {
    // star: customer 1 ordered from suppliers 1..4; supplier 1 also
    // serves customer 2 — supplier 1 (deg 2) must outrank suppliers
    // 2..4 (deg 1), and the hub customer 1 (deg 4) must outrank all
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L), (14L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L), (14L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    // replicate the operator core on the synthetic edge tables
    val pairs = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst")).distinct()
    val edges = pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to 3)
      ranks = edges.join(ranks, edges("src") === ranks("node")).join(deg, "src")
        .select(col("dst"), expr("(rank * 85) div (outdeg * 100)").as("c"))
        .groupBy(col("dst")).agg((lit(150000L) + sum(col("c"))).as("rank"))
        .select(col("dst").as("node"), col("rank"))
    val r = ranks.as[(Long, Long)].collect().toMap
    val hub = r(2L) // customer 1
    val s1 = r(3L) // supplier 1 (deg 2)
    val leaf = r(5L) // supplier 2 (deg 1)
    assert(hub > s1 && s1 > leaf, s"expected hub > s1 > leaf, got $r")
  }

  test("delta-join maintenance equals the scratch join (the IVM contract)") {
    val dir = "/root/testdata/sf0.001"
    val incr = PipelineOps.deltaJoinMaintenance(spark, dir)
    val scratch = graft.Tables.load(spark, dir, "orders")
      .join(graft.Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(incr.columns.map(col): _*)
    // cell-exact both directions (multiset equality via exceptAll)
    assert(incr.exceptAll(scratch).isEmpty && scratch.exceptAll(incr).isEmpty)
    // the fixture genuinely exercises every delta class: base-base,
    // delta-order, delta-customer, and delta-delta rows all exist
    val o9 = col("o_orderkey") % 10 === 9
    val c9 = col("o_custkey") % 10 === 9
    assert(incr.filter(!o9 && !c9).count() > 0)
    assert(incr.filter(o9 && !c9).count() > 0)
    assert(incr.filter(!o9 && c9).count() > 0)
  }
}

/** q135's geometry contract: a JL sign projection approximately
  * preserves pairwise distance on average — checked loosely (the JL
  * bound is probabilistic) — and the projection is a shuffle-free
  * per-row map.
  */
class JlProjectionSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("jl projection is shuffle-free and roughly preserves pairwise distances") {
    val dir = "/root/testdata/sf0.001"
    val plan = Similarity.jlProject(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be a pure map:\n$plan")
    val p = Similarity.jlProject(spark, dir).limit(40).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getDouble).toArray).toMap
    val v = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id").isin(p.keySet.toSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().map { case (id, e) => id -> e.toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = p.keySet.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      orig = d2(v(ids(i)), v(ids(j))) if orig > 1e-9
    } yield d2(p(ids(i)), p(ids(j))) / orig
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.size
    // E[ratio] = 1 under the JL scaling; allow a generous band
    assert(mean > 0.5 && mean < 2.0, s"mean distortion $mean")
  }

  test("jl coarse retrieval: candidates bound the exact stage; recall vs brute force is sane") {
    val dir = "/root/testdata/sf0.001"
    val two = Similarity.jlCoarseRetrieval(spark, dir)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(two.nonEmpty)
    // ranks are 1..k per query, and every emitted row passed the
    // coarse stage (coarse_rank <= candK is enforced pre-re-rank)
    val brute = Similarity.bruteForceTopK(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val hit = two.count { case (q, n, _) => brute.contains((q, n)) }
    // 16 of 64 dims keeps coarse recall MODERATE by design (measured
    // 0.4 on this fixture); the pin is a beats-random floor — random
    // 50-of-499 candidates would recover ~0.1 of the exact top-k, so
    // 0.25 = 2.5x random catches a broken projection or candidate
    // bound without overclaiming sketch quality
    assert(hit.toDouble / two.length >= 0.25,
      s"coarse-stage recall ${hit.toDouble / two.length} not better than random")
  }
}
