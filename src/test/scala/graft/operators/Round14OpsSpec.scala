package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-14 operator families that the cell-exact
  * oracle cannot express as single-query checks: conservation laws
  * across rows and cross-operator consistency.
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q229: the move plan CONSERVES rows — moves sum to total excess AND total deficit") {
    val plan = PipelineOps.shardRebalancePlan(spark, dir)
      .select("from_day", "to_day", "n_rows_moved")
      .as[(String, String, Long)].collect()
    assert(plan.nonEmpty)
    assert(plan.forall(_._3 > 0), "zero/negative move emitted")
    // recompute donors/receivers from first principles
    val byDay = graft.Tables.events(spark, dir).filter(col("ts").isNotNull)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt")).as[(String, Long)].collect().sortBy(_._1)
    val total = byDay.map(_._2).sum
    val n = byDay.length
    val targets = byDay.zipWithIndex.map { case ((d, c), i) =>
      (d, c, total / n + (if (i < (total % n)) 1L else 0L))
    }
    val excess = targets.collect { case (_, c, t) if c > t => c - t }.sum
    val deficit = targets.collect { case (_, c, t) if t > c => t - c }.sum
    assert(excess == deficit) // the exact-target construction guarantees it
    assert(plan.map(_._3).sum == excess, "moved rows != total excess")
    // per-donor outflow equals its excess; per-receiver inflow its deficit
    val outBy = plan.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val inBy = plan.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for ((d, c, t) <- targets if c > t)
      assert(outBy.getOrElse(d, 0L) == c - t, s"donor $d outflow")
    for ((d, c, t) <- targets if t > c)
      assert(inBy.getOrElse(d, 0L) == t - c, s"receiver $d inflow")
  }

  test("q236: allocations are capped, ordered greedily, and sum to min(budget, capacity)") {
    val rows = PipelineOps.epochAllocator(spark, dir)
      .select("rank", "size_tok", "capacity", "alloc_tok")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum * 2
    val capTotal = rows.map(_._3).sum
    assert(rows.forall { case (_, _, cap, a) => a >= 0 && a <= cap })
    assert(rows.map(_._4).sum == math.min(budget, capTotal))
    // greedy: once a source is partially filled, every later source is empty
    val firstPartial = rows.indexWhere { case (_, _, cap, a) => a < cap }
    if (firstPartial >= 0)
      assert(rows.drop(firstPartial + 1).forall(_._4 == 0L), "fill after the partial source")
  }

  test("q220/q221: the live packing cursor converges to the batch manifest") {
    val batch = graft.SparkEntry.queries("q220_source_packing")(spark, dir)
      .collect().map(_.toSeq).toSet
    val live = graft.SparkEntry.queries("q221_stream_source_packing")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && live == batch)
  }

  test("q234: recall is in [0,1] and n_hits <= n_ref for every query") {
    val r = Similarity.annRecallEval(spark, dir)
      .select("n_ref", "n_hits", "recall").as[(Long, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (ref, hits, rec) =>
      hits >= 0 && hits <= ref && rec >= 0.0 && rec <= 1.0 })
  }

  test("q240: the merged partials conserve the corpus — no vector lost between base and delta") {
    val got = Similarity.kmeansIncremental(spark, dir)
      .agg(sum(col("n_base")), sum(col("n_delta"))).as[(Long, Long)].head()
    val all = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull &&
        forall(col("embedding").cast("array<double>"), x => x.isNotNull))
      .count()
    assert(got._1 + got._2 == all, s"partials lose rows: $got vs $all")
  }
}
