package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract's registry invariants WITHOUT a
  * SparkSession: the correctness gate only checks queries that have
  * oracles, so a query silently missing its oracle entry would pass
  * the driver as a weaker rows-only check — this spec makes that
  * drift a test failure instead.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries whose oracles are trained-literal gated: the SQL exists
    * only after the query ran in the same JVM (Verify's evaluation
    * order), so before training they are legitimately absent from
    * `oracleSql`. Adding a query here requires the same Option-gated
    * generator pattern — anything else missing an oracle is a bug.
    */
  private val trainedGated = Set(
    "q07_joinkey_index",
    "q49_ann_ivf_trained", "q77_pq_adc", "q79_ann_ivfpq",
    "q81_cluster_diversity_sample", "q83_ann_ivf_indexed",
    "q84_semantic_dedup", "q87_stream_ivf_index",
    "q91_ivf_index_compact", "q99_semantic_decontaminate",
    "q108_ann_sq8", "q134_embedding_drift", "q137_stream_embedding_drift",
    "q144_ivf_range_search", "q257_ivf_rebalance_plan",
    "q261_stream_ivf_occupancy", "q269_ivf_index_delete",
    "q278_erasure_audit")

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("every query has an oracle, except (at most) the trained-gated set") {
    // SUBSET, not equality: a gated oracle becomes EAGER once any
    // suite in the same JVM has built its query (training populates
    // the cache — PlanSpec does exactly that), so under sbt's
    // concurrent suite execution the `trainedGated -- missing` side is
    // run-order-dependent. The invariant that matters — no query ever
    // silently downgrades to a rows-only check — is the subset
    // direction, plus gated names staying real queries.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.subsetOf(trainedGated),
      s"unexpected oracle-less queries: ${(missing -- trainedGated).toSeq.sorted}")
    val stale = trainedGated -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"trainedGated names that are not queries: ${stale.toSeq.sorted}")
  }

  test("query names are well-formed and unique by number") {
    val names = SparkEntry.queries.keySet.toSeq
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
    val nums = names.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
  }
}
