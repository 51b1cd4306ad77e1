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
    "q108_ann_sq8", "q134_embedding_drift", "q137_stream_embedding_drift")

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("every query has an oracle, except exactly the trained-gated set") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == trainedGated,
      s"unexpected oracle-less queries: ${(missing -- trainedGated).toSeq.sorted}; " +
        s"gated entries that now have eager oracles: ${(trainedGated -- missing).toSeq.sorted}")
  }

  test("query names are well-formed and unique by number") {
    val names = SparkEntry.queries.keySet.toSeq
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
    val nums = names.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
  }
}
