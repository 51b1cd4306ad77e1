package graft.operators

import graft.SparkSpec

/** Pins q145's keep policy on the sf0.001 fixture: exactly one
  * canonical survivor per cluster, the survivor has the cluster's max
  * quality (ties to the lower doc_id), and the reasons partition the
  * verdicts.
  */
class DedupDecisionsSpec extends SparkSpec {

  test("one keep per cluster; survivor is the best-quality member; reasons consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.dedupDecisions(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
    assert(rows.nonEmpty)
    // every document appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    val byCluster = rows.groupBy(_._2)
    // exactly one keep per cluster, and it IS the kept_doc column
    for ((_, ms) <- byCluster) {
      assert(ms.count(_._4) == 1)
      val keeper = ms.find(_._4).get
      assert(ms.forall(_._3 == keeper._1))
    }
    // reasons: singletons 'unique'; keepers in multi-clusters 'canonical';
    // losers 'duplicate_of_better'
    for ((_, ms) <- byCluster) {
      if (ms.length == 1) assert(ms.head._5 == "unique")
      else ms.foreach { m =>
        assert(m._5 == (if (m._4) "canonical" else "duplicate_of_better"))
      }
    }
    // survivor quality dominates: re-derive quality and check the argmax
    val qual = TextAnalysis.qualityScores(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    for ((_, ms) <- byCluster if ms.length > 1) {
      val keeper = ms.find(_._4).get
      val best = ms.map(m => (qual(m._1), -m._1)).max
      assert((qual(keeper._1), -keeper._1) == best)
    }
    // the fixture actually exercises the multi-member path
    assert(byCluster.exists(_._2.length > 1))
  }
}
