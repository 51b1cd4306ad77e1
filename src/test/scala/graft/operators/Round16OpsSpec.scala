package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-16 operator families that the cell-exact
  * oracle cannot express as single-query checks: exact-quota
  * conservation, chooser laws, coverage/overlap structure, and the
  * erasure audit's structural zeros.
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q279: the eval split holds out EXACTLY N div 10 documents, " +
      "and every stratum's take is within 1 of its proportional share") {
    val split = PipelineOps.stratifiedSplit(spark, dir).localCheckpoint(true)
    val n = split.count()
    val k = split.filter(col("is_eval") === 1).count()
    assert(k == n / 10, s"largest remainder must hit the target exactly: $k vs ${n / 10}")
    // per-stratum: quota ∈ {floor(n_s·T/N), floor+1}
    val per = split.groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n_s"),
        sum(col("is_eval").cast("long")).as("k_s"))
      .as[(String, Long, Long, Long)].collect()
    for ((src, lb, ns, ks) <- per) {
      val base = ns * (n / 10) / n
      assert(ks == base || ks == base + 1,
        s"stratum ($src, $lb): took $ks, proportional base $base")
    }
  }

  test("q280: the keep-list is a quality-prefix — no kept doc ranks " +
      "below a dropped one within its source, and kept tokens fit the budget") {
    val kl = PipelineOps.budgetKeepList(spark, dir).localCheckpoint(true)
    val bySrc = kl.select(col("source"), col("quality_micro"), col("doc_id"),
        col("n_tok"), col("is_kept"))
      .as[(String, Long, Long, Long, Int)].collect().groupBy(_._1)
    for ((_, rows) <- bySrc) {
      val ordered = rows.sortBy(r => (-r._2, r._3)) // the selection order
      val flags = ordered.map(_._5)
      assert(!flags.sliding(2).filter(_.length == 2)
        .exists { case Array(a, b) => a == 0 && b == 1 },
        "a dropped doc may never be followed by a kept one in selection order")
      assert(ordered.filter(_._5 == 1).map(_._4).sum <= 800L)
    }
  }

  test("q276: exactly one ladder config is chosen and it is the " +
      "smallest meeting one; waste falls as max_len tightens toward the corpus") {
    val plan = PipelineOps.paddingPlan(spark, dir)
      .orderBy(col("max_len"))
      .select(col("max_len"), col("trunc_micro"), col("meets"), col("is_chosen"))
      .as[(Long, Long, Long, Int)].collect()
    assert(plan.count(_._4 == 1) == 1)
    val chosen = plan.find(_._4 == 1).get
    assert(plan.filter(_._3 == 1).map(_._1).min == chosen._1)
    // truncation loss is monotone non-increasing in max_len
    assert(plan.sliding(2).forall { case Array(a, b) => b._2 <= a._2 })
  }

  test("q274/q277: chunks cover every document exactly (first starts at 0, " +
      "last ends at n_tok, consecutive starts step by the stride)") {
    val ch = PipelineOps.chunkPlan(spark, dir)
      .select(col("doc_id"), col("n_tok"), col("chunk_idx"),
        col("start_tok"), col("end_tok"))
      .as[(Long, Long, Long, Long, Long)].collect().groupBy(_._1)
    for ((_, rows) <- ch) {
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._4 == 0L)
      assert(sorted.last._5 == sorted.head._2, "last chunk must end at n_tok")
      assert(sorted.sliding(2).filter(_.length == 2).forall { case Array(a, b) =>
        b._4 - a._4 == PipelineOps.chunkStride }, "stride steps")
      assert(sorted.forall(r => r._5 - r._4 <= PipelineOps.chunkLen))
    }
  }

  test("q278: the audit's structural laws hold from the files — zero " +
      "survivors everywhere and n_after + n_deleted = n_before") {
    val audit = Similarity.erasureAudit(spark, dir)
      .select(col("bucket"), col("n_before"), col("n_after"),
        col("n_deleted"), col("n_surviving"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(audit.nonEmpty)
    assert(audit.forall(_._5 == 0L), "a surviving match is a delete bug")
    assert(audit.forall(r => r._2 == r._3 + r._4))
  }

  test("q283: covariance grid laws — full upper triangle, non-negative " +
      "variance numerators on the diagonal, hand-checked cell exactness") {
    val grid = Similarity.embeddingCovariance(spark, dir)
      .select(col("i"), col("j"), col("n"), col("s_ij"), col("s_i"),
        col("s_j"), col("cov_num"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val d = Similarity.covDims.toLong
    assert(grid.length == (d * (d + 1) / 2).toInt, "one row per i <= j pair")
    assert(grid.forall(r => r._1 <= r._2))
    // diagonal: cov_num = n·Σx² − (Σx)² = n²·var ≥ 0, and s_i == s_j
    val diag = grid.filter(r => r._1 == r._2)
    assert(diag.length == d.toInt)
    assert(diag.forall(r => r._7 >= 0L), "a negative variance numerator is arithmetic breakage")
    assert(diag.forall(r => r._5 == r._6))
    assert(grid.map(_._3).distinct.length == 1, "every pair sees every dense row")
  }

  test("q283: the grid's sufficient statistics are MERGEABLE partials — " +
      "grid(A ∪ B) = cellwise sum of grid(A) and grid(B) (the 100 TB sharding law)") {
    val x = Similarity.kmQuantized(spark, dir).localCheckpoint(true)
    val a = x.filter(col("vec_id") % 2 === 0).drop("vec_id")
    val b = x.filter(col("vec_id") % 2 =!= 0).drop("vec_id")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Similarity.covGrid(df)
        .select(col("i"), col("j"), col("n"), col("s_ij"), col("s_i"), col("s_j"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val (ga, gb, gu) = (cells(a), cells(b), cells(x.drop("vec_id")))
    assert(gu.keySet == ga.keySet.union(gb.keySet))
    for ((k, (n, sij, si, sj)) <- gu) {
      val (na, sija, sia, sja) = ga.getOrElse(k, (0L, 0L, 0L, 0L))
      val (nb, sijb, sib, sjb) = gb.getOrElse(k, (0L, 0L, 0L, 0L))
      assert((na + nb, sija + sijb, sia + sib, sja + sjb) == (n, sij, si, sj),
        s"cell $k must merge exactly")
    }
  }

  test("q285: drop verdicts on a hand grid — a perfectly correlated pair " +
      "drops exactly its HIGHER index, thresholds gate, micro values exact") {
    // 3 dims over x1=[1,2,3], x2=2·x1, x3=[5,3,9]:
    // var: 6, 24, 56; cov12=12 (corr²=1e6), cov13=12, cov23=24
    // (both cross corr² = 144e6/336 = 576e6/1344 = 428571.42… → 428571)
    val grid = Seq(
      (1L, 1L, 3L, 14L, 6L, 6L, 6L), (2L, 2L, 3L, 56L, 12L, 12L, 24L),
      (3L, 3L, 3L, 115L, 17L, 17L, 56L), (1L, 2L, 3L, 28L, 6L, 12L, 12L),
      (1L, 3L, 3L, 38L, 6L, 17L, 12L), (2L, 3L, 3L, 76L, 12L, 17L, 24L))
      .toDF("i", "j", "n", "s_ij", "s_i", "s_j", "cov_num")
    val plan = Similarity.decorrelationPlanOf(grid, thrMicro = 900000L)
      .select(col("d"), col("max_corr2_micro"), col("n_flagged"), col("is_dropped"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plan.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 1000000L, 1L, 0L),  // lowest index of the correlated pair survives
      (2L, 1000000L, 1L, 1L),  // its higher-indexed twin is dropped
      (3L, 428571L, 0L, 0L)))  // below threshold: kept, zero flags
  }

  test("q286: the incrementally maintained grid equals the from-scratch " +
      "grid cell-for-cell (base cells + delta cells, base never rescanned)") {
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("i"), col("j"), col("n"), col("s_ij"), col("s_i"),
          col("s_j"), col("cov_num"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(cells(Similarity.covarianceIvmDelta(spark, dir)) ==
      cells(Similarity.embeddingCovariance(spark, dir)))
  }

  test("q287: replaying an already-applied delete batch is a NO-OP — " +
      "post-delete store file identity unchanged (at-least-once safety)") {
    val files = Similarity.streamIndexDeletes(spark, dir)
      .inputFiles // the working copy's bucket files
    assert(files.nonEmpty)
    val out = new java.io.File(new java.net.URI(files.head))
      .getParentFile.getParent // strip file + bucket=N
    def snap() = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(f => (f.getPath, f.length, f.lastModified)).toSet
    val before = snap()
    // the full original request set arrives again (a replayed topic)
    val ids = Similarity.emb(spark, dir)
      .filter(col("vec_id") % 13 === 0).select(col("vec_id"))
    Similarity.deleteIdsFromIndex(spark, out, ids)
    assert(snap() == before,
      "re-deleting absent ids must not touch a single file")
  }

  test("q288: no erased id is ever served, and each query's ranks " +
      "re-close contiguously over the survivors") {
    val got = Similarity.postErasureServing(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(!got.exists(_._2 % 17 == 0),
      "an erased vector returned from serving is a compliance bug")
    for ((_, rows) <- got.groupBy(_._1))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "ranks must re-close over survivors with no gaps")
  }

  test("q285: fixture-wide structural laws — every dim planned, verdicts " +
      "are 0/1, positive variance everywhere") {
    val plan = Similarity.decorrelationPlan(spark, dir)
      .select(col("d"), col("var_num"), col("is_dropped"))
      .as[(Long, Long, Long)].collect()
    assert(plan.length == Similarity.covDims)
    assert(plan.forall(r => r._3 == 0L || r._3 == 1L))
    assert(plan.forall(_._2 > 0L), "a zero-variance fixture dim would be a generator bug")
  }
}
