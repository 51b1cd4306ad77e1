package graft

/** Pins the physical-plan properties the scale design depends on: these
  * assert the plan SHAPE (shuffle count, broadcast choice, pushdown,
  * top-k operator), so a regression that silently de-optimizes a query
  * fails a test even though results stay correct.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("map-only operators have zero shuffles (hash split, simhash, minhash sigs, text metrics, frame sample)") {
    for (q <- Seq("q39_hash_split", "q22_dedup_simhash", "q24_dedup_minhash_sigs",
        "q16_text_tokens", "q17_text_quality", "q18_text_langid",
        "q19_text_fingerprint", "q28_multimodal_meta", "q44_frame_sample",
        "q51_text_repetition", "q52_pii_scan", "q89_pii_redact",
        "q62_zorder_key", "q63_winnowing", "q70_doc_chunks")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should be shuffle-free:\n$p")
    }
  }

  test("q103's Avro serde round-trip adds no exchange over the plain join (q01)") {
    val p103 = plan("q103_avro_denorm")
    val p01 = plan("q01_denorm_inner")
    // the serde pair is a per-row map between scan and join: any extra
    // shuffle would mean the encode/decode boundary broke the plan shape
    assert("Exchange".r.findAllIn(p103).size == "Exchange".r.findAllIn(p01).size,
      s"q103 should shuffle exactly as q01 does:\n$p103")
  }

  test("binned range join plans as a broadcast hash join, not a nested loop") {
    val p = plan("q40_incident_range_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("star join broadcasts the dimension chain") {
    val p = plan("q12_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q10_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), p) // a Sort node would print as "Sort [ordering...]"
  }

  test("filter and projection reach the parquet scan") {
    val p = plan("q13_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type"), p)
  }

  test("sequence packing shuffles exactly once (the bucket shard)") {
    val p = plan("q53_sequence_packing")
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("aggregations partial-aggregate before the exchange") {
    val p = plan("q09_agg_pricing")
    // the map-side combine prints its functions as partial_*; a plan
    // that shuffles full rows to a single final aggregate has none
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("stratified sample's literal rank bound plans as a WindowGroupLimit") {
    // the pre-shuffle partial top-k is what keeps the exchange at
    // O(partitions·strata·k) rows instead of the whole corpus
    val p = plan("q56_stratified_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("cluster diversity sample: partial top-quota + map-side assignment") {
    // same partial top-k contract as q56, stacked on the pinned
    // max_by assignment — the per-bucket exchange carries at most
    // partitions·clusters·quota rows, never the corpus
    val p = plan("q81_cluster_diversity_sample")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("partial_max_by"), p)
  }

  test("bloom probe joins the bounded bit table by broadcast") {
    val p = plan("q57_bloom_prune")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("mixture sampler: bounded rate table broadcasts; totals partial-aggregate") {
    // the only corpus-sized work is the map-side totals aggregation and
    // the final per-row verdict; the rate table (one row per source)
    // must come back as a broadcast, never a shuffle of the corpus
    val p = plan("q71_mixture_sample")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("hard-negative mining: literal rank-1 windows plan as WindowGroupLimit") {
    // per-partition top-1 before the shuffle — the corpus never rides
    // the exchange; only each partition's best candidate per query does
    val p = plan("q76_hard_negatives")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("PQ/IVF-PQ top-k plans as WindowGroupLimit (partial top-k before the exchange)") {
    for (q <- Seq("q77_pq_adc", "q79_ann_ivfpq")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q:\n$p")
    }
  }

  test("IVF assignment partial-aggregates the xC candidate rows before the exchange") {
    // the broadcast join inflates the corpus ×C; a window formulation
    // would shuffle all C rows per vector — the max_by aggregate must
    // collapse them map-side so the exchange carries corpus×1 rows
    for (q <- Seq("q26_ann_ivf", "q49_ann_ivf_trained")) {
      val p = plan(q)
      assert(p.contains("partial_max_by"), s"$q assignment must map-side combine:\n$p")
      // the explicit null-embedding drop (ivfAssign's visible contract)
      // must reach the parquet scan as a pushed filter — null rows never
      // leave the scan, and the filter can't silently detach from the
      // oracle's mirrored `v IS NOT NULL` in a refactor
      assert(p.contains("IsNotNull(embedding)"),
        s"$q: null-embedding filter not pushed to the scan:\n$p")
    }
  }

  test("q104 water-filling: one corpus scan at runtime; data-sized work stops at the bounded aggregate") {
    val df = SparkEntry.queries("q104_token_budget_mix")(spark, dir)
    // finalize AQE on THIS queryExecution (a write would plan a clone)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the lam (level) side must REUSE the totals shuffle, not re-scan
    // the corpus — AQE's exchange reuse is the plan property that makes
    // the two-sided formulation a single scan at 100 TB
    assert(p.contains("ReusedExchange"),
      s"q104's level side should reuse the totals exchange:\n$p")
    // the single-partition exchange carries only the per-source
    // aggregate (it sits ABOVE the groupBy), and the level is a
    // TakeOrdered limit=1, not a global sort
    assert(p.contains("TakeOrderedAndProject(limit=1"), p)
    // map-side partial aggregation before the only data-sized shuffle
    assert(p.contains("partial_sum"), p)
  }

  test("persisted IVF index read-back is dynamic-partition-pruned to the probed buckets") {
    // the q83 scale contract: the index scan must carry a
    // dynamicpruningexpression partition filter fed by the broadcast
    // probe side — unprobed buckets' files are never opened, so a query
    // batch reads ~nprobe/C of the stored index, not all of it
    val p = plan("q83_ann_ivf_indexed")
    assert(p.contains("dynamicpruningexpression"),
      s"q83 index scan must be DPP-pruned on bucket:\n$p")
    assert(p.contains("PartitionFilters"), p)
  }

  test("day-partitioned probe is statically pruned to the requested range") {
    // the q97 scale contract: the literal day range must resolve
    // against the partition listing at PLAN time — the scan's
    // PartitionFilters carry the range, so out-of-range days' files
    // are never listed into the scan
    val df = SparkEntry.queries("q97_day_partition_prune")(spark, dir)
    val exec = df.queryExecution.executedPlan match {
      // AQE hides the inner tree from collect(); the scan and its
      // partition filters exist in the initial plan already
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val scans = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"q97 scan must carry partition filters:\n${df.queryExecution.executedPlan}")
    // 30 days in the fixture; the [20240108, 20240114] probe must list 7
    assert(scan.selectedPartitions.partitionCount == 7,
      s"expected 7 pruned partitions, got ${scan.selectedPartitions.partitionCount}")
  }

  test("ingest band-index probe is statically pruned to the batch's buckets") {
    // the q93 scale contract: the per-batch semi-join's index scan must
    // carry the batch's literal bucket list as a partition filter, so
    // only matching bhb= dirs are listed — per-batch probe IO is
    // proportional to the BATCH's band coverage, never the accumulated
    // index size
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idxDir = Fs.tmpDir("graft_plan_ingest_idx")
    try {
      // seed enough distinct texts that the index populates (w.h.p.)
      // every bucket; the fixture is deterministic, so the coverage
      // asserts below make any bad luck loud, not flaky
      val seed = (1L to 40L)
        .map(i => (i, (1 to 30).map(j => s"w$i-$j").mkString(" ")))
        .toDF("doc_id", "text")
      val (_, seedClaims, seedBlocks) = operators.Dedup.ingestStep(seed, None)
      seedClaims.repartition(col("bhb"))
        .write.mode("append").partitionBy("bhb").parquet(idxDir)
      seedBlocks.unpersist(blocking = false)
      val totalDirs = new java.io.File(idxDir).listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("bhb="))
      // one-doc probe batch (same text as seed doc 7, so every touched
      // bucket exists in the index): 8 bands → ≤8 of the 16 buckets
      val probe = Seq((100L, (1 to 30).map(j => s"w7-$j").mkString(" ")))
        .toDF("doc_id", "text")
      val expected = operators.Dedup.bandedDocs(probe)
        .select(pmod(col("bh"), lit(operators.Dedup.bhBuckets.toLong)))
        .distinct().count().toInt
      assert(expected > 0 && expected < totalDirs,
        s"fixture vacuous: probe touches $expected of $totalDirs buckets")
      val (kept, _, probeBlocks) = operators.Dedup.ingestStep(
        probe, Some(spark.read.parquet(idxDir)))
      try {
        val exec = kept.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case other => other
        }
        val scans = exec.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains(idxDir)) => f
        }
        assert(scans.nonEmpty, s"no index scan in probe plan:\n$exec")
        val scan = scans.head
        assert(scan.partitionFilters.nonEmpty,
          s"index scan must carry the bucket-list partition filter:\n$exec")
        assert(scan.selectedPartitions.partitionCount == expected,
          s"expected $expected pruned buckets, got " +
            s"${scan.selectedPartitions.partitionCount} of $totalDirs")
      } finally probeBlocks.unpersist(blocking = false)
    } finally Fs.rmTree(idxDir)
  }

  test("semantic dedup reads the stored index; quadratic work is bucket-partitioned") {
    // q84's scale contract: assignment comes from the persisted index,
    // never an in-plan recompute — the ×C candidate inflate
    // (BroadcastNestedLoopJoin corpus × centroids) must not appear; the
    // only broadcasts are the literal centroid relation; and the
    // epsilon-ball self-join must hash-partition (per-cluster pairs),
    // never broadcast a corpus-derived side
    val p = plan("q84_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q84 must read the stored assignment, not recompute it:\n$p")
    val broadcasts = "BroadcastExchange".r.findAllIn(p).size
    val literals = "LocalTableScan".r.findAllIn(p).size
    assert(broadcasts == literals, s"non-literal broadcast in q84:\n$p")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("BM25 top-k is a distributed TakeOrderedAndProject over partial-aggregated stats") {
    // the global ranking is TakeOrderedAndProject (per-partition top-k
    // + merge), never a Window over one partition; tf/df map-side
    // combine before their exchanges. (The scalar avgdl/n_docs
    // aggregate legitimately funnels to a single partition — one row.)
    // Pin the artifact BUILDER: the registry query serves the cached
    // checkpoint (whose plan is just the artifact scan), and this build
    // shape is exactly what runs once per session to create it.
    val p = operators.PipelineOps.bm25TopDocs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
  }

  test("hybrid RRF: both arms are distributed top-N; windows run post-limit only") {
    // each retrieval arm must rank via TakeOrderedAndProject (bounded
    // distributed top-N), never a Window over corpus-sized data; the
    // only Window operators are the two rank row_numbers, and both sit
    // ABOVE a TakeOrderedAndProject/GlobalLimit (≤ kLex/kVec rows by
    // construction); the one-row query-embedding broadcast carries its
    // structural limit
    // walk the actual plan TREE, not its printout: a text scan "below
    // the Window line" would also match the sibling arm's limit and
    // pass vacuously
    import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    val exec = SparkEntry.queries("q92_hybrid_retrieval_rrf")(spark, dir)
      .queryExecution.executedPlan match {
      // AQE hides the inner tree from collect(); unwrap to the initial
      // physical plan (the pre-reoptimization shape is what we pin)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    assert(exec.collect {
      case t: TakeOrderedAndProjectExec => t }.size >= 2, exec.toString)
    val windows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size == 2,
      s"expected exactly the two bounded rank windows:\n$exec")
    windows.foreach { w =>
      val bounded = w.collect {
        case t: TakeOrderedAndProjectExec => t: SparkPlan
        case g: GlobalLimitExec => g: SparkPlan
      }
      assert(bounded.nonEmpty,
        s"rank window has no bounding limit in ITS OWN subtree:\n$w")
    }
  }

  test("bucketed co-located join: the only exchange is the aggregation's") {
    // both bucketed scans satisfy the SortMergeJoin distribution
    // requirement directly — the fact ⋈ fact join itself must not
    // shuffle; the single Exchange belongs to the final groupBy
    val p = plan("q86_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    assert("Exchange".r.findAllIn(p).size == 1, s"join must be exchange-free:\n$p")
    assert(p.contains("partial_sum"), p)
  }

  test("global shuffle sorts via range partitioning, not a single-partition window") {
    // the distributed total-order exchange; a row_number() window over
    // the whole frame would show Exchange SinglePartition + Window
    val sorted = graft.operators.PipelineOps
      .globalShuffleSorted(spark, dir, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(sorted.contains("rangepartitioning"), sorted)
    assert(!sorted.contains("SinglePartition"), sorted)
    val full = plan("q74_global_shuffle")
    assert(!full.contains("Window"), full)
  }

  test("incremental agg builds each side's state with map-side partial aggregation") {
    // both the scalar states and the HLL registers must partial-agg
    // before their exchanges — the property that makes the states cheap
    // to build AND mergeable under any partitioning
    val p = plan("q73_incremental_agg")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_min") || p.contains("partial_max"), p)
  }

  test("CMS grid partial-aggregates map-side and is probed by broadcast") {
    // the counter grid is bounded by d*w cells (not corpus-sized), so
    // broadcasting it is justified — the same contract as the bloom bit
    // table; the build side must map-side combine so the shuffle carries
    // at most d*w rows per map partition
    val p = plan("q69_cms_heavy_hitters")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("PQ encode (the stored codes table) is a shuffle-free map over the corpus") {
    // the 100 TB contract for q77/q79's storage side: bucket assignment
    // and all pqM code argmins happen in ONE projection over the scan —
    // literal codebooks, no join, no window exchange
    val p = graft.operators.Similarity.pqEncode(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"pqEncode must be map-only:\n$p")
  }

  test("q291 PCA projection is a shuffle-free whole-stage-codegen map " +
      "over the corpus (literal eigenvector dot products, no HOFs)") {
    // the 100 TB contract for the dimensionality-reduction pass: the
    // eigenvectors are a bounded driver artifact, so each coordinate is
    // a 64-term literal sum inside one projection over the scan — any
    // Exchange or CodegenFallback HOF here would be a plan defect
    val df = graft.operators.Similarity.pcaProjection(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"pcaProjection must be map-only:\n$p")
    // the dot-product Project must sit inside a codegen stage (the
    // `*(n)` marker); the quantization transform below it is the known
    // CodegenFallback HOF the whole kmQuantized family pays
    assert("""\*\(\d+\) Project \[vec_id""".r.findFirstIn(p).isDefined,
      s"the projection must codegen:\n$p")
  }

  test("SQ8 encode (the stored code table) is a shuffle-free map over the corpus") {
    // q108's storage side: per-dimension stats are LITERAL arrays, so
    // quantization is one projection over the scan — no join, no window
    import org.apache.spark.sql.functions.col
    val (mins, scales, _) = graft.operators.Similarity.sqTrain(spark, dir)
    val corpus = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val p = graft.operators.Similarity.sqEncode(corpus, mins, scales)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sqEncode must be map-only:\n$p")
  }

  test("q109 classifier filter is a single per-row projection — no Exchange, no explode") {
    // the hashing trick bounds the feature space, and the in-row
    // transform+fold keeps the whole filter map-side at any corpus size
    val p = plan("q109_classifier_filter")
    assert(!p.contains("Exchange"), s"classifier filter must be map-only:\n$p")
    assert(!p.contains("Generate"), s"no explode — the fold runs in-row:\n$p")
  }

  test("q106 audit: RI is a LEFT ANTI join; metric scans column-prune; no data cross product") {
    val p = plan("q106_data_quality_audit")
    assert(p.contains("LeftAnti"), s"RI must be an anti join:\n$p")
    // the report assembly cross-joins ONE-ROW aggregates only — a
    // cartesian over data-sized inputs must never appear
    assert(!p.contains("CartesianProduct"), p)
    // metrics partial-aggregate map-side before their single exchange
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    // the orders metric scan reads only the audited columns
    assert(!p.contains("o_orderpriority"), s"audit must not read unaudited columns:\n$p")
  }

  test("q110 bigram LM: in-row bigram zip (no positional self-join); tf map-side combines") {
    val p = plan("q110_bigram_perplexity")
    // bigrams come from slices+zip inside Generate explode — NOT from a
    // (doc, pos)×(doc, pos+1) self-join: no position column may appear
    // in the plan AT ALL (a conjunction — either substring alone would
    // mean a positional self-join crept in)
    assert(!p.contains("pos#"), p)
    assert(!p.contains("pos + 1"), p)
    assert(p.contains("partial_count"), s"bigram tf must map-side combine:\n$p")
  }

  test("q121 tombstone compaction: map-side-combining argmax, no window") {
    // the agg form's point: versions collapse BEFORE the exchange, so
    // the shuffle carries one row per (partition, key) — a row_number
    // window would ship every version
    val p = plan("q121_upsert_tombstones")
    assert(p.contains("partial_max_by"), s"argmax must map-side combine:\n$p")
    assert(!p.contains("Window"), s"no window/sort path:\n$p")
  }

  test("q116 time-series search: bounded query batch (distributed top-N), no dense grid") {
    val p = plan("q116_timeseries_similarity")
    // the query batch is an explicit ORDER+LIMIT → TakeOrderedAndProject
    // (never a full sort), and it is what every broadcast rides
    assert(p.contains("TakeOrderedAndProject"), s"query batch must be bounded:\n$p")
    // the factorization means no user×day cartesian materializes
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q111/q112 format gates read back via their own format scans") {
    val orc = plan("q111_orc_denorm")
    assert(orc.contains("Scan orc"), s"q111 must execute over ORC scans:\n$orc")
    val csv = plan("q112_csv_denorm")
    assert(csv.contains("Scan csv"), s"q112 must execute over CSV scans:\n$csv")
  }

  test("q64 LSH: native one-pass signatures; no forced join strategy") {
    val df = SparkEntry.queries("q64_embed_neardup_lsh")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // signatures come from the single native expression (the Column
    // formulation would blow the codegen budget and interpret)
    assert(p.contains("hyperplane_sigs"), p)
    // candidate rows are skinny: no embedding array rides the band join
    // (the vector column reappears only in the verify joins' scans)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, "q64 must not force a join strategy")
  }

  test("q65/q66 window-hash aggregates partial-aggregate before their exchanges") {
    for (q <- Seq("q65_substring_dedup", "q66_decontaminate")) {
      val p = plan(q)
      assert(p.contains("partial_count"), s"$q dup/ref hash count must map-side combine:\n$p")
    }
    // the coverage sweep is a window over ONE hashpartition(doc_id)
    // exchange — no L-fold position explode anywhere
    val p65 = plan("q65_substring_dedup")
    assert(p65.contains("partial_sum"), p65)
  }

  test("PPJoin prefix stage carries no broadcast hint (AQE decides the dfreq join)") {
    // dfreq is one row per DISTINCT SHINGLE — corpus-sized, not
    // dimension-sized. A forced broadcast is an executor OOM at 100 TB;
    // the plan must leave the join strategy to AQE (which may still pick
    // a broadcast at runtime when the measured size is small — that's
    // fine; the HINT is the bug). Assert on the analyzed logical plan:
    // broadcast() would appear as a ResolvedHint node.
    val analyzed = graft.operators.Dedup.exactNearDuplicates(spark, dir)
      .queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty,
      s"exactNearDuplicates must not force a join strategy:\n$analyzed")
  }

  test("ANN/mining family: every forced broadcast side is bounded by construction") {
    // the round-4 scale finding: broadcast(queries) where the demo batch
    // was a FRACTION of the corpus (vec_id % 100) — bounded at sf0.1,
    // 100×-growing at 100× data. The contract now: any side that carries
    // a broadcast hint must be structurally bounded — an explicit
    // GlobalLimit (the maxQueryBatch cap / the centroid cap) or a
    // literal LocalRelation (trained centroids) somewhere below it,
    // never a bare corpus-derived filter.
    import org.apache.spark.sql.catalyst.plans.logical._
    // RECURSIVE boundedness, not "a limit exists somewhere below": a
    // GlobalLimit/LocalRelation bounds its subtree; row-preserving (or
    // row-reducing/bounded-fan-out) operators pass the property up;
    // a JOIN is bounded only if EVERY child is; a bare relation leaf is
    // unbounded. This rejects e.g. broadcast(corpus.join(boundedQ)) —
    // which contains a GlobalLimit yet scales with the corpus.
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalRelation => true
      // a global (ungrouped) aggregate is exactly one row by
      // construction — the scalar stats broadcasts (avgdl/n_docs)
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case j: Join => bounded(j.left) && bounded(j.right)
      case u: Union => u.children.forall(bounded)
      case other if other.children.size == 1 => bounded(other.children.head)
      case _ => false // relation leaves and unknown multi-child shapes
    }
    // q85's frame is the BUILDER, not the registry entry: the registry
    // serves the cached checkpoint artifact, whose plan has no joins
    for ((q, df) <- Seq("q25_ann_bruteforce", "q26_ann_ivf",
        "q49_ann_ivf_trained", "q76_hard_negatives", "q77_pq_adc",
        "q79_ann_ivfpq", "q83_ann_ivf_indexed")
          .map(n => n -> SparkEntry.queries(n)(spark, dir)) :+
        ("q85_bm25" -> operators.PipelineOps.bm25TopDocs(spark, dir))) {
      val lp = df.queryExecution.optimizedPlan
      val hinted = lp.collect { case j: Join
        if j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined) => j }
      assert(hinted.nonEmpty, s"$q: expected at least one hinted join")
      for (j <- hinted) {
        if (j.hint.leftHint.exists(_.strategy.isDefined))
          assert(bounded(j.left), s"$q: unbounded broadcast LEFT side:\n${j.left}")
        if (j.hint.rightHint.exists(_.strategy.isDefined))
          assert(bounded(j.right), s"$q: unbounded broadcast RIGHT side:\n${j.right}")
      }
    }
  }

  test("round-11 additions keep their scale shapes") {
    // q130: every PageRank round is node-keyed joins + aggregation —
    // no Window, no global sort anywhere in the plan
    val p130 = plan("q130_pagerank")
    assert(!p130.contains("Window"), p130)
    assert(p130.contains("partial_sum") || p130.contains("partial_count"), p130)
    // q132: the funnel chain never windows over the raw event log;
    // counts partial-aggregate before their exchanges
    val p132 = plan("q132_funnel")
    assert(!p132.contains("Window"), p132)
    assert(p132.contains("partial_min"), p132)
    // q133: the history build's one window is PARTITIONED by the
    // entity key — rangepartitioning on user, never a single partition
    val p133 = plan("q133_scd2_history")
    assert(p133.contains("Window"), p133)
    assert(!p133.contains("SinglePartition"), p133)
    // q134: totals ride a one-row broadcast over the bucket counts
    val p134 = plan("q134_embedding_drift")
    assert(p134.contains("BroadcastNestedLoopJoin") || p134.contains("BroadcastExchange"), p134)
    // q135: pure per-row projection (pinned Exchange-free in its own
    // spec); q128 adds no exchange over the plain denorm join
    val p128 = plan("q128_jsonl_denorm")
    val p01 = plan("q01_denorm_inner")
    assert("Exchange".r.findAllIn(p128).size == "Exchange".r.findAllIn(p01).size,
      s"jsonl serde must not change the join shape:\n$p128")
  }

  test("q136/q138: blocked fuzzy join hash-joins on the block key; CMS grids join bounded") {
    // entity resolution must plan the blocking equi-key as a real hash
    // join (SMJ or BHJ) — a BroadcastNestedLoopJoin would mean the
    // block key fell out of the join condition and the distance filter
    // went quadratic over the whole table
    val p136 = plan("q136_record_linkage")
    assert(p136.contains("SortMergeJoin") || p136.contains("BroadcastHashJoin"), p136)
    assert(!p136.contains("BroadcastNestedLoopJoin"), p136)
    assert(!p136.contains("CartesianProduct"), p136)
    // the join-size estimator's grids partial-aggregate before their
    // exchanges, and the exact-side count partial-aggregates too
    val p138 = plan("q138_cms_join_estimate")
    assert(p138.contains("partial_count"), p138)
  }

  test("q151: point-in-time join equi-joins on the entity key — interval is a filter, not a cross product") {
    val p = plan("q151_point_in_time_join")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q150: last-touch attribution is ONE entity window — a single exchange, no self-join") {
    val p = plan("q150_last_touch_attribution")
    // the whole query is a window over the user's history: one shuffle
    // on the entity key, one Window, and no join of events to events
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q154: CDC apply is the anti-join + union MERGE shape") {
    val p = plan("q154_cdc_apply")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("Union"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q148: novelty's gram stages partial-aggregate before their exchanges") {
    val p = plan("q148_novelty_scores")
    // the inverted index (gram → min doc) and the per-doc count-back
    // both map-side combine; a missing partial would ship every gram
    // occurrence through the shuffle
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q141: image near-dedup hash-joins on the (band, band_val) key — never all-pairs") {
    // the LSH contract: candidate generation is an equi-join on the
    // band key; a nested-loop/cartesian here would mean the banding
    // fell out of the condition and the popcount filter went quadratic
    // over the corpus
    val p = plan("q141_image_neardup_phash")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q166: triangle census joins on node keys — wedge close is a real join, never a cross product") {
    // compact-forward's whole point is that every step is a node-keyed
    // hash join (src=src for wedges, (a,b) semi-join to close) — a
    // CartesianProduct or nested loop would mean the pivot key fell
    // out and the enumeration went all-pairs; the edge window must
    // partition by (type, hour), never a single partition
    val p = plan("q166_triangle_census")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin")
      // the three 1-row summary frames legitimately cross-join at the
      // very top; node-scale joins must not
      || "BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert(p.contains("LeftSemi"), p)
    // the edge window distributes by (event_type, hour) — the 1-row
    // summary aggregates may collapse to SinglePartition, the
    // event-sequence sort must not. Since the r19 optimization round
    // the edge pipeline runs ONCE behind a localCheckpoint boundary
    // (it used to re-run per consumer), so the partitioning pin moves
    // to the edge subplan itself; the final plan must read the
    // checkpointed RDD instead of re-deriving edges.
    val ep = operators.Analytics.interactionEdges(spark, dir)
      .queryExecution.executedPlan.toString
    assert(ep.contains("hashpartitioning(event_type"), ep)
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"), p)
  }

  test("q177: time-decay attribution equi-joins on the entity key — horizon is a filter") {
    val p = plan("q177_time_decay_attribution")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // channel totals partial-aggregate before the final exchange
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q180: passage retrieval equi-joins on the bucket; bounded top-k plans as WindowGroupLimit") {
    // the candidate join must key on the dominant-slot bucket (the
    // training-free IVF move) with the bounded query side broadcast;
    // the literal rank bound must prune per-partition
    // the candidate join lives in the scored segment (the final frame
    // ranks over a materialized LogicalRDD — the PruneFilters
    // constraint-blowup fix — so the join is invisible in its plan)
    val scored = operators.TextAnalysis.passageScored(spark, dir)
      .queryExecution.executedPlan.toString
    assert(scored.contains("BroadcastHashJoin"), scored)
    assert(!scored.contains("CartesianProduct"), scored)
    val p = plan("q180_passage_retrieval")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q174: the IVM delta probe joins on the band key — never all-pairs, never base×base") {
    val p = plan("q174_dedup_ivm_delta")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q176: the threshold sweep is ONE corpus scan with a map-side-combined bounded grid") {
    val p = plan("q176_threshold_sweep")
    // scores, labels, and the ×11 explode are projections over one
    // documents scan; the only exchange carries the 11-row grid
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q181: AUC folds one corpus scan to the bounded score histogram") {
    val p = plan("q181_classifier_auc")
    // the ROC prefix sums AND the class totals run in one window pass
    // over the map-side-combined s_micro histogram (bounded by
    // construction) — the corpus is scanned exactly once, never
    // globally sorted, and no join of any kind appears
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
  }

  test("q182/q187: k-means rounds broadcast C centroids; IVF probes hash-join the bucket key") {
    // training assignment = corpus × broadcast(C rows), never a
    // shuffle-pairing of corpus against centroids
    val t = plan("q182_kmeans_train")
    assert(t.contains("BroadcastNestedLoopJoin"), t)
    assert(!t.contains("CartesianProduct"), t)
    // serving: the candidate join keys on the trained bucket id with
    // the bounded probe batch broadcast — the IVF contract
    val p = plan("q187_ann_ivf_kmeans")
    assert(p.contains("BroadcastHashJoin [cid"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q183: a BPE round broadcasts the 1-row rule; re-segmentation is per-doc windows") {
    val seqs = operators.TextAnalysis.bpeSeqs0(spark, dir)
    val best = operators.TextAnalysis.bpeBest(
      operators.TextAnalysis.bpePairCounts(seqs))
    val p = operators.TextAnalysis.bpeApply(seqs, best)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 1-row rule
    assert(p.contains("Window"), p) // run ids / parity / consumption
    assert(!p.contains("CartesianProduct"), p)
    // pair counts combine map-side before the exchange
    val pc = operators.TextAnalysis.bpePairCounts(seqs)
      .queryExecution.executedPlan.toString
    assert(pc.contains("partial_count"), pc)
  }

  test("q184/q189: power-law fits fold bounded grids; corpus work is keyed aggregates") {
    // Zipf: the xy table is q155's top-v (TakeOrderedAndProject —
    // distributed top-N, no global sort of the vocabulary)
    val z = plan("q184_zipf_fit")
    assert(z.contains("TakeOrderedAndProject"), z)
    assert(!z.contains("CartesianProduct"), z)
    // Heaps: per-term first-seen and per-cell totals combine map-side;
    // the only single-partition step is the ≤64-cell grid window
    val h = plan("q189_heaps_fit")
    assert(h.contains("partial_min"), h)
    assert(!h.contains("CartesianProduct"), h)
  }

  test("q185: l-diversity is one FK equi-join + two-phase distinct, no cartesian") {
    val p = plan("q185_l_diversity")
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q193/q194/q195: sampling table tops-v distributedly; registers combine map-side; phash probes equi-join") {
    // q193: the only corpus-wide step is q155's top-v
    // (TakeOrderedAndProject); everything after runs over ≤ v rows
    val n = plan("q193_negative_sampling")
    assert(n.contains("TakeOrderedAndProject"), n)
    // q194: register maxima combine map-side before the exchange; the
    // union-class branch aggregates the m-row register table only
    val h = plan("q194_hll_set_algebra")
    assert(h.contains("partial_max"), h)
    assert(!h.contains("CartesianProduct"), h)
    // q195: candidates come from a hash join on the (band, band_val)
    // key with the bounded probe batch broadcast — never all-pairs
    val p = plan("q195_phash_search")
    assert(p.contains("BroadcastHashJoin [band"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q197: containment prefix stage carries no broadcast hint (the q23 rule)") {
    // same 100 TB argument as q23: dfreq and the inverted index are
    // corpus-sized — a forced broadcast is an executor OOM; AQE may
    // still pick one at runtime from measured sizes (fine — the HINT
    // is the bug)
    val analyzed = graft.operators.Dedup.containmentPairs(spark, dir)
      .queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"unexpected broadcast hint(s): $hints")
    val p = plan("q197_containment_dedup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q190: calibration bins are one scan folded to the bin grid") {
    val p = plan("q190_calibration_bins")
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Window"), p) // pure grid fold — no ranking state
  }

  test("q201: t-closeness windows on the CLASS key and never cross-joins data-sized frames") {
    val p = plan("q201_t_closeness")
    // the EMD prefix sum must be keyed by the equivalence class (a
    // data-sized window with a partition key), and the only cross
    // joins are against the m-row value frame / one-row totals —
    // both explicit broadcasts
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q206: item kNN hash-joins on the basket key; the top-k is a group limit, not a global sort") {
    val p = plan("q206_item_cooccurrence_knn")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-item top-k must plan as WindowGroupLimit (rank pushed below
    // the full window sort), never TakeOrderedAndProject over all pairs
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q204: ROLLUP is ONE scan through Expand — not three scans unioned") {
    val p = plan("q204_rollup_report")
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("Expand"), p)
    assert(!p.contains("Union"), p)
  }

  test("q205: layout audit derives chunk stats map-side with no global sort") {
    val p = plan("q205_layout_pruning")
    assert(p.contains("partial_count") || p.contains("partial_min"), p)
    assert(!p.contains("Sort "), p) // value-range chunking needs no ordering
  }

  test("q213: personalized PageRank joins on the node key every round — no cross product") {
    val p = plan("q213_personalized_pagerank")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q209: weighted reservoir is a per-row key map + per-stratum group limit") {
    val p = plan("q209_weighted_reservoir")
    // the A-ES construction must never plan a driver-side or global
    // structure: the top-k is WindowGroupLimit on the source-keyed
    // shuffle, and no cross/nested-loop join appears anywhere
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q219: the join strategy FLIPS with the stored stats — stats drive the plan") {
    // fixture profile: customer is far under the default budget → the
    // stats decision is an explicit broadcast
    val small = operators.PipelineOps.statsDrivenDenorm(spark, dir)
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"), small)
    // the same query under a 1-byte budget: the stats decision must
    // OVERRIDE Spark's own file-size heuristic (which would happily
    // auto-broadcast this dimension) and plan a shuffle join
    val big = operators.PipelineOps.statsDrivenDenorm(spark, dir, budgetBytes = 1L)
      .queryExecution.executedPlan.toString
    assert(!big.contains("BroadcastHashJoin"), big)
    assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin"), big)
  }

  test("q222: skew salting FLIPS with the stored CMS hottest-key bound") {
    // fixture bound is far under the default threshold → plain hash
    // join, no salt column anywhere in the plan
    val plain = operators.PipelineOps.skewAwareDenorm(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plain.contains("__salt"), plain)
    // zero threshold: the sketch says "hot" → the join keys must carry
    // the salt (and the answer is pinned identical by the shared oracle)
    val salted = operators.PipelineOps.skewAwareDenorm(spark, dir, hotThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(salted.contains("__salt"), salted)
  }

  test("q231: DSIR's top-k is TakeOrderedAndProject, never a data-sized global sort") {
    val p = plan("q231_dsir_selection")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q245: the matched holdout picks per cell via WindowGroupLimit") {
    val p = plan("q245_matched_holdout")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global sort
  }

  test("q242/q233: the pairwise drift matrices never plan a data-sized cross product") {
    for (q <- Seq("q242_length_ks_matrix", "q233_source_divergence")) {
      val p = plan(q)
      // the dense-grid build is a bounded-frame BNLJ by design; a
      // CartesianProduct (both sides unpartitioned-large) must not appear
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q247: the curated pack composes hash joins + one cumsum window, no cross product") {
    val p = plan("q247_curated_pack")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("q216: multi-hop denorm plans two key joins, nation broadcast, no cross product") {
    val p = plan("q216_denorm_multihop")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // hop 2's dimension (25 rows) must come in as a broadcast, not a
    // third shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q218: the live pair grid folds through a bounded top-N, not a global sort") {
    // the fold runs on the CONVERGED grid (a bounded batch frame here,
    // exactly what the query registry does post-stream)
    val cells = operators.TextAnalysis.bpeLivePairCells(
      Tables.load(spark, dir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
    val p = operators.TextAnalysis.bpeDriftFold(cells)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q267: the top-k IVM plans as WindowGroupLimit over stored + delta, no cross product") {
    val p = plan("q267_topk_ivm_delta")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q258: the curriculum's interval join broadcasts the bounded grid") {
    val p = plan("q258_curriculum_phases")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q259: the span plan is one projection + explode — zero exchanges") {
    val p = plan("q259_span_corruption_plan")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p) // the bounded explode
  }

  test("q274: the chunk plan is one projection + explode — zero exchanges") {
    val p = plan("q274_chunk_plan")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p) // the bounded explode
  }

  test("q283: the covariance DATA PASS is the native kernel's explode + " +
      "ONE partially-aggregated exchange — never a join or a data-sized shuffle") {
    // the cell pass is the only stage that touches data; the (i, j)
    // assembly runs over the ≤ D(D+3)/2 checkpointed cells
    val cells = operators.Similarity.covCells(
      operators.Similarity.kmQuantized(spark, dir))
    val p = cells.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"the oracle's a×b self-join is the semantics, not the plan:\n$p")
    assert(p.contains("cov_pairs"), s"the native kernel must be in the plan:\n$p")
    assert(p.contains("Generate"), p) // its one bounded posexplode
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial"), s"map-side partial aggregation must precede the exchange:\n$p")
  }

  test("q283: the grid assembly joins only BOUNDED frames — every join " +
      "is a broadcast, no sort-merge anywhere") {
    val p = plan("q283_embedding_covariance")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
