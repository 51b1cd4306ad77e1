package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{ArtifactCache, Tables}

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: token counting (whitespace + BPE-ish regex),
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting. All are pure `functions._` column expressions — no
  * UDFs — so they stay inside whole-stage codegen and scale linearly
  * with no shuffle (per-row ops; the only shuffle anywhere here is a
  * final aggregate if the caller adds one).
  *
  * The word lists and formulas are shared constants used to generate
  * BOTH the Spark plan and the DuckDB oracle SQL, keeping the two in
  * lockstep by construction.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Order matters for the deterministic tie-break (first
    * wins).
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "auf"))

  /** BPE-ish token pattern: letter runs, digit runs, single other
    * non-space chars (portable between Java and RE2-style engines).
    */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** THE tokenizer — shared with [[Dedup]] so shingles, simhash, and all
    * text metrics (plus their generated oracle SQL,
    * `string_split(lower(text), ' ')`) agree by construction.
    */
  private[operators] def tokens(c: Column): Column = split(lower(c), " ")

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  // the quality sub-expressions, each defined ONCE: qualityCol blends
  // them and qualityScores also exposes them as columns — two parallel
  // hand-maintained derivations would let an edit to one silently
  // desync the exposed metric from the blended score computed on the
  // same row (Catalyst CSEs the repeated subtrees, so sharing is free)
  private def nToks(text: Column): Column = size(tokens(text)).cast("double")
  private def stopCount(text: Column): Column =
    stopHits(tokens(text), langStopwords.flatMap(_._2)).cast("double")
  private def meanTokenLen(text: Column): Column =
    (length(text).cast("double") - (nToks(text) - lit(1.0))) / nToks(text)

  /** Token/char counts: whitespace tokens + regex (BPE-ish) tokens. */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.select(
      col("doc_id"),
      size(tokens(text)).as("n_tokens"),
      size(regexp_extract_all(lower(text), lit(bpePattern), lit(0))).as("n_tokens_bpe"),
      length(text).as("n_chars_txt"))

  /** The blended [0,1] quality expression — exposed at COLUMN level so
    * composite pipelines ([[PipelineOps.curation]]) can evaluate every
    * map-side metric in ONE projection over one scan instead of
    * joining per-metric frames.
    */
  private[operators] def qualityCol(text: Column): Column = {
    val n = nToks(text)
    least(lit(1.0), n / lit(64.0)) * lit(0.5) +
      least(lit(1.0), stopCount(text) / n * lit(5.0)) * lit(0.3) +
      least(lit(1.0), meanTokenLen(text) / lit(8.0)) * lit(0.2)
  }

  /** Stopword-heuristic language verdict (column form; see
    * [[languageId]]).
    */
  private[operators] def detectedLangCol(text: Column): Column = {
    val toks = tokens(text)
    val Seq(en, es, de) = langStopwords.map { case (_, words) => stopHits(toks, words) }
    when(en > 0 && en >= es && en >= de, lit("en"))
      .when(es > 0 && es > en && es >= de, lit("es"))
      .when(de > 0 && de > en && de > es, lit("de"))
      .otherwise(lit("und"))
  }

  /** Quality scoring: stopword ratio, mean token length, punctuation
    * density, and a blended [0,1] quality score.
    */
  def qualityScores(df: DataFrame, text: Column): DataFrame = {
    val punct = size(regexp_extract_all(text, lit("[^a-z0-9 ]"), lit(0))).cast("double")
    df.select(
      col("doc_id"),
      size(tokens(text)).as("n_tokens"),
      // raw doubles, not round()ed: the two engines' round() disagree on
      // exact half-boundaries, while the unrounded values are bit-identical
      // (same IEEE ops in the same order on integer-derived inputs)
      (stopCount(text) / nToks(text)).as("stopword_ratio"),
      meanTokenLen(text).as("mean_token_len"),
      (punct / greatest(length(text).cast("double"), lit(1.0))).as("punct_density"),
      qualityCol(text).as("quality"))
  }

  /** Stopword-heuristic language ID with deterministic tie-break (list
    * order), 'und' when nothing matches.
    */
  def languageId(df: DataFrame, text: Column): DataFrame =
    df.select(col("doc_id"), col("lang").as("declared_lang"),
      detectedLangCol(text).as("detected_lang"))

  /** OpenRefine-style fingerprint: md5 of the sorted distinct token
    * set — identical for any token permutation/duplication of the same
    * content, the standard key for fuzzy-dup clustering.
    */
  def fingerprints(df: DataFrame, text: Column): DataFrame =
    df.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(text))))).as("fingerprint"),
      md5(lower(text)).as("exact_hash"))

  /** Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm): hash every POSITIONAL k-gram (duplicates kept — unlike
    * the near-dup shingle sets) and, in every sliding window of `w`
    * consecutive gram hashes, select the minimum, rightmost on ties;
    * the distinct selected (position, hash) pairs are the document's
    * fingerprint set. Guarantee: any shared token run of length
    * >= w+k-1 between two documents produces a shared fingerprint
    * hash, while only ~2/(w+1) of grams are kept — the sub-linear
    * robust fingerprint a plagiarism/overlap scanner stores.
    *
    * Portability trick: "minimum hash, rightmost position on ties" is
    * ONE integer `min()` over `h·2^20 + (2^20-1-pos)` (40-bit gram
    * hash, 20-bit position), so both engines express the tie rule with
    * a plain window min — no argmin/struct-ordering construct needed.
    * Domain bounds (both enforced by the same filter in the operator
    * and its oracle): documents shorter than w+k-1 tokens have no full
    * window and emit no fingerprints, and documents with more than 2^20
    * k-grams are excluded — a position past the 20-bit field would make
    * (2^20-1-pos) negative and silently corrupt both the tie ordering
    * and the recovered fp_pos, so over-long documents are rejected
    * rather than fingerprinted wrongly (chunk them upstream).
    */
  def winnowingFingerprints(df: DataFrame, text: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    val posBits = graft.functions.WinnowKeys.posBits
    val toks = tokens(text)
    // the selection runs inside the native WinnowKeys expression
    // (per-doc monotonic-deque sliding min, distinct keys) — the whole
    // fingerprint pass is a map + generate with ZERO shuffles, where
    // the posexplode → window-sort → distinct formulation it replaces
    // shuffled every gram twice (plan parity pinned by unit test,
    // shuffle-freedom by PlanSpec)
    df.filter(size(toks) >= k + w - 1 && // at least one full window
        size(toks) <= (1L << posBits) + k - 1) // every pos fits the 20-bit field
      .select(col("doc_id"),
        explode(graft.functions.winnow_keys(toks, k, w)).as("sel"))
      .select(col("doc_id"),
        (lit((1L << posBits) - 1) - col("sel") % (1L << posBits)).as("fp_pos"),
        expr(s"sel div ${1L << posBits}").as("fp_hash"))
  }

  def winnowingFingerprintsSql(k: Int = 3, w: Int = 4): String = {
    val hMod = 1L << graft.functions.WinnowKeys.hBits
    val posMod = 1L << graft.functions.WinnowKeys.posBits
    s"""WITH t AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
          WHERE len(string_split(lower(text), ' ')) >= ${k + w - 1}
            AND len(string_split(lower(text), ' ')) <= ${posMod + k - 1}),
        p AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks) - ${k - 1}, 0))) AS pos
          FROM t),
        keyed AS (
          SELECT doc_id, pos,
                 (('0x' || substring(md5(array_to_string(toks[pos+1:pos+$k], ' ')), 1, 15))::BIGINT
                    % $hMod) * $posMod + (${posMod - 1} - pos) AS key
          FROM p),
        sel0 AS (
          SELECT doc_id, pos,
                 min(key) OVER (PARTITION BY doc_id ORDER BY pos ASC
                                ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS sel
          FROM keyed),
        sel AS (SELECT DISTINCT doc_id, sel FROM sel0 WHERE pos >= ${w - 1})
        SELECT doc_id, ${posMod - 1} - (sel % $posMod) AS fp_pos, sel // $posMod AS fp_hash
        FROM sel"""
  }

  // total 3-gram count, defined once for the metric column and the
  // exposed n_3grams (same desync hazard as the quality sub-expressions)
  private def trigramTotal(text: Column): Column =
    greatest(size(tokens(text)) - lit(2), lit(0)).cast("double")

  /** The duplicate-3-gram fraction (column form; see
    * [[repetitionScores]]).
    */
  private[operators] def dupTrigramFracCol(text: Column): Column = {
    val total = trigramTotal(text)
    val distinctSh = size(graft.functions.shingles(tokens(text), 3)).cast("double")
    when(total > 0, lit(1.0) - distinctSh / total)
  }

  /** Gopher-style repetition metric: the fraction of a document's
    * 3-gram occurrences that are duplicates (1 − distinct/total) — the
    * classic boilerplate/repetition filter rule. Distinct 3-grams come
    * from the native [[graft.functions.Shingles]] expression, so this is
    * a pure per-row map like the other text metrics. NULL for docs
    * under 3 tokens (no 3-grams to judge).
    */
  def repetitionScores(df: DataFrame, text: Column): DataFrame =
    df.select(
      col("doc_id"),
      trigramTotal(text).cast("int").as("n_3grams"),
      dupTrigramFracCol(text).as("dup_3gram_frac"))

  val repetitionScoresSql: String =
    """SELECT doc_id,
          greatest(len(string_split(lower(text), ' ')) - 2, 0)::INT AS n_3grams,
          CASE WHEN len(string_split(lower(text), ' ')) - 2 > 0 THEN
            1.0 - len(list_distinct(list_transform(
                    range(1, greatest(len(string_split(lower(text), ' ')) - 1, 1)),
                    i -> array_to_string((string_split(lower(text), ' '))[i:i+2], ' '))))::DOUBLE
                / (len(string_split(lower(text), ' ')) - 2)::DOUBLE
          END AS dup_3gram_frac
       FROM documents"""

  /** PII-pattern scan: counts of email-, URL-, and long-digit-shaped
    * substrings per document (the redaction pre-pass of a curation
    * pipeline; patterns kept to the regex subset Java and RE2 agree
    * on). Pure per-row map.
    */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val urlPattern = "https?://[^ ]+"
  val longDigitPattern = "[0-9]{6,}"

  // per-pattern match counts, each defined ONCE — piiScan exposes them
  // and piiRedact sums them into n_redacted, the same define-once
  // discipline as the quality sub-expressions above
  private[operators] def emailsCol(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(emailPattern), lit(0)))
  private[operators] def urlsCol(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(urlPattern), lit(0)))
  private[operators] def longDigitsCol(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(longDigitPattern), lit(0)))

  def piiScan(df: DataFrame, text: Column): DataFrame =
    df.select(
      col("doc_id"),
      emailsCol(text).as("n_emails"),
      urlsCol(text).as("n_urls"),
      longDigitsCol(text).as("n_long_digits"))

  val piiScanSql: String =
    s"""SELECT doc_id,
          len(regexp_extract_all(lower(text), '$emailPattern')) AS n_emails,
          len(regexp_extract_all(lower(text), '$urlPattern')) AS n_urls,
          len(regexp_extract_all(lower(text), '$longDigitPattern')) AS n_long_digits
        FROM documents"""

  /** PII redaction — the transform counterpart of [[piiScan]]: emails,
    * URLs, then long digit runs replaced by typed sentinels, applied in
    * that FIXED order (the passes compose — an email inside a URL is
    * redacted first and the URL pass then swallows the sentinel; any
    * single deterministic order is correct, but engine and oracle must
    * share it, so it is part of the declared contract). `n_redacted`
    * counts matches on the ORIGINAL lowered text, so it can exceed the
    * sentinel count when passes overlap. Pure per-row map — redacting
    * 100 TB is one scan-shaped pass, no shuffle.
    */
  def piiRedact(df: DataFrame, text: Column): DataFrame = {
    val lowered = lower(text)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(lowered, emailPattern, "<EMAIL>"),
        urlPattern, "<URL>"),
      longDigitPattern, "<DIGITS>")
    df.select(
      col("doc_id"),
      redacted.as("redacted"),
      (emailsCol(text) + urlsCol(text) + longDigitsCol(text)).as("n_redacted"))
  }

  // DuckDB's regexp_replace needs the 'g' flag (first-match-only by
  // default); Spark's replaces all matches unconditionally
  val piiRedactSql: String =
    s"""SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(lower(text),
              '$emailPattern', '<EMAIL>', 'g'),
              '$urlPattern', '<URL>', 'g'),
              '$longDigitPattern', '<DIGITS>', 'g') AS redacted,
          (len(regexp_extract_all(lower(text), '$emailPattern'))
           + len(regexp_extract_all(lower(text), '$urlPattern'))
           + len(regexp_extract_all(lower(text), '$longDigitPattern'))) AS n_redacted
        FROM documents"""

  /** RAG/embedding-prep chunking: split each document into overlapping
    * token-window chunks — window `cw` tokens, stride `st` (overlap
    * `cw-st`). Chunk count is `1 + ceil((n-cw)/st)` so the final chunk
    * always reaches the last token (it may be shorter than `cw` but
    * never starts past `n`, since `st <= cw`); every token is covered
    * by at least one chunk. Emits a deterministic chunk id
    * (`doc_id`, `chunk_idx`), the 1-based token start, the chunk text,
    * and an md5 chunk hash — the unit an embedding index or a
    * dedup-at-chunk-granularity pass consumes.
    *
    * Scale: per-row generate (one explode, output ~n/st rows per doc),
    * no shuffle — chunking 100 TB is a single map pass whose output
    * feeds the embedding/ANN stages keyed by `chunk_hash`.
    */
  def chunkDocuments(df: DataFrame, text: Column,
      cw: Int = 64, st: Int = 48): DataFrame = {
    require(st >= 1 && st <= cw, s"stride must be in 1..$cw, got $st")
    val base = df
      .select(col("doc_id"), tokens(text).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .filter(col("n_toks") >= 1)
      .withColumn("n_chunks",
        when(col("n_toks") <= cw, lit(1))
          .otherwise(expr(s"(n_toks - $cw + $st - 1) div $st") + lit(1)))
    val chunk = slice(col("toks"), col("chunk_idx") * st + 1, lit(cw))
    base
      .select(col("doc_id"),
        col("toks"),
        explode(sequence(lit(0), col("n_chunks").cast("int") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * st + 1).as("chunk_start"),
        size(chunk).as("chunk_tokens"),
        array_join(chunk, " ").as("chunk_text"),
        md5(array_join(chunk, " ")).as("chunk_hash"))
  }

  def chunkDocumentsSql(cw: Int = 64, st: Int = 48): String =
    s"""WITH t AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks,
                 len(string_split(lower(text), ' ')) AS n_toks
          FROM documents
          WHERE len(string_split(lower(text), ' ')) >= 1),
        c AS (
          SELECT doc_id, toks,
                 CASE WHEN n_toks <= $cw THEN 1
                      ELSE (n_toks - $cw + $st - 1) // $st + 1 END AS n_chunks
          FROM t),
        e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
        SELECT doc_id, chunk_idx,
               chunk_idx * $st + 1 AS chunk_start,
               len(toks[chunk_idx * $st + 1 : chunk_idx * $st + $cw]) AS chunk_tokens,
               array_to_string(toks[chunk_idx * $st + 1 : chunk_idx * $st + $cw], ' ') AS chunk_text,
               md5(array_to_string(toks[chunk_idx * $st + 1 : chunk_idx * $st + $cw], ' ')) AS chunk_hash
        FROM e"""

  // ---- span-corruption plan (q259) ----

  /** q259: T5-style span-corruption PLAN — for each document long
    * enough to mask, a deterministic set of NON-OVERLAPPING mask
    * spans (~15% of tokens in length-3 spans: one span per 20
    * tokens). Construction is pure integer arithmetic, so the plan is
    * reproducible across engines and runs with no RNG state: the
    * token range is cut into `n_spans` strides (stride ≥ 20 by
    * construction) and span k starts at a multiplicative-hash offset
    * within stride k — overlap is impossible by construction, not by
    * rejection sampling, so the operator is one projection + one
    * bounded explode (output ≈ corpus_tokens/20 rows), embarrassingly
    * parallel at any scale. This is the deterministic-synthetic-target
    * class of a denoising-objective training pipeline: the PLAN is
    * data, the masking itself is a map-side join downstream.
    */
  def spanCorruptionPlan(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    d.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
      .withColumn("n_spans", expr("n div 20"))
      .filter(col("n_spans") > 0)
      .withColumn("stride", expr("n div n_spans"))
      .select(col("doc_id"), col("stride"),
        explode(expr("sequence(0L, n_spans - 1L)")).as("span_id"))
      .withColumn("h", expr(
        "((doc_id % 1000000007L) * 2654435761L + span_id * 40503L) % 1000000007L"))
      .select(col("doc_id"), col("span_id"),
        (col("span_id") * col("stride") + expr("h % (stride - 2)")).as("start_tok"),
        lit(3).as("span_len"))
  }

  /** Oracle: the identical integer construction over DuckDB's
    * string_split token count — same hash, same strides, same
    * modulus, cell-exact.
    */
  def spanCorruptionPlanSql: String =
    """WITH t AS (SELECT doc_id,
                    len(string_split(lower(text), ' '))::BIGINT AS n
                  FROM documents),
        s AS (SELECT doc_id, n, n // 20 AS n_spans FROM t WHERE n // 20 > 0),
        sp AS (SELECT doc_id, u.k AS span_id, n // n_spans AS stride,
                 ((doc_id % 1000000007) * 2654435761
                   + u.k * 40503) % 1000000007 AS h
               FROM s, UNNEST(range(s.n_spans)) AS u(k))
        SELECT doc_id, span_id,
               span_id * stride + (h % (stride - 2)) AS start_tok,
               3 AS span_len
        FROM sp"""

  // ---- content-defined chunking + chunk-level dedup (q161) ----

  /** Content-defined chunking — the rolling-hash boundary rule backup
    * and dedup systems use instead of fixed windows (q70's fixed
    * chunks shift entirely when one token is inserted; content-defined
    * boundaries re-align after the edit): position i starts a new
    * chunk when its 3-token gram hash ≡ 0 (mod `modulus`), giving
    * expected chunk length ≈ modulus tokens whatever the content.
    * Chunk identity is the md5 of the chunk's tokens, and each chunk
    * row carries how many times its content occurs corpus-wide — the
    * chunk-level dedup signal (shared boilerplate paragraphs across
    * documents surface here even when whole-document near-dedup
    * misses them).
    *
    * Scale shape: the boundary flags and chunk ids are ONE
    * entity-partitioned running sum over the position rows (per-doc
    * windows — history-deep, never corpus-wide); chunk extents
    * aggregate per (doc, chunk); the content rebuild slices the doc's
    * token array once per chunk; occurrence counts are one
    * hash-keyed groupBy joined back. All md5/integer arithmetic —
    * cell-exact cross-engine.
    */
  /** The (doc, chunk) extent table with each chunk's token slice —
    * the rolling-gram-hash chunk derivation factored out of
    * [[contentDefinedChunks]] so the passage retriever (q180) indexes
    * exactly the chunks the chunker reports.
    */
  private[operators] def chunkExtents(s: SparkSession, dir: String,
      modulus: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksCol = tokens(col("text"))
    val base = Tables.load(s, dir, "documents")
      .select(col("doc_id"), toksCol.as("toks"))
      .filter(size(col("toks")) >= 1)
    val pos = base.select(col("doc_id"), col("toks"),
      explode(sequence(lit(1), size(col("toks")))).as("i"))
    // a position can START a chunk if its 3-gram exists (i <= n-2) and
    // the gram hash hits the boundary rule; position 1 is implicitly a
    // chunk start (running count of PRIOR boundaries = 0 there)
    val isBoundary = (col("i") <= size(col("toks")) - 2) &&
      (graft.functions.md5_long(
        array_join(slice(col("toks"), col("i"), lit(3)), " ")) % modulus === 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunked = pos.withColumn("b", isBoundary.cast("long"))
      .withColumn("chunk_id", sum(col("b")).over(w) - col("b"))
    val extents = chunked.groupBy(col("doc_id"), col("chunk_id"))
      .agg(min(col("i")).cast("long").as("chunk_start"), count(lit(1)).as("chunk_len"))
    extents.join(base, "doc_id")
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"), col("chunk_len"),
        slice(col("toks"), col("chunk_start").cast("int"), col("chunk_len").cast("int"))
          .as("chunk_toks"))
  }

  def contentDefinedChunks(s: SparkSession, dir: String,
      modulus: Int = 16): DataFrame = {
    val chunks = chunkExtents(s, dir, modulus)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"), col("chunk_len"),
        md5(array_join(col("chunk_toks"), " ")).as("chunk_hash"))
    val occ = chunks.groupBy(col("chunk_hash")).agg(count(lit(1)).as("n_occurrences"))
    chunks.join(occ, "chunk_hash")
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        col("chunk_len"), col("chunk_hash"), col("n_occurrences"))
  }

  def contentDefinedChunksSql(modulus: Int = 16): String =
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
                   WHERE len(string_split(lower(text), ' ')) >= 1),
        pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM d),
        b AS (SELECT doc_id, toks, i,
                     CASE WHEN i <= len(toks) - 2
                          AND ('0x' || substring(md5(array_to_string(toks[i:i+2], ' ')), 1, 15))::BIGINT % $modulus = 0
                          THEN 1 ELSE 0 END AS b
              FROM pos),
        ch AS (SELECT doc_id, i,
                      (sum(b) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b)::BIGINT AS chunk_id
               FROM b),
        ext AS (SELECT doc_id, chunk_id, min(i)::BIGINT AS chunk_start,
                       count(*)::BIGINT AS chunk_len
                FROM ch GROUP BY 1, 2),
        chunks AS (
          SELECT e.doc_id, e.chunk_id, e.chunk_start, e.chunk_len,
                 md5(array_to_string(d.toks[e.chunk_start:e.chunk_start + e.chunk_len - 1], ' ')) AS chunk_hash
          FROM ext e JOIN d USING (doc_id)),
        occ AS (SELECT chunk_hash, count(*)::BIGINT AS n_occurrences
                FROM chunks GROUP BY 1)
        SELECT c.doc_id, c.chunk_id, c.chunk_start, c.chunk_len, c.chunk_hash, o.n_occurrences
        FROM chunks c JOIN occ o USING (chunk_hash)"""

  // ---- chunk-level passage retrieval (q180) ----

  /** Passage retrieval — the RAG serving composition at CHUNK
    * granularity (q152 retrieves documents; answers live in passages):
    * the corpus is content-defined-chunked ([[chunkExtents]] — the
    * SAME chunks q161 reports), every chunk gets a `dims`-dim hashed
    * bag-of-words embedding (slot j counts the chunk's tokens with
    * md5 % dims = j — the hashing-trick featurizer, integer
    * end-to-end), and each bounded query (the first `nQueries` docs'
    * full texts through the SAME featurizer) retrieves its top-`k`
    * passages.
    *
    * Scale path: candidates come from an EQUI-JOIN on the dominant-
    * slot bucket (argmax_j e_j, first-index tie-break) — the IVF idea
    * with a data-independent bucketing rule, so the index needs no
    * training and the oracle needs no literals; the exact re-rank
    * touches only same-bucket chunks. The similarity ledger is exact:
    * the dot product and both norms are BIGINT sums of products;
    * cosine is ONE division by ONE sqrt of their exact product —
    * bit-identical across engines. Rank windows carry the literal
    * bound (WindowGroupLimit prunes per-partition). Queries never
    * retrieve their own document's chunks.
    */
  private val passageIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), DataFrame]()
  private val passageQueryCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), DataFrame]()

  def passageRetrieval(s: SparkSession, dir: String, dims: Int = 16,
      nQueries: Int = 5, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id").asc, col("chunk_id").asc)
    // The rank window runs over a MATERIALIZED candidate frame (one
    // broadcast-join job, ~0.3 s at sf0.1): with the scored plan left
    // lazy, PruneFilters' constraint fixpoint over the cos/dot alias
    // equalities still cost 16 s of pure driver plan time even with
    // both join inputs checkpointed. Every segment boundary here is a
    // plain-attribute LogicalRDD, so no optimizer rule ever sees a
    // deep tree crossed with a filter.
    ArtifactCache.isolated(passageScored(s, dir, dims, nQueries))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("chunk_id"),
        col("dot"), col("cos"), col("rank"))
  }

  /** The lazy scored-candidate frame q180 ranks — factored out so the
    * plan suite can pin the bucket equi-join shape (the final frame
    * ranks over a materialized segment, hiding the join from its
    * plan).
    */
  private[graft] def passageScored(s: SparkSession, dir: String,
      dims: Int = 16, nQueries: Int = 5): DataFrame = {
    // The featurizer is explode → ONE hash per token → 16 conditional
    // sums through a REAL aggregation. Two wrong formulations came
    // first: 16 filter-lambdas each re-hashing (dims× the digest work,
    // 119 s at sf0.1), then 16 filters over one slot array — which
    // still died (~100 s), because the lambda tree re-inlines through
    // every downstream projection and blows the codegen budget (the
    // HyperplaneSigs failure class: giant fallback expressions
    // interpreting per row). The aggregate is a hard materialization
    // boundary — downstream plans see 16 plain integer columns — and
    // is the shape a 100 TB featurizer wants anyway (map-side combine
    // on the chunk key; tokens never ride the exchange uncombined).
    def embedFrom(df: DataFrame,
        toks: org.apache.spark.sql.Column,
        keep: Seq[org.apache.spark.sql.Column],
        keyNames: Seq[String]): DataFrame =
      df.select(keep :+
          explode(transform(toks, t => graft.functions.md5_long(t) % dims)).as("slot"): _*)
        .groupBy(keyNames.map(col): _*)
        .agg(
          sum(when(col("slot") === 0, 1L).otherwise(0L)).as("e0"),
          (1 until dims).map(j =>
            sum(when(col("slot") === j, 1L).otherwise(0L)).as(s"e$j")): _*)
    def withBucketNorm(df: DataFrame): DataFrame = {
      val es = (0 until dims).map(j => col(s"e$j"))
      df.withColumn("bucket",
          array_position(array(es: _*), array_max(array(es: _*))))
        .withColumn("norm2", es.map(e => e * e).reduce(_ + _))
    }
    // BOTH join inputs are materialized artifacts (the q83/q85
    // stored-index discipline — the chunk index is the serving layout,
    // the query embeddings the bounded probe batch), and the
    // checkpoints are also THE perf fix, not just thematic: with live
    // expression trees on the join inputs, Catalyst's PruneFilters
    // spent 34 of the 34.4 s plan time (RuleExecutor.dumpTimeSpent, 0
    // effective runs) grinding constraint propagation through the
    // bucket equality — an EqualTo of two 16-wide array_position
    // trees crossed with the norm2/rank filters. Checkpointed inputs
    // are plain attributes, so constraint canonicalization is linear
    // and the whole plan+run is ~0.5 s warm.
    // norm2 > 0 lives INSIDE the index build (empty chunks never
    // serve): placement is load-bearing — as a lazy Filter ABOVE the
    // dot/cos projection it is the node whose child-constraint set
    // PruneFilters grinds on.
    val chunks = ArtifactCache.cached(passageIndexCache, (dir, dims), s)(
      withBucketNorm(embedFrom(chunkExtents(s, dir),
        col("chunk_toks"), Seq(col("doc_id"), col("chunk_id")),
        Seq("doc_id", "chunk_id"))).filter(col("norm2") > 0))
    val queries = ArtifactCache.cached(
      passageQueryCache, (dir, dims, nQueries), s)(
      withBucketNorm(embedFrom(
        Tables.load(s, dir, "documents").filter(col("doc_id") < nQueries),
        tokens(col("text")), Seq(col("doc_id").as("query_id")),
        Seq("query_id"))))
    val qSide = queries.select(col("query_id") +: col("bucket") +:
      col("norm2").as("qnorm2") +: (0 until dims).map(j => col(s"e$j").as(s"q$j")): _*)
    val dot = (0 until dims).map(j => col(s"e$j") * col(s"q$j")).reduce(_ + _)
    chunks.join(broadcast(qSide), Seq("bucket"))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("chunk_id"),
        dot.as("dot"), col("norm2"), col("qnorm2"))
      .withColumn("cos",
        col("dot").cast("double") / sqrt((col("norm2") * col("qnorm2")).cast("double")))
  }

  def passageRetrievalSql(dims: Int = 16, nQueries: Int = 5, k: Int = 5,
      modulus: Int = 16): String = {
    def slotHash(t: String) =
      s"('0x' || substring(md5($t), 1, 15))::BIGINT % $dims"
    // mirror of the engine's one-digest-per-token shape: hash into a
    // slot list once, count slots with integer compares
    def slotsSel(toksExpr: String): String =
      s"list_transform($toksExpr, t -> ${slotHash("t")}) AS sl"
    val embedSel: String =
      (0 until dims).map(j =>
        s"len(list_filter(sl, x -> x = $j))::BIGINT AS e$j")
        .mkString(",\n                 ")
    val es = (0 until dims).map(j => s"e$j")
    val arr = es.mkString("[", ", ", "]")
    val norm2 = es.map(e => s"$e * $e").mkString(" + ")
    val dot = (0 until dims).map(j => s"c.e$j * q.q$j").mkString(" + ")
    val qRenames = (0 until dims).map(j => s"e$j AS q$j").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
                   WHERE len(string_split(lower(text), ' ')) >= 1),
        pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM d),
        b AS (SELECT doc_id, i,
                     CASE WHEN i <= len(toks) - 2
                          AND ('0x' || substring(md5(array_to_string(toks[i:i+2], ' ')), 1, 15))::BIGINT % $modulus = 0
                          THEN 1 ELSE 0 END AS b
              FROM pos),
        ch AS (SELECT doc_id, i,
                      (sum(b) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b)::BIGINT AS chunk_id
               FROM b),
        ext AS (SELECT doc_id, chunk_id, min(i)::BIGINT AS chunk_start,
                       count(*)::BIGINT AS chunk_len
                FROM ch GROUP BY 1, 2),
        cs AS (
          SELECT e.doc_id, e.chunk_id,
                 ${slotsSel("d.toks[e.chunk_start:e.chunk_start + e.chunk_len - 1]")}
          FROM ext e JOIN d USING (doc_id)),
        ce AS (SELECT doc_id, chunk_id, $embedSel FROM cs),
        cb AS (SELECT doc_id, chunk_id, ${es.mkString(", ")},
                      list_position($arr, list_max($arr))::BIGINT AS bucket,
                      ($norm2)::BIGINT AS norm2
               FROM ce),
        qs AS (SELECT doc_id AS query_id, ${slotsSel("toks")}
               FROM d WHERE doc_id < $nQueries),
        qe AS (SELECT query_id, $embedSel FROM qs),
        qb AS (SELECT query_id, $qRenames,
                      list_position($arr, list_max($arr))::BIGINT AS bucket,
                      ($norm2)::BIGINT AS qnorm2
               FROM qe),
        scored AS (
          SELECT q.query_id, c.doc_id, c.chunk_id,
                 ($dot)::BIGINT AS dot, c.norm2, q.qnorm2
          FROM cb c JOIN qb q USING (bucket)
          WHERE c.doc_id <> q.query_id AND c.norm2 > 0),
        ranked AS (
          SELECT query_id, doc_id, chunk_id, dot,
                 dot::DOUBLE / sqrt((norm2 * qnorm2)::DOUBLE) AS cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot::DOUBLE / sqrt((norm2 * qnorm2)::DOUBLE) DESC,
                            doc_id ASC, chunk_id ASC) AS rank
          FROM scored)
        SELECT query_id, doc_id, chunk_id, dot, cos, rank
        FROM ranked WHERE rank <= $k"""
  }

  // ---- tokenizer vocabulary induction (q155) ----

  /** Vocabulary induction — the BPE-prep step every tokenizer build
    * starts from: the top-`v` corpus tokens by frequency (ties to the
    * lexicographically smaller token) with each rank's CUMULATIVE
    * corpus coverage, so the vocab-size/coverage trade-off reads
    * directly off the result (the last row's coverage is 1 − OOV rate
    * at size v). Scale shape: one token-keyed count (map-side
    * combining), a distributed top-v (TakeOrderedAndProject — never a
    * global sort), and the running sum windows over ≤ v rows — the
    * single-partition step is bounded by the OUTPUT size, the same
    * bounded-top-N argument as q92's fusion. Coverage is one division
    * of exact BIGINTs per row.
    */
  /** Term-count grid — factored so the batch query (q155) and the
    * Complete-mode streamed form (q162) build the same computation:
    * counts are order-independent sums keyed by term (state =
    * corpus-vocabulary-sized, the documented Heaps-sublinear class —
    * q110's count tables make the same argument), so the converged
    * streaming state IS the batch count table. */
  def termCounts(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Top-v + cumulative coverage over a (term, cnt) table — the shared
    * fold (windows run over ≤ v rows by construction). */
  def vocabFold(counts: DataFrame, v: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = counts.agg(sum(col("cnt")).as("n_total"))
    val top = counts.orderBy(col("cnt").desc, col("term").asc).limit(v)
    val w = Window.orderBy(col("cnt").desc, col("term").asc)
    top.withColumn("rank", row_number().over(w))
      .withColumn("cum",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("term"), col("cnt"),
        (col("cum").cast("double") / col("n_total").cast("double")).as("cum_coverage"))
  }

  def vocabInduction(s: SparkSession, dir: String, v: Int = 256): DataFrame =
    vocabFold(termCounts(Tables.load(s, dir, "documents")), v)

  def vocabInductionSql(v: Int = 256): String =
    s"""WITH c AS (
          SELECT term, count(*)::BIGINT AS cnt
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
          GROUP BY 1),
        tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM c),
        top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term ASC LIMIT $v)
        SELECT row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank, term, cnt,
               (sum(cnt) OVER (ORDER BY cnt DESC, term ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
                 / n_total::DOUBLE AS cum_coverage
        FROM top, tot"""

  // ---- windowed co-occurrence PMI (q156) ----

  /** Pointwise mutual information over token pairs co-occurring within
    * a ±2 window — the word2vec/GloVe preprocessing statistic: which
    * vocabulary pairs occur together far more than their frequencies
    * predict. Pairs materialize IN-ROW (the q110 slice+zip move at
    * distances 1 and 2 — no positional self-join ever), both sides
    * restrict to the induced top-`vocab` vocabulary (the broadcast
    * bounded-literal class: the pair table is ≤ vocab² rows however
    * large the corpus), marginals and the slot total derive FROM the
    * bounded pair table, and the report is the top `topPairs` pairs by
    * count. Exactness: counts and both products are BIGINT (c·n and
    * ca·cb bounded by slot-total² < 2^62 at any realistic corpus slice
    * — documented, not assumed, via the vocab cap); PMI is ONE ln of a
    * single IEEE division of the two exact products, rounded once to
    * micro-units (the q96/q110 discipline).
    */
  /** The vocab-filtered pair-count grid — factored so the batch query
    * (q156) and the Complete-mode streamed form (q160) build the SAME
    * computation over their respective readers: pair counts are
    * order-independent sums bounded by vocab² rows, i.e. exactly the
    * streamable counter-grid class (the cmsGrid argument), so the
    * converged streaming state IS the batch grid and q156's oracle
    * applies unchanged.
    */
  def pmiPairCounts(docs: DataFrame, vt: DataFrame): DataFrame = {
    val toksCol = tokens(col("text"))
    // greatest(0, …): a doc shorter than the distance yields an empty
    // pair list, not a negative slice length (which throws under ANSI)
    def pairsAt(k: Int) = arrays_zip(
      slice(toksCol, lit(1), greatest(lit(0), size(toksCol) - k)).as("w1"),
      slice(toksCol, lit(1 + k), greatest(lit(0), size(toksCol) - k)).as("w2"))
    docs.select(explode(concat(pairsAt(1), pairsAt(2))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(broadcast(vt.select(col("term").as("w1"))), Seq("w1"))
      .join(broadcast(vt.select(col("term").as("w2"))), Seq("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
  }

  /** Marginals + PMI + top-N over a (w1, w2, c_ab) grid — the shared
    * fold (batch and streamed paths cannot drift in the ln/rounding
    * arithmetic). All inputs to the fold are vocab²-bounded. */
  def pmiFold(cab: DataFrame, topPairs: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = cab.groupBy(col("w1")).agg(sum(col("c_ab")).as("c_a"))
    val cb = cab.groupBy(col("w2")).agg(sum(col("c_ab")).as("c_b"))
    val tot = cab.agg(sum(col("c_ab")).as("n_slots"))
    val scored = cab.join(ca, "w1").join(cb, "w2").crossJoin(broadcast(tot))
      .withColumn("pmi_micro",
        round(log((col("c_ab") * col("n_slots")).cast("double")
          / (col("c_a") * col("c_b")).cast("double")) * 1e6).cast("long"))
    val top = scored.orderBy(col("c_ab").desc, col("w1").asc, col("w2").asc)
      .limit(topPairs)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("c_ab").desc, col("w1").asc, col("w2").asc)))
      .select(col("rank"), col("w1"), col("w2"), col("c_ab"), col("pmi_micro"))
  }

  def pmiPairs(s: SparkSession, dir: String, vocab: Int = 256,
      topPairs: Int = 100): DataFrame = {
    // vt feeds two broadcast filters (w1, w2) and cab feeds FOUR fold
    // consumers (ca, cb, tot, scored) — without boundaries the full
    // tokenize+explode pipeline re-ran once per consumer (the before
    // plan re-derived the documents scan ~12×). Both frames are
    // bounded (vocab and vocab² rows), so the checkpoints cost nothing
    // at any scale. q160's streamed form already does exactly this.
    val vt = graft.ArtifactCache.isolated(
      vocabInduction(s, dir, vocab).select(col("term")))
    pmiFold(graft.ArtifactCache.isolated(
      pmiPairCounts(Tables.load(s, dir, "documents"), vt)), topPairs)
  }

  def pmiPairsSql(vocab: Int = 256, topPairs: Int = 100): String =
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
        vt AS (SELECT term FROM (
          SELECT term, count(*)::BIGINT AS cnt
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
          GROUP BY 1)
          ORDER BY cnt DESC, term ASC LIMIT $vocab),
        raw AS (
          SELECT u.w1 AS w1, u.w2 AS w2 FROM (
            SELECT unnest(list_transform(range(1, len(l)), i -> {'w1': l[i], 'w2': l[i+1]})) AS u FROM d)
          UNION ALL
          SELECT u.w1, u.w2 FROM (
            SELECT unnest(list_transform(range(1, len(l) - 1), i -> {'w1': l[i], 'w2': l[i+2]})) AS u FROM d)),
        f AS (SELECT raw.w1, raw.w2 FROM raw
              JOIN vt a ON a.term = raw.w1 JOIN vt b ON b.term = raw.w2),
        cab AS (SELECT w1, w2, count(*)::BIGINT AS c_ab FROM f GROUP BY 1, 2),
        ca AS (SELECT w1, sum(c_ab)::BIGINT AS c_a FROM cab GROUP BY 1),
        cb AS (SELECT w2, sum(c_ab)::BIGINT AS c_b FROM cab GROUP BY 1),
        tot AS (SELECT sum(c_ab)::BIGINT AS n_slots FROM cab),
        scored AS (
          SELECT cab.w1, cab.w2, cab.c_ab,
                 round(ln((cab.c_ab * tot.n_slots)::DOUBLE / (ca.c_a * cb.c_b)::DOUBLE) * 1000000)::BIGINT AS pmi_micro
          FROM cab JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN tot),
        top AS (SELECT * FROM scored ORDER BY c_ab DESC, w1 ASC, w2 ASC LIMIT $topPairs)
        SELECT row_number() OVER (ORDER BY c_ab DESC, w1 ASC, w2 ASC) AS rank,
               w1, w2, c_ab, pmi_micro
        FROM top"""

  // ---- oracle SQL generators (same constants) ----

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def sqlStopHits(words: Seq[String]): String =
    s"len(list_filter(string_split(lower(text), ' '), t -> list_contains(${sqlList(words)}, t)))"

  val tokenCountsSql: String =
    s"""SELECT doc_id,
          len(string_split(lower(text), ' ')) AS n_tokens,
          len(regexp_extract_all(lower(text), '$bpePattern')) AS n_tokens_bpe,
          length(text) AS n_chars_txt
        FROM documents"""

  val qualityScoresSql: String = {
    val n = "len(string_split(lower(text), ' '))::DOUBLE"
    val stop = sqlStopHits(langStopwords.flatMap(_._2))
    val punct = s"len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE"
    val meanLen = s"(length(text)::DOUBLE - ($n - 1.0)) / $n"
    s"""SELECT doc_id,
          len(string_split(lower(text), ' ')) AS n_tokens,
          $stop / $n AS stopword_ratio,
          $meanLen AS mean_token_len,
          $punct / greatest(length(text)::DOUBLE, 1.0) AS punct_density,
          least(1.0, $n / 64.0) * 0.5
              + least(1.0, $stop / $n * 5.0) * 0.3
              + least(1.0, $meanLen / 8.0) * 0.2 AS quality
        FROM documents"""
  }

  val languageIdSql: String = {
    val hits = langStopwords.map { case (lang, words) => lang -> sqlStopHits(words) }
    val Seq(en, es, de) = hits.map(_._2)
    s"""SELECT doc_id, lang AS declared_lang,
          CASE WHEN $en > 0 AND $en >= $es AND $en >= $de THEN 'en'
               WHEN $es > 0 AND $es > $en AND $es >= $de THEN 'es'
               WHEN $de > 0 AND $de > $en AND $de > $es THEN 'de'
               ELSE 'und' END AS detected_lang
        FROM documents"""
  }

  val fingerprintsSql: String =
    """SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint,
          md5(lower(text)) AS exact_hash
       FROM documents"""

  // convenience loaders
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.load(s, dir, "documents"), col("text"))
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    qualityScores(Tables.load(s, dir, "documents"), col("text"))
  def languageId(s: SparkSession, dir: String): DataFrame =
    languageId(Tables.load(s, dir, "documents"), col("text"))
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.load(s, dir, "documents"), col("text"))
  def repetitionScores(s: SparkSession, dir: String): DataFrame =
    repetitionScores(Tables.load(s, dir, "documents"), col("text"))
  def piiScan(s: SparkSession, dir: String): DataFrame =
    piiScan(Tables.load(s, dir, "documents"), col("text"))
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    piiRedact(Tables.load(s, dir, "documents"), col("text"))

  // ---- BPE merge induction (q183) + encode stats (q188) ----

  /** Tokenizer TRAINING in-engine: byte-pair-encoding merge induction
    * over the corpus token sequences — each round counts adjacent
    * symbol pairs, takes the global argmax as the next merge rule, and
    * re-segments every sequence by that rule (greedy left-to-right, as
    * BPE specifies). q155 induces the vocab BPE starts FROM; this runs
    * the merge loop itself — the part usually assumed to need an
    * imperative trainer — as `bpeRounds` relational rounds.
    *
    * The left-to-right overlap discipline is the one non-obvious bit:
    * two occurrences of (w1, w2) can only overlap when w1 = w2 (an
    * occurrence at i and i+1 forces sym[i+1] = w2 = w1), so greedy
    * scanning ≡ "merge every occurrence" when w1 ≠ w2, and "merge the
    * even offsets within each maximal equal-symbol run" when w1 = w2
    * — both expressible as entity-partitioned windows (gaps-and-
    * islands run ids + run-offset parity), never a per-row sequential
    * loop. A merged symbol is the space-join of its parts, so rules
    * compose across rounds ("a b" can merge again with "c").
    *
    * Scale shape: pair counts are token-keyed sums with map-side
    * combine; the argmax is a 1-row TakeOrderedAndProject broadcast;
    * re-segmentation is per-document windows (history-deep, never
    * corpus-wide) + one per-doc rebuild aggregate. Each round lands at
    * a checkpoint boundary (the q130/q182 round discipline — at
    * production scale each round's corpus would persist to storage,
    * same shape). Cost is Θ(corpus) per round — which is what BPE
    * training costs anywhere; the engine form just shards it.
    */
  val bpeRounds = 3

  private[graft] def bpeSeqs0(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(col("doc_id"), tokens(col("text")).as("syms"))

  private[graft] def bpePairCounts(seqs: DataFrame): DataFrame =
    seqs.select(explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("w1"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("w2"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))

  private[graft] def bpeBest(pc: DataFrame): DataFrame =
    pc.orderBy(col("cnt").desc, col("w1").asc, col("w2").asc).limit(1)

  /** Apply one merge rule everywhere (see the overlap note above). */
  private[graft] def bpeApply(seqs: DataFrame, best: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wD = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val pos = seqs.select(col("doc_id"), posexplode(col("syms")).as(Seq("i", "sym")))
      .crossJoin(broadcast(best))
      .withColumn("nxt", lead(col("sym"), 1).over(wD))
      .withColumn("brk", when(lag(col("sym"), 1).over(wD).isNull ||
        lag(col("sym"), 1).over(wD) =!= col("sym"), 1L).otherwise(0L))
    val runs = pos
      .withColumn("pair_here",
        coalesce(col("sym") === col("w1") && col("nxt") === col("w2"), lit(false)))
      .withColumn("run_id",
        sum(col("brk")).over(wD.rowsBetween(Window.unboundedPreceding, 0)))
    val wR = Window.partitionBy(col("doc_id"), col("run_id")).orderBy(col("i"))
    val marked = runs
      .withColumn("merge_start", col("pair_here") &&
        (col("w1") =!= col("w2") ||
          pmod(row_number().over(wR) - 1, lit(2)) === 0))
      .withColumn("consumed",
        coalesce(lag(col("merge_start"), 1).over(wD), lit(false)))
    marked.filter(!col("consumed"))
      .withColumn("sym2",
        when(col("merge_start"), concat(col("sym"), lit(" "), col("nxt")))
          .otherwise(col("sym")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("i"), col("sym2")))).as("p"))
      .select(col("doc_id"), transform(col("p"), e => e.getField("sym2")).as("syms"))
  }

  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()

  /** One training run per corpus dir → (merge rules, final sequences),
    * both shared by q183/q188 (the ArtifactCache session-guard
    * contract, inlined because the artifact here is a PAIR).
    */
  private def bpeChain(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    bpeCache.compute(dir, (_, hit) =>
      if (hit != null && (hit._1.sparkSession eq s) && !s.sparkContext.isStopped) hit
      else {
        var seqs = graft.ArtifactCache.isolated(bpeSeqs0(s, dir))
        val rules = (1 to bpeRounds).map { r =>
          val best = graft.ArtifactCache.isolated(bpeBest(bpePairCounts(seqs)))
          seqs = graft.ArtifactCache.isolated(bpeApply(seqs, best))
          val nAfter = seqs.agg(sum(size(col("syms"))).cast("long").as("n_symbols_after"))
          graft.ArtifactCache.isolated(
            best.crossJoin(broadcast(nAfter))
              .select(lit(r.toLong).as("round"), col("w1"), col("w2"), col("cnt"),
                col("n_symbols_after")))
        }
        (graft.ArtifactCache.isolated(rules.reduce(_ union _)), seqs)
      })

  /** q183: the learned merge table — one row per round: the rule, its
    * pre-merge pair count, and the corpus symbol count after applying
    * it (pins the whole re-segmentation cell-exactly).
    */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = bpeChain(s, dir)._1

  /** q188: what the learned tokenizer DOES to the corpus — per-source
    * token counts before/after the `bpeRounds` merges and the
    * compression ratio (one division of exact BIGINTs). The accounting
    * a mixing step (q104/q178) consumes when budgets are in TOKENS.
    */
  def bpeEncodeStats(s: SparkSession, dir: String): DataFrame = {
    val seqs = bpeChain(s, dir)._2
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(seqs.select(col("doc_id"), size(col("syms")).cast("long").as("n_syms")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens_before"),
        sum(col("n_syms")).as("n_symbols_after"))
      .withColumn("compression",
        col("n_symbols_after").cast("double") / col("n_tokens_before").cast("double"))
  }

  /** The s0→s{bpeRounds} chain every BPE oracle shares — the full SQL
    * re-derivation of the training loop (pair counts, argmax,
    * windowed re-segmentation), no literals.
    */
  private def bpeChainSql: String = {
    val rounds = (1 to bpeRounds).map { r =>
      val p = s"s${r - 1}"
      s"""pc$r AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*)::BIGINT AS cnt
                FROM (SELECT unnest(list_transform(range(1, len(syms)),
                        i -> {'w1': syms[i], 'w2': syms[i + 1]})) AS u
                      FROM $p)
                GROUP BY 1, 2),
        b$r AS (SELECT w1, w2, cnt FROM pc$r ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1),
        f$r AS (SELECT doc_id, i, sym, b.w1, b.w2,
                       lead(sym) OVER (PARTITION BY doc_id ORDER BY i) AS nxt,
                       CASE WHEN lag(sym) OVER (PARTITION BY doc_id ORDER BY i)
                                 IS DISTINCT FROM sym THEN 1 ELSE 0 END AS brk
                FROM (SELECT doc_id, u.i AS i, u.sym AS sym
                      FROM (SELECT doc_id, unnest(list_transform(range(1, len(syms) + 1),
                              i -> {'i': i, 'sym': syms[i]})) AS u
                            FROM $p)), b$r b),
        g$r AS (SELECT *, coalesce(sym = w1 AND nxt = w2, false) AS pair_here,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
                FROM f$r),
        h$r AS (SELECT *, (pair_here AND (w1 <> w2 OR
                       (row_number() OVER (PARTITION BY doc_id, run_id ORDER BY i) - 1) % 2 = 0))
                       AS merge_start
                FROM g$r),
        j$r AS (SELECT doc_id, i,
                       CASE WHEN merge_start THEN sym || ' ' || nxt ELSE sym END AS sym2,
                       coalesce(lag(merge_start) OVER (PARTITION BY doc_id ORDER BY i), false)
                         AS consumed
                FROM h$r),
        s$r AS (SELECT doc_id, list(sym2 ORDER BY i) AS syms
                FROM j$r WHERE NOT consumed GROUP BY 1),
        r$r AS (SELECT $r::BIGINT AS round, w1, w2, cnt,
                       (SELECT sum(len(syms)) FROM s$r)::BIGINT AS n_symbols_after
                FROM b$r)"""
    }.mkString(",\n        ")
    s"""s0 AS (SELECT doc_id, string_split(lower(text), ' ') AS syms FROM documents),
        $rounds"""
  }

  def bpeMergesSql(): String =
    s"""WITH $bpeChainSql
        ${(1 to bpeRounds).map(r =>
          s"SELECT round, w1, w2, cnt, n_symbols_after FROM r$r")
          .mkString("\n        UNION ALL ")}"""

  // ---- live BPE / vocabulary drift monitor (q218) ----

  /** The adjacent-pair counter grid as STREAM STATE (the q160 PMI
    * class): per-(w1, w2) counts over the document ingest, maintained
    * Complete-mode — counter sums are order-independent, so the
    * converged grid equals the batch pair counts whatever the
    * batching. State is bounded by the distinct-adjacent-pair grid
    * (≤ vocab², in practice far sparser), never by corpus size.
    */
  def bpeLivePairCells(docs: DataFrame): DataFrame =
    bpePairCounts(docs.select(col("doc_id"), tokens(col("text")).as("syms")))

  /** The read-time fold: the top-10 CANDIDATE MERGES from the live
    * grid (cnt desc, pair asc — exactly [[bpeBest]]'s order widened to
    * a ranking). This is the tokenizer drift monitor: rank 1 is the
    * merge BPE would learn FIRST on the data seen so far — when it
    * diverges from the trained table's round-1 rule (q183), the
    * vocabulary has drifted and retraining is due. TakeOrderedAndProject
    * top-N over the bounded grid; the 10-row window is post-limit.
    */
  def bpeDriftFold(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("cnt").desc, col("w1").asc, col("w2").asc)
    val w = Window.orderBy(ord: _*)
    cells.orderBy(ord: _*).limit(10)
      .select(col("w1"), col("w2"), col("cnt"),
        row_number().over(w).cast("long").as("rank"))
  }

  /** Oracle: the same pair-count derivation as [[bpeChainSql]]'s first
    * round (`pc1`) with the ranking applied — the converged live grid
    * IS the batch grid.
    */
  def bpeDriftSql(): String =
    s"""WITH s0 AS (SELECT doc_id, string_split(lower(text), ' ') AS syms FROM documents),
        pc AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*)::BIGINT AS cnt
               FROM (SELECT unnest(list_transform(range(1, len(syms)),
                       i -> {'w1': syms[i], 'w2': syms[i + 1]})) AS u
                     FROM s0)
               GROUP BY 1, 2)
        SELECT w1, w2, cnt,
               row_number() OVER (ORDER BY cnt DESC, w1 ASC, w2 ASC)::BIGINT AS rank
        FROM pc QUALIFY rank <= 10"""

  // ---- word2vec negative-sampling table (q193) ----

  /** The unigram^(3/4) noise distribution word2vec/SGNS samples
    * negatives from, materialized over q155's vocabulary: per-term
    * weight c^0.75 with the cumulative distribution a sampler
    * binary-searches at train time. The power is computed WITHOUT
    * exp/pow (library-dependent rounding): c^0.75 = √(c·√c) — two
    * correctly-rounded IEEE sqrts and one multiply, identical on both
    * engines — then micro-rounded ONCE; the CDF is cumulative BIGINT
    * sums with the total from the same single window pass (the q181
    * move), one division per row. Everything past the q155 count runs
    * over ≤ v rows.
    */
  def negativeSampling(s: SparkSession, dir: String, v: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRaw = sqrt(col("cnt").cast("double") * sqrt(col("cnt").cast("double")))
    val wd = Window.orderBy(col("rank"))
    vocabInduction(s, dir, v).select(col("rank"), col("term"), col("cnt"))
      .withColumn("w_micro", round(wRaw * lit(1000000.0)).cast("long"))
      .withColumn("cum_w",
        sum(col("w_micro")).over(wd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot_w",
        sum(col("w_micro")).over(wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("rank"), col("term"), col("cnt"), col("w_micro"),
        col("cum_w"), (col("cum_w").cast("double") / col("tot_w").cast("double")).as("cdf"))
  }

  def negativeSamplingSql(v: Int = 256): String =
    s"""WITH base AS (${vocabInductionSql(v)}),
        w AS (SELECT rank, term, cnt,
                     round(sqrt(cnt::DOUBLE * sqrt(cnt::DOUBLE)) * 1000000.0)::BIGINT AS w_micro
              FROM base),
        c AS (SELECT rank, term, cnt, w_micro,
                     (sum(w_micro) OVER (ORDER BY rank
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_w,
                     (sum(w_micro) OVER ())::BIGINT AS tot_w
              FROM w)
        SELECT rank, term, cnt, w_micro, cum_w,
               cum_w::DOUBLE / tot_w::DOUBLE AS cdf
        FROM c"""

  // ---- OOV-rate report under the induced vocabulary (q192) ----

  /** Per-source out-of-vocabulary rate under q155's top-v vocabulary —
    * the practical readout of the vocab-size/coverage trade-off: which
    * ingest sources the tokenizer will shred into unknowns (code and
    * non-English sources spike here long before global coverage
    * moves). Composes the EXACT q155 table; the vocab is v rows by
    * construction, so the membership join is a broadcast and the
    * report is one corpus scan folded to the per-source grid.
    */
  def oovRates(s: SparkSession, dir: String, v: Int = 256): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .join(broadcast(vocabInduction(s, dir, v)
        .select(col("term"), lit(1L).as("in_vocab"))), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))

  def oovRatesSql(v: Int = 256): String =
    s"""WITH base AS (${vocabInductionSql(v)}),
        t AS (SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        j AS (SELECT t.source, (base.term IS NOT NULL) AS iv
              FROM t LEFT JOIN base ON t.term = base.term)
        SELECT source, count(*)::BIGINT AS n_tokens,
               sum(CASE WHEN NOT iv THEN 1 ELSE 0 END)::BIGINT AS n_oov,
               (sum(CASE WHEN NOT iv THEN 1 ELSE 0 END)::BIGINT)::DOUBLE
                 / (count(*)::BIGINT)::DOUBLE AS oov_rate
        FROM j GROUP BY 1"""

  // ---- corpus power-law fits: Zipf (q184) and Heaps (q189) ----

  /** Least-squares line fit over integer milli-unit log points — the
    * fold shared by the Zipf rank-frequency fit (q184) and the Heaps
    * vocabulary-growth fit (q189). Exactness: each ln is taken once
    * per input row and rounded once to milli-units (the q96
    * discipline), every moment is then an order-independent BIGINT
    * sum, and the slope/r² are divisions of exact BIGINTs (milli
    * scales cancel in the slope; the intercept converts back to ln
    * units with one /1000). Both callers feed BOUNDED xy tables (top-v
    * vocab rows / prefix-grid cells), so the fold is a single
    * all-to-one aggregate of a small frame whatever the corpus size.
    */
  private[graft] def regressionFold(xy: DataFrame): DataFrame = {
    val st = xy.agg(count(lit(1)).as("n"), sum(col("xm")).as("sx"),
      sum(col("ym")).as("sy"), sum(col("xm") * col("ym")).as("sxy"),
      sum(col("xm") * col("xm")).as("sxx"), sum(col("ym") * col("ym")).as("syy"))
    val dxx = col("n") * col("sxx") - col("sx") * col("sx")
    val dyy = col("n") * col("syy") - col("sy") * col("sy")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    st.withColumn("slope",
        when(dxx > 0, num.cast("double") / dxx.cast("double")))
      .select(col("n"), col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double") / lit(1000.0)).as("intercept"),
        when(dxx > 0 && dyy > 0,
          (num.cast("double") * num.cast("double"))
            / (dxx.cast("double") * dyy.cast("double"))).as("r2"))
  }

  /** Shared SQL tail: expects a CTE `xy(xm, ym)` in scope. */
  private def regressionFoldSql: String =
    s"""st AS (SELECT count(*)::BIGINT AS n, sum(xm)::BIGINT AS sx, sum(ym)::BIGINT AS sy,
                      sum(xm * ym)::BIGINT AS sxy, sum(xm * xm)::BIGINT AS sxx,
                      sum(ym * ym)::BIGINT AS syy
               FROM xy),
        sl AS (SELECT *, CASE WHEN n * sxx - sx * sx > 0
                              THEN (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
                         END AS slope
               FROM st)
        SELECT n, slope,
               (sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE / 1000.0 AS intercept,
               CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN ((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE)
                         / ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE)
               END AS r2
        FROM sl"""

  /** q184: Zipf's-law fit over the induced vocabulary — the slope of
    * ln(freq) against ln(rank) on q155's top-v table (−slope is the
    * Zipf exponent, r² how law-like the corpus is; natural text ≈ −1,
    * and template/boilerplate-heavy corpora bend away — a corpus-level
    * health check next to the per-doc gates). Composition: fits the
    * EXACT table q155 ships, so the two reports can't disagree about
    * what the vocabulary is.
    */
  def zipfFit(s: SparkSession, dir: String, v: Int = 256): DataFrame =
    regressionFold(vocabInduction(s, dir, v)
      .select(round(log(col("rank").cast("double")) * 1000).cast("long").as("xm"),
        round(log(col("cnt").cast("double")) * 1000).cast("long").as("ym")))

  def zipfFitSql(v: Int = 256): String =
    s"""WITH base AS (${vocabInductionSql(v)}),
        xy AS (SELECT round(ln(rank::DOUBLE) * 1000)::BIGINT AS xm,
                      round(ln(cnt::DOUBLE) * 1000)::BIGINT AS ym
               FROM base),
        $regressionFoldSql"""

  /** q189: Heaps'-law fit — vocabulary growth V(N) ≈ K·N^β across
    * corpus prefixes (β is the sublinearity every "vocabulary-sized
    * state" argument in this repo leans on — q110/q155/q162 cite
    * Heaps; this MEASURES it on the corpus at hand). Prefixes are
    * `cells` doc-id ranges: per-term first-seen doc (one token-keyed
    * min), per-cell token totals, then cumulative (N, V) over the
    * ≤ cells grid — corpus-sized work is two keyed aggregates, the
    * windows and the fit run over the bounded grid.
    */
  def heapsFit(s: SparkSession, dir: String, cells: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(s, dir, "documents")
    val tot = docs.agg((max(col("doc_id")) + 1).as("td"))
    val cellOf = (d: Column) =>
      floor((d * cells).cast("double") / col("td").cast("double")).cast("long")
    val cellTok = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("nt"))
      .crossJoin(broadcast(tot))
      .groupBy(cellOf(col("doc_id")).as("cell")).agg(sum(col("nt")).as("toks"))
    val cellNew = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(tot))
      .groupBy(cellOf(col("fd")).as("cell")).agg(count(lit(1)).as("newt"))
    val w = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xy = cellTok.join(cellNew, Seq("cell"), "left")
      .select(col("cell"), col("toks"), coalesce(col("newt"), lit(0L)).as("newt"))
      .select(sum(col("toks")).over(w).as("n_le"), sum(col("newt")).over(w).as("v_le"))
      .select(round(log(col("n_le").cast("double")) * 1000).cast("long").as("xm"),
        round(log(col("v_le").cast("double")) * 1000).cast("long").as("ym"))
    regressionFold(xy)
  }

  def heapsFitSql(cells: Int = 64): String =
    s"""WITH d AS (SELECT doc_id, len(string_split(lower(text), ' '))::BIGINT AS nt FROM documents),
        tot AS (SELECT max(doc_id) + 1 AS td FROM d),
        ct AS (SELECT floor((doc_id * $cells)::DOUBLE / td::DOUBLE)::BIGINT AS cell,
                      sum(nt)::BIGINT AS toks
               FROM d, tot GROUP BY 1),
        fs AS (SELECT term, min(doc_id) AS fd
               FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
               GROUP BY 1),
        cn AS (SELECT floor((fd * $cells)::DOUBLE / td::DOUBLE)::BIGINT AS cell,
                      count(*)::BIGINT AS newt
               FROM fs, tot GROUP BY 1),
        g AS (SELECT ct.cell, ct.toks, coalesce(cn.newt, 0)::BIGINT AS newt
              FROM ct LEFT JOIN cn USING (cell)),
        c AS (SELECT (sum(toks) OVER (ORDER BY cell
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS n_le,
                     (sum(newt) OVER (ORDER BY cell
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS v_le
              FROM g),
        xy AS (SELECT round(ln(n_le::DOUBLE) * 1000)::BIGINT AS xm,
                      round(ln(v_le::DOUBLE) * 1000)::BIGINT AS ym
               FROM c),
        $regressionFoldSql"""

  def bpeEncodeStatsSql(): String =
    s"""WITH $bpeChainSql,
        bef AS (SELECT doc_id, source,
                       len(string_split(lower(text), ' '))::BIGINT AS n_tokens
                FROM documents),
        aft AS (SELECT doc_id, len(syms)::BIGINT AS n_syms FROM s$bpeRounds)
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(n_tokens)::BIGINT AS n_tokens_before,
               sum(n_syms)::BIGINT AS n_symbols_after,
               (sum(n_syms)::BIGINT)::DOUBLE / (sum(n_tokens)::BIGINT)::DOUBLE AS compression
        FROM bef JOIN aft USING (doc_id)
        GROUP BY 1"""
}
