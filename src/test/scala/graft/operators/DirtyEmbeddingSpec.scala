package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the dense-vector boundary contract ([[Similarity.withDenseV]] ↔
  * `denseWhereSql`): a vector holding a null ELEMENT must be excluded
  * identically by the engine's assignment (max_by over the native
  * cosine kernel, which nulls out on a null element) and the oracle's
  * formulation (row_number over DuckDB's null-SKIPPING list_sum, which
  * scores a partial dot product instead). Without the shared gate the
  * two formulations genuinely diverge on such a row — this spec keeps
  * that regression visible alongside the agreement proof.
  */
class DirtyEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private val rawSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(DoubleType, containsNull = true))))
  // 1/2: clean; 3: null VECTOR (in-contract, dropped by the family's
  // visible v IS NOT NULL rule); 4: dirty — a null ELEMENT
  private def raw: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.0, 1.0)),
      // the dirty vector's surviving element points at centroid 1, so
      // DuckDB's null-skipping partial cosine assigns bucket 1 — while
      // the engine's nulled-out cosine leaves max_by's struct ordering
      // to fall through to the cent_id tiebreak (bucket 0): a real,
      // visible divergence without the gate
      Row(3L, null), Row(4L, Seq(null, 0.9))),
    rawSchema)
  private def cents: DataFrame =
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cent_id", "cv")

  // the oracle's semantics, emulated exactly: DuckDB list_sum SKIPS
  // null elements, so a dirty vector gets a (wrong but non-null)
  // partial cosine, and row_number assigns it a bucket regardless
  private def oracleAssign(e: DataFrame): Map[Long, Long] = {
    def dot(a: Column, b: Column): Column =
      aggregate(filter(zip_with(a, b, (x, y) => x * y), p => p.isNotNull),
        lit(0.0), (acc, x) => acc + x)
    e.filter(col("v").isNotNull).crossJoin(cents)
      .withColumn("ccos",
        dot(col("v"), col("cv")) / sqrt(dot(col("v"), col("v")))
          / sqrt(dot(col("cv"), col("cv"))))
      .withColumn("crank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id").asc)))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("cent_id").as("bucket"))
      .as[(Long, Long)].collect().toMap
  }

  test("through the dense gate, engine and oracle agree on a dirty fixture") {
    val engine = Similarity.ivfAssign(Similarity.withDenseV(raw), cents)
      .select(col("vec_id"), col("bucket")).as[(Long, Long)].collect().toMap
    // the oracle e CTE = raw rows passing denseWhereSql's predicate
    val e = raw
      .filter(col("embedding").isNull || forall(col("embedding"), x => x.isNotNull))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    assert(engine == Map(1L -> 0L, 2L -> 1L))
    assert(oracleAssign(e) == engine)
  }

  test("without the gate the formulations diverge — the regression the gate closes") {
    val eDirty = raw
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // DuckDB-style: the dirty vector scores a partial dot product and
    // IS assigned a bucket
    val oracle = oracleAssign(eDirty)
    assert(oracle.contains(4L), s"oracle emulation should assign the dirty row: $oracle")
    // engine: the null-checking cosine kernel yields NULL for every
    // centroid, so the dirty vector never gets a real assignment —
    // whatever max_by does with all-null ordering keys, it cannot match
    // the oracle's concrete bucket for row 4
    val engine = Similarity.ivfAssign(eDirty, cents)
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(engine.get(4L).flatten != Some(oracle(4L)),
      s"expected divergence on the dirty row: engine=$engine oracle=$oracle")
  }

  test("map-only literal-argmax assignment ≡ the join formulation, and plans with NO exchange") {
    val centsArr = Array((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
    val viaJoin = Similarity.ivfAssign(Similarity.withDenseV(raw), cents)
      .select(col("vec_id"), col("bucket")).as[(Long, Long)].collect().toMap
    val mapOnly = Similarity.ivfAssignMapOnly(Similarity.withDenseV(raw), centsArr)
    assert(mapOnly.select(col("vec_id"), col("bucket"))
      .as[(Long, Long)].collect().toMap == viaJoin)
    val p = mapOnly.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"map-only assignment must not shuffle:\n$p")
  }

  test("map-only ≡ join on real embeddings across a multi-centroid fixture (tie-break included)") {
    // real 64-dim vectors, four deterministic centroids — every cosine
    // is computed by the SAME kernel expression in both formulations,
    // so agreement here pins arithmetic AND the (ccos, -cent_id)
    // lexicographic tie-break across the two shapes
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centsArr = Array.tabulate(4)(c =>
      (c, Array.tabulate(64)(i => math.sin((c + 1.0) * (i + 1.0)))))
    val centsDf = centsArr.toSeq.map { case (i, v) => (i.toLong, v.toSeq) }
      .toDF("cent_id", "cv")
    val viaJoin = Similarity.ivfAssign(e, centsDf)
      .select(col("vec_id"), col("bucket")).as[(Long, Long)].collect().toMap
    val mapOnly = Similarity.ivfAssignMapOnly(e, centsArr)
      .select(col("vec_id"), col("bucket")).as[(Long, Long)].collect().toMap
    assert(viaJoin.nonEmpty && mapOnly == viaJoin)
  }
}
