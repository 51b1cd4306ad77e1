package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers graft's native expressions with the session
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`), making
  * them available both to the Column helpers in [[graft.functions]] (via
  * `call_function`) and to plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Evaluate a foldable array argument (a trained constant table,
    * e.g. PQ centroids/codebooks) down to Scala Seqs, with proper
    * argument errors: a NULL literal, a non-array, or non-double leaf
    * elements must fail with a descriptive message at resolution, not a
    * raw NPE/ClassCastException at runtime (the same principle as
    * checkArity above).
    */
  private def foldedArray(e: Expression, what: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a foldable array literal, got $e")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a
      case other => throw new IllegalArgumentException(
        s"$what must be a non-null array literal, got ${if (other == null) "NULL" else other}")
    }
  }

  private def leafDoubles(a: org.apache.spark.sql.catalyst.util.ArrayData, what: String): Seq[Double] =
    try (0 until a.numElements()).map { i =>
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"$what must not contain NULL elements")
      a.getDouble(i)
    } catch { case _: ClassCastException =>
      throw new IllegalArgumentException(s"$what elements must be DOUBLE")
    }

  /** A null sub-array (e.g. `array(array(1.0), NULL)`) is the same
    * argument error as a null leaf — raise it, don't NPE downstream.
    */
  private def subArray(a: org.apache.spark.sql.catalyst.util.ArrayData, i: Int,
      what: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sub = a.getArray(i)
    if (sub == null)
      throw new IllegalArgumentException(s"$what must not contain NULL elements")
    sub
  }

  private def doubles2(e: Expression, what: String): Seq[Seq[Double]] = {
    val arr = foldedArray(e, what)
    try (0 until arr.numElements()).map(i => leafDoubles(subArray(arr, i, what), what))
    catch { case _: ClassCastException =>
      throw new IllegalArgumentException(s"$what must be array<array<double>>")
    }
  }

  private def doubles3(e: Expression, what: String): Seq[Seq[Seq[Double]]] = {
    val arr = foldedArray(e, what)
    try (0 until arr.numElements()).map { i =>
      val mid = subArray(arr, i, what)
      (0 until mid.numElements()).map(j => leafDoubles(subArray(mid, j, what), what))
    } catch { case _: ClassCastException =>
      throw new IllegalArgumentException(s"$what must be array<array<array<double>>>")
    }
  }

  /** A SQL call with the wrong arity must be a proper analysis error
    * (the standard WRONG_NUM_ARGS class), not an
    * IndexOutOfBoundsException out of the builder's exprs(i).
    */
  private def checkArity(name: String, exprs: Seq[Expression], valid: Seq[Int]): Unit =
    if (!valid.contains(exprs.size))
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> valid.mkString(" or "),
          "actualNum" -> exprs.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_avro_encode"),
      new ExpressionInfo(classOf[AvroEncode].getName, "graft_avro_encode"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_avro_encode", exprs, Seq(2))
        AvroEncode(exprs.head, stringArg(exprs(1), "avro writer schema"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_decode"),
      new ExpressionInfo(classOf[AvroDecode].getName, "graft_avro_decode"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_avro_decode", exprs, Seq(2))
        AvroDecode(exprs.head, stringArg(exprs(1), "avro reader schema"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_blake2b"),
      new ExpressionInfo(classOf[Blake2bDigest].getName, "graft_blake2b"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_blake2b", exprs, Seq(1, 2))
        Blake2bDigest(exprs.head,
          if (exprs.size > 1) intArg(exprs(1), "digest size") else 8)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kafka_partition"),
      new ExpressionInfo(classOf[KafkaPartition].getName, "graft_kafka_partition"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_kafka_partition", exprs, Seq(2))
        KafkaPartition(exprs.head, intArg(exprs(1), "numPartitions"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_shingles", exprs, Seq(1, 2))
        Shingles(exprs.head,
          if (exprs.size > 1) intArg(exprs(1), "shingle size") else 3)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "graft_md5_long"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_md5_long", exprs, Seq(1))
        Md5Long(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_sim"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_cosine_sim", exprs, Seq(2))
        CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cov_pairs"),
      new ExpressionInfo(classOf[CovPairs].getName, "graft_cov_pairs"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_cov_pairs", exprs, Seq(1))
        CovPairs(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_simhash16", exprs, Seq(1))
        SimHash16(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_minhash_sig", exprs, Seq(1))
        MinHashSig(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "graft_hyperplane_sigs"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_hyperplane_sigs", exprs, Seq(4))
        HyperplaneSigs(exprs.head, intArg(exprs(1), "bits"),
          intArg(exprs(2), "tables"), intArg(exprs(3), "dim"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_keys"),
      new ExpressionInfo(classOf[WinnowKeys].getName, "graft_winnow_keys"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_winnow_keys", exprs, Seq(3))
        WinnowKeys(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_pq_encode", exprs, Seq(3, 4))
        PqEncode(exprs.head, doubles2(exprs(1), "centroids"),
          doubles3(exprs(2), "codebooks"),
          residual = exprs.size > 3 && (exprs(3) match {
            case Literal(b: Boolean, _) => b
            case other => throw new IllegalArgumentException(
              s"residual flag must be a boolean literal, got $other")
          }))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_known_non_null_elements"),
      new ExpressionInfo(classOf[KnownNonNullElements].getName, "graft_known_non_null_elements"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_known_non_null_elements", exprs, Seq(1))
        KnownNonNullElements(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, "graft_intersect_size"),
      (exprs: Seq[Expression]) => {
        checkArity("graft_intersect_size", exprs, Seq(2))
        IntersectSize(exprs(0), exprs(1))
      }))
  }
}
