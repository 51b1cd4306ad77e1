package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}

/** Analysis-time input check shared by graft's unary expressions: SQL
  * callers bypass the typed Column helpers, so without this a wrong
  * argument type would surface as a mid-job ClassCastException (or,
  * worse, silently wrong bytes) instead of an AnalysisException.
  */
private[functions] trait RequiresInputType { self: UnaryExpression =>
  def requiredType: DataType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == requiredType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $requiredType input, got ${child.dataType}")
}

/** Native Catalyst expressions for the JoinKey fidelity layer (SURVEY.md
  * §2 O5/O6/O18). These stay inside whole-stage codegen: `doGenCode`
  * emits a static call, so no boxing or interpreted fallback in the hot
  * path.
  */

/** BLAKE2b digest of a binary column, `size` bytes (1-64) — the
  * reference's key-hashing schema
  * (`schema/blake/Blake2BJoinKeySchema.java:52-56`, digest size demo = 8,
  * `HackerNewsPipeline.java:42`).
  */
case class Blake2bDigest(child: Expression, size: Int)
    extends UnaryExpression with RequiresInputType {
  require(size >= 1 && size <= 64, s"blake2b digest size must be 1..64, got $size")
  override def requiredType: DataType = BinaryType
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    Blake2b.digest(input.asInstanceOf[Array[Byte]], size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Blake2b.digest($c, $size)")
  override protected def withNewChildInternal(newChild: Expression): Blake2bDigest =
    copy(child = newChild)
  override def prettyName: String = "blake2b"
}

/** Kafka-compatible partition id for a key: `toPositive(murmur2(bytes)) %
  * numPartitions` — parity with the reference's FK-only stream
  * partitioner (`transform/JoinKeyPartitioner.java:20-22`), which routes
  * index records by murmur2 of the FK digest. Murmur2 follows the public
  * MurmurHash2 algorithm with Kafka's seed (0x9747b28c).
  */
case class KafkaPartition(child: Expression, numPartitions: Int)
    extends UnaryExpression with RequiresInputType {
  require(numPartitions > 0, "numPartitions must be positive")
  override def requiredType: DataType = BinaryType
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Murmur2.partition(input.asInstanceOf[Array[Byte]], numPartitions)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Murmur2.partition($c, $numPartitions)")
  override protected def withNewChildInternal(newChild: Expression): KafkaPartition =
    copy(child = newChild)
  override def prettyName: String = "kafka_partition"
}

/** First 60 bits of md5 as a non-negative long — the fused form of
  * `conv(substring(md5(x),1,15),16,10)`, the portable base hash used by
  * the MinHash/SimHash operators (DuckDB oracle side:
  * `('0x' || substring(md5(x),1,15))::BIGINT`). A native expression
  * because the hex-string round-trip (`md5` → hex → `conv`) dominated
  * the dedup profile; this computes the digest once and assembles the
  * long directly from the bytes.
  */
case class Md5Long(child: Expression) extends UnaryExpression with RequiresInputType {
  override def requiredType: DataType = BinaryType
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
  override def prettyName: String = "md5_long"
}

object Md5Long {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** Value of the first 15 hex chars of md5(data): 7 full bytes plus the
    * high nibble of byte 7.
    */
  def hash(data: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(data)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) >> 4) & 0xfL)
  }
}

/** Distinct k-word shingles of a token array, preserving first-seen
  * order of the underlying sliding window then de-duplicated — the
  * native form of
  * `array_distinct(transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks, i, k))))`,
  * which runs as interpreted higher-order functions and dominated the
  * dedup profile. Returns an empty array for docs shorter than k
  * tokens. Output equals the HOF form element-for-element (verified by
  * the unchanged DuckDB oracles).
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with RequiresInputType
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def requiredType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](n)
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i <= n - k) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** MurmurHash2 (public algorithm by Austin Appleby), 32-bit, with the
  * seed Kafka's default partitioner uses, so partition routing matches a
  * Kafka Streams deployment byte-for-byte.
  */
object Murmur2 {
  def hash(data: Array[Byte]): Int = {
    val length = data.length
    val m = 0x5bd1e995
    val r = 24
    var h = 0x9747b28c ^ length
    val n4 = length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val tail = length & ~3
    // fallthrough tail mix (3 → 2 → 1)
    if ((length % 4) >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if ((length % 4) >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if ((length % 4) >= 1) { h ^= data(tail) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  def partition(key: Array[Byte], numPartitions: Int): Int =
    (hash(key) & 0x7fffffff) % numPartitions
}
