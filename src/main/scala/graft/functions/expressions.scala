package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

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
    extends UnaryExpression {
  require(size >= 1 && size <= 64, s"blake2b digest size must be 1..64, got $size")
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
    extends UnaryExpression {
  require(numPartitions > 0)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Murmur2.partition(input.asInstanceOf[Array[Byte]], numPartitions)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Murmur2.partition($c, $numPartitions)")
  override protected def withNewChildInternal(newChild: Expression): KafkaPartition =
    copy(child = newChild)
  override def prettyName: String = "kafka_partition"
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
