package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType}

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

/** Codegen bridge for the eval-heavy unary array expressions: emit one
  * call back into the eval kernel through an embedded reference, so the
  * enclosing Project/Generate/Join stage STAYS inside whole-stage
  * codegen instead of degrading the whole stage to interpreted row
  * processing (what a CodegenFallback mixin does). The per-row work of
  * these kernels (hashing every token, sliding windows, plane dots)
  * dwarfs the single virtual call. Public on purpose: janino-generated
  * code must be able to call [[evalKernel]] through the interface.
  */
trait RefCodegen { self: UnaryExpression =>
  /** Public face of the protected nullSafeEval for generated code. */
  def evalKernel(input: Any): Any = nullSafeEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[RefCodegen].getName)
    defineNullSafe(ctx, ev, ref)
  }
  private def defineNullSafe(ctx: CodegenContext, ev: ExprCode, ref: String): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      val r = ctx.freshName("graftR")
      val assign = dataType match {
        // janino has no auto-unboxing on assignment — unbox explicitly
        case org.apache.spark.sql.types.LongType =>
          s"${ev.value} = ((java.lang.Long) $r).longValue();"
        case org.apache.spark.sql.types.IntegerType =>
          s"${ev.value} = ((java.lang.Integer) $r).intValue();"
        case _ =>
          s"${ev.value} = (${CodeGenerator.javaType(dataType)}) $r;"
      }
      if (nullable)
        s"""
          Object $r = $ref.evalKernel($c);
          if ($r == null) { ${ev.isNull} = true; } else { $assign }"""
      else
        s"""
          Object $r = $ref.evalKernel($c);
          $assign"""
    })
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
    extends UnaryExpression with RequiresInputType with RefCodegen {
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

/** 16-bit SimHash of a token array, tf-weighted — the fused, map-side
  * form of the explode → tf-groupBy → 16-bit-sum aggregation: since each
  * occurrence of a token contributes its own ±1 to every bit-sum,
  * summing ±1 per ELEMENT equals summing tf·(±1) per DISTINCT token, so
  * no tf map (and no shuffle) is needed at all. Per-token base hash is
  * [[Md5Long]] mod 2^31-1, identical to the DuckDB oracle's
  * `('0x'||substring(md5(tok),1,15))::BIGINT % p`. Turns SimHash into a
  * pure per-row map — the shape that scales: zero shuffles, and the
  * integer bit-sums are order-independent by construction.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with RequiresInputType with RefCodegen {
  override def requiredType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](16)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null) { // null tokens contribute nothing (split() never
        // yields them, but arbitrary user arrays may)
        val h = Md5Long.hash(u.getBytes) % MinHashSig.prime
        var j = 0
        while (j < 16) {
          if (((h >> j) & 1L) == 1L) sums(j) += 1L else sums(j) -= 1L
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) { if (sums(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
  override def prettyName: String = "simhash16"
}

/** Full MinHash signature of a shingle array in one pass — the map-side
  * form of explode → groupBy(doc) → 16 min() columns. For each shingle,
  * h = [[Md5Long]] mod p, slot i takes min((h·aᵢ + bᵢ) mod p); the perm
  * constants live in [[MinHashSig.perms]] and are shared with the
  * generated DuckDB oracle. NULL for an empty array (a doc with no
  * shingles has no signature — same as the groupBy form, where it has no
  * row). Eliminates the signature shuffle entirely: at 100 TB the only
  * shuffle left in MinHash-LSH dedup is the banding join itself.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with RequiresInputType with RefCodegen {
  override def requiredType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val p = MinHashSig.prime
    val as = MinHashSig.permA
    val bs = MinHashSig.permB
    val mins = Array.fill(as.length)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null) { // skip null shingles (see SimHash16)
        any = true
        val h = Md5Long.hash(u.getBytes) % p
        var j = 0
        while (j < as.length) {
          val v = (h * as(j) + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null // all-null array ≡ empty: no signature
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** MinHash field prime 2^31-1 and the 16 fixed (a,b) permutation
    * constants (arbitrary-but-fixed, coprime with p) — the single source
    * of truth shared by the Spark plans AND the generated oracle SQL
    * (see `graft.operators.Dedup`).
    */
  val prime = 2147483647L
  val perms: Seq[(Long, Long)] = Seq(
    (1103515245L % prime, 12345L), (214013L, 2531011L), (69069L, 362437L),
    (1664525L, 1013904223L), (22695477L, 1L), (134775813L, 1L),
    (1103515425L % prime, 336577L), (747796405L, 907633385L),
    (40692L, 3345L), (40014L, 12211L), (48271L, 557L), (16807L, 78125L),
    (65539L, 1234567L), (69621L, 233L), (630360016L, 998244353L),
    (397204094L, 1000000007L))
  private[functions] val permA: Array[Long] = perms.map(_._1).toArray
  private[functions] val permB: Array[Long] = perms.map(_._2).toArray
}

/** Number of common NON-NULL elements of two string arrays (set
  * semantics: duplicates count once). The fused form of
  * `size(array_intersect(a, b))` for null-free arrays — it allocates
  * no intersection array, building one hash set from the smaller side
  * and counting hits in a single pass (the hot inner loop of
  * candidate-pair verification in the similarity joins). Deliberate
  * divergence from `array_intersect` on null ELEMENTS: SQL
  * `array_intersect` treats null as equal to null (one shared null
  * counts), this expression ignores null elements entirely — a null
  * shingle is a non-value, not a joinable token (same rule as
  * [[MinHashSig]]/[[SimHash16]]).
  */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> inputs, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSize.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  // codegen emits a static call: this expression lives inside the
  // PPJoin verify JOIN CONDITION (evaluated once per candidate pair —
  // the hot path at scale), and a CodegenFallback here would knock the
  // whole join stage out of whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectSize.compute($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "intersect_size"
}

object IntersectSize {
  /** Distinct-intersection count of two string arrays (remove-on-hit:
    * each distinct common element counts exactly once even if the
    * larger side holds duplicates). Hashes the SMALLER side.
    */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    var x = a
    var y = b
    if (y.numElements() < x.numElements()) { val t = x; x = y; y = t }
    val nx = x.numElements()
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nx * 2)
    var i = 0
    while (i < nx) {
      val u = x.getUTF8String(i)
      if (u != null) set.add(u)
      i += 1
    }
    var count = 0
    val ny = y.numElements()
    i = 0
    while (i < ny) {
      val u = y.getUTF8String(i)
      if (u != null && set.remove(u)) count += 1
      i += 1
    }
    count
  }
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

/** All `tables` random-hyperplane LSH signatures of one embedding in a
  * single pass: signature t packs `bits` sign bits, bit j = sign of the
  * sequential dot product of the vector with hyperplane (t, j). The
  * seeded Gaussian planes live in [[HyperplaneSigs.planes]] — the single
  * source of truth shared with the generated oracle SQL
  * (`graft.operators.Similarity.embeddingNearDupLshSql` inlines the same
  * constants as literals), exactly the MinHashSig arrangement.
  *
  * Why native: the equivalent Column formulation is tables×bits×dim
  * (thousands) of expression nodes — past whole-stage codegen's method
  * budget it degrades to interpreted eval with per-node boxing (~2 s per
  * pass over a 2k-row fixture, recomputed on every plan that references
  * the signatures). One flat-array loop is microseconds. The dot runs in
  * ascending dimension order — the same IEEE sequence as the Column
  * reduce and the oracle's list_sum.
  *
  * Null contract: a null vector, a null element, or ANY length other
  * than `dim` yields a null signature array (the row drops out of
  * banding — candidate generation over garbage is meaningless). Strict
  * `!= dim`, like PqEncode: hashing a 128-dim vector's first 64
  * components would produce a structurally-valid signature with no
  * signal.
  */
case class HyperplaneSigs(child: Expression, bits: Int, tables: Int, dim: Int)
    extends UnaryExpression with RequiresInputType with RefCodegen {
  require(bits >= 1 && bits <= 63, s"bits must be 1..63, got $bits")
  require(tables >= 1 && dim >= 1, s"tables/dim must be positive, got $tables/$dim")
  override def requiredType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $other")
  }
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  // flat [(t*bits + j)*dim + d] layout of the shared plane constants
  @transient private lazy val flat: Array[Double] = {
    val p = HyperplaneSigs.planes(bits, tables, dim)
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var j = 0
      while (j < bits) {
        System.arraycopy(p(t)(j), 0, out, (t * bits + j) * dim, dim)
        j += 1
      }
      t += 1
    }
    out
  }

  // per-element null checks cost a branch per dimension in the copy
  // loop; when the input schema declares containsNull=false (the
  // embeddings load boundary does, via known_non_null_elements) the
  // branch is provably dead and the plain copy runs instead — shared
  // gate: NullGates.anyNullableElements
  @transient private lazy val elemNullable: Boolean =
    NullGates.anyNullableElements(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var d = 0
    if (elemNullable) {
      while (d < dim) {
        if (arr.isNullAt(d)) return null
        v(d) = arr.getDouble(d)
        d += 1
      }
    } else {
      while (d < dim) { v(d) = arr.getDouble(d); d += 1 }
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += v(k) * flat(base + k); k += 1 }
        if (dot >= 0) sig |= 1L << j
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sigs"
}

object HyperplaneSigs {
  /** Deterministic Gaussian hyperplanes: seeded PRNG → identical
    * constants in the expression and in the generated oracle SQL.
    */
  def planes(bits: Int, tables: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(20260812L)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }
}

/** Product-quantization encode of one embedding in a single native
  * pass: an optional coarse IVF bucket (argmax cosine against `cents`,
  * ties → lower centroid id) followed by one code per subspace (argmin
  * squared L2 against that subspace's codebook, ties → lower code).
  * Output `[bucket?, code0, …, code{M-1}]` as ints (`bucket` present
  * iff `cents` is non-empty). Unlike the seed-derived hyperplanes, the
  * constants here are TRAINED per corpus, so they arrive as foldable
  * array literals through the registry and live in the case class as
  * immutable Seqs (structural equality keeps plan canonicalization
  * honest).
  *
  * Why native: the higher-order-function formulation interprets
  * M·Ks·subDim lambda evals per row with boxing — per-corpus-row cost
  * on exactly the side that scales to 100 TB. This flat-array loop is
  * the same plan shape (pure map, zero shuffles, pinned by PlanSpec)
  * at a fraction of the constant, and every fold runs in ascending
  * dimension order — the same IEEE sequence as the HOF chain it
  * replaces and as the generated oracle's list_sum.
  *
  * Null contract: a null vector, a null element, or a vector whose
  * length differs from the codebooks' dim in EITHER direction → null.
  * Unlike [[HyperplaneSigs]] (whose prefix-projection of longer vectors
  * is a documented signature semantic), a PQ code is only meaningful
  * against codebooks trained at the exact dimension — prefix-encoding a
  * 128-dim vector with 64-dim codebooks would yield silent garbage
  * codes, so the mismatch is rejected, not truncated.
  */
case class PqEncode(child: Expression, cents: Seq[Seq[Double]],
    cbs: Seq[Seq[Seq[Double]]], residual: Boolean = false)
    extends UnaryExpression with RefCodegen {
  require(cbs.nonEmpty && cbs.forall(_.nonEmpty), "codebooks must be non-empty")
  require(!residual || cents.nonEmpty, "residual encoding requires centroids")
  private val mSub = cbs.length
  private val sd = cbs.head.head.length
  private val dim = mSub * sd
  require(cbs.forall(_.forall(_.length == sd)), "ragged codebook subvectors")
  require(cents.forall(_.length == dim), "centroid/codebook dim mismatch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $other")
  }
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  // sqrt of the sequential self-dot, precomputed once: bit-identical to
  // recomputing it per row from the same constants
  @transient private lazy val centNorm: Array[Double] = centArr.map { cv =>
    var t = 0.0; var k = 0
    while (k < cv.length) { t += cv(k) * cv(k); k += 1 }
    math.sqrt(t)
  }
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  // same copy-loop gate as [[HyperplaneSigs]]: schema-dead null branch
  // elided when the input declares containsNull=false (shared gate:
  // NullGates.anyNullableElements)
  @transient private lazy val elemNullable: Boolean =
    NullGates.anyNullableElements(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var d = 0
    if (elemNullable) {
      while (d < dim) {
        if (arr.isNullAt(d)) return null
        v(d) = arr.getDouble(d)
        d += 1
      }
    } else {
      while (d < dim) { v(d) = arr.getDouble(d); d += 1 }
    }
    val hasBucket = centArr.length > 0
    val out = new Array[Int]((if (hasBucket) 1 else 0) + mSub)
    if (hasBucket) {
      val best = PqEncode.assignBucket(v, centArr, centNorm)
      out(0) = best
      if (residual) {
        // true IVFPQ (Jégou et al. §III): quantize the RESIDUAL
        // v − centroid[bucket] — the codebooks were trained on
        // residuals, which concentrate near the origin and quantize
        // far finer than raw vectors at the same code budget.
        // Elementwise subtraction, then the same argmin below.
        val cv = centArr(best)
        var k = 0
        while (k < dim) { v(k) = v(k) - cv(k); k += 1 }
      }
    }
    var mi = 0
    while (mi < mSub) {
      val off = mi * sd
      val book = cbArr(mi)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var dist = 0.0
        var k = 0
        while (k < sd) { val t = v(off + k) - cw(k); dist += t * t; k += 1 }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out((if (hasBucket) 1 else 0) + mi) = best
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** THE coarse-bucket rule — argmax cosine (key = dot/‖v‖/‖c‖ · −1,
    * strict < so exact ties keep the lowest centroid id), shared by the
    * expression kernel and the residual trainer
    * (`Similarity.pqResidualCodebooks`), so training and encoding see
    * the same corpus partition BY CONSTRUCTION, not by parallel
    * maintenance of two loops.
    */
  def assignBucket(v: Array[Double], cents: Array[Array[Double]],
      centNorm: Array[Double]): Int = {
    var nv = 0.0
    var k = 0
    while (k < v.length) { nv += v(k) * v(k); k += 1 }
    val sv = math.sqrt(nv)
    var best = 0
    var bestKey = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dot = 0.0
      k = 0
      while (k < v.length) { dot += v(k) * cv(k); k += 1 }
      val key = dot / sv / centNorm(c) * -1.0
      if (key < bestKey) { bestKey = key; best = c }
      c += 1
    }
    best
  }
}

/** Winnowing (MOSS) fingerprint selection over a token array in one
  * native pass: hash every positional k-gram (concat_ws(" ") parity,
  * 40-bit md5-based hash), pack `h·2^20 + (2^20-1-pos)` (the integer
  * encoding of "min hash, rightmost position on ties"), take the min of
  * every sliding window of `w` keys with a monotonic deque (O(grams)),
  * and return the DISTINCT selected keys. Replaces the
  * posexplode → global window sort → distinct formulation — a 100 TB
  * fingerprint pass becomes a pure map with zero shuffles, the same
  * plan-shape upgrade as SimHash16/MinHashSig. Constants (40-bit hash,
  * 20-bit position field) are shared with the generated oracle SQL via
  * [[WinnowKeys.hBits]]/[[WinnowKeys.posBits]].
  *
  * Returns null when the array has no full window (fewer than k+w-1
  * tokens); the position-field domain bound (> 2^20 grams) stays in the
  * operator, next to its documented rejection semantics.
  */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression with RequiresInputType with RefCodegen {
  require(k >= 1 && w >= 1, s"k/w must be positive, got $k/$w")
  override def requiredType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val nGrams = n - k + 1
    if (nGrams < w) return null // no full window
    val hMod = 1L << WinnowKeys.hBits
    val posMod = 1L << WinnowKeys.posBits
    // past the position field the packed keys would collide across
    // positions and silently mis-order the tie rule — null, not
    // garbage, for SQL callers who bypass the operator's domain filter
    if (nGrams > posMod) return null
    val sep = UTF8String.fromString(" ")
    val keys = new Array[Long](nGrams)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < nGrams) {
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      // concatWs skips null inputs — identical to the concat_ws column
      val g = UTF8String.concatWs(sep, parts: _*)
      val h = Md5Long.hash(g.getBytes) % hMod
      keys(i) = h * posMod + (posMod - 1 - i)
      i += 1
    }
    // monotonic-deque sliding min: each index enters/leaves once
    val sel = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && keys(dq(tail - 1)) >= keys(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) sel.add(keys(dq(head)))
      i += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
  override def prettyName: String = "winnow_keys"
}

object WinnowKeys {
  /** Shared packing constants: 40-bit gram hash, 20-bit position field
    * — single source of truth for the expression, the operator's
    * decode, and the generated oracle SQL.
    */
  val hBits = 40
  val posBits = 20
}

/** Covariance sufficient-statistic kernel (q283/q284): for a quantized
  * vector x of length n, the flat primitive array
  *
  *   [ x₀x₀, x₀x₁, …, x₀xₙ₋₁, x₁x₁, …, xₙ₋₁xₙ₋₁,  x₀, x₁, …, xₙ₋₁ ]
  *
  * — the n(n+1)/2 upper-triangle products in row-major (i, then j ≥ i)
  * order, followed by the n raw values — so ONE posexplode + groupBy
  * over the positions yields every pairwise Σxᵢxⱼ AND every linear Σxᵢ
  * in a single aggregation. This replaces a nested higher-order-
  * function chain building 4-field structs per pair (HOFs are
  * CodegenFallback: interpreted, one GenericInternalRow allocation per
  * pair ≈ 1 ms/row at D=64); here the whole triangle is one tight
  * primitive long[] loop + one UnsafeArrayData (~µs/row), and the
  * expression itself participates in whole-stage codegen via
  * [[RefCodegen]]. Position mapping is fixed by the loop order and
  * mirrored by the bounded driver-built map in Similarity.covAssemble.
  */
case class CovPairs(child: Expression)
    extends UnaryExpression with RequiresInputType with RefCodegen {
  override def requiredType: DataType = ArrayType(LongType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a null ELEMENT nulls the whole result (standard SQL null propagation)
  // rather than crashing toLongArray with an opaque error — SQL callers
  // of graft_cov_pairs can pass containsNull arrays; the result must
  // therefore be nullable even when the child array itself is not
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var e = 0
    while (e < n) { if (arr.isNullAt(e)) return null; e += 1 }
    val xs = arr.toLongArray()
    val out = new Array[Long](n * (n + 1) / 2 + n)
    var p = 0
    var i = 0
    while (i < n) {
      val xi = xs(i)
      var j = i
      while (j < n) { out(p) = xi * xs(j); p += 1; j += 1 }
      i += 1
    }
    System.arraycopy(xs, 0, out, p, n)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(newChild: Expression): CovPairs =
    copy(child = newChild)
  override def prettyName: String = "cov_pairs"
}
