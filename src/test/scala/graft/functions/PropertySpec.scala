package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests over the pure hash/digest kernels (no SparkSession —
  * these run on raw byte arrays).
  */
object HashProperties extends Properties("graft.hashes") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("blake2b digest has requested length for any input/size") =
    forAll(bytesGen, Gen.choose(1, 64)) { (b, n) =>
      Blake2b.digest(b, n).length == n
    }

  property("blake2b is deterministic") =
    forAll(bytesGen) { b =>
      Blake2b.digest(b, 8).sameElements(Blake2b.digest(b, 8))
    }

  property("blake2b: different digest sizes give unrelated digests") =
    forAll(bytesGen) { b =>
      !Blake2b.digest(b, 8).sameElements(Blake2b.digest(b, 9).take(8))
    }

  property("blake2b: appending a byte changes the digest") =
    forAll(bytesGen, Gen.choose(Byte.MinValue, Byte.MaxValue)) { (b, extra) =>
      !Blake2b.digest(b :+ extra, 16).sameElements(Blake2b.digest(b, 16))
    }

  property("murmur2 partition is always in [0, n)") =
    forAll(bytesGen, Gen.choose(1, 1024)) { (b, n) =>
      val p = Murmur2.partition(b, n)
      p >= 0 && p < n
    }

  property("md5_long is non-negative (60-bit) and matches hex-prefix form") =
    forAll(bytesGen) { b =>
      val v = Md5Long.hash(b)
      val hex = java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString.take(15)
      v >= 0 && v == java.lang.Long.parseLong(hex, 16)
    }
}

/** Property tests for the map-side signature expressions: each is
  * checked against an independent plain-Scala reference implementation
  * of the documented semantics (tf-weighted SimHash; per-permutation
  * MinHash minima).
  */
object SignatureProperties extends Properties("graft.signatures") {

  private val tokGen: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(8)), Gen.numStr.map(_.take(4)), Gen.const(""))
  private val toksGen: Gen[List[String]] = Gen.listOf(tokGen)

  private def md5Mod(s: String): Long =
    Md5Long.hash(s.getBytes("UTF-8")) % MinHashSig.prime

  private def refSimhash(toks: List[String]): Long = {
    // reference form: tf per DISTINCT token, tf*(±1) per bit
    val tf = toks.groupBy(identity).view.mapValues(_.size.toLong)
    val sums = new Array[Long](16)
    for ((tok, n) <- tf; h = md5Mod(tok); j <- 0 until 16)
      sums(j) += (if (((h >> j) & 1L) == 1L) n else -n)
    (0 until 16).map(j => if (sums(j) > 0) 1L << j else 0L).sum
  }

  private def refMinhash(shingles: List[String]): Option[Seq[Long]] =
    if (shingles.isEmpty) None
    else Some(MinHashSig.perms.map { case (a, b) =>
      shingles.map(s => (md5Mod(s) * a + b) % MinHashSig.prime).min
    })

  private def evalExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
      toks: List[String]): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    e.eval(org.apache.spark.sql.catalyst.InternalRow(arr))
  }

  private val child = org.apache.spark.sql.catalyst.expressions.BoundReference(
    0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType),
    nullable = false)

  property("SimHash16 expression == reference tf-weighted formulation") =
    forAll(toksGen) { toks =>
      evalExpr(SimHash16(child), toks) == refSimhash(toks)
    }

  property("MinHashSig expression == per-permutation minima (null on empty)") =
    forAll(toksGen) { toks =>
      val got = evalExpr(MinHashSig(child), toks)
      refMinhash(toks) match {
        case None => got == null
        case Some(ref) =>
          got.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toLongArray.toSeq == ref
      }
    }

  property("SimHash16 is permutation-invariant") =
    forAll(toksGen) { toks =>
      evalExpr(SimHash16(child), toks) == evalExpr(SimHash16(child), toks.reverse)
    }

  property("MinHashSig is duplication- and order-invariant (set semantics)") =
    forAll(toksGen.suchThat(_.nonEmpty)) { toks =>
      val a = evalExpr(MinHashSig(child), toks)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
      val b = evalExpr(MinHashSig(child), toks.reverse ++ toks)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
      a == b
    }
}

/** Property tests for the fused intersection-count expression against
  * plain Scala set semantics.
  */
object IntersectProperties extends Properties("graft.intersect") {

  private val tokGen: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(4)), Gen.const(""), Gen.const("x"))
  private val toksGen: Gen[List[String]] = Gen.listOf(tokGen)

  private def evalIntersect(a: List[String], b: List[String]): Int = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val at = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
    def ref(i: Int) = org.apache.spark.sql.catalyst.expressions.BoundReference(i, at, nullable = false)
    def arr(xs: List[String]) = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    IntersectSize(ref(0), ref(1))
      .eval(org.apache.spark.sql.catalyst.InternalRow(arr(a), arr(b)))
      .asInstanceOf[Int]
  }

  property("IntersectSize == set-intersection cardinality") =
    forAll(toksGen, toksGen) { (a, b) =>
      evalIntersect(a, b) == a.toSet.intersect(b.toSet).size
    }

  property("IntersectSize is symmetric and bounded by min distinct size") =
    forAll(toksGen, toksGen) { (a, b) =>
      val ab = evalIntersect(a, b)
      ab == evalIntersect(b, a) && ab <= math.min(a.toSet.size, b.toSet.size)
    }

  property("IntersectSize ignores null elements (documented divergence from array_intersect)") =
    forAll(toksGen, toksGen) { (a, b) =>
      // null ⊎ a vs null ⊎ b: the shared nulls never count
      evalIntersectRaw(null :: a.map(x => x: Any), null :: b.map(x => x: Any)) ==
        a.toSet.intersect(b.toSet).size
    }

  private def evalIntersectRaw(a: List[Any], b: List[Any]): Int = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val at = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)
    def ref(i: Int) = org.apache.spark.sql.catalyst.expressions.BoundReference(i, at, nullable = false)
    def arr(xs: List[Any]) = new GenericArrayData(xs.map {
      case null => null
      case s: String => UTF8String.fromString(s)
    }.toArray[Any])
    IntersectSize(ref(0), ref(1))
      .eval(org.apache.spark.sql.catalyst.InternalRow(arr(a), arr(b)))
      .asInstanceOf[Int]
  }
}

/** Property tests for the Shingles expression against an independent
  * plain-Scala reference (sliding windows, space-joined, first-seen
  * distinct).
  */
object ShingleProperties extends Properties("graft.shingles") {

  private val tokGen: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(5)), Gen.const(""), Gen.const("a"))
  private val toksGen: Gen[List[String]] = Gen.listOf(tokGen)

  private def refShingles(toks: List[String], k: Int): Seq[String] =
    if (toks.length < k) Seq.empty
    else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct

  private def evalShingles(toks: List[String], k: Int): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val child = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType),
      nullable = false)
    val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    Shingles(child, k).eval(org.apache.spark.sql.catalyst.InternalRow(arr))
      .asInstanceOf[ArrayData].toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
  }

  property("Shingles == sliding-window reference for k in 1..4") =
    forAll(toksGen, Gen.choose(1, 4)) { (toks, k) =>
      evalShingles(toks, k) == refShingles(toks, k)
    }

  property("Shingles output is duplicate-free and order-stable") =
    forAll(toksGen) { toks =>
      val out = evalShingles(toks ++ toks, 3)
      out == out.distinct
    }
}

/** The q101 k-minima merge kernel, independent of any streaming query:
  * incremental capped-TreeSet folding must equal the spec
  * `(prev ++ arrivals).distinct.sorted.take(k)` for every split of the
  * input into batches — the property that makes the streamed sketch
  * equal the batch one regardless of batching.
  */
object KmvMergeProps extends Properties("KmvMerge") {
  private val hashes = Gen.listOf(Gen.choose(0L, 1L << 24))
  private val kGen = Gen.choose(1, 16)

  property("merge == sorted-distinct-take-k from empty") =
    forAll(hashes, kGen) { (xs, k) =>
      graft.operators.Sketches.kmvMerge(Array.empty, xs.iterator, k).toSeq ==
        xs.distinct.sorted.take(k)
    }

  property("batched merge == one-shot merge for every split point") =
    forAll(hashes, kGen) { (xs, k) =>
      val oneShot = graft.operators.Sketches.kmvMerge(Array.empty, xs.iterator, k).toSeq
      (0 to xs.length).forall { split =>
        val (a, b) = xs.splitAt(split)
        val first = graft.operators.Sketches.kmvMerge(Array.empty, a.iterator, k)
        graft.operators.Sketches.kmvMerge(first, b.iterator, k).toSeq == oneShot
      }
    }
}

/** The Avro serde expressions, session-free: encode → decode must be
  * the identity on every value of the schema's domain — including
  * nulls, empty/unicode strings, NaN/±Inf doubles, and extreme
  * integrals — because q103's oracle equality (and any external Avro
  * consumer) rests on exactly that. Evaluated at the Catalyst level
  * (Literal → AvroEncode → AvroDecode), the same interpreted path the
  * codegen stubs call.
  */
object AvroSerdeProperties extends Properties("graft.avroserde") {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.CatalystTypeConverters

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("n", IntegerType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))
  private val avroJson = graft.streaming.KafkaWiring.avroSchemaFor(schema)

  // valid-UTF8 strings only: BMP minus surrogates, plus supplementary
  // code points built as proper pairs (a lone surrogate is not a
  // string, and no wire format is required to round-trip one)
  private val strGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.choose(0x20, 0xD7FF).map(_.toChar.toString),
    1 -> Gen.choose(0x10000, 0x10FFFF).map(cp => new String(Character.toChars(cp))),
    1 -> Gen.const("\n"))).map(_.mkString)
  private val dblGen: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-1e18, 1e18),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, Double.MinPositiveValue))
  private val rowGen: Gen[Row] = for {
    id <- Gen.choose(Long.MinValue, Long.MaxValue)
    name <- Gen.option(strGen)
    score <- Gen.option(dblGen)
    n <- Gen.option(Gen.choose(Int.MinValue, Int.MaxValue))
    flag <- Gen.option(Gen.oneOf(true, false))
  } yield Row(id, name.orNull, score.orNull, n.orNull, flag.orNull)

  private def bitsEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) => // NaN == NaN here; -0.0 != 0.0
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case _ => a == b
  }

  property("encode → decode is the identity over the schema's domain") =
    forAll(rowGen) { row =>
      val enc = AvroEncode(Literal.create(row, schema), avroJson)
      val bytes = enc.eval(null).asInstanceOf[Array[Byte]]
      val dec = AvroDecode(Literal(bytes, BinaryType), avroJson)
      val back = CatalystTypeConverters.createToScalaConverter(dec.dataType)
        .apply(dec.eval(null)).asInstanceOf[Row]
      (0 until schema.length).forall(i => bitsEq(back.get(i), row.get(i)))
    }

  property("encoding is deterministic (bitwise-stable wire bytes)") =
    forAll(rowGen) { row =>
      val a = AvroEncode(Literal.create(row, schema), avroJson).eval(null)
      val b = AvroEncode(Literal.create(row, schema), avroJson).eval(null)
      java.util.Arrays.equals(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    }
}
