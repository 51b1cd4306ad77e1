package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Blake2bSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("RFC 7693 appendix A vector: blake2b-512(\"abc\")") {
    assert(hex(Blake2b.digest("abc".getBytes("UTF-8"), 64)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("blake2b-512 of empty input (known public vector)") {
    assert(hex(Blake2b.digest(Array.emptyByteArray, 64)) ==
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
      "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
  }

  test("multi-block input (>128 bytes) and truncated sizes") {
    val big = Array.fill[Byte](1000)(7)
    assert(Blake2b.digest(big, 64).length == 64)
    assert(Blake2b.digest(big, 8).length == 8)
    // truncated output is a DIFFERENT hash (digest length is a param),
    // not a prefix of the 64-byte digest
    assert(hex(Blake2b.digest(big, 8)) != hex(Blake2b.digest(big, 64)).take(16))
    // exactly one block and one-byte-over boundaries
    assert(Blake2b.digest(Array.fill[Byte](128)(1), 8).length == 8)
    assert(Blake2b.digest(Array.fill[Byte](129)(1), 8).length == 8)
  }

  test("expression is usable from Column API and SQL") {
    import spark.implicits._
    val df = Seq("32545513", "32546427").toDF("id")
    val viaCol = df.select(blake2b($"id", 8).as("d")).as[Array[Byte]].collect()
    assert(viaCol.forall(_.length == 8))
    assert(!viaCol(0).sameElements(viaCol(1)))
    df.createOrReplaceTempView("ids")
    val viaSql = spark.sql("SELECT graft_blake2b(CAST(id AS BINARY), 8) FROM ids")
      .as[Array[Byte]].collect()
    assert(viaSql.map(_.toSeq).toSet == viaCol.map(_.toSeq).toSet)
    assert(viaCol(0).sameElements(Blake2b.digest("32545513".getBytes, 8)))
  }
}

class JoinKeySpec extends SparkSpec {
  import spark.implicits._

  test("join_key layout: [size][fk digest][pk digest]; right key zero-padded") {
    val df = Seq(("c1", "s1")).toDF("pk", "fk")
    val Array(leftKey) = df.select(join_key($"fk", $"pk", 8)).as[Array[Byte]].collect()
    val Array(rightKey) = df.select(join_key_right($"fk", 8)).as[Array[Byte]].collect()
    assert(leftKey.length == 17 && rightKey.length == 17)
    assert(leftKey(0) == 8.toByte && rightKey(0) == 8.toByte)
    // both sides share the FK prefix (the property the reference's
    // prefix-scan relies on, JoinKey.java:94-99)
    assert(leftKey.slice(0, 9).sameElements(rightKey.slice(0, 9)))
    assert(rightKey.slice(9, 17).forall(_ == 0))
    assert(!leftKey.slice(9, 17).forall(_ == 0))
  }

  test("partition routing hashes the raw FK digest, matching the reference partitioner") {
    val df = Seq(("c1", "s1")).toDF("pk", "fk")
    val (part, digest) = df.select(
        kafka_partition(join_key_fk_digest(join_key($"fk", $"pk", 8), 8), 4),
        join_key_fk_digest(join_key($"fk", $"pk", 8), 8))
      .as[(Int, Array[Byte])].collect().head
    // reference: Utils.toPositive(Utils.murmur2(rightKeyDigest)) % n
    assert(part == (Murmur2.hash(digest) & 0x7fffffff) % 4)
    assert(digest.sameElements(Blake2b.digest("s1".getBytes, 8)))
  }

  test("join_key_prefix and join_key_is_right") {
    val df = Seq(("c1", "s1")).toDF("pk", "fk")
    val out = df.select(
      join_key_prefix(join_key($"fk", $"pk", 8), 8).as("lp"),
      join_key_prefix(join_key_right($"fk", 8), 8).as("rp"),
      join_key_is_right(join_key($"fk", $"pk", 8), 8).as("lisr"),
      join_key_is_right(join_key_right($"fk", 8), 8).as("risr"))
      .as[(Array[Byte], Array[Byte], Boolean, Boolean)].collect().head
    assert(out._1.sameElements(out._2))
    assert(!out._3 && out._4)
  }
}

class Murmur2Spec extends SparkSpec {

  test("murmur2 matches Kafka's published values") {
    // test vectors from Apache Kafka's public Utils.murmur2 test suite
    assert(Murmur2.hash("21".getBytes) == -973932308)
    assert(Murmur2.hash("foobar".getBytes) == -790332482)
    assert(Murmur2.hash("a-little-bit-long-string".getBytes) == -985981536)
    assert(Murmur2.hash("a-little-bit-longer-string".getBytes) == -1486304829)
    assert(Murmur2.hash("lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8".getBytes) == -58897971)
    assert(Murmur2.hash(Array[Byte]('a', 'b', 'c')) == 479470107)
  }

  test("partition is non-negative and stable") {
    import spark.implicits._
    val parts = Seq("k1", "k2", "k3").toDF("k")
      .select(kafka_partition($"k", 4)).as[Int].collect()
    assert(parts.forall(p => p >= 0 && p < 4))
    assert(parts.sameElements(parts)) // deterministic across evals
    assert(Murmur2.partition("21".getBytes, 4) == (-973932308 & 0x7fffffff) % 4)
  }
}

class NullElementSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("signature expressions tolerate null array elements") {
    val df = Seq(1).toDF("x").select(
      graft.functions.simhash16(
        array(lit("a"), lit(null).cast("string"), lit("b"))).as("sh"),
      graft.functions.minhash_sig(
        array(lit(null).cast("string"))).as("mh_allnull"),
      graft.functions.minhash_sig(
        array(lit("a"), lit(null).cast("string"))).as("mh_mixed"))
    val row = df.head()
    // null tokens contribute nothing: same as the null-free arrays
    val clean = Seq(1).toDF("x").select(
      graft.functions.simhash16(array(lit("a"), lit("b"))).as("sh"),
      graft.functions.minhash_sig(array(lit("a"))).as("mh")).head()
    assert(row.getLong(0) == clean.getLong(0))
    assert(row.isNullAt(1)) // all-null ≡ empty → no signature
    assert(row.getSeq[Long](2) == clean.getSeq[Long](1))
  }
}

class CosineNullElementSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("a null element on either side yields NULL, never a zero-filled score") {
    // the oracle's list arithmetic propagates NULL; reading the slot as
    // 0.0 would produce a structurally-valid but wrong similarity
    val df = spark.range(1).select(
      graft.functions.cosine_sim(
        array(lit(1.0), lit(null).cast("double"), lit(2.0)),
        array(lit(1.0), lit(1.0), lit(1.0))).as("l_null"),
      graft.functions.cosine_sim(
        array(lit(1.0), lit(1.0), lit(1.0)),
        array(lit(1.0), lit(null).cast("double"), lit(2.0))).as("r_null"),
      graft.functions.cosine_sim(
        array(lit(1.0), lit(0.0), lit(2.0)),
        array(lit(1.0), lit(1.0), lit(1.0))).as("clean"))
    val row = df.head()
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    assert(!row.isNullAt(2) && !row.getDouble(2).isNaN)
  }
}

class KnownNonNullElementsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.ArrayType

  test("narrows containsNull only: values identical, outer nullability kept, filters still push") {
    val df = spark.range(3).select(
      array(col("id").cast("double"), lit(1.0)).as("v"),
      when(col("id") % 2 === 0, array(col("id").cast("double"))).as("maybe"))
    val narrowed = df.select(
      graft.functions.known_non_null_elements(col("v")).as("v"),
      graft.functions.known_non_null_elements(col("maybe")).as("maybe"))
    // schema: element containsNull flips to false, column nullability
    // is the child's (v non-null, maybe nullable)
    val vT = narrowed.schema("v").dataType.asInstanceOf[ArrayType]
    assert(!vT.containsNull)
    assert(narrowed.schema("maybe").dataType.asInstanceOf[ArrayType].containsNull == false)
    assert(narrowed.schema("maybe").nullable)
    // identity on values; a null ARRAY still passes through as null
    val rows = narrowed.collect()
    assert(rows.map(_.getSeq[Double](0)).toSeq ==
      Seq(Seq(0.0, 1.0), Seq(1.0, 1.0), Seq(2.0, 1.0)))
    assert(rows(1).isNullAt(1) && !rows(0).isNullAt(1))
    // cosine over the narrowed (branch-free) loop equals the checking
    // loop on the same clean data — the gate must not change results
    val a = df.select(graft.functions.cosine_sim(col("v"), col("v")).as("c")).collect()
    val b = narrowed.select(graft.functions.cosine_sim(col("v"), col("v")).as("c")).collect()
    assert(a.map(_.getDouble(0)).toSeq == b.map(_.getDouble(0)).toSeq)
    // nullIntolerant: an IsNotNull over the wrapper must reach the scan
    // side as IsNotNull(child) — checked at the analyzed-plan level via
    // the inferred constraint (the PlanSpec q26 test pins the scan)
    assert(graft.functions.KnownNonNullElements(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0), ArrayType(org.apache.spark.sql.types.DoubleType))).nullIntolerant)
  }

  test("SQL registration: graft_known_non_null_elements callable, rejects non-arrays") {
    val got = spark.range(1)
      .selectExpr("graft_known_non_null_elements(array(1.0d, 2.0d)) AS v")
    assert(!got.schema("v").dataType.asInstanceOf[ArrayType].containsNull)
    assert(got.head().getSeq[Double](0) == Seq(1.0, 2.0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("graft_known_non_null_elements(1)").collect()
    }
  }
}

class ArityCheckSpec extends graft.SparkSpec {
  test("wrong SQL arity is an AnalysisException, not an index error") {
    for (bad <- Seq(
        "SELECT graft_intersect_size(array('a'))",
        "SELECT graft_cosine_sim(array(1.0d))",
        "SELECT graft_md5_long()",
        "SELECT graft_kafka_partition(cast('x' as binary))")) {
      val e = intercept[Exception](spark.sql(bad).collect())
      assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException],
        s"$bad threw ${e.getClass}: ${e.getMessage}")
      assert(e.getMessage.contains("parameters"), e.getMessage)
    }
  }
}

class HyperplaneSigsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("native signatures equal the Column-arithmetic formulation") {
    val (bits, tables, dim) = (4, 3, 64)
    val planes = HyperplaneSigs.planes(bits, tables, dim)
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sigCols = (0 until tables).map { t =>
      (0 until bits).map { j =>
        val dot = (0 until dim).map(d => col("v").getItem(d) * lit(planes(t)(j)(d)))
          .reduce(_ + _)
        when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"sig$t")
    }
    val viaCols = e.select(col("vec_id") +: sigCols: _*).collect()
      .map(r => r.getLong(0) -> (1 to tables).map(r.getLong).toSeq).toMap
    val viaNative = e.select(col("vec_id"),
        graft.functions.hyperplane_sigs(col("v"), bits, tables, dim).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaNative.keySet == viaCols.keySet)
    assert(viaNative.forall { case (k, v) => viaCols(k) == v })
  }

  test("short, long, and null-element vectors yield null signatures") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      graft.functions.hyperplane_sigs(
        array(lit(1.0), lit(2.0)), 4, 2, 64).as("short"),
      graft.functions.hyperplane_sigs(
        array((0 until 128).map(i => lit(i.toDouble)): _*), 4, 2, 64).as("long"),
      graft.functions.hyperplane_sigs(
        array((0 until 64).map(_ => lit(null).cast("double")): _*), 4, 2, 64).as("nulls"))
    val row = df.head()
    assert(row.isNullAt(0))
    assert(row.isNullAt(1), "a longer-than-dim vector must yield null, not a truncated signature")
    assert(row.isNullAt(2))
  }
}

class PqEncodeSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // deterministic pseudo-random fixture (no live RNG: same rows every run)
  private val dim = 16
  private val mSub = 4
  private val sd = dim / mSub
  private def vec(seed: Int): Seq[Double] =
    (0 until dim).map(i => math.sin(seed * 31 + i * 7).toDouble)
  private val cents: Seq[Seq[Double]] = (1 to 3).map(s => vec(100 + s))
  private val cbs: Seq[Seq[Seq[Double]]] =
    (0 until mSub).map(mi => (0 until 4).map(c =>
      vec(200 + mi * 10 + c).slice(mi * sd, (mi + 1) * sd)))

  private def refEncode(v: Seq[Double], residual: Boolean): Seq[Int] = {
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val b = cents.indices.minBy(c =>
      dot(v, cents(c)) / math.sqrt(dot(v, v)) / math.sqrt(dot(cents(c), cents(c))) * -1.0)
    val base = if (residual) v.zip(cents(b)).map { case (x, y) => x - y } else v
    b +: (0 until mSub).map { mi =>
      val sub = base.slice(mi * sd, (mi + 1) * sd)
      cbs(mi).indices.minBy(c =>
        sub.zip(cbs(mi)(c)).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
  }

  test("native encode equals plain-Scala argmins, raw and residual") {
    val rows = (1 to 40).map(s => (s.toLong, vec(s)))
    val df = rows.toDF("id", "v")
    for (residual <- Seq(false, true)) {
      val got = df.select(col("id"),
          graft.functions.pq_encode(col("v"), cents, cbs, residual).as("enc"))
        .as[(Long, Seq[Int])].collect().toMap
      for ((id, v) <- rows)
        assert(got(id) == refEncode(v, residual), s"id $id residual=$residual")
    }
  }

  test("codes-only mode (no centroids) drops the bucket element") {
    val df = Seq((1L, vec(7))).toDF("id", "v")
    val enc = df.select(graft.functions.pq_encode(col("v"), Seq.empty, cbs).as("e"))
      .as[Seq[Int]].head()
    assert(enc.length == mSub)
    assert(enc == refEncode(vec(7), residual = false).tail)
  }

  test("null contract: wrong-dimension vectors and null elements encode to null") {
    val df = Seq(1).toDF("x").select(
      graft.functions.pq_encode(array(lit(1.0), lit(2.0)), cents, cbs).as("short"),
      // longer than dim must be null too, NOT a garbage prefix-encode
      graft.functions.pq_encode(
        array((0 to dim).map(i => lit(i.toDouble)): _*), cents, cbs).as("long"),
      graft.functions.pq_encode(
        array((0 until dim).map(_ => lit(null).cast("double")): _*), cents, cbs).as("nulls"))
    val row = df.head()
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    assert(row.isNullAt(2))
  }

  test("mistyped or null constant tables are argument errors, not NPEs") {
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_pq_encode(array(1.0), NULL, NULL)").collect()
    }
    assert(ex.getMessage.contains("non-null array literal"), ex.getMessage)
  }

  test("NULL sub-arrays inside constant tables are argument errors, not NPEs") {
    // null element at the outer level of a 2-deep table (cents)...
    val ex2 = intercept[Exception] {
      spark.sql("""SELECT graft_pq_encode(array(1.0d, 2.0d),
        array(array(1.0d, 2.0d), NULL),
        array(array(array(1.0d), array(2.0d)), array(array(3.0d), array(4.0d))))""").collect()
    }
    assert(ex2.getMessage.contains("NULL elements"), ex2.getMessage)
    // ...and at the middle level of a 3-deep table (codebooks)
    val ex3 = intercept[Exception] {
      spark.sql("""SELECT graft_pq_encode(array(1.0d, 2.0d),
        array(array(1.0d, 2.0d)),
        array(array(array(1.0d), NULL), array(array(3.0d), array(4.0d))))""").collect()
    }
    assert(ex3.getMessage.contains("NULL elements"), ex3.getMessage)
  }
}

class RefCodegenSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("native expressions compile under codegen (no silent fallback) and match eval") {
    // fallback=false turns janino/codegen template errors into thrown
    // exceptions instead of a silent interpreted fallback — without it a
    // broken doGenCode would pass every correctness test at 1/3 speed
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .limit(50)
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .select(col("doc_id"),
          graft.functions.shingles(col("toks"), 3).as("sh"),
          graft.functions.simhash16(col("toks")).as("sim"),
          graft.functions.minhash_sig(col("toks")).as("mh"),
          graft.functions.winnow_keys(col("toks"), 3, 4).as("wk"))
      val rows = df.collect()
      assert(rows.length == 50)
      // and the embedding-side expressions
      val cents = Seq(Seq.fill(64)(0.1), Seq.fill(64)(-0.1))
      val cbs = (0 until 8).map(_ => (0 until 4).map(c => Seq.fill(8)(c * 0.25))).toSeq
      val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(20)
        .select(graft.functions.hyperplane_sigs(
          col("embedding").cast("array<double>"), 4, 2, 64).as("hs"),
          graft.functions.pq_encode(
            col("embedding").cast("array<double>"), cents, cbs, residual = true).as("pq"))
      assert(e.collect().length == 20)
      val is = spark.sql(
        "SELECT graft_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      assert(is.head().getInt(0) == 2)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}

class CovPairsSpec extends SparkSpec {
  import spark.implicits._

  test("cov_pairs layout: row-major upper-triangle products then the " +
      "linear tail, hand-checked") {
    val got = Seq(Tuple1(Array(2L, 3L, 5L)))
      .toDF("xq").select(graft.functions.cov_pairs(col("xq")))
      .as[Array[Long]].head()
    // pairs (0,0)(0,1)(0,2)(1,1)(1,2)(2,2) then x itself
    assert(got.toSeq == Seq(4L, 6L, 10L, 9L, 15L, 25L, 2L, 3L, 5L))
  }

  test("cov_pairs sizes: n(n+1)/2 + n for any n; empty in, empty out") {
    val sizes = Seq(Tuple1(Array.empty[Long]), Tuple1(Array(7L)),
        Tuple1(Array.tabulate(64L.toInt)(_.toLong)))
      .toDF("xq").select(graft.functions.cov_pairs(col("xq")))
      .as[Array[Long]].collect().map(_.length).toSeq
    assert(sizes == Seq(0, 2, 64 * 65 / 2 + 64))
  }
}
