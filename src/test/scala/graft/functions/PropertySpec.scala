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
