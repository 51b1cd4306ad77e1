package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the q141 perceptual-hash kernels (pure JVM, no session) and
  * the banding operator's recall on constructed near-duplicates.
  */
class DHashKernelSpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("generated P6 corpus decodes via the real kernel at the declared dims") {
    for (id <- Seq(0L, 1L, 4L, 1001L)) {
      val img = MediaCodecs.decodePpm(Multimodal.syntheticPpmBytes(id))
      assert(img.isDefined)
      assert(img.get.width == 36 && img.get.height == 32)
    }
  }

  test("dHash of a constant image is 0 (no block outranks its equal neighbor)") {
    val flat = MediaCodecs.PpmImage(36, 32, Array.fill(36 * 32 * 3)(100.toByte))
    assert(MediaCodecs.dHash64(flat) == 0L)
  }

  test("within-group perturbations stay near; cross-group images are far") {
    def h(id: Long): Long =
      MediaCodecs.dHash64(MediaCodecs.decodePpm(Multimodal.syntheticPpmBytes(id)).get)
    // variants of one base differ in few bits — near-duplicate structure
    val withins = (0 until 20).map(g => hamming(h(4L * g), h(4L * g + 1)))
    assert(withins.forall(_ <= 8), s"within-group distances blew up: $withins")
    // different groups' clean bases are unrelated — far in Hamming space
    val crosses = (0 until 20).map(g => hamming(h(4L * g), h(4L * (g + 20))))
    assert(crosses.count(_ > 6) >= 18, s"cross-group distances collapsed: $crosses")
  }

  test("generated WAV corpus decodes via the real kernel: mono 8kHz, 1625 samples") {
    for (id <- Seq(0L, 1L, 5L, 1001L)) {
      val a = MediaCodecs.decodeWavPcm16(Multimodal.syntheticWavBytes(id))
      assert(a.isDefined)
      assert(a.get.sampleRate == 8000 && a.get.channels == 1 && a.get.samples.length == 1625)
    }
  }

  test("audio fingerprint: silence is 0; dropout variants stay near; groups are far") {
    assert(MediaCodecs.audioFingerprint64(
      MediaCodecs.WavAudio(8000, 1, new Array[Short](1625))) == 0L)
    def h(id: Long): Long = MediaCodecs.audioFingerprint64(
      MediaCodecs.decodeWavPcm16(Multimodal.syntheticWavBytes(id)).get)
    val withins = (0 until 20).map(g => hamming(h(4L * g), h(4L * g + 2)))
    assert(withins.forall(_ <= 8), s"within-group distances blew up: $withins")
    val crosses = (0 until 20).map(g => hamming(h(4L * g), h(4L * (g + 20))))
    assert(crosses.count(_ > 6) >= 18, s"cross-group distances collapsed: $crosses")
  }

  test("single-pixel edit moves the hash by at most a few bits") {
    val bytes = Multimodal.syntheticPpmBytes(8L)
    val img = MediaCodecs.decodePpm(bytes).get
    val edited = img.rgb.clone()
    edited(3 * (5 * 36 + 7)) = (~edited(3 * (5 * 36 + 7))).toByte // flip one R sample
    val d = hamming(MediaCodecs.dHash64(img),
      MediaCodecs.dHash64(MediaCodecs.PpmImage(36, 32, edited)))
    // one pixel touches one block sum → at most its two adjacent comparisons
    assert(d <= 2, s"one-pixel edit flipped $d bits")
  }
}

/** The banding operators end-to-end on the sf0.001 fixture. */
class PerceptualHashSpec extends SparkSpec {

  test("audio banding finds near-dup pairs within the Hamming cap") {
    val pairs = Multimodal.audioNearDupPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 6))
    // near-dup structure: most found pairs are within-group variants
    assert(pairs.count(p => p._1 / 4 == p._2 / 4) * 2 > pairs.length)
  }

  test("video segment dedup: share counts follow the both-clean-or-both-inverted rule") {
    val pairs = Multimodal.videoSegmentDupPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.nonEmpty)
    // within a group, variants ra/rb share frame idx exactly when
    // (idx+g) mod 11 falls outside [min(ra,rb), max(ra,rb))
    for (g <- 0L until 10L; ra <- 0 to 3; rb <- (ra + 1) to 3) {
      val expected = (0 until 8).count { idx =>
        val m = (idx + g) % 11
        m < math.min(ra, rb) || m >= math.max(ra, rb)
      }
      val got = pairs.getOrElse((4 * g + ra, 4 * g + rb), 0L)
      if (expected >= 2) assert(got == expected, s"g=$g ra=$ra rb=$rb")
      else assert(got == 0L, s"g=$g ra=$ra rb=$rb under-threshold pair reported")
    }
  }

  test("banding finds near-dup pairs, never reports beyond the Hamming cap") {
    val pairs = Multimodal.imageNearDupPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 6))
    // the pigeonhole guarantee: every pair differing in < 4 bits shares
    // a clean 16-bit band, so ALL such within-group pairs must be found
    def h(id: Long): Long =
      MediaCodecs.dHash64(MediaCodecs.decodePpm(Multimodal.syntheticPpmBytes(id)).get)
    val found = pairs.map(p => (p._1, p._2)).toSet
    val docIds = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val byGroup = docIds.groupBy(_ / 4)
    val guaranteed = for {
      (_, ids) <- byGroup.toSeq; a <- ids.toSeq; b <- ids.toSeq if a < b
      if java.lang.Long.bitCount(h(a) ^ h(b)) < 4
    } yield (a, b)
    assert(guaranteed.nonEmpty)
    assert(guaranteed.forall(found.contains),
      s"missed guaranteed pairs: ${guaranteed.filterNot(found.contains).take(5)}")
  }

  test("q171: sized P6 corpus decodes at the formula geometry, raster length validated") {
    for (id <- Seq(0L, 1L, 17L, 1001L)) {
      val img = MediaCodecs.decodePpm(Multimodal.syntheticSizedPpm(id))
      assert(img.isDefined)
      assert(img.get.width == 16 + (id * 7 % 33).toInt &&
        img.get.height == 16 + (id * 13 % 29).toInt)
      assert(img.get.rgb.length == 3 * img.get.width * img.get.height)
    }
  }

  test("q173: scene-cut recall — an inverted frame flips every gradient, a clean pair stays") {
    // frames of one video differ only via whole-frame inversion (the
    // variant rule); inversion reverses every block comparison, so a
    // cut's Hamming step is large while same-state neighbors share
    // their base pattern's CHANGE structure across gg only partially —
    // the pinned property is the inversion side: invert vs clean of
    // the SAME gg differs in every decided bit
    val gg = 40L
    def h(invert: Boolean): Long =
      MediaCodecs.dHash64(MediaCodecs.decodePpm(
        Multimodal.syntheticFramePpm(gg, invert)).get)
    val clean = h(false); val inv = h(true)
    assert(java.lang.Long.bitCount(clean ^ inv) >= 48,
      s"inversion should flip (nearly) all decided bits: ${java.lang.Long.bitCount(clean ^ inv)}")
  }
}
