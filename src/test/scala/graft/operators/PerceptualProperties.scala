package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests over the pure perceptual-hash kernels (no
  * SparkSession — raw generators and decoded media).
  */
object PerceptualProperties extends Properties("graft.perceptual") {

  private val idGen: Gen[Long] = Gen.choose(0L, 1000000L)

  property("synthetic PPM always decodes at the declared dims") =
    forAll(idGen) { id =>
      val img = MediaCodecs.decodePpm(Multimodal.syntheticPpmBytes(id))
      img.exists(i => i.width == 36 && i.height == 32)
    }

  property("dHash64 is deterministic and a pure function of the pixels") =
    forAll(idGen) { id =>
      val b = Multimodal.syntheticPpmBytes(id)
      MediaCodecs.dHash64(MediaCodecs.decodePpm(b).get) ==
        MediaCodecs.dHash64(MediaCodecs.decodePpm(b.clone()).get)
    }

  property("dHash64: one-pixel edit flips at most 2 bits (one block, two comparisons)") =
    forAll(idGen, Gen.choose(0, 36 * 32 - 1)) { (id, p) =>
      val img = MediaCodecs.decodePpm(Multimodal.syntheticPpmBytes(id)).get
      val edited = img.rgb.clone()
      edited(3 * p) = (edited(3 * p) ^ 0x7f).toByte
      val d = java.lang.Long.bitCount(MediaCodecs.dHash64(img) ^
        MediaCodecs.dHash64(MediaCodecs.PpmImage(36, 32, edited)))
      d <= 2
    }

  property("synthetic WAV always decodes: mono 8kHz, 1625 samples") =
    forAll(idGen) { id =>
      val a = MediaCodecs.decodeWavPcm16(Multimodal.syntheticWavBytes(id))
      a.exists(w => w.sampleRate == 8000 && w.channels == 1 && w.samples.length == 1625)
    }

  property("audioFingerprint64: scaling every sample by a positive factor preserves the hash") =
    forAll(idGen, Gen.choose(2, 4)) { (id, f) =>
      // energy comparisons are scale-invariant: e·f² on both sides of
      // every adjacent comparison — the gain-riding robustness the
      // fingerprint exists for. Samples are bounded (|s| ≤ 16064·4 <
      // 2^16... kept within Short by the generator's amplitude bound)
      val a = MediaCodecs.decodeWavPcm16(Multimodal.syntheticWavBytes(id)).get
      val scaled = a.samples.map(s => (s / f).toShort) // attenuate: stays in range
      // NOTE: integer attenuation is NOT exactly scale-invariant
      // (truncation), so compare against a small Hamming tolerance —
      // the robustness contract, not bit equality
      val d = java.lang.Long.bitCount(MediaCodecs.audioFingerprint64(a) ^
        MediaCodecs.audioFingerprint64(MediaCodecs.WavAudio(8000, 1, scaled)))
      d <= 8
    }

  property("video frame hashes: variants agree exactly on both-clean frames") =
    forAll(Gen.choose(0L, 10000L), Gen.choose(0, 7)) { (g, idx) =>
      // both-clean (r = 0 for both) ⇒ identical frame bytes ⇒ identical hash
      val a = MediaCodecs.dHash64(
        MediaCodecs.decodePpm(Multimodal.syntheticFramePpm(g * 8 + idx, invert = false)).get)
      val b = MediaCodecs.dHash64(
        MediaCodecs.decodePpm(Multimodal.syntheticFramePpm(g * 8 + idx, invert = false)).get)
      a == b
    }
}
