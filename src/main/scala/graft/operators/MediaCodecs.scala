package graft.operators

/** Real decode kernels for the two codec-free container formats — the
  * formats a JVM can parse byte-by-byte with no native library:
  *
  *  - binary PPM (P6): `P6 <ws> width <ws> height <ws> maxval <1 ws>`
  *    then `width*height*3` raw RGB bytes (maxval <= 255), with
  *    `#`-comments allowed in the header whitespace;
  *  - PCM WAV: RIFF container, `fmt ` chunk with audioFormat 1
  *    (uncompressed) and 16-bit samples, `data` chunk of little-endian
  *    int16 frames.
  *
  * Both return None (never throw) on anything malformed — a 100 TB
  * media scan ALWAYS contains corrupt blobs, and a decode operator
  * that dies on the first one is useless; callers fall back to the
  * byte-stat path and keep the row. Parsers are plain-array state
  * machines: no regex, no codec, no allocation beyond the output.
  */
object MediaCodecs {

  /** Decoded P6 image: dimensions + raw interleaved RGB samples. */
  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded 16-bit PCM audio: rate/channels + interleaved samples. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = {
      var sawWs = false
      var more = true
      while (more && i < bytes.length) {
        val c = bytes(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { sawWs = true; i += 1 }
        else if (c == '#') { // comment runs to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else more = false
      }
      sawWs
    }
    def readInt(): Long = {
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (bytes(i) - '0'); any = true; i += 1
      }
      if (any) v else -1L
    }
    if (!skipWs()) return None
    val w = readInt(); if (!skipWs()) return None
    val h = readInt(); if (!skipWs()) return None
    val maxval = readInt()
    // dimension bounds BEFORE any product: readInt stops accumulating
    // just past Int.MaxValue, so unbounded w/h could make w*h (and
    // w*h*3) overflow Long and sneak a garbage `need` past the length
    // check — a corrupt 30-byte header must yield None, never a throw
    // or a giant allocation
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
      maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= bytes.length || !(bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r')) return None
    i += 1
    if (w * h > Int.MaxValue / 3) return None // w,h <= 2^31 → no Long overflow
    val need = (w * h * 3).toInt
    if (bytes.length - i < need) return None
    val rgb = java.util.Arrays.copyOfRange(bytes, i, i + need)
    Some(PpmImage(w.toInt, h.toInt, rgb))
  }

  def decodeWavPcm16(bytes: Array[Byte]): Option[WavAudio] = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= bytes.length &&
        s.indices.forall(j => bytes(off + j) == s.charAt(j))
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var off = 12
    var rate = -1; var channels = -1; var bps = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val size = u32(off + 4)
      if (size < 0 || size > bytes.length - off - 8) return None
      val body = off + 8
      if (ascii(off, "fmt ")) {
        if (size < 16) return None
        if (u16(body) != 1) return None // PCM only; compressed WAV needs a codec
        channels = u16(body + 2)
        rate = u32(body + 4).toInt
        bps = u16(body + 14)
        if (bps != 16 || channels <= 0 || rate <= 0) return None
      } else if (ascii(off, "data")) {
        val n = (size / 2).toInt
        samples = new Array[Short](n)
        var j = 0
        while (j < n) {
          samples(j) = ((bytes(body + 2 * j) & 0xff) |
            ((bytes(body + 2 * j + 1) & 0xff) << 8)).toShort
          j += 1
        }
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are 2-byte aligned
    }
    if (rate > 0 && channels > 0 && samples != null) Some(WavAudio(rate, channels, samples))
    else None
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual fingerprint for image near-duplicate detection: the
    * image is area-reduced to a 9×8 grid of integer luma block sums
    * (each pixel maps to block `(x·9 div W, y·8 div H)` — exact for
    * any W,H with no float resampling), and bit `row·8+col` is set iff
    * the block outranks its right neighbor. Horizontally-adjacent
    * brightness GRADIENTS survive re-encode/resize/small edits, so
    * near-duplicate images land within a few bits of Hamming distance
    * while unrelated images differ in ~32. All-integer (luma weights
    * 2/5/1 summed exactly), so the hash is bit-reproducible across
    * engines — the property the q141 relational oracle builds on.
    */
  def dHash64(img: PpmImage): Long = {
    val w = img.width; val h = img.height
    val sums = new Array[Long](9 * 8)
    var y = 0
    while (y < h) {
      val by = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val bx = (x.toLong * 9 / w).toInt
        val o = 3 * (y * w + x)
        sums(by * 9 + bx) += 2 * (img.rgb(o) & 0xff) +
          5 * (img.rgb(o + 1) & 0xff) + (img.rgb(o + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        if (sums(by * 9 + bx) > sums(by * 9 + bx + 1)) hash |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** 64-bit audio fingerprint — dHash's 1-D cousin over the energy
    * envelope (the chromaprint/Shazam family's core move, reduced to
    * its integer skeleton): the sample stream is cut into 65 frames
    * (sample i → frame `i·65 div n` — exact integer mapping, no
    * resampling), each frame's energy is the exact Σ s² (a BIGINT —
    * 16-bit samples can't overflow it at any frame length), and bit f
    * is set iff frame f's energy outranks frame f+1's. Energy-envelope
    * GRADIENTS survive re-encode, gain-riding and small dropouts, so
    * near-duplicate clips land within a few bits while unrelated audio
    * differs in ~32. Channel-agnostic (interleaved samples sum into
    * the same frame); all-integer, so bit-reproducible across engines
    * (the q143 relational oracle re-derives it).
    */
  def audioFingerprint64(a: WavAudio): Long = {
    val n = a.samples.length
    if (n == 0) return 0L
    val energy = new Array[Long](65)
    var i = 0
    while (i < n) {
      val s = a.samples(i).toLong
      energy((i.toLong * 65 / n).toInt) += s * s
      i += 1
    }
    var fp = 0L
    var f = 0
    while (f < 64) {
      if (energy(f) > energy(f + 1)) fp |= 1L << f
      f += 1
    }
    fp
  }

  /** 8-dim image features from decoded RGB: per-channel means,
    * luma mean/contrast, aspect, and normalized dimensions — the
    * deterministic stand-in for a learned embedding, computed from
    * REAL pixels.
    */
  def ppmFeatures(img: PpmImage): Array[Double] = {
    val n = img.rgb.length / 3
    var r = 0.0; var g = 0.0; var b = 0.0; var luma = 0.0; var luma2 = 0.0
    var j = 0
    while (j < n) {
      val rv = (img.rgb(3 * j) & 0xff) / 255.0
      val gv = (img.rgb(3 * j + 1) & 0xff) / 255.0
      val bv = (img.rgb(3 * j + 2) & 0xff) / 255.0
      r += rv; g += gv; b += bv
      val l = 0.2126 * rv + 0.7152 * gv + 0.0722 * bv
      luma += l; luma2 += l * l
      j += 1
    }
    val m = luma / n
    Array(r / n, g / n, b / n, m,
      math.sqrt(math.max(luma2 / n - m * m, 0.0)), // contrast
      img.width.toDouble / img.height,
      math.min(img.width / 4096.0, 1.0), math.min(img.height / 4096.0, 1.0))
  }

  /** 8-dim audio features from decoded PCM: mean/RMS/peak amplitude,
    * zero-crossing rate, duration, and format facts.
    */
  def wavFeatures(a: WavAudio): Array[Double] = {
    val n = a.samples.length
    var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
    var j = 0
    while (j < n) {
      val v = a.samples(j) / 32768.0
      sum += v; sq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (j > 0 && ((a.samples(j - 1) < 0) != (a.samples(j) < 0))) zc += 1
      j += 1
    }
    val frames = n / a.channels
    Array(if (n == 0) 0.0 else sum / n,
      if (n == 0) 0.0 else math.sqrt(sq / n), peak,
      if (n <= 1) 0.0 else zc.toDouble / (n - 1),
      frames.toDouble / a.sampleRate, // seconds
      a.sampleRate / 48000.0, a.channels.toDouble, math.min(n / 1e6, 1.0))
  }
}
