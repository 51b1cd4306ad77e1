package graft.functions

/** BLAKE2b message digest, implemented from the public specification
  * (RFC 7693, "The BLAKE2 Cryptographic Hash and Message Authentication
  * Code"). Unkeyed, configurable digest length 1-64 bytes.
  *
  * This is the fidelity twin of the reference's key-hashing schema
  * (`/root/reference/streaming/src/main/java/dev/poire/denormalize/schema/blake/Blake2BJoinKeySchema.java:52-56`,
  * which vendors a public-domain BLAKE2b). Implementation here follows
  * RFC 7693 §3.1-3.3 directly (not the reference's vendored code).
  */
object Blake2b {

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  // RFC 7693 §2.7 message schedule SIGMA (rounds 10,11 reuse rows 0,1)
  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  // RFC 7693 §3.1 mixing function G
  @inline private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 63)
  }

  @inline private def load64(b: Array[Byte], off: Int): Long = {
    var x = 0L
    var i = 7
    while (i >= 0) { x = (x << 8) | (b(off + i) & 0xffL); i -= 1 }
    x
  }

  // RFC 7693 §3.2 compression function F
  private def compress(h: Array[Long], block: Array[Byte], off: Int, t: Long, last: Boolean): Unit = {
    val v = new Array[Long](16)
    val m = new Array[Long](16)
    var i = 0
    while (i < 8) { v(i) = h(i); v(i + 8) = IV(i); i += 1 }
    v(12) ^= t // t is total bytes; inputs here are < 2^63 so hi word is 0
    if (last) v(14) = ~v(14)
    i = 0
    while (i < 16) { m(i) = load64(block, off + 8 * i); i += 1 }
    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Unkeyed BLAKE2b digest of `input`, `outLen` bytes (1-64). */
  def digest(input: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64, s"digest size must be 1..64, got $outLen")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong // RFC 7693 §2.5 param block: no key
    val n = input.length
    var off = 0
    // process all full blocks except the last block (which may be full)
    while (n - off > 128) {
      compress(h, input, off, off + 128L, last = false)
      off += 128
    }
    val lastBlock = new Array[Byte](128)
    System.arraycopy(input, off, lastBlock, 0, n - off)
    compress(h, lastBlock, 0, n.toLong, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i >>> 3) >>> (8 * (i & 7))) & 0xff).toByte
      i += 1
    }
    out
  }
}
