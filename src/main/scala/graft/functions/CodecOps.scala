package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers backing the custom Catalyst expressions; the generated
  * (whole-stage) code calls these via their static forwarders.
  */
object CodecOps {
  /** Little-endian signed 64-bit read at byte offset. */
  def leLong(bytes: Array[Byte], offset: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) {
      v = (v << 8) | (bytes(offset + i) & 0xffL)
      i -= 1
    }
    v
  }

  /** Little-endian signed 32-bit read at byte offset. */
  def leInt(bytes: Array[Byte], offset: Int): Int = {
    ((bytes(offset) & 0xff)) |
      ((bytes(offset + 1) & 0xff) << 8) |
      ((bytes(offset + 2) & 0xff) << 16) |
      ((bytes(offset + 3) & 0xff) << 24)
  }

  /** Unsigned little-endian 128-bit read at byte offset, widened to
    * Decimal(38,0) (reference `utils.rs:44` `read_u128_le` — CLMM
    * sqrt_price/liquidity fields are u128 on the wire). */
  def leU128(bytes: Array[Byte], offset: Int): org.apache.spark.sql.types.Decimal = {
    // big-endian magnitude with a leading zero byte keeps the sign positive
    val be = new Array[Byte](17)
    var i = 0
    while (i < 16) {
      be(16 - i) = bytes(offset + i)
      i += 1
    }
    val v = new java.math.BigInteger(be)
    // max u128 is 39 digits; Spark decimals cap at precision 38. Values
    // ≥ 10^38 (top ~1.5 bits of the range, far beyond any real
    // sqrt_price/liquidity) decode to null rather than failing the task.
    if (v.bitLength > 126 && v.toString.length > 38) null
    else org.apache.spark.sql.types.Decimal(BigDecimal(v), 38, 0)
  }

  /** Little-endian encode of the low `width` bytes of a long. */
  def leBytes(value: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var i = 0
    while (i < width) {
      out(i) = ((value >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Sequential parse of a borsh-style create-token event: three
    * length-prefixed strings, four 32-byte pubkeys, five LE u64/i64
    * fields (same wire shape the reference decodes field-by-field in
    * `pumpfun_create_v2_token_event_log_decode`). Returns null on
    * malformed input, mirroring the reference's Option<_> parse.
    */
  def decodeCreateToken(bytes: Array[Byte]): InternalRow = {
    var off = 8 // caller has already matched the 8-byte discriminator
    def remaining(n: Int): Boolean = off + n <= bytes.length
    def str(): UTF8String = {
      if (!remaining(4)) return null
      val len = leInt(bytes, off); off += 4
      if (len < 0 || !remaining(len)) return null
      val s = UTF8String.fromBytes(bytes, off, len); off += len
      s
    }
    def pubkey(): Array[Byte] = {
      if (!remaining(32)) return null
      val out = java.util.Arrays.copyOfRange(bytes, off, off + 32)
      off += 32
      out
    }
    val name = str(); if (name == null) return null
    val symbol = str(); if (symbol == null) return null
    val uri = str(); if (uri == null) return null
    val mint = pubkey(); if (mint == null) return null
    val bondingCurve = pubkey(); if (bondingCurve == null) return null
    val user = pubkey(); if (user == null) return null
    val creator = pubkey(); if (creator == null) return null
    if (!remaining(40)) return null
    val row = new GenericInternalRow(14)
    row.update(0, name); row.update(1, symbol); row.update(2, uri)
    row.update(3, mint); row.update(4, bondingCurve)
    row.update(5, user); row.update(6, creator)
    row.setLong(7, leLong(bytes, off))
    row.setLong(8, leLong(bytes, off + 8))
    row.setLong(9, leLong(bytes, off + 16))
    row.setLong(10, leLong(bytes, off + 24))
    row.setLong(11, leLong(bytes, off + 32))
    off += 40
    // V2 tail (reference `pumpfun_create_v2_token_event_log_decode`
    // :154-161): token_program pubkey + is_mayhem_mode flag when the
    // payload carries them; V1 payloads leave both null
    if (remaining(33)) {
      row.update(12, java.util.Arrays.copyOfRange(bytes, off, off + 32))
      row.setInt(13, if (bytes(off + 32) == 1) 1 else 0)
    } else { row.update(12, null); row.update(13, null) }
    row
  }

  /** Minimum polynomial rolling hash over all `window`-byte windows of the
    * UTF-8 bytes (document-winnowing style fingerprint). Base 257 modulo
    * 2^61-1; returns Long.MaxValue for strings shorter than the window.
    */
  def rollMin(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < window || window <= 0) return Long.MaxValue
    val M = 2305843009213693951L // 2^61 - 1
    val B = 257L
    // B^(window-1) mod M for removing the outgoing byte
    var pow = 1L
    var k = 0
    while (k < window - 1) { pow = mulMod(pow, B, M); k += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = (mulMod(h, B, M) + (bytes(i) & 0xffL)) % M; i += 1 }
    var min = h
    i = window
    while (i < n) {
      val outgoing = mulMod(bytes(i - window) & 0xffL, pow, M)
      h = (h - outgoing % M + M) % M
      h = (mulMod(h, B, M) + (bytes(i) & 0xffL)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Wrapping u32 byte-sum checksum, returned as its non-negative long
    * value (reference `streaming/common/simd_utils.rs:183` `fast_checksum`
    * sums all bytes as u32 — used here for wire-frame integrity). */
  def checksum(bytes: Array[Byte]): Long = {
    var s = 0 // wraps like the reference's u32 accumulator
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s & 0xFFFFFFFFL
  }

  /** First 0-based offset of `needle` within `haystack`, null when absent
    * or the needle is empty (reference `simd_utils.rs:105`
    * `find_pattern_simd` returns `Option<usize>` — its stream-resync
    * pattern scan). */
  def findPattern(hay: Array[Byte], needle: Array[Byte]): java.lang.Integer = {
    val n = needle.length
    if (n == 0 || hay.length < n) return null
    var i = 0
    val last = hay.length - n
    while (i <= last) {
      var j = 0
      while (j < n && hay(i + j) == needle(j)) j += 1
      if (j == n) return i
      i += 1
    }
    null
  }

  /** (a*b) mod (2^61-1) for a,b < 2^61, branch-light Mersenne reduction:
    * with m = 2^61-1, 2^61 ≡ 1 and 2^64 ≡ 8, so the 128-bit product
    * hi·2^64 + lo folds to hi·8 + (lo >>> 61) + (lo & m).
    */
  def mulMod(a: Long, b: Long, m: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & m)
    r = (r & m) + (r >>> 61)
    if (r >= m) r -= m
    r
  }
}
