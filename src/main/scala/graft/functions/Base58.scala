package graft.functions

/** Base58 codec (Bitcoin/Solana alphabet) for rendering 32-byte pubkeys the
  * way the reference displays `solana_sdk::pubkey::Pubkey` values.
  * Static-forwarded so generated code can call it directly.
  *
  * Arithmetic runs over 32-bit limbs, five base-58 digits per long-division
  * pass (58^5 < 2^31, so the per-limb dividend `rem·2^32 + limb` stays in a
  * positive signed long): one pass of the classic byte-wise schoolbook
  * division produced ONE digit touching every remaining byte, this produces
  * FIVE digits touching a quarter as many limbs — ~20× fewer inner divmod
  * steps for the same canonical output (encode output is positional
  * notation, unique; decode is its exact inverse).
  */
object Base58 {
  private val Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val Indexes: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }
  // 58^1 .. 58^5: multipliers for decode's grouped multiply-accumulate
  private val Pow58 = Array(1L, 58L, 3364L, 195112L, 11316496L, 656356768L)
  private val Div = 656356768L // 58^5

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    val nBytes = input.length - zeros
    if (nBytes == 0) return "1" * zeros
    // pack the payload big-endian into 32-bit limbs (limbs(0) most
    // significant), filling from the least-significant end
    val nLimbs = (nBytes + 3) / 4
    val limbs = new Array[Int](nLimbs)
    var bi = input.length - 1
    var li = nLimbs - 1
    while (bi >= zeros) {
      var v = 0
      var shift = 0
      while (shift < 32 && bi >= zeros) {
        v |= (input(bi) & 0xff) << shift
        shift += 8
        bi -= 1
      }
      limbs(li) = v
      li -= 1
    }
    // base58 needs ≤ ceil(bytes·8/log2(58)) ≈ 1.3658·bytes digits; each
    // pass may also left-pad its 5-digit group, so size generously
    val out = new Array[Char](nBytes * 2 + 5)
    var pos = out.length
    var start = 0
    while (start < nLimbs) {
      // one long-division pass: limbs ← limbs / 58^5, rem = limbs % 58^5
      var rem = 0L
      var i = start
      while (i < nLimbs) {
        val cur = (rem << 32) | (limbs(i) & 0xffffffffL)
        limbs(i) = (cur / Div).toInt
        rem = cur % Div
        i += 1
      }
      while (start < nLimbs && limbs(start) == 0) start += 1
      var r = rem.toInt
      if (start < nLimbs) {
        // interior group: exactly five positional digits, zeros included
        var k = 0
        while (k < 5) {
          pos -= 1
          out(pos) = Alphabet.charAt(r % 58)
          r /= 58
          k += 1
        }
      } else {
        // most significant group: significant digits only (r > 0 here —
        // the value was nonzero entering the pass, and quotient == 0
        // means the whole value was the remainder)
        while (r > 0) {
          pos -= 1
          out(pos) = Alphabet.charAt(r % 58)
          r /= 58
        }
      }
    }
    val sb = new java.lang.StringBuilder(zeros + (out.length - pos))
    var z = 0
    while (z < zeros) { sb.append('1'); z += 1 }
    sb.append(out, pos, out.length - pos)
    sb.toString
  }

  def decode(input: String): Array[Byte] = {
    if (input.isEmpty) return Array.emptyByteArray
    val n = input.length
    val digits = new Array[Byte](n)
    var di = 0
    while (di < n) {
      val c = input.charAt(di)
      val d = if (c < 128) Indexes(c.toInt) else -1
      require(d >= 0, s"invalid base58 character: $c")
      digits(di) = d.toByte
      di += 1
    }
    var zeros = 0
    while (zeros < n && digits(zeros) == 0) zeros += 1
    // grouped multiply-accumulate into little-endian 32-bit limbs:
    // value = ((g0)·58^|g1| + g1)·58^|g2| + ... — five digits per pass
    val sig = n - zeros
    val maxLimbs = sig / 5 + 2 // value < 58^sig < 2^(5.858·sig)
    val limbs = new Array[Int](maxLimbs)
    var nl = 0
    var p = zeros
    while (p < n) {
      val len = math.min(5, n - p)
      var g = 0L
      var k = 0
      while (k < len) { g = g * 58 + digits(p + k); k += 1 }
      p += len
      val mult = Pow58(len)
      var carry = g
      var i = 0
      while (i < nl) {
        val prod = (limbs(i) & 0xffffffffL) * mult + carry
        limbs(i) = prod.toInt
        carry = prod >>> 32
        i += 1
      }
      while (carry != 0) {
        limbs(nl) = carry.toInt
        carry >>>= 32
        nl += 1
      }
    }
    // serialize the value big-endian with no leading zero bytes, behind
    // the explicit '1'-prefix zero count — the canonical inverse
    var top = nl - 1
    while (top >= 0 && limbs(top) == 0) top -= 1
    var sigBytes = 0
    if (top >= 0) {
      val hi = limbs(top) & 0xffffffffL
      val hiBytes =
        if (hi >= 0x1000000L) 4 else if (hi >= 0x10000L) 3
        else if (hi >= 0x100L) 2 else 1
      sigBytes = top * 4 + hiBytes
    }
    val out = new Array[Byte](zeros + sigBytes)
    var ob = out.length - 1
    var i = 0
    while (i < top) {
      val v = limbs(i)
      out(ob) = v.toByte
      out(ob - 1) = (v >>> 8).toByte
      out(ob - 2) = (v >>> 16).toByte
      out(ob - 3) = (v >>> 24).toByte
      ob -= 4
      i += 1
    }
    if (top >= 0) {
      var v = limbs(top)
      while (ob >= zeros) {
        out(ob) = v.toByte
        v >>>= 8
        ob -= 1
      }
    }
    out
  }

  /** Expression-safe decode: invalid input yields null instead of
    * throwing (untrusted strings must never fail a whole task — the
    * same contract as the wire frame reader's truncation handling). */
  def decodeOrNull(input: String): Array[Byte] =
    try decode(input)
    catch { case _: IllegalArgumentException => null }
}
