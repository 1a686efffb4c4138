package graft.functions

/** Base58 codec (Bitcoin/Solana alphabet) for rendering 32-byte pubkeys the
  * way the reference displays `solana_sdk::pubkey::Pubkey` values.
  * Static-forwarded so generated code can call it directly.
  */
object Base58 {
  private val Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val Indexes: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    val num = input.clone()
    val encoded = new Array[Char](input.length * 2)
    var outputStart = encoded.length
    var inputStart = zeros
    while (inputStart < num.length) {
      // divmod base 256 -> base 58
      var remainder = 0
      var i = inputStart
      while (i < num.length) {
        val digit = num(i) & 0xff
        val temp = remainder * 256 + digit
        num(i) = (temp / 58).toByte
        remainder = temp % 58
        i += 1
      }
      outputStart -= 1
      encoded(outputStart) = Alphabet.charAt(remainder)
      if (num(inputStart) == 0) inputStart += 1
    }
    val sb = new StringBuilder
    var z = 0
    while (z < zeros) { sb.append('1'); z += 1 }
    sb.appendAll(encoded, outputStart, encoded.length - outputStart)
    sb.toString
  }

  def decode(input: String): Array[Byte] = {
    if (input.isEmpty) return Array.emptyByteArray
    val input58 = input.map { c =>
      val d = if (c < 128) Indexes(c.toInt) else -1
      require(d >= 0, s"invalid base58 character: $c")
      d.toByte
    }.toArray
    var zeros = 0
    while (zeros < input58.length && input58(zeros) == 0) zeros += 1
    val decoded = new Array[Byte](input.length)
    var outputStart = decoded.length
    var inputStart = zeros
    while (inputStart < input58.length) {
      var remainder = 0
      var i = inputStart
      while (i < input58.length) {
        val digit = input58(i).toInt
        val temp = remainder * 58 + digit
        input58(i) = (temp / 256).toByte
        remainder = temp % 256
        i += 1
      }
      outputStart -= 1
      decoded(outputStart) = remainder.toByte
      if (input58(inputStart) == 0) inputStart += 1
    }
    // strip the work array's own leading zeros (they are re-added from the
    // explicit `zeros` prefix count)
    while (outputStart < decoded.length && decoded(outputStart) == 0)
      outputStart += 1
    val out = new Array[Byte](zeros + (decoded.length - outputStart))
    System.arraycopy(decoded, outputStart, out, zeros, decoded.length - outputStart)
    out
  }

  /** Expression-safe decode: invalid input yields null instead of
    * throwing (untrusted strings must never fail a whole task — the
    * same contract as the wire frame reader's truncation handling). */
  def decodeOrNull(input: String): Array[Byte] =
    try decode(input)
    catch { case _: IllegalArgumentException => null }
}
