package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static runtime helpers for the vector / signature expressions (called
  * from generated code). Float components are widened to double and summed
  * in index order — bit-identical to the
  * `aggregate(zip_with(...), 0.0d, (acc, v) -> acc + v)` left fold these
  * replace, so oracle-checked cosine outputs are unchanged.
  */
object VecOps {

  /** Dot product of two float vectors (index-order double accumulation).
    * Null on length mismatch (malformed input must not fail the job). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Squared L2 norm of a float vector. */
  def norm2(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    acc
  }

  /** Random-hyperplane signature: bit k of the result is
    * sign(sum_i rademacher(k, i) * v_i), where rademacher(k, i) is bit 7
    * of xxhash64 over the two ints (k, i) with Spark's default seed —
    * byte-identical to the exploded
    * `case when (shiftright(xxhash64(k, i), 7) & 1) = 1 then v else -v`
    * formulation. One compiled pass per vector: no per-(component, plane)
    * row blowup and no shuffle to assemble the signature.
    */
  def hyperplaneSig(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var k = 0
    while (k < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        // xxhash64(k, i) = hashInt(i, hashInt(k, seed=42)) — ints chain
        // through XXH64 exactly like the builtin's left-to-right fold
        val h = XXH64.hashInt(i, XXH64.hashInt(k, 42L))
        val x = v.getFloat(i).toDouble
        proj += (if (((h >>> 7) & 1L) == 1L) x else -x)
        i += 1
      }
      if (proj >= 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  private val Space = UTF8String.fromString(" ")

  /** 64-bit SimHash band values over distinct whitespace tokens of
    * `lower(text)`: token hash h = xxhash64(token) (Spark seed 42); bit k
    * votes sign(h >> k & 1); band b (0..3) packs sign bits 16b..16b+15
    * MSB-first. Matches the exploded per-(token, bit) formulation
    * byte-for-byte while running one compiled pass per document.
    */
  def simhashBands(text: UTF8String): ArrayData = {
    val ws = text.toLowerCase.split(Space, -1)
    val seen = new LinkedHashSet[UTF8String](ws.length * 2)
    var i = 0
    while (i < ws.length) { seen.add(ws(i)); i += 1 }
    val sums = new Array[Int](64)
    val it = seen.iterator()
    while (it.hasNext) {
      val t = it.next()
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes(), 42L)
      var k = 0
      while (k < 64) {
        sums(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
    }
    val bands = new Array[Any](4)
    var b = 0
    while (b < 4) {
      var bv = 0
      var r = 0
      while (r < 16) {
        if (sums(b * 16 + r) >= 0) bv |= (1 << (15 - r))
        r += 1
      }
      bands(b) = bv
      b += 1
    }
    new GenericArrayData(bands)
  }
}
