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

  /** Nearest-PQ-codeword argmin for one subvector: scans `codes.length`
    * codewords stored row-major in `flat` (length = codes·w) and returns
    * the code with the smallest d2 = sv·sv − 2·sv·cw + cw·cw, ties to
    * the smaller code id. Bit-identical to the former broadcast-join +
    * `min_by(code, struct(argKey(d2), code))` formulation: every dot
    * accumulates in index-order doubles exactly like [[dot]], d2
    * associates as ((svv − svc·2) + cc), and a NaN d2 maps to
    * +MaxValue (the argKey guard) so degenerate subvectors still pick
    * the smallest codeword instead of vanishing. One compiled pass
    * per (vector, subspace) — the join fanned out n·m·|codes| rows
    * through a hash aggregate (the measured sf10 scale-limiter).
    * A length-mismatched subvector (former NULL-d2 path) also keys
    * every codeword at MaxValue → smallest code id, as before. */
  def pqArgmin(sv: ArrayData, flat: Array[Float], codes: Array[Long])
      : java.lang.Long = {
    val w = sv.numElements()
    val k = codes.length
    if (k == 0) return null
    if (w == 0 || flat.length != k.toLong * w) {
      // mismatch ⇒ all keys MaxValue ⇒ tie-break picks the min code id
      var best = codes(0)
      var c = 1
      while (c < k) {
        if (codes(c) < best) best = codes(c); c += 1
      }
      return best
    }
    // hoist the subvector to primitive doubles once: the inner loops
    // then run on primitive arrays only (the ArrayData accessor call
    // per element dominated the first cut of this kernel)
    val vv = new Array[Double](w)
    var svv = 0.0
    var i = 0
    while (i < w) {
      val x = sv.getFloat(i).toDouble; vv(i) = x; svv += x * x; i += 1
    }
    var found = false
    var bestKey = Double.MaxValue
    var bestCode = Long.MaxValue
    var c = 0
    while (c < k) {
      var svc = 0.0
      var cc = 0.0
      val off = c * w
      var j = 0
      while (j < w) {
        val b = flat(off + j).toDouble
        svc += vv(j) * b
        cc += b * b
        j += 1
      }
      val d2 = svv - svc * 2 + cc
      val key = if (java.lang.Double.isNaN(d2)) Double.MaxValue else d2
      val code = codes(c)
      if (!found || key < bestKey || (key == bestKey && code < bestCode)) {
        found = true; bestKey = key; bestCode = code
      }
      c += 1
    }
    bestCode
  }

  /** Nearest-IVF-cell argmax-cosine for one vector: scans `ids.length`
    * centroids (row-major floats in `flat`, their exact VecNorm2 values
    * in `norms`) and returns the centroid id with the LARGEST 1e-6-grid
    * cosine, ties to the smaller id. Bit-identical to the former
    * crossJoin + `min_by(cent_id, struct(argKey(-cos6), cent_id))`
    * formulation, term by term: index-order double dots ([[dot]]),
    * denom = sqrt(na)·sqrt(cn) in that order, try_divide's NULL on a
    * zero denominator, Spark Round's HALF_UP-via-BigDecimal.valueOf
    * with NaN/Infinity passthrough, and the argKey(−cos) → MaxValue
    * guard. One compiled pass per vector — the crossJoin fanned
    * n·cells rows (412M at sf10) through a hash aggregate. */
  /** Spark Round(double, 6) semantics: NaN/Infinity pass through,
    * otherwise HALF_UP on the shortest-decimal representation
    * (BigDecimal.valueOf). ~300 ns per call — kept OFF the hot path. */
  private def round6(r: Double): Double =
    if (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r)) r
    else java.math.BigDecimal.valueOf(r)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def cellArgmin(v: ArrayData, flat: Array[Float], norms: Array[Double],
      ids: Array[Long]): java.lang.Long = {
    val w = v.numElements()
    val k = ids.length
    if (k == 0) return null
    val mismatch = w == 0 || flat.length != k.toLong * w
    // hoist the vector to primitive doubles once (see pqArgmin)
    val vv = new Array[Double](w)
    var na = 0.0
    var i = 0
    while (i < w) {
      val x = v.getFloat(i).toDouble; vv(i) = x; na += x * x; i += 1
    }
    val sna = math.sqrt(na)
    // Pass 1: RAW cosines (no rounding — BigDecimal.valueOf at ~300 ns
    // × cells × vectors dominated the first cut). Rounding to the 1e-6
    // grid is monotone non-decreasing (shortest-decimal mapping
    // preserves double order, HALF_UP is monotone), so the rounded
    // winner's raw cosine sits within one grid step of the raw max —
    // only that sliver needs exact rounding in pass 2.
    val rs = new Array[Double](k)
    var rmax = Double.NegativeInfinity
    var anyValid = false
    var c = 0
    while (c < k) {
      rs(c) = Double.NaN // NULL-cos sentinel (mismatch / zero denom / NaN)
      if (!mismatch) {
        val off = c * w
        var dt = 0.0
        var j = 0
        while (j < w) {
          dt += vv(j) * flat(off + j).toDouble
          j += 1
        }
        val denom = sna * math.sqrt(norms(c))
        if (denom != 0.0) {
          val r = dt / denom
          if (!java.lang.Double.isNaN(r)) {
            rs(c) = r
            anyValid = true
            if (r > rmax) rmax = r
          }
        }
      }
      c += 1
    }
    if (!anyValid) {
      // every key is the argKey MaxValue guard: tie-break -> min id
      var best = ids(0)
      var m = 1
      while (m < k) { if (ids(m) < best) best = ids(m); m += 1 }
      return best
    }
    // Pass 2: exact Spark rounding only for raw cosines within 1e-5 of
    // the raw max (a 10x-generous bound on the 1e-6 grid step); the
    // (rounded DESC, id ASC) winner is unchanged from the exhaustive
    // formulation by monotonicity.
    val cut = rmax - 1e-5
    var bestRound = Double.NegativeInfinity
    var bestId = Long.MaxValue
    c = 0
    while (c < k) {
      val r = rs(c)
      if (!java.lang.Double.isNaN(r) && r >= cut) {
        val v6 = round6(r)
        if (v6 > bestRound || (v6 == bestRound && ids(c) < bestId)) {
          bestRound = v6; bestId = ids(c)
        }
      }
      c += 1
    }
    bestId
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

  /** Centered dense mat-vec for the whitening transform: out[j] =
    * Σ_i flat[j·d + i] · (v[i] − mean[i]), accumulated in double in
    * index order, emitted as floats. `flat` is the row-major dOut×d
    * whitening matrix riding as a primitive reference object (the
    * [[cellArgmin]] lesson — boxed literals cost ~100x in the hot
    * loop). Null on dimension mismatch — malformed vectors must not
    * fail a 100 TB job. */
  def matVecCentered(v: ArrayData, mean: Array[Double],
      flat: Array[Double]): ArrayData = {
    val d = mean.length
    if (v.numElements() != d || d == 0 ||
      flat.length % d != 0) return null
    val dOut = flat.length / d
    val vv = new Array[Double](d)
    var i = 0
    while (i < d) { vv(i) = v.getFloat(i).toDouble - mean(i); i += 1 }
    val out = new Array[Any](dOut)
    var j = 0
    while (j < dOut) {
      var acc = 0.0
      val base = j * d
      var k = 0
      while (k < d) { acc += flat(base + k) * vv(k); k += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Non-empty intersection of two long-array bitmasks over the same
    * fixed grid (index i covers bits 64i..64i+63). Shorter array ≡
    * zero-padded; one branch-light pass, codegen-friendly. */
  def maskIntersects(a: ArrayData, b: ArrayData): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if ((a.getLong(i) & b.getLong(i)) != 0L) return true
      i += 1
    }
    false
  }

  /** ADC distance of one PQ-coded vector to one query, over PRE-SCALED
    * decimal lookups: `scaled(sub)(idx)` is the query's per-(sub, code)
    * squared distance already fixed to the 1e-9 grid as an unscaled
    * long (see Similarity.pqTopK's adcScaled9 — the exact
    * `round(d2, 9) :: cast decimal(25,9)` emulation). The sum of
    * unscaled longs IS the decimal(·,9) sum (exact, order-free), and
    * the close converts once — `BigDecimal.valueOf(sum, 9).doubleValue`
    * ≡ Decimal.toDouble of the old aggregate. Null codes (a subspace
    * absent from the codebook) are skipped exactly like the former
    * inner join; a vector with NO non-null code yields null (the old
    * join produced no row for it). Code ids resolve to table slots by
    * binary search over the per-sub sorted id arrays. */
  def pqAdc(codes: ArrayData, codeIds: Array[Array[Long]],
      scaled: Array[Array[Long]]): java.lang.Double = {
    val m = codes.numElements()
    var sum = 0L
    var any = false
    var s = 0
    while (s < m) {
      if (!codes.isNullAt(s)) {
        val idx = java.util.Arrays.binarySearch(codeIds(s), codes.getLong(s))
        if (idx >= 0) { // codes come from this codebook by construction
          sum += scaled(s)(idx)
          any = true
        }
      }
      s += 1
    }
    if (!any) null
    else java.lang.Double.valueOf(
      java.math.BigDecimal.valueOf(sum, 9).doubleValue())
  }
}
