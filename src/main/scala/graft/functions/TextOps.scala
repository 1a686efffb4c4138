package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static runtime helpers for the text-shingling expressions (called from
  * generated code, so everything here must be a plain static method on a
  * stable class name).
  */
object TextOps {
  private val Space = UTF8String.fromString(" ")

  /** Distinct word trigrams of `lower(text)`, first-occurrence order —
    * exact semantic match for
    * `array_distinct(transform(sequence(0, size(ws)-3),
    *    i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))`
    * over `ws = split(lower(text), ' ')` (split keeps empty tokens, like
    * Spark's regex split with limit -1). Returns null when the doc has
    * fewer than 3 tokens, so `isnotnull(...)` doubles as the `size(ws) >= 3`
    * predicate. One compiled pass per document — replaces an interpreted
    * higher-order-function lambda that dominated the LSH pipeline (the
    * optimizer's InferFiltersFromGenerate also re-evaluates the generator
    * input in a Filter, which made the interpreted form 3x worse).
    */
  def trigrams(text: UTF8String): ArrayData = {
    val ws = text.toLowerCase.split(Space, -1)
    if (ws.length < 3) return null
    val seen = new LinkedHashSet[UTF8String](ws.length * 2)
    var i = 0
    while (i + 2 < ws.length) {
      seen.add(UTF8String.concatWs(Space, ws(i), ws(i + 1), ws(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
