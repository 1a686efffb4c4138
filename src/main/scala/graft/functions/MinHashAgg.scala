package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature aggregate: folds a stream of per-gram 64-bit hashes
  * into an `numHashes`-wide signature of family minima in ONE pass.
  *
  * This replaces the explode(sequence(0, n-1)) formulation, which blew
  * every gram row up 64x before the partial aggregate: the hash family is
  * evaluated inside the aggregate update (a tight unrolled long-mix loop),
  * so the pre-shuffle row count stays |grams|, not |grams| * numHashes,
  * and the shuffle itself carries one fixed-width buffer per (group,
  * partition) — the property that makes MinHash viable at 100 TB.
  *
  * Family member j is a Murmur3 fmix64 finalizer of `h0 ^ seed(j)` with
  * golden-ratio-spaced seeds — an independent-enough family for the LSH
  * collision probabilities (same construction class as the reference's
  * seeded-hash usage; see solana-event-stream's discriminator hashing for
  * the analogous fixed-width LE mixing, `protocols/pumpfun/parser.rs`).
  *
  * Runs under ObjectHashAggregateExec, which still performs map-side
  * partial aggregation (serialize/merge across partitions).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        val h = MinHashAgg.mix64(h0 ^ MinHashAgg.seed(j))
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Golden-ratio-spaced seed for family member j. */
  @inline def seed(j: Int): Long = (j + 1).toLong * 0x9E3779B97F4A7C15L

  /** Murmur3 fmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  def minhash(h0: Column, numHashes: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(h0), numHashes).toAggregateExpression())
}
