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

/** Drop-policy membership aggregate: the distinct non-null member ids of
  * a group, returned ONLY when the group's distinct size (null collapses
  * to one distinct value, like `distinct()` treats it) lies in
  * [2, cap] — null otherwise. One pass, one exchange.
  *
  * This replaces the three-stage DropAll bucket shape (3-key `distinct`
  * exchange → bucket-key re-exchange + checkpoint → size filter + join +
  * `collect_list`): the map-side partial dedupes a wallet's many
  * same-hour events locally and the shuffle ships one bounded set per
  * (group, partition) instead of every distinct activity row.
  *
  * The 100 TB safety property the old shape bought by counting BEFORE
  * collecting is kept by construction: a buffer stops storing the moment
  * it exceeds `cap` (it collapses to an overflow sentinel), so a
  * corpus-wide hot bucket costs cap+1 longs of memory in every partial —
  * its membership is never materialized anywhere, exactly as before.
  *
  * The returned array is SORTED so the operator output is deterministic
  * (`collect_list` order was plan-dependent; every consumer explodes and
  * distincts, but determinism is free at ≤ cap elements).
  *
  * Runs under ObjectHashAggregateExec (map-side partial aggregation).
  */
case class BoundedMembershipAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMembershipAgg.Buf]
  with UnaryLike[Expression] with ExpectsInputTypes {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def inputTypes: Seq[GraftBridge.ADT] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bounded_membership"

  override def createAggregationBuffer(): BoundedMembershipAgg.Buf =
    new BoundedMembershipAgg.Buf(false, false,
      new java.util.HashSet[java.lang.Long]())

  private def checkOverflow(b: BoundedMembershipAgg.Buf): Unit =
    if (b.set.size + (if (b.hasNull) 1 else 0) > cap) {
      b.overflowed = true
      b.set.clear() // hot groups hold cap+1 entries at most, transiently
    }

  override def update(b: BoundedMembershipAgg.Buf,
      input: InternalRow): BoundedMembershipAgg.Buf = {
    if (!b.overflowed) {
      val v = child.eval(input)
      if (v == null) b.hasNull = true
      else b.set.add(v.asInstanceOf[Long])
      checkOverflow(b)
    }
    b
  }

  override def merge(b1: BoundedMembershipAgg.Buf,
      b2: BoundedMembershipAgg.Buf): BoundedMembershipAgg.Buf = {
    if (b2.overflowed) b1.overflowed = true
    if (!b1.overflowed) {
      b1.hasNull ||= b2.hasNull
      b1.set.addAll(b2.set)
      checkOverflow(b1)
    }
    if (b1.overflowed) b1.set.clear()
    b1
  }

  override def eval(b: BoundedMembershipAgg.Buf): Any = {
    val total = b.set.size + (if (b.hasNull) 1 else 0)
    if (b.overflowed || total < 2) null
    else {
      val arr = new Array[Long](b.set.size)
      val it = b.set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }
  }

  override def serialize(b: BoundedMembershipAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 + b.set.size * 8)
    bb.put(if (b.overflowed) 1.toByte else 0.toByte)
    bb.put(if (b.hasNull) 1.toByte else 0.toByte)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMembershipAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BoundedMembershipAgg.Buf(bb.get() == 1, bb.get() == 1,
      new java.util.HashSet[java.lang.Long]())
    while (bb.hasRemaining) b.set.add(bb.getLong())
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): BoundedMembershipAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedMembershipAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedMembershipAgg = copy(child = newChild)
}

object BoundedMembershipAgg {
  final class Buf(
      var overflowed: Boolean,
      var hasNull: Boolean,
      val set: java.util.HashSet[java.lang.Long])

  def boundedMembership(id: Column, cap: Int): Column =
    GraftBridge.column(
      BoundedMembershipAgg(GraftBridge.expression(id), cap)
        .toAggregateExpression())
}
