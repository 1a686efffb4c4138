package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow,
  JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.StructType

/** Whole-operator as-of join (SURVEY §2 D10) — the one place graft plans a
  * custom physical operator instead of composing built-ins.
  *
  * The declarative formulation ([[graft.operators.AsOfJoin.asOf]]) runs the
  * carry-forward as `last(rval, ignoreNulls) OVER (ROWS UNBOUNDED
  * PRECEDING)`, and Spark's WindowExec materializes each key's row group
  * in its buffer even for running frames. For the reference workload —
  * account-state lookups where one hot account can see millions of updates
  * (`account_event_parser` + dashmap cache) — that buffer IS the skew
  * problem.
  *
  * This operator instead asks the planner for exactly the distribution +
  * ordering the merge needs (hash-cluster by key, sort by (key, ts, kind,
  * id)) and then streams each partition once, carrying one cached right
  * row — O(1) state per key, no per-group buffering, spill-free regardless
  * of key skew. Same shuffle count as the window formulation (one), same
  * tie semantics (right rows at equal ts are visible: kind 0 sorts first).
  */
case class AsOfMergePlan(
    keyName: String, tsName: String, idName: String,
    asofAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ asofAttr
  override def producedAttributes: AttributeSet = AttributeSet(asofAttr)
  // the merge consumes every child column (key/ts/kind/id drive the scan,
  // the full row is re-emitted) — declaring them keeps ColumnPruning from
  // stripping kind/rval out from under the physical operator
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): AsOfMergePlan =
    copy(child = c)
}

object AsOfMergeStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfMergePlan =>
      AsOfMergeExec(p.keyName, p.tsName, p.idName, p.asofAttr,
        planLater(p.child)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeExec(
    keyName: String, tsName: String, idName: String,
    asofAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  private def attr(n: String): Attribute =
    child.output.find(_.name == n).getOrElse(
      throw new IllegalStateException(s"as-of merge child lacks column $n"))

  override def output: Seq[Attribute] = child.output :+ asofAttr

  /** The planner inserts the one hash exchange + in-partition sort. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(attr(keyName))))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(attr(keyName), Ascending),
      SortOrder(attr(tsName), Ascending),
      SortOrder(attr("kind"), Ascending),
      SortOrder(attr(idName), Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val kIdx = child.output.indexWhere(_.name == keyName)
    val kindIdx = child.output.indexWhere(_.name == "kind")
    val rvalIdx = child.output.indexWhere(_.name == "rval")
    val keyType = child.output(kIdx).dataType
    val nRvalFields =
      child.output(rvalIdx).dataType.asInstanceOf[StructType].size
    child.execute().mapPartitions({ iter =>
      // linear merge: one cached right row per in-flight key — O(1) state
      var started = false
      var curKey: Any = null
      var lastRight: InternalRow = null
      val appended = new GenericInternalRow(1)
      val joined = new JoinedRow
      iter.flatMap { row =>
        val k = row.get(kIdx, keyType)
        if (!started || k != curKey) {
          started = true
          curKey = InternalRow.copyValue(k)
          lastRight = null
        }
        if (row.getInt(kindIdx) == 0) {
          // right side: remember the latest state, emit nothing
          lastRight =
            if (row.isNullAt(rvalIdx)) null
            else row.getStruct(rvalIdx, nRvalFields).copy()
          None
        } else {
          appended.update(0, lastRight)
          Some(joined(row, appended))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): AsOfMergeExec =
    copy(child = c)
}
