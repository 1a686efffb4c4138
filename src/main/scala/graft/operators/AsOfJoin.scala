package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, attach the most recent right
  * row (at-or-before its event time) with the same key.
  *
  * Re-expresses the reference's account-state lookup pattern (an event is
  * interpreted against the latest cached account update — reference
  * `streaming/event_parser/core/account_event_parser.rs` + dashmap caches)
  * as a set-oriented operator.
  *
  * Implementation: union both sides, one shuffle on the key, sort within
  * partitions, and carry the last right-side value forward with
  * `last(..., ignoreNulls)` over a running frame. O(n log n) per key group,
  * no per-row lookups, no broadcast of the right side — scales to fact-fact
  * joins at 100 TB (the shuffle is on the join key only).
  *
  * Tie rule: right rows at the same timestamp as a left row ARE visible to
  * it (kind 0 sorts before kind 1); remaining ties break by `idCol`.
  *
  * `toleranceUs` bounds staleness: a matched right row older than the
  * tolerance is dropped (asof → null), the way a state cache treats an
  * entry past its TTL — the match still costs nothing extra, the bound is
  * a post-projection on the already-joined row.
  */
object AsOfJoin {
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightValueCols: Seq[String],
      leftValueCols: Seq[String] = Seq(),
      toleranceUs: Option[Long] = None): DataFrame = {
    val rightTagged = right.select(
      col(keyCol) +: col(tsCol) +: col(idCol) +: lit(0).as("kind") +:
        struct((tsCol +: idCol +: rightValueCols).map(col): _*).as("rval") +:
        leftValueCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      col(keyCol) +: col(tsCol) +: col(idCol) +: lit(1).as("kind") +:
        lit(null).cast(rightTagged.schema("rval").dataType).as("rval") +:
        leftValueCols.map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("kind"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = rightTagged.unionByName(leftTagged)
      .withColumn("asof", last("rval", ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
    toleranceUs.fold(joined) { tol =>
      joined.withColumn("asof",
        when(col(tsCol) - col("asof")(tsCol) <= tol, col("asof")))
    }.drop("kind", "rval")
  }

  /** The same as-of semantics through the custom whole-operator plan
    * ([[graft.plans.AsOfMergePlan]] → `AsOfMergeExec`): one planner-
    * inserted shuffle+sort, then a streaming merge with O(1) state per
    * key — no WindowExec group buffering, so a pathologically hot key
    * (the reference's busiest account) costs memory O(1) instead of
    * O(rows-per-key). Requires [[graft.plans.GraftExtensions]] (or
    * `register`) so the strategy is installed.
    */
  def asOfMerge(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightValueCols: Seq[String],
      leftValueCols: Seq[String] = Seq(),
      toleranceUs: Option[Long] = None): DataFrame = {
    // the exec detects group changes with JVM equality — exact for
    // numeric/string/UTF8 keys, wrong for array-backed types (binary
    // keys compare by reference); render such keys (base58/hex) first
    left.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.BinaryType |
          _: org.apache.spark.sql.types.ArrayType |
          _: org.apache.spark.sql.types.StructType |
          _: org.apache.spark.sql.types.MapType =>
        throw new IllegalArgumentException(
          s"asOfMerge key '$keyCol' must be an atomic comparable type; " +
            "encode binary keys (e.g. graft_base58) before joining")
      case _ =>
    }
    val rightTagged = right.select(
      col(keyCol) +: col(tsCol) +: col(idCol) +: lit(0).as("kind") +:
        struct((tsCol +: idCol +: rightValueCols).map(col): _*).as("rval") +:
        leftValueCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      col(keyCol) +: col(tsCol) +: col(idCol) +: lit(1).as("kind") +:
        lit(null).cast(rightTagged.schema("rval").dataType).as("rval") +:
        leftValueCols.map(col): _*)
    val union = rightTagged.unionByName(leftTagged)
    val asofAttr = org.apache.spark.sql.catalyst.expressions
      .AttributeReference("asof", union.schema("rval").dataType,
        nullable = true)()
    val merged = org.apache.spark.sql.GraftBridge.ofRows(left.sparkSession,
      graft.plans.AsOfMergePlan(keyCol, tsCol, idCol, asofAttr,
        union.queryExecution.analyzed))
    toleranceUs.fold(merged) { tol =>
      merged.withColumn("asof",
        when(col(tsCol) - col("asof")(tsCol) <= tol, col("asof")))
    }.drop("kind", "rval")
  }
}
