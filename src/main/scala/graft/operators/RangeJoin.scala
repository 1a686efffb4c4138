package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark plans a raw non-equi join as BroadcastNestedLoopJoin — O(|points|
  * × |intervals|) and a guaranteed 100 TB failure. Here intervals explode
  * to the fixed-width time buckets they cover and points map to exactly
  * one bucket, so the join is a plain shuffle equi-join on the bucket id
  * followed by the residual range predicate. With the bucket width sized
  * near the typical interval length, each interval lands in O(1) buckets
  * and candidate pairs stay proportional to true overlaps.
  *
  * The reference's analog is slot-window scoped processing (events
  * interpreted against the slot/time ranges they fall into); this is the
  * set-oriented form, usable for promo/incident windows, block ranges, or
  * session attribution.
  */
object RangeJoin {

  /** Join each point row to every interval row whose
    * `[startCol, endCol)` contains `tsCol`. Intervals with
    * `end <= start` are dropped (empty). Output = point columns +
    * interval columns. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketUs: Long = 600000000L): DataFrame = {
    val p = points.withColumn("_bucket", expr(s"$tsCol div ${bucketUs}L"))
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("_bucket", explode(expr(
        s"sequence($startCol div ${bucketUs}L, ($endCol - 1) div ${bucketUs}L)")))
    p.join(i, "_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }
}
