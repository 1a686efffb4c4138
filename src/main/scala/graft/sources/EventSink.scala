package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Production storage layout for decoded event history (SURVEY §5).
  *
  * Events are written date-partitioned and time-sorted within files:
  * partition pruning turns "last N days" queries into a directory listing
  * (no 100 TB scan), and the within-file sort gives parquet min/max
  * row-group statistics on `ts`/`event_id` for fine-grained skipping. One
  * output file per (date, bucket) keeps file count bounded at high
  * partition counts — `buckets` sizes files, not parallelism.
  */
object EventSink {

  /** Write events partitioned by event date. */
  def writePartitionedByDay(
      events: DataFrame, path: String, buckets: Int = 8): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(buckets, col("event_date"),
        pmod(col("event_id"), lit(buckets)))
      .sortWithinPartitions("event_date", "ts", "event_id")
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(path)

  /** Read the partitioned layout back (date filters prune directories). */
  def readPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
