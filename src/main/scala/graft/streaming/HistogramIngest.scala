package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming histogram-store ingest (A5c made continuous) — the
  * DETERMINISTIC sibling of [[SketchIngest]]: each micro-batch appends
  * per-(day, bucket) partial COUNTS to its own `batch_id=` partition,
  * and any range-quantile query sums stored partials. Because histogram
  * addition is exact (no sketch randomness), the streamed store answers
  * EXACTLY what the batch `EventOps.dailyValueHistograms` path answers
  * — not merely within error — which the spec pins through checkpoint
  * replay. Append-only partials make replays idempotent for free: a
  * re-run batch overwrites its own partition and nothing else. */
object HistogramIngest {

  def start(spark: SparkSession, incomingDir: String, histDir: String,
      checkpointDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1,
      bucketCents: Long = 100L): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(incomingDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(expr("unix_micros(ts) div 86400000000").as("db"),
            expr(s"cast(round(value * 100, 0) as bigint)" +
              s" div $bucketCents").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite")
          .parquet(s"$histDir/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** One row per (day, bucket) summed across batch partials — the same
    * shape `EventOps.dailyValueHistograms` produces in batch, so
    * `EventOps.quantilesFromHistograms` answers ranges over either. */
  def dailyHistograms(spark: SparkSession, histDir: String): DataFrame =
    spark.read.parquet(histDir)
      .groupBy("db", "bucket")
      .agg(sum("n").as("n"))
}
