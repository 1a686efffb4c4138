package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming sketch-store ingest (A26c made continuous): each
  * micro-batch contributes per-day PARTIAL HLL sketches of its wallets,
  * and any day-range distinct count is answered by unioning stored
  * partials — the raw events are never re-scanned.
  *
  * The store is append-only partials, not read-modify-write state: a
  * batch writes exactly one `batch_id=<n>` partition (overwrite), so a
  * replayed batch after a crash converges instead of double-counting,
  * and the writer never touches another batch's files — there is no
  * merge step to crash in the middle of (the merge happens at READ
  * time, where sketch-union associativity makes partial order
  * irrelevant). `compact` folds all partials into one partition when
  * the store accumulates enough batches that read-time unions dominate
  * — the same roll-up contract as `EventSink.compactPartitions`.
  *
  * This is the reference's windowed metrics state (`metrics.rs`
  * per-window counters) rebuilt as mergeable-sketch state: bounded
  * bytes per (day, batch) regardless of event volume.
  */
object SketchIngest {

  def start(spark: SparkSession, incomingDir: String, sketchDir: String,
      checkpointDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1, lgK: Int = 12): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(incomingDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(expr("unix_micros(ts) div 86400000000").as("db"))
          .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"),
            count(lit(1)).as("n_events"))
          .write.mode("overwrite")
          .parquet(s"$sketchDir/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** One sketch row per day, unioned across all batch partials — the
    * same shape `EventOps.dailyUserSketches` produces in batch, so
    * `EventOps.usersFromSketches` answers ranges over either. */
  def dailySketches(spark: SparkSession, sketchDir: String): DataFrame =
    spark.read.parquet(sketchDir)
      .groupBy("db")
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"),
        sum("n_events").as("n_events"))

  /** Fold all batch partials into a single `batch_id=compacted`
    * partition; read-time unions afterwards touch one file per day. */
  def compact(spark: SparkSession, sketchDir: String): Unit = {
    val folded = dailySketches(spark, sketchDir).localCheckpoint()
    val p = new Path(sketchDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = fs.listStatus(p).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("batch_id="))
    folded.write.mode("overwrite")
      .parquet(s"$sketchDir/batch_id=compacted")
    old.filter(_.getPath.getName != "batch_id=compacted")
      .foreach(st => fs.delete(st.getPath, true))
  }
}
