package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming curation ingest (C25 made continuous): micro-batches of
  * incoming documents are exact-deduped within the batch, then against
  * the STANDING corpus via its digest table, and only the survivors are
  * appended — corpus bodies are never re-read, only 16-byte digests.
  * This is the always-on form of [[graft.operators.Dedup.incrementalDedup]]:
  * the reference keeps a signature cache in front of its callbacks
  * (`event_processor.rs` dedup); a training-data pipeline keeps the same
  * cache as a digest table in front of its corpus.
  *
  * foreachBatch supplies the read-check-append transaction per trigger;
  * the checkpoint makes ingest restartable (each incoming file processed
  * exactly once — see the A18b spec).
  */
object CurationIngest {

  def start(spark: SparkSession, incomingDir: String, corpusDir: String,
      digestDir: String, checkpointDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(incomingDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // within-batch exact dedup, deterministic keeper (min doc_id)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("dig").orderBy("doc_id")
        val batchUnique = batch
          .withColumn("dig", md5(col("text").cast("binary")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        // standing-corpus check: anti-join the digest table only
        val standing = existingDigests(s, digestDir)
        val fresh = (standing match {
          case Some(d) => batchUnique.join(d, Seq("dig"), "left_anti")
          case None => batchUnique
        }).localCheckpoint() // freeze before the two writes below
        fresh.drop("dig").write.mode("append").parquet(corpusDir)
        fresh.select("dig").write.mode("append").parquet(digestDir)
        ()
      }
      .start()
  }

  private def existingDigests(
      spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(
        ".parquet")))
      Some(spark.read.parquet(dir))
    else None
  }
}
