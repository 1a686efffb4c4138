package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

/** Streaming curation ingest (C25 made continuous): micro-batches of
  * incoming documents are exact-deduped within the batch, then against
  * the STANDING corpus, and only the survivors are appended.
  *
  * Scale design — per trigger the standing corpus must cost O(batch),
  * not O(corpus):
  *   1. a merged Bloom filter over all admitted digests is kept as one
  *      sidecar file; membership is tested map-side against the
  *      broadcast filter bytes — rows the filter has never seen are
  *      DEFINITELY new and skip everything else;
  *   2. only probable hits (true dups + false positives) are confirmed
  *      exactly: the digest table is scanned once with the tiny suspect
  *      set broadcast into a semi-join — no shuffle of the corpus, and
  *      the scan is skipped entirely when no row hits the filter;
  *   3. the filter for the admitted rows is aggregated in one SQL pass,
  *      merged into the standing filter driver-side (sketch union), and
  *      swapped atomically.
  * This is the reference's in-memory signature cache
  * (`event_processor.rs` dedup) rebuilt as mergeable-sketch state.
  * foreachBatch + checkpoint make ingest restartable; the Bloom sidecar
  * is a pure accelerator — when it is missing or stale (crash between
  * the digest append and the sidecar swap) EVERY batch digest is
  * confirmed exactly against the digest table, so losing it costs one
  * full confirm scan, never correctness. Batch writes are idempotent:
  * each batch overwrites its own `batch_id=<n>` partition of the corpus
  * and digest tables, and the confirm scan excludes the current batch's
  * partition, so a replayed batch after a crash converges to the same
  * state instead of double-appending or losing rows. The checkpoint and
  * the corpus/digest dirs form one unit: restarting with the SAME
  * checkpoint resumes batch ids and stays idempotent; pointing a FRESH
  * checkpoint at existing output dirs restarts batch ids at 0 and would
  * overwrite them (same contract as any Spark sink path reuse).
  */
object CurationIngest {

  def start(spark: SparkSession, incomingDir: String, corpusDir: String,
      digestDir: String, checkpointDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1,
      expectedItems: Long = 10000000L, fpp: Double = 0.01): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(incomingDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // within-batch exact dedup, deterministic keeper (min doc_id)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("dig").orderBy("doc_id")
        val batchUnique = batch
          .withColumn("dig", md5(col("text").cast("binary")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .localCheckpoint()
        // standing digests, excluding this batch's own partition (a
        // replayed batch must not see its own earlier half-finished
        // writes as "already in the corpus" — that would drop the rows)
        val standing = standingDigests(s, digestDir, batchId)
        val fresh = ((standing, standingBloom(s, digestDir)) match {
          case (None, _) => batchUnique // empty corpus: everything is new
          case (Some(digests), bloom) =>
            // bloom present: gate map-side, only probable hits confirm.
            // bloom missing/stale: confirm EVERY batch digest exactly —
            // the sidecar is an accelerator, never a correctness input.
            val suspects = (bloom match {
              case Some(bloomBytes) => batchUnique.filter(
                mightContainCol(bloomBytes, xxhash64(col("dig"))))
              case None => batchUnique
            }).select("dig").localCheckpoint()
            if (suspects.isEmpty) batchUnique
            else {
              // exact confirm: one pruned scan of the digest table with
              // the tiny suspect set broadcast — no corpus shuffle
              val confirmed = digests
                .join(broadcast(suspects), Seq("dig"), "left_semi")
              batchUnique.join(broadcast(confirmed), Seq("dig"), "left_anti")
            }
        }).localCheckpoint() // freeze before the writes below
        // idempotent per-batch partitions: a replay overwrites in place
        fresh.drop("dig").write.mode("overwrite")
          .parquet(s"$corpusDir/batch_id=$batchId")
        fresh.select("dig").write.mode("overwrite")
          .parquet(s"$digestDir/batch_id=$batchId")
        mergeBloom(s, digestDir, fresh, expectedItems, fpp)
        ()
      }
      .start()
  }

  /** Digest table scan for the exact-confirm path, pruned to exclude the
    * current batch's own partition. None when the table is empty. */
  private def standingDigests(spark: SparkSession, dir: String,
      batchId: Long): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val parts = fs.listStatus(p).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("batch_id=") &&
      st.getPath.getName != s"batch_id=$batchId")
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts.map(_.getPath.toString): _*))
  }

  /** The Bloom sidecar lives next to the digest parquet; the underscore
    * name keeps the parquet reader from picking it up. */
  private def bloomPath(dir: String) = new Path(dir, "_bloom.bin")

  private def mightContainCol(bloomBytes: Array[Byte],
      hashed: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{
      BloomFilterMightContain, Literal}
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      GraftBridge.expression(hashed)))
  }

  private def bloomAggCol(expectedItems: Long, numBits: Long,
      hashed: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftBridge.column(new org.apache.spark.sql.catalyst.expressions
      .aggregate.BloomFilterAggregate(GraftBridge.expression(hashed),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
  }

  private def standingBloom(
      spark: SparkSession, dir: String): Option[Array[Byte]] = {
    val p = bloomPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(buf)
        Some(buf)
      } finally in.close()
    }
  }

  private def mergeBloom(spark: SparkSession, dir: String,
      fresh: DataFrame, expectedItems: Long, fpp: Double): Unit = {
    if (fresh.isEmpty) return
    // one SQL aggregation pass builds the batch's filter distributed;
    // the union with the standing filter is a driver-side sketch merge
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val batchBytes = fresh.select(
      bloomAggCol(expectedItems, numBits, xxhash64(col("dig"))))
      .head.getAs[Array[Byte]](0)
    val batchBloom = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(batchBytes))
    val merged = standingBloom(spark, dir) match {
      case None => batchBloom
      case Some(prev) =>
        val pb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(prev))
        pb.mergeInPlace(batchBloom)
        pb
    }
    val p = bloomPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, s"._bloom_tmp_${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try merged.writeTo(out) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }
}
