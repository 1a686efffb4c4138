package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed storage layout: pre-shuffle a table ONCE at write time so that
  * every later join or aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB the dominant cost of a fact-fact join (events ⋈ events,
  * events ⋈ wallet-state) is the exchange of both sides. Writing the fact
  * bucketed by the join key (`bucketBy`) records the hash-partitioning in
  * the catalog; Spark's scan then reports the clustered distribution and
  * the planner drops the Exchange on BOTH sides — the shuffle is paid once
  * at ingest, amortized over every downstream query. `sortBy` within
  * buckets additionally lets sort-merge joins skip their sorts.
  *
  * The reference keeps its per-wallet state co-located in-process
  * (dashmap keyed by wallet, `common/event_processor.rs`); bucketing is
  * the storage-level analog for a cluster: same key → same bucket file →
  * same task, no data movement at query time.
  */
object BucketedLayout {

  /** Writes `df` as a bucketed external parquet table registered as
    * `table` (data at `path`), bucketed and bucket-sorted by `key`.
    * Queries must read it back via `spark.table(table)` — bucketing
    * metadata lives in the catalog, not the files.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
