package graft

import org.apache.spark.sql.SparkSession

/** One-call entry point for a graft-ready session: a user of the
  * reference library gets the whole engine — SQL functions, optimizer
  * rules, the custom as-of strategy, and the conventions every operator
  * assumes (UTC, nanos-as-long parquet reads, AQE with skew handling) —
  * from a single builder. Existing sessions can be upgraded in place
  * with [[attach]].
  */
object Graft {

  /** Build a session wired for graft. `shufflePartitions` should track
    * cluster parallelism (cores locally, 2-3x executor cores at scale).
    */
  def session(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", classOf[plans.GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    attach(s)
    s
  }

  /** Upgrade an existing session in place (idempotent): registers the
    * graft_* SQL functions and installs the planner strategy. Optimizer
    * rules injected via extensions need [[session]]; the rewrite-based
    * operators fall back to their explicit formulations without them.
    */
  def attach(spark: SparkSession): Unit =
    plans.GraftExtensions.register(spark)
}
