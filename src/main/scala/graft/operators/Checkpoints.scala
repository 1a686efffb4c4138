package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (PageRank rounds,
  * k-core peels, label propagation, Lloyd refinement).
  *
  * Default is `localCheckpoint`: blocks live in executor storage —
  * free of any distributed-FS round trip, the right call at local[32]
  * and for short loops. Its failure mode at cluster scale is the
  * reason for the opt-in: local checkpoint blocks are NON-REPLAYABLE,
  * so one lost executor aborts a 10-iteration PageRank at iteration 9
  * with no recovery short of rerunning from zero.
  *
  * Setting `spark.graft.reliableCheckpoint=true` (plus the standard
  * `SparkContext.setCheckpointDir`) switches every loop's truncation
  * point to a RELIABLE checkpoint: materialized to the checkpoint
  * directory, replayable after executor loss, at the cost of one
  * FS write per truncation. Results are bit-identical either way —
  * the checkpoint only pins the lineage, never the values (spec-pinned
  * in Round9OpsSpec).
  */
object Checkpoints {
  val ReliableConf = "spark.graft.reliableCheckpoint"

  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(ReliableConf).contains("true")) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true needs SparkContext.setCheckpointDir " +
        "(a durable location executors can reach) before running " +
        "iterative operators")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  /** Truncate plus ONE observed aggregate in the SAME action: the
    * metric (a convergence count, a node count for the broadcast-regime
    * decision) rides the checkpoint's own materialization job via
    * `Dataset.observe` — a codegen'd CollectMetrics pass, no UDF — so
    * iterative loops stop paying a second job per round to re-read the
    * rows they just materialized. `drop` lets probe-only columns (e.g.
    * a prev-label column the convergence count compares against) be
    * projected away AFTER the metric but BEFORE the checkpoint, so the
    * stored blocks never carry them. Both checkpoint modes run through
    * `Dataset.withAction`, which is what delivers the observed metric.
    */
  def truncateObserved(df: DataFrame,
      metric: org.apache.spark.sql.Column,
      drop: Seq[String] = Nil): (DataFrame, Long) = {
    val obs = org.apache.spark.sql.Observation()
    val out = truncate(df.observe(obs, metric.as("m")).drop(drop: _*))
    val v = obs.get("m")
    (out, if (v == null) 0L else v.asInstanceOf[Number].longValue)
  }
}
