package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // convergence probe: per-round changed-rank counts for pagerank
    val events = Tables.events(spark, sfDir)
    val edges = operators.GraphOps.coactivityEdges(events, 64)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(outdeg, "src").localCheckpoint()
    val nodes = outdeg.localCheckpoint()
    val n = nodes.count()
    val scale = 1000000000000L
    val base = (15L * scale / 100L) / n
    var ranks = nodes.select(col("src").as("node"),
      lit(scale / n).as("pr")).localCheckpoint()
    for (i <- 1 to 12) {
      val incoming = withDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum("c").as("inc"))
      val next = nodes
        .join(incoming, col("src") === col("dst"), "left_outer")
        .select(col("src").as("node"),
          (lit(base) +
            expr("(85 * coalesce(inc, cast(0 as bigint))) div 100"))
            .as("pr"))
        .localCheckpoint()
      val changed = next.as("a")
        .join(ranks.as("b"), col("a.node") === col("b.node"))
        .filter(col("a.pr") =!= col("b.pr"))
        .count()
      println(s"[scratch] round $i changed=$changed")
      ranks = next
    }
    spark.stop()
  }
}
