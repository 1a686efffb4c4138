package graft

import org.apache.spark.sql.SparkSession

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

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeQ(name: String, reps: Int = 3): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(name)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name: min=${ts.min}%.2f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val qs = if (args.nonEmpty) args.toSeq else Seq("q_ann_pq_topk")
    qs.foreach(q => timeQ(q))
    spark.stop()
  }
}
