package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc diagnosis runner: replays the bench sequence with a watchdog
  * that dumps all thread stacks if a query exceeds the threshold. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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

    @volatile var current = ""
    @volatile var started = 0L
    val watchdog = new Thread(() => {
      while (true) {
        Thread.sleep(1000)
        val name = current
        if (name.nonEmpty && System.nanoTime() - started > 5e9) {
          println(s"== WATCHDOG: $name running > 5s, dumping stacks ==")
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (st.nonEmpty && !t.getName.contains("watchdog")) {
              println(s"-- ${t.getName} state=${t.getState}")
              st.take(12).foreach(f => println(s"   $f"))
            }
          }
          current = "" // one dump per query
        }
      }
    }, "graft-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()

    graft.Bench.headline.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      started = System.nanoTime()
      current = name
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - started) / 1e9
      current = ""
      println(f"TIMED $name $el%.2fs")
    }
    spark.stop()
  }
}
