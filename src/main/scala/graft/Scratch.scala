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
      // memory-sink Complete-mode results collect to the driver; the
      // sf10 session table overflows the 1g default (oracle surface
      // only — production streams write to real sinks, never memory)
      .config("spark.driver.maxResultSize", "8g")
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
    if (qs == Seq("wash_profile")) washProfile(spark, sfDir)
    else qs.foreach(q => timeQ(q))
    spark.stop()
  }

  private def washProfile(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wash] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ev = Tables.events(spark, sfDir)
    if (sys.env.contains("WASH_OP_ONLY")) {
      val sides0 = ev.filter(col("event_type").isin("purchase", "view"))
        .groupBy(expr("unix_micros(ts) div 3600000000").as("mb"),
          col("user_id"))
        .agg(count(when(col("event_type") === "purchase", 1)).as("nb"),
          count(when(col("event_type") === "view", 1)).as("ns"))
        .localCheckpoint()
      sides0.count()
      def topSide(n: org.apache.spark.sql.Column, out: String) =
        sides0.filter(n > 0)
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("mb"))
              .orderBy(n.desc, col("user_id"))))
          .filter(col("rk") <= 1024)
          .select(col("mb"), col("user_id").as(out))
      val joinOnly = topSide(col("nb"), "bu")
        .join(topSide(col("ns"), "se"), Seq("mb"))
        .filter(col("bu") =!= col("se"))
      timed("windowed join count 1")(println(joinOnly.count()))
      timed("windowed join count 2")(println(joinOnly.count()))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = sc.stageInfo
            val wall = for {
              s <- si.submissionTime; c <- si.completionTime
            } yield (c - s) / 1000.0
            println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
              f"wall=${wall.getOrElse(-1.0)}%.1f s  ${si.name.take(60)}")
          }
        })
      val op = operators.EventOps.washPairs(ev)
      timed("operator fresh 1")(
        op.write.format("noop").mode("overwrite").save())
      timed("operator fresh 2")(
        op.write.format("noop").mode("overwrite").save())
      return
    }
    val sides = ev.filter(col("event_type").isin("purchase", "view"))
      .groupBy(expr("unix_micros(ts) div 3600000000").as("mb"),
        col("user_id"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("nb"),
        count(when(col("event_type") === "view", 1)).as("ns"))
      .localCheckpoint()
    timed("sides")(println(sides.count()))
    val sized = sides.groupBy("mb").agg(count(lit(1)).as("c"))
      .filter(col("c") <= 1024).select("mb")
    val s = sides.join(sized, "mb")
    val buyers = s.filter(col("nb") > 0)
      .select(col("mb"), col("user_id").as("bu"))
    val sellers = s.filter(col("ns") > 0)
      .select(col("mb"), col("user_id").as("se"))
    val joined = buyers.join(sellers, Seq("mb"))
      .filter(col("bu") =!= col("se"))
    timed("join count")(println(joined.count()))
    val agg = joined
      .select(least(col("bu"), col("se")).as("wallet_a"),
        greatest(col("bu"), col("se")).as("wallet_b"),
        (col("bu") < col("se")).as("is_ab"))
      .groupBy("wallet_a", "wallet_b")
      .agg(count(when(col("is_ab"), 1)).as("hours_ab"),
        count(when(!col("is_ab"), 1)).as("hours_ba"))
      .filter(col("hours_ab") >= 1 && col("hours_ba") >= 1)
    timed("full agg 1")(
      agg.write.format("noop").mode("overwrite").save())
    timed("full agg 2")(
      agg.write.format("noop").mode("overwrite").save())
    val paired = joined
      .select(least(col("bu"), col("se")).as("wallet_a"),
        greatest(col("bu"), col("se")).as("wallet_b"),
        (col("bu") < col("se")).as("is_ab"))
    val aggRepart = paired
      .repartition(256, col("wallet_a"), col("wallet_b"))
      .groupBy("wallet_a", "wallet_b")
      .agg(count(when(col("is_ab"), 1)).as("hours_ab"),
        count(when(!col("is_ab"), 1)).as("hours_ba"))
      .filter(col("hours_ab") >= 1 && col("hours_ba") >= 1)
    timed("repart-first agg 1")(
      aggRepart.write.format("noop").mode("overwrite").save())
    timed("repart-first agg 2")(
      aggRepart.write.format("noop").mode("overwrite").save())
    val aggRepart32 = paired
      .repartition(32, col("wallet_a"), col("wallet_b"))
      .groupBy("wallet_a", "wallet_b")
      .agg(count(when(col("is_ab"), 1)).as("hours_ab"),
        count(when(!col("is_ab"), 1)).as("hours_ba"))
      .filter(col("hours_ab") >= 1 && col("hours_ba") >= 1)
    timed("repart32 agg 1")(
      aggRepart32.write.format("noop").mode("overwrite").save())
    timed("repart32 agg 2")(
      aggRepart32.write.format("noop").mode("overwrite").save())
    val aggRepart1024 = paired
      .repartition(1024, col("wallet_a"), col("wallet_b"))
      .groupBy("wallet_a", "wallet_b")
      .agg(count(when(col("is_ab"), 1)).as("hours_ab"),
        count(when(!col("is_ab"), 1)).as("hours_ba"))
      .filter(col("hours_ab") >= 1 && col("hours_ba") >= 1)
    timed("repart1024 agg 1")(
      aggRepart1024.write.format("noop").mode("overwrite").save())
    timed("repart1024 agg 2")(
      aggRepart1024.write.format("noop").mode("overwrite").save())
    val op = operators.EventOps.washPairs(ev)
    timed("operator 1")(op.write.format("noop").mode("overwrite").save())
    timed("operator 2")(op.write.format("noop").mode("overwrite").save())
    op.explain("formatted")
  }
}
