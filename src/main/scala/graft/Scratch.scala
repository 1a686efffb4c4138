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

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir)
    val grams = operators.Dedup.withTrigrams(docs)
    import org.apache.spark.sql.functions._
    time("grams")(grams.write.format("noop").mode("overwrite").save())
    val g = grams.select(col("doc_id"), explode(col("grams")).as("g"))
      .select(col("doc_id"), expr("xxhash64(g)").as("h0"))
    time("g_h0")(g.write.format("noop").mode("overwrite").save())
    val hashed = g
      .select(col("doc_id"), col("h0"),
        explode(expr("sequence(0, 63)")).as("j"))
      .select(col("doc_id"), col("j"), expr("xxhash64(j, h0)").as("h"))
    time("hashed")(hashed.write.format("noop").mode("overwrite").save())
    val rows = 4
    val minCols = (0 until rows)
      .map(r => min(when(col("r") === r, col("h"))).as(s"m$r"))
    val perBand = hashed
      .select(col("doc_id"), expr(s"j div $rows").as("band"),
        expr(s"j % $rows").as("r"), col("h"))
      .groupBy("doc_id", "band")
      .agg(minCols.head, minCols.tail: _*)
    time("perBand")(perBand.write.format("noop").mode("overwrite").save())
    val banded = perBand.select(col("doc_id"), col("band"),
      expr((0 until rows).map(r => s"m$r")
        .mkString("xxhash64(band, ", ", ", ")")).as("bh"))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("candidates")(candidates.write.format("noop").mode("overwrite").save())
    time("full")(operators.Dedup.minhashLsh(docs, 0.5)
      .write.format("noop").mode("overwrite").save())
    time("full2")(operators.Dedup.minhashLsh(docs, 0.5)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
