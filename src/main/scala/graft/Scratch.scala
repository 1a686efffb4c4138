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

    val docs = Tables.documents(spark, sfDir)
    locally {
      val grams0 = operators.Dedup.withTrigrams(docs)
      val g0 = grams0.select(col("doc_id"), explode(col("grams")).as("g"))
        .select(col("doc_id"), expr("xxhash64(g)").as("h0"))
      println(s"[scratch] gram rows: ${g0.count()}")
      time("g0_count2")(g0.count())
      time("g0_noop")(noop(g0))
      val gplain = grams0.select(col("doc_id"), explode(col("grams")).as("g"))
      time("gplain_noop")(noop(gplain))
      time("repart")(noop(g0.repartition(32, col("doc_id"))))
      val gramsM = grams0.localCheckpoint()
      val gM = gramsM.select(col("doc_id"), explode(col("grams")).as("g"))
      time("explode_after_ckpt")(noop(gM))
      time("explode_after_ckpt2")(noop(gM))
      println("[scratch] PLAN:\n" + gplain.queryExecution.executedPlan.toString.take(3000))
      time("plain_min")(noop(g0.groupBy("doc_id").agg(min("h0"))))
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      val s0 = g0.groupBy("doc_id")
        .agg(functions.MinHashAgg.minhash(col("h0"), 64).as("sig"))
      time("sigs_hithresh")(noop(s0))
      time("sigs_hithresh2")(noop(s0))
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    }
    val grams = operators.Dedup.withTrigrams(docs)
    time("grams")(noop(grams))
    time("grams2")(noop(grams))
    val g = grams.select(col("doc_id"), explode(col("grams")).as("g"))
      .select(col("doc_id"), expr("xxhash64(g)").as("h0"))
    val sigs = g.groupBy("doc_id")
      .agg(functions.MinHashAgg.minhash(col("h0"), 64).as("sig"))
    time("sigs")(noop(sigs))
    val banded = sigs
      .select(col("doc_id"), col("sig"),
        explode(expr("sequence(0, 15)")).as("band"))
      .select(col("doc_id"), col("band"),
        expr("xxhash64(band, slice(sig, band * 4 + 1, 4))").as("bh"))
    time("banded")(noop(banded))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("candidates")(noop(candidates))
    val full = operators.Dedup.minhashLsh(docs, 0.5)
    time("full")(noop(full))
    time("full2")(noop(full))
    time("full3")(noop(full))
    spark.stop()
  }
}
