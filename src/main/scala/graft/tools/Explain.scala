package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of one registered query — the
  * `.explain("formatted")` audit loop (pushdown / pruning / exchange
  * reuse / codegen spans) without writing a throwaway main each time.
  *
  * Usage: `sbt "runMain graft.tools.Explain q_text_rare_tokens [sfDir]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <query-name> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
