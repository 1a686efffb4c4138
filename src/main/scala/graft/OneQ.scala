package graft
object OneQ {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      val w = new java.io.PrintWriter(s"$outDir/oracle_sql.json")
      w.write(s"""{"$name": ${ujsonEscape(sql)}}""")
      w.close()
    }
    spark.stop()
  }
  private def ujsonEscape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t") + "\""
}
