package graft.tools

/** Write SparkEntry.oracleSql as oracle_sql.json without running any
  * query — lets a multi-pass scale sweep (sf100 runs Verify in chunks
  * to bound heap/disk) assemble ONE oracle file covering every dumped
  * result, instead of whichever subset the last Verify pass filtered.
  * Usage: runMain graft.tools.DumpOracles <outFile> [namesCsv]
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val only = args.lift(1).map(_.split(",").map(_.trim).toSet)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote $out")
  }
}
