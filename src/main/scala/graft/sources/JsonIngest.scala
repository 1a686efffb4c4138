package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema'd semi-structured event ingest (SURVEY §2 A28).
  *
  * The reference ingests protobuf frames over gRPC and hand-decodes them;
  * the Spark-native analog for text wire formats is an explicit schema +
  * `from_json` with PERMISSIVE corrupt-record capture: malformed lines
  * land in `_corrupt` with every typed field null, so untrusted input can
  * never fail the job (same contract as the binary decoders' null-on-
  * malformed). Works identically over batch DataFrames and streaming
  * sources (Kafka value columns, file streams).
  */
object JsonIngest {

  /** Wire schema of one event line; `_corrupt` captures unparseable rows. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts_us", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("_corrupt", StringType)))

  /** Serialize decoded events to JSON lines (test/round-trip path). */
  def toJsonLines(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      col("event_id"), expr("unix_micros(ts)").as("ts_us"), col("user_id"),
      col("event_type"), col("value"))).as("line"))

  /** Parse JSON lines with the explicit schema; corrupt rows survive with
    * `_corrupt` set and typed fields null. */
  def fromJsonLines(lines: DataFrame, lineCol: String = "line"): DataFrame =
    lines
      .select(from_json(col(lineCol), eventSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("ev"))
      .select(col("ev.event_id").as("event_id"), col("ev.ts_us").as("ts_us"),
        col("ev.user_id").as("user_id"),
        col("ev.event_type").as("event_type"), col("ev.value").as("value"),
        col("ev._corrupt").as("_corrupt"))
}
