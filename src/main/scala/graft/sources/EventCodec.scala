package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.exprs._

/** Columnar borsh-style trade-event codec (SURVEY §2 A13).
  *
  * The reference parses DEX trade events by matching an 8-byte
  * discriminator and then reading little-endian fields at fixed offsets
  * (reference `src/streaming/event_parser/protocols/pumpfun/parser.rs:20-35`
  * dispatches on `discriminators::BUY_IX` etc.). Here the same wire format
  * is decoded by codegen'd column expressions over a `binary` column —
  * vectorized across the whole partition instead of row callbacks.
  *
  * Layout (41 bytes, all LE):
  *   [0..8)   discriminator
  *   [8..16)  event_id   u64
  *   [16..24) user_id    u64
  *   [24..32) ts_us      i64 (event time, micros)
  *   [32]     is_buy     u8
  *   [33..41) amount     u64 (cents)
  */
object EventCodec {
  val Discriminator: Array[Byte] =
    Array(0x67, 0x72, 0x61, 0x66, 0x74, 0x01, 0x02, 0x03).map(_.toByte)

  /** Encode events rows into the wire format (test/round-trip path). */
  def encodeTrade(events: DataFrame): DataFrame =
    events.withColumn("payload", concat(
      lit(Discriminator),
      le_bytes(col("event_id"), 8),
      le_bytes(col("user_id"), 8),
      le_bytes(expr("unix_micros(ts)"), 8),
      when(col("event_type") === "purchase", lit(Array(1.toByte)))
        .otherwise(lit(Array(0.toByte))),
      le_bytes(expr("cast(round(value * 100, 0) as bigint)"), 8)))

  /** Decode the wire format; rows with a foreign discriminator are dropped,
    * mirroring the reference's discriminator dispatch. */
  def decodeTrade(df: DataFrame, payload: String = "payload"): DataFrame =
    df.filter(expr(s"substring($payload, 1, 8)") === lit(Discriminator))
      .select(
        le_long(col(payload), 8).as("event_id"),
        le_long(col(payload), 16).as("user_id"),
        le_long(col(payload), 24).as("ts_us"),
        expr(s"cast(substring($payload, 33, 1) = X'01' as int)").as("is_buy"),
        le_long(col(payload), 33).as("amount_cents"))
}
