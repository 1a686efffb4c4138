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

  /** Second "protocol" discriminator: create-token events (variable-length
    * strings + pubkeys, reference `PumpFunCreateV2TokenEvent`). */
  val CreateDiscriminator: Array[Byte] =
    Array(0x67, 0x72, 0x61, 0x66, 0x74, 0x0a, 0x0b, 0x0c).map(_.toByte)

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

  private def lenPrefixed(strCol: String): org.apache.spark.sql.Column =
    concat(
      le_bytes(expr(s"cast(octet_length(cast($strCol as binary)) as bigint)"), 4),
      col(strCol).cast("binary"))

  /** Encode a create-token event (3 length-prefixed strings, 4 pubkeys,
    * 5 LE u64 fields) from columns
    * name/symbol/uri/mint/bonding_curve/user_pk/creator (binary 32) and
    * ev_ts/vtr/vsr/rtr/tts (long). */
  def encodeCreateToken(df: DataFrame): DataFrame =
    df.withColumn("payload", concat(
      lit(CreateDiscriminator),
      lenPrefixed("name"), lenPrefixed("symbol"), lenPrefixed("uri"),
      col("mint"), col("bonding_curve"), col("user_pk"), col("creator"),
      le_bytes(col("ev_ts"), 8), le_bytes(col("vtr"), 8),
      le_bytes(col("vsr"), 8), le_bytes(col("rtr"), 8),
      le_bytes(col("tts"), 8)))

  /** Decode create-token payloads via the sequential struct expression. */
  def decodeCreateToken(df: DataFrame, payload: String = "payload"): DataFrame =
    df.filter(expr(s"substring($payload, 1, 8)") === lit(CreateDiscriminator))
      .withColumn("ev", decode_create_token(col(payload)))
      .filter(col("ev").isNotNull)

  /** Append an 8-byte LE byte-sum checksum to each payload — the wire
    * framing side of the reference's `fast_checksum` integrity check
    * (`streaming/common/simd_utils.rs:183`). */
  def frameWithChecksum(
      df: DataFrame, payload: String = "payload"): DataFrame =
    df.withColumn("frame",
      concat(col(payload), le_bytes(byte_checksum(col(payload)), 8)))

  /** Validate checksummed frames: recompute the byte sum over the body
    * and compare with the stored trailer. Emits `status` ('ok'/'corrupt')
    * and the body payload — corrupt frames are reported, not thrown, like
    * every other malformed-input path in this codec. */
  def validateChecksum(df: DataFrame, frame: String = "frame"): DataFrame = {
    val body = expr(s"substring($frame, 1, octet_length($frame) - 8)")
    val stored = col(frame).substr(
      expr(s"octet_length($frame) - 7"), lit(8))
    df.withColumn("status",
        when(expr(s"octet_length($frame)") >= 9 &&
          le_long(stored, 0) === byte_checksum(body), "ok")
          .otherwise("corrupt"))
      .withColumn("payload", body)
  }

  /** Resynchronization scan (reference `simd_utils.rs:105`
    * `find_pattern_simd`): locate the trade discriminator inside an
    * unframed byte stream and slice the payload from there; rows with no
    * match resolve to null offset / null payload. */
  def resyncTrade(df: DataFrame, stream: String = "stream"): DataFrame = {
    val off = find_pattern(col(stream), lit(Discriminator))
    df.withColumn("sync_offset", off)
      .withColumn("payload",
        expr(s"substring($stream, sync_offset + 1)"))
  }

  /** Program-log payload extraction (reference
    * `event_parser/common/utils.rs:17-26` `extract_program_data` /
    * `extract_program_log`): event payloads arrive base64-wrapped in
    * `"Program data: <b64>"` transaction log lines; other log lines are
    * noise. One codegen'd projection: prefix test + substring + unbase64 —
    * rows without the prefix drop out before any decode runs.
    */
  def extractProgramData(
      df: DataFrame, logCol: String = "log"): DataFrame = {
    val prefix = "Program data: "
    df.filter(col(logCol).startsWith(prefix))
      .withColumn("payload",
        unbase64(expr(s"substring($logCol, ${prefix.length + 1})")))
  }

  /** Multi-protocol dispatch (reference: per-protocol parser registry
    * keyed on the instruction discriminator,
    * `event_parser/protocols/pumpfun/parser.rs:25-35`): tag each payload
    * with its event kind, decode the matching branch, pass through
    * unknown payloads as `unknown` with null bodies.
    */
  def dispatch(df: DataFrame, payload: String = "payload"): DataFrame =
    df.withColumn("event_kind",
      when(expr(s"substring($payload, 1, 8)") === lit(Discriminator), "trade")
        .when(expr(s"substring($payload, 1, 8)") === lit(CreateDiscriminator),
          "create_token")
        .otherwise("unknown"))
      .withColumn("trade",
        // length-guarded like decodeTrade: a truncated trade payload keeps
        // its kind tag but decodes to a null body (same contract as the
        // create-token decoder's null-on-malformed)
        when(col("event_kind") === "trade" &&
            expr(s"octet_length($payload)") >= 41, struct(
          le_long(col(payload), 8).as("event_id"),
          le_long(col(payload), 16).as("user_id"),
          le_long(col(payload), 24).as("ts_us"),
          expr(s"cast(substring($payload, 33, 1) = X'01' as int)").as("is_buy"),
          le_long(col(payload), 33).as("amount_cents"))))
      .withColumn("create_token",
        when(col("event_kind") === "create_token",
          decode_create_token(col(payload))))

  /** A54: decode-health accounting — the parse-failure counters the
    * reference's metrics layer keeps next to its per-type event counts
    * (malformed events are skipped, not fatal; `metrics.rs` +
    * `parser.rs` length guards). Counts per dispatched kind: rows seen
    * and rows whose body failed to decode (foreign discriminator or
    * truncated layout). One projection + one tiny-key aggregate; the
    * wire payloads never shuffle.
    */
  def decodeHealth(framed: DataFrame, payload: String = "payload")
      : DataFrame =
    dispatch(framed, payload)
      .groupBy("event_kind")
      .agg(count(lit(1)).as("n"),
        count(when(col("trade").isNull && col("create_token").isNull, 1))
          .as("n_undecodable"))

  /** Deterministic corruption for the decode-health path (tests/oracles):
    * every 101st event's discriminator is zeroed (→ unknown), every 97th
    * surviving event is truncated to 20 bytes (→ trade kind, null body —
    * the length-guard path). */
  def corrupt(framed: DataFrame, payload: String = "payload"): DataFrame =
    framed.withColumn(payload,
      when(col("event_id") % 101 === 0,
        concat(lit(Array[Byte](0)), expr(s"substring($payload, 2)")))
        .when(col("event_id") % 97 === 0,
          expr(s"substring($payload, 1, 20)"))
        .otherwise(col(payload)))

  /** Typed view over decoded trades (Dataset[Trade] with a case-class
    * Encoder) for type-safe downstream logic. */
  def trades(df: DataFrame, payload: String = "payload")
      : org.apache.spark.sql.Dataset[graft.model.Trade] = {
    val spark = df.sparkSession
    import spark.implicits._
    decodeTrade(df, payload).as[graft.model.Trade]
  }

  /** Decode the wire format; rows with a foreign discriminator are dropped,
    * mirroring the reference's discriminator dispatch. Truncated payloads
    * (valid discriminator but fewer than the 41 layout bytes) are skipped
    * too — the reference length-checks every read and drops malformed
    * events (`protocols/pumpfun/parser.rs:120-154`), and untrusted wire
    * data must never be able to fail the job. */
  def decodeTrade(df: DataFrame, payload: String = "payload"): DataFrame =
    df.filter(expr(s"substring($payload, 1, 8)") === lit(Discriminator) &&
        expr(s"octet_length($payload)") >= 41)
      .select(
        le_long(col(payload), 8).as("event_id"),
        le_long(col(payload), 16).as("user_id"),
        le_long(col(payload), 24).as("ts_us"),
        expr(s"cast(substring($payload, 33, 1) = X'01' as int)").as("is_buy"),
        le_long(col(payload), 33).as("amount_cents"))
}
