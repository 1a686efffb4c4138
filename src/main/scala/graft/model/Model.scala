package graft.model

/** Typed data model (SURVEY §3) mirroring the reference's event envelope
  * and payloads (`event_parser/common/types.rs:300-315` EventMetadata;
  * `protocols/pumpfun/events.rs:183-228` trade payload). Case classes get
  * Spark `Encoder`s for free, so pipelines can move between untyped
  * DataFrames (dynamic schemas, oracle queries) and `Dataset[T]` (typed
  * business logic) without copying.
  */
final case class EventMeta(
    signature: String,
    slot: Long,
    blockTimeMs: Long,
    recvUs: Long,
    protocol: String,
    eventType: String,
    outerIndex: Long,
    innerIndex: Option[Long])

/** Simplified decoded trade (the wire shape of EventCodec). */
final case class Trade(
    event_id: Long,
    user_id: Long,
    ts_us: Long,
    is_buy: Int,
    amount_cents: Long)

final case class CreateToken(
    name: String,
    symbol: String,
    uri: String,
    mintHex: String,
    timestamp: Long,
    tokenTotalSupply: Long)

final case class BlockMeta(slot: Long, parentSlot: Long, blockTimeMs: Long)

final case class OhlcBar(
    hb: Long, event_type: String, open: Double, close: Double,
    high: Double, low: Double, n: Long, volume: Double)

final case class SessionSummary(
    user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, total_value: Double)
