package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.exprs._

/** Instruction-level decode with account-table resolution (SURVEY §2 A52).
  *
  * The reference's RaydiumAmmV4 parser is instruction-driven, not
  * log-driven: each instruction carries a small LE data blob plus a list
  * of *indexes into the transaction's account-key table*, and the decoder
  * reads amounts from the blob while resolving named accounts
  * positionally (`raydium_amm_v4/parser.rs:19-39` routes on the data
  * discriminator; `parse_withdraw_instruction` reads `amount` from data
  * and `accounts[0..22]` for the pubkeys; every parse length-checks both
  * `data` and `accounts`).
  *
  * Spark-first re-expression: a transaction is one row with
  * `account_keys: array<binary>` and
  * `instructions: array<struct<event_id, data, accounts>>`; the decode is
  * `posexplode` + codegen'd LE reads over `data` +
  * `element_at(account_keys, idx + 1)` for each named account — nested
  * arrays and positional resolution stay columnar, no per-row callback.
  * Malformed instructions (short blob / wrong discriminator / index out
  * of range) drop out via the same guards the reference applies.
  */
object InstructionCodec {

  /** Wire discriminator for the synthetic "swap" instruction. */
  private val SwapDisc: Array[Byte] =
    Array[Byte](0x67, 0x72, 0x59, 0x01, 0x00, 0x00, 0x00, 0x00)

  /** data blob: [8B disc][u64 event_id][u64 value_cents][u64 ts_us]. */
  private val MinLen = 32

  /** 32-byte deterministic pubkey for a user id (same derivation the
    * registry's b32 fields use). */
  private def ukeyBytes(userCol: String) = expr(
    s"unhex(concat(md5(cast(cast($userCol as string) as binary)), " +
      s"md5(cast(cast($userCol + 1 as string) as binary))))")

  /** Pack the flat event table into nested transactions: 8 events per tx
    * (`event_id div 8`), the tx's account-key table = the distinct user
    * pubkeys sorted by user id, one instruction per event whose
    * `accounts` list is [this event's user index, 0] — index 0 (the
    * minimum-user key) plays the fixed "authority" slot every reference
    * layout reserves at a known position. */
  def packTransactions(events: DataFrame): DataFrame = {
    val ev = events.select(
      expr("event_id div 8").as("tx_id"),
      col("event_id"),
      col("user_id"),
      expr("cast(round(value * 100, 0) as bigint)").as("value_cents"),
      expr("unix_micros(ts)").as("ts_us"),
      ukeyBytes("user_id").as("ukey"))
    // per-tx account table, sorted by user id so indexes are deterministic
    val accounts = ev.groupBy("tx_id").agg(
      sort_array(collect_set(struct(col("user_id"), col("ukey"))))
        .as("acct"))
    val withIdx = ev.join(accounts, "tx_id").select(
      col("tx_id"),
      col("event_id"),
      col("acct"),
      // 0-based index of this event's user in the account table
      (expr("array_position(acct.user_id, user_id)").cast("int") - 1)
        .as("user_idx"),
      col("value_cents"), col("ts_us"))
    val instr = withIdx.select(
      col("tx_id"), col("acct"),
      struct(
        col("event_id"),
        concat(lit(SwapDisc), le_bytes(col("event_id"), 8),
          le_bytes(col("value_cents"), 8), le_bytes(col("ts_us"), 8))
          .as("data"),
        array(col("user_idx"), lit(0)).as("accounts")).as("ins"))
    instr.groupBy("tx_id").agg(
      first(col("acct")).as("acct"),
      sort_array(collect_list(col("ins"))).as("instructions"))
      .select(col("tx_id"), col("acct.ukey").as("account_keys"),
        col("instructions"))
  }

  /** Flatten + decode: one row per instruction, LE fields from the data
    * blob, named accounts resolved through the key table. Guards mirror
    * the reference: discriminator match, data length, account index in
    * range. */
  def flattenDecode(txs: DataFrame): DataFrame =
    txs.select(col("tx_id"), col("account_keys"),
        posexplode(col("instructions")).as(Seq("instr_idx", "ins")))
      .filter(
        expr(s"octet_length(ins.data) >= $MinLen") &&
          expr("substring(ins.data, 1, 8)") === lit(SwapDisc) &&
          expr("ins.accounts[0]") >= 0 &&
          expr("ins.accounts[0]") < size(col("account_keys")))
      .select(
        col("tx_id"),
        col("instr_idx"),
        le_long(expr("ins.data"), 8).as("event_id"),
        lower(hex(element_at(col("account_keys"),
          expr("ins.accounts[0]").cast("int") + 1))).as("user_hex"),
        lower(hex(element_at(col("account_keys"),
          expr("ins.accounts[1]").cast("int") + 1))).as("authority_hex"),
        le_long(expr("ins.data"), 16).as("value_cents"),
        le_long(expr("ins.data"), 24).as("ts_us"))
}
