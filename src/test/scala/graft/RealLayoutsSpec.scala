package graft

import org.apache.spark.sql.functions._

import graft.sources.{ProtocolRegistry, RealLayouts}

/** Transcription audit for the real protocol registry: layout byte
  * widths must equal the reference's declared LOG_SIZE constants, and
  * every field kind must round-trip encode→dispatch→decode. */
class RealLayoutsSpec extends TestSparkSession {

  private def layout(spec: ProtocolRegistry.ProtocolSpec, kind: String) =
    spec.layouts.find(_.kind == kind).get

  test("layout widths match the reference LOG_SIZE constants") {
    // log bodies: discriminator(16) + borsh body size from events.rs
    val want = Seq(
      (RealLayouts.PumpFun, "pf_trade", 16 + 250), // PUMPFUN_TRADE_EVENT_LOG_SIZE
      (RealLayouts.PumpFun, "pf_migrate", 16 + 160), // PUMPFUN_MIGRATE_EVENT_LOG_SIZE
      (RealLayouts.PumpSwap, "ps_buy", 16 + 385), // PUMP_SWAP_BUY_EVENT_LOG_SIZE
      (RealLayouts.PumpSwap, "ps_sell", 16 + 352), // PUMP_SWAP_SELL_EVENT_LOG_SIZE
      (RealLayouts.PumpSwap, "ps_create_pool", 16 + 325), // CREATE_POOL_LOG_SIZE
      (RealLayouts.PumpSwap, "ps_deposit", 16 + 248), // DEPOSIT_LOG_SIZE
      (RealLayouts.PumpSwap, "ps_withdraw", 16 + 248), // WITHDRAW_LOG_SIZE
      (RealLayouts.Bonk, "bonk_trade", 16 + 139), // BONK_TRADE_EVENT_LOG_SIZE
      (RealLayouts.MeteoraDammV2, "damm_swap", 16 + 180), // METEORA_DAMM_V2_SWAP_EVENT_LOG_SIZE
      (RealLayouts.PumpFunAccounts, "pf_bonding_curve", 8 + 74), // BONDING_CURVE_SIZE
      (RealLayouts.CpmmAccounts, "cpmm_amm_config", 8 + 228), // AMM_CONFIG_SIZE
      (RealLayouts.CpmmAccounts, "cpmm_pool_state", 8 + 629), // POOL_STATE_SIZE
      (RealLayouts.BonkAccounts, "bonk_vesting_record", 8 + 40)) // VestingSchedule
    for ((spec, kind, len) <- want)
      assert(layout(spec, kind).minLen == len,
        s"$kind: got ${layout(spec, kind).minLen}, reference says $len")
  }

  test("every account protocol carries the _acct class suffix") {
    // the class-level include filter (A1b) recognizes account states by
    // the `_acct` protocol suffix — a mis-named spec would silently
    // classify account snapshots as transactions
    val bad = RealLayouts.accountRegistry.map(_.protocol)
      .filterNot(_.endsWith("_acct"))
    assert(bad.isEmpty, s"account protocols missing _acct suffix: $bad")
  }

  test("registry has no duplicate (program, discriminator) pair") {
    val all = (RealLayouts.logRegistry ++ RealLayouts.ixRegistry ++
      RealLayouts.accountRegistry)
      .flatMap(p => p.layouts.map(l =>
        (p.program, l.discriminator.toSeq) -> l.kind))
    val dup = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty, s"ambiguous dispatch: $dup")
  }

  test("pumpfun trade round-trips every field through the real bytes") {
    val src = spark.range(1, 65).select(
      (col("id") * 1000).as("sol_amount"), (col("id") * 3).as("token_amount"),
      (col("id") % 2).as("is_buy"), (col("id") * 7919).as("timestamp"),
      (col("id") * 7).as("virtual_sol_reserves"),
      (col("id") * 11).as("virtual_token_reserves"),
      (col("id") * 13).as("real_sol_reserves"),
      (col("id") * 17).as("real_token_reserves"),
      lit(100L).as("fee_basis_points"), (col("id") * 10).as("fee"),
      lit(30L).as("creator_fee_basis_points"), (col("id") * 3).as("creator_fee"),
      (col("id") % 3 === 0).cast("long").as("track_volume"),
      (col("id") * 19).as("total_unclaimed_tokens"),
      (col("id") * 23).as("total_claimed_tokens"),
      (col("id") * 29).as("current_sol_volume"),
      (col("id") * 31).as("last_update_timestamp"),
      expr("unhex(concat(md5(cast(cast(id as string) as binary)), " +
        "md5(cast(cast(id + 1 as string) as binary))))").as("mint"),
      expr("unhex(repeat('aa', 32))").as("user"),
      expr("unhex(repeat('bb', 32))").as("fee_recipient"),
      expr("unhex(repeat('cc', 32))").as("creator"),
      col("id"))
    val l = layout(RealLayouts.PumpFun, "pf_trade")
    val framed = ProtocolRegistry.encode(src, l)
    // every payload is exactly the reference's 16 + 250 bytes
    assert(framed.filter(expr("octet_length(payload)") =!= 266).count() == 0)
    val out = ProtocolRegistry.decode(framed.select("payload"), l)
    assert(out.count() == 64)
    val bad = out.filter(
      col("sol_amount") =!= col("token_amount") / 3 * 1000 ||
        !col("is_buy").isin(0, 1) ||
        col("virtual_sol_reserves") * 11 =!= col("virtual_token_reserves") * 7 ||
        col("fee_basis_points") =!= 100 ||
        expr("hex(user)") =!= "AA" * 32 ||
        col("last_update_timestamp") % 31 =!= 0)
    assert(bad.count() == 0)
  }

  test("shared TradeEvent discriminator routes by program id") {
    // PumpFun and Bonk trade logs carry the SAME 16-byte discriminator
    val pfL = layout(RealLayouts.PumpFun, "pf_trade")
    val bkL = layout(RealLayouts.Bonk, "bonk_trade")
    assert(pfL.discriminator.toSeq == bkL.discriminator.toSeq)
    val bonkSrc = spark.range(1, 33).select(
      expr("unhex(repeat('dd', 32))").as("pool_state"),
      (col("id") * 2).as("total_base_sell"), (col("id") * 3).as("virtual_base"),
      (col("id") * 5).as("virtual_quote"), (col("id") * 7).as("real_base_before"),
      (col("id") * 11).as("real_quote_before"), (col("id") * 13).as("real_base_after"),
      (col("id") * 17).as("real_quote_after"), (col("id") * 19).as("amount_in"),
      (col("id") * 23).as("amount_out"), (col("id")).as("protocol_fee"),
      (col("id")).as("platform_fee"), (col("id")).as("creator_fee"),
      (col("id")).as("share_fee"), (col("id") % 2).as("trade_direction"),
      (col("id") % 3).as("pool_status"), lit(1L).as("exact_in"))
    val bonkFrames = ProtocolRegistry.encode(bonkSrc, bkL)
      .select(col("payload"), lit(RealLayouts.BonkProgram).as("program_id"))
    // a bonk frame body is ALSO long enough to masquerade as nothing:
    // same disc, but program routes it — and a pumpfun-program frame of
    // the same bytes would decode as pf_trade only if >= 266 bytes
    val out = ProtocolRegistry.dispatch(bonkFrames,
      Seq(RealLayouts.PumpFun, RealLayouts.Bonk),
      programCol = Some("program_id"))
    assert(out.filter(col("protocol") === "bonk").count() == 32)
    assert(out.filter(col("protocol") === "pumpfun").count() == 0)
    val dec = out.filter(col("event_kind") === "bonk_trade")
      .select(col("bonk_trade.amount_in").as("ai"),
        col("bonk_trade.exact_in").as("ei"),
        col("bonk_trade.trade_direction").as("td"))
    assert(dec.filter(col("ai") % 19 =!= 0 || col("ei") =!= 1 ||
      !col("td").isin(0, 1)).count() == 0)
    // dispatch without a program column must refuse (ambiguous registry)
    intercept[IllegalArgumentException] {
      ProtocolRegistry.dispatch(bonkFrames.select("payload"),
        Seq(RealLayouts.PumpFun, RealLayouts.Bonk))
    }
  }

  test("mixed-width kinds round-trip: u16, bool, i32, u128, 1-byte disc") {
    // ps_create_pool: u16 index + u8 decimals + pool_bump mid-layout
    val cp = layout(RealLayouts.PumpSwap, "ps_create_pool")
    val cpSrc = spark.range(1, 22).select(
      (col("id") * 97).as("timestamp"), (col("id") * 300 % 65536).as("index"),
      expr("unhex(repeat('a1', 32))").as("creator"),
      expr("unhex(repeat('a2', 32))").as("base_mint"),
      expr("unhex(repeat('a3', 32))").as("quote_mint"),
      (col("id") % 10).as("base_mint_decimals"), lit(9L).as("quote_mint_decimals"),
      (col("id") * 2).as("base_amount_in"), (col("id") * 3).as("quote_amount_in"),
      (col("id") * 5).as("pool_base_amount"), (col("id") * 7).as("pool_quote_amount"),
      lit(100L).as("minimum_liquidity"), (col("id") * 11).as("initial_liquidity"),
      (col("id") * 13).as("lp_token_amount_out"), (col("id") % 256).as("pool_bump"),
      expr("unhex(repeat('a4', 32))").as("pool"),
      expr("unhex(repeat('a5', 32))").as("lp_mint"),
      expr("unhex(repeat('a6', 32))").as("user_base_token_account"),
      expr("unhex(repeat('a7', 32))").as("user_quote_token_account"),
      expr("unhex(repeat('a8', 32))").as("coin_creator"))
    val cpOut = ProtocolRegistry.decode(
      ProtocolRegistry.encode(cpSrc, cp).select("payload"), cp)
    assert(cpOut.filter(col("index") =!= col("timestamp") / 97 * 300 % 65536)
      .count() == 0)
    assert(cpOut.filter(col("quote_mint_decimals") =!= 9).count() == 0)

    // clmm_open_position_v2: negative i32 ticks + u128 liquidity
    val op = layout(RealLayouts.RaydiumClmm, "clmm_open_position_v2")
    val opSrc = spark.range(1, 22).select(
      (-col("id") * 64).cast("long").as("tick_lower_index"),
      (col("id") * 64).as("tick_upper_index"),
      (-col("id") * 640).cast("long").as("tick_array_lower_start_index"),
      (col("id") * 640).as("tick_array_upper_start_index"),
      (col("id") * 1e6.toLong).as("liquidity_lo"), lit(2L).as("liquidity_hi"),
      (col("id") * 3).as("amount0_max"), (col("id") * 5).as("amount1_max"),
      (col("id") % 2).as("with_metadata"),
      // Option<bool> tail: id%3==0 → None, else Some(id%2) — the wire
      // frame is 1 byte shorter for the None rows
      when(col("id") % 3 === 0, lit(null).cast("int"))
        .otherwise((col("id") % 2).cast("int")).as("base_flag"))
    val opOut = ProtocolRegistry.decode(
      ProtocolRegistry.encode(opSrc, op).select("payload"), op)
    assert(opOut.filter(col("tick_lower_index") >= 0).count() == 0,
      "i32 sign must survive")
    // optbool round-trip: the None rows come back null, Some rows 0/1
    assert(opOut.filter(col("base_flag").isNull).count() == 7,
      "every 3rd row must decode base_flag as borsh None")
    assert(opOut.filter(col("base_flag").isNotNull &&
        col("base_flag") =!= col("tick_upper_index") / 64 % 2)
      .count() == 0, "Some(bool) value must survive the round-trip")

    // ps_create_pool_ix: optional un-tagged coin_creator tail — absent
    // frames (26 bytes) decode to Pubkey::default() zeros, present
    // frames (58 bytes) round-trip the pubkey
    val cpl = layout(RealLayouts.PumpSwapIx, "ps_create_pool_ix")
    val cplSrc = spark.range(1, 21).select(
      (col("id") % 65536).as("index"),
      (col("id") * 11).as("base_amount_in"),
      (col("id") * 13).as("quote_amount_in"),
      when(col("id") % 2 === 0, expr("unhex(repeat('c7', 32))"))
        .otherwise(lit(null).cast("binary")).as("coin_creator"))
    val cplOut = ProtocolRegistry.decode(
      ProtocolRegistry.encode(cplSrc, cpl).select("payload"), cpl)
    assert(cplOut.count() == 20, "both wire widths must pass the guard")
    assert(cplOut.filter(col("base_amount_in") % 2 === 0 &&
        col("coin_creator") =!= expr("unhex(repeat('c7', 32))"))
      .count() == 0, "present coin_creator must survive")
    assert(cplOut.filter(col("base_amount_in") % 2 =!= 0 &&
        col("coin_creator") =!= expr("unhex(repeat('00', 32))"))
      .count() == 0, "absent coin_creator must decode as default zeros")
    // u128 = hi * 2^64 + lo as Decimal(38,0)
    val wantLiq = opOut.filter(col("liquidity") =!=
      (col("tick_upper_index").cast("decimal(38,0)") / 64 * 1000000L +
        expr("cast(2 as decimal(38,0)) * cast(18446744073709551616 as decimal(38,0))")))
    assert(wantLiq.count() == 0, "u128 lo/hi must reassemble")

    // compute budget: 1-byte discriminators
    val lim = layout(RealLayouts.ComputeBudget, "set_compute_unit_limit")
    val pri = layout(RealLayouts.ComputeBudget, "set_compute_unit_price")
    val limFrames = ProtocolRegistry.encode(
      spark.range(1, 11).select((col("id") * 1000).as("units")), lim)
    val priFrames = ProtocolRegistry.encode(
      spark.range(1, 11).select((col("id") * 5000).as("micro_lamports")), pri)
    val cb = ProtocolRegistry.dispatch(
      limFrames.select("payload").union(priFrames.select("payload")),
      Seq(RealLayouts.ComputeBudget.copy(program = null)))
    assert(cb.filter(col("event_kind") === "set_compute_unit_limit")
      .count() == 10)
    assert(cb.filter(col("event_kind") === "set_compute_unit_price")
      .count() == 10)
    assert(cb.filter(col("event_kind") === "set_compute_unit_limit")
      .filter(col("set_compute_unit_limit.units") % 1000 =!= 0).count() == 0)
  }

  test("every field kind round-trips across hash-derived value ranges") {
    // 512 rows of xxhash64-derived values exercise the full width of
    // each kind: u8/u16/u32 boundaries, negative i32/i64, u64 above
    // 2^63 (negative long bit pattern), u128 via lo/hi halves, bool,
    // pubkey bytes, mid-layout padding and a trailing string
    import graft.sources.ProtocolRegistry
    import graft.sources.ProtocolRegistry.{borsh, LayoutSpec}
    val l = LayoutSpec("kinds", Array(0xAB.toByte), borsh(1,
      "a_u8" -> "u8", "b_u16" -> "u16", "c_u32" -> "u32",
      "d_i32" -> "i32", "key" -> "u64", "f_i64" -> "i64",
      "g_bool" -> "bool", "h_b32" -> "b32", "p" -> "pad:5",
      "i_u128" -> "u128", "s" -> "str"))
    val src = spark.range(0, 512).select(
      (abs(xxhash64(col("id"))) % 256).as("a_u8"),
      (abs(xxhash64(col("id") + 1)) % 65536).as("b_u16"),
      (abs(xxhash64(col("id") + 2)) % 4294967296L).as("c_u32"),
      // sign-preserving modulo keeps the full signed i32 range without
      // an ANSI overflow cast
      (xxhash64(col("id") + 3) % 2147483648L).as("d_i32"),
      col("id").as("key"),
      xxhash64(col("id") + 5).as("f_i64"),
      (col("id") % 2).as("g_bool"),
      expr("unhex(concat(md5(cast(cast(id as string) as binary)), " +
        "md5(cast(cast(id + 1 as string) as binary))))").as("h_b32"),
      xxhash64(col("id") + 6).as("i_u128_lo"),
      abs(xxhash64(col("id") + 7)).as("i_u128_hi"), // < 2^63 → fits 38 digits
      concat(lit("s_"), col("id")).as("s"))
    val out = ProtocolRegistry.decode(
      ProtocolRegistry.encode(src, l).select("payload"), l)
    assert(out.count() == 512)
    val joined = out.as("o").join(src.as("x"),
      col("o.key") === col("x.key"))
    def q64 = lit("18446744073709551616").cast("decimal(38,0)")
    val bad = joined.filter(
      col("o.a_u8") =!= col("x.a_u8") ||
        col("o.b_u16") =!= col("x.b_u16") ||
        col("o.c_u32") =!= col("x.c_u32") ||
        col("o.d_i32") =!= col("x.d_i32") ||
        col("o.f_i64") =!= col("x.f_i64") ||
        col("o.g_bool") =!= col("x.g_bool") ||
        expr("hex(o.h_b32)") =!= expr("hex(x.h_b32)") ||
        col("o.s") =!= col("x.s") ||
        col("o.i_u128") =!= (col("x.i_u128_hi").cast("decimal(38,0)") * q64 +
          when(col("x.i_u128_lo") >= 0,
            col("x.i_u128_lo").cast("decimal(38,0)"))
            .otherwise(col("x.i_u128_lo").cast("decimal(38,0)") + q64)))
    assert(bad.count() == 0)
  }

  test("real create-token log decodes via the sequential expression") {
    val src = spark.range(1, 22).select(
      concat(lit("tok_"), col("id")).as("name"), lit("SYM").as("symbol"),
      lit("ipfs://meta").as("uri"),
      expr("unhex(repeat('11', 32))").as("mint"),
      expr("unhex(repeat('22', 32))").as("bonding_curve"),
      expr("unhex(repeat('33', 32))").as("user_pk"),
      expr("unhex(repeat('44', 32))").as("creator"),
      (col("id") * 100).as("ev_ts"), (col("id") * 2).as("vtr"),
      (col("id") * 3).as("vsr"), (col("id") * 5).as("rtr"),
      (col("id") * 7).as("tts"))
    // frame with the REAL 16-byte CreateTokenEvent discriminator
    import graft.functions.exprs.le_bytes
    def lp(c: String) = concat(
      le_bytes(expr(s"cast(octet_length(cast($c as binary)) as bigint)"), 4),
      col(c).cast("binary"))
    val framed = src.withColumn("payload", concat(
      lit(RealLayouts.PumpFunCreateEventDisc),
      lp("name"), lp("symbol"), lp("uri"),
      col("mint"), col("bonding_curve"), col("user_pk"), col("creator"),
      le_bytes(col("ev_ts"), 8), le_bytes(col("vtr"), 8),
      le_bytes(col("vsr"), 8), le_bytes(col("rtr"), 8),
      le_bytes(col("tts"), 8)))
    val out = RealLayouts.decodeCreateReal(framed.select("payload"))
    assert(out.count() == 21)
    assert(out.filter(col("ev.name") =!= concat(lit("tok_"),
      (col("ev.timestamp") / 100).cast("long"))).count() == 0)
    assert(out.filter(col("ev.token_total_supply") % 7 =!= 0).count() == 0)
    // truncated payload -> dropped, not failed
    assert(RealLayouts.decodeCreateReal(
      framed.select(expr("substring(payload, 1, 40)").as("payload")))
      .count() == 0)
  }

  test("cpi merge: (outer_idx, inner_idx) envelope, log overwrites ix") {
    import graft.sources.InstructionCodec
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").limit(64)
    val txs = InstructionCodec.packCpiTransactions(ev)
    val merged = InstructionCodec.cpiMerge(txs)
    assert(merged.count() == 64)
    // every ix arg pairs with its log body at inner_idx 0
    assert(merged.filter(col("inner_idx") =!= 0).count() == 0)
    assert(merged.filter(col("sol_amount") =!= col("amount")).count() == 0,
      "log sol_amount must equal the ix amount arg by construction")
    assert(merged.filter(col("max_sol_cost") =!= col("amount") + 10)
      .count() == 0)
    // outer_idx is dense per tx starting at 0
    val idx = merged.groupBy("tx_id")
      .agg(min("outer_idx").as("lo"), max("outer_idx").as("hi"),
        count(lit(1)).as("n"))
    assert(idx.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
      .count() == 0)
    // a tx with NO inner logs keeps its instruction args (left merge)
    val noLogs = txs.withColumn("inner",
      expr("filter(inner, x -> false)"))
    val bare = InstructionCodec.cpiMerge(noLogs)
    assert(bare.count() == 64)
    assert(bare.filter(col("amount").isNull).count() == 0)
    assert(bare.filter(col("sol_amount").isNotNull).count() == 0)
  }

  test("instruction decode resolves named accounts positionally") {
    import graft.functions.exprs.le_bytes
    val l = layout(RealLayouts.PumpFunIx, "pf_buy_ix")
    val rows = spark.range(1, 17).select(
      col("id"),
      concat(lit(l.discriminator), le_bytes(col("id") * 10, 8),
        le_bytes(col("id") * 20, 8)).as("data"),
      // key table: 8 distinct derived keys; instruction account list
      // puts user (slot 6) at table index (id % 8)
      expr("transform(sequence(0, 7), i -> unhex(concat(" +
        "md5(cast(cast(i as string) as binary)), " +
        "md5(cast(cast(i + 1 as string) as binary)))))").as("account_keys"),
      expr("array(0, 1, 2, 3, 4, 5, cast(id % 8 as int))").as("accounts"))
    val out = RealLayouts.decodeInstruction(rows, l)
    assert(out.count() == 16)
    assert(out.filter(col("amount") =!= col("id") * 10).count() == 0)
    assert(out.filter(col("max_sol_cost") =!= col("id") * 20).count() == 0)
    // resolved user key == derivation of (id % 8)
    assert(out.filter(expr("hex(user)") =!= expr("upper(concat(" +
      "md5(cast(cast(id % 8 as string) as binary)), " +
      "md5(cast(cast(id % 8 + 1 as string) as binary))))")).count() == 0)
    // out-of-range account index drops the row (reference length guard)
    val bad = rows.withColumn("accounts",
      expr("array(0, 1, 2, 3, 4, 5, 99)"))
    assert(RealLayouts.decodeInstruction(bad, l).count() == 0)
    // short data blob drops the row
    val short = rows.withColumn("data", expr("substring(data, 1, 12)"))
    assert(RealLayouts.decodeInstruction(short, l).count() == 0)
  }
}
