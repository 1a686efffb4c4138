package graft

/** Cross-layout determinism: every float-emitting query must produce
  * IDENTICAL bits regardless of partition count or task interleaving —
  * the property the whole DuckDB-oracle strategy rests on (SURVEY §6:
  * exact decimal/integer aggregation, single final division). A query
  * whose double output depends on partitioning would pass the oracle at
  * one shuffle setting and flake at another — or on a 1000-executor
  * cluster.
  */
class DeterminismSpec extends TestSparkSession {

  /** Queries with double outputs reached through divisions/casts of
    * exactly-aggregated integers or decimals. */
  private val floatQueries = Seq(
    "q_vwap_lineitem", "q_events_ewma_rate", "q_events_concentration",
    "q_docs_distinctive_terms", "q_tpch_q1_pricing", "q_events_twap_1h",
    "q_docs_repeated_spans", "q_text_quality", "q_tpch_q14_promo",
    "q_docs_commonness", "q_events_metrics_snapshot",
    "q_events_trade_price", "q_events_state_history",
    "q_docs_vocab_drift", "q_events_rate_spikes",
    // round 3: the reworked moving average (double) and the real-layout
    // protocol round-trips (integer aggregates over decoded real bytes —
    // pinned so the wire decode itself can never go partition-dependent)
    "q_events_rate_1m", "q_events_pumpfun_real", "q_events_bonk_real",
    // the adapted Q2/Q9/Q11 shapes emit doubles derived from exact
    // decimal/integer aggregates — pinned like the rest of the family
    "q_tpch_q2_mincost", "q_tpch_q9_profit", "q_tpch_q11_important",
    "q_events_series_corr",
    // range-exchange prefix sums must not depend on partition boundaries
    "q_docs_select_budget", "q_events_realized_pnl",
    "q_events_ohlc_gapfill", "q_events_max_drawdown", "q_events_price_impact",
    "q_events_volume_autocorr", "q_events_burstiness",
    "q_events_wallet_overlap", "q_events_gini",
    // all-integer output, but pins the iterative join/agg pipeline
    "q_events_pagerank",
    // integer-exact graph + MEV + band analytics
    "q_events_triangles", "q_events_sandwich", "q_events_bollinger",
    "q_events_wallet_clusters", "q_events_momentum_ic",
    "q_events_leadlag_ic", "q_events_quantile_store",
    "q_events_taint", "q_events_wash_pairs", "q_events_kcore",
    // round 4: the three-level prefix sum must place every trade in the
    // same equal-volume bucket regardless of partition boundaries, and
    // the microstructure moments must stay bit-stable
    "q_events_vpin", "q_events_roll_spread", "q_events_kyle_lambda",
    // round 5: the round-4 composites — block-meta wire frames, the
    // CPMM/Bonk account rollup, and the timer-flushed streaming
    // sessionizer (state merge + watermark arithmetic must not depend
    // on the shuffle layout) — plus the streamed realized-PnL marks
    "q_events_block_real", "q_events_pool_accounts",
    "q_stream_session_timeout", "q_stream_realized_pnl",
    // round 5: the transcendental-boundary family (rounded-ln decimal
    // sums must be layout-independent), the exact CUSUM windows, and the
    // wedge-join link scores
    "q_events_volatility", "q_events_amihud", "q_events_type_entropy",
    "q_events_benford", "q_events_cusum", "q_events_neighbor_sim",
    "q_docs_bm25", "q_docs_unigram_lp", "q_events_variance_ratio",
    "q_events_winsorized", "q_docs_pmi_bigrams", "q_docs_source_kl",
    "q_events_cusum_fixed", "q_stream_cusum", "q_events_mad_outliers",
    "q_docs_zipf", "q_docs_source_overlap", "q_events_stickiness",
    "q_events_hill",
    // the ADC distance sum is decimal-fixed per lookup since round 5 —
    // before that a raw double sum drifted by ulps across layouts
    // (caught by the IVF-PQ full-probe equality pin)
    "q_ann_pq_topk", "q_ann_ivfpq_topk", "q_events_spearman",
    "q_ann_hard_negatives", "q_docs_mixture_alloc",
    "q_events_edge_growth", "q_ann_rrf", "q_multimodal_dedup",
    // round 5 batch 2: VWAP deviation totals, market-beta moments, the
    // hour-of-day median baseline, the rational-centroid distance ranks
    // and the split-leakage heal must not depend on the shuffle layout
    "q_events_slippage", "q_events_beta", "q_events_seasonal_anomalies",
    "q_embeddings_outliers", "q_docs_split_leakage",
    // growth-accounting set algebra, terasort-shaped RFM ranks, the
    // dedup token accounting and the bigram-entropy decimal sums
    "q_events_churn", "q_events_rfm", "q_docs_effective_tokens",
    "q_docs_bigram_entropy",
    // round 6: the iterative stationary-mix fixed point, the chi-square
    // decimal sums, the streamed seasonal pipeline, the greedy MMR
    // selection sequence (not SQL-expressible — layout independence IS
    // its cross-engine gate), and the LSH-fed dedup reports
    "q_events_stationary_mix", "q_events_last_digit", "q_stream_seasonal",
    "q_ann_mmr", "q_docs_split_leakage_lsh", "q_docs_effective_tokens_lsh",
    // round 6 operators: lot matching must pair identically on any
    // layout; the concentration/readability/burstiness divisions ride
    // exact integer aggregates
    "q_events_fifo_match", "q_events_diurnal", "q_docs_readability",
    "q_docs_burstiness",
    // batch 2: the absorption fixed point, the source-level dup matrix
    // and the terasort-shaped curriculum ranks
    "q_events_absorption", "q_docs_dup_flow", "q_docs_curriculum")

  private def runAt(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val cols = df.columns.sorted.toIndexedSeq
      df.selectExpr(cols.map(c => s"`$c`"): _*)
        .collect()
        // java.lang.Double.toString is bit-faithful for distinct doubles
        .map(_.toSeq.map(String.valueOf).mkString(""))
        .sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  floatQueries.foreach { name =>
    test(s"$name: identical bits at 3 vs 13 shuffle partitions") {
      assert(runAt(name, 3) == runAt(name, 13), s"$name diverged")
    }
  }
}
