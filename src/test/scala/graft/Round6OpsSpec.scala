package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-6 surfaces: the MMR selector's hand-computed greedy sequence
  * and injectable candidate generator, the LSH-fed dedup-report
  * variants (the 100 TB path for C57/C58), the ngramJaccard pair-fan-out
  * circuit breaker, the marketBeta degenerate-denominator guard, and
  * hand-computed pins for A108/A109. Cross-engine exactness is pinned
  * by the DuckDB oracle gate, layout independence by DeterminismSpec.
  */
class Round6OpsSpec extends TestSparkSession {

  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  // ---- C60 MMR ----

  test("mmrSelect: hand-computed greedy sequence — diversity beats rank") {
    // q = (1,0,0). Candidate 13 outranks 12 on relevance (0.85 > 0.8)
    // but sits on top of the first pick 11 (sim .994615), while 12 is
    // far from it (sim .458466): MMR must pick 12 at step 2.
    //   11: rel .9       (picked first)
    //   12: rel .8,  sim(11,12) = .72 − .261534 = .458466 → score .341534
    //   13: rel .85, sim(11,13) = .765 + .229615 = .994615 → score −.144615
    //   14: rel 0,   sim(11,14) = .43589             → score −.43589
    val emb = Seq(
      (1L, Array(1f, 0f, 0f), "q"),
      (11L, Array(0.9f, 0.43589f, 0f), "c"),
      (12L, Array(0.8f, -0.6f, 0f), "c"),
      (13L, Array(0.85f, 0.526783f, 0f), "c"),
      (14L, Array(0f, 1f, 0f), "c"))
      .toDF("vec_id", "embedding", "label")
    val sel = Similarity.mmrSelect(emb, emb.filter(col("vec_id") === 1),
        k = 4, nCandidates = 10)
      .orderBy("step").select("step", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sel.toSeq == Seq((1, 11L), (2, 12L), (3, 13L), (4, 14L)))
  }

  test("mmrSelect: full-probe IVF feed selects the identical sequence") {
    val emb = Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") < 10)
    val brute = Similarity.mmrSelect(emb, qs)
      .select("q_id", "step", "vec_id").collect().toSet
    // probes >> cell count ⇒ every cell probed ⇒ the IVF candidate set
    // and its exact-grid cos6 equal bruteForceTopK's — so must the picks
    val ivfFed = Similarity.mmrSelect(emb, qs,
        candidates = Some(Similarity.ivfTopK(emb, qs, k = 20,
          probes = 1000000)))
      .select("q_id", "step", "vec_id").collect().toSet
    assert(brute == ivfFed && brute.nonEmpty)
  }

  // ---- C57/C58 LSH-fed variants ----

  test("splitLeakage: LSH feed flags a subset of the exact feed, recall >= 0.8") {
    val exact = Dedup.splitLeakage(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lsh = Dedup.splitLeakage(docs,
        pairs = Some(Dedup.lshPairs(docs)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // fewer pairs can only shrink clusters: an LSH-flagged doc sat in a
    // multi-split cluster whose superset (exact pairs) still straddles
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    assert(lsh.size.toDouble >= 0.8 * exact.size)
  }

  test("effectiveTokens: LSH feed keeps >= the exact feed, raw identical") {
    val exact = Dedup.effectiveTokens(docs)
      .select("source", "raw_docs", "raw_tokens", "kept_tokens")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val lsh = Dedup.effectiveTokens(docs,
        pairs = Some(Dedup.lshPairs(docs)))
      .select("source", "raw_docs", "raw_tokens", "kept_tokens")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(exact.keySet == lsh.keySet && exact.nonEmpty)
    exact.foreach { case (src, (rd, rt, kt)) =>
      val (rd2, rt2, kt2) = lsh(src)
      assert(rd2 == rd && rt2 == rt) // raw totals don't depend on pairs
      assert(kt2 >= kt) // LSH misses can only remove fewer docs
    }
  }

  // ---- C4 circuit breaker ----

  test("ngramJaccard: maxPairs breaker trips below the fan-out, passes above") {
    val d = Seq(
      (1L, "the quick brown fox jumps", "a", "en", 25),
      (2L, "the quick brown fox jumps", "a", "en", 25),
      (3L, "the quick brown fox leaps", "a", "en", 25))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    // 3 docs sharing grams: fan-out Σ df(df−1)/2 > 1
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccard(d, 0.5, maxPairs = Some(1L)).collect()
    }
    assert(e.getMessage.contains("maxPairs"))
    val unguarded = Dedup.ngramJaccard(d, 0.5).collect().toSet
    val guarded =
      Dedup.ngramJaccard(d, 0.5, maxPairs = Some(1000L)).collect().toSet
    assert(guarded == unguarded && guarded.nonEmpty)
  }

  // ---- A104 degenerate denominator ----

  test("marketBeta: single-active-hour type yields NULL beta/alpha") {
    val ev = Seq(
      ("e1", "2024-01-01 00:10:00", "u1", "steady", 10.0),
      ("e2", "2024-01-01 01:10:00", "u1", "steady", 20.0),
      ("e3", "2024-01-01 02:10:00", "u1", "steady", 15.0),
      ("e4", "2024-01-01 01:20:00", "u2", "oneshot", 5.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.marketBeta(ev).collect()
      .map(x => x.getString(0) -> x).toMap
    val one = r("oneshot")
    assert(one.getLong(1) == 1L && one.isNullAt(2) && one.isNullAt(3))
    val st = r("steady")
    assert(!st.isNullAt(2) && !st.isNullAt(3))
  }

  // ---- A108 stationary mix ----

  test("stationaryTypeMix: two-state alternating chain settles at 1/2 each") {
    val ev = Seq(
      ("e1", "2024-01-01 00:00:01", "u1", "A", 1.0),
      ("e2", "2024-01-01 00:00:02", "u1", "B", 1.0),
      ("e3", "2024-01-01 00:00:03", "u1", "A", 1.0),
      ("e4", "2024-01-01 00:00:04", "u1", "B", 1.0),
      ("e5", "2024-01-01 00:00:05", "u1", "A", 1.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    // P(A→B) = P(B→A) = 1 exactly (p6 = 10⁶), so every power step maps
    // (x, y) → (y, x) with zero truncation: the fixed point is exact
    val r = EventOps.stationaryTypeMix(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("A") == (500000000000L, 0.5))
    assert(r("B") == (500000000000L, 0.5))
  }

  // ---- A110 FIFO matching ----

  test("fifoMatches: hand-computed lots; shorts and excess sells unmatched") {
    // per-user sequence S B B S S S B S (S = view/sell, B = purchase):
    //   v1: empty inventory -> short, unmatched
    //   v2 -> b1, v3 -> b2 (in FIFO order)
    //   v4: inventory empty again -> unmatched
    //   v5 -> b3
    val ev = Seq(
      ("v1", 1, "view"), ("b1", 2, "purchase"), ("b2", 3, "purchase"),
      ("v2", 4, "view"), ("v3", 5, "view"), ("v4", 6, "view"),
      ("b3", 7, "purchase"), ("v5", 8, "view"))
      .map { case (id, t, ty) => (id, s"2024-01-01 00:00:0$t", "u1", ty, 1.0) }
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val m = EventOps.fifoMatches(ev).collect()
      .map(r => (r.getAs[String]("sell_id"), r.getAs[String]("buy_id"),
        r.getAs[Long]("lot"))).toSet
    assert(m == Set(("v2", "b1", 1L), ("v3", "b2", 2L), ("v5", "b3", 3L)))
  }

  test("fifoMatches: holding periods are non-negative on real data") {
    val m = EventOps.fifoMatches(Tables.events(spark, sfDir))
    assert(m.filter(col("holding_us") < 0).count() == 0)
    assert(m.count() > 0)
  }

  // ---- A111 diurnal concentration ----

  test("diurnalConcentration: hand-computed HHI, min-hod peak tie-break") {
    val ev = (Seq((0, "x"), (0, "x"), (0, "x"), (5, "x")) ++
      Seq((3, "y"), (3, "y"), (7, "y"), (7, "y")))
      .zipWithIndex.map { case ((h, ty), i) =>
        (s"e$i", s"2024-01-01 %02d:30:00".format(h), "u1", ty, 1.0) }
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.diurnalConcentration(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2),
        x.getLong(3), x.getDouble(4))).toMap
    assert(r("x") == (4L, 0.625, 0L, 0.75))   // 3²+1² over 4²
    assert(r("y") == (4L, 0.5, 3L, 0.5))      // tie 2/2 -> smaller hod
  }

  // ---- C61 readability ----

  test("lixReadability: hand-computed counts and guard") {
    val d = Seq(
      (1L, "the cat sat. elephants gallop! ok", "s", "en", 33),
      (2L, "no punctuation here", "bare", "en", 19))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val r = TextAnalysis.lixReadability(d).collect()
      .map(x => x.getString(0) -> x).toMap
    val s = r("s")
    assert(s.getAs[Long]("n_words") == 6 && s.getAs[Long]("n_sentences") == 2
      && s.getAs[Long]("n_long") == 2)
    assert(s.getAs[Double]("lix") == 3.0 + 200.0 / 6.0)
    assert(r("bare").isNullAt(r("bare").fieldIndex("lix"))) // 0 sentences
  }

  // ---- C62 term burstiness ----

  test("termBurstiness: cf/df separates concentrated from spread terms") {
    val d = Seq(
      (1L, "a a b", "s", "en", 5),
      (2L, "a c c c", "s", "en", 7))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val r = TextAnalysis.termBurstiness(d, k = 2).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    // top-2 by (cf desc, token): a (cf 3, df 2) then c (cf 3, df 1)
    assert(r.toSeq == Seq(("a", 3L, 2L, 1.5), ("c", 3L, 1L, 3.0)))
  }

  // ---- A112 absorption probability ----

  test("absorptionProbabilities: hand-computed 50/50 fork and chained state") {
    // u1: A -> purchase, u2: A -> error  ⇒ P(A) = 1/2 exactly
    // u3: B -> A (B always walks into A) ⇒ P(B) = P(A) = 1/2
    val ev = Seq(
      ("e1", 1, "u1", "A"), ("e2", 2, "u1", "purchase"),
      ("e3", 1, "u2", "A"), ("e4", 2, "u2", "error"),
      ("e5", 1, "u3", "B"), ("e6", 2, "u3", "A"))
      .map { case (id, t, u, ty) =>
        (id, s"2024-01-01 00:00:0$t", u, ty, 1.0) }
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.absorptionProbabilities(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("purchase") == (1000000000000L, 1.0))
    assert(r("error") == (0L, 0.0))
    assert(r("A") == (500000000000L, 0.5))
    assert(r("B") == (500000000000L, 0.5))
  }

  // ---- C63 cross-source dup flow ----

  test("crossSourceDupFlow: near-dup pair lands in the right source cell") {
    val d = Seq(
      (1L, "the quick brown fox jumps high", "wiki", "en", 30),
      (2L, "the quick brown fox jumps high", "crawl", "en", 30),
      (3L, "completely different words entirely here now", "crawl", "en", 44))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val r = Dedup.crossSourceDupFlow(d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(r == Set(("crawl", "wiki", 1L)))
  }

  // ---- C64 curriculum bins ----

  test("curriculumBins: equal-population stages on the exact rank order") {
    val d = Seq(
      (1L, "a", "s", "en", 1), (2L, "a b", "s", "en", 3),
      (3L, "a b c", "s", "en", 5), (4L, "a b c d", "s", "en", 7))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val r = Sampling.curriculumBins(d, nBins = 2).collect()
      .map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(r == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2))
  }

  // ---- A109 last-digit uniformity ----

  test("lastDigitUniformity: uniform digits -> 0; one digit -> 9n/n = 90") {
    val uniform = (1 to 10).map(i =>
      (s"u$i", "2024-01-01 00:00:01", "u1", "fair", i / 100.0))
    val spiked = (1 to 10).map(i =>
      (s"s$i", "2024-01-01 00:00:01", "u1", "wash", 1.0))
    val ev = (uniform ++ spiked)
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.lastDigitUniformity(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3))).toMap
    // cents 1..10: each last digit 1..9,0 exactly once → χ² = 0
    assert(r("fair") == (10L, 10L, 0.0))
    // all mass on digit 0: χ² = (100·n² − 10n²)/(10n) = 9n = 90
    assert(r("wash") == (10L, 1L, 90.0))
  }
}
