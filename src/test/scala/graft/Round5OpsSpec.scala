package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-5 operators: range volatility, Amihud, behavioral entropy,
  * Benford audit, CUSUM change points, neighbor similarity, BM25,
  * unigram LM scoring. Each test pins a semantic invariant or a
  * hand-computed value; cross-engine exactness is pinned by the DuckDB
  * oracle gate (oracleSql entries), determinism by DeterminismSpec.
  */
class Round5OpsSpec extends TestSparkSession {

  import spark.implicits._

  private def events = Tables.events(spark, sfDir)
  private def docs = Tables.documents(spark, sfDir)

  // ---- A90 range volatility ----

  test("rangeVolatility: estimators are non-negative and finite") {
    val v = EventOps.rangeVolatility(events)
    // each estimator is a mean of non-negative per-bar terms (RS terms
    // are products of same-sign logs); the 1e-6 log rounding can push a
    // degenerate bar's term below zero by at most the quantum
    assert(v.filter(col("park_var") < -1e-6 || col("gk_var") < -1e-6 ||
      col("rs_var") < -1e-6).count() == 0)
    assert(v.filter(isnan(col("park_var")) || isnan(col("gk_var")) ||
      isnan(col("rs_var"))).count() == 0)
    assert(v.count() > 0)
  }

  test("rangeVolatility: hand-computed single-bar day") {
    // one day, one hour, two trades: o=100.00 c=110.00 h=110 l=100
    val ev = Seq(
      ("e1", "2024-01-01 00:10:00", "u1", "t", 100.0),
      ("e2", "2024-01-01 00:20:00", "u1", "t", 110.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.rangeVolatility(ev).collect()
    assert(r.length == 1)
    val lhl = math.rint(math.log(1.1) * 1e6) / 1e6 // the boundary round
    val row = r(0)
    assert(math.abs(row.getAs[Double]("park_var") -
      lhl * lhl / 2.772588722239781) < 1e-12)
    // o == l and c == h: RS terms are ln(h/o)·ln(h/c) + ln(l/o)·ln(l/c)
    // = lhl·0 + 0·(−lhl) = 0
    assert(row.getAs[Double]("rs_var") == 0.0)
  }

  // ---- A91 Amihud ----

  test("amihudDaily: hand-computed two-trade day and invariants") {
    val ev = Seq(
      ("e1", "2024-01-01 01:00:00", "u1", "t", 200.0),
      ("e2", "2024-01-01 05:00:00", "u1", "t", 250.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.amihudDaily(ev).collect()(0)
    assert(r.getAs[Long]("open_cents") == 20000L)
    assert(r.getAs[Long]("close_cents") == 25000L)
    assert(r.getAs[Long]("volume_cents") == 45000L)
    assert(r.getAs[Long]("ret_1e6") == 250000L) // +25% in 1e-6 units
    // |ret| / dollar volume = 0.25 / 450.00
    assert(math.abs(r.getAs[Double]("illiq") - 0.25 / 450.0) < 1e-15)
    val full = EventOps.amihudDaily(events)
    assert(full.filter(col("illiq") < 0).count() == 0)
    assert(full.filter(col("open_cents") <= 0).count() == 0)
  }

  // ---- A92 behavioral entropy ----

  test("typeEntropy: single-type wallet is exactly zero; uniform is ln k") {
    val ev = (1 to 8).map(i =>
      (s"e$i", "2024-01-01 00:00:00", if (i <= 4) "mono" else "duo",
        if (i <= 4) "a" else (if (i % 2 == 0) "a" else "b"), 1.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val m = EventOps.typeEntropy(ev).collect()
      .map(r => r.getAs[String]("user_id") -> r).toMap
    // H = lnR6(N) − Σ c·lnR6(c)/N: one type ⇒ c = N ⇒ exactly 0
    assert(m("mono").getAs[Double]("entropy") == 0.0)
    assert(m("mono").getAs[Double]("norm_entropy") == 0.0)
    // 2 types × 2 events: H = lnR6(4) − 4·lnR6(2)/4 = ln 2 at the quantum
    assert(math.abs(m("duo").getAs[Double]("entropy") - math.log(2)) < 1e-5)
    assert(math.abs(m("duo").getAs[Double]("norm_entropy") - 1.0) < 1e-5)
    // real data: entropy bounded by ln(n_types)
    val bad = EventOps.typeEntropy(events)
      .filter(col("entropy") < -1e-9 ||
        col("norm_entropy") > 1.0 + 1e-9).count()
    assert(bad == 0)
  }

  // ---- A93 Benford ----

  test("benfordDigits: digits 1-9, shares sum to one per type") {
    val b = EventOps.benfordDigits(events)
    assert(b.filter(col("digit") < 1 || col("digit") > 9).count() == 0)
    val sums = b.groupBy("event_type")
      .agg(sum("share").as("s"), sum("n").as("n"), first("total").as("t"))
      .collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9)
      assert(r.getAs[Long]("n") == r.getAs[Long]("t"))
    }
    // benford_p constants sum to 1 across the nine digits
    val p = b.select("digit", "benford_p").distinct().collect()
      .map(_.getAs[Double]("benford_p")).sum
    assert(math.abs(p - 1.0) < 1e-12)
  }

  // ---- A94 CUSUM ----

  test("cusumChangePoints: flags an injected rate shift, silent on constant") {
    def mk(rates: Seq[Int]): org.apache.spark.sql.DataFrame =
      rates.zipWithIndex.flatMap { case (r, minute) =>
        (0 until r).map(k => (s"e$minute-$k",
          1704067200L + minute * 60L + k, "u", "t", 1.0))
      }.toDF("event_id", "epoch", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_seconds(epoch)")).drop("epoch")
    // 60 quiet minutes at 2/min then 20 loud at 30/min: must alarm up
    val shifted = mk(Seq.fill(60)(2) ++ Seq.fill(20)(30))
    val hits = EventOps.cusumChangePoints(shifted).collect()
    assert(hits.nonEmpty)
    assert(hits.exists(_.getAs[String]("side") == "up"))
    // alarm fires inside the loud regime, not the quiet one
    val firstUp = hits.filter(_.getAs[String]("side") == "up")
      .map(_.getAs[Long]("minute")).min
    assert(firstUp >= 1704067200L + 60 * 60L)
    // exactly constant rate: threshold and statistic both zero ⇒ silent
    val flat = mk(Seq.fill(80)(3))
    assert(EventOps.cusumChangePoints(flat).count() == 0)
  }

  // ---- A95 neighbor similarity ----

  test("neighborSimilarity: star graph scores exactly") {
    // one market-hour with wallets z,a,b,c co-active: complete graph K4
    val ev = Seq("z", "a", "b", "c").zipWithIndex.map { case (u, i) =>
      (s"e$i", "2024-01-01 00:00:00", u, "t", 1.0)
    }.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = GraphOps.neighborSimilarity(ev, minCommon = 1).collect()
    // K4: every pair has the other 2 nodes in common, deg 3 each
    assert(r.length == 6)
    r.foreach { row =>
      assert(row.getAs[Long]("common") == 2L)
      assert(row.getAs[Long]("deg_a") == 3L)
      // jaccard = 2 / (3 + 3 − 2) = 0.5
      assert(row.getAs[Double]("jaccard") == 0.5)
      // ra = 2 · round(1/3, 9)
      assert(math.abs(row.getAs[Double]("ra_score") -
        2.0 * 0.333333333) < 1e-12)
      assert(row.getAs[Boolean]("is_edge"))
    }
    // real data: bounds
    val sim = GraphOps.neighborSimilarity(events)
    assert(sim.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    assert(sim.filter(col("common") >
      least(col("deg_a"), col("deg_b"))).count() == 0)
  }

  // ---- C45 BM25 ----

  test("bm25TopK: the stuffed doc outranks the sparse one") {
    val corpus = (Seq(
      ("hit", "alpha beta alpha beta alpha beta alpha beta"),
      ("sparse", "alpha gamma gamma gamma gamma gamma gamma gamma")) ++
      (1 to 30).map(i => (s"bg$i", "gamma delta gamma delta")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(corpus, Seq("alpha", "beta"), k = 5)
      .collect()
    assert(r.head.getAs[String]("doc_id") == "hit")
    assert(r.head.getAs[Long]("n_terms") == 2L)
    assert(r.head.getAs[Double]("bm25") >
      r(1).getAs[Double]("bm25"))
    // real corpus: top-k size and finite scores
    val real = TextAnalysis.bm25TopK(docs, Seq("spark", "window", "merge"))
    val rows = real.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(r2 => !r2.getAs[Double]("bm25").isNaN))
  }

  // ---- A96 variance ratio ----

  test("varianceRatio: trending walk > 1, oscillating series = 0") {
    def series(cs: Seq[Long]): org.apache.spark.sql.DataFrame =
      cs.zipWithIndex.map { case (c, h) =>
        (s"e$h", 1704067200L + h * 3600L, "u", "t", c / 100.0)
      }.toDF("event_id", "epoch", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_seconds(epoch)")).drop("epoch")
    // perfect oscillation: every 4-hour change is exactly zero => VR = 0
    val osc = series(Seq.tabulate(40)(i => 10000L + (i % 2) * 100))
    assert(EventOps.varianceRatio(osc).collect()(0)
      .getAs[Double]("vr") == 0.0)
    // constant drift: Var(d) = 0 => guard yields NULL, never a div-by-0
    val linRow = EventOps.varianceRatio(
      series(Seq.tabulate(40)(i => 10000L + i * 100))).collect()(0)
    assert(linRow.isNullAt(linRow.fieldIndex("vr")))
    // block momentum (10 up, 10 down, repeat): positive short-lag
    // autocorrelation of the steps => VR well above 1
    val trend = series(Seq.tabulate(40)(i =>
      10000L + (if (i % 20 < 10) i % 20 else 20 - i % 20) * 100))
    assert(EventOps.varianceRatio(trend).collect()(0)
      .getAs[Double]("vr") > 1.0)
    assert(EventOps.varianceRatio(events).filter(col("vr") < 0).count() == 0)
  }

  // ---- A97 winsorized stats ----

  test("winsorizedStats: thresholds, clip counts, bounded mean") {
    // 100 rows 1..100 cents: p1 -> rank 1 (1 cent), p99 -> rank 99
    val ev = (1 to 100).map(i =>
      (f"e$i%03d", "2024-01-01 00:00:00", "u", "t", i / 100.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.winsorizedStats(ev).collect()(0)
    assert(r.getAs[Long]("lo_cents") == 1L)
    assert(r.getAs[Long]("hi_cents") == 99L)
    assert(r.getAs[Long]("n_clip_lo") == 0L)
    assert(r.getAs[Long]("n_clip_hi") == 1L) // the 100-cent row clips
    // mean of 1..99 plus one clipped 99: 5049 cents over 100 rows
    assert(r.getAs[Double]("winsorized_mean") == 5049.0 / 100.0 / 100.0)
    val real = EventOps.winsorizedStats(events).collect()
    real.foreach { x =>
      assert(x.getAs[Long]("lo_cents") <= x.getAs[Long]("hi_cents"))
      val m = x.getAs[Double]("winsorized_mean") * 100.0
      assert(m >= x.getAs[Long]("lo_cents") - 1e-9 &&
        m <= x.getAs[Long]("hi_cents") + 1e-9)
    }
  }

  // ---- C47 PMI bigrams ----

  test("pmiBigrams: a glued phrase dominates chance pairs") {
    val corpus = ((1 to 30).map(i => (s"p$i", "new york is big today")) ++
      (1 to 30).map(i => (s"q$i", "old china is far today")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiBigrams(corpus, minCount = 5, k = 10).collect()
    val top = r.head
    // 'new york' and 'old china' only ever co-occur as phrases
    assert(Set(("new", "york"), ("old", "china"))
      .contains((top.getAs[String]("a"), top.getAs[String]("b"))))
    // every returned pair satisfies the min-count floor
    assert(r.forall(_.getAs[Long]("cnt_ab") >= 5L))
    // 'is big' (p=1/2 given 'is') scores below the deterministic phrases
    val isBig = r.find(x => x.getAs[String]("a") == "is" &&
      x.getAs[String]("b") == "big")
    assert(isBig.forall(_.getAs[Double]("pmi") < top.getAs[Double]("pmi")))
  }

  // ---- C48 per-source KL ----

  test("sourceKlDivergence: uniform slice ~0, skewed slice positive") {
    val corpus = ((1 to 20).map(i => (s"a$i", "sa", "x y z w")) ++
      (1 to 20).map(i => (s"b$i", "sb", "x y z w")) ++
      (1 to 20).map(i => (s"c$i", "sc", "x x x x")))
      .toDF("doc_id", "source", "text")
    val m = TextAnalysis.sourceKlDivergence(corpus).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats"))
      .toMap
    // sa and sb match each other but not the blend (sc skews it), so
    // all we pin: the skewed source diverges strictly more
    assert(m("sc") > m("sa"))
    assert(m("sa") == m("sb")) // identical slices, identical divergence
    // real corpus: KL is non-negative up to the ln-rounding quantum
    assert(TextAnalysis.sourceKlDivergence(docs)
      .filter(col("kl_nats") < -1e-5).count() == 0)
  }

  // ---- A94b fixed-reference CUSUM: batch ≡ stream ----

  test("cusumFixed: availableNow stream emits bit-identical alarms") {
    val batch = EventOps.cusumFixed(events).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val stream = streaming.EventStreamPipelines
      .cusumAlarmsAvailableNow(spark, sfDir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(batch == stream)
    // the recursion matches the closed form on a hand-built drift: 12
    // quiet minutes at 1/min push the lower side (4 − 2·1 = +2/min)
    // past 20 at minute 11 (s=22); the alarm is a single rising edge
    val quiet = (0 until 12).map(m =>
      (s"e$m", 1704067200L + m * 60L, "u", "t", 1.0))
      .toDF("event_id", "epoch", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(epoch)")).drop("epoch")
    val alarms = EventOps.cusumFixed(quiet).collect()
    assert(alarms.length == 1)
    assert(alarms(0).getAs[String]("side") == "down")
    assert(alarms(0).getAs[Long]("minute") == 1704067200L + 10 * 60L)
    assert(alarms(0).getAs[Long]("cusum_scaled") == 22L)
  }

  // ---- A98 MAD outliers ----

  test("madOutliers: hand-computed thresholds, zero-MAD silence") {
    // values 1..9 plus a 100x whale: median 5 (of 10 via lower median),
    // MAD = lower-median of |x-5| = {4,3,2,1,0,1,2,3,4,995} sorted ->
    // rank 5 of 10 -> 2; whale dev 995 > 5*2
    val ev = ((1 to 9).map(i => (s"e$i", i.toDouble)) :+ ("w", 1000.0))
      .map { case (id, v) => (id, "2024-01-01 00:00:00", "u", "t", v) }
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.madOutliers(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("event_id") == "w")
    assert(r(0).getAs[Long]("med_cents") == 500L)
    assert(r(0).getAs[Long]("mad_cents") == 200L)
    // a constant column has MAD 0: nothing emitted, no division by zero
    val const = (1 to 8).map(i =>
      (s"c$i", "2024-01-01 00:00:00", "u", "t", 7.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    assert(EventOps.madOutliers(const).count() == 0)
  }

  // ---- A99 stickiness ----

  test("stickiness: ratios ordered, single-user hand case exact") {
    val ev = (0 until 31).map(d =>
      (s"e$d", 1704067200L + d * 86400L, "solo", "t", 1.0))
      .toDF("event_id", "epoch", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(epoch)")).drop("epoch")
    val rows = EventOps.stickiness(ev).collect()
    assert(rows.length == 31)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") == 1L && r.getAs[Long]("wau") == 1L &&
        r.getAs[Long]("mau") == 1L)
      assert(r.getAs[Double]("stickiness") == 1.0)
    }
    val real = EventOps.stickiness(events)
    assert(real.filter(col("dau") > col("wau") ||
      col("wau") > col("mau")).count() == 0)
    assert(real.filter(col("stickiness") <= 0 ||
      col("stickiness") > 1).count() == 0)
  }

  // ---- A100 Hill tail index ----

  test("hillTail: scale-free, and squaring the tail halves alpha") {
    val base = EventOps.hillTail(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("alpha")).toMap
    assert(base.values.forall(a => a > 0 && !a.isNaN))
    // Hill is scale-invariant: a 10x price level shift moves alpha only
    // by the ln-rounding quantum
    val scaled = EventOps.hillTail(
      events.withColumn("value", col("value") * 10)).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("alpha")).toMap
    base.foreach { case (t, a) =>
      assert(math.abs(scaled(t) - a) < 1e-2, s"$t: $a vs ${scaled(t)}")
    }
    // squaring values doubles every log spacing: alpha halves (the
    // cents rounding of value^2 perturbs the spacings only in the ulps)
    val sq = EventOps.hillTail(
      events.withColumn("value", col("value") * col("value"))).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("alpha")).toMap
    base.foreach { case (t, a) =>
      assert(math.abs(sq(t) - a / 2) < 0.05 * a, s"$t: $a vs ${sq(t)}")
    }
  }

  // ---- A101 Spearman ----

  test("spearmanCorrelation: monotone pairs hit exactly ±1") {
    // two series over the same hours: y strictly increases with x for
    // type pair (p,q) => rho exactly 1; z strictly decreases => -1
    val ev = (0 until 20).flatMap { h =>
      val ts = 1704067200L + h * 3600L
      Seq((s"p$h", ts, "u", "p", (h + 1) * 10.0),
        (s"q$h", ts, "u", "q", (h + 1) * 7.0),
        (s"z$h", ts, "u", "z", (20 - h) * 5.0))
    }.toDF("event_id", "epoch", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(epoch)")).drop("epoch")
    val m = EventOps.spearmanCorrelation(ev).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r.getAs[Double]("rho")).toMap
    assert(m(("p", "q")) == 1.0)
    assert(m(("p", "z")) == -1.0)
    assert(m(("q", "z")) == -1.0)
    // real data: rho bounded
    assert(EventOps.spearmanCorrelation(events)
      .filter(col("rho") < -1.0 || col("rho") > 1.0).count() == 0)
  }

  // ---- C49 Zipf slope ----

  test("zipfSlope: exact power law recovers its exponent") {
    // freq = 1000 / rank for ranks 1..10 => slope -1 up to ln rounding
    val corpus = (1 to 10).flatMap(r =>
      Seq.fill(1000 / r)(s"t$r")).zipWithIndex
      .map { case (t, i) => (s"d$i", t) }.toDF("doc_id", "text")
    val row = TextAnalysis.zipfSlope(corpus).collect()(0)
    assert(row.getAs[Long]("n_tokens_used") == 10L)
    assert(math.abs(row.getAs[Double]("slope") - (-1.0)) < 0.01)
    val real = TextAnalysis.zipfSlope(docs).collect()(0)
    assert(!real.getAs[Double]("slope").isNaN)
  }

  // ---- C50 source overlap ----

  test("sourceOverlap: identical sources hit jaccard 1, disjoint absent") {
    val corpus = Seq(
      ("d1", "sa", "x y z"), ("d2", "sb", "z y x"),
      ("d3", "sc", "p q r"), ("d4", "sd", "x p"))
      .toDF("doc_id", "source", "text")
    val m = TextAnalysis.sourceOverlap(corpus).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> r.getAs[Double]("jaccard")).toMap
    assert(m(("sa", "sb")) == 1.0)
    assert(!m.contains(("sa", "sc"))) // zero overlap pairs never emit
    assert(m(("sa", "sd")) == 1.0 / 4.0) // {x} over {x,y,z,p}
    // real corpus: jaccard bounded, pair orientation canonical
    val real = TextAnalysis.sourceOverlap(docs)
    assert(real.filter(col("jaccard") <= 0 || col("jaccard") > 1)
      .count() == 0)
    assert(real.filter(col("source_a") >= col("source_b")).count() == 0)
  }

  // ---- C52 temperature mixture ----

  test("temperatureMixture: budget conserved exactly, sharpening works") {
    val corpus = ((1 to 20).map(i =>
      (i.toLong, "rich", "the story of a great and long journey begins " +
        "with the first of many steps to come")) ++
      (21 to 40).map(i => (i.toLong, "poor", "x! y! z! q!")))
      .toDF("doc_id", "source", "text")
    def allocOf(tau: Double) = TextAnalysis
      .temperatureMixture(corpus, tau = tau, budgetTokens = 10000L)
      .collect()
      .map(r => Option(r.getAs[String]("source")).getOrElse("__rest") ->
        r.getAs[Long]("alloc_tokens")).toMap
    val a1 = allocOf(1.0)
    // exact conservation: allocations + remainder == budget
    assert(a1.values.sum == 10000L)
    assert(a1("rich") > a1("poor"))
    // higher temperature sharpens toward the high-quality source
    val a4 = allocOf(4.0)
    assert(a4.values.sum == 10000L)
    assert(a4("rich") > a1("rich"))
    // real corpus: one remainder row, everything non-negative
    val real = TextAnalysis.temperatureMixture(docs).collect()
    assert(real.count(_.isNullAt(0)) == 1)
    assert(real.forall(_.getAs[Long]("alloc_tokens") >= 0L))
  }

  // ---- C53 hard negatives ----

  test("hardNegatives: cross-label only, skip band enforced") {
    val emb = Tables.embeddings(spark, sfDir)
    val anchors = emb.filter(col("vec_id") < 10)
    val r = operators.Similarity.hardNegatives(emb, anchors).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Int]("anchor_label") !=
        row.getAs[Int]("neg_label"))
      val rk = row.getAs[Long]("rk")
      assert(rk > 2 && rk <= 7, s"rank $rk outside the mining band")
    }
    // the skip band: rk 1-2 of the same cross-label ranking are absent,
    // and each anchor mines at most k distinct negatives
    val perAnchor = r.groupBy(_.getAs[Long]("q_id"))
    perAnchor.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("neighbor_id")).distinct.length ==
        rows.length)
      assert(rows.length <= 5)
    }
  }

  // ---- A102 edge growth ----

  test("edgeGrowth: first day all-new, repeat pairings not re-counted") {
    // same wallet pair co-active on two days; a third wallet joins on
    // day 2 only
    val ev = Seq(
      ("e1", 0L, "a"), ("e2", 0L, "b"),
      ("e3", 86400L, "a"), ("e4", 86400L, "b"), ("e5", 86400L, "c"))
      .map { case (id, off, u) =>
        (id, 1704067200L + off, u, "t", 1.0)
      }.toDF("event_id", "epoch", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(epoch)")).drop("epoch")
    val m = EventOpsDays(GraphOps.edgeGrowth(ev))
    assert(m(1704067200L) == (1L, 1L, 1.0)) // (a,b) new
    // day 2: (a,b) repeats, (a,c) and (b,c) are new => 3 pairs, 2 new
    assert(m(1704067200L + 86400L) == (3L, 2L, 2.0 / 3.0))
    val real = GraphOps.edgeGrowth(events)
    assert(real.filter(col("n_new") > col("n_pairs")).count() == 0)
    val firstDay = real.orderBy("day").collect().head
    assert(firstDay.getAs[Double]("new_ratio") == 1.0)
  }

  private def EventOpsDays(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("day") ->
      ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_new"),
        r.getAs[Double]("new_ratio")))).toMap

  // ---- C54 RRF fusion ----

  test("rrfFusion: double-list consensus outranks single-list hits") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val r = operators.Similarity.rrfFusion(emb, queries).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_lists")
      assert(n == 1L || n == 2L)
      // rrf bounded by the two best possible ranks, 2/(60+1), up to the
      // per-term 1e-9 rounding quantum (each term may round up half a
      // quantum)
      assert(row.getAs[Double]("rrf") <= 2.0 / 61.0 + 1e-8)
    }
    // per anchor: any 2-list candidate with both ranks <= 10 beats any
    // 1-list candidate whose single term is at best 1/61 when the
    // 2-list one has 1/70 + 1/70 > 1/61 ... only guaranteed for the
    // top-ranked row, so pin: if the rank-1 row exists with n_lists=1,
    // no 2-list candidate may exist for that anchor with both ranks
    // better than 9 (1/69+1/69 > 1/61). Simpler invariant: ranks are
    // 1..k dense per anchor.
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
  }

  // ---- C55 media dedup ----

  test("mediaDedup: re-muxed copy found, distinct content silent") {
    val body = ("frame" * 200).take(700) // spans 3 frames of 256 bytes
    val corpus = Seq(
      (1L, "HDR-AAAA" + body), // same content, different "container"
      (2L, "HDR-BBBB" + body), //   header bytes => whole-asset md5 differs
      (3L, "totally different payload " * 30))
      .toDF("doc_id", "text")
    val pairs = graft.multimodal.Multimodal.mediaDedup(corpus).collect()
    // only the re-muxed pair (1,2) survives; 3 shares nothing
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("doc_a") == 1L &&
      pairs(0).getAs[Long]("doc_b") == 2L)
    // the shifted header means frame BOUNDARIES align (both headers are
    // 8 bytes) so interior frames hash equal; jaccard is high but < 1
    val j = pairs(0).getAs[Double]("jaccard")
    assert(j > 0.2 && j < 1.0)
    // whole-asset digests would have missed it:
    assert(corpus.select(md5(col("text").cast("binary"))).distinct()
      .count() == 3)
    // real corpus: verdicts respect the threshold
    val real = graft.multimodal.Multimodal
      .mediaDedup(Tables.documents(spark, sfDir)).collect()
    real.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.2 - 1e-12))
  }

  // ---- C46 unigram LM ----

  test("unigramLogProb: common-token docs score higher, bounds hold") {
    val corpus = ((1 to 20).map(i => (s"c$i", "the the the the cat")) ++
      Seq(("rare", "zyx wvu tsr qpo nml")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(corpus).collect()
      .map(x => x.getAs[String]("doc_id") -> x).toMap
    assert(r("c1").getAs[Double]("avg_logp") >
      r("rare").getAs[Double]("avg_logp"))
    assert(r("c1").getAs[Long]("len") == 5L)
    assert(r("c1").getAs[Long]("n_distinct") == 2L)
    val real = TextAnalysis.unigramLogProb(docs)
    assert(real.count() == docs.count())
    assert(real.filter(col("avg_logp") > 0 ||
      col("pseudo_ppl") < 1.0).count() == 0)
  }

  // ---- A103 VWAP slippage ----

  test("vwapSlippage: hand-computed two-fill hour") {
    // c=10000,q=1 and c=20000,q=3 → K=4, C=70000, vwap=17500,
    // slip = (1·|40000−70000| + 3·|80000−70000|) / 16 = 3750
    val ev = Seq(
      ("e1", "2024-01-01 00:10:00", "u1", "t", 100.0, "{\"k\": 1}"),
      ("e2", "2024-01-01 00:20:00", "u1", "t", 200.0, "{\"k\": 3}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.vwapSlippage(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("total_qty") == 4L)
    assert(r(0).getAs[Double]("vwap_cents") == 17500.0)
    assert(r(0).getAs[Double]("slip_cents") == 3750.0)
    // real corpus: slippage is a weighted mean |deviation| — never
    // negative, and zero only for single-print hours
    val real = EventOps.vwapSlippage(events)
    assert(real.count() > 0)
    assert(real.filter(col("slip_cents") < 0).count() == 0)
  }

  // ---- A104 market beta ----

  test("marketBeta: a lone type IS the market — beta 1, alpha 0") {
    val ev = Seq(
      ("e1", "2024-01-01 00:10:00", "u1", "t", 100.0, "{}"),
      ("e2", "2024-01-01 01:20:00", "u1", "t", 300.0, "{}"),
      ("e3", "2024-01-01 02:20:00", "u1", "t", 250.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.marketBeta(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_hours") == 3L)
    assert(math.abs(r(0).getAs[Double]("beta") - 1.0) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("alpha_cents")) < 1e-9)
    // real corpus: betas sum weighted by nothing in particular, but
    // every type shares hours with the market, so |beta| stays modest
    val real = EventOps.marketBeta(events).collect()
    assert(real.length > 0)
    real.foreach(x => assert(!x.getAs[Double]("beta").isNaN))
  }

  // ---- A105 seasonal anomalies ----

  test("seasonalAnomalies: only the burst day of a stable slot fires") {
    // hod 0 across 5 days: counts 1,1,1,1,9 → median 1, day-5 fires
    val rows = (1 to 4).map(d =>
      (s"e$d", f"2024-01-0$d%d 00:30:00", "u1", "t", 1.0, "{}")) ++
      (1 to 9).map(i =>
        (s"b$i", s"2024-01-05 00:0$i:00", "u1", "t", 1.0, "{}"))
    val ev = rows
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = EventOps.seasonalAnomalies(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n") == 9L)
    assert(r(0).getAs[Long]("baseline") == 1L)
    assert(r(0).getAs[Long]("hod") == 0L)
    // every flagged hour beats its slot baseline by the multiplier
    val real = EventOps.seasonalAnomalies(events)
    assert(real.filter(col("n") <= col("baseline") * 2).count() == 0)
  }

  // ---- C56 embedding outliers ----

  test("embeddingOutliers: hand-computed 1-d label + ranked real corpus") {
    // x6 = 0, 0, 3e6 → d2num = 9e12, 9e12, 36e12; median (rank 2) 9e12
    val emb = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(0.0f), 0), (3L, Seq(3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingOutliers(emb).collect()
      .sortBy(_.getAs[Long]("far_rk"))
    assert(r.length == 3)
    assert(r(0).getAs[Long]("vec_id") == 3L)
    assert(r(0).getAs[Double]("dist_ratio") == 4.0)
    assert(r(1).getAs[Double]("dist_ratio") == 1.0)
    // real corpus: one top-k block per label, ratios ordered ≥ 1 at
    // rank 1 (the max can't sit below the median)
    val real = Similarity.embeddingOutliers(
      Tables.embeddings(spark, sfDir)).collect()
    val byLabel = real.groupBy(_.getAs[Int]("label"))
    byLabel.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val r1 = rows.filter(_.getAs[Long]("far_rk") == 1L)
      r1.foreach(x => assert(x.getAs[Double]("dist_ratio") >= 1.0))
    }
  }

  // ---- A106 growth accounting ----

  test("walletChurn: hand-computed bridge + identities on real data") {
    // u1: w0,w1  u2: w0  u3: w0,w2
    val ev = Seq(
      ("e1", "2024-01-01 10:00:00", "u1"), ("e2", "2024-01-08 10:00:00", "u1"),
      ("e3", "2024-01-01 11:00:00", "u2"),
      ("e4", "2024-01-01 12:00:00", "u3"), ("e5", "2024-01-15 10:00:00", "u3"))
      .toDF("event_id", "tss", "user_id")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .withColumn("event_type", lit("t")).withColumn("value", lit(1.0))
    val r = EventOps.walletChurn(ev).collect()
      .map(x => x.getAs[Long]("week") -> x).toMap
    val wks = r.keys.toSeq.sorted
    assert(wks.length == 4)
    def row(i: Int) = r(wks(i))
    assert(row(0).getAs[Long]("new_wallets") == 3L &&
      row(0).getAs[Long]("active") == 3L)
    assert(row(1).getAs[Long]("retained") == 1L &&
      row(1).getAs[Long]("churned") == 2L &&
      row(1).getAs[Long]("active") == 1L)
    assert(row(2).getAs[Long]("resurrected") == 1L &&
      row(2).getAs[Long]("churned") == 1L)
    assert(row(3).getAs[Long]("churned") == 1L &&
      row(3).getAs[Long]("active") == 0L)
    // bridge identity on the real corpus: churned_t = active_{t-1} − retained_t
    val real = EventOps.walletChurn(events).collect()
      .sortBy(_.getAs[Long]("week"))
    real.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Long]("churned") ==
          prev.getAs[Long]("active") - cur.getAs[Long]("retained"))
      case _ =>
    }
  }

  // ---- A107 RFM scoring ----

  test("walletRfm: quintiles are balanced, monotone, in range") {
    val r = EventOps.walletRfm(events).collect()
    assert(r.nonEmpty)
    val n = r.length.toLong
    for (f <- Seq("r_score", "f_score", "m_score")) {
      val scores = r.map(_.getAs[Int](f))
      assert(scores.forall(s => s >= 1 && s <= 5))
      // exact-rank quintiles: bucket sizes differ by at most 1
      val sizes = scores.groupBy(identity).values.map(_.length.toLong)
      assert(sizes.max - sizes.min <= 1, s"$f sizes $sizes")
    }
    // the top-monetary wallet must score m=5
    val top = r.maxBy(x => (x.getAs[Long]("monetary_cents"),
      x.getAs[Long]("user_id")))
    assert(top.getAs[Int]("m_score") == 5)
    assert(r.forall(x => x.getAs[Int]("rfm") ==
      x.getAs[Int]("r_score") * 100 + x.getAs[Int]("f_score") * 10 +
        x.getAs[Int]("m_score")))
  }

  // ---- C58 effective tokens ----

  test("effectiveTokens: exact dup halves the kept side; inflation ≥ 1") {
    val d = Seq(
      (1L, "alpha beta gamma delta", "s"),
      (2L, "alpha beta gamma delta", "s"),
      (3L, "wholly unrelated words here", "s"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.effectiveTokens(d).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("raw_docs") == 3L)
    assert(r(0).getAs[Long]("kept_docs") == 2L)
    assert(r(0).getAs[Long]("raw_tokens") == 12L)
    assert(r(0).getAs[Long]("kept_tokens") == 8L)
    assert(r(0).getAs[Double]("inflation") == 1.5)
    val real = Dedup.effectiveTokens(docs).collect()
    real.foreach { x =>
      assert(x.getAs[Long]("kept_tokens") <= x.getAs[Long]("raw_tokens"))
      assert(x.getAs[Double]("inflation") >= 1.0)
    }
  }

  // ---- C59 bigram conditional entropy ----

  test("bigramEntropy: deterministic text → 0; hand-computed branch") {
    val det = Seq((1L, "a b a b a b a b a", "s")).toDF("doc_id", "text", "source")
    val r0 = TextAnalysis.bigramEntropy(det).collect()(0)
    assert(r0.getAs[Double]("h_cond_nats") == 0.0)
    assert(r0.getAs[Double]("branching_factor") == 1.0)
    // "a b a c": H = (2/3)·ln2 with the rounded-ln boundary
    val h = Seq((1L, "a b a c", "s")).toDF("doc_id", "text", "source")
    val r1 = TextAnalysis.bigramEntropy(h).collect()(0)
    assert(math.abs(r1.getAs[Double]("h_cond_nats") -
      2.0 * 0.693147 / 3.0) < 1e-9)
    val real = TextAnalysis.bigramEntropy(docs).collect()
    real.foreach { x =>
      assert(x.getAs[Double]("h_cond_nats") >= 0.0)
      assert(x.getAs[Long]("n_bigrams") >= x.getAs[Long]("n_bigram_types"))
    }
  }

  // ---- C57 split leakage ----

  test("splitLeakage: flagged clusters straddle splits; heal is canonical") {
    val r = Dedup.splitLeakage(docs).collect()
    assert(r.length > 0)
    r.foreach(x => assert(x.getAs[Long]("n_splits") >= 2L))
    // the heal is idempotent: every member of a cluster gets the same
    // healed split, and it equals the canonical member's own split
    r.groupBy(_.getAs[Long]("cluster")).foreach { case (cid, rows) =>
      assert(rows.map(_.getAs[String]("healed_split")).distinct.length == 1)
      rows.find(_.getAs[Long]("doc_id") == cid).foreach { canonRow =>
        assert(canonRow.getAs[String]("split") ==
          canonRow.getAs[String]("healed_split"))
      }
    }
  }
}
