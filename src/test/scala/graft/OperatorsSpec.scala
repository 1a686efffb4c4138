package graft

import org.apache.spark.sql.functions._

import graft.operators._

class OperatorsSpec extends TestSparkSession {

  private def events = Tables.events(spark, sfDir)

  test("filterTypes keeps only the include list") {
    val types = EventOps.filterTypes(events, Seq("purchase", "signup"))
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("purchase", "signup"))
  }

  test("countsByType covers all types and sums rows to table size") {
    val rows = EventOps.countsByType(events).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == events.count())
  }

  test("tumbling window counts partition the table") {
    val df = EventOps.tumbling1h(events)
    assert(df.agg(sum("n")).collect()(0).getLong(0) == events.count())
  }

  test("sliding window assigns each event to exactly 4 windows") {
    val df = EventOps.sliding1h15m(events)
    assert(df.agg(sum("n")).collect()(0).getLong(0) == 4 * events.count())
  }

  test("sessionize: session bounds ordered, totals preserved") {
    val s = EventOps.sessionize(events)
    assert(s.filter(col("end_us") < col("start_us")).count() == 0)
    assert(s.agg(sum("n_events")).collect()(0).getLong(0) == events.count())
  }

  test("topKUsers is deterministically ranked") {
    val rows = EventOps.topKUsers(events).collect()
    assert(rows.map(_.getAs[Long]("rk")).toSeq ==
      (1L to rows.length.toLong))
    val totals = rows.map(_.getAs[Double]("total_value"))
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b })
  }

  test("asof join attaches the latest prior view") {
    val ev = events.select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
      col("event_id"), col("event_type"))
    val j = AsOfJoin.asOf(
      ev.filter(col("event_type") === "purchase").drop("event_type"),
      ev.filter(col("event_type") === "view").drop("event_type"),
      "user_id", "ts_us", "event_id", Seq())
    // every attached view must be at-or-before its purchase
    assert(j.filter(col("asof.ts_us") > col("ts_us")).count() == 0)
    assert(j.count() == ev.filter(col("event_type") === "purchase").count())
  }

  test("ohlc: high >= low and open/close within range") {
    val o = EventOps.ohlc1h(events)
    assert(o.filter(col("high") < col("low")).count() == 0)
    assert(o.filter(col("open") > col("high") || col("open") < col("low"))
      .count() == 0)
    assert(o.filter(col("close") > col("high") || col("close") < col("low"))
      .count() == 0)
  }

  test("pricing summary has expected groups") {
    val df = Relational.pricingSummary(Tables.lineitem(spark, sfDir))
    assert(df.count() >= 4)
    assert(df.columns.contains("sum_charge"))
  }

  test("regionVolume joins to 25 nations") {
    val df = Relational.regionVolume(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir))
    assert(df.count() == 25)
  }

  test("broadcast join plan actually broadcasts the dim side") {
    val df = Relational.brandAgg(Tables.lineitem(spark, sfDir),
      Tables.part(spark, sfDir))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("window rank returns at most 3 per customer") {
    val df = Relational.topOrdersPerCustomer(Tables.orders(spark, sfDir))
    val maxPer = df.groupBy("o_custkey").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPer <= 3)
  }

  test("salted counts equal the direct aggregation") {
    val direct = EventOps.countsByType(events)
    val salted = EventOps.countsByTypeSalted(events)
    assert(direct.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(direct).count() == 0)
  }

  test("burst wallets only reports buckets above the threshold") {
    val b = EventOps.burstWallets(events, minBurst = 2)
    assert(b.filter(col("max_burst") < 2).count() == 0)
  }

  test("latency calibration counts high-latency events consistently") {
    val l = EventOps.latencyCalibration(events)
    assert(l.filter(col("n_high_latency") > col("n")).count() == 0)
    assert(l.filter(col("max_adjusted_ms") > 1500).count() == 0) // jitter bound
  }

  test("typed trades dataset supports type-safe logic") {
    val ev = Tables.events(spark, sfDir)
    val ds = graft.sources.EventCodec.trades(
      graft.sources.EventCodec.encodeTrade(ev))
    val buys = ds.filter(_.is_buy == 1).count()
    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(buys == expected)
  }

  test("pivot row sums equal per-user event counts") {
    val p = EventOps.userTypePivot(events)
    val total = p.select((col("n_click") + col("n_purchase") + col("n_signup")
      + col("n_view") + col("n_error")).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(total == events.count())
  }

  test("block join offsets are non-negative and bounded by the slot") {
    val b = EventOps.blockMetaJoin(events)
    assert(b.filter(col("max_offset_us") < 0).count() == 0)
    assert(b.filter(col("max_offset_us") >= 60000000L).count() == 0)
  }

  test("approx distinct is within the configured error of exact") {
    val a = EventOps.approxUsers(events).collect()
    a.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.25,
        s"approx $approx vs exact $exact")
    }
  }

  test("daily HLL sketches union to the direct whole-range sketch") {
    val daily = EventOps.dailyUserSketches(events)
    val merged = EventOps
      .usersFromSketches(daily, Long.MinValue, Long.MaxValue)
      .collect()(0)
    // sketch algebra: union of per-day sketches ≡ one sketch over the
    // whole range — same estimate, not merely a close one
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .collect()(0).getLong(0)
    assert(merged.getAs[Long]("approx_users") === direct)
    // and the estimate lands within HLL error of the exact count
    val exact = events.select(countDistinct("user_id")).collect()(0)
      .getLong(0)
    val approx = merged.getAs[Long]("approx_users").toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
    assert(merged.getAs[Long]("n_events") === events.count())
  }

  test("histogram store quantiles are within one bucket of exact") {
    val hists = EventOps.dailyValueHistograms(events)
    val out = EventOps
      .quantilesFromHistograms(hists, Long.MinValue, Long.MaxValue)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val cents = events
      .select(expr("cast(round(value * 100, 0) as bigint)").as("c"))
      .orderBy("c").collect().map(_.getLong(0))
    Seq(50, 90, 99).foreach { p =>
      // exact rank-p value (ceil rank, 1-based) vs the bucket upper edge
      val exact = cents((((cents.length.toLong * p + 99) / 100) - 1).toInt)
      val est = out(p)
      assert(est >= exact && est - exact < 100,
        s"p$p est $est vs exact $exact")
    }
    // store mergeability is exact: splitting the days across two stores
    // and summing answers identically (counts just add)
    val days = hists.select("db").distinct().collect().map(_.getLong(0))
    val mid = days.sorted.apply(days.length / 2)
    val left = hists.filter(col("db") < mid)
    val right = hists.filter(col("db") >= mid)
    val reunited = EventOps.quantilesFromHistograms(
      left.union(right), Long.MinValue, Long.MaxValue)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(reunited == out)
  }

  test("quantile store survives a pathological bucketCents=1 lamport-range store") {
    import spark.implicits._
    // 100k distinct cent-wide buckets spread over a ~10^18 range: the
    // former bucket<=bucket triangular cumulation would be a 10^10-pair
    // nested loop here; the terasort prefix shape scans them once. With
    // bucketCents=1 the store is lossless, so every percentile must
    // equal the exact order statistic.
    val n = 100000
    val vals = (0 until n).map(i =>
      1000000000000000L * (i % 1000) + i.toLong * 7919)
    val hists = vals.map(v => (0L, v, 1L)).toDF("db", "bucket", "n")
    val out = EventOps
      .quantilesFromHistograms(hists, 0L, 0L, Seq(50, 90, 99), 1L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val sorted = vals.sorted
    Seq(50, 90, 99).foreach { p =>
      val exact = sorted((((sorted.length.toLong * p + 99) / 100) - 1).toInt)
      assert(out(p) == exact, s"p$p: ${out(p)} vs exact $exact")
    }
  }

  test("set ops: result excludes big-ticket buyers") {
    val res = Relational.setOps(Tables.customer(spark, sfDir),
      Tables.orders(spark, sfDir))
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    assert(res.join(big, "c_custkey").count() == 0)
  }

  test("day-of-week rollup partitions all orders over 7 buckets") {
    val res = Relational.ordersByDayOfWeek(Tables.orders(spark, sfDir))
    assert(res.count() <= 7)
    assert(res.agg(sum("n_orders")).collect()(0).getLong(0) ==
      Tables.orders(spark, sfDir).count())
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("twap: constant price gives that price; weights cover the hour") {
    import spark.implicits._
    val base = 3600L * 1000000L * 500000 // an exact hour boundary
    val d = Seq(
      (1L, base, "purchase", 2.0),            // held 10 min
      (2L, base + 600L * 1000000, "purchase", 2.0), // held 50 min
      (3L, base, "view", 1.0))                // held the whole hour
      .toDF("event_id", "ts_us", "event_type", "value")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("event_type"), col("value"))
    val r = EventOps.twap1h(d).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("purchase").getAs[Double]("twap") == 2.0)
    assert(r("purchase").getAs[Long]("held_ms") == 3600L * 1000)
    assert(r("view").getAs[Long]("held_ms") == 3600L * 1000)
    assert(r("view").getAs[Double]("twap") == 1.0)
  }

  test("liquidity depth: running balance peaks and nets correctly") {
    import spark.implicits._
    val d = Seq(
      ("deposit", 1L, 100L, 1000L, 1L),
      ("deposit", 1L, 50L, 2000L, 2L),
      ("withdraw", 1L, 120L, 3000L, 3L),
      ("deposit", 2L, 10L, 1000L, 4L))
      .toDF("event_kind", "pool", "lp_amount", "ts_us", "event_id")
    val r = EventOps.liquidityDepth(d).collect()
      .map(x => x.getAs[Long]("pool") -> x).toMap
    assert(r(1L).getAs[Long]("net_lp") == 30L)
    assert(r(1L).getAs[Long]("peak_lp") == 150L)
    assert(r(1L).getAs[Long]("n_deposits") == 2L)
    assert(r(1L).getAs[Long]("n_withdrawals") == 1L)
    assert(r(2L).getAs[Long]("trough_lp") == 10L)
  }

  test("per-minute rate moving average stays within observed bounds") {
    val r = EventOps.ratePerMinute(events)
    val row = r.agg(min("ma5"), max("ma5"), max("n")).collect()(0)
    assert(row.getDouble(0) >= 1.0 && row.getDouble(1) <= row.getLong(2) + 1e-9)
  }

  test("lineitem scan prunes columns and pushes filters") {
    val df = Relational.pricingSummary(Tables.lineitem(spark, sfDir))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      scan.contains("LessThanOrEqual(l_shipdate"))
    // projection should not include unused columns like l_comment-ish ones
    assert(!scan.contains("l_partkey"))
  }

  test("range join equals the naive non-equi join") {
    val ev = Tables.events(spark, sfDir)
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), expr("unix_micros(ts)").as("ts_us"))
    val intervals = ev.filter(col("event_type") === "signup")
      .select(expr("unix_micros(ts)").as("start_us"),
        expr("unix_micros(ts) + 600000000").as("end_us"))
    val bucketed = RangeJoin
      .pointInInterval(points, intervals, "ts_us", "start_us", "end_us")
      .select("event_id", "ts_us", "start_us", "end_us")
    val naive = points.join(intervals,
      col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .select("event_id", "ts_us", "start_us", "end_us")
    assert(bucketed.count() == naive.count())
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
    // intervals shorter/longer than the bucket width still match exactly
    val odd = intervals.withColumn("end_us", col("start_us") + 1234567L)
    val b2 = RangeJoin.pointInInterval(points, odd, "ts_us", "start_us", "end_us")
    val n2 = points.join(odd,
      col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
    assert(b2.count() == n2.count())
  }

  test("stratified hash sampling is deterministic and near the target rates") {
    val docs = Tables.documents(spark, sfDir)
    val sampled = Sampling.stratifiedByHash(docs, col("doc_id"),
      expr("case when cast(substring(source, 4) as int) % 2 = 0 " +
        "then '40' else '80' end"))
    val again = Sampling.stratifiedByHash(docs, col("doc_id"),
      expr("case when cast(substring(source, 4) as int) % 2 = 0 " +
        "then '40' else '80' end"))
    assert(sampled.count() == again.count()) // reproducible
    val byParity = sampled
      .groupBy(expr("cast(substring(source, 4) as int) % 2").as("parity"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val totals = docs
      .groupBy(expr("cast(substring(source, 4) as int) % 2").as("parity"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val evenRate = byParity(0).toDouble / totals(0)
    val oddRate = byParity(1).toDouble / totals(1)
    assert(math.abs(evenRate - 0.25) < 0.1, s"even rate $evenRate")
    assert(math.abs(oddRate - 0.50) < 0.1, s"odd rate $oddRate")
  }

  test("weighted sampling favors heavier rows and is a pure id function") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Sampling.weightedSample(docs, "source", "doc_id",
      col("n_chars"), 5)
    val s2 = Sampling.weightedSample(docs, "source", "doc_id",
      col("n_chars"), 5)
    assert(s1.collect().toSet == s2.collect().toSet, "must be reproducible")
    // bias check: mean weight of the winners exceeds the population mean
    val sampleMean = s1.agg(avg("weight")).head.getDouble(0)
    val popMean = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > popMean,
      s"weighted winners mean $sampleMean <= population mean $popMean")
    // exactly k rows per stratum with contiguous ranks
    val bad = s1.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .filter(col("n") =!= 5 || col("mx") =!= 5)
    assert(bad.count() == 0, "every stratum must yield exactly k ranks")
  }

  test("count-min sketch bounds per-type counts (never under, eps over)") {
    // A26b: constant-memory frequency sketch — the per-type counters the
    // reference keeps exactly, sketchable when the key space explodes
    val bin = events.select(expr(
      "count_min_sketch(event_type, cast(0.001 as double), " +
        "cast(0.99 as double), 42)").as("sk")).head().getAs[Array[Byte]]("sk")
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bin))
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = sketch.estimateCount(k)
      assert(est >= n, s"CMS underestimated $k")
      assert(est <= n + (0.001 * total).ceil.toLong + 1,
        s"CMS over eps bound for $k: $est vs $n")
    }
  }

  test("rate spikes: planted burst minute detected, uniform background quiet") {
    import spark.implicits._
    // 120 uniform minutes at 1 event/min, plus a 40-event burst in minute 60
    val uniform = (0L until 120L).map(m => (m * 60000000L, "t"))
    val burst = Seq.fill(40)((60L * 60000000L + 1L, "t"))
    val ev = (uniform ++ burst)
      .toDF("us", "event_type")
      .select(expr("timestamp_micros(us)").as("ts"), col("event_type"))
    val spikes = EventOps.rateSpikes(ev).collect()
    assert(spikes.map(_.getAs[Long]("minute")).toSet == Set(60L))
    assert(spikes.head.getAs[Long]("n") == 41L)
    // a perfectly uniform stream has zero variance and zero spikes
    val flat = EventOps.rateSpikes(
      uniform.toDF("us", "event_type")
        .select(expr("timestamp_micros(us)").as("ts"), col("event_type")))
    assert(flat.isEmpty)
  }

  test("bollinger + gini decimal paths match BigInt at lamport magnitudes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 30 daily closes at 10¹¹–10¹² cents (lamport scale: d² is ~10²⁵,
    // a Long would wrap) with one planted 5×10¹² outlier
    val cents = (0 until 30).map { i =>
      if (i == 25) 5000000000000L
      else 100000000000L + math.abs(rnd.nextLong()) % 900000000000L
    }
    val ev = cents.zipWithIndex
      .map { case (c, d) => (d.toLong * 86400000000L, c / 100.0, d.toLong, "m") }
      .toDF("us", "value", "event_id", "event_type")
      .select(expr("timestamp_micros(us)").as("ts"), col("value"),
        col("event_id"), col("event_type"))
    val got = EventOps.bollingerBreakouts(ev).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("side"))).toSet
    val expected = (for {
      i <- cents.indices
      win = cents.slice(math.max(0, i - 19), i + 1)
      if win.length >= 12
      n = BigInt(win.length); x = BigInt(cents(i))
      s1 = win.map(BigInt(_)).sum
      s2 = win.map(v => BigInt(v) * BigInt(v)).sum
      d = n * x - s1
      if BigInt(4) * d * d > BigInt(9) * (n * s2 - s1 * s1)
    } yield (i.toLong * 86400L, if (d > 0) "hi" else "lo")).toSet
    assert(expected.nonEmpty, "planted outlier must break the band")
    assert(got == expected)

    // 2000 wallets at ~5×10¹² cents: Σi·v ≈ 10¹⁹ wraps a Long; the
    // decimal-accumulated Gini must equal the arbitrary-precision value
    val vols = (1 to 2000).map(i =>
      ("u%04d".format(i), 2000000000000L + (i.toLong * 4000000000L)))
    val gev = vols.toDF("user_id", "cents")
      .select(col("user_id"), (col("cents") / 100.0).as("value"),
        lit("g").as("event_type"))
    val g = EventOps.giniByType(gev).collect().head
    val sorted = vols.map(_._2).sorted
    val n = BigInt(sorted.length)
    val total = sorted.map(BigInt(_)).sum
    val rw = sorted.zipWithIndex
      .map { case (v, i) => BigInt(i + 1) * BigInt(v) }.sum
    assert(rw > BigInt(Long.MaxValue), "domain must actually wrap a Long")
    val giniExact = 2.0 * rw.toDouble / (n * total).toDouble -
      (n + 1).toDouble / n.toDouble
    assert(math.abs(g.getAs[Double]("gini") - giniExact) < 1e-12)
    assert(g.getAs[Long]("total_cents") == total.toLong)
  }

  test("wallet concentration: HHI within [1/n, 1], shares consistent") {
    val rows = EventOps.walletConcentration(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_wallets")
      val hhi = r.getAs[Double]("hhi")
      val top = r.getAs[Double]("top_share")
      // HHI is bounded below by perfect evenness, above by monopoly
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0, s"hhi $hhi n=$n")
      // the max wallet share can never be below the average share
      assert(top >= 1.0 / n - 1e-12 && top <= 1.0)
      // HHI >= top_share^2 (one term of the sum)
      assert(hhi >= top * top - 1e-12)
    }
  }

  test("distinctive terms: k per source, scores ranked, spread sane") {
    val docs = Tables.documents(spark, sfDir)
    val nSources = docs.select("source").distinct().count()
    val rows = TextAnalysis.distinctiveTerms(docs, k = 5).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.values.foreach { g =>
      assert(g.length == 5)
      val scores = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(r => r.getAs[Long]("n_sources") >= 1 &&
      r.getAs[Long]("n_sources") <= nSources))
  }

  test("approx percentile sketch stays near the exact order statistics") {
    val ev = Tables.events(spark, sfDir)
    val exact = EventOps.valueStats(ev)
      .select("event_type", "p50", "p95").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = EventOps.approxValueStats(ev)
      .select("event_type", "p50_approx", "p95_approx").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (t, (a50, a95)) =>
      val (e50, e95) = exact(t)
      assert(math.abs(a50 - e50) <= math.abs(e50) * 0.05 + 1e-9, s"$t p50")
      assert(math.abs(a95 - e95) <= math.abs(e95) * 0.05 + 1e-9, s"$t p95")
    }
  }
}
