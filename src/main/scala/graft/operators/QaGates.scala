package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-checkable QA gates for the declared-sketch family.
  *
  * The sketch operators (IVF / PQ / IVF-PQ / MMR / MinHash-LSH /
  * SimHash / hyperplane LSH / HLL / approx-percentile) have no SQL
  * oracle — their internals are engine-specific — so until round 10
  * the driver's check on them was rows-only, with the quantitative
  * recall/error bounds living in ScalaTest alone. Each gate here runs
  * the sketch AND its exact in-engine reference in ONE plan, reduces
  * to a single `(gate, bound, holds)` row (or a small per-key set),
  * and is registered with a CONSTANT-row oracle (`SELECT name, bound,
  * TRUE`): if a recall or error bound regresses, `holds` flips to
  * false and the driver's hash compare goes red — the rows-only check
  * becomes a quantitative gate the driver itself validates, at every
  * scale factor it sweeps.
  *
  * Thresholds are pinned from measured values on the synthetic
  * testdata at sf0.01–sf10 with ample margin (the gate exists to
  * catch regressions in the operators, not to certify a universal
  * recall — that is corpus-dependent for any LSH/IVF design).
  *
  * Scale shape: every gate is bounded by its constituent operators.
  * The ANN top-k gates join two (queries × k)-row frames; the
  * cardinality gates are one aggregate each. The two pair-recall
  * gates over EXPANDED exact pair lists (minhash vs exact n-gram
  * Jaccard, hyperplane vs exact cosine) inherit the expanded feeds'
  * quadratic-under-replication behavior and ride the same scale
  * exclusion list as those feeds — their rep-level contracts are
  * covered by the dedicated `_rep` queries.
  */
object QaGates {

  private def gate(name: String, bound: Double, holds: Column,
      from: DataFrame): DataFrame =
    from.agg(holds.as("holds"))
      .select(lit(name).as("gate"), lit(bound).as("bound"), col("holds"))

  /** Oracle SQL for a single-row gate — the constant the Spark side
    * must reproduce; `holds=false` hash-mismatches. */
  def gateOracle(name: String, bound: Double): String =
    s"SELECT '$name' AS gate, CAST($bound AS DOUBLE) AS bound, " +
      "TRUE AS holds"

  /** Recall of an approximate top-k result against the exact one, both
    * keyed (q_id, neighbor_id): |approx ∩ exact| / |exact| ≥ bound.
    * One broadcast-sized join — the frames are queries × k rows. */
  def topKRecallGate(exact: DataFrame, approx: DataFrame,
      name: String, bound: Double): DataFrame = {
    val hits = exact.select("q_id", "neighbor_id")
      .join(approx.select("q_id", "neighbor_id")
          .distinct().withColumn("hit", lit(1)),
        Seq("q_id", "neighbor_id"), "left_outer")
    gate(name, bound,
      sum(coalesce(col("hit"), lit(0))).cast("double") /
        count(lit(1)).cast("double") >= bound, hits)
  }

  /** Pair-level recall of an LSH candidate set against the exact pair
    * list (column pairs configurable: (d1,d2) docs / (v1,v2) vectors). */
  def pairRecallGate(exact: DataFrame, lsh: DataFrame,
      cols: (String, String), name: String, bound: Double): DataFrame = {
    val (c1, c2) = cols
    val hits = exact.select(c1, c2)
      .join(lsh.select(c1, c2).distinct().withColumn("hit", lit(1)),
        Seq(c1, c2), "left_outer")
    gate(name, bound,
      sum(coalesce(col("hit"), lit(0))).cast("double") /
        count(lit(1)).cast("double") >= bound, hits)
  }

  /** A26 gate: worst-case relative error of approx_count_distinct vs
    * the exact distinct count, across all event types. HLL++ at
    * rsd=0.05 stays well inside 3σ = 15%; the bound leaves margin. */
  def approxUsersGate(events: DataFrame, bound: Double = 0.15)
      : DataFrame =
    gate("approx_users_rel_err", bound,
      max(abs(col("approx_users") - col("exact_users")).cast("double") /
        col("exact_users").cast("double")) <= bound,
      EventOps.approxUsers(events))

  /** A26c gate: the sketch-store range answer vs an exact full-range
    * distinct count (the one query shape both paths can answer). */
  def hllRangeGate(events: DataFrame, bound: Double = 0.15): DataFrame = {
    val approx = EventOps.usersFromSketches(
      EventOps.dailyUserSketches(events), Long.MinValue, Long.MaxValue)
      .select(col("approx_users"))
    val exact = events.agg(
      countDistinct(col("user_id")).cast("double").as("exact_users"))
    gate("hll_range_rel_err", bound,
      max(abs(col("approx_users") - col("exact_users")) /
        col("exact_users")) <= bound, approx.crossJoin(exact))
  }

  /** A5b gate: RANK error of approx_percentile — the sketch's actual
    * contract (value-space error is data-dependent; rank error is
    * what the GK/KLL family bounds). For each event type, the
    * fraction of values strictly below the approx p50 must sit within
    * 0.5 ± eps, and likewise p95 — checked with one conditional
    * aggregate against the raw rows. */
  def approxPercentileGate(events: DataFrame, eps: Double = 0.01)
      : DataFrame = {
    val ap = EventOps.approxValueStats(events)
      .select(col("event_type"), col("p50_approx"), col("p95_approx"))
    val ranks = events.select(col("event_type"), col("value"))
      .join(broadcast(ap), "event_type")
      .groupBy("event_type")
      .agg(
        (sum(when(col("value") < col("p50_approx"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("r50_lo"),
        (sum(when(col("value") <= col("p50_approx"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("r50_hi"),
        (sum(when(col("value") < col("p95_approx"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("r95_lo"),
        (sum(when(col("value") <= col("p95_approx"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("r95_hi"))
    gate("approx_percentile_rank_err", eps,
      min(col("r50_hi") >= 0.5 - eps && col("r50_lo") <= 0.5 + eps &&
        col("r95_hi") >= 0.95 - eps && col("r95_lo") <= 0.95 + eps),
      ranks)
  }

  /** C60 gate: structural validity of the greedy MMR selection — per
    * query exactly k distinct picks at steps 1..k, all drawn from the
    * candidate pool (the greedy SEQUENCE itself is pinned in
    * DeterminismSpec; this is the driver-visible contract). */
  def mmrValidGate(emb: DataFrame, queries: DataFrame, k: Int = 5,
      nCandidates: Int = 20): DataFrame = {
    val pool = Similarity.bruteForceTopK(emb, queries, nCandidates)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
      .withColumn("in_pool", lit(1))
    val sel = Similarity.mmrSelect(emb, queries, k, nCandidates)
      .join(pool, Seq("q_id", "vec_id"), "left_outer")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("vec_id")).as("n_distinct"),
        countDistinct(col("step")).as("n_steps"),
        min(coalesce(col("in_pool"), lit(0))).as("all_in_pool"))
    gate("mmr_selection_valid", k.toDouble,
      min(col("n") === k && col("n_distinct") === k &&
        col("n_steps") === k && col("all_in_pool") === 1), sel)
  }

  /** A26b gate: count-min sketch frequency bounds — the CMS contract is
    * one-sided (estimate never BELOW the true count) with overcount
    * bounded by eps·N at the sketch's confidence. The sketch binary is
    * a single KB-sized aggregate row (collected like the codebook
    * sites, never data-sized) deserialized via Spark's public
    * CountMinSketch reader; estimates for the taxonomy-sized type list
    * are broadcast back against the exact distributed counts. */
  def cmsErrorGate(events: DataFrame, eps: Double = 0.001,
      boundEps: Option[Double] = None): DataFrame = {
    val bEps = boundEps.getOrElse(eps)
    val bin = events.select(expr(
      s"count_min_sketch(event_type, cast($eps as double), " +
        "cast(0.99 as double), 42)").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bin))
    val exact = events.groupBy("event_type")
      .agg(count(lit(1)).as("exact"))
    val types = exact.select("event_type").collect().map(_.getString(0))
    val spark = events.sparkSession
    import spark.implicits._
    val est = types.toSeq.map(t => (t, sketch.estimateCount(t)))
      .toDF("event_type", "est")
    gate("cms_freq_bounds", eps,
      min(col("est") >= col("exact")) &&
        max(col("est") - col("exact")).cast("double") <=
          sum(col("exact")).cast("double") * bEps + 1,
      exact.join(broadcast(est), "event_type"))
  }

  /** C7e gate: Lloyd's objective is monotone non-increasing, so the
    * refined centroids' total assignment cost must not exceed the seed
    * centroids' (tiny multiplicative slack for FP summation order),
    * and both passes must assign every vector. The fit runs on an
    * id-bounded slice so the seed count — and with it the broadcast
    * argmin's k — stays FIXED at any corpus size (the algorithm
    * contract does not strengthen with replicated data; unbounded
    * kmeansFit seeding is O(n/seedEvery) centroids, the documented C7e
    * scale caveat this gate deliberately sidesteps). */
  def kmeansDescentGate(emb: DataFrame, iters: Int = 3,
      maxId: Long = 50000L): DataFrame = {
    val e = emb.filter(col("vec_id") < maxId)
    val cost0 = Similarity.kmeansCost(e, Similarity.kmeansFit(e, 0))
      .select(col("cost").as("cost0"), col("n").as("n0"))
    val cost1 = Similarity.kmeansCost(e, Similarity.kmeansFit(e, iters))
      .select(col("cost").as("cost1"), col("n").as("n1"))
    gate("kmeans_objective_descent", iters.toDouble,
      min(col("cost1") <= col("cost0") * 1.000001 &&
        col("n0") === col("n1") && col("n1") > 0),
      cost0.crossJoin(cost1))
  }

  /** A121 gate: Misra-Gries heavy hitters — the deterministic,
    * mergeable counterpart of the CMS gate (never OVER-counts where
    * CMS never under-counts). Summaries of `k` counters build per
    * partition and merge driver-side (sum, then subtract the (k+1)-th
    * largest count and drop non-positive — Agarwal et al., Mergeable
    * Summaries, PODS'12); each summary is k-sized, so the collect is
    * metadata-sized like the codebook sites. The theorem holds for ANY
    * partitioning and merge order, which is what makes a constant-row
    * oracle valid at every swept scale:
    * (a) est ≤ true for every retained key,
    * (b) true − est ≤ (N − M)/(k+1) with N = stream length, M = mass
    *     retained in the merged summary,
    * (c) every key with true > N/(k+1) is retained (implied by (b),
    *     checked independently against the exact counts).
    * The exact reference is the in-engine keyed count in the SAME
    * plan; a regression in any of the three flips `holds`. */
  def mgHeavyHittersGate(events: DataFrame, k: Int = 64): DataFrame = {
    def mgMerge(a: scala.collection.mutable.HashMap[String, Long],
        b: Map[String, Long], cap: Int)
        : scala.collection.mutable.HashMap[String, Long] = {
      b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
      if (a.size > cap) {
        val cut = a.values.toArray.sorted(Ordering[Long].reverse)(cap)
        val dead = a.collect { case (key, c) if c <= cut => key }.toList
        dead.foreach(a.remove)
        a.mapValuesInPlace((_, c) => c - cut)
      }
      a
    }
    val partials = events.select(col("user_id").cast("string").as("u"))
      .rdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { r =>
          val u = r.getString(0)
          if (m.contains(u) || m.size < k) m(u) = m.getOrElse(u, 0L) + 1
          else { // decrement-all step, dropping zeros
            val dead = m.collect { case (key, 1L) => key }.toList
            m.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(m.remove)
          }
        }
        Iterator(m.toMap)
      }.collect()
    val merged = partials.foldLeft(
      scala.collection.mutable.HashMap.empty[String, Long])(
      (acc, p) => mgMerge(acc, p, k))
    val spark = events.sparkSession
    import spark.implicits._
    val est = merged.toSeq.toDF("u", "est")
    val exact = events.groupBy(col("user_id").cast("string").as("u"))
      .agg(count(lit(1)).as("exact"))
      .join(broadcast(est), Seq("u"), "left_outer")
    val retainedMass = merged.values.sum
    gate("mg_heavy_hitters", k.toDouble,
      min(coalesce(col("est"), lit(0L)) <= col("exact")) &&
        max(when(col("est").isNotNull, col("exact") - col("est"))
          .otherwise(lit(0L))).cast("double") <=
          (sum(col("exact")).cast("double") - lit(retainedMass.toDouble))
            / (k + 1).toDouble &&
        max(when(col("est").isNull,
            col("exact").cast("double") * (k + 1).toDouble)
          .otherwise(lit(0.0))) <= sum(col("exact")).cast("double"),
      exact)
  }

  /** C77 gate: whitening must actually whiten. On an id-bounded slice
    * (the C7e fixed-cost contract — the algorithm's property does not
    * strengthen with replicated data), fit [[Similarity.whiteningModel]],
    * apply the codegen'd transform, and recompute the covariance of
    * the OUTPUT: every pairwise correlation must fall under `tol`,
    * every diagonal must sit in (0, 1] + slack (λ/(λ+eps) ≤ 1 by
    * construction; a diagonal above 1 means the eigen solve went
    * wrong), and no vector may be dropped. Tolerances carry margin for
    * the float sums' partition-order drift — the property being gated
    * is structural (decorrelation), not bit-exactness. */
  def whiteningGate(emb: DataFrame, maxId: Long = 50000L,
      eps: Double = 1e-3, tol: Double = 0.05): DataFrame = {
    val slice = emb.filter(col("vec_id") < maxId)
    val white = Similarity.whiten(slice, eps)
    val d = white.select(size(col("embedding"))).head().getInt(0)
    val zero = new Array[Double](1 + d + d * d)
    val agg = white.select(col("embedding")).rdd.treeAggregate(zero)(
      (b, row) => {
        val v = row.getAs[scala.collection.Seq[Float]](0)
        if (v != null && v.length == d) {
          b(0) += 1
          var j = 0
          while (j < d) {
            val vj = v(j).toDouble
            b(1 + j) += vj
            var k = j
            while (k < d) { b(1 + d + j * d + k) += vj * v(k); k += 1 }
            j += 1
          }
        }
        b
      },
      (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    val nIn = slice.count()
    val n = agg(0)
    var holds = n > 0 && n == nIn.toDouble
    if (holds) {
      val mean = Array.tabulate(d)(i => agg(1 + i) / n)
      val cov = Array.tabulate(d, d)((j, k) => {
        val (lo, hi) = if (j <= k) (j, k) else (k, j)
        agg(1 + d + lo * d + hi) / n - mean(lo) * mean(hi)
      })
      var j = 0
      while (j < d && holds) {
        holds = cov(j)(j) > 0.0 && cov(j)(j) <= 1.0 + tol
        var k = j + 1
        while (k < d && holds) {
          val corr = cov(j)(k) / math.sqrt(cov(j)(j) * cov(k)(k))
          holds = math.abs(corr) <= tol
          k += 1
        }
        j += 1
      }
    }
    val spark = emb.sparkSession
    import spark.implicits._
    Seq(("whitening_decorrelates", tol, holds))
      .toDF("gate", "bound", "holds")
  }

  /** C7h gate: the served (pre-trained codebook) PQ path must be
    * row-identical to the inline-training path — same codebook
    * derivation, so this pins the cache/serve plumbing. */
  def multisetEqualGate(a: DataFrame, b: DataFrame, name: String)
      : DataFrame = {
    val cols = a.columns.toSeq.map(col)
    val counted = a.union(b).groupBy(cols: _*)
      .agg(count(lit(1)).as("c"))
    gate(name, 2.0, min(col("c") === 2) && count(lit(1)) > 0, counted)
  }
}
