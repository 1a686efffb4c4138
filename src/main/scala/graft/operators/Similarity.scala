package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2 C5-C7).
  *
  * Cosine is computed with custom codegen'd vector expressions
  * ([[graft.functions.VecDot]]/[[graft.functions.VecNorm2]] — the
  * equivalent `zip_with`+`aggregate` lambdas run interpreted), rounded to
  * 6 decimals at the output boundary so rank order and threshold filters
  * are deterministic across engines. Squared norms are precomputed once
  * per vector; accumulation order is identical to the left fold, so
  * oracle-checked outputs are unchanged.
  *
  * Scale design: brute force is O(Q·N) with the query side broadcast —
  * correct baseline and fine for small Q. The IVF variant is the scale
  * path: vectors are assigned to coarse cells once (shuffle on cell id),
  * queries probe only their nearest cells, so per-query work drops to the
  * probed fraction. At 100 TB you'd persist the cell assignment
  * (bucketed by cell) and broadcast only the centroid table.
  */
object Similarity {

  import graft.functions.exprs.{vec_dot, vec_norm2, hyperplane_sig}

  private def cos6(ea: String, eb: String, na: String, nb: String) =
    round(vec_dot(col(ea), col(eb)) / (sqrt(col(na)) * sqrt(col(nb))), 6)

  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("n2", vec_norm2(col("embedding")))

  /** C5: exact cosine near-dup pairs within a blocking predicate. */
  def cosinePairs(emb: DataFrame, tau: Double): DataFrame = {
    val e = withNorm(emb).select(col("vec_id"), col("embedding"), col("n2"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        cos6("a.embedding", "b.embedding", "a.n2", "b.n2").as("cos6"))
      .filter(col("cos6") >= tau)
  }

  /** C6: brute-force cosine top-k for a (small, broadcast) query set. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cand = withNorm(emb)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
        col("n2").as("nb"))
    val q = withNorm(queries)
      .select(col("vec_id").as("q_id"), col("embedding").as("ea"),
        col("n2").as("na"))
    val scored = cand.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cos6("ea", "eb", "na", "nb").as("cos6"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos6").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
  }

  /** C7b: random-hyperplane LSH near-dup candidates over embeddings —
    * the shuffle-free-signature scale path. Each of `bits` hyperplanes is
    * a Rademacher (+1/−1) vector derived deterministically from
    * xxhash64(plane, dim); sign(v·h) bits are banded like SimHash and
    * bucket-colliding pairs are verified with exact cosine. Signature
    * computation is the same explode + narrow-aggregate shape as
    * Dedup.minhashLsh (codegen-friendly, map-side partial sums).
    */
  def hyperplaneLshPairs(
      emb: DataFrame, tau: Double,
      bits: Int = 32, bands: Int = 8): DataFrame = {
    require(bits % bands == 0)
    val rows = bits / bands
    // whole signature in one codegen'd pass per vector (identical bits to
    // the exploded per-(component, plane) formulation this replaces, which
    // needed a |dims| * bits row blowup plus a shuffle to reassemble);
    // band b = `rows` consecutive signature bits, MSB-first within band
    val sigs = emb.select(col("vec_id"),
      hyperplane_sig(col("embedding"), bits).as("sig"))
    val bandVals = sigs
      .select(col("vec_id"), col("sig"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("band"))
      .select(col("vec_id"), col("band"),
        expr(s"cast(shiftright(sig, band * $rows) & ${(1 << rows) - 1} as int)")
          .as("bv"))
    val cand = bandVals.as("a")
      .join(bandVals.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    val e = withNorm(emb)
      .select(col("vec_id"), col("embedding"), col("n2"))
    cand
      .join(e.select(col("vec_id").as("v1"), col("embedding").as("ea"),
        col("n2").as("na")), "v1")
      .join(e.select(col("vec_id").as("v2"), col("embedding").as("eb"),
        col("n2").as("nb")), "v2")
      .select(col("v1"), col("v2"), cos6("ea", "eb", "na", "nb").as("cos6"))
      .filter(col("cos6") >= tau)
  }

  /** IVF training step: per-group component means (one k-means iteration
    * over the current assignment). Components explode to (group, dim)
    * rows — one shuffle with map-side partial sums; at 100 TB the
    * shuffle carries |groups| x dims partials per map task, not vectors.
    * Sums run over round(v * 1e6) integers so results are exact and
    * engine-portable (same fixed-grid trick as the cosine rounding).
    */
  def centroids(emb: DataFrame, groupCol: String): DataFrame =
    emb
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col(groupCol), col("i"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(cast(v as double) * 1000000, 0) as bigint)"))
          .as("sum6"))
      .select(col(groupCol), col("i").cast("bigint").as("i"), col("n"),
        (col("sum6").cast("double") / col("n").cast("double") / 1e6)
          .as("centroid"))

  /** Full Lloyd-iteration k-means fit for the IVF coarse quantizer:
    * seed deterministically (every `seedEvery`-th vector), then alternate
    * assign (broadcast centroids, one codegen'd argmin pass) and update
    * ([[centroids]] — one partial-agg shuffle) for `iters` rounds.
    * Lineage is truncated per round (localCheckpoint) so the plan stays
    * flat; at 100 TB each round is one scan + one |k|·dims-sized shuffle.
    * Returns (cell, i, n, centroid) rows for the final assignment.
    */
  def kmeansFit(emb: DataFrame, iters: Int = 3,
      seedEvery: Int = 97): DataFrame = {
    var cents: DataFrame = centroids(
      emb.filter(col("vec_id") % seedEvery === 0)
        .withColumn("cell", col("vec_id")), "cell")
    (1 to iters).foreach { _ =>
      // reassemble centroid vectors distributed: a narrow groupBy over
      // |k|·dims rows, then broadcast the |k| vectors for a codegen'd
      // argmin pass (the interpreted transform lambda touches only the
      // k broadcast rows, never the data side)
      val cvecs = cents.groupBy("cell")
        .agg(array_sort(collect_list(struct(col("i"), col("centroid"))))
          .as("pairs"))
        .select(col("cell"),
          expr("transform(pairs, p -> cast(p.centroid as float))").as("cvec"))
      val assignW = Window.partitionBy("vec_id")
        .orderBy(col("d2"), col("cell"))
      val assigned = emb.crossJoin(broadcast(cvecs))
        .select(col("vec_id"), col("embedding"), col("cell"),
          (vec_dot(col("embedding"), col("embedding"))
            - vec_dot(col("embedding"), col("cvec")) * 2
            + vec_dot(col("cvec"), col("cvec"))).as("d2"))
        .withColumn("rn", row_number().over(assignW))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cell"))
      cents = centroids(assigned, "cell").localCheckpoint(eager = true)
    }
    cents
  }

  /** C7: IVF-style ANN: deterministic coarse centroids (every 97th vector),
    * one-time nearest-cell assignment, queries probe `probes` cells.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
      probes: Int = 2, centEvery: Int = 97): DataFrame = {
    val cents = withNorm(emb.filter(col("vec_id") % centEvery === 0))
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
        col("n2").as("cn"))
    val e = withNorm(emb)
    val assignW = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("n2"), col("cent_id"),
        cos6("embedding", "ce", "n2", "cn").as("ccos"))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
        col("n2").as("nb"), col("cent_id").as("cell"))
    val qW = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("cent_id"))
    val qCells = withNorm(queries)
      .select(col("vec_id").as("q_id"), col("embedding").as("ea"),
        col("n2").as("na"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("ea"), col("na"), col("cent_id"),
        cos6("ea", "ce", "na", "cn").as("qcos"))
      .withColumn("rn", row_number().over(qW))
      .filter(col("rn") <= probes)
      .select(col("q_id"), col("ea"), col("na"), col("cent_id").as("cell"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos6").desc, col("neighbor_id"))
    qCells.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cos6("ea", "eb", "na", "nb").as("cos6"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
  }
}
