package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2 C5-C7).
  *
  * Cosine is computed with codegen'd higher-order functions
  * (`zip_with` + `aggregate` fold in double), rounded to 6 decimals at the
  * output boundary so rank order and threshold filters are deterministic
  * across engines. Squared norms are precomputed once per vector.
  *
  * Scale design: brute force is O(Q·N) with the query side broadcast —
  * correct baseline and fine for small Q. The IVF variant is the scale
  * path: vectors are assigned to coarse cells once (shuffle on cell id),
  * queries probe only their nearest cells, so per-query work drops to the
  * probed fraction. At 100 TB you'd persist the cell assignment
  * (bucketed by cell) and broadcast only the centroid table.
  */
object Similarity {

  private val norm2Expr =
    "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)"

  private def cos6(ea: String, eb: String, na: String, nb: String) =
    expr(s"""round(
      aggregate(zip_with($ea, $eb, (x, y) -> cast(x as double) * cast(y as double)),
                cast(0.0 as double), (acc, v) -> acc + v)
      / (sqrt($na) * sqrt($nb)), 6)""")

  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("n2", expr(norm2Expr))

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
    // (vec_id, dim, value) rows, then one row per (vec, plane, dim) with
    // the Rademacher sign applied — all plain codegen'd expressions
    val comps = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "v")))
    val contrib = comps
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"),
        explode(expr(s"sequence(0, ${bits - 1})")).as("k"))
      .select(col("vec_id"), col("k"),
        expr("case when (shiftright(xxhash64(k, i), 7) & 1) = 1 " +
          "then v else -v end").as("c"))
    val bandVals = contrib
      .groupBy("vec_id", "k").agg(sum("c").as("proj"))
      .select(col("vec_id"), expr(s"k div $rows").as("band"),
        expr(s"(case when proj >= 0 then 1 else 0 end) * " +
          s"shiftleft(1, $rows - 1 - (k % $rows))").as("bit"))
      .groupBy("vec_id", "band")
      .agg(sum("bit").cast("int").as("bv"))
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
