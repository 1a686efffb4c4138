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
