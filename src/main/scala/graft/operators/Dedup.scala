package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication family (SURVEY §2 C1-C4 + A6).
  *
  * Scale design: exact dedup and MinHash-LSH are the 100 TB paths — both
  * are single-shuffle (hash of text / band bucket). The exact all-pairs
  * jaccard operator is the small-scale oracle / verification path; at
  * scale you run [[minhashLsh]], whose candidate set is proportional to
  * the number of true near-dups, then verify candidates exactly.
  * Signatures are computed per-row with codegen'd higher-order functions
  * (`transform`/`array_min`/`xxhash64`) — no shuffle, no UDFs.
  */
object Dedup {

  /** doc_id + distinct word-trigram array (docs with <3 tokens drop out). */
  def withTrigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(0, size(ws) - 3),
          |  i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))""".stripMargin)
        .as("grams"))

  /** C1: exact dedup via content hash; deterministic keeper = min doc_id. */
  def exactDocs(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))

  /** C4: exact n-gram Jaccard near-dup pairs (gram-explode self-join).
    * The inverted-index join keys on the gram, so common grams fan out —
    * at scale cap gram document-frequency (stop-gram removal) or use
    * [[minhashLsh]]; this operator is the exactness baseline.
    */
  def ngramJaccard(docs: DataFrame, tau: Double): DataFrame = {
    val grams = withTrigrams(docs)
    val g = grams.select(col("doc_id"), explode(col("grams")).as("g"))
    val sizes =
      grams.select(col("doc_id"), size(col("grams")).cast("bigint").as("n"))
    val inter = g.as("a")
      .join(g.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jac",
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jac") >= tau)
      .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"), col("jac"))
  }

  /** C2: MinHash + LSH near-dup detection.
    * numHashes signatures from the seeded xxhash64 family, banded into
    * `bands` groups; docs colliding in any band become candidates, which
    * are then verified with exact Jaccard (array_intersect on the gram
    * sets). False negatives are the usual LSH probability; no false
    * positives survive verification.
    */
  def minhashLsh(
      docs: DataFrame, tau: Double,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val grams = withTrigrams(docs)
    // Signature via explode + numHashes codegen'd hash columns + hash
    // aggregate: stays inside whole-stage codegen with map-side partial
    // min() — the formulation that scales (higher-order-function lambdas
    // run interpreted and measured ~10x slower).
    val g = grams.select(col("doc_id"), explode(col("grams")).as("g"))
    val minCols = (0 until numHashes)
      .map(j => min(expr(s"xxhash64($j, g)")).as(s"h$j"))
    val sig = g.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { bi =>
        expr((bi * rows until (bi + 1) * rows)
          .map(r => s"h$r").mkString(s"xxhash64($bi, ", ", ", ")"))
      }: _*)).as(Seq("band", "bh")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    candidates
      .join(grams.select(col("doc_id").as("d1"), col("grams").as("ga")), "d1")
      .join(grams.select(col("doc_id").as("d2"), col("grams").as("gb")), "d2")
      .withColumn("jac",
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))).cast("double"))
      .filter(col("jac") >= tau)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** C3: 64-bit SimHash near-dup detection. The fingerprint is built
    * per-row from token hashes; candidate pairs collide on one of four
    * 16-bit bands, then are kept if total Hamming distance <= maxHamming.
    */
  def simhash(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    // Same codegen-friendly shape as minhashLsh: explode distinct tokens,
    // one codegen'd hash column, then 64 conditional-sum aggregates (one
    // per fingerprint bit) with map-side partial aggregation.
    val toks = docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("t"))
      .withColumn("h", expr("xxhash64(t)"))
    val bitCols = (0 until 64).map(k =>
      sum(expr(s"case when (shiftright(h, $k) & 1) = 1 then 1 else -1 end"))
        .as(s"s$k"))
    val sig = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    // pack sign bits into four 16-bit band values (plain int arithmetic,
    // stays in codegen; no 64-bit value needed so no ANSI overflow risk)
    val bandVals = (0 until 4).map { b =>
      expr((0 until 16)
        .map(i => s"(case when s${b * 16 + i} >= 0 then 1 else 0 end) * ${1 << (15 - i)}")
        .mkString(" + ")).as(s"b$b")
    }
    val withBands = sig.select(col("doc_id") +: bandVals: _*)
      .withColumn("bands16", array((0 until 4).map(b => col(s"b$b")): _*))
    val banded = withBands.select(col("doc_id"), col("bands16"),
      posexplode(col("bands16")).as(Seq("band", "bv")))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.bands16").as("ba"), col("b.bands16").as("bb"))
      .distinct()
    pairs
      .withColumn("hamming", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }
}
