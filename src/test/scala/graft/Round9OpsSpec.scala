package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, Dedup, GraphOps, Similarity}

/** Round-9 surfaces: the train-once-serve-many PQ codebook path, the
  * reliable-checkpoint opt-in for the iterative loops, and the
  * washPairs packed-key guard.
  */
class Round9OpsSpec extends TestSparkSession {

  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // runs FIRST (declaration order): the shared session must not have a
  // checkpoint dir yet, or the missing-dir guard can't be exercised
  test("reliable-checkpoint flag without a checkpoint dir fails " +
      "loudly, not at iteration 9") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "another suite already set a checkpoint dir on the shared session")
    spark.conf.set(Checkpoints.ReliableConf, "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Checkpoints.truncate(spark.range(3).toDF())
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset(Checkpoints.ReliableConf)
  }

  test("pqTopK with an injected codebook is bit-identical to the " +
      "self-trained path") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
    val cb = Similarity.pqCodebook(emb, 64).localCheckpoint(eager = true)
    val served = rows(Similarity.pqTopK(emb, q, 64, 5,
      codebook = Some(cb)))
    val trained = rows(Similarity.pqTopK(emb, q, 64, 5))
    assert(served === trained && served.nonEmpty)
  }

  test("ivfpqTopK with injected codebook AND quantizer is " +
      "bit-identical to the self-trained path") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
    val cb = Similarity.pqCodebook(emb, 64).localCheckpoint(eager = true)
    val cents = Similarity.ivfCoarseCentroids(emb)
      .localCheckpoint(eager = true)
    val served = rows(Similarity.ivfpqTopK(emb, q, 64, 5,
      centroids = Some(cents), codebook = Some(cb)))
    val trained = rows(Similarity.ivfpqTopK(emb, q, 64, 5))
    assert(served === trained && served.nonEmpty)
  }

  test("reliable-checkpoint opt-in: iterative loops complete with " +
      "spark.graft.reliableCheckpoint=true and match the local path " +
      "bit for bit") {
    val ev = Tables.events(spark, sfDir)
    val prLocal = rows(GraphOps.coactivityPagerank(ev))
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("d1", "d2")
    val labLocal = rows(Dedup.canonicalize(pairs))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Checkpoints.ReliableConf, "true")
    try {
      assert(rows(GraphOps.coactivityPagerank(ev)) === prLocal)
      assert(rows(Dedup.canonicalize(pairs)) === labLocal)
      assert(labLocal === Set(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L),
        Seq(10L, 10L), Seq(11L, 10L)))
      // the checkpoint dir must actually carry the reliable blocks —
      // otherwise the flag silently fell through to localCheckpoint
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val files =
        try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close()
      assert(files > 0, "reliable checkpoints must persist to the dir")
    } finally {
      spark.conf.unset(Checkpoints.ReliableConf)
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir)))
    }
  }

  test("washPairs packed-key bound: 2^31-1 dense ranks pack positive, " +
      "2^31 overflows — the boundary the dictionary guard enforces") {
    // can't materialize 2^31 wallets in a test; pin the guard's
    // arithmetic instead — positivity of min*2^32+max in a signed long
    // requires min < 2^31 (NOT 2^32, the round-8 comment's overclaim)
    assert(((1L << 31) * 4294967296L + 1L) < 0,
      "2^31 dense ranks must overflow the signed packed key")
    assert((((1L << 31) - 1) * 4294967296L + ((1L << 31) - 1)) > 0,
      "2^31-1 dense ranks must still pack positive")
    // and the shipped query still runs green under the guard
    val out = graft.operators.EventOps
      .washPairs(Tables.events(spark, sfDir))
    assert(out.columns.toSeq ===
      Seq("wallet_a", "wallet_b", "hours_ab", "hours_ba"))
    assert(out.count() >= 0)
  }
}
