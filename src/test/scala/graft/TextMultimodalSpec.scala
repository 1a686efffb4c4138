package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.TextAnalysis

class TextMultimodalSpec extends TestSparkSession {

  private def docs = Tables.documents(spark, sfDir)

  test("langId predicts a language for every doc") {
    val res = TextAnalysis.langId(docs)
    assert(res.count() == docs.count())
    assert(res.filter(col("pred_lang").isNull).count() == 0)
  }

  test("quality scores are in [0, 1] for this corpus") {
    val q = TextAnalysis.quality(docs)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1.0)
      .count() == 0)
    assert(q.filter(col("n_tok") <= 0).count() == 0)
  }

  test("token counts: bpe-ish >= whitespace tokens") {
    val t = TextAnalysis.tokenCounts(docs)
    assert(t.filter(col("total_bpe_tokens") < col("total_ws_tokens")).count() == 0)
  }

  test("fingerprint: identical texts share md5 and rolling hash") {
    import spark.implicits._
    val d = Seq((1L, "the quick brown fox jumps over it"),
      (2L, "the quick brown fox jumps over it"),
      (3L, "something else entirely different here")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("content_md5"), r.getAs[Long]("roll_min"))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("repetition: degenerate doc maxes out, all-distinct doc zeroes") {
    import spark.implicits._
    val d = Seq((1L, "spam spam spam spam"),
      (2L, "one two three four"),
      (3L, "a b a b a b")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(r(1L).getAs[Double]("dup_word_frac") == 0.75)
    assert(r(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(r(2L).getAs[Long]("top_bigram_cnt") == 1L)
    // "a b" appears 3 times of 5 bigrams
    assert(r(3L).getAs[Long]("top_bigram_cnt") == 3L)
    assert(r(3L).getAs[Long]("n_bigrams") == 5L)
  }

  test("multimodal: payload plumbing and batched stub decode") {
    val feats = Multimodal.extractFeatures(Multimodal.withPayload(docs))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.byte_len >= 0)
      assert(f.n_frames == f.byte_len / Multimodal.StubCodec.FrameSize + 1)
      assert(f.frame_offsets.length == f.n_frames)
      assert(f.brightness >= 0 && f.brightness <= 255)
    }
  }

  test("multimodal: resize bounds the payload") {
    val b = Array.tabulate[Byte](1000)(_.toByte)
    assert(Multimodal.StubCodec.resize(b, 64).length == 64)
    assert(Multimodal.StubCodec.resize(b, 5000).length == 1000)
  }
}
