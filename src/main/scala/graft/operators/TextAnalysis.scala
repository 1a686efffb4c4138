package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.exprs.rolling_min

/** Text-corpus analysis operators (SURVEY §2 C8-C11): language ID, quality
  * scoring, token counting, fingerprinting. Pure column expressions —
  * codegen'd end to end, trivially data-parallel at 100 TB.
  */
object TextAnalysis {

  /** C8: marker-word n-gram language scorer with fixed tie priority. */
  def langId(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_en", regexp_count(col("text"), lit("\\b(the|is|and)\\b")).cast("bigint"))
      .withColumn("n_de", regexp_count(col("text"), lit("\\b(der|und|die)\\b")).cast("bigint"))
      .withColumn("n_es", regexp_count(col("text"), lit("\\b(el|la|los)\\b")).cast("bigint"))
      .withColumn("n_fr", regexp_count(col("text"), lit("\\b(le|les|des)\\b")).cast("bigint"))
      .withColumn("pred_lang", expr(
        """case when n_en >= greatest(n_de, n_es, n_fr) and n_en > 0 then 'en'
          |     when n_de >= greatest(n_es, n_fr) and n_de > 0 then 'de'
          |     when n_es >= n_fr and n_es > 0 then 'es'
          |     when n_fr > 0 then 'fr'
          |     else 'unk' end""".stripMargin))
      .select(col("doc_id"), col("n_en"), col("n_de"), col("n_es"),
        col("n_fr"), col("pred_lang"), col("lang"))

  /** C9: quality scoring from length/punctuation/stopword ratios. */
  def quality(docs: DataFrame): DataFrame =
    qualityCols(docs)
      .select(col("doc_id"), col("n_chars_t"), col("n_tok"), col("n_stop"),
        col("n_punct"), col("avg_wlen"), col("stop_ratio"),
        col("punct_ratio"), col("quality_score"))

  /** Shared score computation for [[quality]] and [[calibratedQuality]] —
    * ONE definition so the calibrated percentile ranks exactly the same
    * doubles the raw report exposes. */
  private def qualityCols(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_chars_t", length(col("text")).cast("bigint"))
      .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
      .withColumn("n_stop",
        regexp_count(col("text"), lit("\\b(the|a|of|to|and)\\b")).cast("bigint"))
      .withColumn("n_punct", regexp_count(col("text"), lit("[.,!?;:]")).cast("bigint"))
      .withColumn("avg_wlen",
        length(regexp_replace(col("text"), lit(" "), lit("")))
          .cast("double") / col("n_tok").cast("double"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tok").cast("double"))
      .withColumn("punct_ratio",
        col("n_punct").cast("double") / col("n_chars_t").cast("double"))
      .withColumn("quality_score", expr(
        "least(cast(n_tok as double) / 100.0, 1.0) * (1.0 - punct_ratio) * " +
          "(0.5 + stop_ratio)"))

  /** Per-doc quality score fixed to the 1e-6 grid as an exact BIGINT —
    * the RANKABLE form of [[quality]]'s double (repo convention: scores
    * grid-fix before any ranking or thresholding, so both engines order
    * identical integers — README "Determinism engineering"). */
  def qualityScore6(docs: DataFrame): DataFrame =
    qualityCols(docs).select(col("doc_id"),
      expr("cast(round(quality_score * 1000000) as bigint)").as("q6"))

  /** C71: per-source curation scorecard — the one-row-per-source
    * dashboard an ingestion run reads before admitting a source:
    * volume (docs, whitespace tokens), exact-dup exposure split into
    * within-corpus and CROSS-source copies (a source whose content
    * already exists elsewhere adds volume but no signal), mean
    * grid-fixed quality, and the [[filterChain]] reject rate — the
    * C1/C9/C18/C19 signals composed so curation policy reads ONE
    * table instead of four.
    *
    * Shape (100 TB): one scan builds doc-COMPACT rows (ids, md5,
    * counts — never the text), materialized once and read by both the
    * signature rollup and the per-source aggregate; dup exposure is a
    * signature-keyed aggregate joined back on the hash (no text
    * self-join anywhere); the final rollup is source-keyed. Integer
    * columns throughout; the four ratio doubles derive from them. */
  def sourceScorecard(docs: DataFrame, minTok: Int = 5,
      maxTok: Int = 5000, minQuality: Double = 0.3): DataFrame = {
    val fc = filterChain(docs, minTok, maxTok, minQuality)
      .select(col("doc_id"), col("n_tok"),
        expr("cast(round(quality_score * 1000000) as bigint)").as("q6"),
        col("kept"))
    val sig = docs.select(col("doc_id"), col("source"),
        md5(col("text").cast("binary")).as("h"))
      .join(fc, "doc_id")
      .localCheckpoint() // signature rollup + source aggregate share it
    val hstats = sig.groupBy("h").agg(
      count(lit(1)).as("n_copies"),
      countDistinct("source").as("n_sources"))
    sig.join(hstats, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_ws_tokens"),
        count(when(col("n_copies") > 1, 1)).as("n_dup_docs"),
        count(when(col("n_sources") > 1, 1)).as("n_cross_dup_docs"),
        sum("q6").as("sum_q6"),
        count(when(!col("kept"), 1)).as("n_rejected"))
      .select(col("source"), col("n_docs"), col("total_ws_tokens"),
        col("n_dup_docs"), col("n_cross_dup_docs"), col("n_rejected"),
        (col("n_dup_docs").cast("double") /
          col("n_docs").cast("double")).as("dup_ratio"),
        (col("n_cross_dup_docs").cast("double") /
          col("n_docs").cast("double")).as("cross_dup_ratio"),
        (col("sum_q6").cast("double") /
          col("n_docs").cast("double")).as("avg_q6"),
        (col("n_rejected").cast("double") /
          col("n_docs").cast("double")).as("reject_ratio"))
  }

  /** C10: whitespace + BPE-ish regex token counts, aggregated per source. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws_tok", size(split(col("text"), " ")))
      .withColumn("bpe_tok",
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tok").as("total_ws_tokens"),
        sum("bpe_tok").as("total_bpe_tokens"))
      .withColumn("avg_ws_tokens",
        col("total_ws_tokens").cast("double") / col("n_docs").cast("double"))

  /** C11: per-document fingerprints: content md5 (portable) + winnowing
    * rolling-hash minimum (custom codegen'd expression). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_md5"),
      length(col("text")).cast("bigint").as("n_chars_t"),
      rolling_min(col("text"), 16).as("roll_min"))

  /** C18: per-source corpus statistics — the dashboard a data-curation run
    * starts from. One partial-agg shuffle on `source`; the distinct-text
    * count hashes to md5 first so the shuffle carries 16-byte digests, not
    * document bodies (at 100 TB the texts never leave the map side).
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text").cast("binary")))
      .withColumn("n_chars_t", length(col("text")).cast("bigint"))
      .withColumn("ws_tok", size(split(col("text"), " ")).cast("bigint"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text_md5")).as("n_unique_texts"),
        sum("n_chars_t").as("total_chars"),
        sum("ws_tok").as("total_ws_tokens"),
        min("n_chars_t").as("min_chars"),
        max("n_chars_t").as("max_chars"))
      .withColumn("dup_ratio",
        (col("n_docs") - col("n_unique_texts")).cast("double") /
          col("n_docs").cast("double"))

  /** C18b: MERGEABLE corpus statistics — the maintenance path for C18 at
    * 100 TB: a new batch is reduced to per-(source, digest) partials and
    * merged with the standing partials table, so the base corpus is
    * never rescanned. The partial is digest-level (count per distinct
    * text), which is what makes `n_unique_texts`/`dup_ratio` —
    * NOT mergeable from plain counters — associative: distinctness is a
    * property of the digest key set. Invariant (spec + oracle):
    * `finalize(merge(partial(A), partial(B))) == corpusStats(A ∪ B)`. */
  def corpusStatsPartial(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text").cast("binary")))
      .groupBy("source", "text_md5")
      .agg(count(lit(1)).as("cnt"),
        first(length(col("text")).cast("bigint")).as("chars"),
        first(size(split(col("text"), " ")).cast("bigint")).as("ws_tok"))

  /** Merge partial tables (associative, any batch order). */
  def mergeCorpusStatsPartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("source", "text_md5")
      .agg(sum("cnt").as("cnt"), first("chars").as("chars"),
        first("ws_tok").as("ws_tok"))

  /** Finalize merged partials into the C18 report shape. */
  def finalizeCorpusStats(partials: DataFrame): DataFrame =
    partials.groupBy("source")
      .agg(sum("cnt").as("n_docs"),
        count(lit(1)).as("n_unique_texts"),
        sum(col("chars") * col("cnt")).as("total_chars"),
        sum(col("ws_tok") * col("cnt")).as("total_ws_tokens"),
        min("chars").as("min_chars"),
        max("chars").as("max_chars"))
      .withColumn("dup_ratio",
        (col("n_docs") - col("n_unique_texts")).cast("double") /
          col("n_docs").cast("double"))

  /** C19: training-data filter chain — length, language, and quality gates
    * composed in one codegen'd projection (single scan, no shuffle), with
    * the first failing gate recorded as the reject reason so curation runs
    * can report *why* documents drop, not just how many.
    */
  def filterChain(docs: DataFrame, minTok: Int = 5, maxTok: Int = 5000,
      minQuality: Double = 0.3): DataFrame =
    docs
      .withColumn("n_chars_t", length(col("text")).cast("bigint"))
      .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
      .withColumn("n_stop",
        regexp_count(col("text"), lit("\\b(the|a|of|to|and)\\b")).cast("bigint"))
      .withColumn("n_punct",
        regexp_count(col("text"), lit("[.,!?;:]")).cast("bigint"))
      .withColumn("quality_score", expr(
        "least(cast(n_tok as double) / 100.0, 1.0) * " +
          "(1.0 - cast(n_punct as double) / cast(n_chars_t as double)) * " +
          "(0.5 + cast(n_stop as double) / cast(n_tok as double))"))
      .withColumn("n_en", regexp_count(col("text"), lit("\\b(the|is|and)\\b")).cast("bigint"))
      .withColumn("n_de", regexp_count(col("text"), lit("\\b(der|und|die)\\b")).cast("bigint"))
      .withColumn("n_es", regexp_count(col("text"), lit("\\b(el|la|los)\\b")).cast("bigint"))
      .withColumn("n_fr", regexp_count(col("text"), lit("\\b(le|les|des)\\b")).cast("bigint"))
      .withColumn("pred_lang", expr(
        """case when n_en >= greatest(n_de, n_es, n_fr) and n_en > 0 then 'en'
          |     when n_de >= greatest(n_es, n_fr) and n_de > 0 then 'de'
          |     when n_es >= n_fr and n_es > 0 then 'es'
          |     when n_fr > 0 then 'fr'
          |     else 'unk' end""".stripMargin))
      .withColumn("reject_reason", expr(
        s"""case when n_tok < $minTok then 'too_short'
           |     when n_tok > $maxTok then 'too_long'
           |     when pred_lang <> 'en' then 'lang'
           |     when quality_score < $minQuality then 'low_quality'
           |     else 'kept' end""".stripMargin))
      .select(col("doc_id"), col("n_tok"), col("quality_score"),
        col("pred_lang"), col("reject_reason"),
        (col("reject_reason") === "kept").as("kept"))

  /** C22: per-source vocabulary statistics — distinct tokens, token
    * volume, and type-token ratio (lexical-diversity signal for corpus
    * curation). explode → two-level aggregation, both with map-side
    * partials; the shuffle carries (source, token) pairs once, not
    * documents.
    */
  def vocabStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        sum("n").as("n_tokens"),
        max("n").as("max_token_freq"))
      .withColumn("type_token_ratio",
        col("n_types").cast("double") / col("n_tokens").cast("double"))

  /** C39: vocabulary drift between corpus versions — the token-level
    * sibling of [[graft.operators.Dedup.corpusDiff]]: how far the token
    * distribution moved between two snapshots (data-mix regression check
    * before a training run). The per-token drift term is kept integer —
    * |n1·T2 − n2·T1| with T1/T2 the version totals — so the sum is exact
    * and engine-independent; the scaled L1 distance divides once at the
    * end. Token counts shuffle; documents never do.
    */
  def vocabDrift(oldDocs: DataFrame, newDocs: DataFrame, topK: Int = 20)
      : DataFrame = {
    def counts(docs: DataFrame) = docs
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
    val a = counts(oldDocs).withColumnRenamed("n", "n1")
    val b = counts(newDocs).withColumnRenamed("n", "n2")
    val joined = a.join(b, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
    val tot = joined.agg(sum("n1").as("t1"), sum("n2").as("t2"))
    // top-k via orderBy+limit (TakeOrdered merge), then rank the k
    // survivors by counting strict predecessors (triangular self-join
    // over k rows) — the vocab table never funnels through one window
    // task, and neither do the survivors
    val top = joined.join(broadcast(tot))
      .withColumn("drift_num",
        abs(col("n1") * col("t2") - col("n2") * col("t1")))
      .orderBy(col("drift_num").desc, col("token"))
      .limit(topK)
    top.as("a")
      .join(top.as("b"),
        col("b.drift_num") > col("a.drift_num") ||
          (col("b.drift_num") === col("a.drift_num") &&
            col("b.token") < col("a.token")), "left")
      .groupBy(col("a.token").as("token"), col("a.n1").as("n1"),
        col("a.n2").as("n2"), col("a.drift_num").as("drift_num"),
        col("a.t1").as("t1"), col("a.t2").as("t2"))
      .agg((count(col("b.token")) + 1).as("rk"))
      .select(col("token"), col("n1"), col("n2"), col("drift_num"),
        (col("drift_num").cast("double") /
          (col("t1") * col("t2")).cast("double")).as("drift"), col("rk"))
  }

  /** C37: per-document lexical commonness — the mean corpus frequency of
    * a document's tokens (documents full of rare tokens are the OCR-
    * noise/gibberish tail; [[rareTokenRate]] reports the same signal per
    * source, this scores each document for filtering). Corpus
    * frequencies are integers, the per-doc sum is an integer, and the
    * mean is one double division — bit-stable across engines. Tokens
    * shuffle once for the frequency table and once for the key-aligned
    * join-back.
    */
  def lexicalCommonness(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
    val freq = toks.groupBy("token").agg(count(lit(1)).as("cf"))
    toks.join(freq, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("cf").as("total_cf"))
      .withColumn("avg_cf",
        col("total_cf").cast("double") / col("n_tok").cast("double"))
  }

  /** C33: per-source distinctive terms (tf-idf shape) — the tokens most
    * characteristic of each source: high in-source frequency, low spread
    * across other sources. Inverse document frequency is kept rational
    * (score = tf / n_sources_with_token — integer inputs, one double
    * division) so both engines agree bit-exactly with no log() in the
    * compare path. The (source, token) agg carries map-side partials; the
    * tiny source-spread table joins back key-aligned on token; top-k per
    * source is a WindowGroupLimit, not a global sort.
    */
  def distinctiveTerms(docs: DataFrame, k: Int = 10): DataFrame = {
    val toks = docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val spread = tf.groupBy("token")
      .agg(count(lit(1)).as("n_sources"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("score").desc, col("token"))
    tf.join(spread, "token")
      .withColumn("score",
        col("tf").cast("double") / col("n_sources").cast("double"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("source"), col("token"), col("tf"), col("n_sources"),
        col("score"), col("rk"))
  }

  /** C21: PII scrubbing — mask e-mail addresses and long digit runs
    * before a corpus ships to training. Pure codegen'd projection (single
    * scan, no shuffle). Patterns stick to character classes + bounded
    * quantifiers so Java regex and RE2-family engines agree byte-for-byte;
    * counts are emitted alongside so curation can report scrub rates.
    */
  def scrubPii(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val digits = "[0-9]{9,}"
    docs
      .withColumn("n_emails", regexp_count(col("text"), lit(email)).cast("bigint"))
      .withColumn("n_digit_runs", regexp_count(col("text"), lit(digits)).cast("bigint"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          digits, "<NUM>"))
      .select(col("doc_id"), col("n_emails"), col("n_digit_runs"),
        md5(col("scrubbed").cast("binary")).as("scrubbed_md5"),
        length(col("scrubbed")).cast("bigint").as("scrubbed_len"))
  }

  /** C24: repetition signals (Gopher-style quality filters): per-document
    * duplicate-word fraction and top-bigram fraction — the standard "is
    * this document degenerate/boilerplate" gates a curation run applies
    * before training. Tokens shuffle once on `doc_id` (the bigram window
    * and both per-doc aggregations reuse that partitioning); documents
    * never shuffle whole, so the plan holds at 100 TB where per-doc token
    * lists are small but the corpus is not.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val bg = toks
      .withColumn("nxt", lead(col("token"), 1).over(byPos))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("token"), col("nxt")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"), max("n").as("top_bigram_cnt"))
    toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("token")).as("n_distinct_tok"))
      .join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("n_distinct_tok"),
        (lit(1.0) - col("n_distinct_tok").cast("double") /
          col("n_tok").cast("double")).as("dup_word_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        (coalesce(col("top_bigram_cnt"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L))
            .cast("double")).as("top_bigram_frac"))
  }

  /** C28: one-pass data profile — per column: nulls, distinct-ish
    * signal, and value range, the first audit a dataset gets before
    * curation or training. One aggregation (single scan, map-side
    * partials); emitted long-form (one row per column) so the schema is
    * stable regardless of the profiled table's width. Distinct counts are
    * exact per column but share the same scan via `count(DISTINCT ...)`
    * expand.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    total.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** C27: cross-document boilerplate detection — fixed-width character
    * chunks hashed and counted across the corpus; a chunk seen in more
    * than one document is boilerplate (headers, licenses, templates), and
    * each document reports what fraction of it is shared text (the
    * CCNet-style "remove repeated paragraphs" signal). The chunk table
    * carries (doc_id, 16-byte digest) — bodies never shuffle — and both
    * aggregations are map-side partial.
    */
  def boilerplateChunks(docs: DataFrame, chunkChars: Int = 50): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          (ceil(length(col("text")) / lit(chunkChars.toDouble)) - 1)
            .cast("int"))).as("idx"))
      .select(col("doc_id"),
        md5(col("text").substr(col("idx") * chunkChars + 1,
          lit(chunkChars)).cast("binary")).as("h"))
    val shared = chunks.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
    chunks.join(shared, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("nd") > 1, 1)).as("n_shared_chunks"))
      .withColumn("shared_ratio",
        col("n_shared_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  /** C30: rare-token rate per source — the fraction of token occurrences
    * whose corpus-wide frequency is at or below `maxFreq` (hapax-heavy
    * text is a classic garbled/OCR-noise quality signal; the word-
    * frequency cousin of C9's ratio gates). Token frequencies come from
    * one hash aggregate; the join back is on the token key both sides are
    * already partitioned by, and only integer counts cross the final
    * shuffle — the micro-averaged rate is one division at the boundary,
    * never a float sum.
    */
  def rareTokenRate(docs: DataFrame, maxFreq: Long = 2): DataFrame = {
    // One explode over the corpus, reduced immediately to (source, token)
    // counts — the C22 two-level shape. Corpus frequency then aggregates
    // those counts (vocab-sized input, and the shared (source, token)
    // exchange is computed once via ReuseExchange), so raw token
    // occurrences never shuffle twice and the join-back carries counts,
    // not text.
    val tokCounts = docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val freq = tokCounts.groupBy("token").agg(sum("cnt").as("f"))
    tokCounts.join(freq, "token")
      .groupBy("source")
      .agg(sum("cnt").as("n_tokens"),
        sum(when(col("f") <= maxFreq, col("cnt")).otherwise(lit(0L)))
          .as("n_rare"))
      .withColumn("rare_rate",
        col("n_rare").cast("double") / col("n_tokens").cast("double"))
  }

  /** C20: global top-k token histogram. explode → hash-aggregate (partial
    * counts map-side, so the shuffle carries one row per distinct token per
    * partition) → TakeOrderedAndProject top-k with a total tie-break order
    * — no global sort, no single-partition window.
    */
  def topTokens(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** C45: BM25 top-k retrieval — score every document against a query
    * term set with Okapi BM25 (k1 = 1.2, b = 0.75) and return the k
    * best. This is the retrieval half of decontamination at scale:
    * [[graft.operators.Dedup.contamination]] catches verbatim 13-gram
    * hits; BM25 surfaces the *paraphrased* near-hits a curation run
    * reviews next.
    *
    * Exactness: idf goes through the transcendental boundary
    * (`ln_r6`, exact decimal); the tf normalization is IEEE arithmetic
    * on exactly-converted integers (b = 0.75 and 1−b = 0.25 are exact
    * binary, `len·N` stays well under 2^53, int64→double conversion is
    * correctly rounded by spec) so each per-term score is bit-identical
    * cross-engine; scores are fixed to 1e-9 decimals before the
    * per-doc SUM, which is then exact and order-independent.
    *
    * Shape: tokens filter to the query set BEFORE any shuffle (the
    * match table is query-terms-sized per doc); corpus length/df stats
    * are one aggregate each and broadcast; top-k is
    * TakeOrderedAndProject — no global sort. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String],
      k: Int = 20): DataFrame = {
    import graft.functions.exprs.ln_r6
    val k1 = 1.2
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .localCheckpoint() // feeds doc lengths AND the query match: one pass
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      sum("len").as("l_total"))
    val matches = toks.filter(col("token").isin(queryTerms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = matches.groupBy("token")
      .agg(countDistinct("doc_id").as("df"))
    val scored = matches
      .join(broadcast(df), "token")
      .join(lens, "doc_id")
      .join(broadcast(corpus))
      .withColumn("idf", ln_r6(
        (col("n_docs").cast("double") - col("df").cast("double") +
          lit(0.5)) / (col("df").cast("double") + lit(0.5))))
      .withColumn("score_t", round(
        col("idf").cast("double") *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(0.25) + lit(0.75) *
              (col("len") * col("n_docs")).cast("double") /
              col("l_total").cast("double"))), 9)
        .cast("decimal(20,9)"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("n_hits"),
        sum("score_t").cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** C52: temperature-scaled mixture allocation — the "how many tokens
    * from each source" solver a training-mix run starts from: source
    * weight ∝ (mean quality)^τ (τ = 1 samples proportional to quality,
    * τ → 0 flattens to uniform, τ > 1 sharpens toward the best
    * sources), allocations split a token budget by exact integer
    * division. The power goes through the transcendental boundary as
    * `exp(τ·ln q̄)`; per-doc quality scores and the per-source weights
    * are fixed to decimals before every sum, so allocations are exact
    * integers any engine reproduces, and they never exceed the budget
    * (truncating division; the remainder is reported as one
    * `unallocated` row with source NULL).
    *
    * Shape: one doc-keyed projection (the C9 quality formula), one
    * source-keyed aggregate, one broadcast total — source table
    * sized. */
  def temperatureMixture(docs: DataFrame, tau: Double = 2.0,
      budgetTokens: Long = 1000000L): DataFrame = {
    import graft.functions.exprs.ln_r6
    val perDoc = quality(docs)
      .select(col("doc_id"), col("quality_score"),
        col("n_tok").cast("bigint").as("n_tok"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val perSrc = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum(round(col("quality_score"), 9).cast("decimal(18,9)"))
          .as("qsum"))
      .withColumn("avg_quality",
        col("qsum").cast("double") / col("n_docs").cast("double"))
      .withColumn("weight6",
        round(exp(lit(tau) * ln_r6(col("avg_quality")).cast("double")), 6)
          .cast("decimal(18,6)"))
    val total = perSrc.agg(sum("weight6").as("wtot"))
    val alloc = perSrc.join(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("avg_quality"), col("weight6").cast("double").as("weight"),
        // exact integer split: floor(budget · w / Σw) with both weights
        // lifted to the 1e-6 integer grid (truncating div of positives
        // — the one division form both engines agree on)
        expr(s"cast((cast($budgetTokens as decimal(38,0)) * " +
          "cast(weight6 * 1000000 as bigint)) div " +
          "cast(wtot * 1000000 as bigint) as bigint)").as("alloc_tokens"))
    val spent = alloc.agg(sum("alloc_tokens").as("s"))
    alloc.unionByName(
      spent.select(lit(null).cast("string").as("source"),
        lit(0L).as("n_docs"), lit(0L).as("n_tokens"),
        lit(null).cast("double").as("avg_quality"),
        lit(null).cast("double").as("weight"),
        (lit(budgetTokens) - col("s")).as("alloc_tokens")))
  }

  /** C49: Zipf slope of the token frequency distribution — the
    * corpus-health regression (natural text sits near slope −1;
    * generated/templated corpora flatten or steepen): least squares of
    * lnR6(freq) on lnR6(rank) over the top `topN` tokens. Both
    * regressors go through the round-6 boundary, their products are
    * exact decimals, the five regression sums are exact, and
    * slope/intercept are IEEE doubles on agreed sums — the same recipe
    * as [[graft.operators.EventOps.seriesCorrelation]] with logs made
    * safe. Rank ties break on the token string, so the regression set
    * is a total order both engines reproduce.
    *
    * Shape: one token-keyed aggregate, a top-N TakeOrdered (vocab-sized
    * input, N rows out), a single-partition window ONLY over the N kept
    * rows (bounded by `topN`, never corpus-sized), one scalar
    * aggregate. */
  def zipfSlope(docs: DataFrame, topN: Int = 1000): DataFrame = {
    import graft.functions.exprs.ln_r6
    val top = docs
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(topN)
    val ranked = top.withColumn("r",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
    // the scale-12 product sums reduce to scale 6 before the double
    // cast (the 2^53 contract: a decimal whose SCALED integer passes
    // 2^53 double-rounds differently across engines), then the
    // regression closes in IEEE doubles on the agreed sums
    val m = ranked
      .select(ln_r6(col("r")).as("x"), ln_r6(col("cnt")).as("y"))
      .agg(count(lit(1)).as("n"),
        sum("x").cast("double").as("sx"),
        sum("y").cast("double").as("sy"),
        expr("cast(cast(round(sum(x * y), 6) as decimal(18,6)) as double)")
          .as("sxy"),
        expr("cast(cast(round(sum(x * x), 6) as decimal(18,6)) as double)")
          .as("sxx"))
    m.select(col("n").as("n_tokens_used"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
      ((col("sy") -
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
        col("n").cast("double")).as("intercept"))
  }

  /** C50: pairwise source vocabulary overlap — Jaccard of the distinct
    * token sets for every source pair, the corpus-mix diagnostic next
    * to [[sourceKlDivergence]] (KL weighs frequency; this weighs pure
    * coverage — a source can share every word yet diverge in usage, or
    * vice versa). Token-keyed self-join: fan-out per token is the
    * number of sources containing it (bounded by the source count, not
    * document count), so the pair table never exceeds
    * sources² · vocab. */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .localCheckpoint() // feeds sizes AND the pair join: one tokenize
    val sizes = st.groupBy("source").agg(count(lit(1)).as("sz"))
    val pairs = st.as("a")
      .join(st.as("b"),
        col("a.token") === col("b.token") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("sz").as("sz_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("sz").as("sz_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("sz_a"), col("sz_b"),
        (col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"))
          .as("jaccard"))
  }

  /** C46: unigram language-model scoring — each document's average
    * per-token log-probability under the corpus's own unigram
    * distribution, plus the perplexity-style `exp(−avg)` figure. The
    * cheap "does this read like the corpus" quality filter (CCNet-style
    * LM filtering with the LM reduced to unigrams): gibberish and
    * boilerplate-stuffed docs sit far from the corpus distribution.
    *
    * Exactness: one `ln_r6` per distinct vocabulary word (cnt/total is
    * an exact-int IEEE division); per-doc sums are integer-tf × exact
    * decimal; the final ratio and the `exp` are per-row scalars, the
    * exp going through the same round-6 boundary as every
    * transcendental here.
    *
    * Shape: per-(doc, token) tf aggregate first, then a token-keyed
    * join against the vocab table — the join carries distinct
    * (doc, token) pairs, not token instances; stop-word keys are hot
    * but bounded by doc count (AQE skew split covers the tail). */
  /** C47: pointwise mutual information over adjacent-token bigrams —
    * the collocation detector ("new york" vs chance co-occurrence), the
    * classic first step of phrase mining / tokenizer-merge analysis
    * over a training corpus. PMI(a,b) = ln p(ab) − ln p(a) − ln p(b)
    * with bigram probability over the N adjacent pairs and unigram
    * probabilities over the T tokens: each ln goes through the round-6
    * boundary, so the PMI itself is a SUM OF THREE EXACT DECIMALS —
    * bit-identical cross-engine with no float arithmetic at all.
    *
    * Tokenization: the raw single-space split, positions from
    * `posexplode` + one doc-partitioned `lead` window (a higher-order
    * filter lambda would run interpreted per token — the repo's
    * HOF rule). Count tables are token-keyed aggregates; the bigram
    * join against two broadcast-sized unigram maps ships counts, not
    * text. Output: bigrams seen ≥ `minCount` times, strongest first
    * under a total (pmi, a, b) order. */
  def pmiBigrams(docs: DataFrame, minCount: Int = 5,
      k: Int = 50): DataFrame = {
    import graft.functions.exprs.ln_r6
    val toks = docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "token")))
      .localCheckpoint() // unigrams AND bigrams read it: one tokenize pass
    val uni = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val t = uni.agg(sum("cnt").as("t_total"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bigAll = toks
      .withColumn("next", lead("token", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("token").as("a"), col("next").as("b"))
      .agg(count(lit(1)).as("cnt_ab"))
      .localCheckpoint() // the pair total must count ALL bigrams, not
    val n = bigAll.agg(sum("cnt_ab").as("n_total")) // just frequent ones
    val big = bigAll.filter(col("cnt_ab") >= minCount)
    big
      .join(broadcast(n))
      .join(broadcast(uni.select(col("token").as("a"),
        col("cnt").as("cnt_a"))), "a")
      .join(broadcast(uni.select(col("token").as("b"),
        col("cnt").as("cnt_b"))), "b")
      .join(broadcast(t))
      .select(col("a"), col("b"), col("cnt_ab"), col("cnt_a"),
        col("cnt_b"),
        (ln_r6(col("cnt_ab").cast("double") /
            col("n_total").cast("double")) -
          ln_r6(col("cnt_a").cast("double") /
            col("t_total").cast("double")) -
          ln_r6(col("cnt_b").cast("double") /
            col("t_total").cast("double")))
          .cast("decimal(14,6)").cast("double").as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** C48: per-source KL divergence from the corpus token distribution —
    * the data-mix drift gauge per slice (which source's language is
    * furthest from the blend it feeds?), the directed sibling of C39's
    * symmetric L1 drift. KL(P_s ‖ P_c) = Σ_t p_s(t)·(ln p_s(t) −
    * ln p_c(t)) computed from counts as
    * `Σ c_st·(lnR6(c_st/T_s) − lnR6(c_t/T_c)) / T_s`: integer-count ×
    * exact-decimal sums, one closing IEEE division. Every term has
    * c_t ≥ c_st ≥ 1 so no zero-probability guard is needed — the
    * smoothing question never arises for a slice of its own corpus.
    *
    * Shape: two token-keyed aggregates (per-source and global), one
    * join of the per-source table against the broadcast-sized vocab
    * totals, one source-keyed rollup. */
  def sourceKlDivergence(docs: DataFrame): DataFrame = {
    import graft.functions.exprs.ln_r6
    val perSrc = docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the vocab rollup AND the KL terms
    val vocab = perSrc.groupBy("token").agg(sum("cnt").as("g_cnt"))
    val gTot = vocab.agg(sum("g_cnt").as("t_c"))
    val sTot = perSrc.groupBy("source").agg(sum("cnt").as("t_s"))
    perSrc
      .join(broadcast(vocab), "token")
      .join(broadcast(sTot), "source")
      .join(broadcast(gTot))
      .withColumn("term",
        col("cnt") * (ln_r6(col("cnt").cast("double") /
            col("t_s").cast("double")) -
          ln_r6(col("g_cnt").cast("double") / col("t_c").cast("double"))))
      .groupBy("source")
      .agg(first("t_s").as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum("term").as("s"))
      .select(col("source"), col("n_tokens"), col("vocab_size"),
        (col("s").cast("double") / col("n_tokens").cast("double"))
          .as("kl_nats"))
  }

  def unigramLogProb(docs: DataFrame): DataFrame = {
    import graft.functions.exprs.ln_r6
    val tf = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds the vocab AND the per-doc sum: one pass
    val vocab = tf.groupBy("token").agg(sum("tf").as("cnt"))
    val total = vocab.agg(sum("cnt").as("l_total"))
    val logp = vocab.join(broadcast(total))
      .select(col("token"),
        ln_r6(col("cnt").cast("double") / col("l_total").cast("double"))
          .as("logp"))
    tf.join(logp, "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("len"), count(lit(1)).as("n_distinct"),
        sum(col("tf") * col("logp")).as("s"))
      .select(col("doc_id"), col("len"), col("n_distinct"),
        (col("s").cast("double") / col("len").cast("double"))
          .as("avg_logp"),
        round(exp(-(col("s").cast("double") / col("len").cast("double"))),
          6).as("pseudo_ppl"))
  }

  /** C73: DSIR-style importance weights for target-matched data
    * selection (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling"): score every document by how much
    * more likely its tokens are under a TARGET slice's unigram LM than
    * under the whole corpus's — the standard cheap proxy for "select
    * web data that looks like the high-quality target domain". Add-one
    * smoothing over the SHARED corpus vocabulary keeps both
    * distributions defined on every token; each log is fixed to the
    * 1e-6 grid (the [[unigramLogProb]] transcendental-boundary
    * contract) so per-doc sums are exact and engine-portable. Output:
    * (doc_id, len, avg_log_ratio, importance = round(exp(avg), 6)) —
    * feeds [[graft.operators.Sampling.weightedSample]] /
    * `selectByBudget` for the actual resampling step.
    *
    * Shape: one tokenize pass (the tf table is materialized once and
    * feeds vocab + the per-doc close), token-keyed vocab aggregate
    * with BOTH counts in one pass (no second scan for the target), a
    * 1-row totals broadcast, one token-keyed join back. Cost is the
    * same two shuffles as [[unigramLogProb]] at any corpus size. */
  def dsirWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    import graft.functions.exprs.ln_r6
    val tf = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "is_t", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds the vocab AND the per-doc close
    val vocab = tf.groupBy("token")
      .agg(sum("tf").as("cnt_s"),
        sum(when(col("is_t"), col("tf")).otherwise(0L)).as("cnt_t"))
    val totals = vocab.agg(sum("cnt_s").as("tot_s"),
      sum("cnt_t").as("tot_t"), count(lit(1)).as("v"))
    // each log lands on the 1e-6 grid AND is fixed as DECIMAL(12,6), so
    // the per-token ratio and every per-doc sum are exact decimal
    // arithmetic — partition-order-proof in both engines by type, not
    // by luck
    val lr = vocab.join(broadcast(totals))
      .select(col("token"),
        (ln_r6((col("cnt_t") + lit(1)).cast("double") /
            (col("tot_t") + col("v")).cast("double"))
            .cast("decimal(12,6)") -
          ln_r6((col("cnt_s") + lit(1)).cast("double") /
            (col("tot_s") + col("v")).cast("double"))
            .cast("decimal(12,6)")).as("lr"))
    tf.join(lr, "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("len"), sum(col("tf") * col("lr")).as("s"))
      .select(col("doc_id"), col("len"),
        (col("s").cast("double") / col("len").cast("double"))
          .as("avg_log_ratio"),
        round(exp(col("s").cast("double") / col("len").cast("double")),
          6).as("importance"))
  }

  /** C59: per-source bigram conditional entropy — H(next | prev) under
    * the source's own bigram counts, the corpus-predictability gauge
    * that separates natural prose (≈ 2-4 nats) from boilerplate /
    * template spam (→ 0) and shuffled-token noise (→ unigram entropy).
    * Sibling of [[pmiBigrams]] (pointwise, top-k) and [[zipfSlope]]
    * (marginal ranks): this is the single summary number per slice.
    * H = −(1/T)·Σ c_ab·lnR6(c_ab/c_a) — each log fixed to an exact
    * 1e-6 decimal under the transcendental-boundary contract
    * (C48's integer × decimal term shape), T and the counts integers,
    * one IEEE division at the close; `round(exp(·), 6)` branching
    * factor as in [[unigramLogProb]].
    *
    * Shape: one tokenize pass, one doc-partitioned lead window
    * (document-sized partitions), a (source, a, b)-keyed count, prefix
    * totals re-keyed on (source, a), one keyed close. Token pairs
    * shuffle once; text never re-shuffles. */
  def bigramEntropy(docs: DataFrame): DataFrame = {
    import graft.functions.exprs.ln_r6
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), col("source"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val big = toks
      .withColumn("next", lead("token", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("source"), col("token").as("a"), col("next").as("b"))
      .agg(count(lit(1)).as("c_ab"))
      .localCheckpoint() // prefix totals AND the entropy sum read it
    val pref = big.groupBy("source", "a").agg(sum("c_ab").as("c_a"))
    big.join(pref, Seq("source", "a"))
      .withColumn("term",
        col("c_ab") * ln_r6(col("c_ab").cast("double") /
          col("c_a").cast("double")))
      .groupBy("source")
      .agg(sum("c_ab").as("t"), count(lit(1)).as("n_bigram_types"),
        sum("term").as("s"))
      .select(col("source"), col("t").as("n_bigrams"),
        col("n_bigram_types"),
        (-(col("s").cast("double")) / col("t").cast("double"))
          .as("h_cond_nats"),
        round(exp(-(col("s").cast("double")) / col("t").cast("double")),
          6).as("branching_factor"))
  }

  /** C61: LIX readability per source (Björnsson's läsbarhetsindex —
    * words/sentence + 100·longwords/words, long = ≥7 chars): the
    * audience-difficulty screen a curation mix reads next to C6's
    * mechanical quality ratios (LIX ~25 easy prose, ~60 bureaucratic).
    * Integer-exact by construction: sentence ends are `.!?` character
    * counts, long tokens are non-overlapping `[^ ]{7,}` regex matches —
    * both count identically on any engine — summed per source as plain
    * longs; the two divisions are IEEE at the output boundary, with a
    * punctuation-free source yielding NULL via the nullif guard rather
    * than an engine-specific ÷0.
    *
    * Shape: one codegen'd projection per document (three counts, no
    * explode — the token array never materializes), one keyed aggregate
    * with map-side partials. The text column is scanned once and never
    * shuffled. */
  def lixReadability(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        size(split(col("text"), " ")).cast("bigint").as("w"),
        length(regexp_replace(col("text"), "[^.!?]", "")).cast("bigint")
          .as("s"),
        size(expr("regexp_extract_all(text, '[^ ]{7,}', 0)")).cast("bigint")
          .as("lw"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
        sum("s").as("n_sentences"), sum("lw").as("n_long"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_long"),
        (col("n_words").cast("double") /
          nullif(col("n_sentences"), lit(0L)).cast("double") +
          lit(100.0) * col("n_long").cast("double") /
            col("n_words").cast("double")).as("lix"))

  /** C62: term burstiness (Church-Gale cf/df) — for the top `k`
    * collection-frequency terms: a term appearing 1000 times spread
    * over 900 documents is topical vocabulary; 1000 times inside 40
    * documents is boilerplate, spam, or a template artifact. The
    * cf/df ratio separates them where raw frequency (C12 topTokens)
    * and document frequency alone cannot — the screen that catches
    * "rare-looking" template junk before it dominates a mixture.
    * cf and df are exact integer aggregates off ONE tokenize pass
    * (df via a per-(doc, term) distinct); burstiness is the single
    * IEEE division at the boundary; top-k is deterministic on
    * (cf DESC, term).
    *
    * Shape: explode once, two keyed aggregates (term-keyed counts with
    * map-side partials), TakeOrderedAndProject for the k rows — no
    * global sort materializes. */
  def termBurstiness(docs: DataFrame, k: Int = 50): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("token")
      .agg(sum("c").as("cf"), count(lit(1)).as("df"))
      .select(col("token"), col("cf"), col("df"),
        (col("cf").cast("double") / col("df").cast("double"))
          .as("burstiness"))
      .orderBy(col("cf").desc, col("token"))
      .limit(k)

  /** C66: per-source percentile calibration of the C9 quality score —
    * the step that makes scores COMPARABLE across corpora before
    * mixture sampling. Raw quality scales differ by source (a code
    * corpus's median score would land in a web corpus's bottom decile),
    * so any global threshold or temperature mix over raw scores
    * silently re-weights sources; the calibrated `src_pct` is each
    * doc's percent_rank WITHIN its source ((rank−1)/(n−1), ties share
    * the first rank, 0.0 for a single-doc source), which is uniform on
    * [0,1] per source by construction.
    *
    * Scale: no doc-level window. Scores compact to a per-(source,
    * score) histogram first (ties — replicated docs — collapse before
    * any ordered pass), the cumulative rank runs over DISTINCT scores
    * only, per-source totals broadcast (one row per source), and docs
    * rejoin by (source, score). The ranked window is per source over
    * the distinct-score table — at 100 TB that is the deduped score
    * set, not the corpus. percent_rank doubles are exact: (rank−1) and
    * (n−1) are integers, one IEEE division at the boundary. */
  def calibratedQuality(docs: DataFrame): DataFrame = {
    val scored = qualityCols(docs)
      .select(col("doc_id"), col("source"), col("quality_score"))
    val hist = scored.groupBy("source", "quality_score")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source").orderBy("quality_score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = scored.groupBy("source").agg(count(lit(1)).as("n_src"))
    val ranked = hist
      .withColumn("rk", sum("cnt").over(w) - col("cnt") + lit(1L))
      .join(broadcast(totals), "source")
      .select(col("source"), col("quality_score"),
        when(col("n_src") === 1L, lit(0.0))
          .otherwise((col("rk") - lit(1L)).cast("double") /
            (col("n_src") - lit(1L)).cast("double"))
          .as("src_pct"))
    scored.join(ranked, Seq("source", "quality_score"))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("src_pct"))
  }

  /** C67: n-gram novelty — per doc, the fraction of its distinct word
    * trigrams whose FIRST corpus occurrence (min doc_id) is this doc.
    * The memorization-risk / contribution screen: a doc whose shingles
    * all appeared earlier adds no new n-gram mass to a training mix
    * even if no single earlier doc near-duplicates it (quotation
    * mosaics, aggregator pages — invisible to pairwise dedup, caught
    * here). Shares the dedup family's shingle definition
    * ([[graft.functions.exprs.trigrams]]: lowercase, space-split,
    * distinct, null under 3 tokens — short docs drop out).
    *
    * Shape: EXACT-DUP COLLAPSE FIRST (the dedup family's standard
    * move): grams are a function of the text, and only the globally
    * FIRST doc of a gram can score it — any non-minimum member of an
    * identical-text group has doc_id strictly above its group minimum,
    * which already bounds every first-occurrence it could claim — so
    * all shingle work (trigram explode, gram-keyed min, join back,
    * rep-keyed count) runs once per DISTINCT text and copies expand
    * back at the very end as (n_grams, 0). Measured at sf10 (100
    * copies per distinct text): 36.5 s per-copy shingling → rep-level
    * collapse, gram traffic cut 100×. Cost ∝ distinct content; no
    * pair expansion anywhere, so — unlike the pairwise family — this
    * survives replication-dense corpora unmodified. */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val dh = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("h"))
    val tc = dh.groupBy("h").agg(min("doc_id").as("mdoc"))
    val reps = docs.join(
      tc.withColumnRenamed("mdoc", "doc_id"), Seq("doc_id"), "leftsemi")
    val g = reps
      .select(col("doc_id").as("mdoc"),
        graft.functions.exprs.trigrams(col("text")).as("grams"))
      .filter(col("grams").isNotNull)
      .select(col("mdoc"), explode(col("grams")).as("g"))
    // join-free scoring (§2.3 aggregate-before-shuffle): grams are
    // DISTINCT per rep (the trigrams kernel emits a set), so the rep
    // that first-occurs a gram holds exactly one row for it — n_novel
    // per rep is just the first-occurrence table regrouped by its min
    // doc, and n_grams is a per-rep count. The former g ⋈ first join
    // re-exchanged the full (rep, gram) explode by gram a second time
    // and shipped every gram row into a doc-keyed aggregate; both
    // aggregates below ship map-side COUNT partials instead.
    val first = g.groupBy("g").agg(min("mdoc").as("fd"))
    val novel = first.groupBy(col("fd").as("mdoc"))
      .agg(count(lit(1)).as("n_novel"))
    val repNov = g.groupBy("mdoc").agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("mdoc"), "left")
      .select(col("mdoc"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
    dh.join(tc, "h")
      .join(repNov, "mdoc") // short-text groups (grams null) drop whole
      .select(col("doc_id"), col("n_grams"),
        when(col("doc_id") === col("mdoc"), col("n_novel"))
          .otherwise(lit(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams").cast("double"))
          .as("novelty"))
  }

  /** C75: MSTTR lexical diversity (mean segmental type-token ratio,
    * Johnson 1944) — the length-robust vocabulary-richness score: raw
    * TTR (distinct/total tokens) collapses for long documents purely
    * because vocabulary saturates, so each document's token stream is
    * cut into consecutive `segTokens`-token segments (trailing partial
    * dropped), each FULL segment scores distinct-per-segment, and the
    * document scores the mean — comparable across lengths, the signal
    * quality filters want for template spam (low MSTTR) vs organic
    * prose. All integer: per-segment ttr_ppm = d·10⁶ div segTokens,
    * per-doc mean and the source rollup are truncating integer
    * divisions — bit-identical in any engine.
    *
    * Tokens: single-space-normalized lowercase split (the corpus ws
    * convention), so positions come straight off the split array — no
    * per-token re-ranking window, no interpreted lambda.
    *
    * Shape: exact-dup collapse FIRST (the family's standard move —
    * MSTTR is a pure function of the text): one rep per distinct text
    * pays the token explode + two keyed aggs, copies rejoin by hash
    * for the per-source rollup, so token traffic ∝ distinct content
    * at any replication density. */
  /** C76: DoReMi-lite mixture reweighting (after Xie et al. 2023's
    * DoReMi, reduced to its one-shot deterministic core): each source's
    * EXCESS cross-entropy — how many extra nats/token the corpus-level
    * unigram LM pays on that source vs the source's own LM, i.e.
    * KL(source ‖ corpus) under shared add-one smoothing — measures how
    * under-served the source is by the current mixture, and the
    * training weight exponentiates it: `w ∝ exp(eta · excess)`,
    * reported as integer ppm. The C52 temperature mixture reweights by
    * SIZE alone; this reweights by DISTRIBUTIONAL distance, which is
    * the DoReMi insight (domains the reference model compresses worst
    * get upsampled). Output per source: token count, both
    * cross-entropies, excess, weight_ppm (sums to ≤ 1e6).
    *
    * Determinism: the C73 contract — every log lands on the 1e-6 grid
    * as DECIMAL(12,6), so the per-source Σ tf·ln p sums are exact
    * decimal arithmetic; one IEEE division per entropy at the close;
    * exp is rounded to integer micro-units before the truncating ppm
    * division, so the weight column is integer end-to-end.
    *
    * Shape: one tokenize pass, one (source, token) count, one
    * token-keyed join against the corpus vocab, two keyed closes —
    * token traffic shuffles twice, text once, exactly like C73. The
    * weight normalizer is a source-count-sized aggregate broadcast
    * back. */
  def doremiLiteWeights(docs: DataFrame, eta: Double = 1.0): DataFrame = {
    import graft.functions.exprs.ln_r6
    val tf = docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds the vocab AND the per-source close
    val vocab = tf.groupBy("token").agg(sum("tf").as("cnt_c"))
    val totc = vocab.agg(sum("cnt_c").as("tot_c"),
      count(lit(1)).as("v"))
    val srcTot = tf.groupBy("source").agg(sum("tf").as("tot_s"))
    val terms = tf
      .join(broadcast(srcTot), "source")
      .join(vocab, "token")
      .join(broadcast(totc))
      .select(col("source"), col("tf"),
        ln_r6((col("cnt_c") + lit(1)).cast("double") /
            (col("tot_c") + col("v")).cast("double"))
          .cast("decimal(12,6)").as("lp_c"),
        ln_r6((col("tf") + lit(1)).cast("double") /
            (col("tot_s") + col("v")).cast("double"))
          .cast("decimal(12,6)").as("lp_s"))
    val per = terms.groupBy("source")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("lp_c")).as("s_c"),
        sum(col("tf") * col("lp_s")).as("s_s"))
      .select(col("source"), col("n_tokens"),
        (-(col("s_c").cast("double")) / col("n_tokens").cast("double"))
          .as("ce_corpus"),
        (-(col("s_s").cast("double")) / col("n_tokens").cast("double"))
          .as("ce_self"),
        (((col("s_s") - col("s_c")).cast("double")) /
          col("n_tokens").cast("double")).as("excess"))
      .withColumn("w6",
        round(exp(lit(eta) * col("excess")) * 1000000d, 0).cast("bigint"))
      .localCheckpoint() // feeds the normalizer AND the final rows
    val norm = per.agg(sum("w6").as("tot_w6"))
    per.join(broadcast(norm))
      .select(col("source"), col("n_tokens"), col("ce_corpus"),
        col("ce_self"), col("excess"),
        expr("(w6 * 1000000) div tot_w6").as("weight_ppm"))
  }

  def msttr(docs: DataFrame, segTokens: Int = 25): DataFrame = {
    val dh = docs.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("h"))
    val reps = docs
      .select(md5(col("text").cast("binary")).as("h"), col("text"))
      .groupBy("h").agg(min("text").as("text")) // one row per distinct
    val segs = reps
      .select(col("h"), posexplode(split(
        regexp_replace(trim(lower(col("text"))), " +", " "), " "))
        .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "") // only the all-whitespace degenerate
      .groupBy(col("h"), expr(s"pos div $segTokens").as("seg"))
      .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("d"))
      .filter(col("n") === segTokens)
    val perRep = segs.groupBy("h")
      .agg(count(lit(1)).as("n_segments"),
        expr(s"sum((d * 1000000) div $segTokens) div count(1)")
          .as("msttr_ppm"))
    dh.join(perRep, "h") // docs under one full segment drop from scoring
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_scored"),
        sum("n_segments").as("total_segments"),
        expr("sum(msttr_ppm) div count(1)").as("avg_msttr_ppm"),
        min("msttr_ppm").as("min_msttr_ppm"),
        max("msttr_ppm").as("max_msttr_ppm"))
  }
}
