package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.Numeric.{microRatio, microRound, microUnits}

/** Text-analysis operators over the `documents` table.
  *
  * Mirrors tag-generator's TF-IDF keyword extraction
  * (tag-generator/app/tag_extractor/english_extractor.py:15
  * extract_keywords_english), recap-worker's
  * tokenization / language-classification / quality filters
  * (recap-worker/recap-worker/src/util/text.rs), and search-indexer's
  * token preparation.
  *
  * Scale notes: the explode-heavy queries (term frequency, TF-IDF) fan a
  * document out to its tokens before aggregating — at 100 TB this is the
  * classic inverted-index build: one shuffle keyed by term, partial
  * map-side aggregation keeps the shuffle volume ≈ distinct-terms ×
  * partitions, not total tokens. Per-doc scores stay document-partitioned
  * (no shuffle at all until the final small top-K).
  */
object TextOps {

  val stopwords: Seq[String] = Seq("the", "a")

  /** tx01: tokenization + per-language token stats. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_tokens", tokenCount(col("text")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (round(sum("n_tokens") * 1e2 / count(lit(1)), 0).cast("long") / 1e2).as("avg_tokens"),
        max("n_tokens").as("max_tokens"))

  /** tx02: global top-K term frequency (the inverted-index head). */
  def termFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(20)

  /** tx03: TF-IDF top-3 terms per document (tag-generator's keyword
    * extraction). idf is rounded to 6 decimals before scoring so the
    * ln() of both engines agrees bit-for-bit after rounding; ranking
    * uses the rounded score with a term tie-break.
    */
  def tfidfTopK(s: SparkSession, dir: String): DataFrame =
    tfidfTopKOn(s, dir, tokens)

  /** tx19: tx03 over the CJK-aware mixed tokenizer — tag-generator's
    * japanese_extractor.py runs exactly this pipeline (tokenize
    * Japanese text, score terms by TF-IDF, keep the top keywords);
    * with the whitespace tokenizer every Japanese doc is one giant
    * term and the scores are meaningless. Oracle mirrors the regex.
    */
  def tfidfTopKMixed(s: SparkSession, dir: String): DataFrame =
    tfidfTopKOn(s, dir, tokensMixed)

  private def tfidfTopKOn(s: SparkSession, dir: String,
                          toksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
    val nDocs = docs.select(countDistinct("doc_id").as("n_docs"))
    val terms = docs.select(col("doc_id"), explode(toksOf(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      // idf in exact 1e-6 units; score*1e4 = tf*idf_u/1e2 is an integer
      // quotient with representable halves — both engines round alike
      .withColumn("idf_u", round(log(col("n_docs") / col("df")) * 1e6, 0).cast("long"))
      .withColumn("score", round(col("tf") * col("idf_u") / 1e2, 0).cast("long") / 1e4)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3 && col("score") > 0)
      .select("doc_id", "term", "score", "rank")
  }

  /** tx04: document quality scoring (recap-worker inclusion filter). */
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        microRound(stopwordRatio(col("text"), stopwords), 4).as("stop_ratio"),
        qualityScore(col("text"), stopwords).as("qscore"))
      .filter(col("qscore") >= 0.5)

  /** tx05: stopword-profile language ID vs the labeled lang column. */
  def langIdEval(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("predicted", langId(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** tx20: per-label classification metrics over the lang-ID
    * predictions — precision, recall, F1, support from the tx05
    * confusion pairs, exactly what recap-worker's golden-set evaluator
    * computes per genre label (recap-worker/recap-worker/src/
    * evaluation/metrics.rs:13 LabelStats → precision/recall/F1).
    * The confusion matrix is a tiny aggregate; the metric arithmetic
    * is a broadcast-side projection.
    */
  def classificationMetrics(s: SparkSession, dir: String): DataFrame = {
    // ONE scan: the (actual, predicted) confusion matrix is ≤ labels²
    // rows; support / per-prediction counts / true positives are all
    // re-aggregations of it, never of the corpus
    val confusion = Tables.documents(s, dir)
      .select(col("lang").as("actual"), langId(col("text")).as("predicted"))
      .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val support = confusion.groupBy("actual").agg(sum("n").as("support"))
    val predicted = confusion.groupBy("predicted").agg(sum("n").as("n_predicted"))
    val tp = confusion.filter(col("actual") === col("predicted"))
      .select(col("actual").as("label"), col("n").as("tp"))
    support.withColumnRenamed("actual", "label")
      .join(predicted.withColumnRenamed("predicted", "label"), Seq("label"), "left")
      .join(tp, Seq("label"), "left")
      .select(
        col("label"), col("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        microRatio(coalesce(col("tp"), lit(0L)), coalesce(col("n_predicted"), lit(1L)), 4).as("precision"),
        microRatio(coalesce(col("tp"), lit(0L)), col("support"), 4).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          microRatio(lit(2) * col("precision") * col("recall"), col("precision") + col("recall"), 4))
          .otherwise(lit(0.0)))
  }

  /** tx22: corpus-level classification summary — macro
    * precision/recall/F1 (unweighted label average), support-weighted
    * F1, and accuracy, the exact field set of recap-worker's
    * ClassificationMetrics (evaluation/metrics.rs:12). Derived from
    * the tx20 per-label table, so the two stay consistent by
    * construction.
    */
  def macroMetrics(s: SparkSession, dir: String): DataFrame =
    classificationMetrics(s, dir)
      // recover each metric's exact 1e-4-unit integer (k/1e4 * 1e4 rounds
      // back to k), so the label averages are exact long sums
      .select(col("support"), col("tp"),
        round(col("precision") * 1e4, 0).cast("long").as("p_u"),
        round(col("recall") * 1e4, 0).cast("long").as("r_u"),
        round(col("f1") * 1e4, 0).cast("long").as("f_u"))
      .agg(
        microRatio(sum("p_u"), count(lit(1)), 0).as("macro_precision_u"),
        microRatio(sum("r_u"), count(lit(1)), 0).as("macro_recall_u"),
        microRatio(sum("f_u"), count(lit(1)), 0).as("macro_f1_u"),
        microRatio(sum(col("f_u") * col("support")), sum("support"), 0).as("weighted_f1_u"),
        microRatio(sum("tp"), sum("support"), 4).as("accuracy"))
      .select(
        (col("macro_precision_u") / 1e4).as("macro_precision"),
        (col("macro_recall_u") / 1e4).as("macro_recall"),
        (col("macro_f1_u") / 1e4).as("macro_f1"),
        (col("weighted_f1_u") / 1e4).as("weighted_f1"),
        col("accuracy"))

  /** tx21: per-document term-distribution Shannon entropy (bits) —
    * recap-worker's tag-profile summary computes exactly this over tag
    * confidences (recap-worker/recap-worker/src/pipeline/genre_refine/
    * scoring.rs:17 compute_entropy: p = w/Σw, −Σ p·ln(p)/ln 2); over
    * token frequencies it is the classic lexical-diversity signal a
    * quality gate reads next to stopword ratio. The per-doc total is a
    * window sum over the tf rows (same shuffle as the tf groupBy key
    * prefix — no second join).
    */
  def termEntropy(s: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id")
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .withColumn("p", col("tf") / sum("tf").over(byDoc))
      // −Σ p·log₂p in exact integer arithmetic: the log factors to
      // MICRO-unit longs (round(log₂p·1e6)), the p = tf/T denominator
      // factors out of the sum, so the addends are tf·logp_u longs —
      // the sum is order-independent across partitions AND engines
      // (a double Σ p·logp₆ flipped tx21's 4-dp round between two
      // sf0.1 runs of the SAME build). Final round at scale 0 in 1e-4
      // units: half-integers are exact doubles, so Spark's
      // shortest-string rounding and DuckDB's binary round agree.
      .withColumn("logp_u",
        round(log(col("p")) / log(lit(2.0)) * 1e6, 0).cast("long"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms"),
        (round(-sum(col("tf") * col("logp_u")) / sum("tf") / 100, 0).cast("long") / 1e4)
          .as("entropy_bits"))
  }

  /** tx06: exact dedup groups via content hash (md5 on both engines). */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_doc_id"))

  /** tx11: term co-occurrence pairs (the Tag Verse 3D tag cloud is a
    * co-occurrence graph over article tags — alt-frontend-sv renders
    * what this computes). Restricted to terms of length ≥ 5 to bound
    * the per-doc pair fan-out; ordered pairs a < b.
    */
  def termCooccurrence(s: SparkSession, dir: String): DataFrame = {
    val docTerms = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(length(col("term")) >= 5)
    docTerms.as("a").join(docTerms.as("b"), "doc_id")
      .filter(col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 100)
  }

  /** tx12: ROUGE-1 precision/recall/F1 between candidate and reference
    * docs (recap-worker/recap-worker/src/evaluation/rouge.rs scores
    * generated recaps the same way). Pairs: doc i vs doc i+1, i < 50.
    */
  def rouge1Pairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(col("doc_id") < 51)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val cand = d.filter(col("doc_id") < 50)
      .select(col("doc_id").as("cand_id"), col("toks").as("cand"))
    val ref = d.select((col("doc_id") - 1).as("cand_id"), col("toks").as("ref"))
    cand.join(ref, "cand_id")
      .withColumn("overlap", size(array_intersect(col("cand"), col("ref"))))
      .select(
        col("cand_id"),
        microRatio(col("overlap"), size(col("cand")), 4).as("rouge_p"),
        microRatio(col("overlap"), size(col("ref")), 4).as("rouge_r"),
        microRatio(lit(2) * col("overlap"), size(col("cand")) + size(col("ref")), 4).as("rouge_f1"))
  }

  /** tx44: ROUGE-2 precision/recall/F1 over the same candidate/
    * reference pairs as tx12 — the bigram member of the reference's
    * ROUGE battery (recap-evaluator/src/recap_evaluator/evaluator/
    * rouge_eval.py reports rouge_1/rouge_2/rouge_l side by side;
    * ROUGE-2 is the fluency-sensitive one: shuffled words keep their
    * unigram overlap but lose their bigrams). Distinct-bigram set
    * semantics, matching tx12's distinct-unigram convention; bigram
    * construction is a pure codegen HOF (sequence + element_at), and
    * docs under two tokens contribute an empty bigram set rather than
    * letting `sequence(0, -1)` produce a DESCENDING range.
    */
  def rouge2Pairs(s: SparkSession, dir: String): DataFrame =
    rouge2PairsOn(Tables.documents(s, dir))

  /** ROUGE-2 over any (doc_id, text) frame — tx44's body. */
  def rouge2PairsOn(docs: DataFrame): DataFrame = {
    val bigrams = (toks: Column) =>
      when(size(toks) >= 2,
        array_distinct(transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))))
        .otherwise(array().cast("array<string>"))
    val d = docs.filter(col("doc_id") < 51)
      .select(col("doc_id"), bigrams(tokens(col("text"))).as("bg"))
    val cand = d.filter(col("doc_id") < 50)
      .select(col("doc_id").as("cand_id"), col("bg").as("cand"))
    val ref = d.select((col("doc_id") - 1).as("cand_id"), col("bg").as("ref"))
    // a sub-2-token doc has an EMPTY bigram set (the guard above) — an
    // empty candidate/reference conventionally scores 0, not NULL from
    // a zero-denominator ratio
    def safe(num: Column, den: Column): Column =
      when(den === 0, 0.0).otherwise(microRatio(num, den, 4))
    cand.join(ref, "cand_id")
      .withColumn("overlap", size(array_intersect(col("cand"), col("ref"))))
      .select(
        col("cand_id"),
        safe(col("overlap"), size(col("cand"))).as("rouge2_p"),
        safe(col("overlap"), size(col("ref"))).as("rouge2_r"),
        safe(lit(2) * col("overlap"), size(col("cand")) + size(col("ref"))).as("rouge2_f1"))
  }

  /** tx15: ROUGE-L precision/recall/F1 over the same candidate/reference
    * pairs as tx12 (recap-worker/recap-worker/src/evaluation/rouge.rs:13-37
    * computes ROUGE-1 and ROUGE-L side by side). Token SEQUENCES, not
    * sets: LCS respects order, so "a b c" vs "c b a" scores 1/3, not 1.
    * F1 = 2·lcs/(m+n) — the harmonic mean of lcs/m and lcs/n. Rows-only
    * (no LCS in the SQL oracle); the DP kernel is property-tested
    * against a reference implementation in FunctionsSpec.
    */
  def rougeLPairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(col("doc_id") < 51)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val cand = d.filter(col("doc_id") < 50)
      .select(col("doc_id").as("cand_id"), col("toks").as("cand"))
    val ref = d.select((col("doc_id") - 1).as("cand_id"), col("toks").as("ref"))
    cand.join(ref, "cand_id")
      .withColumn("lcs", lcsLen(col("cand"), col("ref")))
      .select(
        col("cand_id"),
        microRatio(col("lcs"), size(col("cand")), 4).as("rouge_l_p"),
        microRatio(col("lcs"), size(col("ref")), 4).as("rouge_l_r"),
        microRatio(lit(2) * col("lcs"), size(col("cand")) + size(col("ref")), 4).as("rouge_l_f1"))
  }

  /** tx13: regex token counting — the BPE-style pre-tokenizer split
    * (word pieces + standalone punctuation), the token-budgeting
    * counter an LLM-data pipeline runs over every document.
    */
  def bpeTokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .as("n_bpe_tokens"))
      .groupBy()
      .agg(sum("n_bpe_tokens").as("total_tokens"),
           (round(sum("n_bpe_tokens") * 1e2 / count(lit(1)), 0).cast("long") / 1e2).as("avg_tokens"),
           max("n_bpe_tokens").as("max_tokens"))

  /** tx16: token stats under the CJK-aware mixed tokenizer — the
    * language-robust twin of tx01. On Japanese text the whitespace
    * tokenizer collapses a document to ONE token and every downstream
    * text operator silently degenerates; tokensMixed keeps ASCII words
    * and counts each CJK character as a token (`cjk_char_tokens` counts
    * the non-word share). Oracle-checked: DuckDB runs the identical
    * regex, so this stays green on any corpus mix.
    */
  def cjkTokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        size(tokensMixed(col("text"))).as("n_tokens"),
        asciiWordCount(col("text")).as("n_word_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (round(sum("n_tokens") * 1e2 / count(lit(1)), 0).cast("long") / 1e2).as("avg_tokens"),
        sum(col("n_tokens") - col("n_word_tokens")).as("cjk_char_tokens"))

  /** tx18: BM25-ranked full-text search — the scoring function behind
    * the reference's search surface (search-indexer feeds Meilisearch,
    * whose relevance core is BM25:
    * search-indexer/app/driver/meilisearch_driver.go:471 "Japanese
    * BM25 queries", config/constants.go:22 "BM25 only"). Lucene-form
    * idf ln((N−df+0.5)/(df+0.5)+1), k1 = 1.2, b = 0.75. The index-side
    * stats (df per term, avgdl) are tiny aggregates broadcast against
    * the per-doc tf rows; only query-term postings survive the
    * explode, so the shuffle carries |query| terms × matching docs,
    * never the corpus vocabulary.
    */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val query = Seq("merge", "join", "stream")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), microRatio(sum("dl"), count(lit(1)), 6).as("avgdl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", microRound(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1), 6))
      // per-term contribution snapped to exact 1e-6-unit longs before the
      // sum, so the per-doc total is order-independent integer addition
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))) * 1e6,
          0).cast("long"))
      .groupBy("doc_id")
      .agg((round(sum("contrib_u") / 1e2, 0).cast("long") / 1e4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
  }

  /** tx45: synonym-expanded search — the synonym half of the search
    * surface (search-indexer/app/driver/meilisearch_driver.go:694
    * `RegisterSynonyms` + app/tokenize/tokenizer.go
    * `ProcessTagToSynonyms`: Japanese compound tags register their
    * kagome segmentation as synonyms, so a query for the compound also
    * matches documents carrying only its pieces). Query-time
    * expansion: each query term becomes a synonym GROUP, a document
    * matching ANY member matches the group as if it were the query
    * word itself (Meilisearch ranks synonym matches as the same word)
    * — in BM25 terms the group scores as ONE term with tf = Σ member
    * tf and df = documents containing any member, the classic
    * query-expansion formulation. Scoring is tx18's exact micro-unit
    * arithmetic with `group` in place of `term`.
    *
    * Scale: the synonym table is vocabulary-sized and BROADCASTS into
    * the postings scan (member → group is an equi-join, and the member
    * filter prunes the exploded stream immediately); everything
    * downstream runs on the match set, exactly like tx18.
    */
  def synonymSearch(s: SparkSession, dir: String,
                    groups: Map[String, Seq[String]] = Map(
                      "merge" -> Seq("merge", "join"),
                      "stream" -> Seq("stream", "batch"),
                      "window" -> Seq("window"))): DataFrame =
    synonymSearchOn(Tables.documents(s, dir), groups)

  /** Synonym-expanded BM25 over any (doc_id, text) frame — tx45's body. */
  def synonymSearchOn(d: DataFrame, groups: Map[String, Seq[String]]): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val syn = groups.toSeq.flatMap { case (g, ms) => ms.map(m => (g, m)) }
      .toDF("grp", "member")
    val docs = d
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), microRatio(sum("dl"), count(lit(1)), 6).as("avgdl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(syn), col("term") === col("member"))
      .groupBy("doc_id", "dl", "grp")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("grp").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "grp")
      .crossJoin(broadcast(stats))
      .withColumn("idf", microRound(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1), 6))
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))) * 1e6,
          0).cast("long"))
      .groupBy("doc_id")
      .agg((round(sum("contrib_u") / 1e2, 0).cast("long") / 1e4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
  }

  /** tx42: filter-composed search — the production search-call shape.
    * Every search the reference's indexer actually issues composes
    * attribute filters with relevance ranking: search-indexer/app/
    * driver/meilisearch_driver.go:274 (`SearchWithFilters` — attribute
    * filter expressions ANDed into the query) and :314
    * (`SearchWithDateFilter` — publishedAfter/publishedBefore range).
    * Re-expressed lake-side: the attribute predicates (lang, source)
    * and the range predicate (n_chars, standing in for the published
    * date — the documents table carries no timestamp) are plain column
    * filters applied BEFORE tokenization, so Catalyst pushes all three
    * into the parquet scan (PushedFilters: EqualTo(lang), In(source),
    * GreaterThanOrEqual/LessThanOrEqual(n_chars)) and the whole BM25
    * pipeline — tokenize, tf, df, corpus stats, score — runs over only
    * the filtered slice, never the corpus. Scoring is tx18's exact
    * micro-unit arithmetic over the filtered collection ("search this
    * filtered view"; the materialized-index form with index-wide
    * df/avgdl stats and the same pushed predicate is
    * SearchIndex.bm25QueryFiltered, spec-pinned). At 100 TB the filter
    * is the point: a date+attribute predicate over a partitioned lake
    * prunes partitions/row-groups at the scan, and everything
    * downstream is proportional to the match set.
    */
  def filteredSearch(s: SparkSession, dir: String): DataFrame = {
    val query = Seq("merge", "join", "stream")
    val docs = Tables.documents(s, dir)
      .filter(col("lang") === "en" &&
              col("source").isin("src3", "src7", "src11") &&
              col("n_chars").between(100, 400))
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), microRatio(sum("dl"), count(lit(1)), 6).as("avgdl"))
    val tf = docs.select(col("doc_id"), col("source"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy("doc_id", "source", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", microRound(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1), 6))
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))) * 1e6,
          0).cast("long"))
      .groupBy("doc_id", "source")
      .agg((round(sum("contrib_u") / 1e2, 0).cast("long") / 1e4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
  }

  /** q16: substring text search + per-source hit counts (the
    * search-indexer / pg_trgm ILIKE surface of alt-backend's feed
    * search drivers).
    */
  def textSearch(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("text").contains("merge join"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_hits"))

  /** tx09: token-set Jaccard similarity on source-blocked pairs.
    *
    * EXACT oracle-parity baseline: same-source is part of the pair
    * semantics, but ~10 sources keep Σ block² at O(n²/10) — the answer
    * sheet, not the 100 TB plan. The designated scale path is
    * `lshJaccardPairs` (tx17): identical verify over minhash-band
    * candidates, where block sizes are set by signature collisions
    * (tiny for dissimilar docs) instead of source cardinality.
    */
  def tokenJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("source"), array_distinct(tokens(col("text"))).as("toks"))
    val a = d.select(col("source"), col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = d.select(col("source"), col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, "source")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", microRound(jaccard(col("toks_a"), col("toks_b")), 4))
      .filter(col("jaccard") >= 0.6)
      .select("source", "doc_a", "doc_b", "jaccard")
  }

  /** tx17: the same pair semantics as tx09 (same source, token-set
    * Jaccard ≥ 0.6, doc_id < 1000) with minhash-band blocking instead
    * of source blocking — the 100 TB shape. Candidates come from an
    * equi-join on band hashes (block size ∝ signature collisions, not
    * source cardinality); the exact Jaccard + same-source predicate is
    * verified on candidates only, so every emitted pair is correct and
    * only borderline-τ pairs can be missed (banding recall at j = 0.6
    * with 16×4 bands is ~0.89, →1 as j grows; the spec pins both
    * properties against tx09's exact output). Rows-only: DuckDB cannot
    * mirror the XXH64 band hashes.
    */
  /** tx23: token-budget sequence packing — the concat-then-chunk step
    * that turns a cleaned corpus into fixed-budget training sequences
    * (the data-prep side of the reference's LLM pipelines: news-creator
    * feeds summarization prompts under a context budget). Each document
    * is assigned to the sequence where its first token lands in the
    * concatenated doc_id-ordered token stream.
    *
    * The prefix sum is the scalable two-level form, not a global
    * window: per-coarse-bucket totals (one shuffle, ≤ N/bucketSize
    * rows) are cumulated on a tiny frame and broadcast back as
    * offsets, then the in-bucket window partitions by bucket — no
    * single-partition pass ever sees the full corpus.
    */
  def sequencePacking(s: SparkSession, dir: String,
                      budget: Int = 2048, bucketSize: Int = 256): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("bucket", floor(col("doc_id") / bucketSize))
    val wBuckets = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("offset", coalesce(sum("bucket_tokens").over(wBuckets), lit(0L)))
      .select("bucket", "offset")
    val wInBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .join(broadcast(offsets), "bucket")
      .withColumn("cum", col("offset") + sum("n_tokens").over(wInBucket))
      .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / budget))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }

  /** tx25: per-doc unigram log-likelihood under the corpus LM — the
    * perplexity-style quality filter (docs far below the corpus-average
    * likelihood are boilerplate/noise candidates; the statistical
    * sibling of tx04's rule-based gate). Same inverted-index shuffle
    * shape as TF-IDF: tf by (doc, term), corpus term counts by term,
    * probabilities joined back on term — the total-token count is a
    * broadcast singleton, and log-probs are rounded before the per-doc
    * sum so both engines aggregate identical addends.
    */
  def unigramLogLik(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy("term").agg(sum("tf").as("ctf"))
    val total = termCounts.agg(sum("ctf").as("total"))
    // log-probs aggregate as exact integer MICRO-units (round(log2·1e6)
    // as long): double sums of rounded values can land on a half-way
    // 4-decimal boundary where the two engines' summation ORDER flips
    // the rounding (observed at sf0.1); integer addends make the sum
    // order-independent and bit-identical everywhere. The final round
    // happens at scale 0 (micro-units/100 → 1e-4 units): half-INTEGERS
    // are exactly representable doubles, so Spark's shortest-string
    // BigDecimal rounding and DuckDB's binary std::round agree — a
    // 4-decimal round of the double quotient does not (doc hit at
    // sf0.1 where the quotient's shortest repr was "…5" but its binary
    // value sat below the boundary)
    tf.join(termCounts, "term")
      .crossJoin(broadcast(total))
      .withColumn("logp_u",
        round(log2(col("ctf") / col("total")) * 1e6, 0).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum("tf").as("n_tokens"),
        (round(sum(col("tf") * col("logp_u")) / sum("tf") / 100, 0).cast("long") / 1e4)
          .as("avg_log2_lik"))
  }

  /** tx41: per-doc INTERPOLATED BIGRAM log-likelihood — the CCNet-style
    * LM perplexity filter (Wenzek et al. 2020 scores CommonCrawl with a
    * corpus LM and drops the tail; tx25 is the unigram version, this
    * adds the order-2 signal that catches shuffled-word salad tx25
    * scores as fluent). p(cur|prev) = λ·c(prev,cur)/c(prev) +
    * (1−λ)·c(cur)/total — Jelinek–Mercer interpolation, so unseen
    * bigrams back off to the unigram floor and the log never hits −∞.
    *
    * Scale: the bigram frame is exactly the corpus token count (one row
    * per adjacent pair, built by a stateless array transform — no
    * self-join, no window over token positions); all three count
    * tables shuffle map-side-combined on their keys, the token total
    * rides as a broadcast scalar, and log-probs round before the
    * per-doc sum so both engines aggregate identical addends.
    */
  def bigramLogLik(s: SparkSession, dir: String,
                   lambda: Double = 0.9): DataFrame =
    bigramLogLikOn(Tables.documents(s, dir), lambda)

  /** Bigram LM scoring over any (doc_id, text) frame. */
  def bigramLogLikOn(docs: DataFrame, lambda: Double = 0.9): DataFrame = {
    val d = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val bf = d.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
             i -> struct(toks[i-1] AS prev, toks[i] AS cur))""")).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
      .groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("bf"))
    val big = bf.groupBy("prev", "cur").agg(sum("bf").as("cbg"))
    val prevCounts = big.groupBy("prev").agg(sum("cbg").as("cprev"))
    val uni = d.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cuni"))
    val total = uni.agg(sum("cuni").as("total"))
    // integer micro-unit log-probs for order-independent sums, final
    // round at scale 0 in 1e-4 units (the tx25 boundary lessons)
    bf.join(big, Seq("prev", "cur"))
      .join(prevCounts, Seq("prev"))
      .join(uni.withColumnRenamed("term", "cur"), Seq("cur"))
      .crossJoin(broadcast(total))
      .withColumn("logp_u", round(log2(
        lit(lambda) * col("cbg") / col("cprev") +
        lit(1.0 - lambda) * col("cuni") / col("total")) * 1e6, 0).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum("bf").as("n_bigrams"),
        (round(sum(col("bf") * col("logp_u")) / sum("bf") / 100, 0).cast("long") / 1e4)
          .as("avg_log2_lik"))
  }

  /** tx26: benchmark decontamination — flag training documents that
    * share any word n-gram with a held-out evaluation set (the GPT-3/
    * PaLM-style 8-gram contamination check; the data-prep gate every
    * LLM pipeline needs before training on scraped corpora). The eval
    * set's distinct shingles are the small side (benchmarks are
    * ~10⁵-10⁶ docs vs a 100 TB corpus) and broadcast into the train
    * scan, so the check is one corpus pass + a per-doc rollup; swap the
    * join key to xxhash64(shingle) when shingle strings dominate the
    * broadcast budget — same plan, 8-byte keys.
    */
  def decontaminationOn(docs: DataFrame, isEval: org.apache.spark.sql.Column,
                        n: Int): DataFrame = {
    val evalShingles = docs.filter(isEval)
      .select(explode(array_distinct(shingles(col("text"), n))).as("sh"))
      .distinct()
    docs.filter(!isEval)
      .select(col("doc_id"), explode(array_distinct(shingles(col("text"), n))).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  def decontamination(s: SparkSession, dir: String, n: Int = 8): DataFrame =
    decontaminationOn(Tables.documents(s, dir), col("doc_id") % 100 === 0, n)

  /** tx27: n-gram repetition quality filter — fraction of duplicated
    * word trigrams per document (the Gopher/RefinedWeb repetition
    * rule: templated/boilerplate text repeats its own n-grams and gets
    * gated before training). Stateless per-row projection; one scan,
    * no shuffle at any scale.
    */
  def repetitionFilterOn(docs: DataFrame, n: Int, maxDupRatio: Double): DataFrame =
    docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_grams"),
              size(array_distinct(col("sh"))).as("n_distinct"))
      .filter(col("n_grams") > 0)
      // gate on the exact 1e-4-unit integer, never the re-divided double
      .withColumn("dup_u", microUnits(col("n_grams") - col("n_distinct"), col("n_grams"), 4))
      .select(col("doc_id"), col("n_grams"), (col("dup_u") / 1e4).as("dup_ratio"),
              when(col("dup_u") > math.round(maxDupRatio * 1e4), 1).otherwise(0).as("flagged"))

  def repetitionFilter(s: SparkSession, dir: String,
                       n: Int = 3, maxDupRatio: Double = 0.2): DataFrame =
    repetitionFilterOn(Tables.documents(s, dir), n, maxDupRatio)

  /** tx28: sentence-level exact dedup — the reference's actual dedup
    * granularity (recap-worker hashes SENTENCES with XXH3 and keeps
    * first occurrences, text.rs hash_text + the near-dup filter; a
    * recap must not repeat a sentence two articles share). Explode to
    * sentences, hash, keep the (doc_id, idx)-earliest occurrence per
    * hash, report per-doc survival. The keeper election is
    * min(struct(doc_id, idx)) per hash — struct ordering IS the
    * (doc asc, idx asc) election — via groupBy, NOT row_number over a
    * hash-partitioned window: a window buffers each hash group on one
    * task, and a web corpus's boilerplate sentence ("thanks for
    * reading" × 10⁷ docs) is exactly the hot group that must
    * map-side-combine away instead. Both aggregations read the
    * persisted 20-byte (doc, idx, h) frame — sentence strings never
    * shuffle.
    * Rows-only: the sentence splitter uses lookbehind, which DuckDB's
    * RE2 cannot mirror.
    */
  def sentenceDedupOn(docs: DataFrame): DataFrame = {
    // persisted: feeds both the per-doc totals and the keeper election
    // (the precedent of minhashLshPairs' shingle frame)
    val sent = docs
      .select(col("doc_id"),
              posexplode(graft.functions.TextFunctions.sentences(col("text"))).as(Seq("idx", "sentence")))
      .select(col("doc_id"), col("idx"), xxhash64(col("sentence")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDoc = sent.groupBy("doc_id").agg(count(lit(1)).as("n_sentences"))
    val keptPerDoc = sent
      .groupBy("h").agg(min(struct(col("doc_id"), col("idx"))).as("k"))
      .groupBy(col("k.doc_id").as("doc_id")).agg(count(lit(1)).as("n_kept"))
    perDoc.join(keptPerDoc, Seq("doc_id"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("n_dropped", col("n_sentences") - col("n_kept"))
      .select("doc_id", "n_sentences", "n_kept", "n_dropped")
      .orderBy("doc_id")
  }

  def sentenceDedup(s: SparkSession, dir: String): DataFrame =
    sentenceDedupOn(Tables.documents(s, dir))

  /** tx29: topic coherence (NPMI) — treat each source's top document-
    * frequency terms as its "topic" and score the topic's quality as
    * the mean normalized PMI of its term pairs over corpus document
    * co-occurrence (recap-subworker/services/coherence.py evaluates
    * clusters with exactly this family; NPMI is its C_NPMI measure
    * with add-one smoothing applied to ALL probabilities — smoothing
    * only the joint leaves p_ab = 1 reachable, where the -ln(p_ab)
    * denominator is 0 and an all-document pair scores NaN). The expensive-looking
    * part — pairwise joint document counts — only ever runs on the
    * |sources|×topK topic terms (broadcast-filtered before the
    * self-join), never on the full vocabulary.
    */
  def topicCoherence(s: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    // (doc, term) incidence for informative terms — reused by all
    // three counting passes, so compute/persist once
    val dt = docs
      .select(col("doc_id"), col("source"), explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(length(col("term")) >= 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val docFreq = dt.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    // per-source topic = top-K terms by in-source document frequency
    val wTop = Window.partitionBy("source").orderBy(col("sdf").desc, col("term").asc)
    // topTerms feeds three consumers (vocab + both pair sides): persist
    // so the window-over-aggregation pipeline runs once
    val topTerms = dt.distinct()
      .groupBy("source", "term").agg(count(lit(1)).as("sdf"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= topK)
      .select("source", "term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val topicVocab = topTerms.select("term").distinct()
    // joint document counts, restricted to topic vocabulary; persisted
    // because the pair self-join references it twice
    val dtt = dt.select("doc_id", "term").distinct()
      .join(broadcast(topicVocab), "term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joint = dtt.select(col("doc_id"), col("term").as("term_a"))
      .join(dtt.select(col("doc_id"), col("term").as("term_b")), "doc_id")
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("joint"))
    // topic term pairs scored by NPMI under add-one smoothing of ALL
    // probabilities: p_ab = (joint+1)/(n+2), p_x = (df_x+1)/(n+2).
    // Smoothing only the joint lets p_ab reach 1 (joint = n-1 → the
    // -ln(p_ab) denominator is 0) or pass it (joint = n → the sign
    // flips and a perfectly co-occurring pair scores -1); consistent
    // smoothing keeps p_ab ≤ min(p_a, p_b) < 1, so NPMI is finite,
    // lands in [-1, 1], and an all-document pair scores exactly +1.
    val pairs = topTerms.select(col("source"), col("term").as("term_a"))
      .join(topTerms.select(col("source"), col("term").as("term_b")), "source")
      .filter(col("term_a") < col("term_b"))
      .join(joint, Seq("term_a", "term_b"), "left")
      .join(broadcast(docFreq.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(docFreq.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(nDocs))
      .withColumn("n2", col("n_docs") + lit(2))
      .withColumn("p_ab", (coalesce(col("joint"), lit(0L)) + 1) / col("n2"))
      // per-pair NPMI in exact 1e6-unit longs (scale-0 round of an
      // identical-double quotient), so the per-source mean is a ratio
      // of exact integers — no engine-order-dependent double sum
      .withColumn("npmi_u",
        round(log(col("p_ab") * col("n2") * col("n2") / ((col("df_a") + 1) * (col("df_b") + 1))) /
              -log(col("p_ab")) * 1e6, 0).cast("long"))
    val result = pairs.groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
           (round(sum("npmi_u") / (count(lit(1)) * 1e2), 0).cast("long") / 1e4).as("coherence"))
    val rows = result.collect()
    dt.unpersist(); topTerms.unpersist(); dtt.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
  }

  /** Sliding-window co-occurrence edges over positioned tokens
    * (doc_id, pos, term): one undirected weighted edge per unordered
    * term pair that co-occurs within `window` positions in some
    * document, weight = the number of DOCUMENTS where it does
    * (window → ∞ recovers the document-level co-occurrence convention
    * exactly, so edge weights stay comparable to it). Pair generation
    * is LINEAR — Σ|tokens|·window rows via offset-explode + equi-join
    * on (doc_id, pos), never a per-document all-pairs join (which is
    * quadratic in document length: one 10k-term document would
    * materialize 10⁸ pair rows before any weight floor prunes).
    */
  private[graft] def windowCooccurrenceEdges(toks: DataFrame, window: Int): DataFrame = {
    require(window >= 1)
    // position-bucket banding instead of exploding every token to its
    // `window` probe positions: a forward partner at pos2 ∈ (pos,
    // pos+w] sits in bucket ⌊pos2/w⌋ ∈ {⌊pos/w⌋, ⌊pos/w⌋+1}, so
    // registering the RIGHT side under its own and previous bucket
    // makes the window an equi-join on (doc, bucket) that shuffles
    // ≤ 3× the token count — the probe-explosion form shuffles
    // (window+1)×. Exactly one of the two registrations matches a
    // given left row (the two carry distinct bucket values), so no
    // pair double-counts.
    val a = toks.select(col("doc_id"), col("pos"), col("term").as("ta"))
      .withColumn("b", floor(col("pos") / window))
    val bSide = toks.select(col("doc_id"), col("pos").as("pos_b"), col("term").as("tb"))
      .withColumn("b", explode(array(floor(col("pos_b") / window),
                                     floor(col("pos_b") / window) - 1)))
    a.join(bSide, Seq("doc_id", "b"))
      .filter(col("pos_b") > col("pos") && col("pos_b") <= col("pos") + window)
      .filter(col("ta") =!= col("tb")) // no self-loops
      .select(col("doc_id"),
              least(col("ta"), col("tb")).as("ta"),
              greatest(col("ta"), col("tb")).as("tb"))
      .distinct() // doc-frequency weighting: each doc votes once per pair
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("w"))
  }

  /** tx30: TextRank keyword extraction — weighted PageRank over the
    * term co-occurrence graph, top-K terms by rank (Mihalcea & Tarau
    * 2004, public; the reference's tag-generator extracts article
    * keywords — tag-generator/app/tag_extractor/ — and TextRank is the
    * classic graph formulation of that task; Tag Verse renders the
    * same co-occurrence graph tx11 builds). Edges follow the paper's
    * §3.1 sliding-window convention (len ≥ 3 terms, positions within
    * `window`, doc-frequency weights, floor 5 to cut the noise tail),
    * symmetrized; ranks from Graph.weightedPagerank. The corpus-sized
    * work is the one linear pair generation + edge aggregation; the
    * iteration joins run over the (vocabulary-sized) edge list, and
    * top-K is TakeOrdered — never a global window.
    */
  def textrankKeywords(s: SparkSession, dir: String, topK: Int = 20,
                       window: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksRaw = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .filter(length(col("term")) >= 3)
    // dictionary-encode terms to ints BEFORE the pair stage (§2.3
    // narrower types / §8 lightweight proxy): the join output (~12
    // pairs per token) then hashes/compares/shuffles two ints per row
    // instead of two strings, and all three pagerank iterations key on
    // ints. Ids are ORDER-ISOMORPHIC with the terms (row_number over
    // the sorted vocabulary — es11's bounded-catalog ordinal shape),
    // so least/greatest pair canonicalization and the rank's node-asc
    // tie-break pick exactly the same rows; only the bounded top-K is
    // decoded back to strings.
    val vocab = toksRaw.select("term").distinct()
      .withColumn("tid", row_number().over(Window.orderBy("term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = toksRaw.join(broadcast(vocab), "term")
      .select(col("doc_id"), col("pos"), col("tid").as("term"))
    // the floored edge list is vocabulary-sized — persist it so the
    // corpus-sized pair-generation join runs exactly ONCE.
    // weightedPagerank references its edge input from several actions
    // (node count, share materialization, each iteration); unpersisted,
    // every one of them replays the generation (measured: the replay
    // was 3x the whole query's useful work at sf0.1)
    val pe = windowCooccurrenceEdges(toks, window).filter(col("w") >= 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = pe.select(col("ta").as("src"), col("tb").as("dst"), col("w"))
      .union(pe.select(col("tb").as("src"), col("ta").as("dst"), col("w")))
    val ranks = Graph.weightedPagerank(edges, damping = 0.85, iters = 3)
    pe.unpersist() // ranks are materialized inside weightedPagerank
    val top = ranks
      .orderBy(col("rank").desc, col("node").asc).limit(topK)
      .join(broadcast(vocab), col("node") === col("tid"))
      // re-establish the selection order after the decode join (raw
      // rank, then term — identical to node-asc by order-isomorphism)
      .orderBy(col("rank").desc, col("term").asc)
      .select(col("term"), (microRound(col("rank"), 6)).as("rank"))
    val rows = top.collect()
    ranks.unpersist(); vocab.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), top.schema)
  }

  /** tx24: PII scrub audit over composed log lines — redact IDs/emails/
    * URLs from the event stream and roll up how much was redacted per
    * type (the sanitization gate + its audit metric in one pass). The
    * scrub is a stateless per-row projection: at 100 TB this is one
    * scan, no shuffle before the (tiny) per-type rollup.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("line", concat(
        lit("user="), col("user_id").cast("string"),
        lit(" type="), col("event_type"),
        lit(" props="), col("props")))
      .withColumn("n_hits", piiHits(col("line"), "\\d{2,}"))
      .withColumn("scrubbed", scrubPii(col("line")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        sum("n_hits").as("n_num_hits"),
        count(when(col("n_hits") === 0, 1)).as("n_clean_rows"),
        min("scrubbed").as("sample_scrubbed"))

  def lshJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFunctions.minhashBands
    val d = Tables.documents(s, dir)
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("source"), array_distinct(tokens(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = d.select(col("doc_id"),
      explode(minhashBands(col("toks"), 64, 16)).as("band"))
    val cand = banded.select(col("band"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("doc_id").as("doc_b")), "band")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("source"), col("toks").as("toks_a")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("source").as("source_b"), col("toks").as("toks_b")), "doc_b")
      .filter(col("source") === col("source_b"))
      .withColumn("jaccard", microRound(jaccard(col("toks_a"), col("toks_b")), 4))
      .filter(col("jaccard") >= 0.6)
      .select("source", "doc_a", "doc_b", "jaccard")
  }

  /** tx31: exact phrase search over positional postings — the
    * phrase-query half of the search surface tx18's BM25 ranks single
    * terms for (search-indexer feeds Meilisearch, whose exactness
    * ranking rule needs adjacent-position matches; classic positional
    * inverted index, Zobel & Moffat 2006).
    *
    * Plan: posexplode to (doc, pos, token) postings, keep ONLY the
    * phrase's two terms (the filter sits before the generator output
    * is shuffled, so postings volume is the phrase terms' document
    * frequency, not the corpus token count), then a positional
    * equi-join on (doc_id, pos+1 = pos) counts adjacent occurrences
    * per doc. Top-20 by hit count via TakeOrdered. At 100 TB this is
    * exactly a phrase query against a sharded inverted index: only
    * two postings lists move, co-partitioned by doc.
    */
  def phraseSearch(s: SparkSession, dir: String,
                   first: String = "table", second: String = "scan"): DataFrame = {
    val postings = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(first, second))
    val p1 = postings.filter(col("tok") === first)
      .select(col("doc_id"), col("source"), (col("pos") + 1).as("next_pos"))
    val p2 = postings.filter(col("tok") === second)
      .select(col("doc_id"), col("pos").as("next_pos"))
    p1.join(p2, Seq("doc_id", "next_pos"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id").asc)
      .limit(20)
  }

  /** tx32: corpus statistics fit — Zipf slope/R² of the top-K term
    * frequencies (regr over ln rank vs ln freq; natural text ≈ −1,
    * and a corpus whose slope drifts is a corpus whose composition
    * changed — the vocabulary-level sibling of dq04's value-level
    * PSI), plus vocabulary size and token volume. The
    * Zipf/Heaps-shape gate a training-data pipeline runs per crawl
    * snapshot.
    *
    * Scale: one inverted-index shuffle (term counts, map-side
    * combined), a TakeOrdered top-K, and the regression runs on K
    * rows; vocab/token totals partial-aggregate in the same pass
    * shape. Output is one row.
    */
  def zipfFit(s: SparkSession, dir: String, topK: Int = 100): DataFrame = {
    val freqs = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = freqs
      .orderBy(col("freq").desc, col("term").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("term").asc)))
    // The regression runs on exact integer moments of 1e6-unit logs:
    // regr_slope/regr_r2 sum doubles in engine order, so their 6-dp
    // rounds could diverge; here EVERY moment product runs in
    // decimal(38,0) (HUGEINT on the oracle side): |u| ≤ 2e7 means
    // u·u ~ 4e14 per row, and the centered moments n·Σuu − Σu·Σu
    // reach ~7e21 at K = 1e4 — past Long.MaxValue, where a plain long
    // multiply would wrap SILENTLY under non-ANSI arithmetic (the
    // oracle's HUGEINT would stay correct, so the engines would
    // diverge exactly when the corpus grows). The slope is one
    // identical-double quotient of the exact decimals.
    val dec = "decimal(38,0)"
    val fit = top
      .withColumn("xu", round(log(col("rank")) * 1e6, 0).cast("long"))
      .withColumn("yu", round(log(col("freq")) * 1e6, 0).cast("long"))
      .agg(
        count(lit(1)).as("n"),
        sum("xu").as("sx"), sum("yu").as("sy"),
        sum(col("xu").cast(dec) * col("yu").cast(dec)).as("sxy"),
        sum(col("xu").cast(dec) * col("xu").cast(dec)).as("sxx"),
        sum(col("yu").cast(dec) * col("yu").cast(dec)).as("syy"))
      .withColumn("cxy", col("n").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy").cast(dec))
      .withColumn("cxx", col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx").cast(dec))
      .withColumn("cyy", col("n").cast(dec) * col("syy") - col("sy").cast(dec) * col("sy").cast(dec))
      .select(
        col("n").as("n_ranked"),
        (round(col("cxy").cast("double") * 1e6 / col("cxx").cast("double"), 0)
          .cast("long") / 1e6).as("zipf_slope"),
        // R²'s square would need 76 decimal digits — square the exact
        // decimals AFTER the double cast (deterministic x·x in both
        // engines; doubles cannot wrap)
        (round(col("cxy").cast("double") * col("cxy").cast("double") * 1e6 /
               (col("cxx").cast("double") * col("cyy").cast("double")), 0)
          .cast("long") / 1e6).as("zipf_r2"))
    val totals = freqs.agg(
      count(lit(1)).as("vocab_size"),
      sum("freq").as("total_tokens"))
    // one-row output — materialize eagerly to release the vocab cache
    Dedup.materialized(fit.crossJoin(broadcast(totals))) { freqs.unpersist() }
  }

  /** tx34: directed containment pairs — |A∩B|/|A| ≥ τ means doc A is
    * (lexically) contained in doc B: the asymmetric near-dup relation
    * Jaccard misses (a snippet inside a full article scores low
    * symmetric overlap but high containment; dedup should drop the
    * snippet, not treat the pair as unrelated). Same source-blocked
    * candidate shape as tx09, directed output, container must strictly
    * be the longer set on equal-size ties (equal sets are tx06's exact
    * job).
    */
  def containmentPairsOn(docs: DataFrame, tau: Double = 0.95): DataFrame = {
    val d = docs
      .select(col("doc_id"), col("source"), array_distinct(tokens(col("text"))).as("toks"))
    val a = d.select(col("source"), col("doc_id").as("doc_contained"), col("toks").as("toks_a"))
    val b = d.select(col("source"), col("doc_id").as("doc_container"), col("toks").as("toks_b"))
    a.join(b, Seq("source"))
      .filter(col("doc_contained") =!= col("doc_container"))
      .filter(size(col("toks_a")) < size(col("toks_b")) ||
              (size(col("toks_a")) === size(col("toks_b")) && col("doc_contained") < col("doc_container")))
      .withColumn("cont_u",
        microUnits(size(array_intersect(col("toks_a"), col("toks_b"))), size(col("toks_a")), 4))
      .filter(col("cont_u") >= math.round(tau * 1e4))
      .select(col("source"), col("doc_contained"), col("doc_container"),
              (col("cont_u") / 1e4).as("containment"))
  }

  /** Driver adapter for tx34: the doc_id < 1000 sample is a harness
    * choice, NOT part of the operator — library callers run
    * [[containmentPairsOn]] over the full corpus.
    */
  def containmentPairs(s: SparkSession, dir: String, tau: Double = 0.95): DataFrame =
    containmentPairsOn(Tables.documents(s, dir).filter(col("doc_id") < 1000), tau)

  /** tx38: dictionary-assisted Japanese tokenization — longest-match
    * against the embedded lexicon (TextFunctions.jaLexicon) with the
    * per-char fallback, demonstrated on a planted Japanese fixture:
    * the synthetic corpus carries no real CJK text (its "zh" docs are
    * ASCII), so the compounds that exercise segmentation are planted
    * VALUES, identical in the DuckDB oracle. Per doc: the segmented
    * token stream, its token count, and the per-char baseline count —
    * segmentation "beats" per-char when compounds collapse to single
    * meaningful terms (n_dict_tokens < n_char_tokens).
    * Mirrors search-indexer's kagome tokenization
    * (search-indexer/app/tokenize/tokenizer.go:10) and tag-generator's
    * Japanese extractor (tag_extractor/japanese_extractor.py).
    */
  def dictTokensJa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = jaFixture.toDF("doc_id", "text")
    planted.select(col("doc_id"),
      array_join(graft.functions.TextFunctions.tokensDictJa(col("text")), "|").as("tokens"),
      size(graft.functions.TextFunctions.tokensDictJa(col("text"))).cast("long").as("n_dict_tokens"),
      size(graft.functions.TextFunctions.tokensMixed(col("text"))).cast("long").as("n_char_tokens"))
  }

  /** The planted Japanese sentences tx38 segments (public everyday
    * phrasing; compounds all covered by jaLexicon so the intended
    * longest matches are unambiguous).
    */
  private[graft] val jaFixture: Seq[(Long, String)] = Seq(
    (1L, "東京都で機械学習と自然言語処理を学ぶ"),
    (2L, "大規模な分散処理で文書の重複排除を高速化する"),
    (3L, "人工知能と深層学習による日本語の全文検索と索引の構築"),
    (4L, "データ分析の結果を可視化する"),
    (5L, "spark で日本語テキストを処理する"))

  /** tx36: search snippets (keyword-in-context) — for docs matching a
    * query term, the hit count and a ±3-token window around the FIRST
    * hit (the highlighted-snippet half of the search surface next to
    * tx18's ranking and tx31's phrase matching; Meilisearch returns
    * exactly this `_formatted` context). Pure per-row array ops
    * (array_position / filter / slice) — a stateless codegen
    * projection, the snippet never re-scans the document text.
    */
  def searchSnippets(s: SparkSession, dir: String, term: String = "spark",
                     k: Int = 20): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .withColumn("pos", array_position(col("toks"), term))
      .filter(col("pos") > 0)
      .withColumn("n_hits", size(filter(col("toks"), t => t === term)))
      .withColumn("snippet",
        array_join(slice(col("toks"), greatest(lit(1), col("pos") - 3).cast("int"), lit(7)), " "))
      .select("doc_id", "source", "n_hits", "pos", "snippet")
      .orderBy(col("n_hits").desc, col("doc_id").asc)
      .limit(k)

  /** Distinct char trigrams of a (lowercased) token, pg_trgm-padded:
    * two leading + one trailing space, so word starts and ends carry
    * weight. Pure codegen array ops — no UDF.
    */
  private def charTrigrams(t: Column): Column = {
    val p = concat(lit("  "), lower(t), lit(" "))
    array_distinct(transform(sequence(lit(1), length(p) - 2), i => p.substr(i, lit(3))))
  }

  /** tx37: typo-tolerant (fuzzy) token search — pg_trgm semantics:
    * char-trigram Jaccard between query and vocabulary tokens, match
    * threshold 0.3, documents ranked by their best-matching token
    * (the typo-tolerance core of the reference's Meilisearch surface,
    * search-indexer/app/driver/meilisearch_driver.go; q16/tx18/tx31
    * all require exact tokens, this survives a misspelled query).
    *
    * Scale shape: trigram sets are computed once per DISTINCT
    * vocabulary token (vocab-sized, not corpus-sized); the candidate
    * set comes from a blocked equi-join on shared trigrams (the tx09
    * blocking shape transposed to char trigrams) so only tokens
    * sharing >= 1 trigram with a query are ever scored; the corpus
    * postings join then runs against the tiny matched-token set
    * (broadcast semi-join prunes at the scan). The final per-query
    * top-k window partitions by query — never global.
    */
  def fuzzySearch(s: SparkSession, dir: String,
                  queries: Seq[String] = Seq("sparc", "custmer", "windoow"),
                  k: Int = 10): DataFrame = {
    import s.implicits._
    val q = queries.toDF("query").withColumn("qtg", charTrigrams(col("query")))
    // persisted: the corpus tokenize+explode feeds BOTH the vocab
    // lineage and the final per-doc scoring join — unpersisted it
    // would scan the documents twice
    val postings = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(length(col("term")) >= 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = postings.select("term").distinct()
      .withColumn("tg", charTrigrams(col("term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = vocab.select(col("term"), explode(col("tg")).as("tgm"))
      .join(broadcast(q.select(col("query"), explode(col("qtg")).as("tgm"))), "tgm")
      .select("query", "term").distinct()
    val matched = cand
      .join(vocab, "term").join(broadcast(q), "query")
      .withColumn("inter", size(array_intersect(col("tg"), col("qtg"))))
      .withColumn("sim",
        col("inter") / (size(col("tg")) + size(col("qtg")) - col("inter")))
      .filter(col("sim") >= 0.3)
      .select("query", "term", "sim")
    val perDoc = postings.join(broadcast(matched), "term")
      .groupBy("query", "doc_id").agg(max("sim").as("sim"))
    val w = Window.partitionBy("query").orderBy(col("sim").desc, col("doc_id").asc)
    val out = perDoc
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query"), col("doc_id"), (microRound(col("sim"), 4)).as("sim"))
    val rows = out.collect() // |queries|·k rows — materialize, then drop the caches
    vocab.unpersist(); postings.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** tx33: per-source lexical divergence — Jensen–Shannon divergence of
    * each source's term distribution from the corpus distribution
    * (which feed "sounds different" — the token-space sibling of dq04's
    * value-space PSI and tx32's shape fit; bounded in [0, ln 2],
    * symmetric, finite without smoothing).
    *
    * Scale: JSD normally needs every source × vocabulary pair (terms
    * the source LACKS still contribute to the q-side KL). The absent
    * terms' contribution has a closed form: when p_t = 0, the term's
    * JSD part is 0.5·q_t·ln 2, so Σ_absent = 0.5·ln 2·(1 − Σ_present
    * q_t) — the whole statistic is computable from the (source, term)
    * PRESENT rows only, no vocabulary × sources expansion. One
    * inverted-index shuffle on (source, term), corpus marginals via a
    * term-partitioned window over that same bounded frame, one rollup.
    */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val byTerm = Window.partitionBy("term")
    val base = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the corpus token total is one scalar — broadcast it rather than
    // running a single-partition window over the whole (source, term)
    // frame (vocabulary is NOT small at web scale)
    val tot = base.agg(sum("n").as("n_corpus"))
    val counts = base
      .withColumn("n_term", sum("n").over(byTerm))
      .withColumn("n_source", sum("n").over(Window.partitionBy("source")))
      .crossJoin(broadcast(tot))
    val scored = counts
      .withColumn("p", col("n") / col("n_source"))
      .withColumn("q", col("n_term") / col("n_corpus"))
      .withColumn("m", (col("p") + col("q")) / 2)
    // per-term contributions quantize to exact 1e9-unit longs before the
    // sums (double sums are engine-order-dependent in their last ulps,
    // and the old 6-dp round of that sum was the latent flip class);
    // the closed-form absent-terms tail uses the SAME exact Σq units
    val out = scored
      .withColumn("a_u",
        round((col("p") * log(col("p") / col("m")) + col("q") * log(col("q") / col("m"))) * 1e9, 0)
          .cast("long"))
      .withColumn("q_u", round(col("q") * 1e9, 0).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_terms"),
        (round((sum("a_u") / 1e9 / 2 +
                (lit(1.0) - sum("q_u") / 1e9) * lit(math.log(2.0) / 2)) * 1e6, 0)
          .cast("long") / 1e6).as("jsd"))
    // |sources| rows — materialize eagerly to release the counts cache
    Dedup.materialized(out) { base.unpersist() }
  }

  /** tx40: prefix search / autocomplete — rank vocabulary terms that
    * start with each query prefix by document frequency (the other
    * half of the reference's typo-tolerant search surface: Meilisearch
    * matches the final query word as a prefix while the user is still
    * typing — search-indexer/app/driver/meilisearch_driver.go; tx37
    * covers the typo side, this covers the prefix side. alt-backend's
    * tag autocomplete is the same shape in raw SQL:
    * shared/driver/alt_db/search_tags_driver.go:23-29 prefix-matches
    * feed_tags on a lower() range index and ranks by
    * COUNT(DISTINCT article_id) top-N).
    *
    * Scale: the vocabulary frame is the inverted-index term list (one
    * map-side-combined shuffle on term). The prefix probe is an
    * EQUI-join on the first two characters — a hash join against a
    * broadcast |prefixes|-row table, never a LIKE theta-join over the
    * vocabulary — with the full startswith check as a post-filter.
    * Top-k per prefix runs on the matched slice only.
    */
  def prefixSearch(s: SparkSession, dir: String,
                   prefixes: Seq[String] = Seq("sp", "cu", "wi"),
                   k: Int = 10): DataFrame = {
    import s.implicits._
    require(prefixes.forall(_.length >= 2), "prefixes must be >= 2 chars")
    val p = prefixes.toDF("prefix")
      .withColumn("blk", substring(col("prefix"), 1, 2))
    val vocab = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("blk", substring(col("term"), 1, 2))
    val matched = vocab.join(broadcast(p), "blk")
      .filter(expr("substr(term, 1, length(prefix)) = prefix"))
    val w = Window.partitionBy("prefix").orderBy(col("df").desc, col("term").asc)
    matched
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("prefix"), col("term"), col("df"))
  }

  /** tx39: Gopher-style document quality rules (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", appendix A1.1 — public) —
    * the standard pretraining heuristic filter battery: word count
    * bounds, mean word length bounds, symbol-to-word ratios (# and
    * ellipsis), bullet-point and ellipsis-ending line fractions,
    * fraction of words containing an alphabetic character, and a
    * minimum stop-word count. Emits every metric plus the composite
    * keep verdict so downstream curation can re-weight individual
    * rules (complements tx04's score-style quality gate with the
    * rule-battery form the published pipelines use).
    *
    * Scale: a stateless per-document projection — higher-order array
    * functions inside whole-stage codegen, no shuffle, no UDF; the
    * filter runs at the scan.
    */
  def gopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesOn(Tables.documents(s, dir))

  /** Rule battery over any (doc_id, source, text) frame. */
  def gopherRulesOn(docs: DataFrame): DataFrame =
    gopherKeepOn(docs.select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source"), col("n_words"),
              microRound(col("mean_word_len"), 4).as("mean_word_len"),
              microRound(col("symbol_ratio"), 6).as("symbol_ratio"),
              microRound(col("bullet_frac"), 4).as("bullet_frac"),
              microRound(col("ellipsis_frac"), 4).as("ellipsis_frac"),
              microRound(col("alpha_frac"), 4).as("alpha_frac"),
              col("n_stop"), col("keep"))

  /** The rule battery WITHOUT the metric projection — every input
    * column (including `text`) survives alongside the raw metrics and
    * `keep`, so the gate composes into pipelines (st24's ingest
    * chain) without a join.
    */
  def gopherKeepOn(docs: DataFrame): DataFrame = {
    val stopRe = "^(the|be|to|of|and|that|have|with)$"
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_words", size(col("toks")))
      .filter(col("n_words") > 0)
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("mean_word_len",
        expr("aggregate(toks, 0L, (a, w) -> a + length(w))") / col("n_words"))
      .withColumn("n_hash",
        length(col("text")) - length(regexp_replace(col("text"), "#", "")))
      .withColumn("n_ellipsis",
        ((length(col("text")) -
          length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3)).cast("long") +
        (length(col("text")) - length(regexp_replace(col("text"), "…", ""))))
      .withColumn("symbol_ratio", (col("n_hash") + col("n_ellipsis")) / col("n_words"))
      .withColumn("bullet_frac",
        expr("size(filter(lines, l -> ltrim(l) rlike '^[-*•]'))") / size(col("lines")))
      .withColumn("ellipsis_frac",
        expr("size(filter(lines, l -> rtrim(l) rlike '(\\\\.\\\\.\\\\.|…)$'))") /
          size(col("lines")))
      .withColumn("alpha_frac",
        expr("size(filter(toks, w -> w rlike '[A-Za-z]'))") / col("n_words"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, w -> lower(w) rlike '$stopRe'))").cast("long"))
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3, 10) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_frac") <= 0.9 &&
        col("ellipsis_frac") <= 0.3 &&
        col("alpha_frac") >= 0.8 &&
        col("n_stop") >= 2)
  }
}
