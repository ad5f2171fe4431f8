package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** English keyword-selection post-processing — the deterministic
  * pipeline around the KeyBERT model call (tag-generator/app/
  * tag_extractor/english_extractor.py:15 `extract_keywords_english`;
  * the model itself is an env-blocked runtime, exactly like the
  * rerank/embedding services — its scored candidate list is the
  * composed INPUT here, and everything after the call is pure
  * selection logic):
  *
  *  - phrase pass (:48): multi-word candidates keep their raw order;
  *    a phrase survives at 1.5× the score threshold AND only when
  *    some raw word is capitalized (tech terms / product names /
  *    proper nouns); its lowered words join the seen set;
  *  - word pass (:61): single words at the base threshold, skipping
  *    words already covered by an accepted phrase (and earlier
  *    single words), generic gates len > 2 and not-digits;
  *  - stable score sort (:73): Python's sort keeps the
  *    phrases-then-words insertion order on ties;
  *  - greedy substring dedupe (:78): walk the sorted list, skip any
  *    candidate in a substring relation (EITHER direction) with an
  *    already-accepted keyword — regardless of score, despite the
  *    comment at :92 (pinned) — cap at top_keywords, confidences
  *    clipped to [0,1] and rounded to 3 dp.
  *
  * Defaults from TagExtractionConfig (config.py:20): top_keywords =
  * 10, min_score_threshold = 0.15 (phrases gate at 0.225).
  *
  * Scale: the entire selection is an in-row fold over ≤ ~12
  * candidate structs — a stateless scan projection posexploded to
  * ≤ top_keywords rows per document; no window, no shuffle, no join.
  *
  * Composition: candidate lists are built from document tokens with
  * capitalized/uncapitalized phrases, threshold-straddling scores,
  * phrase-covered words, digits, short words, and substring pairs
  * planted per residue.
  */
object KeywordSelect {

  val TopKeywords = 10
  val MinScoreThreshold = 0.15

  /** Composed per-doc KeyBERT-style candidates:
    * (doc_id, candidates array<struct<phrase,score>>).
    */
  def composeCandidates(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    def tok(i: Int): Column = element_at(col("toks"), i)
    def cap(c: Column): Column =
      concat(upper(substring(c, 1, 1)), substring(c, 2, 1000))
    def sc(k: Int, m: Int): Column =
      (pmod(col("doc_id") * k + m, lit(80)) + 10).cast("double") / 100 // 0.10-0.89
    val cands = array(
      // a capitalized phrase (passes the proper-noun gate when its
      // score clears 0.225) and an uncapitalized one (never kept)
      struct(concat(cap(tok(1)), lit(" "), tok(2)).as("phrase"), sc(3, 1).as("score")),
      struct(concat(tok(3), lit(" "), tok(4)).as("phrase"), sc(5, 2).as("score")),
      // a word covered by phrase 1 (skipped whenever that phrase was
      // kept), plus independent words
      struct(tok(2).as("phrase"), sc(7, 3).as("score")),
      struct(tok(5).as("phrase"), sc(11, 4).as("score")),
      struct(tok(6).as("phrase"), sc(13, 5).as("score")),
      // generic gates: digits and a 2-char word never survive
      struct(lit("2024").as("phrase"), lit(0.9).as("score")),
      struct(lit("ai").as("phrase"), lit(0.9).as("score")),
      // a capitalized THREE-word phrase sharing tok(5) — a substring
      // relation with the tok(5) single word resolves by score order
      struct(concat(cap(tok(5)), lit(" "), tok(6), lit(" "), tok(7)).as("phrase"),
        sc(17, 6).as("score")))
    d.select(col("doc_id"), cands.as("candidates"))
  }

  /** The selection over any (doc_id, candidates) frame →
    * (doc_id, rank, tag, confidence).
    */
  def selectOn(frame: DataFrame): DataFrame = {
    val phraseThresholdU = math.round(MinScoreThreshold * 1.5 * 1e6) // 225000
    val wordThresholdU = math.round(MinScoreThreshold * 1e6)
    // exact 1e-6-unit scores (composed scores are hundredths)
    val withU = transform(col("candidates"), (c, i) => struct(
      lower(trim(c.getField("phrase"))).as("p"),
      trim(c.getField("phrase")).as("raw"),
      round(c.getField("score") * 1e6, 0).cast("long").as("u"),
      i.as("idx")))
    // phrase pass: ≥2 words, u ≥ 225000, some raw word capitalized
    val phrases = filter(withU, c =>
      size(split(c.getField("p"), " ")) >= 2 &&
        c.getField("u") >= phraseThresholdU &&
        exists(split(c.getField("raw"), "\\s+"),
          w => w.rlike("^[A-Z]")))
    val seenWords = array_distinct(flatten(
      transform(phrases, c => split(c.getField("p"), " "))))
    // word pass: 1 word, u ≥ 150000, unseen, len > 2, not digits;
    // in-pass duplicates keep the first raw occurrence
    val words0 = filter(withU, c =>
      size(split(c.getField("p"), " ")) === 1 &&
        c.getField("u") >= wordThresholdU &&
        !array_contains(seenWords, c.getField("p")) &&
        length(c.getField("p")) > 2 &&
        !c.getField("p").rlike("^[0-9]+$"))
    val words = filter(words0, (c, i) =>
      !exists(slice(words0, lit(1), i), e => e.getField("p") === c.getField("p")))
    // stable (score desc, phase, raw idx) sort via a sortable struct:
    // phases concat in order, so raw idx within the concatenated list
    // IS the insertion order
    val merged = concat(phrases, words)
    val sorted = array_sort(transform(merged, (c, i) => struct(
      (-c.getField("u")).as("nu"), i.as("ins"),
      c.getField("p").as("p"), c.getField("u").as("u"))))
    // greedy substring dedupe + cap, folded left to right
    val selected = aggregate(sorted,
      array().cast("array<struct<p:string,u:long>>"),
      (acc, c) => when(
        size(acc) >= TopKeywords ||
          exists(acc, s => s.getField("p").contains(c.getField("p")) ||
            c.getField("p").contains(s.getField("p"))),
        acc)
        .otherwise(concat(acc, array(struct(c.getField("p").as("p"),
          c.getField("u").as("u"))))))
    frame
      .select(col("doc_id"), posexplode(selected).as(Seq("pos", "kw")))
      .select(col("doc_id"), (col("pos") + 1).as("rank"),
        col("kw.p").as("tag"),
        // clip to [0,1] then round to 3 dp on the exact units
        (round(least(greatest(col("kw.u"), lit(0L)), lit(1000000L)) / 1e3, 0)
          .cast("long") / 1e3).as("confidence"))
  }

  def ke01(s: SparkSession, dir: String): DataFrame =
    selectOn(composeCandidates(s, dir))
}
