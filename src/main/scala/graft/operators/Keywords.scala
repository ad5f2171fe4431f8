package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** kw01: per-document per-genre weighted keyword scores — the
  * recap-worker genre keyword matcher (recap-worker/src/
  * classification/keywords.rs: `find_matches` :49 over the compiled
  * DEFAULT_KEYWORDS dictionary :79, `accumulate_scores` :152). This
  * is the operator that PRODUCES the `keyword`/`keyword_support`
  * signals smp08/tg04 consume as inputs.
  *
  * Matching semantics are the reference's Aho-Corasick configuration
  * (MatchKind::LeftmostLongest + ascii_case_insensitive, :27-29):
  * scan left to right, at each position the LONGEST dictionary phrase
  * wins, matches never overlap, and matching is raw substring — no
  * word boundaries, so "rapid" really does contain "api" (scored in
  * the reference, pinned in the spec). Every OCCURRENCE accumulates
  * its entry's weight onto its genre (`*scores.entry(genre) +=
  * weight`), so a phrase hitting twice scores twice.
  *
  * Spark-first re-expression of the automaton: a single alternation
  * regex with the phrases ordered LENGTH-DESCENDING (the tx38
  * technique) — `regexp_extract_all` advances past each match, and
  * at any position Java/RE2 alternation picks the first listed
  * alternative, i.e. the longest phrase — exactly LeftmostLongest.
  * Equal-length phrases can't compete at one position (they'd be
  * equal strings), so the tie order is irrelevant; it is still fixed
  * (length desc, then lexicographic) for determinism.
  *
  * Scale: one stateless scan computing the match array per document,
  * explode to ~matches rows, a BROADCAST join against the 12-entry
  * dictionary to recover (genre, weight), and ONE map-side-combined
  * groupBy (doc_id, genre). No corpus-scale shuffle beyond the final
  * aggregation; the dictionary grows to thousands of phrases before
  * the alternation regex needs replacing with a real trie expression.
  *
  * Composition: the corpus vocabulary contains none of the dictionary
  * phrases, so residue-planted suffixes make every entry (and the
  * case-insensitive and substring rules) fire somewhere.
  */
object Keywords {

  /** keywords.rs:80-142 DEFAULT_KEYWORDS — (genre, weight, phrase). */
  val dictionary: Seq[(String, Int, String)] = Seq(
    ("ai", 5, "artificial intelligence"),
    ("ai", 5, "machine learning"),
    ("ai", 4, "deep learning"),
    ("tech", 3, "cloud computing"),
    ("tech", 2, "api"),
    ("business", 4, "merger"),
    ("business", 4, "funding round"),
    ("business", 3, "ipo"),
    ("politics", 3, "election"),
    ("politics", 3, "parliament"),
    ("sports", 3, "tournament"),
    ("sports", 3, "championship"))

  /** The LeftmostLongest alternation: phrases length-desc, then
    * lexicographic.
    */
  val alternation: String = dictionary.map(_._3)
    .sortBy(p => (-p.length, p)).mkString("|")

  /** Planted text per document — the corpus text plus residue-keyed
    * dictionary phrases (mixed case, double occurrences, the
    * api-inside-rapid substring).
    */
  def composeKwText(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" Artificial Intelligence drives Machine Learning at rapid pace")).otherwise(""),
      when(col("doc_id") % 5 === 0,
        lit(" deep learning on cloud computing stacks")).otherwise(""),
      when(col("doc_id") % 7 === 0,
        lit(" merger talks then a funding round before the IPO")).otherwise(""),
      when(col("doc_id") % 11 === 0,
        lit(" election night in parliament")).otherwise(""),
      when(col("doc_id") % 2 === 0,
        lit(" tournament opener, championship final, tournament recap")).otherwise(""))
      .as("kw_text"))

  /** The matcher over any (doc_id, kw_text) frame. */
  def keywordScoresOn(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val dict = dictionary.toDF("genre", "weight", "phrase")
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("kw_text")), lit(alternation), lit(0)))
          .as("phrase"))
      .join(broadcast(dict), "phrase")
      .groupBy("doc_id", "genre")
      .agg(sum("weight").as("kw_score"), count(lit(1)).as("n_matches"))
  }

  def kw01(s: SparkSession, dir: String): DataFrame =
    keywordScoresOn(composeKwText(s, dir))
}
