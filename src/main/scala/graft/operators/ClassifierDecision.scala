package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions.tokens

/** gc01: the genre classifier's DECISION stage — the deterministic
  * post-softmax residue of recap-subworker services/classifier.py
  * predict_batch (:484-567; the predict_proba model call is the
  * env-blocked runtime, exactly the pl01/ke01/fo01 precedent — its
  * probability table is the composed INPUT, everything after is pure
  * selection):
  *
  *  - per class, threshold = current_thresholds.get(cls, 0.5) (:493 —
  *    the consumer of tt02's tuned table; 0.5 is the hard default);
  *  - candidates = classes with score ≥ threshold, sorted score DESC
  *    (:497); Python's sort is STABLE over the dict's insertion order
  *    = zip(classes_, probs) = sklearn's alphabetically-sorted
  *    classes_, so score ties keep ALPHABETICAL order — the total
  *    order is exactly (score desc, genre asc);
  *  - multi-label mode (:498): top = candidates[0], final =
  *    candidates[:top_k], below_threshold = false; when NOTHING
  *    passes, the fallback takes np.argmax over ALL probabilities
  *    (:509 — np.argmax returns the FIRST index among exact ties =
  *    the alphabetically-first class) and INJECTS that single
  *    candidate with its threshold, below_threshold = true;
  *  - single-label mode (:537): the same top/fallback rule but the
  *    fallback injects NO candidate row — candidates[:top_k] of the
  *    empty list stays empty (:565); top_k defaults to 5 (:378).
  *
  * The global argmax and the top candidate genuinely differ when the
  * best-scored class sits under its (higher) threshold while a
  * lower-scored class clears its own — the spec plants exactly that
  * case.
  *
  * Decision-as-ranking: under the single ordering
  * (pass desc, score desc, genre asc) the rank-1 row per document IS
  * the reference's decision in BOTH regimes — when anything passes it
  * is candidates[0], and when nothing passes every `pass` is false
  * and the ordering degenerates to the argmax order. One window
  * ordering carries the whole function.
  *
  * Composition (the ml04 corpus): score(genre) = occurrences / token
  * count in exact 1e-6 units (the microUnits discipline — threshold
  * gates compare integers, never re-divided doubles); "sort" has no
  * tuned threshold → the 0.5 default (unreachable for token-share
  * scores), so sort-dominant documents exercise the fallback under
  * the oracle.
  *
  * Scale: ONE stateless scan projects the per-doc score vector into a
  * bounded ×|genres| fan-out; the decision is one doc_id-partitioned
  * window pass (rank + the two first() reads share the one
  * ordering) — a single shuffle, no joins, no corpus sort beyond the
  * in-partition window sort.
  */
object ClassifierDecision {

  /** Tuned per-genre thresholds in exact 1e-6 units; "sort" is absent
    * → the :493 default 0.5.
    */
  val thresholds: Map[String, Long] =
    Map("join" -> 20000L, "stream" -> 30000L, "filter" -> 10000L)

  val DefaultThresholdU = 500000L
  val TopK = 5

  /** (doc_id, genre, score_u, thr_u) — the composed probability table
    * in exact micro-units.
    */
  def scoreFrame(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val cols = MultiLabel.Genres.map { g =>
      round(size(filter(col("toks"), t => t === lit(g))).cast("double") * 1e6
        / size(col("toks")), 0).cast("long").as(s"s_$g")
    }
    val wide = d.select(col("doc_id") +: cols: _*)
    val stackArgs = MultiLabel.Genres
      .map(g => s"'$g', s_$g, ${thresholds.getOrElse(g, DefaultThresholdU)}L")
      .mkString(", ")
    wide.select(col("doc_id"),
      expr(s"stack(${MultiLabel.Genres.size}, $stackArgs) AS (genre, score_u, thr_u)"))
  }

  /** The decision over any (doc_id, genre, score_u, thr_u) frame →
    * one row per kept candidate (rank, score, threshold), each
    * carrying the doc-level decision (top_genre, confidence,
    * below_threshold); single-label fallback docs emit one
    * candidate-less row (null rank/candidate columns).
    */
  def decideOn(scores: DataFrame, topK: Int = TopK,
               multiLabel: Boolean = true): DataFrame = {
    val wOrd = Window.partitionBy("doc_id")
      .orderBy(col("pass").desc, col("score_u").desc, col("genre").asc)
    val wDoc = Window.partitionBy("doc_id")
    val base = scores
      .withColumn("pass", col("score_u") >= col("thr_u"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_pass", sum(when(col("pass"), 1L).otherwise(0L)).over(wDoc))
      .withColumn("top_genre", first(col("genre")).over(wOrd))
      .withColumn("confidence", first(col("score_u")).over(wOrd) / 1e6)
      .withColumn("below_threshold", col("n_pass") === 0)
    val candRows = base
      .filter((col("pass") && col("rn") <= topK) ||
        (lit(multiLabel) && col("below_threshold") && col("rn") === 1))
      .select(col("doc_id"), col("top_genre"), col("confidence"),
        col("below_threshold"),
        col("rn").cast("int").as("rank"),
        col("genre").as("cand_genre"),
        (col("score_u") / 1e6).as("cand_score"),
        (col("thr_u") / 1e6).as("cand_threshold"))
    if (multiLabel) candRows
    else candRows.unionByName(
      base.filter(col("below_threshold") && col("rn") === 1)
        .select(col("doc_id"), col("top_genre"), col("confidence"),
          col("below_threshold"),
          lit(null).cast("int").as("rank"),
          lit(null).cast("string").as("cand_genre"),
          lit(null).cast("double").as("cand_score"),
          lit(null).cast("double").as("cand_threshold")))
  }

  def gc01(s: SparkSession, dir: String): DataFrame =
    decideOn(scoreFrame(s, dir))
}
