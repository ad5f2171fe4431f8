package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRound

/** Genre-classification threshold tuning — the per-genre
  * precision/recall/F1 grid search of
  * recap-subworker/scripts/tune_thresholds.py
  * (`compute_metrics_at_threshold` :52, `find_optimal_threshold` :70,
  * `analyze_thresholds` :123):
  *
  *  - the golden frame flattens to (genre, score, label) pairs —
  *    every `scores` entry of every labelled item contributes one
  *    pair, label = (entry genre == item's true genre); items with no
  *    true genre or no scores are skipped (:143-153);
  *  - the 98-point threshold lattice `np.arange(0.01, 0.99, 0.01)`
  *    evaluates tp/fp/fn per (genre, threshold) with pred = score ≥ t
  *    (:58-62), precision/recall/F1 with the 0.0 guards (:64-66);
  *  - the F1-optimal threshold per genre under the min-recall ≥ 0.3
  *    constraint (:103 — thresholds whose recall falls below the
  *    floor are skipped outright), strict `>` over ascending t so the
  *    LOWEST threshold wins F1 ties (:113);
  *  - genres where NO threshold clears the recall floor keep the
  *    (0.5, 0, 0, 0) fallback — precision/recall/F1 report as 0 even
  *    though metrics AT 0.5 may be nonzero (:93-97, the loop's best-*
  *    seeds are never overwritten);
  *  - each genre also reports metrics at its CURRENT threshold
  *    (`current_thresholds.get(genre, 0.5)` :166), and rows order by
  *    F1 improvement descending (:186).
  *
  * Scale: pairs × the broadcast 98-row lattice is a map-side row
  * multiplication feeding a partial agg on |genres|·98 bounded keys —
  * ONE small shuffle regardless of corpus size (gb02's exact grid
  * template). The current-threshold pass is a second bounded agg over
  * the same scan with the threshold map broadcast. No windows over
  * unbounded frames — the argmax window runs on the |genres|·98
  * metrics frame.
  *
  * Cross-engine determinism: thresholds are i/100 doubles computed by
  * the same IEEE division in both engines; P/R/F1 use the exact
  * Python op sequence (tp/(tp+fp), tp/(tp+fn), 2·p·r/(p+r)) so the
  * argmax ordering is bit-identical; outputs round to 6 dp via the
  * scale-0 discipline (see functions.Numeric).
  */
object ThresholdTune {

  /** np.arange(0.01, 0.99, 0.01) — 98 points, re-derived as exact
    * i/100 divisions (the arange accumulation error is an artifact of
    * numpy's implementation, not the tuner's semantics).
    */
  val GridSteps: Seq[Int] = 1 to 98

  /** Pinned to find_optimal_threshold's FUNCTION default
    * (tune_thresholds.py:70 `min_recall=0.3`). Documented decision:
    * the script's CLI entry ships a more conservative `--min-recall`
    * default of 0.4, so the tuner-as-invoked-from-the-shell differs
    * from the function contract; this operator pins the function
    * semantics, and a caller reproducing the CLI run passes 0.4
    * through `tuneOn`'s minRecall parameter.
    */
  val MinRecall = 0.3
  val DefaultThreshold = 0.5

  /** The deterministic stand-in for genre_thresholds_ja.json: four of
    * the six composed genres carry a current threshold; g4/g5 exercise
    * the .get(genre, 0.5) default path.
    */
  val CurrentThresholds: Seq[(String, Double)] =
    Seq("g0" -> 0.35, "g1" -> 0.45, "g2" -> 0.55, "g3" -> 0.65)

  /** Composed golden pairs: (genre, score, label) from the documents
    * table. True genre cycles g0..g5; every 17th item carries no
    * label (the :147 skip); each genre's score entry is absent on a
    * %4 residue (sparse scores maps); true-genre scores sit in
    * [0.4, 0.999], off-genre in [0, 0.699] so the optimum is neither
    * degenerate nor separable.
    */
  def composePairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"))
      .filter(col("doc_id") % 17 =!= 0)
      .withColumn("true_genre", concat(lit("g"), pmod(col("doc_id"), lit(6))))
    val entries = (0 until 6).map { i =>
      val present = pmod(col("doc_id") + i, lit(4)) =!= 0
      val isTrue = pmod(col("doc_id"), lit(6)) === i
      val sc = when(isTrue,
          (pmod(col("doc_id") * 13, lit(600)) + 400).cast("double") / 1000)
        .otherwise(pmod(col("doc_id") * (i + 7), lit(700)).cast("double") / 1000)
      when(present, struct(lit(s"g$i").as("genre"), sc.as("score")))
    }
    d.select(col("true_genre"),
        explode(filter(array(entries: _*), _.isNotNull)).as("e"))
      .select(col("e.genre").as("genre"), col("e.score").as("score"),
        (col("e.genre") === col("true_genre")).as("label"))
  }

  private def prf(tp: Column, fp: Column, fn: Column): (Column, Column, Column) = {
    val p = when(tp + fp > 0, tp.cast("double") / (tp + fp)).otherwise(0.0)
    val r = when(tp + fn > 0, tp.cast("double") / (tp + fn)).otherwise(0.0)
    val f1 = when(p + r > 0, lit(2) * p * r / (p + r)).otherwise(0.0)
    (p, r, f1)
  }

  /** The tuner over any (genre, score, label) frame. `minRecall`
    * defaults to the function-contract pin (0.3); pass 0.4 to
    * reproduce the CLI-as-shipped run.
    */
  def tuneOn(pairs: DataFrame, minRecall: Double = MinRecall): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val grid = GridSteps.map(i => i / 100.0).toDF("threshold")
    val cur = CurrentThresholds.toDF("genre", "cur_t")

    def counts(pred: Column) = Seq(
      sum(when(pred && col("label"), 1L).otherwise(0L)).as("tp"),
      sum(when(pred && !col("label"), 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && col("label"), 1L).otherwise(0L)).as("fn"))

    // (genre, threshold) lattice metrics: map-side multiply + partial
    // agg on |genres|*98 keys
    val atT = pairs.crossJoin(broadcast(grid))
      .groupBy("genre", "threshold")
      .agg(counts(col("score") >= col("threshold")).head,
        counts(col("score") >= col("threshold")).tail: _*)
    val (p, r, f1) = prf(col("tp"), col("fp"), col("fn"))
    val scored = atT.select(col("genre"), col("threshold"),
      p.as("p"), r.as("r"), f1.as("f1"))

    // F1-argmax under the recall floor; strict > over ascending t
    // == lowest threshold among F1 ties
    val w = Window.partitionBy("genre")
      .orderBy(col("f1").desc, col("threshold").asc)
    val best = scored.filter(col("r") >= minRecall)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("genre"), col("threshold").as("optimal_threshold"),
        col("p").as("opt_p"), col("r").as("opt_r"), col("f1").as("opt_f1"))

    // metrics at the genre's current threshold (default 0.5)
    val atCur = pairs.join(broadcast(cur), Seq("genre"), "left")
      .withColumn("ct", coalesce(col("cur_t"), lit(DefaultThreshold)))
      .groupBy("genre", "ct")
      .agg(counts(col("score") >= col("ct")).head,
        counts(col("score") >= col("ct")).tail: _*)
    val (cp, cr, cf1) = prf(col("tp"), col("fp"), col("fn"))
    val curScored = atCur.select(col("genre"),
      col("ct").as("current_threshold"),
      cp.as("cur_p"), cr.as("cur_r"), cf1.as("cur_f1"))

    // all-below-recall genres fall back to (0.5, 0, 0, 0); both sides
    // are |genres|-row frames — broadcast the winners
    curScored.join(broadcast(best), Seq("genre"), "left")
      .select(col("genre"),
        coalesce(col("optimal_threshold"), lit(DefaultThreshold))
          .as("optimal_threshold"),
        microRound(coalesce(col("opt_p"), lit(0.0)), 6).as("precision_at_optimal"),
        microRound(coalesce(col("opt_r"), lit(0.0)), 6).as("recall_at_optimal"),
        microRound(coalesce(col("opt_f1"), lit(0.0)), 6).as("f1_at_optimal"),
        col("current_threshold"),
        microRound(col("cur_p"), 6).as("precision_at_current"),
        microRound(col("cur_r"), 6).as("recall_at_current"),
        microRound(col("cur_f1"), 6).as("f1_at_current"),
        microRound(coalesce(col("opt_f1"), lit(0.0)) - col("cur_f1"), 6)
          .as("delta_f1"))
      .orderBy(col("delta_f1").desc, col("genre"))
  }

  def tt02(s: SparkSession, dir: String): DataFrame =
    tuneOn(composePairs(s, dir))
}
