package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}
import graft.functions.TextFunctions.tokens

/** Multi-LABEL classification evaluation — the recap-subworker's
  * genre-classifier gate (recap-subworker/recap_subworker/services/
  * evaluation.py:451 evaluate_classification): y_true/y_pred are
  * per-document label SETS, not single labels, so the battery differs
  * from tx20/tx22's single-label form in exactly the ways sklearn's
  * multi-label metrics do:
  *
  *  - subset accuracy (`accuracy_score` on binary indicator rows): a
  *    sample counts only when EVERY label agrees;
  *  - Hamming loss (:463): mean share of disagreeing label slots;
  *  - macro P/R/F1 (:471): unweighted mean of per-label binary
  *    metrics, `zero_division=0`;
  *  - micro P/R/F1 (:474): pooled tp/fp/fn across labels;
  *  - the per-genre report (:480 — classification_report minus the
  *    avg rows): per label precision/recall/F1/support, the frame the
  *    dashboard's per-genre table renders
  *    (dashboard/tabs/classification.py:37).
  *
  * Composition (the tx05/tx20 precedent — the driver tables carry no
  * golden label sets): genres are four corpus terms; y_true[g] ⇔ the
  * document uses g at least twice; y_pred[g] ⇔ a TRUNCATED reader
  * (first half of the tokens) sees g at least once. The predictor
  * errs in both directions — false positives (a single early
  * occurrence of a twice-threshold term) and false negatives (both
  * occurrences late) — so every confusion cell is populated.
  *
  * Scale: label extraction is a stateless HOF projection fused into
  * the scan; the binary indicator long-form is a bounded ×|genres|
  * fan-out; every metric is one map-side-combined shuffle over it
  * (the summary re-aggregates the ≤|genres| per-label frame and the
  * per-doc agreement counts — no second corpus scan). Ratios follow
  * the exact micro-unit discipline; macro means re-aggregate the
  * per-label 1e-4-unit longs exactly as tx22 does.
  */
object MultiLabel {

  val Genres: Seq[String] = Seq("join", "stream", "sort", "filter")

  /** The (doc_id, genre, y_true, y_pred) binary indicator frame. */
  def indicatorFrame(s: SparkSession, dir: String): DataFrame =
    indicatorFrameOn(Tables.documents(s, dir))

  def indicatorFrameOn(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("half", expr("slice(toks, 1, CAST(floor(size(toks) / 2) AS INT))"))
    val cols = Genres.flatMap { g =>
      Seq((size(filter(col("toks"), t => t === lit(g))) >= 2).as(s"t_$g"),
          (size(filter(col("half"), t => t === lit(g))) >= 1).as(s"p_$g"))
    }
    val wide = d.select(col("doc_id") +: cols: _*)
    val stackArgs = Genres.map(g => s"'$g', t_$g, p_$g").mkString(", ")
    wide.select(col("doc_id"),
      expr(s"stack(${Genres.size}, $stackArgs) AS (genre, y_true, y_pred)"))
  }

  /** ml05: the per-genre classification report (precision/recall/F1/
    * support per label, zero_division=0, F1 from the rounded
    * micro-unit P/R — the tx20 convention).
    */
  def genreReportOn(pairs: DataFrame): DataFrame =
    pairs.groupBy("genre").agg(
      count(when(col("y_true") && col("y_pred"), 1)).as("tp"),
      count(when(!col("y_true") && col("y_pred"), 1)).as("fp"),
      count(when(col("y_true") && !col("y_pred"), 1)).as("fn"),
      count(when(col("y_true"), 1)).as("support"))
    .select(
      col("genre"), col("support"), col("tp"), col("fp"), col("fn"),
      when(col("tp") + col("fp") > 0, microRatio(col("tp"), col("tp") + col("fp"), 4))
        .otherwise(0.0).as("precision"),
      when(col("tp") + col("fn") > 0, microRatio(col("tp"), col("tp") + col("fn"), 4))
        .otherwise(0.0).as("recall"))
    .withColumn("f1",
      when(col("precision") + col("recall") > 0,
        microRatio(lit(2) * col("precision") * col("recall"),
          col("precision") + col("recall"), 4))
        .otherwise(0.0))

  def ml05(s: SparkSession, dir: String): DataFrame =
    genreReportOn(indicatorFrame(s, dir))

  /** ml04: the ClassificationMetrics summary row — subset accuracy,
    * Hamming loss, macro and micro P/R/F1.
    */
  def summaryOn(pairs: DataFrame): DataFrame = {
    val perDoc = pairs.groupBy("doc_id")
      .agg(count(when(col("y_true") === col("y_pred"), 1)).as("agree"))
    val nLabels = Genres.size
    val sampleStats = perDoc.agg(
      count(lit(1)).as("n_samples"),
      count(when(col("agree") === nLabels, 1)).as("n_exact"),
      sum(lit(nLabels) - col("agree")).as("n_disagree"))
    val perLabel = genreReportOn(pairs)
      // recover each rounded metric's exact 1e-4-unit long (tx22)
      .select(col("tp"), col("fp"), col("fn"),
        round(col("precision") * 1e4, 0).cast("long").as("p_u"),
        round(col("recall") * 1e4, 0).cast("long").as("r_u"),
        round(col("f1") * 1e4, 0).cast("long").as("f_u"))
    val micro = perLabel.agg(
      sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"),
      microRatio(sum("p_u"), count(lit(1)), 0).as("macro_p_u"),
      microRatio(sum("r_u"), count(lit(1)), 0).as("macro_r_u"),
      microRatio(sum("f_u"), count(lit(1)), 0).as("macro_f_u"))
    .select(
      (col("macro_p_u") / 1e4).as("macro_precision"),
      (col("macro_r_u") / 1e4).as("macro_recall"),
      (col("macro_f_u") / 1e4).as("macro_f1"),
      when(col("tp") + col("fp") > 0, microRatio(col("tp"), col("tp") + col("fp"), 4))
        .otherwise(0.0).as("micro_precision"),
      when(col("tp") + col("fn") > 0, microRatio(col("tp"), col("tp") + col("fn"), 4))
        .otherwise(0.0).as("micro_recall"))
    .withColumn("micro_f1",
      when(col("micro_precision") + col("micro_recall") > 0,
        microRatio(lit(2) * col("micro_precision") * col("micro_recall"),
          col("micro_precision") + col("micro_recall"), 4))
        .otherwise(0.0))
    sampleStats.crossJoin(broadcast(micro))
      .select(
        col("n_samples"), lit(nLabels).as("n_labels"),
        microRatio(col("n_exact"), col("n_samples"), 4).as("accuracy"),
        microRatio(col("n_disagree"), col("n_samples") * nLabels, 4).as("hamming_loss"),
        col("macro_precision"), col("macro_recall"), col("macro_f1"),
        col("micro_precision"), col("micro_recall"), col("micro_f1"))
  }

  def ml04(s: SparkSession, dir: String): DataFrame =
    summaryOn(indicatorFrame(s, dir))

  /** ml06: the per-language evaluation split (evaluation.py:429
    * evaluate_by_language — the reference runs the whole battery
    * separately for each language because a ja/en-pooled number hides
    * per-language regressions). One summary row per language, the
    * ml04 battery re-keyed — the indicator frame joins its document's
    * language and every aggregate gains the language key; same
    * single-scan shape, |languages|× rows out.
    */
  /** ml07: the evaluation-dataset quality report (recap-worker
    * api/evaluation.rs:53 analyze_golden_dataset — "is this golden set
    * statistically usable" BEFORE trusting any score from it): per-
    * genre sample counts from the expected label sets, min/max/avg
    * samples per genre, the genres under the 5-sample stability
    * threshold (sorted — the reference's HashMap order determinized),
    * and the three warning rules (:81 — unstable genres present,
    * empty genre set, fewer than 30 total samples) as flags.
    */
  def ml07(s: SparkSession, dir: String): DataFrame = {
    val threshold = 5
    val truth = indicatorFrame(s, dir).filter(col("y_true"))
    val genreCounts = truth.groupBy("genre").agg(count(lit(1)).as("n"))
    val total = indicatorFrame(s, dir).select("doc_id").distinct().count()
    genreCounts.agg(
      count(lit(1)).as("genre_count"),
      coalesce(min("n"), lit(0L)).as("min_samples_per_genre"),
      coalesce(max("n"), lit(0L)).as("max_samples_per_genre"),
      when(count(lit(1)) > 0, microRatio(sum("n"), count(lit(1)), 4))
        .otherwise(0.0).as("avg_samples_per_genre"),
      count(when(col("n") < threshold, 1)).as("n_below_threshold"),
      coalesce(array_join(array_sort(
        collect_list(when(col("n") < threshold, col("genre")))), ","), lit(""))
        .as("genres_below_threshold"))
    .select(lit(total).as("total_samples"), col("genre_count"),
      col("min_samples_per_genre"), col("max_samples_per_genre"),
      col("avg_samples_per_genre"), col("n_below_threshold"),
      col("genres_below_threshold"),
      (col("min_samples_per_genre") < threshold).as("warn_unstable"),
      (col("genre_count") === 0).as("warn_no_genres"),
      (lit(total) < 30).as("warn_small_dataset"))
  }

  /** Φ⁻¹(0.975) to double precision — the z both engines share. The
    * reference takes it from scipy (`stats.norm.ppf((1+0.95)/2)`
    * inside statsmodels' proportion_confint); a ±1-ulp difference in
    * that library constant is invisible under the 1e-6 output
    * rounding, and cross-engine parity here only needs Spark and the
    * oracle to use the SAME literal.
    */
  val WilsonZ = 1.959963984540054

  /** ml08: the Wilson score interval on subset accuracy —
    * evaluation.py:360-372, the deterministic residue of the
    * golden-run evaluator's `use_bootstrap` branch (evaluate_genres.py
    * defaults `--bootstrap` ON, so a real evaluation run always
    * computes this on top of the ml04 metrics).
    *
    * Two pinned quirks:
    *   - `count_correct = int(metrics.accuracy * len(X))` (:362) —
    *     the float round-trip TRUNCATES, so count_correct can be one
    *     BELOW the true exact-match count (e.g. 15 exact of 22 →
    *     int(0.6818…·22) = 14). Both engines floor the same double
    *     product, so the quirk reproduces bit-exactly.
    *   - the interval runs on count_correct/n (statsmodels' q_), while
    *     the reported point stays metrics.accuracy (:367-368) — the
    *     two can straddle the truncation.
    *
    * Wilson algebra in statsmodels' exact op order
    * (proportion_confint, method="wilson"): denom = 1 + z²/n,
    * center = (q + z²/(2n))/denom, dist = z·√(q(1−q)/n + z²/(4n²))
    * / denom; no clamping (Wilson bounds are inherently in [0,1]).
    * Every op is the same IEEE double chain in both engines; outputs
    * round to 1e-6 via the scale-0 discipline.
    *
    * Scale: rides ml04's per-doc agreement aggregate (one map-side
    * combined shuffle over the indicator frame, then one global
    * two-counter agg); the Wilson columns are a stateless projection
    * over the single summary row.
    */
  def wilsonOn(pairs: DataFrame): DataFrame = {
    val nLabels = Genres.size
    val perDoc = pairs.groupBy("doc_id")
      .agg(count(when(col("y_true") === col("y_pred"), 1)).as("agree"))
    val stats = perDoc.agg(
      count(lit(1)).as("n_samples"),
      count(when(col("agree") === nLabels, 1)).as("n_exact"))
    val nD = col("n_samples").cast("double")
    val acc = col("n_exact").cast("double") / nD
    val cc = floor(acc * nD).cast("long")
    val qv = cc.cast("double") / nD
    val z = lit(WilsonZ)
    val crit2 = z * z
    val denom = lit(1.0) + crit2 / nD
    val center = (qv + crit2 / (lit(2.0) * nD)) / denom
    val dist = z * sqrt(qv * (lit(1.0) - qv) / nD + crit2 / (lit(4.0) * nD * nD)) / denom
    stats.select(
      col("n_samples"), col("n_exact"),
      cc.as("count_correct"),
      microRound(acc, 6).as("accuracy"),
      microRound(center - dist, 6).as("ci_lower"),
      microRound(center + dist, 6).as("ci_upper"),
      microRound((center + dist) - (center - dist), 6).as("ci_width"))
  }

  def ml08(s: SparkSession, dir: String): DataFrame =
    wilsonOn(indicatorFrame(s, dir))

  def ml06(s: SparkSession, dir: String): DataFrame = {
    val langs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    val pairs = indicatorFrame(s, dir).join(langs, "doc_id")
    val perDoc = pairs.groupBy("lang", "doc_id")
      .agg(count(when(col("y_true") === col("y_pred"), 1)).as("agree"))
    val nLabels = Genres.size
    val sampleStats = perDoc.groupBy("lang").agg(
      count(lit(1)).as("n_samples"),
      count(when(col("agree") === nLabels, 1)).as("n_exact"),
      sum(lit(nLabels) - col("agree")).as("n_disagree"))
    val perLabel = pairs.groupBy("lang", "genre").agg(
        count(when(col("y_true") && col("y_pred"), 1)).as("tp"),
        count(when(!col("y_true") && col("y_pred"), 1)).as("fp"),
        count(when(col("y_true") && !col("y_pred"), 1)).as("fn"))
      .select(col("lang"), col("tp"), col("fp"), col("fn"),
        round(when(col("tp") + col("fp") > 0,
            microRatio(col("tp"), col("tp") + col("fp"), 4)).otherwise(0.0) * 1e4, 0)
          .cast("long").as("p_u"),
        round(when(col("tp") + col("fn") > 0,
            microRatio(col("tp"), col("tp") + col("fn"), 4)).otherwise(0.0) * 1e4, 0)
          .cast("long").as("r_u"))
    val micro = perLabel.groupBy("lang").agg(
        sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"),
        microRatio(sum("p_u"), count(lit(1)), 0).as("macro_p_u"),
        microRatio(sum("r_u"), count(lit(1)), 0).as("macro_r_u"))
      .select(col("lang"),
        (col("macro_p_u") / 1e4).as("macro_precision"),
        (col("macro_r_u") / 1e4).as("macro_recall"),
        when(col("tp") + col("fp") > 0, microRatio(col("tp"), col("tp") + col("fp"), 4))
          .otherwise(0.0).as("micro_precision"),
        when(col("tp") + col("fn") > 0, microRatio(col("tp"), col("tp") + col("fn"), 4))
          .otherwise(0.0).as("micro_recall"))
    sampleStats.join(micro, "lang")
      .select(col("lang"), col("n_samples"),
        microRatio(col("n_exact"), col("n_samples"), 4).as("accuracy"),
        microRatio(col("n_disagree"), col("n_samples") * nLabels, 4).as("hamming_loss"),
        col("macro_precision"), col("macro_recall"),
        col("micro_precision"), col("micro_recall"))
  }
}
