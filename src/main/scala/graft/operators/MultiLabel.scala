package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound, units}
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

  /** ml09: the top-1 confusion matrix + Cramér's V effect size.
    *
    * The confusion matrix is a PRODUCTION compute
    * (services/evaluation.py:397-409 — "Top-1 approximation"):
    * y_true_single = labels[0] or "other" when the label set is empty;
    * y_pred_single = the prediction's top_genre. Cramér's V
    * (domain/analysis/stats.py:338-384, the exported effect-size
    * member whose value the evaluate_genres report prints at :78) runs
    * over exactly such a matrix:
    *   - n = the UNFILTERED matrix total (:349 — summed before any
    *     row/col dropping);
    *   - zero rows/columns are dropped (:354-366) — with cells built
    *     from observed pairs only, the surviving axes are precisely
    *     the distinct observed true / pred values;
    *   - min_dim = min(filtered shape) − 1; ≤ 0 → 0.0 early-out
    *     (chi² never computed — we still emit it; with one row or one
    *     column every o equals its e, so it is identically 0);
    *   - Pearson χ² with Yates continuity ONLY when the filtered
    *     matrix is 2×2 (scipy chi2_contingency's correction=True
    *     applies iff dof == 1): each |o−e| shrinks toward 0 by
    *     min(0.5, |o−e|);
    *   - v = min(√(χ²/(n·min_dim)), 1.0).
    *
    * Composition (the ml04 corpus, single-label form): y_true = the
    * FIRST genre in Genres declaration order used ≥ 2 times (the
    * reference's labels[0] under a list built in genre order), else
    * "other"; y_pred = the argmax half-count genre (the classifier's
    * top_genre stand-in), ties to the earliest genre, all-zero →
    * "other".
    *
    * Determinization: expected values rs·cs/n and each χ² term are the
    * same IEEE double chain in both engines; each term quantizes to
    * 1e-6-unit longs BEFORE the sum (the Numeric.units discipline —
    * a float sum's order-dependence cannot flip the output), so χ²
    * and v are exact cross-engine at every scale.
    *
    * Scale: one corpus scan → stateless top-1 projection → ONE
    * map-side-combined groupBy onto ≤ (|genres|+1)² cells; everything
    * after (marginals, the R×C grid, χ², v) runs on that bounded
    * frame (persisted — four branches read it; driver owns cache
    * lifecycle, see pl01). No corpus window, no corpus join.
    */
  def topOneOn(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("half", expr("slice(toks, 1, CAST(floor(size(toks) / 2) AS INT))"))
    val cnts = Genres.flatMap { g =>
      Seq(size(filter(col("toks"), t => t === lit(g))).as(s"tc_$g"),
          size(filter(col("half"), t => t === lit(g))).as(s"pc_$g"))
    }
    val wide = d.select(col("doc_id") +: cnts: _*)
    val trueSingle = Genres.foldRight(lit("other"): Column)((g, acc) =>
      when(col(s"tc_$g") >= 2, lit(g)).otherwise(acc))
    val maxPc = greatest(Genres.map(g => col(s"pc_$g")): _*)
    val predSingle = when(maxPc === 0, lit("other")).otherwise(
      Genres.foldRight(lit("other"): Column)((g, acc) =>
        when(col(s"pc_$g") === maxPc, lit(g)).otherwise(acc)))
    wide.select(col("doc_id"),
      trueSingle.as("y_true"), predSingle.as("y_pred"))
  }

  def cramersOn(single: DataFrame): DataFrame = {
    val cells = single.groupBy("y_true", "y_pred")
      .agg(count(lit(1)).as("o")).persist()
    val rs = cells.groupBy("y_true").agg(sum("o").as("rsum"))
    val cs = cells.groupBy("y_pred").agg(sum("o").as("csum"))
    val tot = cells.agg(sum("o").as("n"))
    val dims = rs.agg(count(lit(1)).as("nr"))
      .crossJoin(broadcast(cs.agg(count(lit(1)).as("nc"))))
    val grid = rs.crossJoin(broadcast(cs))
      .join(cells, Seq("y_true", "y_pred"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(dims))
      .withColumn("o0", coalesce(col("o"), lit(0L)))
      .withColumn("e",
        col("rsum").cast("double") * col("csum").cast("double")
          / col("n").cast("double"))
    val diff = abs(col("o0").cast("double") - col("e"))
    val adj = when(col("nr") === 2 && col("nc") === 2,
      greatest(diff - lit(0.5), lit(0.0))).otherwise(diff)
    val terms = grid.withColumn("term_u", units(adj * adj / col("e"), 6))
    val sm = terms.agg(
      sum("term_u").as("chi2_u"), max("n").as("n"),
      max("nr").as("nr"), max("nc").as("nc"))
    val minDim = least(col("nr"), col("nc")) - 1
    terms.select(col("y_true"), col("y_pred"), col("o0"), col("e"))
      .crossJoin(broadcast(sm))
      .select(
        col("y_true").as("true_genre"), col("y_pred").as("pred_genre"),
        col("o0").as("n_obs"),
        microRound(col("e"), 6).as("expected"),
        col("n").as("n_samples"),
        minDim.as("min_dim"),
        (col("nr") === 2 && col("nc") === 2).as("yates_applied"),
        (col("chi2_u") / 1e6).as("chi2"),
        when(minDim <= 0, lit(0.0)).otherwise(
          microRound(least(
            sqrt((col("chi2_u") / 1e6)
              / (col("n").cast("double") * minDim.cast("double"))),
            lit(1.0)), 6)).as("cramers_v"))
  }

  def ml09(s: SparkSession, dir: String): DataFrame =
    cramersOn(topOneOn(Tables.documents(s, dir)))

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
