package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}

/** Pseudo-label selection + confidence report — the deterministic
  * post-inference half of
  * recap-subworker/recap_subworker/learning_machine/scripts/pseudo_label.py
  * (the teacher forward pass itself is an env-blocked torch runtime;
  * everything AFTER the softmax is pure compute over
  * (item, max_prob, margin, pred_label) and is mapped here):
  *
  *  - language routing (:190 detect_language_simple + :225 filter):
  *    items missing a `lang` field are detected from content by the
  *    char-class ratio ladder (len < min_chars 50 → unknown; ja when
  *    Japanese chars present and jp_ratio > 0.1; en when ASCII alpha
  *    present and en_ratio > 0.3; then the bare has_japanese /
  *    has_english fallbacks; else unknown), labeled items keep their
  *    label; only the target language proceeds;
  *  - selection (:316-340): `--accept_top_percent P` takes the global
  *    top ⌊N·P/100⌋ by confidence (:320 int(len*P/100) TRUNCATES — no
  *    max(1,…) on the explicit path), `--min_margin m` keeps
  *    margin ≥ m, `--threshold t` keeps confidence ≥ t, and the
  *    no-flag DEFAULT takes the top max(1, ⌊N·5/100⌋) (:337 — the
  *    max(1,…) guard exists ONLY on the default branch);
  *  - per-class cap (:343-352): at most `--per_class_cap` items per
  *    predicted class, kept in SELECTION order — confidence-descending
  *    for the top-percent paths (argsort desc) but INDEX order for the
  *    margin/threshold paths (np.where is index-ascending), so the cap
  *    keeps the most-confident per class under top-percent and the
  *    first-seen per class under margin/threshold (quirk pinned);
  *  - the confidence report (:369-417): mean/median/std/min/max and
  *    p50/p75/p90/p95/p99 of confidence, margin mean/median/max/min,
  *    estimated counts at the fixed threshold lattice
  *    [0.3, 0.5, 0.7, 0.85, 0.9], the top-percent lattice [1, 5, 10,
  *    20] (n_est = max(1, ⌊N·pct/100⌋), thresh_est =
  *    percentile(conf, 100−pct)), the margin lattice [0.05, 0.1,
  *    0.15, 0.2], and the selected set's class distribution top-10
  *    (:427 — computed over the default top-5% selection here).
  *
  * Re-expressions (documented, semantics-preserving): numpy's
  * argsort tie order at equal confidence is implementation noise, not
  * semantics — ties resolve by ascending item id; the class-dist
  * top-10's dict-insertion tie order likewise resolves by ascending
  * label. Ratio gates compare exact integers (10·jp > total instead
  * of jp/total > 0.1). Python's isalnum total-char count maps to the
  * \p{L}\p{N} char classes both engines share.
  *
  * Scale: selection is the part that has to survive 100 TB. The
  * top-P% path NEVER ranks the corpus globally — it aggregates a
  * confidence HISTOGRAM (≤ 10^6 micro-unit keys, bounded regardless
  * of corpus size), finds the boundary value + tie quota with one
  * cumulative window over that bounded frame, then selects by
  * stateless comparison against the broadcast one-row boundary; only
  * boundary-TIED rows rank (partitioned by the single boundary
  * value). Threshold/margin methods are stateless filters. The
  * per-class cap is a per-class rank window — |classes| bounded
  * partitions. The report is one map-side-combined agg over exact
  * micro-unit integer moments (the fz01 discipline) plus exact
  * percentiles (swap to percentile_approx at 100 TB, ev03's note).
  */
object PseudoLabel {

  val TargetLang = "en"
  val MinChars = 50
  /** --threshold 0.7, in exact 1e-6 units. */
  val ThresholdM = 700000L
  /** --min_margin 0.1, in exact 1e-6 units. */
  val MinMarginM = 100000L
  /** --accept_top_percent 10. */
  val TopPercent = 10
  /** The no-flag default: top 5% with the max(1,…) floor (:337). */
  val DefaultPercent = 5
  /** --per_class_cap 8. */
  val PerClassCap = 8

  /** detect_language_simple (:190): char-class ratio ladder. Counts
    * are regex char-class counts; ratio gates are exact integer
    * comparisons (10·jp > total ⇔ jp/total > 0.1).
    */
  def detectLang(text: Column): Column = {
    val jp = length(text) -
      length(regexp_replace(text, "[぀-ゟ゠-ヿ一-龯]", ""))
    val en = length(text) - length(regexp_replace(text, "[A-Za-z]", ""))
    val total = length(text) - length(regexp_replace(text, "[\\p{L}\\p{N}]", ""))
    when(length(text) < MinChars, "unknown")
      .when(total === 0, "unknown")
      .when(jp > 0 && jp * 10 > total, "ja")
      .when(en > 0 && en * 10 > total * 3, "en")
      .when(jp > 0, "ja")
      .when(en > 0, "en")
      .otherwise("unknown")
  }

  /** Composed candidate frame: (doc_id, pred_label, conf_m, margin_m)
    * in exact 1e-6 units — the deterministic stand-in for the
    * teacher's prob distribution. Every doc carries six class scores
    * u_i = (doc_id·(2i+3) mod 997)·1000 + i (distinct within a row by
    * the mod-1000 residue, so argmax is conf_m mod 1000); docs with
    * doc_id % 5 = 0 arrive lang-less and route through detectLang
    * (:219's "lang" not in item), the rest keep their label; only
    * TargetLang rows become candidates (:225).
    */
  def composeCandidates(s: SparkSession, dir: String): DataFrame = {
    val eff = when(pmod(col("doc_id"), lit(5)) === 0, detectLang(col("text")))
      .otherwise(col("lang"))
    val us = (0 until 6).map(i =>
      (pmod(col("doc_id") * (2 * i + 3), lit(997)) * 1000 + i).cast("long"))
    val sorted = sort_array(array(us: _*))
    Tables.documents(s, dir)
      .filter(eff === TargetLang)
      .select(col("doc_id"),
        element_at(sorted, 6).as("conf_m"),
        (element_at(sorted, 6) - element_at(sorted, 5)).as("margin_m"))
      .withColumn("pred_label", concat(lit("g"), pmod(col("conf_m"), lit(1000))))
  }

  /** Exact global top-⌊N·pct/100⌋ by (confidence desc, doc_id asc)
    * WITHOUT a global rank: confidence histogram (≤ 10^6 bounded
    * keys) → cumulative window over the bounded frame → boundary
    * value + tie quota as a broadcast one-row frame → stateless
    * comparison, with only boundary-tied rows ranked. `atLeastOne`
    * maps the default branch's max(1,…) (:337); the explicit
    * top-percent path truncates bare (:320).
    */
  def selectTopPercent(cand: DataFrame, pct: Int, atLeastOne: Boolean): DataFrame = {
    val nAcc0 = floor(count(lit(1)) * pct / 100).cast("long")
    val need = cand.agg(
      (if (atLeastOne) greatest(lit(1L), nAcc0) else nAcc0).as("n_accept"))
    val wc = Window.orderBy(col("conf_m").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = cand.groupBy("conf_m").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wc))
      .crossJoin(broadcast(need))
      .filter(col("cum") - col("c") < col("n_accept") &&
        col("cum") >= col("n_accept"))
      .select(col("conf_m").as("b_v"),
        (col("n_accept") - col("cum") + col("c")).as("b_take"))
    // ONE branch: drop everything below the boundary first (stateless
    // comparison against the broadcast one-row frame), then rank only
    // the ≤ n_accept + ties survivors within their conf value — rows
    // strictly above the boundary pass outright, boundary ties up to
    // the quota by ascending id. A union of above/tied branches would
    // re-reference the boundary and make Catalyst duplicate the
    // histogram agg + cumulative window per branch (caught by the
    // PlanSpec pin).
    val wt = Window.partitionBy("conf_m").orderBy(col("doc_id").asc)
    cand.crossJoin(broadcast(boundary))
      .filter(col("conf_m") >= col("b_v"))
      .withColumn("rk", row_number().over(wt))
      .filter(col("conf_m") > col("b_v") || col("rk") <= col("b_take"))
      .drop("rk", "b_v", "b_take")
  }

  /** The per-class cap in SELECTION order (:343-352): confidence-desc
    * for top-percent paths, id-asc (np.where index order) for
    * margin/threshold paths.
    */
  def capPerClass(df: DataFrame, byConfidence: Boolean, cap: Int = PerClassCap): DataFrame = {
    val ord = if (byConfidence) Seq(col("conf_m").desc, col("doc_id").asc)
              else Seq(col("doc_id").asc)
    val w = Window.partitionBy("pred_label").orderBy(ord: _*)
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap).drop("rk")
  }

  /** pl01 over any (doc_id, pred_label, conf_m, margin_m) frame: the
    * four selection methods, each per-class capped in its own order.
    */
  def pl01On(cand: DataFrame): DataFrame = {
    val frames = Seq(
      ("threshold",
        capPerClass(cand.filter(col("conf_m") >= ThresholdM), byConfidence = false)),
      ("margin",
        capPerClass(cand.filter(col("margin_m") >= MinMarginM), byConfidence = false)),
      ("top_percent",
        capPerClass(selectTopPercent(cand, TopPercent, atLeastOne = false),
          byConfidence = true)),
      ("default",
        capPerClass(selectTopPercent(cand, DefaultPercent, atLeastOne = true),
          byConfidence = true)))
    frames.map { case (m, df) => df.withColumn("method", lit(m)) }
      .reduce(_ unionByName _)
      .select(col("method"), col("doc_id"), col("pred_label"),
        (col("conf_m") / 1e6).as("confidence"),
        (col("margin_m") / 1e6).as("margin"))
  }

  /** Cache lifecycle: the persist below (and pl02's, and fo01's) is
    * intentionally NOT paired with an unpersist inside the operator —
    * the returned DataFrame is lazy and still references the cached
    * frame, so an eager unpersist would defeat the multi-branch reuse
    * that motivates the cache. The DRIVER owns the lifecycle for
    * query entries: Verify and Bench call `spark.catalog.clearCache()`
    * after each query's action. A long-lived session embedding these
    * operators should do the same (or `df.unpersist()` the source
    * frame) once the result is materialized.
    */
  def pl01(s: SparkSession, dir: String): DataFrame =
    pl01On(composeCandidates(s, dir).persist())

  /** The report's fixed estimate lattices (:397 thresholds, :405
    * top-percents, :412 margins), in 1e-6 units where applicable.
    */
  val ThresholdLattice: Seq[Long] = Seq(300000L, 500000L, 700000L, 850000L, 900000L)
  val TopPctLattice: Seq[Int] = Seq(1, 5, 10, 20)
  val MarginLattice: Seq[Long] = Seq(50000L, 100000L, 150000L, 200000L)

  /** pl02 over any candidate frame: the (section, metric, value)
    * report. Confidence/margin moments are exact micro-unit integer
    * sums (σ = √(n·Σu²−(Σu)²)/(n·10^6), the fz01 discipline);
    * percentiles interpolate between exact micro-longs and round at
    * scale 0 (ev03); lattice counts are conditional counts in the
    * SAME single agg. class_dist ranks the default top-5% selection's
    * labels (count desc, label asc), top 10.
    */
  def pl02On(cand: DataFrame): DataFrame = {
    val pc = (p: Double) =>
      (round(expr(s"percentile(conf_m, $p)"), 0).cast("long") / 1e6)
    val pm = (p: Double) =>
      (round(expr(s"percentile(margin_m, $p)"), 0).cast("long") / 1e6)
    val thrCounts = ThresholdLattice.map(t =>
      count(when(col("conf_m") >= t, 1)).as(s"thr_$t"))
    val marCounts = MarginLattice.map(m =>
      count(when(col("margin_m") >= m, 1)).as(s"mar_$m"))
    val topThr = TopPctLattice.map(p => pc((100 - p) / 100.0).as(s"topt_$p"))
    val aggCols: Seq[Column] = Seq(
      count(lit(1)).as("n"),
      sum(col("conf_m")).as("su"),
      sum(col("conf_m").cast("decimal(38,0)") * col("conf_m")).as("su2"),
      (min(col("conf_m")) / 1e6).as("mn"), (max(col("conf_m")) / 1e6).as("mx"),
      pc(0.5).as("p50"), pc(0.75).as("p75"), pc(0.9).as("p90"),
      pc(0.95).as("p95"), pc(0.99).as("p99"),
      sum(col("margin_m")).as("msu"),
      pm(0.5).as("m_med"),
      (min(col("margin_m")) / 1e6).as("m_mn"),
      (max(col("margin_m")) / 1e6).as("m_mx")) ++
      thrCounts ++ marCounts ++ topThr
    val agg = cand.agg(aggCols.head, aggCols.tail: _*)
    val mean = microRatio(col("su"), col("n") * 1e6, 6)
    val mmean = microRatio(col("msu"), col("n") * 1e6, 6)
    val std = microRound(
      sqrt((col("su2") * col("n") - col("su").cast("decimal(38,0)") * col("su"))
        .cast("double")) / (col("n").cast("double") * 1e6), 6)
    val row = (sec: String, met: String, v: Column) =>
      struct(lit(sec).as("section"), lit(met).as("metric"),
        v.cast("double").as("value"))
    val statRows = Seq(
      row("confidence", "mean", mean), row("confidence", "median", col("p50")),
      row("confidence", "std", std),
      row("confidence", "min", col("mn")), row("confidence", "max", col("mx")),
      row("confidence", "p50", col("p50")), row("confidence", "p75", col("p75")),
      row("confidence", "p90", col("p90")), row("confidence", "p95", col("p95")),
      row("confidence", "p99", col("p99")),
      row("margin", "mean", mmean), row("margin", "median", col("m_med")),
      row("margin", "max", col("m_mx")), row("margin", "min", col("m_mn"))) ++
      ThresholdLattice.map(t =>
        row("threshold_est", f"ge_${t / 1e6}%.2f", col(s"thr_$t"))) ++
      TopPctLattice.flatMap(p => Seq(
        row("top_pct_est", s"top${p}_n",
          greatest(lit(1L), floor(col("n") * p / 100).cast("long"))),
        row("top_pct_est", s"top${p}_thresh", col(s"topt_$p")))) ++
      MarginLattice.map(m =>
        row("margin_est", f"ge_${m / 1e6}%.2f", col(s"mar_$m")))
    val stats = agg.select(explode(array(statRows: _*)).as("r"))
      .select(col("r.section"), col("r.metric"), col("r.value"))
    val wd = Window.orderBy(col("c").desc, col("pred_label").asc)
    val classDist = selectTopPercent(cand, DefaultPercent, atLeastOne = true)
      .groupBy("pred_label").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(wd)).filter(col("rk") <= 10)
      .select(lit("class_dist").as("section"), col("pred_label").as("metric"),
        col("c").cast("double").as("value"))
    stats.unionByName(classDist)
  }

  def pl02(s: SparkSession, dir: String): DataFrame =
    pl02On(composeCandidates(s, dir).persist())
}
