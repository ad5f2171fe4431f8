package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.{lcsLen, tokens}
import graft.functions.Numeric.{microRatio, microUnits}

/** LLM-output quality evaluation — the recap-evaluator service's
  * no-model metric battery re-expressed as Spark aggregations (the
  * reference evaluates every generated weekly-recap output before it
  * ships: recap-evaluator/src/recap_evaluator/evaluator/).
  *
  * The metrics implemented here are the deterministic, data-only ones:
  *
  *  - source grounding (source_grounding.py): fraction of a summary's
  *    bullets carrying at least one `source_sentence_id` — an
  *    ungrounded bullet is a claim the pipeline could not tie back to
  *    a representative source sentence. The reference reads the
  *    structured bullet list from the output's `body_json`, accepting
  *    BOTH shapes it ships in (top-level `bullets`, else
  *    `summary.bullets` — `_extract_bullets`'s candidate order), and
  *    scores an empty output 0.
  *  - JSON repair rate (json_repair_rate.py): share of outputs whose
  *    `metadata.json_repair_attempted` is true — how often the
  *    upstream LLM emitted JSON that needed JSON5-style repair.
  *  - fallback rate (fallback_rate.py): share of outputs degraded or
  *    produced by the `low-evidence-extractive` fallback model.
  *  - redundancy (redundancy.py): mean pairwise ROUGE-L F1 across a
  *    summary's non-empty bullets — bullets that restate each other
  *    score high; fewer than two non-empty bullets scores 0.
  *
  * The LLM-scored metrics (readability via Ollama, NLI faithfulness,
  * BERTScore) need a model runtime this container does not have and
  * are the env-blocked remainder, exactly like the multimodal codecs.
  *
  * Scale: quality parsing is a stateless `from_json` projection of the
  * outputs scan (per-output scores need no shuffle at all); the only
  * exchange is the per-source rollup. Redundancy's pairwise fan-out is
  * bounded by construction — a summary has ≤ a handful of bullets, so
  * pairs-per-output is a constant (≤ C(4,2) here), never corpus².
  * All ratios are exact integer micro-units rounded at scale 0.
  */
object OutputQuality {

  /** The parsed shape of a recap output's body_json — both bullet
    * locations the reference accepts, plus the generation metadata.
    */
  private val bodySchema =
    "STRUCT<bullets: ARRAY<STRUCT<text: STRING, source_sentence_ids: ARRAY<BIGINT>>>, " +
      "summary: STRUCT<bullets: ARRAY<STRUCT<text: STRING, source_sentence_ids: ARRAY<BIGINT>>>>, " +
      "metadata: STRUCT<json_repair_attempted: BOOLEAN, is_degraded: BOOLEAN, model: STRING>>"

  /** Deterministic recap_outputs stand-in composed from `documents`
    * (the lt01/ev31 composition precedent — the driver tables carry no
    * LLM-output fact): each doc becomes one output whose body_json is
    * REAL JSON with 1–4 bullets of the doc's tokens, bullet i grounded
    * iff (doc_id + i) % 3 != 0, repair/degraded/fallback-model flags
    * on fixed residues, and the bullet list alternating between the
    * two shapes the reference's extractor handles.
    */
  def composeOutputs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
    val nb = (col("doc_id") % 4 + 1).cast("int")
    val bullets = transform(sequence(lit(0), nb - 1), i =>
      struct(
        array_join(slice(col("toks"), i * lit(8) + 1, lit(8)), " ").as("text"),
        when((col("doc_id") + i) % 3 =!= 0, array(col("doc_id") * 10 + i))
          .otherwise(array().cast("array<long>")).as("source_sentence_ids")))
    val metadata = struct(
      (col("doc_id") % 7 === 0).as("json_repair_attempted"),
      (col("doc_id") % 11 === 0).as("is_degraded"),
      when(col("doc_id") % 13 === 0, "low-evidence-extractive")
        .otherwise("news-creator-v2").as("model"))
    d.select(col("doc_id").as("output_id"), col("source"),
      when(col("doc_id") % 2 === 0,
        to_json(struct(bullets.as("bullets"), metadata.as("metadata"))))
        .otherwise(
          to_json(struct(struct(bullets.as("bullets")).as("summary"),
            metadata.as("metadata")))).as("body_json"))
  }

  /** Parse an outputs frame and resolve the bullet list from either
    * accepted location. The reference's `_extract_bullets` walks its
    * candidate order (top-level first, then summary.bullets) and takes
    * the first NON-EMPTY list — so a body with `"bullets": []` plus a
    * populated `summary.bullets` resolves to the nested list, which a
    * plain null-coalesce would miss.
    */
  private def parsed(outputs: DataFrame): DataFrame =
    outputs
      .withColumn("b", from_json(col("body_json"),
        org.apache.spark.sql.types.DataType.fromDDL(bodySchema)))
      .withColumn("bullets",
        when(size(col("b.bullets")) > 0, col("b.bullets"))
          .otherwise(col("b.summary.bullets")))

  /** qe01: per-source output-quality rates over a (output_id, source,
    * body_json) frame — grounding is the mean of per-output grounded
    * fractions (compute_batch averages per-output scores, it does not
    * pool bullets), repair/fallback are output-share ratios.
    */
  def outputQualityOn(outputs: DataFrame): DataFrame =
    parsed(outputs)
      .select(col("source"),
        // per-output grounding fraction in 1e-4 units; bullet-less
        // outputs score 0 like the reference
        when(size(col("bullets")) > 0,
          microUnits(size(filter(col("bullets"), x => size(x.getField("source_sentence_ids")) > 0)),
            size(col("bullets")), 4))
          .otherwise(0L).as("ground_u"),
        when(col("b.metadata.json_repair_attempted") === true, 1).otherwise(0).as("rep"),
        when(col("b.metadata.is_degraded") === true ||
             col("b.metadata.model") === "low-evidence-extractive", 1).otherwise(0).as("fb"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_outputs"),
        (microUnits(sum("ground_u"), count(lit(1)), 0) / 1e4).as("grounding_rate"),
        microRatio(sum("rep"), count(lit(1)), 4).as("repair_rate"),
        microRatio(sum("fb"), count(lit(1)), 4).as("fallback_rate"))

  /** qe01 adapter over the composed outputs view. */
  def outputQuality(s: SparkSession, dir: String): DataFrame =
    outputQualityOn(composeOutputs(s, dir))

  /** qe02: per-source summary redundancy — mean pairwise ROUGE-L F1
    * across each output's non-empty bullets (redundancy.py: higher =
    * the bullets restate each other), then averaged per source.
    * Outputs with fewer than two non-empty bullets score 0, exactly
    * like the reference.
    *
    * Plan: bullets posexplode to (output, idx, tokens) — a ≤4-row
    * fan-out per output — and the pair frame is a self-equi-join on
    * output_id with idx_a < idx_b (≤ C(4,2) = 6 pairs per output, a
    * CONSTANT per-row cost, never corpus²); ROUGE-L is the native
    * LcsLength codegen expression (tx15's kernel). Both rollups key
    * on output_id/source so the whole query shuffles twice on bounded
    * frames.
    */
  def summaryRedundancyOn(outputs: DataFrame): DataFrame = {
    // both persisted: `base` is read by the bullet explode AND the
    // final outputs dimension, `bl` by both sides of the pair
    // self-join — unpersisted, the parse ran three times and the
    // tokenization twice (guide §2.4)
    val base = parsed(outputs).select(col("output_id"), col("source"), col("bullets"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bl = base
      .select(col("output_id"), col("source"),
        posexplode(col("bullets")).as(Seq("idx", "bu")))
      // the reference drops blank bullets before pairing (`b.strip()`);
      // note split("") yields [""] so a size-of-tokens gate would NOT
      // catch the empty bullet — gate on the trimmed text itself
      .filter(length(trim(col("bu.text"))) > 0)
      .withColumn("btoks", tokens(col("bu.text")))
      .select(col("output_id"), col("source"), col("idx"), col("btoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = bl.select(col("output_id"), col("idx").as("ia"), col("btoks").as("ta"))
      .join(bl.select(col("output_id"), col("idx").as("ib"), col("btoks").as("tb")),
        Seq("output_id"))
      .filter(col("ia") < col("ib"))
      .select(col("output_id"),
        microUnits(lcsLen(col("ta"), col("tb")) * 2,
          size(col("ta")) + size(col("tb")), 4).as("f1_u"))
    val perOutput = pairs.groupBy("output_id")
      .agg(microUnits(sum("f1_u"), count(lit(1)), 0).as("redund_u"))
    val out = base.select("output_id", "source")
      .join(perOutput, Seq("output_id"), "left")
      .na.fill(0L, Seq("redund_u"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_outputs"),
        (microUnits(sum("redund_u"), count(lit(1)), 0) / 1e4).as("redundancy"))
    // bounded (per-source) — materialize and release both caches
    // eagerly instead of pinning them for the session (gd01's idiom)
    Dedup.materialized(out) { base.unpersist(); bl.unpersist() }
  }

  /** qe02 adapter over the composed outputs view. */
  def summaryRedundancy(s: SparkSession, dir: String): DataFrame =
    summaryRedundancyOn(composeOutputs(s, dir))

  /** qe08 weights (config.py EvaluatorWeights, WEIGHT_*): G-Eval 0.40,
    * BERTScore 0.25, faithfulness 0.25, ROUGE-L 0.10.
    */
  val WGeval = 0.40
  val WBert = 0.25
  val WFaith = 0.25
  val WRouge = 0.10
  /** geval_<dim> bands (config.py:55-62): warn 3.5 / critical 3.0. */
  val GevalWarn = 3.5
  val GevalCritical = 3.0

  /** qe08: the multi-axis summary evaluation's COMPOSITE score +
    * alert ladder (summary_evaluator.py _calculate_composite_score
    * :308 + _determine_alert_level :331) — the deterministic half
    * around the env-blocked scorers (G-Eval/BERTScore/NLI produce the
    * axis VALUES; combining them is pure arithmetic):
    *
    *  - composite: presence-gated weight RENORMALIZATION — each axis
    *    contributes weight·value only when its score is > 0, and the
    *    divisor is the sum of PRESENT weights (an absent axis doesn't
    *    drag the composite down, :312-329); G-Eval's 1-5 scale
    *    normalizes as (x−1)/4; all axes absent → 0.0;
    *  - alert (:331): each of the four G-Eval dims counts critical
    *    when 0 < value < 3.0, else warn when 0 < value < 3.5;
    *    hallucination_rate counts critical when > 0.5, else warn when
    *    > 0.3 (STRICT >, opposite direction, no presence gate);
    *    the composite counts critical when 0 < c < 0.3, else warn
    *    when 0 < c < 0.5; then critical_count ≥ 2 → critical,
    *    critical_count ≥ 1 ∨ warn_count ≥ 2 → warn, else ok.
    *
    * Engine-exactness: axis values are exact 2-dp rationals, the
    * weighted sum is a FIXED left-to-right IEEE chain (geval,
    * bertscore, faithfulness, rouge — both engines evaluate the same
    * op order), and every band compare is strict on values whose
    * doubles are identical by construction; the composite rounds to
    * 6 dp only at OUTPUT (bands compare the raw double, as :350
    * does). A stateless scan projection — zero shuffles.
    */
  def compositeAlertOn(m: DataFrame): DataFrame = {
    val gNorm = (col("geval_overall") - 1) / 4
    val terms = Seq(
      (col("geval_overall") > 0, lit(WGeval), gNorm),
      (col("bertscore_f1") > 0, lit(WBert), col("bertscore_f1")),
      (col("faithfulness_score") > 0, lit(WFaith), col("faithfulness_score")),
      (col("rouge_l_f1") > 0, lit(WRouge), col("rouge_l_f1")))
    val wSum = terms.map { case (p, w, v) =>
      when(p, w * v).otherwise(0.0) }.reduce(_ + _)
    val wTot = terms.map { case (p, w, _) =>
      when(p, w).otherwise(0.0) }.reduce(_ + _)
    val composite = when(wTot > 0, wSum / wTot).otherwise(0.0)
    val dimCrit = (d: String) =>
      when(col(d) > 0 && col(d) < GevalCritical, 1L).otherwise(0L)
    val dimWarn = (d: String) =>
      when(col(d) > 0 && col(d) >= GevalCritical && col(d) < GevalWarn, 1L)
        .otherwise(0L)
    val dims = Seq("coherence", "consistency", "fluency", "relevance")
    val crit = dims.map(dimCrit).reduce(_ + _) +
      when(col("hallucination_rate") > 0.5, 1L).otherwise(0L) +
      when(composite > 0 && composite < 0.3, 1L).otherwise(0L)
    val warn = dims.map(dimWarn).reduce(_ + _) +
      when(col("hallucination_rate") <= 0.5 && col("hallucination_rate") > 0.3, 1L)
        .otherwise(0L) +
      when(composite > 0 && composite >= 0.3 && composite < 0.5, 1L).otherwise(0L)
    m.select(col("run_id"),
      graft.functions.Numeric.microRound(composite, 6).as("overall_quality_score"),
      crit.as("critical_count"), warn.as("warn_count"),
      when(crit >= 2, "critical")
        .when(crit >= 1 || warn >= 2, "warn")
        .otherwise("ok").as("alert_level"))
  }

  /** Composed per-run axis metrics: every presence branch and band
    * edge occurs on real rows — each axis zeroes on its own residue
    * class; G-Eval dims land in [1.00, 4.99], unit axes in [0, 0.999],
    * hallucination in [0, 0.99].
    */
  def composeAxisMetrics(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val gev = (i: Int) => when(pmod(d + i, lit(9)) === 0, 0.0)
      .otherwise((pmod(d * (2 * i + 3), lit(400)) + 100).cast("double") / 100)
    val unitAxis = (k: Int, z: Int) => when(pmod(d + z, lit(6)) === 0, 0.0)
      .otherwise(pmod(d * k, lit(1000)).cast("double") / 1000)
    Tables.documents(s, dir).select(d.as("run_id"),
      gev(0).as("coherence"), gev(1).as("consistency"),
      gev(2).as("fluency"), gev(3).as("relevance"),
      gev(4).as("geval_overall"),
      unitAxis(13, 1).as("bertscore_f1"),
      unitAxis(19, 2).as("faithfulness_score"),
      unitAxis(23, 3).as("rouge_l_f1"),
      (pmod(d * 17, lit(100)).cast("double") / 100).as("hallucination_rate"))
  }

  def qe08(s: SparkSession, dir: String): DataFrame =
    compositeAlertOn(composeAxisMetrics(s, dir))
}
