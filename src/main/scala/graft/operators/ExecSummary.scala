package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Executive-summary fallback rendering — the deterministic renderer
  * the reference guarantees report completion with when the LLM path
  * fails (acolyte-orchestrator/acolyte/domain/executive_summary.py
  * `ExecutiveSummaryRenderer.render` :17): accepted synthesis claims
  * become one Japanese summary paragraph with exact rules —
  *
  *  - claims carrying numeric_facts render FIRST, both groups in
  *    their original order (Python's stable partition, :26);
  *  - empty claim texts are skipped (:33);
  *  - when a claim's numeric facts are NOT all already substrings of
  *    its text, they are appended as `（fact, fact）` (:37 — the
  *    summary must surface its numbers);
  *  - every sentence gets a trailing 。 unless the (parens-appended)
  *    text already ends with one (:43);
  *  - sentences join with NO separator (:48).
  *
  * The citation fan-out (`build_citations` :51 — one row per claim ×
  * evidence id, first supporting quote attached) is summarized per
  * report as `n_citations` (it counts ALL claims, including the
  * empty-text ones render skips — pinned in the spec).
  *
  * Scale: the per-claim sentence is a stateless projection; each
  * report renders in ONE map-side-combined groupBy whose sort is an
  * in-row array_sort over that report's ≤|claims| sentence structs —
  * no window, no join.
  *
  * Composition: each document contributes one claim to its
  * doc_id%40 report; numeric facts / in-text facts / pre-terminated
  * sentences / empty texts each land on their own residue so every
  * rule fires at every SF.
  */
object ExecSummary {

  /** Composed claims: (report_id, ord, claim, numeric_facts,
    * evidence_ids).
    */
  def composeClaims(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val base = array_join(slice(col("toks"), 3, 8), " ")
    val claim = when(col("doc_id") % 19 === 0, "")
      .otherwise(concat(
        base,
        when(col("doc_id") % 6 === 0, " が45%まで120円で伸びた").otherwise(""),
        when(col("doc_id") % 4 === 0, "と結論した。").otherwise("")))
    val facts = when(col("doc_id") % 3 === 0, array(lit("45%"), lit("120円")))
      .otherwise(array().cast("array<string>"))
    val evid = when(col("doc_id") % 5 === 0,
      array(concat(lit("E"), col("doc_id")), concat(lit("F"), col("doc_id"))))
      .otherwise(array(concat(lit("E"), col("doc_id"))))
    d.select((col("doc_id") % 40).as("report_id"), col("doc_id").as("ord"),
      claim.as("claim"), facts.as("numeric_facts"), evid.as("evidence_ids"))
  }

  /** render + the citation count over any composed-claims frame. */
  def renderOn(claims: DataFrame): DataFrame = {
    val withParens = concat(col("claim"),
      when(size(col("numeric_facts")) > 0 &&
        exists(col("numeric_facts"), f => !col("claim").contains(f)),
        concat(lit("（"), array_join(col("numeric_facts"), ", "), lit("）")))
        .otherwise(""))
    val sentence = when(col("claim") === "", lit(null).cast("string"))
      .otherwise(concat(withParens,
        when(withParens.endsWith("。"), "").otherwise("。")))
    val flag = when(size(col("numeric_facts")) > 0, 0).otherwise(1)
    claims
      .select(col("report_id"), col("ord"), flag.as("flag"),
        sentence.as("sentence"), size(col("evidence_ids")).as("n_evid"))
      .groupBy("report_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("sentence").isNotNull,
            struct(col("flag"), col("ord"), col("sentence"))))),
          x => x.getField("sentence")), "").as("summary"),
        count(col("sentence")).as("n_claims"),
        sum("n_evid").as("n_citations"))
  }

  def xs01(s: SparkSession, dir: String): DataFrame =
    renderOn(composeClaims(s, dir))
}
