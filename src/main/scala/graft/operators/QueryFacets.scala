package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic query decomposition — acolyte's facet builder
  * (acolyte-orchestrator/acolyte/domain/query_facet.py): the LLM
  * planner emits search queries as plain strings, and this module
  * decomposes each into a structured facet with NO LLM involved,
  * using brief metadata and the section role:
  *
  *  - intent inference (:61): tokens of the LOWERCASED query against
  *    the compare / trend keyword sets (set intersection — compare
  *    wins when both hit), else `investigate` for analysis sections,
  *    else `background`;
  *  - entity matching (:111): brief entities kept (original casing,
  *    brief order) when their lowercased form occurs as a SUBSTRING
  *    of the lowercased query;
  *  - must-have terms (:76 `_extract_significant_tokens`): query
  *    tokens of length > 2 whose lowercase is not a stopword, first
  *    3; optional terms: the topic's significant tokens whose
  *    lowercase is not already a must-have, first 3;
  *  - render_query_string (:136): must_have then entities deduped
  *    case-insensitively FIRST-WINS in order, time_range appended
  *    (no dedupe check), raw_query fallback when nothing else
  *    survives, then a 120-char cap truncated at the LAST space when
  *    one exists at index ≥ 1 (Python's `rfind > 0` — re-expressed
  *    as `^(.+) [^ ]*$`, whose greedy group is exactly the prefix up
  *    to the last space).
  *
  * Everything is a stateless projection of the scan — array HOFs
  * over ≤|tokens| elements, no explode, no shuffle, no join (the
  * tx39/tx46 shape); the keyword/stopword sets are Scala values that
  * also generate the DuckDB oracle, which re-expresses the
  * order-preserving dedupe relationally (row_number over
  * (doc, lower(term)) by position).
  *
  * Composition: queries are document-token slices (stopwords and
  * short tokens included naturally) with compare / trend keywords
  * planted on residues — including a both-sets row that pins
  * compare-over-trend precedence; one brief entity is a token
  * guaranteed inside the query, one is absent; every 10th section is
  * synthesis_only and emits NOTHING (:97).
  */
object QueryFacets {

  /** query_facet._COMPARE_KEYWORDS / _TREND_KEYWORDS / _STOP_WORDS
    * (:17-45).
    */
  val compareKeywords: Seq[String] =
    Seq("vs", "versus", "compared", "comparison", "differ", "差", "比較", "対")
  val trendKeywords: Seq[String] =
    Seq("trend", "forecast", "growth", "decline", "outlook", "動向", "推移", "予測")
  val stopWords: Seq[String] = Seq(
    "the", "a", "an", "of", "in", "for", "and", "or", "to", "is", "are",
    "on", "at", "by", "with", "from", "as", "it", "that", "this", "was", "be")

  val MaxRenderedLength = 120

  /** Composed planner outputs: (doc_id, raw_query, section_role,
    * synthesis_only, topic, entities, time_range).
    */
  def composeFacetInputs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    def seg(start: Int, n: Int): Column = array_join(slice(col("toks"), start, n), " ")
    val longEntity = "Hyper Converged Analytics Platform Steering Committee Quarterly Review For Distributed Processing Excellence"
    val query =
      // an all-stopword/short query → empty must_have, no matched
      // entities → the raw_query render fallback fires (:174)
      when(col("doc_id") % 17 === 0, lit("to a of in it be"))
        .otherwise(concat(
          seg(3, 6),
          when(col("doc_id") % 12 === 0, " vs legacy growth")        // both sets → compare wins
            .when(col("doc_id") % 6 === 0, " versus the incumbent")  // compare
            .when(col("doc_id") % 6 === 3, " growth outlook").otherwise(""),
          // the long entity occurs lowercased → matched → the
          // 120-char render cap genuinely truncates at a word boundary
          when(col("doc_id") % 8 === 0, " about " + longEntity.toLowerCase + " plans")
            .otherwise("")))
    // ucfirst (not initcap) so the oracle's upper(substr())||substr()
    // reproduces it exactly
    val tok4 = element_at(col("toks"), 4)
    val entity1 = concat(upper(substring(tok4, 1, 1)), substring(tok4, 2, 1000))
    d.select(
      col("doc_id"),
      query.as("raw_query"),
      when(col("doc_id") % 4 === 0, "analysis").otherwise("general").as("section_role"),
      (col("doc_id") % 10 === 0).as("synthesis_only"),
      concat(seg(1, 6), lit(" Macro Economy Lens")).as("topic"),
      // element 4 of the doc's tokens sits inside the query slice →
      // matched (case-insensitively); the zeppelin entity never occurs
      array(entity1, lit("Zeppelin Corp"), lit(longEntity)).as("entities"),
      when(col("doc_id") % 5 === 0, "2024-01..2024-06").otherwise(lit(null).cast("string"))
        .as("time_range"))
  }

  private def sig(toks: Column): Column =
    filter(toks, t =>
      length(t) > 2 && !array_contains(typedLit(stopWords), lower(t)))

  /** decompose_queries + render_query_string over any composed-input
    * frame, keeping the input columns (topic/entities/time_range) for
    * downstream variant generation.
    */
  private def withFacets(inputs: DataFrame): DataFrame = {
    val qToks = split(trim(col("raw_query")), "\\s+")
    val qLowerSet = transform(qToks, t => lower(t))
    def hitsAny(kws: Seq[String]): Column =
      arrays_overlap(qLowerSet, typedLit(kws))
    val intent = when(hitsAny(compareKeywords), "compare")
      .when(hitsAny(trendKeywords), "trend")
      .when(col("section_role") === "analysis", "investigate")
      .otherwise("background")
    val matched = filter(col("entities"),
      e => lower(col("raw_query")).contains(lower(e)))
    val mustHave = slice(sig(qToks), 1, 3)
    val mustLower = transform(mustHave, t => lower(t))
    val optional = slice(
      filter(sig(split(trim(col("topic")), "\\s+")),
        t => !array_contains(mustLower, lower(t))), 1, 3)
    // order-preserving case-insensitive dedupe fold (≤5 elements)
    val parts = aggregate(
      concat(mustHave, matched),
      array().cast("array<string>"),
      (acc, t) => when(exists(acc, x => lower(x) === lower(t)), acc)
        .otherwise(concat(acc, array(t))))
    val withTime = when(col("time_range").isNotNull,
      concat(parts, array(col("time_range")))).otherwise(parts)
    val joined = when(size(withTime) === 0, col("raw_query"))
      .otherwise(array_join(withTime, " "))
    val truncated = substring(joined, 1, MaxRenderedLength)
    val rendered = when(length(joined) > MaxRenderedLength,
      coalesce(nullif(regexp_extract(truncated, "^(.+) [^ ]*$", 1), lit("")),
        truncated)).otherwise(joined)
    inputs.filter(!col("synthesis_only"))
      .withColumn("intent", intent)
      .withColumn("matched", matched)
      .withColumn("must_have", mustHave)
      .withColumn("optional", optional)
      .withColumn("rendered", rendered)
  }

  /** qf01's public shape. The three term-list facets emit as
    * space-joined strings (order is semantic and preserved) — the
    * correctness gate's comparator cannot sort array-typed columns
    * (round-10 verdict), and a facet's terms never contain spaces
    * only in the entity case, where the join stays unambiguous
    * because entity ORDER is part of the contract being checked.
    */
  def facetsOn(inputs: DataFrame): DataFrame =
    withFacets(inputs).select(
      col("doc_id"), col("intent"), col("raw_query"),
      array_join(col("matched"), " | ").as("entities"),
      array_join(col("must_have"), " ").as("must_have"),
      array_join(col("optional"), " ").as("optional"),
      col("time_range"), col("rendered"))

  def qf01(s: SparkSession, dir: String): DataFrame =
    facetsOn(composeFacetInputs(s, dir))

  /** qv01: multi-query variant generation (domain/query_variant.py:17
    * `generate_query_variants` — the step that PRODUCES the
    * primary/broad/narrow ranked-list sources rag08's RRF fusion
    * consumes): per facet, up to 3 deterministic (query, source)
    * pairs —
    *
    *  - primary: the rendered facet query, when non-empty;
    *  - broad: topic + the first 3 BRIEF entities (wider catch), when
    *    entities exist and the string differs from primary;
    *  - narrow: the must-have terms joined (precision match), when
    *    ≥ 2 terms (:14) and it differs from primary;
    *  - the guaranteed-primary fallback (:49): raw_query-or-topic
    *    when nothing else survived.
    *
    * variant_rank is the reference's list position (1-based,
    * contiguous). Stateless: the variant array builds in-row and
    * posexplodes to ≤3 rows per facet — no shuffle, no join.
    */
  def variantsOn(inputs: DataFrame): DataFrame = {
    val f = withFacets(inputs)
    val broad = trim(concat(col("topic"), lit(" "),
      array_join(slice(col("entities"), 1, 3), " ")))
    val narrow = array_join(col("must_have"), " ")
    def entry(q: Column, src: String): Column =
      array(struct(q.as("q"), lit(src).as("src")))
    val empty = array().cast("array<struct<q:string,src:string>>")
    val variants = concat(
      when(col("rendered") =!= "", entry(col("rendered"), "primary")).otherwise(empty),
      when(size(col("entities")) > 0 && broad =!= "" && broad =!= col("rendered"),
        entry(broad, "broad")).otherwise(empty),
      when(size(col("must_have")) >= 2 && narrow =!= col("rendered"),
        entry(narrow, "narrow")).otherwise(empty))
    val withFallback = when(size(variants) === 0,
      entry(coalesce(nullif(col("raw_query"), lit("")), col("topic")), "primary"))
      .otherwise(slice(variants, 1, 3))
    f.select(col("doc_id"), posexplode(withFallback).as(Seq("pos", "v")))
      .select(col("doc_id"), (col("pos") + 1).as("variant_rank"),
        col("v.q").as("query_string"), col("v.src").as("source_label"))
  }

  def qv01(s: SparkSession, dir: String): DataFrame =
    variantsOn(composeFacetInputs(s, dir))
}
