package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** cf01: report citation-format + grounding validation — acolyte's
  * revision-loop gate (acolyte-orchestrator/acolyte/domain/
  * citation_format.py, production-wired at
  * usecase/graph/nodes/writer_node.py:554-556: format first, grounding
  * only when the format passed).
  *
  * Reference rules, in gate order:
  *
  *  - `validate_citation_format` (:25-48): the first bracket
  *    expression that is NOT an `[Sn]` marker
  *    (`_BAD_BRACKET_RE = \[(?!S\d+\])[^\[\]]+\]` :20) rejects with
  *    `inline_title_in_brackets: <match[:80]>` — this catches
  *    `[Title | Source | Tags]` pollution AND legacy `[1]`-style
  *    markers that bypass SourceMap. Then the first bare
  *    `https?://\S+` URL rejects with `bare_url: <match[:80]>`.
  *    The Spark side runs the reference regex verbatim (Java supports
  *    the lookahead); DuckDB's RE2 does not, so the oracle re-expresses
  *    it as a bracket-token scan filtered by `^\[S\d+\]$` — the two
  *    match IDENTICAL spans on any text because the lookahead only
  *    decides whether a scanned token counts, never changes the scan
  *    (spec pins the classes: pipe-titles, legacy [1], [S5x] suffixed,
  *    nested-bracket starts). Python's `\S` is Unicode-space-aware
  *    where RE2/Java default to ASCII — composed URLs are
  *    ASCII-delimited (the corpus-conditional ASCII pin, qj01/is01's
  *    class).
  *  - `validate_citation_grounding` (:50-67): every `[Sn]` marker must
  *    be in the evidence set actually given to the writer; unknown
  *    markers reject with `unknown_citation_id: <ids>` — ids
  *    first-occurrence-deduplicated (`dict.fromkeys`) in body order,
  *    ", "-joined. A body with NO markers always passes (only existing
  *    markers are guarded).
  *
  * Output: (doc_id, is_valid, reason) with reason "" when valid —
  * the exact (bool, str) tuple shape, bool as int (comparator
  * convention).
  *
  * Scale: a stateless per-row regex projection — zero shuffles; the
  * evidence set is a per-report bounded dimension (literal here,
  * a broadcast join in a multi-report run).
  */
object CitationFormat {

  /** _BAD_BRACKET_RE (:20), verbatim — Java regex supports the
    * negative lookahead.
    */
  val BadBracketRe: String = "\\[(?!S\\d+\\])[^\\[\\]]+\\]"

  /** The combined writer-node gate over (id, body) rows with a literal
    * evidence set.
    */
  def validate(rows: DataFrame, validIds: Seq[String]): DataFrame = {
    val badBr = regexp_extract(col("body"), BadBracketRe, 0)
    val url = regexp_extract(col("body"), "https?://\\S+", 0)
    val unknown = array_join(
      array_distinct(filter(
        regexp_extract_all(col("body"), lit("\\[(S\\d+)\\]"), lit(1)),
        m => !m.isin(validIds: _*))), ", ")
    val reason = when(badBr =!= "", concat(lit("inline_title_in_brackets: "), substring(badBr, 1, 80)))
      .when(url =!= "", concat(lit("bare_url: "), substring(url, 1, 80)))
      .when(unknown =!= "", concat(lit("unknown_citation_id: "), unknown))
      .otherwise(lit(""))
    rows.select(col("id").as("doc_id"),
      (reason === "").cast("int").as("is_valid"), reason.as("reason"))
  }

  /** cf01 adapter: seven composed body classes per document — clean,
    * pipe-title bracket, legacy [1], bare URL, unknown ids with a
    * repeat (dedup + order), bracket-beats-url precedence, no-marker
    * pass. Evidence set = {S1, S2, S3}.
    */
  def cf01(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 7
    val rows = Tables.documents(s, dir).select(col("doc_id").as("id"),
      when(cls === 0, lit("Alpha [S1] beta [S2]."))
        .when(cls === 1, lit("Alpha [Title | Source | Tags] beta [S1]"))
        .when(cls === 2, lit("Legacy [1] marker [S2]"))
        .when(cls === 3, lit("See https://example.com/x?y=1 details [S1]"))
        .when(cls === 4, lit("Claims [S9] and [S12] and [S9] again [S1]"))
        .when(cls === 5, lit("Bad [Note] and https://x.test/z"))
        .otherwise(lit("Plain prose without citations")).as("body"))
    validate(rows, Seq("S1", "S2", "S3"))
  }

  /** DuckDB twin of [[cf01]] — the lookahead re-expressed as a
    * bracket-token scan; first-occurrence dedup via the indexed
    * list_filter (list_distinct reorders).
    */
  val cf01OracleSql: String =
    s"""WITH rows0 AS (SELECT doc_id AS id,
           CASE doc_id % 7
                WHEN 0 THEN 'Alpha [S1] beta [S2].'
                WHEN 1 THEN 'Alpha [Title | Source | Tags] beta [S1]'
                WHEN 2 THEN 'Legacy [1] marker [S2]'
                WHEN 3 THEN 'See https://example.com/x?y=1 details [S1]'
                WHEN 4 THEN 'Claims [S9] and [S12] and [S9] again [S1]'
                WHEN 5 THEN 'Bad [Note] and https://x.test/z'
                ELSE 'Plain prose without citations' END AS body
         FROM documents),
       ex AS (SELECT id, body,
           coalesce(list_filter(regexp_extract_all(body, '\\[([^\\[\\]]+)\\]', 0),
                    x -> NOT regexp_matches(x, '^\\[S\\d+\\]$$'))[1], '') AS bad_br,
           regexp_extract(body, 'https?://\\S+', 0) AS url,
           list_filter(regexp_extract_all(body, '\\[(S\\d+)\\]', 1),
                       m -> m NOT IN ('S1', 'S2', 'S3')) AS unk0
         FROM rows0),
       rs AS (SELECT id, bad_br, url,
           array_to_string(list_filter(unk0, (x, i) -> list_position(unk0, x) = i), ', ') AS unknown
         FROM ex),
       fin AS (SELECT id,
           CASE WHEN bad_br <> '' THEN 'inline_title_in_brackets: ' || substr(bad_br, 1, 80)
                WHEN url <> '' THEN 'bare_url: ' || substr(url, 1, 80)
                WHEN unknown <> '' THEN 'unknown_citation_id: ' || unknown
                ELSE '' END AS reason
         FROM rs)
       SELECT id AS doc_id, CAST(reason = '' AS INT) AS is_valid, reason FROM fin"""
}
