package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** qj01: the summary quality-gate's deterministic spine — pre-processor's
  * quality checker (pre-processor/app/quality-checker/quality_judger.go,
  * production-wired at service/quality_checker.go:82 over every
  * summarized article). The LLM judge itself (JudgeTemplate :124,
  * scoreSummary's Ollama call :194-293) is an env-blocked model runtime
  * (the pl01/fo01/gc01 precedent — its response text is the composed
  * INPUT); everything around it is pure decision logic:
  *
  *  - placeholder exemption FIRST (JudgeArticleQuality :481-486 +
  *    knownPlaceholders :43-48): the two verbatim Japanese
  *    "too short/too long to summarize" placeholder summaries are
  *    never quality-checked — deleting them would re-queue the article
  *    and loop summarize→delete forever. Exact string equality.
  *  - content-length skip (:488-497): len(content)+len(summary) >
  *    maxQualityCheckContentLength (20_000, :31) skips the check and
  *    KEEPS the summary. Go len() is BYTES — octet_length here, both
  *    engines.
  *  - the three-tier score parse on the TrimSpace'd response
  *    (parseScore :296-350 + attemptEmergencyParsing :352-382):
  *      1. `<score>(\d+)(?:</score>)?` — the closing tag is OPTIONAL
  *         because Ollama's stop list includes "</score>" (:301-303);
  *      2. only when tier 1's regex finds NO match: the first
  *         standalone integer `\b(\d+)\b` anywhere in the response;
  *      3. emergency (:352, runs only when parseScore errored): strip
  *         `[^\w\s]` to spaces, then the first `\b(\d+)\b` of the
  *         CLEANED text. A tier-1 match whose digits overflow i64
  *         errors parseScore WITHOUT trying tier 2 (:309-314 returns),
  *         so overflow falls through to emergency, where the stripped
  *         tags can expose an EARLIER parseable number — spec-planted.
  *         try_cast is the ParseInt-error twin on every tier.
  *    Each successful tier clamps to [0, 30] (:315-320 — the template
  *    asks for 1-10 but the clamp is 0-30, verbatim). All tiers
  *    failing SKIPS the check rather than fabricating a low score
  *    (:283-289's comment — a broken format must not delete good
  *    summaries in a loop).
  *  - the decision (:520): score < lowScoreThreshold (7, :27) deletes
  *    the summary (the article stays); otherwise keep.
  *
  * Go's RE2 `\w`/`\b` are ASCII classes, as are Java's defaults and
  * DuckDB's RE2 — the three engines agree on boundary semantics.
  * strings.TrimSpace trims Unicode space; responses are composed with
  * ASCII-space padding only, so trim() is its exact twin here (the
  * ASCII-trim corpus-conditional pin, InputSanitize's precedent).
  *
  * Composition (doc_id % 10): the two placeholder classes, a
  * >20000-byte content class, tier-1 exact and stop-truncated
  * responses, a tier-2 prose response, the emergency-recovers-earlier-
  * number overflow, the emergency-overflow dead end, the
  * embedded-digits unparseable (`abc123` has no `\b` boundary — RE2
  * and Java agree), and a below-threshold delete.
  *
  * Scale: one stateless scan projection — regex ladders and byte
  * lengths per row, zero shuffles; the decision needs no corpus state.
  */
object QualityJudge {

  /** knownPlaceholders (:45-48), verbatim. */
  val Placeholders: Seq[String] = Seq(
    "本文が短すぎるため要約できませんでした。",
    "本文が長すぎるため要約できませんでした。")

  val LowScoreThreshold = 7
  val MaxQualityCheckContentLength = 20000

  /** The three-tier parse + clamp over a raw LLM response column.
    * Returns the parsed score (long, clamped [0,30]) or NULL when every
    * tier fails.
    */
  def parseScore(raw: Column): Column = {
    val resp = trim(raw)
    val t1 = regexp_extract(resp, "<score>(\\d+)(?:</score>)?", 1)
    val t1Val = t1.try_cast("long")
    val t2 = regexp_extract(resp, "\\b(\\d+)\\b", 1)
    val t2Val = t2.try_cast("long")
    val cleaned = regexp_replace(resp, "[^\\w\\s]", " ")
    val em = regexp_extract(cleaned, "\\b(\\d+)\\b", 1)
    val emVal = em.try_cast("long")
    // greatest/least IGNORE nulls in both engines — an unguarded clamp
    // would turn an overflow (null) into a real 0/30 score; gate first
    def clamp(v: Column) = when(v.isNotNull, least(greatest(v, lit(0L)), lit(30L)))
    // tier 1 match consumes the attempt even on overflow (:309-314);
    // tier 2 runs only when tier 1's regex found nothing at all
    val parsed = when(t1 =!= "", clamp(t1Val))
      .when(t2 =!= "", clamp(t2Val))
    // emergency only when the parse above yielded null (no match or
    // overflow on the matched tier)
    coalesce(parsed, when(em =!= "", clamp(emVal)))
  }

  /** The full gate over (id, content, summary, response) rows →
    * (id, outcome, score).
    */
  def judge(rows: DataFrame): DataFrame = {
    val score = parseScore(col("response"))
    rows.select(col("id"),
      when(col("summary").isin(Placeholders: _*), lit("skip_placeholder"))
        .when(octet_length(col("content")) + octet_length(col("summary"))
          > MaxQualityCheckContentLength, lit("skip_too_long"))
        .when(score.isNull, lit("skip_unparseable"))
        .when(score < LowScoreThreshold, lit("delete_summary"))
        .otherwise(lit("keep")).as("outcome"),
      when(!col("summary").isin(Placeholders: _*) &&
        octet_length(col("content")) + octet_length(col("summary"))
          <= MaxQualityCheckContentLength, score).as("score"))
  }

  /** qj01 adapter: composed judge rows over the documents table. */
  def qj01(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val cls = col("doc_id") % 10
    val rows = d.select(col("doc_id").as("id"),
      when(cls === 2, concat(col("text"), repeat(lit("x"), 20001)))
        .otherwise(col("text")).as("content"),
      when(cls === 0, lit(Placeholders(0)))
        .when(cls === 1, lit(Placeholders(1)))
        .otherwise(concat(lit("要約テスト"), col("doc_id").cast("string"))).as("summary"),
      when(cls === 3, lit("<score>8</score>"))
        .when(cls === 4, lit("  <score>5  "))
        .when(cls === 5, lit("Rating: 7 / 10"))
        .when(cls === 6, lit("Rating 8 <score>99999999999999999999</score>"))
        .when(cls === 7, lit("<score>99999999999999999999</score> then 6"))
        .when(cls === 8, lit("totally abc123 embedded"))
        .when(cls === 9, lit("<score>2</score>"))
        .otherwise(lit("")).as("response"))
    judge(rows)
  }

  /** DuckDB twin of [[qj01]] — same composition, same ladder; DuckDB
    * regexp_replace needs the 'g' flag (pre01's gotcha).
    */
  val qj01OracleSql: String = {
    val t1 = "regexp_extract(resp, '<score>(\\d+)(?:</score>)?', 1)"
    val t2 = "regexp_extract(resp, '\\b(\\d+)\\b', 1)"
    val em = "regexp_extract(regexp_replace(resp, '[^\\w\\s]', ' ', 'g'), '\\b(\\d+)\\b', 1)"
    def clamp(v: String) =
      s"CASE WHEN TRY_CAST($v AS BIGINT) IS NOT NULL THEN least(greatest(TRY_CAST($v AS BIGINT), 0), 30) END"
    s"""WITH rows0 AS (
         SELECT doc_id AS id,
           CASE WHEN doc_id % 10 = 2 THEN text || repeat('x', 20001) ELSE text END AS content,
           CASE WHEN doc_id % 10 = 0 THEN '本文が短すぎるため要約できませんでした。'
                WHEN doc_id % 10 = 1 THEN '本文が長すぎるため要約できませんでした。'
                ELSE '要約テスト' || doc_id END AS summary,
           CASE doc_id % 10
                WHEN 3 THEN '<score>8</score>'
                WHEN 4 THEN '  <score>5  '
                WHEN 5 THEN 'Rating: 7 / 10'
                WHEN 6 THEN 'Rating 8 <score>99999999999999999999</score>'
                WHEN 7 THEN '<score>99999999999999999999</score> then 6'
                WHEN 8 THEN 'totally abc123 embedded'
                WHEN 9 THEN '<score>2</score>'
                ELSE '' END AS response
         FROM documents),
       parsed AS (
         SELECT *, trim(response) AS resp,
           CASE WHEN $t1 <> '' THEN ${clamp(t1)}
                WHEN $t2 <> '' THEN ${clamp(t2)} END AS p0
         FROM rows0),
       scored AS (
         SELECT *, coalesce(p0, CASE WHEN $em <> '' THEN ${clamp(em)} END) AS score0,
           summary IN ('本文が短すぎるため要約できませんでした。',
                       '本文が長すぎるため要約できませんでした。') AS is_ph,
           strlen(content) + strlen(summary) > 20000 AS too_long
         FROM parsed)
       SELECT id,
         CASE WHEN is_ph THEN 'skip_placeholder'
              WHEN too_long THEN 'skip_too_long'
              WHEN score0 IS NULL THEN 'skip_unparseable'
              WHEN score0 < 7 THEN 'delete_summary'
              ELSE 'keep' END AS outcome,
         CASE WHEN NOT is_ph AND NOT too_long THEN score0 END AS score
       FROM scored"""
  }
}
