package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** rag14: LLM answer validation + JSON repair — rag-orchestrator's
  * `OutputValidator.Validate` (internal/usecase/output_validator.go:23-96,
  * production-wired at answer_with_rag_usecase.go:518/:607,
  * stream_hybrid_longform.go:206, rag_answer_stream.go:357; wired with
  * minAnswerLength = RAG.MinAnswerLength default 800 runes,
  * config.go:65).
  *
  * The ladder, per the reference:
  *
  *  1. TrimSpace; empty → error ("llm response is empty").
  *  2. json.Unmarshal of the trimmed text into {answer, citations
  *     [{chunk_id, reason}], fallback, reason}.
  *  3. On failure, `repairJSON` (:98-127): text already ending in `}`
  *     is returned UNREPAIRED (even when invalid); otherwise the first
  *     of `}` `]}` `"}` `"]}` whose append makes the whole text valid
  *     JSON; none → the raw text.
  *  4. Still failing → `extractAnswerOnly` (:129-190): find
  *     `"answer":`, skip ` \n\t\r`, require an opening quote, scan to
  *     the first unescaped quote OR END (truncated strings keep what
  *     they have), unescaping \n \r \t \" \\ and DROPPING the
  *     backslash of any other escape (`\x`→x — so `\u0041` becomes
  *     `u0041`, pinned; escape-bearing truncations beyond these five
  *     are out of composed scope). A non-empty extraction returns
  *     EARLY with reason `recovered_from_truncated_json`,
  *     `extractCitationsOnly` (:192-254: the citations `[...]` span by
  *     bracket count — brackets inside strings would miscount, Go scan
  *     quirk, composed away; a truncated span is trimmed of `, \n\t`
  *     and closed with `"}]` / `]` / `"}]` by last-char shape), and
  *     THREE recovered-path quirks all pinned: citations skip only the
  *     empty-chunk filter (never the allowed-set check), the
  *     empty-answer rejection is bypassed, and ShortAnswer is never
  *     set. Empty extraction → error.
  *  5. Parsed-path citations (only when contexts exist): empty
  *     chunk_ids skipped, then membership in {context chunk ids} ∪
  *     {1-based index strings} — invalid citations silently dropped.
  *     With NO contexts the citations pass through UNFILTERED,
  *     including empty-chunk ones (the len(contexts)>0 guard, pinned).
  *  6. Answer = convertLiteralEscapes(TrimSpace(answer)) (:485-507):
  *     literal `\n` becomes a newline UNLESS preceded by a
  *     drive-letter `X:` (C:\new preserved); `\t`/`\r` never convert.
  *     Re-expressed as protect → replace → restore (RE2 has no
  *     lookbehind; the sentinel is U+0002, composed away).
  *  7. Empty answer without the fallback flag → error (the
  *     "headers-only" 8B failure); short answers (< 800 runes) flag
  *     ShortAnswer=true but pass.
  *
  * Go's json.Unmarshal matches keys case-insensitively and tolerates
  * unknown fields; composed keys are exact-lowercase and type-correct,
  * so "parses" ⇔ "is valid JSON" on the battery (pinned) — Spark
  * checks validity with try_parse_json (VARIANT), DuckDB with
  * json_valid, and both extract through their native JSON readers.
  *
  * Output: (id, status, answer, n_citations, fallback, reason,
  * short_answer) — status ok/recovered/error_empty/error_unparseable/
  * error_empty_answer; non-status fields NULL on errors.
  *
  * Scale: a stateless per-row projection (regex + JSON kernels), zero
  * shuffles; contexts are a per-row bounded dimension.
  */
object AnswerValidate {

  val MinAnswerRunes = 800

  private val CiteSchema = ArrayType(StructType(Seq(
    StructField("chunk_id", StringType), StructField("reason", StringType))))
  private val AnswerSchema = StructType(Seq(
    StructField("answer", StringType),
    StructField("citations", CiteSchema),
    StructField("fallback", BooleanType),
    StructField("reason", StringType)))

  /** Go-loop JSON-escape unescape for the extracted answer token:
    * sentinel the double backslash, map the five known escapes, drop
    * the backslash of anything else, restore.
    */
  private def unescape(tok: Column): Column = {
    val s1 = regexp_replace(tok, "\\\\\\\\", "\u0001")
    val s2 = regexp_replace(s1, "\\\\n", "\n")
    val s3 = regexp_replace(s2, "\\\\r", "\r")
    val s4 = regexp_replace(s3, "\\\\t", "\t")
    val s5 = regexp_replace(s4, "\\\\\"", "\"")
    val s6 = regexp_replace(s5, "\\\\(.)", "$1")
    regexp_replace(s6, "\u0001", "\\\\")
  }

  /** convertLiteralEscapes (:485-507): protect `X:\n`, convert the
    * rest, restore.
    */
  def convertLiteralEscapes(s: Column): Column = {
    val p = regexp_replace(s, "([A-Za-z]:)\\\\n", "$1\u0002n")
    val c = regexp_replace(p, "\\\\n", "\n")
    regexp_replace(c, "\u0002n", "\\\\n")
  }

  /** The validation over (id, raw, ctx_ids) rows. */
  def validate(rows: DataFrame): DataFrame = {
    val trimmed = trim(col("raw"))
    def valid(c: Column) = try_parse_json(c).isNotNull
    val c1 = concat(trimmed, lit("}"))
    val c2 = concat(trimmed, lit("]}"))
    val c3 = concat(trimmed, lit("\"}"))
    val c4 = concat(trimmed, lit("\"]}"))
    val repaired = when(trimmed.endsWith("}"), trimmed)
      .when(valid(c1), c1).when(valid(c2), c2)
      .when(valid(c3), c3).when(valid(c4), c4)
      .otherwise(col("raw"))
    val parseSrc = when(valid(trimmed), trimmed)
      .when(valid(repaired), repaired)
    val parsed = from_json(parseSrc, AnswerSchema)

    // extraction fallback (:129-190)
    val ansTok = regexp_extract(trimmed,
      "\"answer\":[ \\n\\t\\r]*\"((?:[^\"\\\\]|\\\\.)*)", 1)
    val hasAnsKey = trimmed.rlike("\"answer\":[ \\n\\t\\r]*\"")
    val extracted = when(hasAnsKey, unescape(ansTok)).otherwise(lit(""))
    val recAnswer = convertLiteralEscapes(trim(extracted))
    // citations span (:192-254); composed without brackets-in-strings
    val closedFrag = regexp_extract(trimmed,
      "\"citations\":[ \\n\\t]*(\\[[^\\]\\[]*\\])", 1)
    val openFrag = regexp_extract(trimmed,
      "\"citations\":[ \\n\\t]*(\\[[^\\]\\[]*)$", 1)
    val repairedFrag = {
      val t = rtrim(openFrag, ", \n\t")
      when(t.endsWith("\""), concat(t, lit("}]")))
        .when(t.endsWith("}"), concat(t, lit("]")))
        .otherwise(concat(t, lit("\"}]")))
    }
    val recFragSrc = when(closedFrag =!= "", closedFrag)
      .when(openFrag =!= "", repairedFrag)
    val recCites = filter(
      coalesce(from_json(when(valid(recFragSrc), recFragSrc), CiteSchema),
        array().cast(CiteSchema)),
      c => c.getField("chunk_id").isNotNull && c.getField("chunk_id") =!= "")

    // parsed-path answer + citations
    val pAnswer = convertLiteralEscapes(trim(coalesce(parsed.getField("answer"), lit(""))))
    val pFallback = coalesce(parsed.getField("fallback"), lit(false))
    val pReason = coalesce(parsed.getField("reason"), lit(""))
    val cites = coalesce(parsed.getField("citations"), array().cast(CiteSchema))
    val nCtx = size(col("ctx_ids"))
    val idxStrings = transform(sequence(lit(1), nCtx), i => i.cast("string"))
    val allowed = concat(col("ctx_ids"), idxStrings)
    val pCites = when(nCtx > 0,
      filter(cites, c => c.getField("chunk_id").isNotNull &&
        c.getField("chunk_id") =!= "" &&
        array_contains(allowed, c.getField("chunk_id"))))
      .otherwise(cites)

    val status = when(trimmed === "", "error_empty")
      .when(parseSrc.isNotNull && pAnswer === "" && !pFallback, "error_empty_answer")
      .when(parseSrc.isNotNull, "ok")
      .when(extracted =!= "", "recovered")
      .otherwise("error_unparseable")

    rows.select(col("id"),
      status.as("status"),
      when(status === "ok", pAnswer)
        .when(status === "recovered", recAnswer).as("answer"),
      when(status === "ok", size(pCites))
        .when(status === "recovered", size(recCites)).as("n_citations"),
      when(status === "ok", pFallback.cast("int")).as("fallback"),
      when(status === "ok", pReason)
        .when(status === "recovered", lit("recovered_from_truncated_json")).as("reason"),
      when(status === "ok", (length(pAnswer) < MinAnswerRunes).cast("int"))
        .when(status === "recovered", lit(0)).as("short_answer"))
  }

  /** rag14 adapter: thirteen composed response classes per document. */
  def rag14(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 13
    val tok = (col("doc_id") % 50).cast("string")
    val ctx1 = concat(lit("ctx-"), tok, lit("-1"))
    val longAns = "Long grounded prose segment. " // 29 chars * 30 = 870
    val raw = when(cls === 0, concat(lit("{\"answer\":\"Grounded answer "), tok,
        lit(".\",\"citations\":[{\"chunk_id\":\""), ctx1,
        lit("\",\"reason\":\"r\"},{\"chunk_id\":\"9\",\"reason\":\"x\"},{\"chunk_id\":\"\",\"reason\":\"y\"},{\"chunk_id\":\"2\",\"reason\":\"idx\"}],\"fallback\":false,\"reason\":\"ok\"}")))
      .when(cls === 1, concat(lit("{\"answer\":\"Repaired "), tok, lit(".\",\"fallback\":false")))
      .when(cls === 2, concat(lit("{\"answer\":\"Cut off mid sentence "), tok))
      .when(cls === 3, concat(lit("{\"answer\":\"A"), tok,
        lit(".\",\"nums\":[1,2")))
      .when(cls === 4, lit("{\"answer\": 12 nonsense [["))
      .when(cls === 5, concat(lit("{\"answer\":\"Recovered tail "), tok,
        lit("\",\"citations\":[{\"chunk_id\":\"2\",")))
      .when(cls === 6, concat(lit("{\"answer\":\"Line one\\\\nLine two and C:\\\\new path "),
        tok, lit(".\",\"fallback\":false}")))
      .when(cls === 7, lit("{\"answer\":\"\",\"fallback\":true,\"reason\":\"insufficient_context\"}"))
      .when(cls === 8, lit("{\"answer\":\"  \",\"fallback\":false}"))
      .when(cls === 9, lit("   "))
      .when(cls === 10, concat(lit("{\"answer\":\""), lit(longAns * 30), tok, lit("\"}")))
      .when(cls === 11, lit("{\"answer\":\"No ctx filter.\",\"citations\":[{\"chunk_id\":\"\",\"reason\":\"kept\"},{\"chunk_id\":\"zz\",\"reason\":\"kept2\"}]}"))
      .otherwise(concat(lit("{\"answer\":\"T4 case "), tok,
        lit(".\",\"fallback\":false,\"extra\":[\"note")))
    val ctxIds = when(cls === 11, array().cast(ArrayType(StringType)))
      .otherwise(array(concat(lit("ctx-"), tok, lit("-1")),
        concat(lit("ctx-"), tok, lit("-2")),
        concat(lit("ctx-"), tok, lit("-3"))))
    validate(Tables.documents(s, dir)
      .select(col("doc_id").as("id"), raw.as("raw"), ctxIds.as("ctx_ids")))
  }

  /** DuckDB twin of [[rag14]]. */
  val rag14OracleSql: String = {
    val longAns = "Long grounded prose segment. "
    // the same three-step literal-escape conversion (chr(2) sentinel)
    def convEsc(x: String) =
      s"""replace(replace(regexp_replace($x, '([A-Za-z]:)\\\\n', '\\1' || chr(2) || 'n', 'g'),
          '\\n', chr(10)), chr(2) || 'n', '\\n')"""
    def unesc(x: String) =
      s"""replace(regexp_replace(replace(replace(replace(replace(
            replace($x, '\\\\', chr(1)),
            '\\n', chr(10)), '\\r', chr(13)), '\\t', chr(9)), '\\"', '"'),
          '\\\\(.)', '\\1', 'g'), chr(1), '\\')"""
    s"""WITH rows0 AS (SELECT doc_id AS id, doc_id % 13 AS cls,
           CAST(doc_id % 50 AS VARCHAR) AS tok FROM documents),
       comp AS (SELECT id, cls, tok,
           CASE cls
             WHEN 0 THEN '{"answer":"Grounded answer ' || tok || '.","citations":[{"chunk_id":"ctx-' || tok || '-1","reason":"r"},{"chunk_id":"9","reason":"x"},{"chunk_id":"","reason":"y"},{"chunk_id":"2","reason":"idx"}],"fallback":false,"reason":"ok"}'
             WHEN 1 THEN '{"answer":"Repaired ' || tok || '.","fallback":false'
             WHEN 2 THEN '{"answer":"Cut off mid sentence ' || tok
             WHEN 3 THEN '{"answer":"A' || tok || '.","nums":[1,2'
             WHEN 4 THEN '{"answer": 12 nonsense [['
             WHEN 5 THEN '{"answer":"Recovered tail ' || tok || '","citations":[{"chunk_id":"2",'
             WHEN 6 THEN '{"answer":"Line one\\\\nLine two and C:\\\\new path ' || tok || '.","fallback":false}'
             WHEN 7 THEN '{"answer":"","fallback":true,"reason":"insufficient_context"}'
             WHEN 8 THEN '{"answer":"  ","fallback":false}'
             WHEN 9 THEN '   '
             WHEN 10 THEN '{"answer":"' || repeat('$longAns', 30) || tok || '"}'
             WHEN 11 THEN '{"answer":"No ctx filter.","citations":[{"chunk_id":"","reason":"kept"},{"chunk_id":"zz","reason":"kept2"}]}'
             ELSE '{"answer":"T4 case ' || tok || '.","fallback":false,"extra":["note'
           END AS raw,
           CASE WHEN cls = 11 THEN []::VARCHAR[]
                ELSE ['ctx-' || tok || '-1', 'ctx-' || tok || '-2', 'ctx-' || tok || '-3'] END AS ctx_ids
         FROM rows0),
       rep AS (SELECT *, trim(raw) AS t,
           CASE WHEN suffix(trim(raw), '}') THEN trim(raw)
                WHEN json_valid(trim(raw) || '}') THEN trim(raw) || '}'
                WHEN json_valid(trim(raw) || ']}') THEN trim(raw) || ']}'
                WHEN json_valid(trim(raw) || '"}') THEN trim(raw) || '"}'
                WHEN json_valid(trim(raw) || '"]}') THEN trim(raw) || '"]}'
                ELSE raw END AS repaired
         FROM comp),
       src AS (SELECT *,
           CASE WHEN json_valid(t) THEN t
                WHEN json_valid(repaired) THEN repaired END AS psrc
         FROM rep),
       ext AS (SELECT *,
           CASE WHEN regexp_matches(t, '"answer":[ \\n\\t\\r]*"')
                THEN ${unesc("""regexp_extract(t, '"answer":[ \n\t\r]*"((?:[^"\\]|\\.)*)', 1)""")}
                ELSE '' END AS extracted,
           regexp_extract(t, '"citations":[ \\n\\t]*(\\[[^\\]\\[]*\\])', 1) AS closed_frag,
           regexp_extract(t, '"citations":[ \\n\\t]*(\\[[^\\]\\[]*)$$', 1) AS open_frag
         FROM src),
       frg AS (SELECT *,
           CASE WHEN closed_frag <> '' THEN closed_frag
                WHEN open_frag <> '' THEN
                  CASE WHEN suffix(rtrim(open_frag, ', ' || chr(10) || chr(9)), '"')
                         THEN rtrim(open_frag, ', ' || chr(10) || chr(9)) || '}]'
                       WHEN suffix(rtrim(open_frag, ', ' || chr(10) || chr(9)), '}')
                         THEN rtrim(open_frag, ', ' || chr(10) || chr(9)) || ']'
                       ELSE rtrim(open_frag, ', ' || chr(10) || chr(9)) || '"}]' END
           END AS rec_frag
         FROM ext),
       par AS (SELECT *,
           ${convEsc("trim(coalesce(json_extract_string(psrc, '$.answer'), ''))")} AS p_answer,
           coalesce(json_extract_string(psrc, '$$.fallback'), 'false') = 'true' AS p_fallback,
           coalesce(json_extract_string(psrc, '$$.reason'), '') AS p_reason,
           coalesce(json_array_length(psrc, '$$.citations'), 0) AS n_raw_cites,
           ${convEsc("trim(extracted)")} AS rec_answer
         FROM frg),
       cit AS (SELECT *,
           list_filter(list_transform(range(0, CAST(n_raw_cites AS BIGINT)),
             i -> coalesce(json_extract_string(psrc, '$$.citations[' || i || '].chunk_id'), '')),
             c -> CASE WHEN len(ctx_ids) > 0
                       THEN c <> '' AND (list_contains(ctx_ids, c)
                            OR list_contains(list_transform(range(1, len(ctx_ids) + 1),
                                 j -> CAST(j AS VARCHAR)), c))
                       ELSE true END) AS p_cites,
           CASE WHEN rec_frag IS NOT NULL AND json_valid(rec_frag)
                THEN list_filter(list_transform(range(0, CAST(json_array_length(rec_frag) AS BIGINT)),
                       i -> coalesce(json_extract_string(rec_frag, '$$[' || i || '].chunk_id'), '')),
                     c -> c <> '')
                ELSE []::VARCHAR[] END AS rec_cites
         FROM par),
       st AS (SELECT *,
           CASE WHEN t = '' THEN 'error_empty'
                WHEN psrc IS NOT NULL AND p_answer = '' AND NOT p_fallback THEN 'error_empty_answer'
                WHEN psrc IS NOT NULL THEN 'ok'
                WHEN extracted <> '' THEN 'recovered'
                ELSE 'error_unparseable' END AS status
         FROM cit)
       SELECT id, status,
         CASE WHEN status = 'ok' THEN p_answer
              WHEN status = 'recovered' THEN rec_answer END AS answer,
         CASE WHEN status = 'ok' THEN len(p_cites)
              WHEN status = 'recovered' THEN len(rec_cites) END AS n_citations,
         CASE WHEN status = 'ok' THEN CAST(p_fallback AS INT) END AS fallback,
         CASE WHEN status = 'ok' THEN p_reason
              WHEN status = 'recovered' THEN 'recovered_from_truncated_json' END AS reason,
         CASE WHEN status = 'ok' THEN CAST(length(p_answer) < $MinAnswerRunes AS INT)
              WHEN status = 'recovered' THEN 0 END AS short_answer
       FROM st"""
  }
}
