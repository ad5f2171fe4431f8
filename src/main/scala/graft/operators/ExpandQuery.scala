package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** eq01: query-expansion output parsing + leak filtering — the
  * deterministic post-LLM half of news-creator
  * expand_query_usecase.py (the generation call is the env-blocked
  * Ollama runtime; its raw text is the composed input — the
  * ps01/hy01/qv01 sanitization-family precedent on a NEW surface):
  *
  *  - `_parse_expansion_lines` (:319): per line — strip, drop
  *    empties, drop section labels (lowercase startswith over the 6
  *    _LABEL_PREFIXES), strip ONE leading "N." / "N)" / "N:" number
  *    prefix (1-3 digits, :317's regex), then ONE leading dash,
  *    asterisk or • bullet, keep what remains;
  *  - `_deduplicate_preserving_order` (:340): first occurrence wins,
  *    keyed on the lowercased line;
  *  - `_filter_instruction_leaks` (:389), four rejection ladders in
  *    order (all pinned):
  *    instruction echo (:352) — the normalized line (lowered, ALL
  *    trailing dots stripped) equals one of the 6
  *    _INSTRUCTION_ECHO_EXACT entries, OR contains one of the 5
  *    entries longer than 20 chars, OR its DISTINCT word set shares
  *    ≥ 3 of the 11 _META_WORDS;
  *    preamble (:372) — any of the 8 _PREAMBLE_PATTERNS substrings;
  *    XML tag leak (:378) — starts with '<' and contains '>', or
  *    starts with '</', or ends with '/>';
  *    repeating pattern (:296) — for pattern lengths 1-4 over a
  *    ≥ 6-char line: the count of consecutive leading repetitions of
  *    the length-p prefix reaches 3 AND covers ≥ 2/3 of the line
  *    (reps·p·3 ≥ 2·len). RE2 has no backreferences (the rp01
  *    lesson), so the repetition count is a chunk-compare fold —
  *    expressible in BOTH engines, keeping the operator oracled
  *    where rp01 had to go rows-only.
  *
  * Output: one row per surviving query (doc_id, rank, query,
  * n_parsed), rank in original line order, n_parsed = the parsed
  * line count the reference logs as raw_line_count.
  *
  * Scale: one stateless parse-explode, then two doc_id-partitioned
  * windows (first-occurrence dedup, final rank) — a single shuffle
  * on the document key, no joins.
  */
object ExpandQuery {

  val LabelPrefixes: Seq[String] = Seq(
    "japanese:", "english:", "日本語:", "英語:", "japanese(", "english(")

  val PreamblePatterns: Seq[String] = Seq(
    "here are", "以下は", "the following", "generated queries",
    "search queries", "query variations", "i will generate", "let me generate")

  val InstructionEchoExact: Seq[String] = Seq(
    "japanese queries and english queries must be translated to each other.",
    "japanese queries first, then english queries.",
    "output only the generated queries, one per line.",
    "do not add numbering, bullets, labels, or explanations.",
    "generate exactly",
    "output japanese queries first")

  val MetaWords: Seq[String] = Seq(
    "queries", "generate", "variations", "translate", "numbering",
    "bullets", "labels", "explanations", "output", "exactly", "requirements")

  /** Composed raw LLM expansion output: every rejection branch
    * planted, three corpus-derived lines survive.
    */
  def composeRaw(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      concat_ws("\n",
        lit("Here are the generated queries:"),
        lit("Japanese:"),
        concat(lit("1. "), array_join(slice(split(trim(col("text")), "\\s+"), 1, 3), " ")),
        concat(lit("- "), array_join(slice(split(trim(col("text")), "\\s+"), 4, 2), " ")),
        upper(array_join(slice(split(trim(col("text")), "\\s+"), 1, 3), " ")),
        lit("</example>"),
        lit(":):):):):)"),
        lit("Do not add numbering, bullets, labels, or explanations."),
        lit("generate exactly"),
        array_join(slice(split(trim(col("text")), "\\s+"), 6, 3), " "),
        lit("output queries generate variations now")).as("raw"))

  private def repeatingPattern(q: Column): Column = {
    val len = length(q)
    (1 to 4).map { p =>
      val pat = substring(q, lit(1), lit(p))
      val chunkOk = transform(
        sequence(lit(0), floor((len - 1) / p).cast("int")),
        i => substring(q, i * p + 1, lit(p)) === pat)
      // array_position yields 0 (not null) when no chunk mismatches
      val pos0 = array_position(chunkOk, false)
      val reps = when(pos0 === 0, size(chunkOk).cast("long")).otherwise(pos0 - 1)
      len >= 6 && len >= 3 * p && reps >= 3 && reps * p * 3 >= len * 2
    }.reduce(_ || _)
  }

  /** The parse + dedup + filter over any (doc_id, raw) frame. */
  def parseOn(raws: DataFrame): DataFrame = {
    val t0 = trim(col("line"))
    val isLabel = LabelPrefixes.map(pfx => lower(t0).startsWith(pfx)).reduce(_ || _)
    val t1 = trim(regexp_replace(t0, "^\\d{1,3}[.):][ \\t]", ""))
    val t2 = when(
      t1.startsWith("-") || t1.startsWith("*") || t1.startsWith("•"),
      trim(substring(t1, 2, Int.MaxValue))).otherwise(t1)
    val parsed = raws
      .select(col("doc_id"), posexplode(split(col("raw"), "\n")).as(Seq("pos", "line")))
      .filter(t0 =!= "" && !isLabel)
      .withColumn("q", t2)
      .filter(col("q") =!= "")
    val wDoc = Window.partitionBy("doc_id")
    val wKey = Window.partitionBy(col("doc_id"), lower(col("q"))).orderBy("pos")
    val deduped = parsed
      .withColumn("n_parsed", count(lit(1)).over(wDoc))
      .withColumn("rn", row_number().over(wKey))
      .filter(col("rn") === 1)
    val norm = regexp_replace(lower(col("q")), "\\.+$", "")
    val echoExact = InstructionEchoExact
      .map(p => norm === p.replaceAll("\\.+$", "")).reduce(_ || _)
    val echoContains = InstructionEchoExact.filter(_.length > 20)
      .map(p => norm.contains(p.replaceAll("\\.+$", ""))).reduce(_ || _)
    val metaHit = size(array_intersect(
      array_distinct(filter(split(norm, "\\s+"), w => w =!= "")),
      typedLit(MetaWords))) >= 3
    val preamble = PreamblePatterns
      .map(p => lower(col("q")).contains(p)).reduce(_ || _)
    val xmlLeak = (col("q").startsWith("<") && col("q").contains(">")) ||
      col("q").startsWith("</") || col("q").endsWith("/>")
    deduped
      .filter(!(echoExact || echoContains || metaHit) && !preamble &&
        !xmlLeak && !repeatingPattern(col("q")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")).cast("int"))
      .select(col("doc_id"), col("rank"), col("q").as("query"), col("n_parsed"))
  }

  def eq01(s: SparkSession, dir: String): DataFrame =
    parseOn(composeRaw(s, dir))
}
