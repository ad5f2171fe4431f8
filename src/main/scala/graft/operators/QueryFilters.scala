package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** rag13: the expanded-query filter ladder — rag-orchestrator's
  * post-LLM query hygiene (internal/usecase/retrieval/expand_queries.go,
  * production-wired at answer_with_rag_usecase.go:1495
  * `FilterSearchQueries` and retrieval/graph.go:121 `ExpandQueries`;
  * the LLM expansion itself is the env-blocked generator — its line
  * list is the composed INPUT, the eq01/ke01 precedent).
  *
  * `filterExpandedQueries` (:190-236) applies, in CODE order (the :187
  * comment lists a different order — code wins, ke01's comment-lies
  * precedent):
  *
  *  1. stripMarkdownScaffolding (:317-341): trim; drop empty, ATX
  *     headers `^#{1,6}\s`, decoration `^[-=*_]{3,}$`; bold-label
  *     lines `^\*{1,2}\s*([A-Za-z][A-Za-z \-]{0,40}?)\s*\*{0,2}:\s*\*{0,2}\s*(.*)$`
  *     are dropped UNLESS the lowercased label is one of the six
  *     queryExtractionLabels, in which case the content survives with
  *     `*"'“”` quote-trim (both ends) + re-trim, empty content drops.
  *  2. rune length ∈ [minQueryRuneLen=3, maxQueryRuneLen=200] (:202).
  *  3. isGarbagePattern (:395-421): for prefix pattern lengths 1-4,
  *     count CONSECUTIVE repetitions of the prefix from the start;
  *     ≥3 repetitions covering ≥⅔ of the runes (reps·L·3 ≥ len·2)
  *     is degenerate-decoding garbage; strings under 6 runes pass.
  *  4. isRomanizedJapanese (:423-454): any hiragana/katakana/CJK rune
  *     → real Japanese, pass; else any macron vowel (ōūāēī, both
  *     cases) → drop; else ≥2 hyphen-containing words (edge hyphens
  *     trimmed first) → drop.
  *  5. isDateOnly (:280-283): `^\d{4}[-/.]\d{1,2}[-/.]\d{1,2}$`.
  *  6. isInstructionLeak (:368-393): normalized = trailing-dot-stripped
  *     lowercase; exact match against the six instructionLeakExact
  *     patterns, containment for the >20-char ones, or ≥3
  *     instructionMetaWords among the whitespace fields.
  *  7. isXMLTagLeak (:344-356): starts `<` and contains `>`.
  *  8. isConversationMessageLeak (:358-361): lowercased
  *     `assistant:`/`user:` prefix.
  *  9. case-insensitive order-preserving dedup (first occurrence
  *     keeps its original case), then the maxExpandedQueries=8 cap
  *     (:179; dedup happens before the cap so duplicates never
  *     consume slots).
  *
  * `FilterSearchQueries` (:267-274) falls back to the single
  * resolvedQuery when EVERYTHING filtered and the resolved query is
  * non-empty.
  *
  * Rune semantics are code points (Go []rune) — Spark/DuckDB
  * length()/substr() agree on the composed BMP corpus (pinned);
  * strings.Fields / TrimSpace are Unicode-space-aware where the
  * re-expression splits ASCII whitespace — ASCII-delimited composition,
  * the standing pin.
  *
  * Scale: every rule is a per-line stateless projection (the garbage
  * check is four bounded HOF folds); dedup and the cap are two
  * windows over the per-SET line frame (a set is one LLM response,
  * ≤ dozens of lines); the fallback is one anti-join against the set
  * dimension. Nothing touches corpus-wide state.
  */
object QueryFilters {

  val MinQueryRuneLen = 3
  val MaxQueryRuneLen = 200
  val MaxExpandedQueries = 8

  /** instructionLeakExact (:238-245), verbatim. */
  val InstructionLeakExact: Seq[String] = Seq(
    "japanese queries and english queries must be translated to each other",
    "japanese queries first, then english queries",
    "output only the generated queries, one per line",
    "do not add numbering, bullets, labels, or explanations",
    "output japanese queries first",
    "one query per line")

  /** instructionMetaWords (:249-261), verbatim. */
  val InstructionMetaWords: Seq[String] = Seq(
    "queries", "generate", "variations", "translate", "numbering",
    "bullets", "labels", "explanations", "output", "exactly", "requirements")

  /** queryExtractionLabels (:302-309), verbatim (lowercased). */
  val QueryExtractionLabels: Seq[String] = Seq(
    "generated query", "query", "final query", "translated query",
    "search query", "output query")

  private val BoldLabelRe =
    "^\\*{1,2}\\s*([A-Za-z][A-Za-z \\-]{0,40}?)\\s*\\*{0,2}:\\s*\\*{0,2}\\s*(.*)$"

  /** stripMarkdownScaffolding → (q, keep): NULL when dropped. */
  def stripScaffolding(raw: Column): Column = {
    val t = trim(raw)
    val isLabel = t.rlike(BoldLabelRe)
    val label = lower(trim(regexp_extract(t, BoldLabelRe, 1)))
    val content = trim(regexp_replace(
      regexp_replace(trim(regexp_extract(t, BoldLabelRe, 2)),
        "^[*\"'“”]+", ""), "[*\"'“”]+$", ""))
    when(t === "", lit(null))
      .when(t.rlike("^#{1,6}\\s"), lit(null))
      .when(t.rlike("^[-=*_]{3,}$"), lit(null))
      .when(isLabel && !label.isin(QueryExtractionLabels: _*), lit(null))
      .when(isLabel && content === "", lit(null))
      .when(isLabel, content)
      .otherwise(t)
  }

  /** isGarbagePattern (:395-421) as four bounded prefix-repetition
    * folds.
    */
  def isGarbage(q: Column): Column = {
    val len = length(q)
    val checks = (1 to 4).map { l =>
      val pat = substring(q, 1, l)
      val hits = transform(sequence(lit(1), (len / l).cast("int")),
        k => substring(q, ((k - 1) * l + 1).cast("int"), lit(l)) === pat)
      val firstMiss = array_position(hits, false)
      val reps = when(firstMiss === 0, size(hits)).otherwise(firstMiss - 1)
      len >= l * 3 && reps >= 3 && reps * l * 3 >= len * 2
    }
    (length(q) >= 6) && checks.reduce(_ || _)
  }

  /** isRomanizedJapanese (:423-454). */
  def isRomanized(q: Column): Column = {
    val hasCjk = q.rlike("[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF]")
    val hasMacron = q.rlike("[ōūāēīŌŪĀĒĪ]")
    val hyphWords = size(filter(split(q, "\\s+"),
      w => regexp_replace(regexp_replace(w, "^-+", ""), "-+$", "").contains("-")))
    !hasCjk && (hasMacron || hyphWords >= 2)
  }

  /** isInstructionLeak (:368-393). */
  def isInstructionLeak(q: Column): Column = {
    val norm = regexp_replace(lower(trim(q)), "\\.+$", "")
    val exact = norm.isin(InstructionLeakExact: _*)
    val contained = InstructionLeakExact.filter(_.length > 20)
      .map(p => norm.contains(p)).reduce(_ || _)
    val metaCount = size(filter(split(norm, "\\s+"),
      w => w.isin(InstructionMetaWords: _*)))
    exact || contained || metaCount >= 3
  }

  /** The full ladder over (set_id, line_no, raw) lines + a per-set
    * resolved query → (set_id, out_ord, query).
    */
  def filterQueries(lines: DataFrame, resolved: DataFrame): DataFrame = {
    // materialize the cleaned line ONCE: the scaffolding regex chain
    // otherwise gets substituted into every downstream predicate AND
    // into the garbage fold's per-element lambda body (~400 elements ×
    // 11 regexes per row — measured 20 s at sf0.1; the is01/hm02
    // CollapseProject lesson), while the lambdas over a materialized
    // attribute read a row value
    val cleaned = lines
      .withColumn("q", stripScaffolding(col("raw")))
      .filter(col("q").isNotNull)
      .select(col("set_id"), col("line_no"), col("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = cleaned
      .filter(length(col("q")).between(MinQueryRuneLen, MaxQueryRuneLen))
      .filter(!isGarbage(col("q")))
      .filter(!isRomanized(col("q")))
      .filter(!trim(col("q")).rlike("^\\d{4}[-/.]\\d{1,2}[-/.]\\d{1,2}$"))
      .filter(!isInstructionLeak(col("q")))
      .filter(!(col("q").startsWith("<") && col("q").contains(">")))
      .filter(!(lower(col("q")).startsWith("assistant:") ||
        lower(col("q")).startsWith("user:")))
    val deduped = kept
      .withColumn("dup_rn", row_number().over(
        Window.partitionBy(col("set_id"), lower(col("q"))).orderBy("line_no")))
      .filter(col("dup_rn") === 1)
      .withColumn("out_ord", row_number().over(
        Window.partitionBy("set_id").orderBy("line_no")))
      .filter(col("out_ord") <= MaxExpandedQueries)
      .select(col("set_id"), col("out_ord"), col("q").as("query"))
      // referenced twice (output + the fallback anti-join) — keep the
      // ≤8-rows-per-set result instead of re-running both windows
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fallback = resolved
      .join(deduped.select("set_id").distinct(), Seq("set_id"), "left_anti")
      .filter(col("resolved") =!= "")
      .select(col("set_id"), lit(1).as("out_ord"), col("resolved").as("query"))
    deduped.union(fallback)
  }

  /** rag13 adapter: composed LLM expansion lines per document (the
    * line battery exercises every rule; doc_id % 7 == 0 sets keep only
    * droppable lines → the resolvedQuery fallback path on real rows).
    */
  def rag13(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id").as("set_id"))
    val tok = (col("set_id") % 50).cast("string")
    val dropOnly = col("set_id") % 7 === 0
    val droppable = array(
      lit("### Japanese (1)"),
      lit("---"),
      concat(lit("**Query Generation Strategy:** commentary "), tok),
      lit("ai"),
      lit(":):):):):):)"),
      lit("Sei-sai naiyō Rosia"),
      lit("sei-sai roshi-a summary"),
      lit("2026-04-07"),
      lit("output only the generated queries, one per line"),
      lit("generate exactly five output variations with labels"),
      lit("<input>leaked tag"),
      lit("assistant: Hello!"),
      concat(lit("L"), repeat(lit("x"), 200)))
    val keepers = array(
      concat(lit("**Generated Query:** \"spark tuning "), tok, lit("\"")),
      concat(lit("Spark Tuning "), tok), // case-insensitive dup of ^
      lit("日本語のクエリ検索"),
      concat(lit("extra query one "), tok),
      concat(lit("extra query two "), tok),
      concat(lit("extra query three "), tok),
      concat(lit("extra query four "), tok),
      concat(lit("extra query five "), tok),
      concat(lit("extra query six "), tok),
      concat(lit("extra query seven "), tok),
      concat(lit("extra query eight "), tok)) // 10 distinct keeps -> cap 8
    val lines = d
      .withColumn("lines", when(dropOnly, droppable)
        .otherwise(concat(droppable, keepers)))
      .select(col("set_id"), posexplode(col("lines")).as(Seq("line_no", "raw")))
    val resolved = d.select(col("set_id"),
      concat(lit("resolved "), col("set_id").cast("string")).as("resolved"))
    filterQueries(lines, resolved)
  }

  /** DuckDB twin of [[rag13]]. The garbage fold mirrors per pattern
    * length; list_position(NULL when absent) supplies the
    * first-mismatch index; `//` keeps the division integral.
    */
  val rag13OracleSql: String = {
    val boldRe = """^\*{1,2}\s*([A-Za-z][A-Za-z \-]{0,40}?)\s*\*{0,2}:\s*\*{0,2}\s*(.*)$"""
    // list_position yields 0 (this build) or NULL (older) when absent
    def reps(l: Int) =
      s"""(CASE WHEN coalesce(list_position(list_transform(range(1, (length(q) // $l) + 1),
            k -> substr(q, (k - 1) * $l + 1, $l) = substr(q, 1, $l)), false), 0) = 0
          THEN length(q) // $l
          ELSE list_position(list_transform(range(1, (length(q) // $l) + 1),
            k -> substr(q, (k - 1) * $l + 1, $l) = substr(q, 1, $l)), false) - 1 END)"""
    val garbage = (1 to 4).map(l =>
      s"(length(q) >= ${l * 3} AND ${reps(l)} >= 3 AND ${reps(l)} * ${l * 3} >= length(q) * 2)")
      .mkString("(length(q) >= 6 AND (", " OR ", "))")
    val exactList = InstructionLeakExact.map(p => s"'$p'").mkString(", ")
    val containedChecks = InstructionLeakExact.filter(_.length > 20)
      .map(p => s"contains(norm, '$p')").mkString(" OR ")
    val metaList = InstructionMetaWords.map(w => s"'$w'").mkString(", ")
    val labelList = QueryExtractionLabels.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (SELECT doc_id AS set_id FROM documents),
       linesets AS (SELECT set_id,
           ['### Japanese (1)', '---',
            '**Query Generation Strategy:** commentary ' || (set_id % 50),
            'ai', ':):):):):):)',
            'Sei-sai naiyō Rosia', 'sei-sai roshi-a summary',
            '2026-04-07',
            'output only the generated queries, one per line',
            'generate exactly five output variations with labels',
            '<input>leaked tag', 'assistant: Hello!',
            'L' || repeat('x', 200)]
           || CASE WHEN set_id % 7 = 0 THEN []::VARCHAR[]
              ELSE ['**Generated Query:** "spark tuning ' || (set_id % 50) || '"',
                    'Spark Tuning ' || (set_id % 50),
                    '日本語のクエリ検索',
                    'extra query one ' || (set_id % 50),
                    'extra query two ' || (set_id % 50),
                    'extra query three ' || (set_id % 50),
                    'extra query four ' || (set_id % 50),
                    'extra query five ' || (set_id % 50),
                    'extra query six ' || (set_id % 50),
                    'extra query seven ' || (set_id % 50),
                    'extra query eight ' || (set_id % 50)] END AS ls
         FROM d),
       lines0 AS (SELECT set_id, generate_subscripts(ls, 1) AS line_no, unnest(ls) AS raw
         FROM linesets),
       scaff AS (SELECT set_id, line_no, trim(raw) AS t,
           regexp_matches(trim(raw), '$boldRe') AS is_label,
           lower(trim(regexp_extract(trim(raw), '$boldRe', 1))) AS label,
           trim(regexp_replace(regexp_replace(trim(regexp_extract(trim(raw), '$boldRe', 2)),
             '^[*"''“”]+', ''), '[*"''“”]+$$', '')) AS content
         FROM lines0),
       cleaned AS (SELECT set_id, line_no,
           CASE WHEN t = '' THEN NULL
                WHEN regexp_matches(t, '^#{1,6}\\s') THEN NULL
                WHEN regexp_matches(t, '^[-=*_]{3,}$$') THEN NULL
                WHEN is_label AND label NOT IN ($labelList) THEN NULL
                WHEN is_label AND content = '' THEN NULL
                WHEN is_label THEN content
                ELSE t END AS q
         FROM scaff),
       kept AS (SELECT set_id, line_no, q,
           regexp_replace(lower(trim(q)), '\\.+$$', '') AS norm
         FROM cleaned
         WHERE q IS NOT NULL
           AND length(q) BETWEEN 3 AND 200
           AND NOT $garbage
           AND NOT (NOT regexp_matches(q, '[\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{4E00}-\\x{9FFF}]')
                    AND (regexp_matches(q, '[ōūāēīŌŪĀĒĪ]')
                         OR len(list_filter(regexp_split_to_array(q, '\\s+'),
                             w -> contains(regexp_replace(regexp_replace(w, '^-+', ''), '-+$$', ''), '-'))) >= 2))
           AND NOT regexp_matches(trim(q), '^\\d{4}[-/.]\\d{1,2}[-/.]\\d{1,2}$$')
           AND NOT (q LIKE '<%' AND contains(q, '>'))
           AND NOT (lower(q) LIKE 'assistant:%' OR lower(q) LIKE 'user:%')),
       leakless AS (SELECT * FROM kept
         WHERE NOT (norm IN ($exactList)
                    OR $containedChecks
                    OR len(list_filter(regexp_split_to_array(norm, '\\s+'),
                        w -> w IN ($metaList))) >= 3)),
       deduped AS (SELECT * FROM (
           SELECT set_id, line_no, q,
                  row_number() OVER (PARTITION BY set_id, lower(q) ORDER BY line_no) AS dup_rn
           FROM leakless) WHERE dup_rn = 1),
       capped AS (SELECT * FROM (
           SELECT set_id, q, row_number() OVER (PARTITION BY set_id ORDER BY line_no) AS out_ord
           FROM deduped) WHERE out_ord <= 8),
       fb AS (SELECT set_id, 1 AS out_ord, 'resolved ' || set_id AS query
         FROM d WHERE set_id NOT IN (SELECT DISTINCT set_id FROM capped))
       SELECT set_id, out_ord, q AS query FROM capped
       UNION ALL SELECT * FROM fb"""
  }
}
