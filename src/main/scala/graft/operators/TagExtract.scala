package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** ex01/cc01: the tag-extraction orchestrator's deterministic residue
  * and the cascade gate it feeds — tag-generator
  * tag_extractor/extract.py + tag_generator/cascade.py.
  *
  * ex01 — TagExtractor.extract_tags_with_metrics (:117-201), the
  * deterministic spine around the env-blocked KeyBERT/fugashi
  * extraction:
  *
  *  - _truncate_content (:295-319): title hard-cut at 1000; content
  *    over max_content_length (100000) cut at the cut point, then the
  *    LAST SENTENCE END inside the cut (max of rfind('.'), '!', '?')
  *    wins when it lands past 80% of the limit — content[:end+1] —
  *    else the hard cut stands. Pinned per terminator. The hard title
  *    cut means an over-long title never reaches the sanitizer's
  *    'Title too long' rejection — pinned.
  *  - sanitization: is01's exact pipeline (InputSanitize.sanitizeStaged
  *    — the same object the reference instantiates at :100); invalid →
  *    the empty outcome (:139-149): language 'und', confidence 0.0,
  *    tag_count 0, inference_ms 0.0, sanitized_length 0.
  *  - raw_text = sanitized 'title\ncontent' (:152); len < min_text_length
  *    (10, config.py) → the too-short outcome (:157-167) — same empty
  *    shape but sanitized_length KEPT (the reference passes the real
  *    length there, unlike the invalid path — pinned).
  *  - _detect_language (:353): the langdetect runtime, env-blocked —
  *    language rides in composed (tx05's heuristic stand-in is the
  *    mapped class; the lingua/langdetect ledger entry covers it).
  *  - _run_extraction (:217): KeyBERT + fugashi, env-blocked — the
  *    composed outcome supplies tag_count ((doc_id·7) % 13, the
  *    pl01/fo01 env-blocked-input precedent).
  *  - _compute_confidence (:207-215): 0.0 without tags, else
  *    0.7·min(tag_count/top_keywords, 1) + 0.3·min(sanitized_length/1200, 1)
  *    rounded to 3 dp (top_keywords = 10). Re-expressed as the exact
  *    integer rational (1400·min(tc,10) + 5·min(slen,1200)) / 20000
  *    through microRatio — cross-engine exact; CPython's round() on
  *    the fp SUM can differ only when that sum's dust lands a
  *    half-milli boundary (min(slen,1200) ≡ 2 mod 4), where the
  *    HALF-UP convention here is pinned (the ml08 int()-quirk
  *    precedent: convention documented, not fp-simulated).
  *  - inference_ms is wall-clock (:179) — composed as
  *    ((doc_id·31) % 400)/2 half-milliseconds so the cascade's 180 ms
  *    threshold is exercised on exact doubles; the two empty-outcome
  *    paths pin it to 0.0 exactly as the reference does.
  *
  * cc01 — CascadeController.evaluate (cascade.py:56-105), the
  * cost-sensitive cascade gate over extraction outcomes. STATEFUL and
  * ORDER-DEPENDENT: total_evaluated increments first, the pre-decision
  * refine ratio is refine_candidates/total (including the current
  * article), and the budget cap flips a would-refine decision to
  * 'refine_ratio_budget_capped' once that ratio reaches
  * max_refine_ratio — so a decision depends on every earlier one. The
  * reference runs ONE controller per worker process; re-expressed as a
  * sequential fold PER WORKER KEY (doc_id % 8 composes the process
  * assignment), the titleLeaderClusters HOF-fold class:
  *
  *  - reasons in evaluation order (:72-80): confidence <
  *    confidence_threshold (0.72) → low_confidence; tag_count <
  *    min_tags_for_confident_exit (5) → insufficient_tag_coverage;
  *    inference_ms > inference_ms_threshold (180.0) → slow_inference;
  *    else high_confidence_exit.
  *  - the cap (:82-84): needs_refine && rc·20 ≥ 7·total → capped (the
  *    0.35 gate cross-multiplied; at the exact 7/20 boundary the f64
  *    `>=` agrees with the integer gate — 0.35's double sits BELOW
  *    7/20, and the correctly-rounded quotient of small ints lands on
  *    that same double).
  *  - gates on exact integer mirrors: confidence·1000 (ex01 emits
  *    exact milli-values), inference_ms·2 (exact half-ms), tag_count.
  *  - as_dict rounding (:36-44): refine_ratio = round(rc/total, 3) —
  *    implemented as EXACT INTEGER round-half-even (q + parity at
  *    2r == den), which equals CPython's round bit-for-bit here: the
  *    quotient of small ints is correctly rounded, dyadic ratios
  *    (1/16 → 62.5 milli) tie-break to even exactly like Python, and
  *    non-dyadic ratios never tie. confidence/inference_ms re-round
  *    to 3/1 dp are identities on ex01's already-exact values.
  *
  * Scale: ex01 is one stateless scan (the is01 projection plus a few
  * when-chains). cc01's fold is serial PER WORKER by the reference's
  * own semantics (an in-process mutex-guarded counter); the worker
  * key is the unit of parallelism, matching production where each
  * process owns its budget; the collected per-worker list is bounded
  * by per-process throughput.
  */
object TagExtract {

  val MaxContentLength = 100000
  val MinTextLength = 10
  val TopKeywords = 10
  val ConfidenceThresholdMillis = 720L
  val MinTagsForConfidentExit = 5L
  val InferenceMsThresholdHalfUnits = 360L // 180.0 ms in half-ms
  val MaxRefineRatio20ths = 7L             // 0.35 = 7/20
  val Workers = 8

  /** Composed raw inputs: (doc_id, title, content) — no urls on this
    * path (the orchestrator calls sanitize(title, content)).
    */
  def composeRaw(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val id = col("doc_id")
    // the 100KB truncation classes key on %101 — rare enough that the
    // sanitize regex chain over them stays a corpus-cost footnote
    // (keyed %13 they were 23% of rows = ~115 MB of synthetic body at
    // sf0.1 and the 8-pass regex chain dominated the whole query),
    // still populated at every SF (sf0.001 has 500 docs)
    val mBig = id % 101
    val m = id % 13
    val title =
      when(m === 3, lit((1 to 23)
        .map(i => f"Headline segment $i%02d for the truncation pin. ")
        .mkString.take(1005)))
        .when(m === 4, lit("T4"))
        .otherwise(concat(lit("Article "), id.cast("string")))
    val content =
      when(mBig === 0, rpad(col("text"), 100500, "y"))
        .when(mBig === 1, concat(rpad(col("text"), 99990, "w"),
          lit(". Tail sentence continues beyond the hundred thousand char cut" +
            " boundary for a while longer to cross it safely")))
        .when(mBig === 2, concat(rpad(col("text"), 99980, "q"),
          lit("? More tail text after the question mark runs well past the" +
            " boundary so the rfind pick is exercised properly here")))
        .when(m === 4, lit("x"))
        .when(m === 5, concat(lit("ctl"), lit("\u0003"), col("text")))
        .otherwise(col("text"))
    d.select(id, col("lang"), title.as("title"), content.as("content"))
  }

  /** _truncate_content over (title, content): returns the frame with
    * title/content replaced and the truncation telemetry columns.
    */
  def truncateOn(raw: DataFrame, maxContent: Int = MaxContentLength): DataFrame = {
    // ev33 explode barrier: materialize the composed content, the
    // over-length flag and ONE reversed cut, so the three rfinds and
    // the final cut read attributes instead of re-inlining the
    // composition + reverse per reference
    val others = raw.columns.filterNot(Set("title", "content")).map(col).toSeq
    val b = raw
      .select(others :+ explode(array(struct(
        col("title").as("t0"),
        col("content").as("c0"),
        (length(col("title")) > 1000).as("title_truncated"),
        (length(col("content")) > maxContent).as("over"),
        reverse(substring(col("content"), 1, maxContent)).as("rcut")))).as("x"): _*)
      .select(others :+ col("x.t0").as("t0") :+ col("x.c0").as("c0")
        :+ col("x.title_truncated").as("title_truncated")
        :+ col("x.over").as("over") :+ col("x.rcut").as("rcut"): _*)
    // Python rfind over the CUT string; -1 when absent. 80% gate is
    // on the 0-based index: last_sentence_end > max*0.8
    def rfind(ch: String): Column =
      when(instr(col("rcut"), ch) > 0, lit(maxContent) - instr(col("rcut"), ch))
        .otherwise(lit(-1))
    val lastEnd = greatest(rfind("."), rfind("!"), rfind("?"))
    val cutAt = col("over") && lastEnd > lit(maxContent) * 0.8
    b.select(others
      :+ col("title_truncated")
      :+ when(col("title_truncated"), substring(col("t0"), 1, 1000))
        .otherwise(col("t0")).as("title")
      :+ col("over").as("content_truncated")
      :+ cutAt.as("cut_at_sentence")
      :+ when(cutAt, col("c0").substr(lit(1), (lastEnd + 1).cast("int")))
        .when(col("over"), substring(col("c0"), 1, maxContent))
        .otherwise(col("c0")).as("content"): _*)
  }

  /** ex01 over any (doc_id, lang, title, content) frame. */
  def extractOn(raw: DataFrame): DataFrame = {
    val truncated = truncateOn(raw)
      .withColumn("url", lit(null).cast("string"))
    val staged0 = InputSanitize.sanitizeStaged(truncated)
    // one more ev33 barrier: `invalid` folds the whole suspicious
    // tree (token split + three char-class scans) and feeds EIGHT
    // output columns — without the barrier CollapseProject re-inlines
    // that tree per column
    val staged = staged0.select(staged0.columns.map(col).toSeq
      :+ explode(array(struct(
        (col("v1").isNotNull || col("suspicious")).as("invalid"),
        (length(trim(concat(col("st"), lit("\n"), col("sc")))) < MinTextLength)
          .as("too_short"),
        (length(col("st")) + length(col("sc"))).cast("long").as("slen")))).as("z"): _*)
      .select(col("*"), col("z.invalid").as("invalid"),
        col("z.too_short").as("too_short"), col("z.slen").as("slen0"))
    val invalid = col("invalid")
    val slen = col("slen0")
    val tooShort = col("too_short")
    val tagCount = (col("doc_id") * 7) % 13
    val k = lit(1400L) * least(tagCount, lit(10L)) +
      lit(5L) * least(slen, lit(1200L))
    staged.select(
      col("doc_id"),
      when(invalid || tooShort, "und").otherwise(col("lang")).as("language"),
      when(invalid, "invalid_input").when(tooShort, "too_short")
        .otherwise("ok").as("gate"),
      col("title_truncated"),
      col("content_truncated"),
      col("cut_at_sentence"),
      length(col("content")).cast("long").as("content_length"),
      when(invalid || tooShort, 0L).otherwise(tagCount).cast("long").as("tag_count"),
      when(invalid, 0L).otherwise(slen).as("sanitized_length"),
      when(invalid || tooShort || tagCount === 0, 0.0)
        .otherwise(microRatio(k, lit(20000L), 3)).as("confidence"),
      when(invalid || tooShort, 0.0)
        .otherwise(((col("doc_id") * 31) % 400).cast("double") / 2.0).as("inference_ms"))
      // hash exchange below the global sort: without it the range
      // partitioner's sampling pass re-executes the ENTIRE sanitize
      // regex pipeline a second time (measured: 12.6 s with the bare
      // orderBy vs 6.8 s for the unsorted pipeline at sf0.1; the
      // barrier makes the sampling read materialized shuffle output —
      // one extra shuffle of output-sized rows instead of a full
      // recompute; guide §2.4)
      .repartition(col("doc_id"))
      .orderBy("doc_id")
  }

  def ex01(s: SparkSession, dir: String): DataFrame =
    extractOn(composeRaw(s, dir))

  /** cc01 over any frame carrying (doc_id, confidence, tag_count,
    * inference_ms): the per-worker sequential cascade fold.
    */
  def cascadeOn(outcomes: DataFrame): DataFrame = {
    // the output doubles ride the collected struct so the upstream
    // frame is consumed exactly ONCE — the previous form re-joined
    // `outcomes` at the end, which re-executed the entire upstream
    // pipeline (for cc01, ex01's whole sanitize regex chain) a second
    // time (measured: the join recompute + the struct-accumulating
    // fold were ~half of cc01's 12.2 s at sf0.1; guide §1/§2.4)
    val grouped = outcomes
      .withColumn("worker_id", col("doc_id") % Workers)
      .withColumn("conf_m", round(col("confidence") * 1000, 0).cast("long"))
      .withColumn("ims2", round(col("inference_ms") * 2, 0).cast("long"))
      .groupBy("worker_id")
      .agg(array_sort(collect_list(struct(
        col("doc_id").as("id"), col("conf_m").as("cm"),
        col("tag_count").as("tc"), col("ims2").as("i2"),
        col("confidence").as("conf"),
        col("inference_ms").as("ims")))).as("arr"))
    // the stateful walk folds to the rc SEQUENCE only — st = (n, rc,
    // rc-after-per-step). The old fold accumulated the full output
    // struct (id, needs, reason, rc_after) per step, so every step
    // copied the whole out array (Θ(n²) struct+string copies per
    // worker); the rc sequence is the only genuinely sequential state,
    // and needs/reason are pure functions of (x, rc_before, seq)
    // reconstructed positionally below.
    val cond = s"""(x.cm < $ConfidenceThresholdMillis OR x.tc < $MinTagsForConfidentExit
                    OR x.i2 > $InferenceMsThresholdHalfUnits)"""
    val folded = grouped.withColumn("rcs", expr(
      s"""aggregate(arr,
           named_struct('n', 0L, 'rc', 0L,
             'out', cast(array() as array<bigint>)),
           (st, x) -> named_struct(
             'n', st.n + 1L,
             'rc', st.rc + CASE WHEN $cond
                 AND NOT (st.rc * 20L >= $MaxRefineRatio20ths * (st.n + 1L))
               THEN 1L ELSE 0L END,
             'out', concat(st.out, array(st.rc + CASE WHEN $cond
                 AND NOT (st.rc * 20L >= $MaxRefineRatio20ths * (st.n + 1L))
               THEN 1L ELSE 0L END))),
           st -> st.out)"""))
    // zip each element with its rc_after; rc_before = previous entry
    // (rc only ever moves on a needs_refine step, so needs ≡ rc moved)
    val rows = folded
      .select(col("worker_id"),
        posexplode(expr("arrays_zip(arr, rcs)")).as(Seq("pos", "z")),
        col("rcs"))
      .select(col("z.arr.id").as("doc_id"), col("worker_id"),
        (col("pos") + 1).cast("long").as("seq"),
        col("z.arr.cm").as("cm"), col("z.arr.tc").as("tc"),
        col("z.arr.i2").as("i2"),
        col("z.arr.conf").as("confidence"),
        col("z.arr.tc").as("tag_count"),
        col("z.arr.ims").as("inference_ms"),
        col("z.rcs").as("rc_after"),
        expr("IF(pos = 0, 0L, rcs[pos - 1])").as("rc_before"))
    val condC = col("cm") < ConfidenceThresholdMillis ||
      col("tc") < MinTagsForConfidentExit ||
      col("i2") > InferenceMsThresholdHalfUnits
    val decided = rows.select(
      col("doc_id"), col("worker_id"), col("seq"),
      (col("rc_after") =!= col("rc_before")).as("needs_refine"),
      when(!condC, "high_confidence_exit")
        .when(col("rc_before") * 20 >= col("seq") * MaxRefineRatio20ths,
          "refine_ratio_budget_capped")
        .when(col("cm") < ConfidenceThresholdMillis, "low_confidence")
        .when(col("tc") < MinTagsForConfidentExit, "insufficient_tag_coverage")
        .otherwise("slow_inference").as("reason"),
      col("confidence"), col("tag_count"), col("inference_ms"),
      col("rc_after"))
    // refine_ratio = round(rc/seq, 3) with CPython's exact semantics:
    // integer round-half-even (q, r2 = 1000·rc divmod seq; ties only
    // at dyadic ratios, broken to even like Python's round)
    val q = expr("(rc_after * 1000) div seq")
    val r2 = col("rc_after") * 1000 % col("seq")
    val millis = q + when(r2 * 2 > col("seq"), 1L)
      .when(r2 * 2 === col("seq"), q % 2).otherwise(0L)
    decided
      .select(col("doc_id"), col("worker_id"), col("seq"),
        col("needs_refine"), col("reason"),
        col("confidence"), col("tag_count"), col("inference_ms"),
        (millis / 1000.0).as("refine_ratio"))
      // hash exchange below the global sort: the range partitioner's
      // sampling pass re-executes the sort's child subtree; behind a
      // materialized shuffle stage that re-execution reads shuffle
      // output instead of re-running the fold (guide §2.4)
      .repartition(col("doc_id"))
      .orderBy("doc_id")
  }

  def cc01(s: SparkSession, dir: String): DataFrame =
    cascadeOn(ex01(s, dir))

  // ---- DuckDB oracles (generated from the same constants; the
  // sanitize chain and regex classes come from InputSanitize so the
  // two operators cannot drift) ----

  import InputSanitize.{sqlLit, sanitizeSql, CtrlSql, CjkSql}

  private def rfindSql(ch: String): String =
    s"""CASE WHEN strpos(reverse(substr(content,1,$MaxContentLength)), '$ch') > 0
         THEN $MaxContentLength - strpos(reverse(substr(content,1,$MaxContentLength)), '$ch')
         ELSE -1 END"""

  val ex01OracleSql: String =
    s"""WITH raw AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % 13 = 3 THEN ${sqlLit((1 to 23)
        .map(i => f"Headline segment $i%02d for the truncation pin. ")
        .mkString.take(1005))}
         WHEN doc_id % 13 = 4 THEN 'T4'
         ELSE 'Article ' || CAST(doc_id AS VARCHAR) END AS title,
    CASE WHEN doc_id % 101 = 0 THEN rpad(text, 100500, 'y')
         WHEN doc_id % 101 = 1 THEN rpad(text, 99990, 'w') || ${sqlLit(
           ". Tail sentence continues beyond the hundred thousand char cut" +
           " boundary for a while longer to cross it safely")}
         WHEN doc_id % 101 = 2 THEN rpad(text, 99980, 'q') || ${sqlLit(
           "? More tail text after the question mark runs well past the" +
           " boundary so the rfind pick is exercised properly here")}
         WHEN doc_id % 13 = 4 THEN 'x'
         WHEN doc_id % 13 = 5 THEN 'ctl' || chr(3) || text
         ELSE text END AS content
  FROM documents),
tr AS (
  SELECT doc_id, lang,
    length(title) > 1000 AS title_truncated,
    CASE WHEN length(title) > 1000 THEN substr(title, 1, 1000) ELSE title END AS title,
    length(content) > $MaxContentLength AS content_truncated,
    CASE WHEN length(content) > $MaxContentLength
         THEN greatest(${rfindSql(".")}, ${rfindSql("!")}, ${rfindSql("?")})
         ELSE -1 END AS last_end,
    content AS content0
  FROM raw),
tc AS (
  SELECT doc_id, lang, title_truncated, title, content_truncated,
    content_truncated AND last_end > $MaxContentLength * 0.8 AS cut_at_sentence,
    CASE WHEN content_truncated AND last_end > $MaxContentLength * 0.8
           THEN substr(content0, 1, CAST(last_end + 1 AS INTEGER))
         WHEN content_truncated THEN substr(content0, 1, $MaxContentLength)
         ELSE content0 END AS content
  FROM tr),
v AS (
  SELECT *,
    CASE WHEN trim(title) = '' THEN 'x'
         WHEN length(title) > 1000 THEN 'x'
         WHEN trim(content) = '' THEN 'x'
         WHEN length(content) > $MaxContentLength THEN 'x'
         WHEN regexp_matches(title, '$CtrlSql') THEN 'x'
         WHEN regexp_matches(content, '$CtrlSql') THEN 'x'
    END AS v1
  FROM tc),
st AS (
  SELECT *,
    CASE WHEN v1 IS NULL THEN ${sanitizeSql("title")} END AS stt,
    CASE WHEN v1 IS NULL THEN ${sanitizeSql("content")} END AS sc
  FROM v),
sec AS (SELECT *, stt || ' ' || sc AS combined FROM st),
mm AS (
  SELECT *,
    CAST(length(combined) AS BIGINT) AS clen,
    CAST(len(list_distinct(list_filter(string_split_regex(lower(combined), '\\s+'), x -> x <> ''))) AS BIGINT) AS n_distinct,
    CAST(len(list_filter(string_split_regex(lower(combined), '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks,
    CAST(length(combined) - length(regexp_replace(combined, '[$CjkSql]', '', 'g')) AS BIGINT) AS n_cjk,
    CAST(length(regexp_replace(combined, '[\\pL\\pN\\s]', '', 'g')) AS BIGINT) AS n_special,
    CAST(length(combined) - length(regexp_replace(combined, '\\p{Lu}', '', 'g')) AS BIGINT) AS n_upper
  FROM sec),
g AS (
  SELECT *,
    (v1 IS NOT NULL OR n_distinct * 10 < n_toks OR
      (NOT (n_cjk * 10 > clen) AND (n_special * 10 > clen * 3 OR n_upper * 10 > clen * 7))) AS invalid
  FROM mm),
fin AS (
  SELECT *,
    CAST(length(stt) + length(sc) AS BIGINT) AS slen,
    length(trim(stt || chr(10) || sc)) < $MinTextLength AS too_short,
    (doc_id * 7) % 13 AS tagc
  FROM g)
SELECT doc_id,
  CASE WHEN invalid OR too_short THEN 'und' ELSE lang END AS language,
  CASE WHEN invalid THEN 'invalid_input' WHEN too_short THEN 'too_short' ELSE 'ok' END AS gate,
  title_truncated, content_truncated, cut_at_sentence,
  CAST(length(content) AS BIGINT) AS content_length,
  CAST(CASE WHEN invalid OR too_short THEN 0 ELSE tagc END AS BIGINT) AS tag_count,
  CAST(CASE WHEN invalid THEN 0 ELSE slen END AS BIGINT) AS sanitized_length,
  CASE WHEN invalid OR too_short OR tagc = 0 THEN 0.0
       ELSE CAST(round((1400 * least(tagc, 10) + 5 * least(slen, 1200)) * 1e3 / 20000) AS BIGINT) / 1e3
  END AS confidence,
  CASE WHEN invalid OR too_short THEN 0.0
       ELSE CAST((doc_id * 31) % 400 AS DOUBLE) / 2.0 END AS inference_ms
FROM fin ORDER BY doc_id"""

  val cc01OracleSql: String =
    s"""WITH ex AS MATERIALIZED ($ex01OracleSql),
o AS MATERIALIZED (
  SELECT doc_id, doc_id % $Workers AS worker_id,
    row_number() OVER (PARTITION BY doc_id % $Workers ORDER BY doc_id) AS seq,
    CAST(round(confidence * 1000) AS BIGINT) AS cm,
    tag_count AS tc,
    CAST(round(inference_ms * 2) AS BIGINT) AS i2,
    confidence, tag_count, inference_ms
  FROM ex),
walk AS MATERIALIZED (
  WITH RECURSIVE w AS (
    SELECT worker_id, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS rc
    FROM (SELECT DISTINCT worker_id FROM o)
    UNION ALL
    SELECT w.worker_id, w.i + 1,
      w.rc + CASE WHEN (o.cm < $ConfidenceThresholdMillis OR o.tc < $MinTagsForConfidentExit
                          OR o.i2 > $InferenceMsThresholdHalfUnits)
                    AND NOT (w.rc * 20 >= $MaxRefineRatio20ths * (w.i + 1))
              THEN 1 ELSE 0 END
    FROM w JOIN o ON o.worker_id = w.worker_id AND o.seq = w.i + 1)
  SELECT * FROM w),
dec AS (
  SELECT o.doc_id, o.worker_id, o.seq,
    (o.cm < $ConfidenceThresholdMillis OR o.tc < $MinTagsForConfidentExit
       OR o.i2 > $InferenceMsThresholdHalfUnits)
      AND NOT (w.rc * 20 >= $MaxRefineRatio20ths * o.seq) AS needs_refine,
    CASE WHEN o.cm >= $ConfidenceThresholdMillis AND o.tc >= $MinTagsForConfidentExit
              AND o.i2 <= $InferenceMsThresholdHalfUnits THEN 'high_confidence_exit'
         WHEN w.rc * 20 >= $MaxRefineRatio20ths * o.seq THEN 'refine_ratio_budget_capped'
         WHEN o.cm < $ConfidenceThresholdMillis THEN 'low_confidence'
         WHEN o.tc < $MinTagsForConfidentExit THEN 'insufficient_tag_coverage'
         ELSE 'slow_inference' END AS reason,
    o.confidence, o.tag_count, o.inference_ms,
    w2.rc AS rc_after
  FROM o
  JOIN walk w ON w.worker_id = o.worker_id AND w.i = o.seq - 1
  JOIN walk w2 ON w2.worker_id = o.worker_id AND w2.i = o.seq)
SELECT doc_id, worker_id, seq, needs_refine, reason, confidence, tag_count, inference_ms,
  ((rc_after * 1000) // seq
   + CASE WHEN (rc_after * 1000) % seq * 2 > seq THEN 1
          WHEN (rc_after * 1000) % seq * 2 = seq THEN ((rc_after * 1000) // seq) % 2
          ELSE 0 END) / 1000.0 AS refine_ratio
FROM dec ORDER BY doc_id"""
}
