package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microUnits}

/** qe04: recap-summary quality scoring — news-creator's deterministic
  * heuristic battery (news-creator/app/news_creator/evaluation/
  * recap_quality.py RecapQualityEvaluator), the THIRD LLM-output
  * evaluation surface next to recap-evaluator (qe01/qe02) and the
  * acolyte citation audit (qe03). Five axes per summary:
  *
  *  - source_grounding (:55): `[n]` reference-marker integrity —
  *    dangling markers (cited but not in the references list) and
  *    unused references both penalize; the closed form of
  *    max(0, 1 − errors/total) is |cited ∩ refs| / |cited ∪ refs|,
  *    with the both-empty and markers-without-refs cases scoring 0.
  *  - redundancy (:96): mean pairwise character-BIGRAM MULTISET
  *    Jaccard across bullets (whitespace stripped first — the
  *    CJK-effective tokenization; Counter& = per-key min, so
  *    |a∩b| = Σ min counts and |a∪b| = Σa + Σb − Σ min); ≤1 bullet
  *    scores 0. Lower is better (LOWER_IS_BETTER_AXES).
  *  - readability (:127): per bullet 0.7·length + 0.3·ending —
  *    length 1.0 in [400,1200], linear ramps over [200,400) and
  *    (1200,1600], else 0; the ending check strips a trailing `[n]`
  *    marker first and scores 1.0 on the good-ending suffixes
  *    (。/た/る/い/だ/す/ない/ある), else 0.3.
  *  - structure (:161): fraction of the four element families
  *    (who-what, action, background, impact) whose pattern fires.
  *  - entity_density (:181): katakana runs + capitalized ASCII nouns
  *    + numeric/date/currency mentions, capped at 5 per bullet.
  *
  * Every axis is exact integer micro-unit arithmetic (ramp slopes
  * 5000/2500 per char, quarter-units for structure, fifth-units for
  * density), so both engines agree bit-for-bit.
  *
  * Composition (the qe01 precedent): each document becomes one
  * summary of 2–4 bullets sliced from its text, with JP action/
  * background/impact fragments, an entity pack, and a trailing `[n]`
  * marker planted on fixed residues; the references list plants an
  * unused reference on doc_id % 4 and a dangling marker on
  * doc_id % 9 — every scorer rule fires somewhere in the corpus.
  *
  * Scale: grounding/readability/structure/entity are STATELESS
  * higher-order-function projections of the scan (no explode, no
  * shuffle); redundancy is qe02's bounded pair machinery — ≤C(4,2)
  * pairs per summary, hashed-long bigram frames keyed by (summary,
  * bullet), never corpus². One join merges the two.
  */
object RecapQuality {

  private val whoWhatPat = "[ァ-ヶー]{3,}|[A-Z][a-zA-Z]+|.{1,10}[社氏]"
  private val actionPat =
    "(した|される|発表|買収|開始|導入|開発|提供|発売|実施|公開|統合|改善|向上|引き上げ)"
  private val backgroundPat =
    "(背景|経緯|これまで|従来|過去|以前|に伴い|を受けて|に対して|一方で|として)"
  private val impactPat =
    "(見込み|予定|目指す|狙う|今後|将来|影響|結果|効果|期待|可能性|展望|視野)"
  private val katakanaPat = "[ァ-ヶー]{3,}"
  private val asciiNounPat = "[A-Z][a-zA-Z]{2,}"
  private val numericPat =
    "[0-9]{4}[-/年][0-9]{1,2}[-/月]|[0-9]+[%％]|[0-9]+[億万千]|[$€£¥]\\s?[0-9]|[0-9]+(?:\\.[0-9]+)?(?:ドル|円|ユーロ|ポンド)|[0-9]{2,}"
  private val goodEndings = Seq("。", "た", "る", "い", "だ", "す", "ない", "ある")

  /** Composed recap summaries: (output_id, bullets, ref_ids). */
  def composeRecaps(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val nb = (col("doc_id") % 3 + 2).cast("int")
    val bullets = transform(sequence(lit(0), nb - 1), i => {
      val start = when(i === 0, 1).otherwise(i * 10 + 1)
      val cnt = when(i === 0, 60).otherwise(10)
      concat(
        array_join(slice(col("toks"), start, cnt), " "),
        when((col("doc_id") + i) % 3 === 0, " Acme 2024年5月 45% 120円").otherwise(""),
        when((col("doc_id") + i) % 5 === 0, " 背景として").otherwise(""),
        when((col("doc_id") + i) % 7 === 0, " 今後の展望").otherwise(""),
        when((col("doc_id") + i) % 2 === 0, " 発表した").otherwise(""),
        concat(lit(" ["), (i + 1).cast("string"), lit("]")))
    })
    val refs = sequence(
      when(col("doc_id") % 9 === 0, 2).otherwise(1),
      nb + when(col("doc_id") % 4 === 0, 1).otherwise(0))
    d.select(col("doc_id").as("output_id"), bullets.as("bullets"),
      refs.cast("array<int>").as("ref_ids"))
  }

  /** The four stateless axes over a (output_id, bullets, ref_ids)
    * frame — pure HOF projections, mean of exact per-bullet units.
    */
  private def statelessAxes(recaps: DataFrame): DataFrame = {
    val citedSql = expr(
      """array_distinct(flatten(transform(bullets,
           b -> transform(regexp_extract_all(b, '\\[([0-9]+)\\]', 1),
                          x -> CAST(x AS INT)))))""")
    val lenScoreU = (len: Column) =>
      when(len >= 400 && len <= 1200, lit(1000000L))
        .when(len >= 200 && len < 400, ((len - 200) * 5000).cast("long"))
        .when(len > 1200 && len <= 1600, ((lit(1600) - len) * 2500).cast("long"))
        .otherwise(lit(0L))
    val bulletReadU = (b: Column) => {
      val stripped = rtrim(regexp_replace(rtrim(b), "\\s*\\[[0-9]+\\]\\s*$", ""))
      val ends = goodEndings.map(e => stripped.endsWith(e)).reduce(_ || _)
      val endU = when(ends, lit(1000000L)).otherwise(lit(300000L))
      // the blend is divisible by 10 exactly (len units are multiples
      // of 2500), so the long cast loses nothing
      ((lenScoreU(length(b)) * 7 + endU * 3) / 10).cast("long")
    }
    val bulletStructU = (b: Column) =>
      Seq(whoWhatPat, actionPat, backgroundPat, impactPat)
        .map(p => when(b.rlike(p), 250000L).otherwise(0L))
        .reduce(_ + _)
    val bulletEntityU = (b: Column) =>
      least(lit(1000000L),
        ((size(regexp_extract_all(b, lit(katakanaPat), lit(0))) +
          size(regexp_extract_all(b, lit(asciiNounPat), lit(0))) +
          size(regexp_extract_all(b, lit(numericPat), lit(0)))) * 200000L).cast("long"))
    def meanU(per: Column => Column): Column = {
      val sums = aggregate(col("bullets"), lit(0L), (acc, b) => acc + per(b))
      when(size(col("bullets")) > 0,
        microUnits(sums, size(col("bullets")), 0) / 1e6).otherwise(0.0)
    }
    recaps.select(col("output_id"), size(col("bullets")).as("n_bullets"),
      when(size(citedSql) === 0 && size(col("ref_ids")) === 0, 0.0)
        .when(size(citedSql) > 0 && size(col("ref_ids")) === 0, 0.0)
        .otherwise(microRatio(size(array_intersect(citedSql, col("ref_ids"))),
          size(array_union(citedSql, col("ref_ids"))), 6)).as("source_grounding"),
      meanU(bulletReadU).as("readability"),
      meanU(bulletStructU).as("structure"),
      meanU(bulletEntityU).as("entity_density"))
  }

  /** Pairwise char-bigram multiset Jaccard redundancy — the bounded
    * qe02 pair shape, tightened two ways after the warm-creep probe
    * (4.7 s warm; this lineage alone was 4.3 s of it):
    *
    *  - the bigram leaves the scan as an 8-byte xxhash64 long, never
    *    as a string — it is only ever compared for equality, so the
    *    exploded frame (~2.4 M rows at sf0.1) shuffles fixed-width
    *    longs (the dd05 precedent). A collision inside one summary's
    *    ≤ thousands of distinct bigrams is ~2⁻⁴⁴; the DuckDB oracle
    *    stays on the string key and still hash-matches.
    *  - per-(bullet, bigram) multiplicities PRE-COUNT in a codegen
    *    hash aggregation (map-side combine collapses the in-bullet
    *    repeats before the shuffle), so the second aggregation
    *    collects ≤ n_bullets tiny (idx, count) structs per bigram and
    *    the pair derivation is a trivial HOF over ≤ 4 entries — the
    *    first cut collected the raw index multiset and re-filtered it
    *    per pair in interpreted lambdas.
    *
    * (A fully in-row variant — per-summary pair folds over hashed
    * bigram arrays, zero shuffles — benched 4× SLOWER: higher-order
    * functions evaluate interpreted, outside whole-stage codegen, so
    * the relational plan with codegen hash aggregations wins; kept
    * relational deliberately.)
    */
  private def redundancy(recaps: DataFrame): DataFrame = {
    // persisted: contrib AND totals both read it — unpersisted, the
    // whitespace-strip regexp pass over every bullet ran twice
    val bl = recaps
      .select(col("output_id"), posexplode(col("bullets")).as(Seq("idx", "b")))
      .withColumn("chars", regexp_replace(col("b"), "\\s+", ""))
      .withColumn("n_bi", greatest(length(col("chars")) - 1, lit(0)))
      .select(col("output_id"), col("idx"), col("chars"), col("n_bi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contrib = bl
      .filter(col("n_bi") > 0)
      // explode the POSITION sequence and hash in the projection —
      // not transform(...) into an array first: the lambda would
      // evaluate interpreted per element, while substr+xxhash64 over
      // an exploded position row stays inside whole-stage codegen
      .withColumn("i", explode(sequence(lit(1), col("n_bi"))))
      .withColumn("bg", xxhash64(col("chars").substr(col("i"), lit(2))))
      .groupBy("output_id", "idx", "bg").agg(count(lit(1)).as("c"))
      .groupBy("output_id", "bg")
      .agg(collect_list(struct(col("idx"), col("c"))).as("lst"))
      .select(col("output_id"), explode(expr(
        """flatten(transform(lst, a ->
             transform(filter(lst, b -> b.idx > a.idx), b ->
               struct(a.idx AS ia, b.idx AS ib, least(a.c, b.c) AS m))))""")).as("p"))
      .select(col("output_id"), col("p.ia").as("ia"), col("p.ib").as("ib"),
        col("p.m").as("m"))
    val totals = bl.select("output_id", "idx", "n_bi")
    val pairs = totals.select(col("output_id"), col("idx").as("ia"), col("n_bi").as("ta"))
      .join(totals.select(col("output_id"), col("idx").as("ib"), col("n_bi").as("tb")),
        Seq("output_id"))
      .filter(col("ia") < col("ib"))
    val inter = contrib.groupBy("output_id", "ia", "ib")
      .agg(sum(col("m")).as("inter"))
    val perPair = pairs.join(inter, Seq("output_id", "ia", "ib"), "left")
      .na.fill(0L, Seq("inter"))
      .withColumn("uni", col("ta") + col("tb") - col("inter"))
      .withColumn("sim_u",
        when(col("uni") > 0, microUnits(col("inter"), col("uni"), 6)).otherwise(0L))
    perPair.groupBy("output_id")
      .agg((microUnits(sum("sim_u"), count(lit(1)), 0) / 1e6).as("redundancy"))
  }

  /** qe04: all five axes per composed summary. */
  def qe04(s: SparkSession, dir: String): DataFrame =
    recapQualityOn(composeRecaps(s, dir))

  /** The battery over any (output_id, bullets, ref_ids) frame. */
  def recapQualityOn(recaps: DataFrame): DataFrame =
    statelessAxes(recaps)
      .join(redundancy(recaps), Seq("output_id"), "left")
      .na.fill(0.0, Seq("redundancy"))
      .select("output_id", "n_bullets", "source_grounding", "redundancy",
        "readability", "structure", "entity_density")

  /** qe05: the before/after evaluation-run comparison
    * (news-creator/app/news_creator/evaluation/comparison.py:45
    * compare_runs): per-axis mean deltas with the LOWER_IS_BETTER
    * inversion (redundancy improves when it DROPS, recap_quality.py:9),
    * the degraded-trace rate delta, and the case counts. `improved`
    * is strict (delta = 0 improves nothing, :76-78).
    *
    * Runs here are the even/odd output_id halves of the qe04 battery
    * (two deterministic evaluation cohorts over one corpus); a trace
    * is degraded when its source grounding collapsed to 0 — the
    * markers-without-refs fallback is exactly the parse-degradation
    * TraceRecord.is_degraded flags.
    *
    * All means and deltas run on exact 1e-6-unit longs recovered from
    * the axis scores (the tx22 re-aggregation discipline), so the
    * improved flag compares integers, never doubles.
    */
  def compareRuns(rawScores: DataFrame): DataFrame = {
    // the axis unpivot and the degraded-rate rollup both read the
    // scores frame — persist it so the qe04 battery (the expensive
    // lineage) computes ONCE, not per branch (the probe read a full
    // second qe04 run before this)
    val scores = rawScores.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val run = when(pmod(col("output_id"), lit(2)) === 0, "before").otherwise("after")
    val axes = Seq("source_grounding", "redundancy", "readability",
      "structure", "entity_density")
    val stackArgs = axes.map(a => s"'$a', $a").mkString(", ")
    val long = scores.select(run.as("run"),
        expr(s"stack(${axes.size}, $stackArgs) AS (axis, score)"))
      .select(col("run"), col("axis"),
        round(col("score") * 1e6, 0).cast("long").as("u"))
    val perRun = long.groupBy("axis", "run").agg(
      round(sum("u") / count(lit(1)), 0).cast("long").as("mean_u"))
    val wide = perRun.groupBy("axis").pivot("run", Seq("before", "after"))
      .agg(first("mean_u"))
    val fb = scores.groupBy(run.as("run")).agg(
      count(lit(1)).as("n"),
      count(when(col("source_grounding") === 0.0, 1)).as("n_degraded"))
      .select(col("run"), col("n"),
        graft.functions.Numeric.microUnits(col("n_degraded"), col("n"), 4).as("fb_u"))
    val fbWide = fb.groupBy().pivot("run", Seq("before", "after"))
      .agg(first("n").as("n"), first("fb_u").as("fb_u"))
    val out = wide.select(
        col("axis"),
        (col("before") / 1e6).as("before_mean"),
        (col("after") / 1e6).as("after_mean"),
        ((col("after") - col("before")) / 1e6).as("delta"),
        when(col("axis") === "redundancy", col("after") < col("before"))
          .otherwise(col("after") > col("before")).as("improved"))
      .crossJoin(broadcast(fbWide.select(
        (col("before_fb_u") / 1e4).as("fallback_rate_before"),
        (col("after_fb_u") / 1e4).as("fallback_rate_after"),
        ((col("after_fb_u") - col("before_fb_u")) / 1e4).as("fallback_rate_delta"),
        col("before_n").as("case_count_before"),
        col("after_n").as("case_count_after"))))
    Dedup.materialized(out) { scores.unpersist(blocking = false) }
  }

  def qe05(s: SparkSession, dir: String): DataFrame =
    compareRuns(qe04(s, dir))
}
