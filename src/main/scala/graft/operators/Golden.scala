package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microUnits}
import graft.functions.TextFunctions.{lcsLen, tokensMixed}

/** Golden-set evaluation — the recap-worker's own scorer over its
  * golden runs (recap-worker/recap-worker/src/evaluation/golden.rs:229
  * `evaluate_dataset`), the reference's gate on every summarizer
  * change. Three rows:
  *
  *  - kw02: the genre PRESENCE scorer evaluate_dataset classifies
  *    with (pipeline/genre_keywords.rs:577 `score_text` + :639
  *    `top_genres`) — a genuinely different matcher from kw01's
  *    weighted occurrence accumulator (classification/keywords.rs):
  *    each keyword contributes 0/1 on presence (never per
  *    occurrence), ASCII keywords require non-alphanumeric word
  *    boundaries on both sides ("api" does NOT fire inside "rapid"
  *    here — the exact opposite of kw01, pinned in the spec),
  *    non-ASCII keywords are plain substring `contains`, and a genre
  *    is suppressed ENTIRELY when any of its negative keywords occurs
  *    anywhere in the text (:583 — plain contains, no boundaries).
  *    Only genres with score > 0 are emitted (:624).
  *  - gd01: the EvaluationSummary head (golden.rs:54) — sample
  *    counts, the quality/noise scalar means (noise_ratio extracted
  *    from the diagnostics JSON, :189), the MetricsCalculator
  *    classification block (evaluation/metrics.rs:64 `push` + :120
  *    `finalize`: expected = {genre}, predicted = the top-3 genre
  *    SET, accuracy = any-overlap, top-k accuracy at k=2, macro
  *    P/R/F1 over every label seen, weighted F1 by golden support),
  *    and the overall ROUGE-1 means (rouge.rs:57 `rouge_1` — CLIPPED
  *    MULTISET unigram counts, NOT tx12's distinct-set convention).
  *  - gd02: `rouge_by_genre` (golden.rs:62) — per-genre plus overall
  *    mean ROUGE-1 and ROUGE-L triples with the per-genre counts.
  *    ROUGE-L rides the lcsLen DP kernel, so gd02 is rows-only (the
  *    tx15 precedent); every ROUGE-1 column is oracled through gd01.
  *
  * Skip semantics follow the reference exactly: a run enters the
  * ROUGE means only when BOTH texts are present and non-trim-empty
  * (golden.rs:196 `maybe_push_rouge`); it enters classification when
  * genre and summary are present — a whitespace-only summary still
  * classifies (predicted = ∅, an accuracy miss) because
  * `maybe_push_classification` (:209) never checks emptiness; a
  * punctuation-only summary still pushes all-zero ROUGE scores
  * because `compute_rouge` (:21) only early-returns on trim-empty
  * input, not on empty token lists.
  *
  * Tokenization is rouge.rs:112 `tokenize` ≡ tokensMixed (lowercased
  * ASCII alphanumeric runs + one token per non-ASCII grapheme,
  * punctuation splits) — the shared kernel tx16 already oracles.
  *
  * The genre dictionary here is a six-genre modeled subset of
  * genre_keywords.rs `default_keywords` (the full map is 28 genres ×
  * ~12 keywords of the same three kinds — plain config data; every
  * matcher RULE is represented: ASCII word-boundary keywords,
  * multi-word phrases, a CJK contains keyword, and real negative
  * lists). The dictionary is one Scala value that also generates the
  * oracle's SQL, so the two engines can never drift.
  *
  * Composition (the qe01/qe04 precedent — driver tables carry no
  * golden runs): each document becomes one golden run; summaries are
  * token slices of the text with genre keyword phrases planted on
  * fixed residues (a wrong-genre plant every 5th run, a second-genre
  * plant every 4th, negative-keyword plants that suppress genres, a
  * NULL / whitespace-only / punctuation-only summary each on their
  * own residue) so every accumulator rule and skip path fires
  * somewhere in the corpus at every SF.
  *
  * Scale: the composed view is a stateless projection of the scan.
  * kw02 evaluates a fixed ~30-predicate battery per row (presence
  * booleans, no explode) and unpivots to ≤|genres| rows per run —
  * one map-side-combinable shape with no join at all. gd01's
  * classification is SHUFFLE-FREE until the final aggregations: the
  * top-3 prediction is an in-row sort of the wide battery (no rank
  * window), per-run accuracy flags are row-local, and the per-label
  * cells explode ≤4 row-local labels per run into ONE
  * map-side-combined groupBy over a ≤|genres| key space;
  * ROUGE-1 shuffles token COUNTS (job, tok) once per side and
  * joins them — linear in corpus tokens, the same budget as tx03's
  * inverted index; ROUGE-L is a per-row codegen DP over two bounded
  * token arrays. Every mean re-aggregates exact 1e-6-unit longs (the
  * tx22 discipline).
  */
object Golden {

  /** The modeled `default_keywords` subset: genre → (positive
    * keywords, negative keywords). Genre ids, members, and both
    * negative lists are the reference's own entries
    * (genre_keywords.rs:27-340).
    */
  val dictionary: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("ai_data", Seq("ai", "machine learning", "data", "big data", "機械学習"), Seq()),
    ("culture_arts", Seq("museum", "exhibition", "festival"), Seq("movie", "music")),
    ("economics_macro", Seq("inflation", "gdp", "economy"), Seq("stock", "market")),
    ("health_medicine", Seq("health", "vaccine", "clinical"), Seq("fitness", "yoga")),
    ("software_dev", Seq("software", "developer", "cloud", "api"), Seq("game", "esports")),
    ("sports", Seq("tournament", "championship", "olympics"), Seq("esports")))

  // keywords are embedded verbatim into Java and RE2 regexes — keep
  // them metacharacter-free so no escaping layer is needed
  require(dictionary.flatMap(d => d._2 ++ d._3)
    .forall(k => k.forall(c => c.isLetterOrDigit || c == ' ')))

  val genres: Seq[String] = dictionary.map(_._1)

  /** One planted phrase per genre (3+ boundary-clean keyword hits, so
    * a planted genre outscores ai_data's natural corpus "data"/"big
    * data" presence).
    */
  val plantPhrase: Map[String, String] = Map(
    "ai_data" -> " ai adoption of machine learning over big data",
    "culture_arts" -> " museum exhibition festival season",
    "economics_macro" -> " inflation gdp economy watch",
    "health_medicine" -> " health vaccine clinical trial",
    "software_dev" -> " software developer cloud api",
    "sports" -> " tournament championship olympics bid")

  /** One single-keyword phrase per genre (the second/third-place
    * plants).
    */
  val singlePhrase: Map[String, String] = Map(
    "ai_data" -> " ai shift",
    "culture_arts" -> " museum wing",
    "economics_macro" -> " inflation print",
    "health_medicine" -> " vaccine lot",
    "software_dev" -> " developer survey",
    "sports" -> " olympics push")

  /** A two-keyword phrase per genre — the mid-strength plant that puts
    * a second genre between a wrong-genre plant (3+) and ai_data's
    * natural corpus hits (1-2), so expected genres land at rank 3 and
    * the accuracy / top-2-accuracy distinction (metrics.rs:80) is
    * exercised, not just carried.
    */
  val doublePhrase: Map[String, String] = Map(
    "ai_data" -> " ai meets machine learning",
    "culture_arts" -> " museum exhibition",
    "economics_macro" -> " inflation gdp",
    "health_medicine" -> " health vaccine",
    "software_dev" -> " software developer",
    "sports" -> " tournament championship")

  private def genreAt(idx: Column): Column =
    element_at(array(genres.map(lit): _*), (idx + 1).cast("int"))

  private def phraseAt(m: Map[String, String], idx: Column): Column =
    element_at(array(genres.map(g => lit(m(g))): _*), (idx + 1).cast("int"))

  /** The composed golden-runs view: (job_id, cohort, genre,
    * quality_score, diagnostics, summary_text, reference_summary).
    * Mirrors GoldenRun (golden.rs:20): every Option field goes NULL
    * (or empty, for the trim-empty rules) on its own residue.
    */
  def composeGoldenRuns(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id").as("job_id"), split(trim(col("text")), "\\s+").as("toks"))
    val expectedIdx = pmod(col("job_id"), lit(genres.size))
    val plantIdx = pmod(col("job_id") +
      when(col("job_id") % 5 === 0, 2).otherwise(0), lit(genres.size))
    val secondIdx = pmod(col("job_id") + 1, lit(genres.size))
    val doubleIdx = pmod(col("job_id") + 3, lit(genres.size))
    val baseSummary = concat(
      array_join(slice(col("toks"), 5, 35), " "),
      phraseAt(plantPhrase, plantIdx),
      when(col("job_id") % 4 === 0, phraseAt(singlePhrase, secondIdx)).otherwise(""),
      when(col("job_id") % 8 === 0, phraseAt(doublePhrase, doubleIdx)).otherwise(""),
      when(col("job_id") % 9 === 0, " 機械学習の進展").otherwise(""),
      when(col("job_id") % 21 === 0, " stock market mood").otherwise(""),
      when(col("job_id") % 27 === 0, " esports cup night").otherwise(""))
    d.select(
      col("job_id"),
      when(col("job_id") % 3 === 0, "bad").otherwise("good").as("cohort"),
      when(col("job_id") % 13 === 0, lit(null).cast("string"))
        .otherwise(genreAt(expectedIdx)).as("genre"),
      when(col("job_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(pmod(col("job_id"), lit(101)) / 100.0).as("quality_score"),
      when(col("job_id") % 4 === 1, lit("""{"retries": 1}"""))
        .otherwise(concat(lit("""{"noise_ratio": 0."""),
          lpad((pmod(col("job_id"), lit(17)) * 5).cast("string"), 2, "0"), lit("}")))
        .as("diagnostics"),
      when(col("job_id") % 17 === 0, lit(null).cast("string"))
        .when(col("job_id") % 23 === 0, lit("   "))
        .when(col("job_id") % 31 === 0, lit("!!! ???"))
        .otherwise(baseSummary).as("summary_text"),
      when(col("job_id") % 19 === 0, lit(""))
        .otherwise(concat(array_join(slice(col("toks"), 1, 30), " "),
          when(col("job_id") % 9 === 0, " 機械学習の進展").otherwise("")))
        .as("reference_summary"))
  }

  /** The wide per-run presence battery: job_id (+ any carried
    * columns) plus one s_<genre> score column per genre. A fixed
    * ~30-predicate projection fused into the scan (one shared
    * lower()) — no explode, no join, no shuffle.
    */
  def genreScoresWide(runs: DataFrame, textCol: String): DataFrame = {
    val lowered = lower(col(textCol))
    def present(kw: String): Column =
      if (kw.forall(_ < 0x80))
        lowered.rlike("(^|[^a-z0-9])" + kw + "([^a-z0-9]|$)")
      else lowered.contains(kw)
    runs.select(
      runs.columns.map(col).toSeq ++
      dictionary.map { case (g, pos, neg) =>
        val score = pos.map(k => when(present(k), 1).otherwise(0))
          .reduce(_ + _)
        val suppressed =
          if (neg.isEmpty) lit(false)
          else neg.map(n => lowered.contains(n)).reduce(_ || _)
        when(suppressed, 0).otherwise(score).as(s"s_$g")
      }: _*)
  }

  /** score_text over any (job_id, <textCol>) frame: the long
    * (job_id, genre, score) frame of score > 0, non-suppressed
    * genres — the wide battery stack-unpivoted.
    */
  def genreScoresOn(runs: DataFrame, textCol: String): DataFrame = {
    val stackArgs = genres.map(g => s"'$g', s_$g").mkString(", ")
    genreScoresWide(runs.select(col("job_id"), col(textCol)), textCol)
      .select(col("job_id"),
        expr(s"stack(${genres.size}, $stackArgs) AS (genre, score)"))
      .filter(col("score") > 0)
  }

  /** top_genres(text, 3) computed IN-ROW: the score>0 entries of the
    * wide battery sorted by (score desc, genre asc) through a
    * sortable (−score, genre) struct array, sliced to 3 — no rank
    * window, so classification adds ZERO shuffles to the scan (the
    * first cut ranked a stack-exploded frame through a job-keyed
    * row_number window: a corpus-scale shuffle for a 6-element
    * per-row sort).
    */
  private def top3(): Column = {
    val entries = array(genres.map(g =>
      struct((-col(s"s_$g")).as("ns"), lit(g).as("g"))): _*)
    transform(
      slice(array_sort(filter(entries, e => e.getField("ns") < 0)), 1, 3),
      e => e.getField("g"))
  }

  /** kw02: the presence scores over every golden run with a summary —
    * the exact frame evaluate_dataset's classifier consumes.
    */
  def kw02(s: SparkSession, dir: String): DataFrame =
    genreScoresOn(
      composeGoldenRuns(s, dir).filter(col("summary_text").isNotNull)
        .select(col("job_id"), col("summary_text")),
      "summary_text")

  /** Any frame with its in-row top-3 predicted genre list appended
    * ((score desc, genre asc) — genre_keywords.rs:643). Stateless, so
    * the identical body classifies a stream at ingest (st23).
    */
  def withTopGenres(docs: DataFrame, textCol: String,
                    outCol: String = "top3"): DataFrame =
    genreScoresWide(docs, textCol)
      .select(docs.columns.map(col).toSeq :+ top3().as(outCol): _*)

  /** Classification-qualified runs with their top-3 predictions. */
  private def withPredicted(runs: DataFrame): DataFrame =
    withTopGenres(
      runs.filter(col("genre").isNotNull && col("summary_text").isNotNull)
        .select(col("job_id"), col("genre"), col("summary_text")),
      "summary_text")
      .select(col("job_id"), col("genre"), col("top3"))

  /** Per-run clipped-multiset ROUGE-1 micro-units over rouge-qualified
    * runs: (job_id, genre, n_cand, n_ref, lcs, p1_u, r1_u, f1_u).
    * Token counts shuffle once per side on (job_id, tok); the inner
    * join keeps only tokens both sides own (min of counts is 0
    * elsewhere). The lcs column is a stateless per-row DP — gd01
    * never selects it, so Catalyst prunes the kernel out of the
    * oracled plan.
    */
  private def rougeFrame(runs: DataFrame): DataFrame = {
    val qualified = runs
      .filter(col("summary_text").isNotNull && trim(col("summary_text")) =!= "" &&
        col("reference_summary").isNotNull && trim(col("reference_summary")) =!= "")
      .select(col("job_id"), col("genre"),
        tokensMixed(col("summary_text")).as("ct"),
        tokensMixed(col("reference_summary")).as("rt"))
    def counts(src: Column, name: String): DataFrame =
      qualified.select(col("job_id"), explode(src).as("tok"))
        .groupBy("job_id", "tok").agg(count(lit(1)).as(name))
    val inter = counts(col("ct"), "cc")
      .join(counts(col("rt"), "rc"), Seq("job_id", "tok"))
      .groupBy("job_id").agg(sum(least(col("cc"), col("rc"))).as("m"))
    def pair(num: Column, den: Column): Column =
      when(size(col("ct")) === 0 || size(col("rt")) === 0, 0L)
        .otherwise(microUnits(num, den, 6))
    def f(pu: Column, ru: Column): Column =
      when(pu + ru > 0, round(lit(2) * pu * ru / (pu + ru), 0).cast("long"))
        .otherwise(0L)
    qualified.join(inter, Seq("job_id"), "left").na.fill(0L, Seq("m"))
      .select(col("job_id"), col("genre"),
        pair(col("m"), size(col("ct"))).as("p1_u"),
        pair(col("m"), size(col("rt"))).as("r1_u"),
        pair(when(size(col("ct")) === 0 || size(col("rt")) === 0, 0L)
          .otherwise(lcsLen(col("ct"), col("rt"))), size(col("ct"))).as("pl_u"),
        pair(when(size(col("ct")) === 0 || size(col("rt")) === 0, 0L)
          .otherwise(lcsLen(col("ct"), col("rt"))), size(col("rt"))).as("rl_u"))
      .withColumn("f1_u", f(col("p1_u"), col("r1_u")))
      .withColumn("fl_u", f(col("pl_u"), col("rl_u")))
  }

  private def meanU(u: Column): Column =
    round(sum(u) / count(lit(1)), 0).cast("long") / 1e6

  /** gd01: the one-row EvaluationSummary (counts, scalar means,
    * classification block, overall ROUGE-1 means).
    */
  def gd01(s: SparkSession, dir: String): DataFrame =
    gd01On(composeGoldenRuns(s, dir))

  def gd01On(runs0: DataFrame): DataFrame = {
    // five one-row agg branches (counts, noise, accuracy, per-label,
    // rouge) all read the composed runs frame — persist it so the
    // composition executes once, not five times (guide §2.4); the
    // 1-row output materializes eagerly below so the cache releases
    val runs = runs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val counts = runs.agg(
      count(lit(1)).as("total_samples"),
      count(when(col("cohort") === "good", 1)).as("good_samples"),
      count(when(col("cohort") === "bad", 1)).as("bad_samples"),
      // quality_score = k/100 exactly, so the mean is the exact
      // integer ratio sum(k) / (100·n) (ScalarAccumulator, golden
      // .rs:108; 0.0 when no run carries a score)
      coalesce(microRatio(sum(round(col("quality_score") * 100, 0).cast("long")),
        count(col("quality_score")) * 100, 6), lit(0.0)).as("avg_quality_score"))
    val noise = runs
      .select(get_json_object(col("diagnostics"), "$.noise_ratio")
        .cast("double").as("nr"))
      .filter(col("nr").isNotNull)
      .agg(coalesce(round(sum(round(col("nr") * 1e6, 0).cast("long")) /
        count(lit(1)), 0).cast("long") / 1e6, lit(0.0)).as("avg_noise_ratio"))

    val pred = withPredicted(runs)
    val accuracy = pred.select(
        array_contains(col("top3"), col("genre")).cast("int").as("correct"),
        array_contains(slice(col("top3"), 1, 2), col("genre")).cast("int").as("top2"))
      .agg(
        count(lit(1)).as("n_classified"),
        coalesce(microRatio(sum("correct"), count(lit(1)), 6), lit(0.0)).as("accuracy"),
        coalesce(microRatio(sum("top2"), count(lit(1)), 6), lit(0.0)).as("top2_accuracy"))

    // per-label cells: each run contributes its predicted ∪ {expected}
    // labels (metrics.rs:96) — ≤4 row-local rows per run, aggregated
    // by label directly (ONE map-side-combined shuffle on a
    // ≤|genres|-key space; no per-(run, label) pre-aggregation needed
    // because the exploded label list is already distinct per run)
    val perLabel = pred
      .select(col("genre"), col("top3"),
        explode(array_distinct(concat(col("top3"), array(col("genre"))))).as("label"))
      .select(col("label"),
        array_contains(col("top3"), col("label")).as("p"),
        (col("label") === col("genre")).as("e"))
      .groupBy("label").agg(
        count(when(col("p") && col("e"), 1)).as("tp"),
        count(when(col("p") && !col("e"), 1)).as("fp"),
        count(when(!col("p") && col("e"), 1)).as("fn"),
        count(when(col("e"), 1)).as("support"))
      .select(col("support"),
        when(col("tp") + col("fp") > 0, microUnits(col("tp"), col("tp") + col("fp"), 6))
          .otherwise(0L).as("p_u"),
        when(col("tp") + col("fn") > 0, microUnits(col("tp"), col("tp") + col("fn"), 6))
          .otherwise(0L).as("r_u"))
      .withColumn("f_u",
        when(col("p_u") + col("r_u") > 0,
          round(lit(2) * col("p_u") * col("r_u") / (col("p_u") + col("r_u")), 0)
            .cast("long"))
          .otherwise(0L))
    val macroW = perLabel.agg(
      coalesce(meanU(col("p_u")), lit(0.0)).as("macro_precision"),
      coalesce(meanU(col("r_u")), lit(0.0)).as("macro_recall"),
      coalesce(meanU(col("f_u")), lit(0.0)).as("macro_f1"),
      // f_u·support is a micro-unit × corpus-count PRODUCT — the
      // round-8 moment discipline: decimal(38,0) here, HUGEINT in the
      // oracle, or the long sum wraps silently at scale while DuckDB
      // raises and the engines diverge exactly when it matters
      coalesce(round(sum(col("f_u").cast("decimal(38,0)") * col("support")) /
        sum("support"), 0).cast("long") / 1e6, lit(0.0)).as("weighted_f1"))

    val rouge = rougeFrame(runs).agg(
      count(lit(1)).as("n_rouge"),
      coalesce(meanU(col("p1_u")), lit(0.0)).as("rouge1_p"),
      coalesce(meanU(col("r1_u")), lit(0.0)).as("rouge1_r"),
      coalesce(meanU(col("f1_u")), lit(0.0)).as("rouge1_f"))

    val out = counts.crossJoin(broadcast(noise)).crossJoin(broadcast(accuracy))
      .crossJoin(broadcast(macroW)).crossJoin(broadcast(rouge))
    Dedup.materialized(out) { runs.unpersist(blocking = false) }
  }

  /** gd02: rouge_by_genre — one row per lowercased genre plus the
    * `__overall__` row (which, per RougeAccumulator.push, also counts
    * the genre-less runs). Rows-only: ROUGE-L's LCS has no SQL form.
    */
  def gd02(s: SparkSession, dir: String): DataFrame =
    gd02On(composeGoldenRuns(s, dir))

  def gd02On(runs: DataFrame): DataFrame = {
    // ONE pass over the scored frame: per-genre SUMS (genre-less runs
    // under a sentinel key), then the __overall__ row re-aggregates
    // the sums exactly — Σ_groups Σ_group u ≡ Σ u on longs, so the
    // means match a direct overall roll bit-for-bit while the token
    // shuffles run once, not twice
    val units = Seq("p1_u", "r1_u", "f1_u", "pl_u", "rl_u", "fl_u")
    val names = Seq("rouge1_p", "rouge1_r", "rouge1_f",
      "rouge_l_p", "rouge_l_r", "rouge_l_f")
    val sumAggs = count(lit(1)).as("n_pairs") +:
      units.map(u => sum(col(u)).as(s"s_$u"))
    val resumAggs = sum("n_pairs").as("n_pairs") +:
      units.map(u => sum(col(s"s_$u")).as(s"s_$u"))
    // the ≤|genres|+1-row sum frame materializes once (the centroid-
    // collect pattern), so the token-count lineage cannot re-execute
    // for the overall branch
    val per = Dedup.materialized(
      rougeFrame(runs)
        .groupBy(coalesce(lower(col("genre")), lit("\u0000none")).as("genre"))
        .agg(sumAggs.head, sumAggs.tail: _*)) {}
    def means(df: DataFrame): DataFrame =
      df.select(col("genre") +: col("n_pairs") +:
        units.zip(names).map { case (u, n) =>
          (round(col(s"s_$u") / col("n_pairs"), 0).cast("long") / 1e6).as(n)
        }: _*)
    val overall = per.groupBy(lit("__overall__").as("genre"))
      .agg(resumAggs.head, resumAggs.tail: _*)
    means(per.filter(col("genre") =!= "\u0000none")).unionByName(means(overall))
  }
}
