package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}

/** gw03/gw04: the RETRAIN weight generator — the reference's SECOND
  * genre-classifier weight trainer
  * (recap-worker/scripts/retrain_genre_classifier.py compute_weights
  * :387-475), the script that regenerates
  * recap-subworker/resources/genre_classifier_weights.json consumed
  * by `recap_worker::classification::model::HybridModel`. Same
  * output contract as gw01/gw02's trainer
  * (compute_genre_weights_statistically.py) but a genuinely
  * DIFFERENT algorithm — every convention diverges:
  *
  *  - tokens (`infer_tokens` :374): lowercase, full-width space →
  *    space, whitespace split — NOT gw01's word-character regex;
  *  - `expand_tokens` (:314): the same plural rule (append the
  *    trailing-'s'-stripped form when len > 3);
  *  - term counts (`build_feature_counts` :325): EVERY occurrence
  *    counts (gw01 counts once per sample), and matching is exact
  *    token membership — the two multi-word FEATURE_VOCAB entries
  *    ("confidential computing" — a whitespace-split token can never
  *    equal them) are DEAD: their counts and document frequencies are
  *    identically zero (pinned);
  *  - a sample's tokens count once per VALID genre in its
  *    expected_genres list (genres outside the list are skipped
  *    per-genre via the :359 `continue`, but the sample still counts
  *    in total_docs and document frequency — gw01 skips such samples
  *    entirely); genre_totals counts (sample, valid genre) PAIRS;
  *  - idf (:408-413): sklearn smooth_idf — ln((total_docs+1)/(df+1))
  *    + 1 with df = number of DOCUMENTS containing the term (gw01's
  *    df counts genres), ROUNDED TO 3 DP FIRST and the rounded value
  *    used downstream (:412 `round(idf, 3)`); no df=0 special case
  *    (gw01 pins idf=1.0 there; here the smooth formula just runs);
  *  - tf (:425): occurrences / total vocab-term occurrences in the
  *    genre (gw01 divides by the genre's SAMPLE count);
  *    weight = round(tf·idf₃, 3), all-zero row when the genre has no
  *    term occurrences (:417-420);
  *  - embedding weights (:437-451): term-frequency-WEIGHTED average
  *    of the static EMBED_LOOKUP vectors (gw01 takes the unweighted
  *    mean), with the ZERO vector when no term hit (gw01's fallback
  *    is 0.167-uniform); every one of the 19 vocab terms has an
  *    EMBED_LOOKUP entry, so the zero path is reachable only through
  *    zero counts;
  *  - bias (:455-468): round(ln(total_samples/genre_count), 3) —
  *    log-INVERSE-frequency, higher for rarer genres (gw01's is
  *    −0.3 + 0.2·share, higher for COMMONER genres); genre_count = 0
  *    → 0.0; total_samples = Σ genre_totals, i.e. (sample, genre)
  *    PAIRS, not documents (pinned).
  *
  * Mode pin: the GENRES-literal contract (the script's JSON-file
  * mode, :583). The --from-db mode instead fetches
  * alphabetically-sorted distinct genres with ≥10 samples (:126, a
  * q11-class HAVING read) and carries a label-extraction quirk worth
  * recording: the :247 `genres = []` SHADOWS the function's genres
  * parameter, so `valid_genres` is always the still-empty local list
  * and the coarse-candidates top-3 fallback can never accept a
  * candidate — db-mode samples are exactly the final_genre items,
  * single-label. The compute below takes expected_genres as a LIST
  * (the JSON-mode contract that exercises the per-pair semantics).
  *
  * Determinization (documented): Python rounds half-even and chains
  * (cnt/total)·idf₃; both engines here round half-up in scale-0
  * units over the SAME op chain cnt·idf₃/total (the gw01/Numeric
  * discipline — the transcendental idf chain does not produce exact
  * halves, and cross-engine lockstep is the requirement).
  *
  * Scale: ONE corpus pass — each sample explodes to its
  * (genre, occurrence) pairs plus three sentinel families (__doc__
  * per valid genre for pair totals, __df__ per distinct matched term
  * for document frequency, one __docs__ row for the corpus count),
  * all through a single map-side-combined shuffle onto
  * ≤ |genres|·(|vocab|+1) + |vocab| + 1 keys; everything downstream
  * (idf, the |genres|×|vocab| matrix, embedding sums, bias) runs on
  * that bounded frame with broadcast joins. Output is model-sized.
  */
object GenreRetrain {

  /** retrain_genre_classifier.py:79 GENRES, verbatim (29, incl.
    * "other" — a valid genre in THIS trainer, unlike gw01's).
    */
  val genres: Seq[String] = Seq(
    "ai", "tech", "business", "politics", "health", "sports", "science",
    "entertainment", "world", "security", "product", "design", "culture",
    "environment", "lifestyle", "art_culture", "developer_insights",
    "pro_it_media", "consumer_tech", "global_politics", "environment_policy",
    "society_justice", "travel_lifestyle", "security_policy",
    "business_finance", "ai_research", "ai_policy", "games_puzzles", "other")

  /** FEATURE_VOCAB (:31), verbatim — 12 CJK + 7 ASCII terms, one of
    * them multi-word ("confidential computing", the dead entry).
    */
  val vocab: Seq[String] = Seq(
    "人工知能", "自動運転", "資金調達", "投資", "決算", "政策", "政府",
    "遺伝子", "医療", "量子", "サッカー", "音楽", "confidential computing",
    "cybersecurity", "transformer", "diplomacy", "treaty", "economy",
    "business")

  val EmbeddingDim = 6

  /** EMBED_LOOKUP (:55), verbatim values in exact milli-units —
    * every vocab term has an entry.
    */
  val embedLookup: Seq[(String, Seq[Long])] = Seq(
    "人工知能" -> Seq(1000L, 0L, 0L, 0L, 0L, 0L),
    "自動運転" -> Seq(1000L, 0L, 0L, 0L, 0L, 0L),
    "transformer" -> Seq(1000L, 0L, 0L, 0L, 0L, 0L),
    "資金調達" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "投資" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "決算" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "economy" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "business" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "政策" -> Seq(0L, 0L, 1000L, 0L, 0L, 0L),
    "政府" -> Seq(0L, 0L, 1000L, 0L, 0L, 0L),
    "diplomacy" -> Seq(0L, 300L, 800L, 0L, 0L, 0L),
    "treaty" -> Seq(0L, 300L, 800L, 0L, 0L, 0L),
    "遺伝子" -> Seq(0L, 0L, 0L, 1000L, 0L, 0L),
    "医療" -> Seq(0L, 0L, 0L, 1000L, 0L, 0L),
    "量子" -> Seq(400L, 100L, 0L, 900L, 0L, 0L),
    "サッカー" -> Seq(0L, 0L, 0L, 0L, 1000L, 0L),
    "音楽" -> Seq(0L, 0L, 0L, 0L, 0L, 1000L),
    "confidential computing" -> Seq(800L, 300L, 0L, 0L, 0L, 0L),
    "cybersecurity" -> Seq(800L, 200L, 0L, 0L, 0L, 0L))

  /** Residue → raw expected-genre label: "AI" exercises the
    * lowercasing, three labels are invalid (they keep their sample in
    * total_docs/df but count in no genre), "other" is present and
    * VALID (unlike gw01's trainer), and "games_puzzles" is
    * deliberately unreachable so the zero-sample genre paths (all-zero
    * weight row :417-420, zero embedding vector, bias 0.0 :462)
    * execute under the oracle. 31 slots.
    */
  val residueGenres: Seq[String] =
    ("AI" +: genres.filterNot(g => g == "ai" || g == "games_puzzles")) ++
      Seq("unmapped", "Legacy", "drafts")

  /** Composed labelled samples: (doc_id, genres array, text). A
    * second genre ("tech") rides every doc_id % 6 == 0 sample so the
    * per-(sample, genre)-pair semantics execute; the plantings put
    * every rule on its own residue — double "economy" for occurrence
    * counting, a plural, the dead multi-word entry planted VERBATIM
    * (tokens still can't match it), CJK tokens, and five never-
    * planted terms for the df = 0 idf branch.
    */
  def composeSamples(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 6 === 0,
        array(element_at(typedLit(residueGenres),
          (col("doc_id") % 31).cast("int") + 1), lit("tech")))
        .otherwise(array(element_at(typedLit(residueGenres),
          (col("doc_id") % 31).cast("int") + 1))).as("genres"),
      concat(
        col("text"),
        when(col("doc_id") % 2 === 0, " Economy business economy")
          .otherwise(""),
        when(col("doc_id") % 3 === 0, " transformers and treaty")
          .otherwise(""),
        when(col("doc_id") % 5 === 0, " cybersecurity diplomacy briefing")
          .otherwise(""),
        when(col("doc_id") % 7 === 0, " confidential computing summit")
          .otherwise(""),
        when(col("doc_id") % 11 === 0, " 人工知能 投資 医療").otherwise(""),
        when(col("doc_id") % 13 === 0, " 量子 サッカー 音楽 政府")
          .otherwise("")).as("text"))

  /** The ONE corpus pass: per sample, valid lowered genres ×
    * (__doc__ sentinel + every matched-term OCCURRENCE), plus the
    * __df__ distinct-term rows and one __docs__ row → (k, term)
    * counts on a bounded key space.
    */
  def featureRows(samples: DataFrame): DataFrame = {
    val toks = filter(
      split(lower(translate(col("text"), "　", " ")), "\\s+"),
      t => t =!= "")
    val expanded = concat(toks, transform(
      filter(toks, t => length(t) > 3 && t.endsWith("s")),
      t => t.substr(lit(1), length(t) - 1)))
    val matched = filter(expanded, t => array_contains(typedLit(vocab), t))
    val vgen = filter(transform(col("genres"), g => lower(g)),
      g => array_contains(typedLit(genres), g))
    // ev33 explode barrier: `matched` feeds the genre fan-out AND the
    // __df__ distinct rows — without the barrier the whole interpreted
    // tokenize→plural-expand→vocab-match chain (HOFs never codegen)
    // re-evaluates per reference inside the one giant explode argument
    val b = samples
      .select(explode(array(struct(
        matched.as("matched"), vgen.as("vgen")))).as("x"))
      .select(col("x.matched").as("matched"), col("x.vgen").as("vgen"))
    b
      .select(explode(concat(
        flatten(transform(col("vgen"), g => concat(
          array(struct(g.as("k"), lit("__doc__").as("term"))),
          transform(col("matched"), t => struct(g.as("k"), t.as("term")))))),
        transform(array_distinct(col("matched")),
          t => struct(lit("__df__").as("k"), t.as("term"))),
        array(struct(lit("__docs__").as("k"), lit("__doc__").as("term")))))
        .as("r"))
      .select(col("r.k").as("k"), col("r.term").as("term"))
      .groupBy("k", "term").agg(count(lit(1)).as("cnt"))
  }

  /** gw03 over any (doc_id, genres, text) sample frame: the
    * |genres|×|vocab| TF-IDF matrix as scalar rows
    * (genre, term, cnt, total_terms_g, idf, weight).
    */
  def weightsOn(samples: DataFrame): DataFrame = {
    val s = samples.sparkSession
    import s.implicits._
    // one corpus pass feeds counts + df + doc totals; the output is
    // bounded (|genres|×|vocab| rows), so materialize it eagerly and
    // release the cache — running gw03 and gw04 in one session then
    // holds no residual corpus-sized cache between queries
    val fr = featureRows(samples).cache()
    val counts = fr.filter(col("k") =!= "__df__" && col("k") =!= "__docs__" &&
        col("term") =!= "__doc__")
      .select(col("k").as("genre"), col("term"), col("cnt"))
    val totalTerms = counts.groupBy("genre").agg(sum("cnt").as("total_terms_g"))
    val dfreq = fr.filter(col("k") === "__df__")
      .select(col("term"), col("cnt").as("df"))
    val totalDocs = fr.filter(col("k") === "__docs__")
      .agg(sum("cnt").as("total_docs"))
    val idf = vocab.toDF("term")
      .join(broadcast(dfreq), Seq("term"), "left")
      .crossJoin(broadcast(totalDocs))
      .select(col("term"), microRound(
        log((col("total_docs") + 1).cast("double") /
          (coalesce(col("df"), lit(0L)) + 1)) + 1.0, 3).as("idf"))
    val matrix = genres.flatMap(g => vocab.map(g -> _)).toDF("genre", "term")
    val out = matrix
      .join(broadcast(counts), Seq("genre", "term"), "left")
      .join(broadcast(idf), Seq("term"))
      .join(broadcast(totalTerms), Seq("genre"), "left")
      .select(col("genre"), col("term"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("total_terms_g"), lit(0L)).as("total_terms_g"),
        col("idf"),
        when(coalesce(col("total_terms_g"), lit(0L)) > 0,
          microRatio(coalesce(col("cnt"), lit(0L)) * col("idf"),
            col("total_terms_g"), 3))
          .otherwise(0.0).as("weight"))
    Dedup.materialized(out) { fr.unpersist(blocking = false) }
  }

  /** gw04 over any (doc_id, genres, text) sample frame: per-genre
    * frequency-weighted embedding average + log-inverse-frequency
    * bias as scalar rows (genre, dim_idx, total_w, emb_weight, n_g,
    * bias).
    */
  def embeddingBiasOn(samples: DataFrame): DataFrame = {
    val s = samples.sparkSession
    import s.implicits._
    // same one-pass cache + eager-materialize-and-release discipline
    // as weightsOn (output bounded at |genres|×EmbeddingDim rows)
    val fr = featureRows(samples).cache()
    val counts = fr.filter(col("k") =!= "__df__" && col("k") =!= "__docs__" &&
        col("term") =!= "__doc__")
      .select(col("k").as("genre"), col("term"), col("cnt"))
    val gtot = fr.filter(col("k") =!= "__df__" && col("k") =!= "__docs__" &&
        col("term") === "__doc__")
      .select(col("k").as("genre"), col("cnt").as("n_g"))
    val totalSamples = gtot.agg(sum("n_g").as("total_samples"))
    val embedRows = embedLookup
      .flatMap { case (t, vs) => vs.zipWithIndex.map { case (v, d) => (t, d, v) } }
      .toDF("term", "dim_idx", "mu")
    val agg = counts
      .join(broadcast(embedRows), Seq("term"))
      .groupBy("genre", "dim_idx")
      .agg(sum(col("cnt") * col("mu")).as("smu"), sum("cnt").as("total_w"))
    val frame = genres.flatMap(g => (0 until EmbeddingDim).map(g -> _))
      .toDF("genre", "dim_idx")
    val out = frame
      .join(broadcast(agg), Seq("genre", "dim_idx"), "left")
      .join(broadcast(gtot), Seq("genre"), "left")
      .crossJoin(broadcast(totalSamples))
      .select(col("genre"), col("dim_idx"),
        coalesce(col("total_w"), lit(0L)).as("total_w"),
        when(coalesce(col("total_w"), lit(0L)) > 0,
          round(col("smu").cast("double") / col("total_w"), 0).cast("long")
            / lit(1000.0))
          .otherwise(0.0).as("emb_weight"),
        coalesce(col("n_g"), lit(0L)).as("n_g"),
        when(coalesce(col("n_g"), lit(0L)) > 0,
          microRound(log(col("total_samples").cast("double") / col("n_g")), 3))
          .otherwise(0.0).as("bias"))
    Dedup.materialized(out) { fr.unpersist(blocking = false) }
  }

  def gw03(s: SparkSession, dir: String): DataFrame =
    weightsOn(composeSamples(s, dir))

  def gw04(s: SparkSession, dir: String): DataFrame =
    embeddingBiasOn(composeSamples(s, dir))
}
