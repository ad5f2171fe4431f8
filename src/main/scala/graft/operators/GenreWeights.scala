package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}

/** gw01/gw02: the genre-classifier WEIGHT-MATRIX TRAINER — the
  * reference's training-data → model-weights batch pipeline
  * (scripts/compute_genre_weights_statistically.py):
  *
  *  - `tokenize_text` (:190): lowercase, then word-character runs —
  *    Python's unicode `\b\w+\b|[ぁ-んァ-ヶー一-龯]+` effectively
  *    tokenizes contiguous runs of word characters; re-expressed as
  *    the explicit class `[a-z0-9_ぁ-んァ-ヶー一-龯]+`, identical on
  *    the reference's declared scripts and engine-portable (Java
  *    regex and DuckDB RE2 agree on explicit ranges where `\w`'s
  *    unicode scope differs);
  *  - `expand_tokens` (:201): every token, plus the singular
  *    (trailing 's' stripped) when it ends in 's' and is longer
  *    than 3 chars;
  *  - `build_feature_counts` (:259): samples with a genre outside
  *    GENRES are SKIPPED entirely (they count nowhere); genre is
  *    lowercased first; per sample each vocab term counts AT MOST
  *    ONCE — multi-word terms match as substrings of the lowered
  *    text, single-word terms by expanded-token-set membership;
  *  - `compute_tfidf_weights` (:286): per-term
  *    idf = 1 + ln((total_docs+1)/(docs_with_term+1)) where
  *    docs_with_term counts GENRES with a nonzero count (the
  *    reference's naming quirk, kept), idf = 1.0 when no genre has
  *    the term; weight = round(tf · idf · 1.5, 3) with
  *    tf = cnt / max(1, genre_total);
  *  - `compute_embedding_weights` (:316): per genre, the mean of the
  *    static EMBED_LOOKUP vectors of vocab terms with a nonzero
  *    count, rounded to 3 dp; (1/6 ≈ 0.167)-uniform when no term
  *    with an embedding hit;
  *  - `compute_bias` (:342): round(−0.3 + (genre_total/total)·0.2, 3)
  *    — more frequent genres get a less negative bias.
  *
  * Cross-engine determinism: embedding components are exact 1-dp
  * values, summed as integer milli-units (order-free); idf rounds to
  * 6-dp micro-units once and the weight chain uses that rounded
  * value on both engines; all final roundings go through the
  * Numeric scale-0 discipline (Python's round-half-even differs only
  * on exact-half doubles, which the transcendental idf chain never
  * produces at these scales).
  *
  * Scale: ONE corpus scan — matching fuses into the scan as an
  * in-row array_intersect against the ≤|vocab| literal (plus
  * |multi-word| contains probes), a sentinel-prefixed explode makes
  * genre totals and per-term counts ONE map-side-combined shuffle of
  * ≤|genres|·(|vocab|+1) keys, and everything downstream operates on
  * that bounded frame with broadcast joins. The |genres|×|vocab|
  * output matrix is model-sized, not data-sized — the shape that
  * trains on 100 TB of learning results.
  *
  * Composition: genres assign by doc_id % 31 over a 31-slot map (28
  * valid genres, an uppercase "AI" that must lower to ai, and three
  * invalid labels that must be skipped; "other" is deliberately
  * unreachable so the zero-sample genre paths execute), and vocab
  * terms plant on independent residues so every matching rule fires
  * (plural expansion, multi-word substring, CJK tokens, a never-
  * matched term for the idf=1.0 path).
  */
object GenreWeights {

  /** compute_genre_weights_statistically.py:157 GENRES, verbatim. */
  val genres: Seq[String] = Seq(
    "ai", "tech", "business", "politics", "health", "sports", "science",
    "entertainment", "world", "security", "product", "design", "culture",
    "environment", "lifestyle", "art_culture", "developer_insights",
    "pro_it_media", "consumer_tech", "global_politics", "environment_policy",
    "society_justice", "travel_lifestyle", "security_policy",
    "business_finance", "ai_research", "ai_policy", "games_puzzles", "other")

  /** Residue → raw genre label (before lowering). "other" is absent —
    * its zero-sample paths must execute; three labels are invalid and
    * must be skipped; "AI" exercises the lowercasing.
    */
  val residueGenres: Seq[String] =
    ("AI" +: genres.filter(g => g != "ai" && g != "other")) ++
      Seq("unmapped", "Legacy", "drafts")

  /** FEATURE_VOCAB subset (:32) — representative of every matching
    * rule: single tokens (ASCII + CJK), multi-word substrings, a
    * plural-expansion target, terms with and without embeddings, and
    * one term that never occurs (idf = 1.0 path).
    */
  val singleTerms: Seq[String] = Seq(
    "transformer", "economy", "treaty", "investment", "game", "art",
    "philosophy", "cybersecurity", "人工知能", "投資", "crossword")
  val multiTerms: Seq[String] = Seq(
    "machine learning research", "cloud computing", "security policy",
    "stock market")
  val vocab: Seq[String] = singleTerms ++ multiTerms

  val EmbeddingDim = 6

  /** EMBED_LOOKUP (:112) for the vocab subset, verbatim values, in
    * exact milli-units. Terms absent from the reference lookup
    * (investment, crossword, cloud computing) are absent here too.
    */
  val embedLookup: Seq[(String, Seq[Long])] = Seq(
    "transformer" -> Seq(1000L, 0L, 0L, 0L, 0L, 0L),
    "economy" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "treaty" -> Seq(0L, 300L, 800L, 0L, 0L, 0L),
    "game" -> Seq(0L, 0L, 0L, 0L, 1000L, 0L),
    "art" -> Seq(0L, 0L, 0L, 0L, 0L, 1000L),
    "philosophy" -> Seq(0L, 0L, 0L, 0L, 0L, 1000L),
    "cybersecurity" -> Seq(800L, 200L, 0L, 0L, 0L, 0L),
    "人工知能" -> Seq(1000L, 0L, 0L, 0L, 0L, 0L),
    "投資" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L),
    "machine learning research" -> Seq(1000L, 0L, 0L, 0L, 0L, 0L),
    "security policy" -> Seq(600L, 0L, 400L, 0L, 0L, 0L),
    "stock market" -> Seq(0L, 1000L, 0L, 0L, 0L, 0L))

  private val tokenRe = "[a-z0-9_ぁ-んァ-ヶー一-龯]+"

  /** Composed learning-result samples: (doc_id, genre, text). The
    * plantings put each matching rule on its own residue; "economy"
    * plants twice in one text so once-per-sample counting is pinned
    * by data, not just by spec.
    */
  def composeSamples(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      element_at(typedLit(residueGenres), (col("doc_id") % 31).cast("int") + 1)
        .as("genre"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0, " Transformers on the Stock Market")
          .otherwise(""),
        when(col("doc_id") % 4 === 0, " economy treaty talks economy")
          .otherwise(""),
        when(col("doc_id") % 5 === 0, " games and art").otherwise(""),
        when(col("doc_id") % 7 === 0,
          " machine learning research lab on cloud computing").otherwise(""),
        when(col("doc_id") % 11 === 0, " 人工知能 投資 の未来").otherwise(""),
        when(col("doc_id") % 13 === 0,
          " security policy and cybersecurity philosophy").otherwise(""),
        when(col("doc_id") % 2 === 0, " investment review").otherwise(""))
        .as("text"))

  /** The ONE corpus pass: valid-genre samples → sentinel-prefixed
    * matched-term explode → (genre, term) counts. term = __doc__
    * rows are the genre totals.
    */
  def featureCounts(samples: DataFrame): DataFrame = {
    val ltext = lower(col("text"))
    val toks = regexp_extract_all(ltext, lit(tokenRe), lit(0))
    val expanded = concat(toks, transform(
      filter(toks, t => length(t) > 3 && t.endsWith("s")),
      t => t.substr(lit(1), length(t) - 1)))
    val matched = concat(
      array_intersect(expanded, typedLit(singleTerms)),
      filter(typedLit(multiTerms), v => ltext.contains(v)))
    samples
      .filter(array_contains(typedLit(genres), lower(col("genre"))))
      .select(lower(col("genre")).as("genre"),
        explode(concat(array(lit("__doc__")), matched)).as("term"))
      .groupBy("genre", "term").agg(count(lit(1)).as("cnt"))
  }

  /** gw01 over any (genre, text) sample frame: the full
    * |genres|×|vocab| TF-IDF weight matrix as scalar rows
    * (genre, term, cnt, total_g, idf, weight).
    */
  def weightsOn(samples: DataFrame): DataFrame = {
    val s = samples.sparkSession
    import s.implicits._
    val fc = featureCounts(samples).cache()
    val totals = fc.filter(col("term") === "__doc__")
      .select(col("genre"), col("cnt").as("total_g"))
    val counts = fc.filter(col("term") =!= "__doc__")
    val totalDocs = totals.agg(greatest(sum("total_g"), lit(1L)).as("total_docs"))
    val matrix = genres.flatMap(g => vocab.map(g -> _)).toDF("genre", "term")
    val dwt = counts.filter(col("cnt") > 0)
      .groupBy("term").agg(count(lit(1)).as("dwt"))
    val idf = vocab.toDF("term")
      .join(broadcast(dwt), Seq("term"), "left")
      .crossJoin(broadcast(totalDocs))
      .select(col("term"),
        when(coalesce(col("dwt"), lit(0L)) > 0,
          microRound(lit(1.0) +
            log((col("total_docs") + 1) / (col("dwt") + 1)), 6))
          .otherwise(1.0).as("idf"))
    matrix
      .join(broadcast(counts), Seq("genre", "term"), "left")
      .join(broadcast(idf), Seq("term"))
      .join(broadcast(totals), Seq("genre"), "left")
      .select(col("genre"), col("term"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("total_g"), lit(0L)).as("total_g"),
        col("idf"),
        microRatio(coalesce(col("cnt"), lit(0L)) * col("idf") * lit(1.5),
          greatest(coalesce(col("total_g"), lit(0L)), lit(1L)), 3).as("weight"))
  }

  /** gw02 over any (genre, text) sample frame: per-genre embedding
    * means and frequency bias as scalar rows
    * (genre, dim_idx, hits, emb_weight, bias).
    */
  def embeddingBiasOn(samples: DataFrame): DataFrame = {
    val s = samples.sparkSession
    import s.implicits._
    val fc = featureCounts(samples).cache()
    val totals = fc.filter(col("term") === "__doc__")
      .select(col("genre"), col("cnt").as("total_g"))
    val counts = fc.filter(col("term") =!= "__doc__")
    val totalDocs = totals.agg(greatest(sum("total_g"), lit(1L)).as("total_docs"))
    val embedRows = embedLookup
      .flatMap { case (t, vs) => vs.zipWithIndex.map { case (v, d) => (t, d, v) } }
      .toDF("term", "dim_idx", "mu")
    val agg = counts.filter(col("cnt") > 0)
      .join(broadcast(embedRows), Seq("term"))
      .groupBy("genre", "dim_idx")
      .agg(sum("mu").as("su"), count(lit(1)).as("hits"))
    val frame = genres.flatMap(g => (0 until EmbeddingDim).map(g -> _))
      .toDF("genre", "dim_idx")
    frame
      .join(broadcast(agg), Seq("genre", "dim_idx"), "left")
      .join(broadcast(totals), Seq("genre"), "left")
      .crossJoin(broadcast(totalDocs))
      .select(col("genre"), col("dim_idx"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(coalesce(col("hits"), lit(0L)) > 0,
          round(col("su") / col("hits"), 0).cast("long") / lit(1000.0))
          .otherwise(0.167).as("emb_weight"),
        microRound(lit(-0.3) +
          coalesce(col("total_g"), lit(0L)) / col("total_docs") * lit(0.2), 3)
          .as("bias"))
  }

  def gw01(s: SparkSession, dir: String): DataFrame =
    weightsOn(composeSamples(s, dir))

  def gw02(s: SparkSession, dir: String): DataFrame =
    embeddingBiasOn(composeSamples(s, dir))
}
