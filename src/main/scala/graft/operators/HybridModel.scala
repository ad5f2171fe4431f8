package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.microRound

/** hm01/hm02: the recap-worker HybridModel INFERENCE path — the
  * deterministic forward pass of the shipped linear classifier
  * (classification/features.rs FeatureExtractor.extract :275-349 and
  * classification/model.rs HybridModel::predict :136-165, loading the
  * checked-in resources/genre_classifier_weights.json verbatim —
  * DEFAULT_JSON at model.rs:13). Together with gw03/gw04 (the
  * trainer that REGENERATES that JSON), gc01 (the downstream
  * threshold decision) and ml04-ml09 (the evaluators), this closes
  * the classification pipeline train → featurize → score → decide →
  * evaluate end to end.
  *
  * hm01 — feature extraction, the hash-free halves:
  *  - raw counts: per vocab term, every OCCURRENCE of the lowered
  *    token (exact membership — the multi-word vocab entry is dead
  *    here exactly as in gw03); total_hits = Σ raw over the vocab,
  *    doc_len = ALL tokens;
  *  - tf = raw / total_hits (:327 — vocabulary-HIT-denominated, NOT
  *    doc-length-denominated; a doc mentioning one vocab term once in
  *    10k words has tf 1.0 — pinned); tfidf = tf·idf;
  *  - BM25 (:331-333): idf·(raw·(k1+1))/(raw + k1·length_norm) with
  *    length_norm = 1 − b + b·(doc_len/avg_doc_len), doc_len = 0 →
  *    1.0; the shipped JSON carries NULL k1/b/avg_doc_len, so the
  *    model runs on the FALLBACK constants k1=1.6, b=0.75,
  *    avg_doc_len=320 (model.rs:118-120 unwrap_or — pinned);
  *  - raw = 0 terms are skipped (:325 `continue`) — hm01 emits hit
  *    rows only; total_hits = 0 zeroes both vectors (:322 gate).
  *
  * hm02 — the predict mat-vec (:147-160): score_g = bias_g +
  * Σ_t tfidf_t·W_gt + Σ_d emb_d·E_gd over the 29-genre weight
  * matrix, emitted as the per-doc top-3 (the top_genres consumer
  * shape) plus bm25_peak (FeatureVector::max_bm25 :379, the
  * feature-snapshot field pipeline/genre.rs:616 persists).
  *
  * The embedding CHANNEL (extract :297-314) mixes a per-token
  * xxh3_64 fallback for tokens outside the 19-entry lookup — a
  * vendored hash library's bit pattern (xxhash-rust XXH3; neither
  * Spark's xxhash64 (XXH64) nor DuckDB expresses it, and the
  * container has no implementation to pin vectors against). The
  * channel's VALUE is therefore composed here as the lookup-hit mean
  * (zero vector when nothing hits), the sim-family env-blocked-input
  * precedent, with this paragraph as the ledger entry; the predict
  * ALGEBRA over that channel is exact. EmbeddingStats defaults to
  * empty (mean 0, std 1 — normalize is the identity; workflow.rs
  * only sets real stats when trained with a golden set, and fz01
  * maps that statistics computation).
  *
  * Cross-engine exactness: every weight is an exact 3-dp JSON value
  * held as milli-unit longs; the per-(genre, term) coefficient
  * C_gt = idf_t·W_gt + Σ_d mu_td·E_gd folds BOTH channels into one
  * 1e-6-unit integer, so score_g = (bias_g·hits·10³ + Σ_t raw_t·C_gt)
  * / (hits·10⁶) — an exact integer numerator over a shared positive
  * denominator. Ranking compares the INTEGER numerators (never the
  * divided doubles); ties break by the genres-list index (the
  * reference emits pairs in list order and Python/Rust consumers
  * sort stably). Outputs round to 1e-6 once. The reference runs f32;
  * this port computes the same chain in f64 and quantizes — the
  * documented determinization, same class as the Python
  * half-even notes on gw01/gw03.
  *
  * Scale: BOTH operators are stateless scan projections — the 19
  * raw-count HOFs, the 29 integer dot products, the in-row top-3
  * sort (gd01's shuffle-free pattern) and the bm25 ladder all fuse
  * into whole-stage codegen; zero shuffles, zero joins. The weight
  * matrix lives in the instruction stream, not in a join.
  */
object HybridModel {

  /** FALLBACK_BM25_K1 / _B / _AVG_DOC_LEN (features.rs:7-9) — the
    * shipped JSON's nulls unwrap to these.
    */
  val K1 = 1.6
  val B = 0.75
  val AvgDocLen = 320.0

  /** resources/genre_classifier_weights.json feature_idf, milli-units
    * verbatim (vocab = GenreRetrain.vocab, same file's
    * feature_vocab).
    */
  val idfU: Seq[Long] = Seq(8434L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 9127L, 6082L, 8028L, 7335L, 6562L, 4745L, 3528L)

  /** (genre, tfidf-weight milli-units (19), embedding-weight milli-units (6), bias milli-units). */
  val weightRows: Seq[(String, Seq[Long], Seq[Long], Long)] = Seq(
    ("ai", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 553L, 365L, 0L, 0L, 863L, 2405L), Seq(118L, 882L, 0L, 0L, 0L, 0L), 2945L),
    ("tech", Seq(85L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 799L, 0L, 0L, 0L, 144L, 2922L), Seq(115L, 885L, 0L, 0L, 0L, 0L), 1980L),
    ("business", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1613L, 2328L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 2784L),
    ("politics", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 76L, 204L, 1426L, 2322L), Seq(0L, 971L, 33L, 0L, 0L, 0L), 1936L),
    ("health", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3528L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 3171L),
    ("sports", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1356L, 2520L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 4630L),
    ("science", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3528L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 3672L),
    ("entertainment", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 437L, 949L, 2587L), Seq(0L, 953L, 53L, 0L, 0L, 0L), 3150L),
    ("world", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 582L, 521L, 1205L, 2072L), Seq(0L, 889L, 127L, 0L, 0L, 0L), 2823L),
    ("security", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3475L, 0L, 0L, 0L, 0L, 1512L), Seq(457L, 543L, 0L, 0L, 0L, 0L), 3850L),
    ("product", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 529L, 0L, 0L, 0L, 206L, 3068L), Seq(70L, 930L, 0L, 0L, 0L, 0L), 2047L),
    ("design", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1520L, 0L, 0L, 0L, 0L, 2646L), Seq(200L, 800L, 0L, 0L, 0L, 0L), 2895L),
    ("culture", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 262L, 190L, 3246L), Seq(0L, 972L, 32L, 0L, 0L, 0L), 2733L),
    ("environment", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 2034L, 2016L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 3999L),
    ("lifestyle", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 475L, 3175L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 3045L),
    ("art_culture", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 8127L),
    ("developer_insights", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 7433L),
    ("pro_it_media", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("consumer_tech", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 7028L),
    ("global_politics", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("environment_policy", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("society_justice", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 8127L),
    ("travel_lifestyle", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("security_policy", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("business_finance", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3528L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 7028L),
    ("ai_research", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("ai_policy", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 0L),
    ("games_puzzles", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L, 0L), 7433L),
    ("other", Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 3528L), Seq(0L, 1000L, 0L, 0L, 0L, 0L), 2481L)
  )

  val genres: Seq[String] = weightRows.map(_._1)

  /** C_gt = idf_t·W_gt + Σ_d mu_td·E_gd in exact 1e-6 units — the
    * tfidf and embedding channels share the hits denominator, so one
    * integer coefficient carries both.
    */
  val coefU: Seq[(String, Seq[Long])] = {
    val emb = GenreRetrain.embedLookup.toMap
    weightRows.map { case (g, w, e, _) =>
      g -> GenreRetrain.vocab.zipWithIndex.map { case (t, ti) =>
        idfU(ti) * w(ti) +
          emb(t).zip(e).map { case (mu, ew) => mu * ew }.sum
      }
    }
  }

  /** (doc_id, toks) — gw03's composed corpus re-tokenized the same
    * way (lower, full-width fold, whitespace split; extract's own
    * per-token lowercasing is idempotent over it).
    */
  def composeTokens(s: SparkSession, dir: String): DataFrame =
    GenreRetrain.composeSamples(s, dir).select(col("doc_id"),
      filter(split(lower(translate(col("text"), "　", " ")), "\\s+"),
        t => t =!= "").as("toks"))

  private def rawCols = GenreRetrain.vocab.zipWithIndex.map { case (t, i) =>
    size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"r_$i")
  }

  private def lengthNorm: Column =
    when(col("dl") > 0,
      lit(1.0) - lit(B) + lit(B) * (col("dl").cast("double") / AvgDocLen))
      .otherwise(1.0)

  private def bm25Of(raw: Column, ti: Int): Column =
    lit(idfU(ti) / 1000.0) * (raw.cast("double") * (K1 + 1.0)) /
      (raw.cast("double") + lit(K1) * col("ln"))

  /** hm01 over any (doc_id, toks) frame: hit rows
    * (doc_id, term, raw, total_hits, doc_len, tfidf, bm25).
    */
  def featuresOn(docs: DataFrame): DataFrame = {
    val wide = docs.select(
      (col("doc_id") +: size(col("toks")).cast("long").as("dl") +: rawCols): _*)
      .withColumn("hits",
        GenreRetrain.vocab.indices.map(i => col(s"r_$i")).reduce(_ + _))
      .withColumn("ln", lengthNorm)
    val stackArgs = GenreRetrain.vocab.indices
      .map(i => s"'${GenreRetrain.vocab(i).replace("'", "''")}', r_$i, ${idfU(i)}L")
      .mkString(", ")
    wide
      .select(col("doc_id"), col("dl"), col("hits"), col("ln"),
        expr(s"stack(${GenreRetrain.vocab.size}, $stackArgs) AS (term, raw, idf_u)"))
      .filter(col("raw") > 0)
      .select(col("doc_id"), col("term"), col("raw"),
        col("hits").as("total_hits"), col("dl").as("doc_len"),
        microRound((col("raw").cast("double") / col("hits")) *
          (col("idf_u") / 1000.0), 6).as("tfidf"),
        microRound((col("idf_u") / 1000.0) *
          (col("raw").cast("double") * (K1 + 1.0)) /
          (col("raw").cast("double") + lit(K1) * col("ln")), 6).as("bm25"))
  }

  /** hm02 over any (doc_id, toks) frame: the per-doc top-3
    * (doc_id, rank, genre, score, bm25_peak).
    */
  def scoresOn(docs: DataFrame): DataFrame = {
    // Two ev33 explode barriers: the first materializes ONE pass over
    // the full token array (vocabulary membership filter) so the 19
    // per-term counts scan only the tiny hit list; the second
    // materializes the 19-count array so the 29 genre numerators
    // reference attributes instead of re-inlined scans. Without them
    // CollapseProject re-inlined the full-array scans into all ~580
    // uses — measured 575 s; with them, sub-second at sf0.1.
    val pre = docs.select(col("doc_id"),
      explode(array(struct(
        size(col("toks")).cast("long").as("dl"),
        filter(col("toks"),
          t => array_contains(typedLit(GenreRetrain.vocab), t)).as("ht"))))
        .as("x"))
      .select(col("doc_id"), col("x.dl").as("dl"), col("x.ht").as("ht"))
    val wide = pre.select(col("doc_id"), col("dl"),
      explode(array(struct(transform(typedLit(GenreRetrain.vocab),
        v => size(filter(col("ht"), t => t === v)).cast("long")).as("raw"))))
        .as("y"))
      .select(col("doc_id"), col("dl"), col("y.raw").as("raw_arr"))
      .withColumn("hits",
        aggregate(col("raw_arr"), lit(0L), (acc, x) => acc + x))
      .withColumn("ln", lengthNorm)
    // integer numerator per genre, as HOF loops over literal arrays —
    // the unrolled 29×19 formulation generated a ~600-op expression
    // tree that fell out of codegen (measured 5.7 s vs sub-second)
    val coefMat = typedLit(coefU.map(_._2))
    val biasArr = typedLit(weightRows.map(_._4))
    val genreArr = typedLit(genres)
    val idfArr = typedLit(idfU)
    val rawArr = col("raw_arr")
    val entries = transform(sequence(lit(0), lit(genres.size - 1)), gi => {
      val biasU = element_at(biasArr, gi + 1)
      val s = aggregate(
        zip_with(rawArr, element_at(coefMat, gi + 1), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      val n = biasU * col("hits") * lit(1000L) + s
      val key = when(col("hits") > 0, n).otherwise(biasU)
      val score = when(col("hits") > 0,
        n.cast("double") / (col("hits").cast("double") * 1e6))
        .otherwise(biasU.cast("double") / 1000.0)
      struct(key.as("key"), (lit(0) - gi).as("negi"),
        element_at(genreArr, gi + 1).as("genre"),
        microRound(score, 6).as("score"))
    })
    val peak = coalesce(
      array_max(zip_with(rawArr, idfArr, (raw, idfu) =>
        when(raw > 0,
          (idfu.cast("double") / 1000.0) * (raw.cast("double") * (K1 + 1.0)) /
            (raw.cast("double") + lit(K1) * col("ln"))))),
      lit(0.0))
    wide
      .withColumn("top3",
        slice(reverse(array_sort(entries)), 1, 3))
      .withColumn("bm25_peak", microRound(peak, 6))
      .select(col("doc_id"), col("bm25_peak"),
        posexplode(col("top3")).as(Seq("pos", "e")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"),
        col("e.genre").as("genre"), col("e.score").as("score"),
        col("bm25_peak"))
  }

  /** hm03: the DYNAMIC vocabulary builder — features.rs
    * build_from_corpus (:166-241), the startup path workflow.rs:146
    * runs over the golden dataset (from_golden_dataset → vocab_size
    * 1000):
    *  - document frequency over per-document UNIQUE lowercased
    *    tokens; total token count over the RAW (non-deduped) lists;
    *  - the top vocab_size tokens by DF descending — Rust's stable
    *    sort_by_key(Reverse(df)) keeps HashMap iteration order on
    *    ties, which is nondeterministic; determinized as
    *    (df desc, token asc), mirrored in the oracle;
    *  - idf = ln((N+1)/(df+1)) + 1 (the gw03 smooth formula, unrounded
    *    here — output quantizes once at 1e-6);
    *  - avg_doc_len = total_tokens/total_docs, the :208 empty-corpus
    *    320.0 fallback kept.
    *
    * Scale: ONE corpus explode onto distinct-token keys (map-side
    * combined), a TakeOrdered top-K for the vocabulary cut, and a
    * row_number on the ≤vocab_size SELECTED frame only (never a
    * corpus window); totals ride a one-row broadcast.
    */
  val VocabSize = 1000

  def corpusVocabOn(docs: DataFrame, vocabSize: Int = VocabSize): DataFrame = {
    val tot = docs.agg(
      count(lit(1)).as("total_docs"),
      sum(size(col("toks"))).cast("long").as("total_tokens"))
    val dfq = docs
      .select(explode(array_distinct(transform(col("toks"), t => lower(t))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val top = dfq.orderBy(col("df").desc, col("token").asc).limit(vocabSize)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("token").asc)))
    top.crossJoin(broadcast(tot))
      .select(col("rank").cast("int").as("rank"), col("token"), col("df"),
        microRound(log((col("total_docs") + 1).cast("double") / (col("df") + 1))
          + 1.0, 6).as("idf"),
        col("total_docs"), col("total_tokens"),
        when(col("total_docs") > 0,
          microRound(col("total_tokens").cast("double")
            / col("total_docs").cast("double"), 6)).otherwise(320.0)
          .as("avg_doc_len"))
  }

  def hm03(s: SparkSession, dir: String): DataFrame =
    corpusVocabOn(composeTokens(s, dir))

  def hm01(s: SparkSession, dir: String): DataFrame =
    featuresOn(composeTokens(s, dir))

  def hm02(s: SparkSession, dir: String): DataFrame =
    scoresOn(composeTokens(s, dir))
}
