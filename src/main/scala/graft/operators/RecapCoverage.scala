package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRound

/** qe06: recap COVERAGE — the fourth deterministic LLM-output
  * evaluation axis (qe01 grounding, qe02/qe04 redundancy, rp01
  * degeneration, THIS: does the summary cover what the clusters
  * said?). Reference: scripts/compute_recap_coverage.py —
  * `compute_coverage` (:162): char_wb 2-4-gram TF-IDF fit on the
  * (job, genre) group's bullets+centroids, per-bullet max cosine to
  * any centroid, mean over bullets; `compute_job_metrics` (:179):
  * per-genre rows plus the job-level mean/std/min/max rollup
  * (population std, 0.0 for a single genre — the n=1 formula
  * degenerates to 0 identically).
  *
  * The vectorizer is sklearn's TfidfVectorizer(analyzer='char_wb',
  * ngram_range=(2,4)) re-derived from its public semantics: lowercase,
  * whitespace-split words padded with one space each side, sliding
  * n-grams per size WITHIN the padded word, a padded word shorter
  * than n contributing itself once and stopping larger sizes;
  * smooth idf = ln((1+N)/(1+df)) + 1; l2-normalized tf·idf rows.
  * max_features=2048 never binds on these corpora (bounded synthetic
  * vocabulary) and is not modeled.
  *
  * Cross-engine determinism (the fz01/qe04 integer-moment
  * discipline): idf quantizes to micro-unit longs once; tf·idf
  * components are then EXACT integers, so norms (Σu², decimal 38),
  * dots (Σ uᵇ·uᶜ, decimal 38) and every downstream moment are
  * order-independent integers; cosine = exact-int dot / one IEEE
  * product of two identical sqrts; per-bullet maxima quantize to
  * micro-units before the means. sklearn's float chain differs from
  * this exact-integer chain only below the 1e-6 quantum.
  *
  * Scale: grams/tf/df/idf are linear scans with bounded-key
  * aggregations; the cosine is the SAME dense bullets×centroids
  * product the reference computes, expressed as a gram-keyed
  * equi-join — quadratic only WITHIN a (job, genre) group (the
  * reference's own shape), embarrassingly parallel across groups,
  * and never all-pairs across the corpus.
  *
  * Composition: 4% of documents become texts (6-word slices),
  * halves split into bullets/centroids on independent residues from
  * the job/genre keys; genre g2 keeps no centroids — the
  * empty-centroids → coverage 0.0 early-return (:164) executes on
  * real rows.
  */
object RecapCoverage {

  private val dec = "decimal(38,0)"

  /** Composed (job_id, genre, kind, tid, text) recap texts. */
  def composeTexts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") % 25 === 0)
      .select(
        (floor(col("doc_id") / 50) % 2).cast("long").as("job_id"),
        concat(lit("g"), (floor(col("doc_id") / 100) % 3).cast("string")).as("genre"),
        when(col("doc_id") % 50 === 0, "b").otherwise("c").as("kind"),
        col("doc_id").as("tid"),
        array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ").as("text"))
      .filter(!(col("kind") === "c" && col("genre") === "g2"))

  /** sklearn _char_wb_ngrams of one padded word, one size. */
  private def gramsN(p: Column, n: Int): Column =
    when(length(p) > n,
      transform(sequence(lit(1), length(p) - n + 1), i => p.substr(i, lit(n))))
      .when(length(p) === n, array(p))
      .otherwise(array().cast("array<string>"))

  /** All char_wb 2-4-grams of ONE word (unpadded input), in sklearn's
    * per-size order — public so the gram rule is spec-pinnable.
    */
  def charWbGrams(word: Column): Column = {
    val p = concat(lit(" "), word, lit(" "))
    concat(gramsN(p, 2), gramsN(p, 3), gramsN(p, 4))
  }

  /** Per-genre coverage + job rollup over any (job_id, genre, kind,
    * tid, text) frame with kind ∈ {b, c}.
    */
  def coverageOn(texts: DataFrame): DataFrame = {
    val keys = Seq("job_id", "genre")
    val docs = texts.cache()
    val tf = docs
      .select(col("job_id"), col("genre"), col("kind"), col("tid"),
        explode(filter(split(col("text"), "\\s+"), w => w =!= "")).as("w"))
      .select(col("job_id"), col("genre"), col("kind"), col("tid"),
        explode(charWbGrams(col("w"))).as("g"))
      .groupBy("job_id", "genre", "kind", "tid", "g")
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kind") === "b", 1L).otherwise(0L)).as("n_bullets"),
        sum(when(col("kind") === "c", 1L).otherwise(0L)).as("n_centroids"))
    val idf = tf.groupBy("job_id", "genre", "g").agg(count(lit(1)).as("df"))
      .join(nDocs.select("job_id", "genre", "n_docs"), keys)
      .select(col("job_id"), col("genre"), col("g"),
        round((log((col("n_docs") + 1) / (col("df") + 1)) + 1) * 1e6, 0)
          .cast("long").as("idf_u"))
    val comp = tf.join(idf, keys :+ "g")
      .select(col("job_id"), col("genre"), col("kind"), col("tid"), col("g"),
        (col("tf") * col("idf_u")).as("cu"))
      .cache()
    val norms = comp.groupBy("job_id", "genre", "kind", "tid")
      .agg(sqrt(sum(col("cu").cast(dec) * col("cu")).cast("double")).as("norm"))
    val b = comp.filter(col("kind") === "b")
      .select(col("job_id"), col("genre"), col("g"),
        col("tid").as("btid"), col("cu").as("bu"))
    val c = comp.filter(col("kind") === "c")
      .select(col("job_id"), col("genre"), col("g"),
        col("tid").as("ctid"), col("cu").as("ccu"))
    val cos = b.join(c, keys :+ "g")
      .groupBy("job_id", "genre", "btid", "ctid")
      .agg(sum(col("bu").cast(dec) * col("ccu")).as("dot"))
      .join(norms.filter(col("kind") === "b")
        .select(col("job_id"), col("genre"), col("tid").as("btid"),
          col("norm").as("bnorm")), keys :+ "btid")
      .join(norms.filter(col("kind") === "c")
        .select(col("job_id"), col("genre"), col("tid").as("ctid"),
          col("norm").as("cnorm")), keys :+ "ctid")
      .select(col("job_id"), col("genre"), col("btid"),
        (col("dot").cast("double") / (col("bnorm") * col("cnorm"))).as("cos"))
    val bmax = docs.filter(col("kind") === "b")
      .select(col("job_id"), col("genre"), col("tid").as("btid"))
      .join(cos.groupBy("job_id", "genre", "btid").agg(max("cos").as("mc")),
        keys :+ "btid", "left")
      .select(col("job_id"), col("genre"),
        coalesce(round(col("mc") * 1e6, 0).cast("long"), lit(0L)).as("mu"))
    val genreCov = bmax.groupBy(keys.map(col): _*)
      .agg(sum("mu").as("smu"), count(lit(1)).as("nb"))
      .join(nDocs, keys)
      .select(col("job_id"), col("genre"), col("n_bullets"), col("n_centroids"),
        when(col("n_centroids") === 0, 0L)
          .otherwise(round(col("smu") / col("nb"), 0).cast("long")).as("cu"))
      .cache()
    val job = genreCov.groupBy("job_id").agg(
      count(lit(1)).as("ng"),
      sum("cu").as("su"),
      sum(col("cu").cast(dec) * col("cu")).as("su2"),
      min("cu").as("mn"), max("cu").as("mx"),
      sum("n_bullets").as("job_bullets"),
      sum("n_centroids").as("job_centroids"))
    genreCov.join(broadcast(job), Seq("job_id"))
      .select(col("job_id"), col("genre"),
        (col("cu") / 1e6).as("coverage"),
        col("n_bullets"), col("n_centroids"),
        (round(col("su") / col("ng"), 0).cast("long") / 1e6).as("job_avg"),
        microRound(
          sqrt((col("su2") * col("ng") - col("su").cast(dec) * col("su"))
            .cast("double")) / (col("ng").cast("double") * 1e6), 6).as("job_std"),
        (col("mn") / 1e6).as("job_min"),
        (col("mx") / 1e6).as("job_max"),
        col("ng").as("job_genres"),
        col("job_bullets"), col("job_centroids"))
  }

  def qe06(s: SparkSession, dir: String): DataFrame =
    coverageOn(composeTexts(s, dir))
}
