package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{tokenCount, tokens}
import graft.functions.Numeric.microRound

/** Materialized search-index build — the search-indexer's batch job
  * (search-indexer/app builds the index its search service queries)
  * re-expressed as a lake layout instead of a service call: positional
  * postings and per-document stats land as tables BUCKETED BY doc_id,
  * so the index-build shuffle is paid once at write time and the
  * query-time joins that matter — BM25 score × doc length, phrase
  * adjacency postings ⋈ postings — run with zero exchanges against
  * co-located buckets (Scale.writeBucketed's contract, applied to the
  * search surface; tx18/tx31 compute the same answers inline, this is
  * their serve-many-queries form).
  *
  * At 100 TB the postings table is the inverted index of the corpus
  * (rows = distinct (doc, term) pairs); bucketing by doc_id makes
  * every per-document join shuffle-free, and term-selective queries
  * prune on the term filter before the join. Term statistics are
  * vocabulary-sized and broadcast at query time.
  */
object SearchIndex {

  /** Build the index tables from a (doc_id, text) corpus:
    * `<prefix>_postings` (doc_id, term, tf, positions) and
    * `<prefix>_docstats` (doc_id, dl) bucketed+sorted by doc_id;
    * `<prefix>_termstats` (term, df) plain (vocabulary-sized, the
    * broadcast side of every query).
    */
  def buildIndex(s: SparkSession, docs: DataFrame, prefix: String,
                 buckets: Int = 8): Unit = {
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    val postings = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"),
           sort_array(collect_list("pos")).as("positions"))
    Scale.writeBucketed(postings, s"${prefix}_postings", "doc_id", buckets)
    Scale.writeBucketed(
      docs.select(col("doc_id"), tokenCount(col("text")).as("dl")),
      s"${prefix}_docstats", "doc_id", buckets)
    // term stats derive from the just-written postings table — the
    // corpus-scale tokenize+aggregate shuffle runs ONCE, not again
    s.table(s"${prefix}_postings")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${prefix}_termstats")
  }

  /** BM25 top-k over the materialized index — tx18's exact scoring
    * (k1 = 1.2, b = 0.75, same rounding) but reading postings instead
    * of re-tokenizing the corpus. The postings ⋈ docstats join is
    * bucket-co-located (zero exchange); term stats broadcast; the only
    * exchange in the plan is the single-row corpus-stats scalar.
    */
  def bm25Query(s: SparkSession, prefix: String, query: Seq[String],
                k: Int = 20): DataFrame = {
    val post = s.table(s"${prefix}_postings")
      .filter(col("term").isin(query: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    val ds = s.table(s"${prefix}_docstats")
    val ts = s.table(s"${prefix}_termstats").filter(col("term").isin(query: _*))
    val stats = ds.agg(count(lit(1)).as("n_docs"), microRound(avg("dl"), 6).as("avgdl"))
    post.join(ds, "doc_id")
      .join(broadcast(ts), "term")
      .crossJoin(broadcast(stats))
      // identical micro-unit arithmetic to TextOps.bm25Search — ScaleSpec
      // pins score-for-score parity between the two paths
      .withColumn("idf", microRound(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1), 6))
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))) * 1e6,
          0).cast("long"))
      .groupBy("doc_id")
      .agg((round(sum("contrib_u") / 1e2, 0).cast("long") / 1e4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Exact-phrase hits over the materialized index: the two terms'
    * postings rows join on doc_id alone (bucket-co-located, zero
    * exchange — positions stay packed in their arrays, never
    * exploded), and adjacency is an array intersection of (first-term
    * positions + 1) with the second term's positions.
    */
  def phraseQuery(s: SparkSession, prefix: String,
                  first: String, second: String): DataFrame = {
    val post = s.table(s"${prefix}_postings")
    val pa = post.filter(col("term") === first)
      .select(col("doc_id"), col("positions").as("pos_a"))
    val pb = post.filter(col("term") === second)
      .select(col("doc_id"), col("positions").as("pos_b"))
    pa.join(pb, "doc_id")
      .withColumn("n_phrase_hits",
        size(array_intersect(transform(col("pos_a"), p => p + 1), col("pos_b"))))
      .filter(col("n_phrase_hits") > 0)
      .select("doc_id", "n_phrase_hits")
  }
}
