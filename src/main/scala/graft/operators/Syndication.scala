package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Syndication removal — recap-worker's pulse wire-copy filter
  * (recap-worker/recap-worker/src/pipeline/pulse/syndication.rs), the
  * three-stage pipeline that keeps one original per syndicated story:
  *
  *  - Stage 1 (:184 remove_by_canonical): group by the canonical key
  *    — canonical_url, else og_url, NORMALIZED (fragment stripped,
  *    :327); articles with neither fall back to their RAW source_url
  *    (the reference normalizes only the metadata URLs) — and keep
  *    the FIRST article per group, the rest removed as
  *    CanonicalMatch with the keeper as original_id.
  *  - Stage 2 (:220 remove_wire_sources): drop survivors whose
  *    source HOST (scheme stripped, path/query/fragment/port split
  *    off, :308) suffix-matches a known wire service (:21
  *    WIRE_SOURCES).
  *  - Stage 3 (:242, title bigram-Jaccard leader clustering) is
  *    DISABLED by default in the reference config; it ships here as
  *    [[titleLeaderClusters]] — spec-verified, not on the oracle
  *    path, matching the reference's default.
  *
  * Scale: stage 1 is one window on the canonical key (rn = 1 keeps —
  * the tx06 first-wins discipline); stage 2 a stateless host-parse
  * filter fused into the scan. Stage 3's sequential greedy folds
  * per CLUSTER (pulse clusters are small); the fold is a Spark HOF
  * aggregate over the collected per-cluster list — linear in group
  * size, never a pairwise join.
  */
object Syndication {

  val WireSources: Seq[String] = Seq(
    "reuters.com", "apnews.com", "afp.com", "kyodonews.jp",
    "jiji.com", "prnewswire.com", "businesswire.com", "globenewswire.com")

  /** normalize_url (:327): trim + strip the #fragment. */
  def normalizeUrl(url: Column): Column =
    split(trim(url), "#").getItem(0)

  /** extract_host (:308): scheme off, split at /?#, port off. */
  def extractHost(url: Column): Column = {
    val t = trim(url)
    val noScheme = when(t.startsWith("https://"), t.substr(lit(9), length(t)))
      .when(t.startsWith("http://"), t.substr(lit(8), length(t)))
      .otherwise(t)
    split(split(noScheme, "[/?#]").getItem(0), ":").getItem(0)
  }

  /** is_wire_source (:292): lowercased host suffix/equality match
    * against the wire list.
    */
  def isWireSource(host: Column): Column =
    WireSources.map(w => lower(host).endsWith(w) || lower(host) === w)
      .reduce(_ || _)

  /** Composed article metadata over the documents corpus: id slices
    * share canonical urls (some only up to a #fragment — the
    * normalization case), og-only and bare-source articles exist, and
    * a residue class lands on wire hosts.
    */
  def articlesFromDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val host = when(pmod(col("doc_id"), lit(11)) === 0, "www.reuters.com")
      .when(pmod(col("doc_id"), lit(13)) === 0, "apnews.com")
      .when(pmod(col("doc_id"), lit(17)) === 0, "feeds.prnewswire.com")
      .when(pmod(col("doc_id"), lit(3)) === 0, "www.nytimes.com")
      .otherwise("techcrunch.com")
    d.select(col("doc_id").as("id"), col("doc_id").as("pos"),
      concat(lit("https://"), host, lit("/a/"), col("doc_id")).as("source_url"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("https://canon.example.com/story/"), pmod(col("doc_id"), lit(40)),
          when(pmod(col("doc_id"), lit(10)) === 0, concat(lit("#sec"), pmod(col("doc_id"), lit(3))))
            .otherwise(lit(""))))
        .otherwise(lit(null).cast("string")).as("canonical_url"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit("https://og.example.com/o/"), pmod(col("doc_id"), lit(60))))
        .otherwise(lit(null).cast("string")).as("og_url"))
  }

  /** dd06: the per-article syndication verdict after stages 1+2 —
    * status ∈ kept / canonical_match / wire_source, with the keeper's
    * id on canonical removals.
    */
  def syndicationOn(articles: DataFrame): DataFrame = {
    val key = coalesce(
      normalizeUrl(coalesce(col("canonical_url"), col("og_url"))),
      col("source_url"))
    val w = Window.partitionBy("group_key").orderBy(col("pos").asc, col("id").asc)
    val staged = articles.withColumn("group_key", key)
      .withColumn("rn", row_number().over(w))
      .withColumn("keeper_id", first("id").over(
        Window.partitionBy("group_key").orderBy(col("pos").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    staged.select(col("id"),
      when(col("rn") > 1, "canonical_match")
        .when(isWireSource(extractHost(col("source_url"))), "wire_source")
        .otherwise("kept").as("status"),
      when(col("rn") > 1, col("keeper_id")).as("original_id"))
  }

  def dd06(s: SparkSession, dir: String): DataFrame =
    syndicationOn(articlesFromDocs(s, dir))

  /** Stage 3 (:242): title-similarity leader clustering — the
    * SEQUENTIAL greedy where each unabsorbed article becomes an
    * original and absorbs every LATER article whose title bigram
    * Jaccard reaches the threshold (absorbed articles can't absorb);
    * an article is attributed to the FIRST original that reaches it.
    * Similarity follows title_similarity (:336): both empty → 1.0,
    * one empty → 0.0. The fold runs per cluster over the collected
    * (pos-sorted) member list — linear, order-exact.
    */
  def titleLeaderClusters(titled: DataFrame, threshold: Double = 0.6): DataFrame = {
    // word_ngrams (:359): whitespace split, ascii-punct trim per word,
    // empties dropped, lowercased bigrams as a SET
    val words = expr(
      """filter(transform(split(lower(trim(title)), '\\s+'),
                w -> regexp_replace(w, '^\\p{Punct}+|\\p{Punct}+$', '')),
              w -> w != '')""")
    val grouped = titled
      .withColumn("ws", words)
      .withColumn("bg", expr(
        """array_distinct(transform(
             slice(ws, 1, greatest(size(ws) - 1, 0)),
             (w, i) -> concat(w, ' ', element_at(ws, i + 2))))"""))
      .groupBy("cluster_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("id"), col("bg")))).as("arr"))
    val sim =
      s"""CASE WHEN size(o.bg) = 0 AND size(x.bg) = 0 THEN 1.0D
               WHEN size(o.bg) = 0 OR size(x.bg) = 0 THEN 0.0D
               ELSE size(array_intersect(o.bg, x.bg)) / size(array_union(o.bg, x.bg)) END"""
    val folded = expr(
      s"""aggregate(arr,
           named_struct(
             'origs', cast(array() as array<struct<id:bigint,bg:array<string>>>),
             'removed', cast(array() as array<struct<id:bigint,orig:bigint>>)),
           (acc, x) -> CASE
             WHEN exists(acc.origs, o -> $sim >= $threshold)
             THEN named_struct('origs', acc.origs,
               'removed', concat(acc.removed, array(named_struct('id', x.id,
                 'orig', filter(acc.origs, o -> $sim >= $threshold)[0].id))))
             ELSE named_struct(
               'origs', concat(acc.origs, array(named_struct('id', x.id, 'bg', x.bg))),
               'removed', acc.removed) END)""")
    grouped.select(col("cluster_id"), folded.as("f"))
      .select(col("cluster_id"),
        expr("transform(f.origs, o -> o.id)").as("original_ids"),
        col("f.removed").as("removed"))
  }
}
