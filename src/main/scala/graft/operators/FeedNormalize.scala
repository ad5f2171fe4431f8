package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** ur01: feed-URL canonicalization + keep-oldest dedup — reference
  * scripts/normalize_feed_urls.go:
  *
  *  - `normalizeURL` (:42): drop the fragment; remove tracking
  *    params by CASE-INSENSITIVE name (the 10-entry utm/fbclid/gclid
  *    set); sort surviving params by KEY keeping per-key value order
  *    (url.Values is insertion-ordered) and rebuild as k=v pairs —
  *    a bare `flag` param gains its '=' (Go always writes both
  *    sides); uppercase percent-encodings (:94); strip ONE trailing
  *    slash unless it terminates "://" or follows another slash
  *    (:84 — note the code strips the root slash too; the comment
  *    lies, the CODE is the contract);
  *  - dedup (:171): group by normalized URL, keep the OLDEST
  *    (created_at asc — feed_id tiebreak added for determinism),
  *    update the keeper when its link differs, delete the rest;
  *    `skipped` counts only SINGLETON already-normalized feeds (a
  *    keeper whose link already matches increments nothing — kept
  *    as the distinct noop_keeper action).
  *
  * Re-expression bounds (documented, composed within them): query
  * components that need Go's QueryEscape round-trip are not
  * composed (the canonicalization seams under test are the
  * strip/sort/case rules), and '%' appears only in well-formed %xx
  * triples, where the split-rejoin uppercase transform and Go's
  * index walk agree.
  *
  * Scale: normalization is a stateless scan projection (bounded
  * array ops over ≤|params| elements); the dedup is ONE window over
  * normalized-URL groups — a single shuffle keyed by the canonical
  * URL, the exact shape of dd03's ingest gate with resolution
  * attached.
  */
object FeedNormalize {

  /** trackingParams (:29), lowercased. */
  val trackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "fbclid", "gclid", "mc_eid", "msclkid")

  /** Composed feeds: (feed_id, created_at, link) — slugs off a
    * 31-word vocabulary force real duplicate groups; each residue
    * plants one normalization rule.
    */
  def composeFeeds(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val slug = element_at(split(trim(col("text")), "\\s+"), 2)
    val dom = concat(lit("https://ex"), (col("doc_id") % 5).cast("string"), lit(".com"))
    val idp = concat(lit("id="), (col("doc_id") % 7).cast("string"))
    val link =
      when(col("doc_id") % 6 === 0,
        concat(dom, lit("/p/"), slug, lit("?utm_source=rss&UTM_Campaign=x&"), idp))
        .when(col("doc_id") % 6 === 1,
          concat(dom, lit("/p/"), slug, lit("?"), idp, lit("&utm_medium=email&flag")))
        .when(col("doc_id") % 6 === 2,
          concat(dom, lit("/p/"), slug, lit("?zz=9&"), idp, lit("#section-3")))
        .when(col("doc_id") % 6 === 3, concat(dom, lit("/p/"), slug, lit("/")))
        .when(col("doc_id") % 6 === 4,
          concat(dom, lit("/p%2f"), slug, lit("?"), idp))
        .otherwise(concat(dom, lit("/p%2F"), slug, lit("?"), idp))
    d.select(col("doc_id").as("feed_id"), col("doc_id").as("created_at"),
      link.as("link"))
  }

  /** normalizeURL as a Column over `link`. */
  def normalizeUrl(link: Column): Column = {
    val noFrag = regexp_replace(link, "#.*$", "")
    val base = substring_index(noFrag, "?", 1)
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1)
    val rawParams = filter(split(qs, "&"), p => p =!= "")
    val kept = filter(rawParams, p =>
      !array_contains(typedLit(trackingParams), lower(substring_index(p, "=", 1))))
    val kv = transform(kept, (p, i) => struct(
      substring_index(p, "=", 1).as("k"),
      i.as("i"),
      concat(substring_index(p, "=", 1), lit("="),
        regexp_extract(p, "^[^=]*=(.*)$", 1)).as("p")))
    val newQs = array_join(transform(array_sort(kv), x => x.getField("p")), "&")
    val rebuilt = when(size(kept) > 0, concat(base, lit("?"), newQs)).otherwise(base)
    val segs = split(rebuilt, "%", -1)
    val upped = array_join(transform(segs, (p, i) =>
      when(i === 0 || length(p) < 2, p)
        .otherwise(concat(upper(substring(p, 1, 2)), p.substr(lit(3), length(p))))), "%")
    when(length(upped) > 1 && upped.endsWith("/") && !upped.endsWith("://") &&
      substring(upped, -2, 1) =!= "/",
      upped.substr(lit(1), length(upped) - 1)).otherwise(upped)
  }

  /** The dedup resolution over any (feed_id, created_at, link) frame. */
  def dedupOn(feeds: DataFrame): DataFrame = {
    val w = Window.partitionBy("normalized")
      .orderBy(col("created_at"), col("feed_id"))
    feeds
      .withColumn("normalized", normalizeUrl(col("link")))
      .withColumn("rn", row_number().over(w))
      .withColumn("gn", count(lit(1)).over(
        Window.partitionBy("normalized")))
      .withColumn("keeper_id", first("feed_id").over(w))
      .select(col("feed_id"), col("link"), col("normalized"),
        when(col("rn") > 1, "deleted")
          .when(col("link") =!= col("normalized"), "updated")
          .when(col("gn") === 1, "skipped")
          .otherwise("noop_keeper").as("action"),
        col("keeper_id"))
  }

  def ur01(s: SparkSession, dir: String): DataFrame =
    dedupOn(composeFeeds(s, dir))
}
