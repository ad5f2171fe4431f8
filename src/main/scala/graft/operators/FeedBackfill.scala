package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** bf01: article → feed backfill — reference
  * scripts/backfill_article_feed_ids.py `backfill_feed_ids` (:46):
  * articles with a NULL feed_id resolve through an exact url = link
  * equi-join against `SELECT DISTINCT ON (link) … ORDER BY link,
  * created_at DESC, id DESC` (:120) — the NEWEST feed per link, id
  * as the tiebreak (the mirror image of ur01's keep-oldest rule);
  * articles that already carry a feed_id are untouched, unmatched
  * URLs stay NULL. The reference's keyset pagination (:78) is
  * driver-side batching mechanics — the Spark form IS the set-based
  * join it simulates.
  *
  * Scale: one window over feed links (the dedup), one equi-join on
  * the URL — both shuffle once on the same key family; no driver
  * loop, no per-batch round trips.
  */
object FeedBackfill {

  /** Composed feeds with genuine duplicate links (slug collisions),
    * ids in their own space.
    */
  def composeFeeds(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val slug = element_at(split(trim(col("text")), "\\s+"), 2)
    d.select(
      (col("doc_id") + 1000000L).as("feed_id"),
      col("doc_id").as("created_at"),
      concat(lit("https://ex"), (col("doc_id") % 5).cast("string"),
        lit(".com/p/"), slug).as("link"))
  }

  /** Composed articles: matching urls, a no-match residue, and a
    * pre-assigned residue the backfill must not touch.
    */
  def composeArticles(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val slug = element_at(split(trim(col("text")), "\\s+"), 2)
    d.select(
      col("doc_id").as("article_id"),
      when(col("doc_id") % 7 === 0,
        concat(lit("https://nomatch.example/a"), col("doc_id").cast("string")))
        .otherwise(concat(lit("https://ex"), (col("doc_id") % 5).cast("string"),
          lit(".com/p/"), slug)).as("url"),
      when(col("doc_id") % 11 === 0, -1L).otherwise(lit(null).cast("long"))
        .as("old_feed_id"))
  }

  /** The backfill over any (articles, feeds) pair. */
  def backfillOn(articles: DataFrame, feeds: DataFrame): DataFrame = {
    val newestPerLink = feeds
      .withColumn("rn", row_number().over(Window.partitionBy("link")
        .orderBy(col("created_at").desc, col("feed_id").desc)))
      .filter(col("rn") === 1)
      .select(col("link"), col("feed_id").as("resolved_feed_id"))
    articles
      .join(newestPerLink, articles("url") === newestPerLink("link"), "left")
      .select(col("article_id"), col("url"), col("old_feed_id"),
        when(col("old_feed_id").isNull, col("resolved_feed_id"))
          .otherwise(lit(null).cast("long")).as("matched_feed_id"),
        when(col("old_feed_id").isNotNull, "already_assigned")
          .when(col("resolved_feed_id").isNotNull, "updated")
          .otherwise("no_match").as("action"))
  }

  def bf01(s: SparkSession, dir: String): DataFrame =
    backfillOn(composeArticles(s, dir), composeFeeds(s, dir))
}
