package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RSS/Atom feed-XML → article rows.
  *
  * Mirrors the reference's ingestion head: pre-processor fetches feed
  * XML and normalizes items into articles (alt-backend feeds/articles
  * tables). Spark 4 ships native XML support, so a column of raw
  * `<item>…</item>` payloads parses inside the scan with `from_xml` —
  * the ingestion becomes a declarative projection that Catalyst can
  * pipeline with downstream dedup/enrichment, batch or streaming.
  */
object FeedXml {

  val itemSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("link", StringType),
    StructField("pubDate", StringType),
    StructField("description", StringType)))

  /** Parse an RSS `<item>` XML string column into article columns. */
  def parseItems(xml: Column): Column =
    from_xml(xml, lit(itemSchema.toDDL))

  /** Feed payloads (feed_url, item_xml) → normalized article rows with
    * a stable article id (the exact-dedup key the reference derives
    * from the link URL).
    */
  def articles(feedItems: DataFrame): DataFrame =
    feedItems
      .withColumn("item", parseItems(col("item_xml")))
      .select(
        col("feed_url"),
        xxhash64(col("item.link")).as("article_id"),
        col("item.title").as("title"),
        col("item.link").as("link"),
        // RFC-822 pubDate. Spark 4's parser dropped day-of-week (EEE)
        // support → strip the "Mon, " prefix; accept both numeric
        // (+0000) and named (GMT) zones and 1-2 digit days; a malformed
        // date yields null, never an ANSI crash mid-ingestion.
        coalesce(
          try_to_timestamp(regexp_replace(col("item.pubDate"), "^[A-Za-z]{3},\\s*", ""),
            lit("d MMM yyyy HH:mm:ss Z")),
          try_to_timestamp(regexp_replace(col("item.pubDate"), "^[A-Za-z]{3},\\s*", ""),
            lit("d MMM yyyy HH:mm:ss zzz"))).as("published_at"),
        col("item.description").as("description"))
}
