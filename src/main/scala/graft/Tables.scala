package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All graft operators take these as inputs. Dimension tables
  * (region/nation/supplier/part/customer at TPC-H proportions) stay small
  * relative to the facts at any scale factor and are broadcast at join
  * sites; fact tables (lineitem/orders/events/documents/embeddings) are
  * scanned with predicate + column pushdown (keep projections narrow so
  * the parquet reader prunes columns).
  */
object Tables {
  /** Parquet written without isAdjustedToUTC reads as TIMESTAMP_NTZ,
    * which collects as java.time.LocalDateTime and refuses numeric
    * casts — every downstream unix_timestamp / getAs[Timestamp] site
    * expects an instant. Sessions run in UTC, so re-tagging the same
    * wall-clock micros as TimestampType is value-identical in both
    * engines (DuckDB reads the file directly either way). Applied to
    * every loader so a testdata regeneration that flips the writer's
    * timestamp flavor (it happened to events.ts in round 6) cannot
    * silently break the query surface again.
    */
  private def ntzToInstant(df: DataFrame): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(df)((d, c) =>
      d.withColumn(c, d.col(c).cast(org.apache.spark.sql.types.TimestampType)))

  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = ntzToInstant(s.read.parquet(s"$dir/orders.parquet"))
  def lineitem(s: SparkSession, dir: String): DataFrame  = ntzToInstant(s.read.parquet(s"$dir/lineitem.parquet"))
  /** events.ts has shipped in two physical encodings across testdata
    * generations: nanosecond int64 (which Spark 4 refuses to read as a
    * timestamp — handled via the legacy nanosAsLong conf + integral
    * division to micros) and plain timestamp[us]. Detect which one this
    * directory has and normalize to a microsecond TimestampType column;
    * both paths are bit-identical to DuckDB's CAST(ts AS TIMESTAMP),
    * which the oracles use.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => ntzToInstant(raw)
    }
    withCanonicalTypes(normalized,
      "event_id" -> "bigint", "user_id" -> "bigint", "value" -> "double")
  }
  /** Normalize columns a regeneration could plausibly re-encode (the
    * round-6 lesson generalized beyond timestamps: int32 vs int64 ids,
    * float vs double embeddings). A no-op when the file already
    * matches — the cast is only added when the physical type differs,
    * so today's scans stay untouched. The contract is "canonicalize to
    * the testdata's REFERENCE types", not "never lose precision": for
    * today's files every firing cast widens, but a regeneration that
    * shipped double embeddings or long labels would be NARROWED to the
    * canonical array<float>/int — deliberately, so every operator and
    * oracle keeps seeing one type, at the cost of the extra precision
    * such a file would carry.
    */
  private def withCanonicalTypes(df: DataFrame, casts: (String, String)*): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c) && d.schema(c).dataType.simpleString != t)
        d.withColumn(c, d.col(c).cast(t))
      else d
    }

  def documents(s: SparkSession, dir: String): DataFrame =
    withCanonicalTypes(s.read.parquet(s"$dir/documents.parquet"),
      "doc_id" -> "bigint", "n_chars" -> "bigint")
  def embeddings(s: SparkSession, dir: String): DataFrame =
    withCanonicalTypes(s.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
}
