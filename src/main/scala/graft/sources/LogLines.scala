package graft.sources

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Raw container-log-line → structured rows.
  *
  * Mirrors rask-log-forwarder's parse stage (the Rust agent tails
  * container stdout, extracts service/level/message/fields and ships
  * them to the ClickHouse `logs` table —
  * clickhouse/migrations/001_create_logs_table.sql). Here the same
  * extraction is a Catalyst projection over a text source, so parsing
  * runs distributed inside the scan (spark.read.text / readStream.text
  * both work) instead of in an agent.
  */
object LogLines {

  /** `2026-01-15T10:00:00.123Z INFO  alt-backend some message k=v` */
  private val pat = "^(\\S+)\\s+(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\\s+(\\S+)\\s+(.*)$"

  /** Parse a DataFrame with a `value` string column (the spark text
    * source contract) into (ts, level, service, message); unparseable
    * lines keep raw content with null fields rather than being dropped
    * (the forwarder's "never lose a log line" rule).
    */
  def parse(lines: DataFrame): DataFrame =
    lines.select(
      // try_to_timestamp: a matching-but-invalid first token (e.g.
      // "stdout INFO ...") must yield null ts, not an ANSI cast crash —
      // the forwarder's "never lose a log line" rule
      try_to_timestamp(nullif(regexp_extract(col("value"), pat, 1), lit(""))).as("ts"),
      nullif(regexp_extract(col("value"), pat, 2), lit("")).as("level"),
      nullif(regexp_extract(col("value"), pat, 3), lit("")).as("service"),
      nullif(regexp_extract(col("value"), pat, 4), lit("")).as("message"),
      col("value").as("raw"))

  /** Per-service/level counts — the `logs` table's rollup shape. */
  def levelCounts(parsed: DataFrame): DataFrame =
    parsed.filter(col("level").isNotNull)
      .groupBy("service", "level").agg(count(lit(1)).as("n"))
}
