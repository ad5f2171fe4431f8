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

  /** src07: multiline record reassembly — stack-trace continuation
    * lines (leading whitespace, `at …`, `Caused by:`, `... N more`)
    * fold into their nearest preceding header line, the one parse
    * problem a per-line forwarder cannot solve line-locally (a Java
    * trace arrives as 1 header + N continuations; shipping them as N+1
    * records shreds the error). Parent assignment is a running
    * last-non-null over (file, line_no) — one window, one shuffle —
    * then one grouped reassembly whose in-group order is made explicit
    * by sorting (line_no, text) structs (collect_list alone has no
    * order guarantee).
    *
    * Orphan continuations (a file starting mid-trace, e.g. a rotated
    * chunk) have no parent and are dropped — the rotation boundary
    * carry-over is the ingest scheduler's job, not the reassembler's.
    * At scale the partition key is (file, rotation chunk): files are
    * bounded by rotation, so no window ever exceeds one chunk.
    */
  def reassembleMultiline(lines: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines
      .withColumn("is_cont",
        col("text").rlike("^(\\s+|at |Caused by:|\\.\\.\\. )"))
      .withColumn("parent_no",
        last(when(!col("is_cont"), col("line_no")), ignoreNulls = true).over(w))
      .filter(col("parent_no").isNotNull)
      .groupBy(col("file"), col("parent_no"))
      .agg(
        min(when(!col("is_cont"), col("text"))).as("message"),
        (count(lit(1)) - 1).as("n_continuation"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_no"), col("text")))),
            p => p.getField("text")),
          "\n").as("full_text"))
  }
}
