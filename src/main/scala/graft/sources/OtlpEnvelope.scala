package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested OTLP export envelope → flat log records.
  *
  * Mirrors rask-log-aggregator's converter
  * (rask-log-aggregator/app/src/otlp/converter.rs:16
  * convert_log_records): an ExportLogsServiceRequest nests
  * resource_logs[] → scope_logs[] → log_records[], with resource and
  * scope attributes inherited by every record beneath them. The Rust
  * agent walks the nesting imperatively (Arc-sharing the attribute
  * maps); here the same flattening is three generator (explode)
  * projections, so it runs inside the scan with no shuffle — one
  * envelope row with thousands of records fans out in place on its
  * partition, and attribute maps are carried by reference in Tungsten
  * rows, not copied per record.
  *
  * Expected input schema (what `spark.read.json` infers from an OTLP
  * JSON export):
  *   resource_logs: array<struct<
  *     resource_attrs: map<string,string>,
  *     scope_logs: array<struct<
  *       scope_name: string,
  *       log_records: array<struct<
  *         ts: timestamp, severity_number: int, body: string,
  *         attrs: map<string,string>>>>>>>
  */
object OtlpEnvelope {

  /** Flatten envelopes to one row per log record, inheriting resource
    * attributes and scope name. Record/resource attribute maps stay
    * separate columns (merging them needs a duplicate-key policy —
    * callers pick precedence explicitly).
    */
  def flattenLogs(envelopes: DataFrame): DataFrame =
    envelopes
      .select(explode(col("resource_logs")).as("rl"))
      .select(col("rl.resource_attrs").as("resource_attrs"),
        explode(col("rl.scope_logs")).as("sl"))
      .select(col("resource_attrs"), col("sl.scope_name").as("scope_name"),
        explode(col("sl.log_records")).as("r"))
      .select(
        col("r.ts").as("ts"),
        col("r.severity_number").as("severity_number"),
        col("r.body").as("body"),
        col("r.attrs").as("attrs"),
        col("scope_name"),
        col("resource_attrs"))

  /** The aggregator's severity rollup: ERROR-and-above share per
    * service (OTel severity_number >= 17 is ERROR — the same
    * `countIf(SeverityNumber >= 17)` the sli_error_rate_mv runs).
    * Service name comes from the standard `service.name` resource
    * attribute.
    */
  def severityRollup(flat: DataFrame): DataFrame =
    flat
      .groupBy(col("resource_attrs").getItem("service.name").as("service"))
      .agg(
        count(lit(1)).as("n_records"),
        count(when(col("severity_number") >= 17, 1)).as("n_errors"))
      .withColumn("error_share", graft.functions.Numeric.microRatio(col("n_errors"), col("n_records"), 4))
}
