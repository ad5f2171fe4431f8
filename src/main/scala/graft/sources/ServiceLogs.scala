package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** src08: per-service log parser dispatch — the format-dispatch
  * normalizer the reference's forwarder implements as one Rust parser
  * per producer (rask-log-forwarder/app/src/parser/services/mod.rs:
  * nginx.rs access+error, go.rs slog JSON, python_structlog.rs,
  * rust_tracing.rs, postgres.rs, meilisearch.rs). Each producer logs a
  * different shape; the pipeline needs ONE `ParsedLogEntry` schema
  * (mod.rs:34: service_type/log_type/message/level/timestamp + HTTP
  * fields + a string map of structured fields).
  *
  * Spark-first: detection and extraction are a single WHEN-chain of
  * codegen'd regex/JSON projections — no UDFs, no state — so the
  * identical operator body runs under batch and Structured Streaming
  * (the st14 discipline), and the scan stays one stateless pass.
  * Detection mirrors the reference's `can_parse` priorities
  * (mod.rs:71): specific text formats (nginx access/error, postgres,
  * meilisearch) are tried before the JSON family, and within JSON the
  * key shape disambiguates — `fields.message` + UPPERCASE level =
  * rust tracing, `event` = python structlog, `msg`/`message` = go slog
  * (the same rules rust_tracing.rs:224 and python_structlog.rs:220
  * test). A Docker runtime timestamp prefix before the JSON body is
  * stripped first (mod.rs:115 tests exactly that corruption).
  *
  * Unparseable lines are NOT dropped: they come back with
  * `service_type = null` and the raw line intact — the src06
  * dead-letter discipline ("never lose a log line"), so a quarantine
  * count per batch is one filter away.
  */
object ServiceLogs {

  private val ansiRe = "\u001B\\[[0-9;]*m"
  /** Docker runtime prefixes `2025-07-03T16:27:09.758077205Z {json}`. */
  private val dockerPrefixRe = "^\\d{4}-\\d{2}-\\d{2}T[0-9:.]+Z?\\s+"

  private val nginxAccessRe =
    "^(\\S+) \\S+ \\S+ \\[([^\\]]+)\\] \"(\\S+) (\\S+)[^\"]*\" (\\d{3}) (\\d+)(?: \"([^\"]*)\" \"([^\"]*)\")?.*$"
  private val nginxErrorRe =
    "^(\\d{4}/\\d{2}/\\d{2} \\d{2}:\\d{2}:\\d{2}) \\[(\\w+)\\] \\d+#\\d+: (.*)$"
  private val postgresRe =
    "^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d+) (\\w+) \\[\\d+\\] (\\w+): +(.*)$"
  private val meiliRe =
    "^(\\d{4}-\\d{2}-\\d{2}T\\S+) +(TRACE|DEBUG|INFO|WARN|ERROR) +(.*)$"

  private def extract(c: Column, re: String, g: Int): Column =
    nullif(regexp_extract(c, re, g), lit(""))

  /** Normalize the reference's level vocabulary (postgres LOG→info,
    * WARNING→warn, tracing's UPPERCASE) to lowercase tokens.
    */
  private def normLevel(c: Column): Column = {
    val l = lower(c)
    when(l.isin("log", "notice", "statement", "detail", "hint"), "info")
      .when(l === "warning", "warn")
      .when(l === "fatal", "error")
      .otherwise(l)
  }

  /** Parse a DataFrame with a `value` string column (spark text-source
    * contract, batch or streaming) into the unified entry schema:
    * (service_type, log_type, level, ts, message, method, path,
    * status_code, response_size, ip_address, user_agent, fields, raw).
    * `service_type` null = quarantined (unrecognized format).
    */
  def parse(lines: DataFrame): DataFrame = {
    val clean = regexp_replace(col("value"), ansiRe, "")
    val body = regexp_replace(clean, dockerPrefixRe, "")
    val jm = from_json(body, MapType(StringType, StringType))
    val isJson = body.startsWith("{") && jm.isNotNull
    // JSON sub-shapes (the can_parse rules): tracing nests its payload
    // under "fields"; structlog's message key is "event"; slog's is
    // "msg" (or "message")
    val isTracing = isJson && get_json_object(body, "$.fields.message").isNotNull &&
      element_at(jm, "level").isNotNull
    val isStructlog = isJson && element_at(jm, "event").isNotNull && !isTracing
    val isGo = isJson && !isTracing && !isStructlog &&
      coalesce(element_at(jm, "msg"), element_at(jm, "message")).isNotNull
    val tracingFields = from_json(get_json_object(body, "$.fields"),
      MapType(StringType, StringType))

    val isAccess = clean.rlike(nginxAccessRe)
    val isNgxErr = clean.rlike(nginxErrorRe)
    val isPg = clean.rlike(postgresRe)
    val isMeili = clean.rlike(meiliRe)

    lines.select(
      when(isAccess || isNgxErr, "nginx")
        .when(isPg, "postgres")
        .when(isTracing, "rust_tracing")
        .when(isStructlog, "python_structlog")
        .when(isGo, "go")
        .when(isMeili, "meilisearch").as("service_type"),
      when(isAccess, "access").when(isNgxErr, "error")
        .when(isPg, "database")
        .when(isTracing || isStructlog || isGo, "structured")
        .when(isMeili, "search").as("log_type"),
      normLevel(
        when(isAccess, lit("info"))
          .when(isNgxErr, extract(clean, nginxErrorRe, 2))
          .when(isPg, extract(clean, postgresRe, 3))
          .when(isTracing || isStructlog || isGo, element_at(jm, "level"))
          .when(isMeili, extract(clean, meiliRe, 2))).as("level"),
      when(isAccess,
          try_to_timestamp(extract(clean, nginxAccessRe, 2), lit("dd/MMM/yyyy:HH:mm:ss Z")))
        .when(isNgxErr,
          try_to_timestamp(extract(clean, nginxErrorRe, 1), lit("yyyy/MM/dd HH:mm:ss")))
        .when(isPg, try_to_timestamp(extract(clean, postgresRe, 1),
          lit("yyyy-MM-dd HH:mm:ss.SSS")))
        .when(isTracing || isStructlog || isGo,
          try_to_timestamp(coalesce(element_at(jm, "timestamp"), element_at(jm, "time"))))
        .when(isMeili, try_to_timestamp(extract(clean, meiliRe, 1))).as("ts"),
      when(isAccess, clean)
        .when(isNgxErr, extract(clean, nginxErrorRe, 3))
        .when(isPg, extract(clean, postgresRe, 4))
        .when(isTracing, get_json_object(body, "$.fields.message"))
        .when(isStructlog, element_at(jm, "event"))
        .when(isGo, coalesce(element_at(jm, "msg"), element_at(jm, "message")))
        .when(isMeili, extract(clean, meiliRe, 3)).as("message"),
      when(isAccess, extract(clean, nginxAccessRe, 3)).as("method"),
      when(isAccess, extract(clean, nginxAccessRe, 4)).as("path"),
      when(isAccess, extract(clean, nginxAccessRe, 5)).cast("int").as("status_code"),
      when(isAccess, extract(clean, nginxAccessRe, 6)).cast("long").as("response_size"),
      when(isAccess, extract(clean, nginxAccessRe, 1)).as("ip_address"),
      when(isAccess, extract(clean, nginxAccessRe, 8)).as("user_agent"),
      // structured payload minus the keys already lifted into columns
      when(isTracing, map_filter(tracingFields, (k, _) => k =!= "message"))
        .when(isStructlog || isGo,
          map_filter(jm, (k, _) => !k.isin("level", "msg", "message", "event", "timestamp", "time")))
        .as("fields"),
      col("value").as("raw"))
  }

  /** Quarantined lines — unrecognized format, raw kept for replay. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col("service_type").isNull).select("raw")

  /** The forwarder's health rollup: parsed/quarantined counts per
    * detected producer (null service_type = the quarantine row).
    */
  def dispatchStats(parsed: DataFrame): DataFrame =
    parsed.groupBy("service_type", "log_type")
      .agg(count(lit(1)).as("n_lines"),
           count(col("level")).as("n_leveled"),
           count(col("ts")).as("n_timestamped"))
}
