package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{cents, microRatio}

/** ev31: multi-producer HTTP-log normalization + golden-signals rollup.
  *
  * Mirrors clickhouse/migrations/003_create_http_logs_mv.sql — the MV
  * that maps BOTH known edge-log producer shapes into one `http_logs`
  * fact: nginx logs `service_name='nginx'` with `http_`-prefixed map
  * keys (http_method/http_path/http_status/http_size/http_ip/http_ua),
  * plecto-proxy logs bare keys (method/path/status/client/duration_ms).
  * The reference's comment block documents a ~4-week silent SLO
  * corruption from recognizing only one shape, and warns that admitting
  * an UNQUALIFIED third shape (any row with method/path/status keys,
  * from any service) would silently corrupt the availability SLO — so
  * every branch gates on producer name AND field shape, never shape
  * alone. That gating is the semantics under test here (spec plants a
  * third bare-keys producer and a key-missing nginx row; both must be
  * excluded).
  *
  * Scale: the normalization is a stateless filter+projection of the log
  * scan (the MV's SELECT), so it fuses into whatever reads it; the
  * golden-signals rollup is one map-side-combined shuffle keyed by the
  * minute bucket, with the error-rate ratio and latency percentile in
  * the exact micro-unit discipline from day one.
  */
object HttpLogs {

  /** The edge-log view composed deterministically from the events
    * table (the lt01/ot03 composition precedent — the driver tables
    * have no raw log fact): producer = user bucket (nginx /
    * plecto-proxy / a third `other-svc`), each producing ITS OWN field
    * shape. nginx 'click' rows omit the http_method/path/status keys —
    * the partially-shaped rows the MV's mapContains gate exists for.
    */
  def httpLogsFromEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val bucket = pmod(coalesce(col("user_id"), lit(0L)), lit(3))
    val svc = when(bucket === 0, "nginx")
      .when(bucket === 1, "plecto-proxy")
      .otherwise("other-svc")
    val m = when(col("event_type") === "purchase", "POST")
      .when(col("event_type") === "signup", "PUT").otherwise("GET")
    val p = concat(lit("/api/"), col("event_type"))
    val st = when(col("event_type") === "error", "500").otherwise("200")
    val size = round(coalesce(col("value"), lit(0.0)) * 10, 0).cast("long").cast("string")
    val ip = concat(lit("10.0.0."), pmod(coalesce(col("user_id"), lit(0L)), lit(250)))
    val ua = concat(lit("agent-"), pmod(coalesce(col("user_id"), lit(0L)), lit(5)))
    val dur = coalesce(col("value"), lit(0.0)).cast("string")
    val fields = when(svc === "nginx" && col("event_type") =!= "click",
        map(lit("http_method"), m, lit("http_path"), p, lit("http_status"), st,
            lit("http_size"), size, lit("http_ip"), ip, lit("http_ua"), ua))
      .when(svc === "nginx", map(lit("http_ip"), ip)) // shape-corrupt rows
      .when(svc === "plecto-proxy",
        map(lit("method"), m, lit("path"), p, lit("status"), st,
            lit("client"), ip, lit("duration_ms"), dur))
      .otherwise(map(lit("method"), m, lit("path"), p, lit("status"), st))
    // ev33 explode barrier: normalize() reads `fields` through ~14
    // element_at/filter references — without the barrier,
    // CollapseProject re-inlines the 4-branch CASE-map construction
    // into every one of them (SimplifyExtractValueOps cannot collapse
    // element_at over a CASE of maps), rebuilding the map per
    // reference per row
    e.select(col("ts"), explode(array(struct(
        svc.as("service_name"), fields.as("fields")))).as("x"))
      .select(col("ts"), col("x.service_name").as("service_name"),
        col("x.fields").as("fields"))
  }

  /** The MV's SELECT: producer-gated conditional field mapping into the
    * normalized http_logs schema. Each branch requires its producer's
    * service_name AND its full key shape (mapContains + non-empty
    * method) — 003_create_http_logs_mv.sql's WHERE, verbatim in
    * semantics. `OrZero` casts mirror toUInt16OrZero/toFloat64OrZero.
    */
  def normalize(logs: DataFrame): DataFrame = {
    val f = col("fields")
    def has(k: String): Column = element_at(f, k).isNotNull
    val isNginx = col("service_name") === "nginx" &&
      has("http_method") && has("http_path") && has("http_status") &&
      element_at(f, "http_method") =!= ""
    val isPlecto = col("service_name") === "plecto-proxy" &&
      has("method") && has("path") && has("status") &&
      element_at(f, "method") =!= ""
    logs.filter(isNginx || isPlecto)
      .select(
        col("ts"),
        when(isNginx, element_at(f, "http_method")).otherwise(element_at(f, "method")).as("method"),
        when(isNginx, element_at(f, "http_path")).otherwise(element_at(f, "path")).as("path"),
        coalesce(when(isNginx, element_at(f, "http_status")).otherwise(element_at(f, "status"))
          .cast("int"), lit(0)).as("status_code"),
        coalesce(when(isNginx, element_at(f, "http_size").cast("long")), lit(0L)).as("response_size"),
        when(isNginx, element_at(f, "http_ip")).otherwise(element_at(f, "client")).as("ip_address"),
        coalesce(when(isNginx, element_at(f, "http_ua")), lit("")).as("user_agent"),
        coalesce(when(isPlecto, element_at(f, "duration_ms").cast("double")), lit(0.0)).as("duration_ms"),
        col("service_name"))
  }

  /** Golden-signals rollup over the NORMALIZED fact (the slo-overview
    * panels read http_logs with no service filter): per minute, request
    * volume, 5xx count + exact-ratio error rate, bytes out, and the p95
    * latency over exact centi-ms units.
    */
  def goldenSignals(normalized: DataFrame): DataFrame =
    normalized
      .withColumn("dur_c", cents(col("duration_ms")))
      .groupBy(date_trunc("minute", col("ts")).as("bucket"))
      .agg(
        count(lit(1)).as("n_requests"),
        count(when(col("status_code") >= 500, 1)).as("n_errors"),
        microRatio(count(when(col("status_code") >= 500, 1)), count(lit(1)), 4).as("error_rate"),
        sum("response_size").as("total_bytes"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_latency_ms"))

  /** ev31 adapter: compose → normalize → rollup. */
  def ev31(s: SparkSession, dir: String): DataFrame =
    goldenSignals(normalize(httpLogsFromEvents(s, dir)))
}
