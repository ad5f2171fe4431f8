package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.{cents, microRatio, units}

/** Relational / OLAP query surface.
  *
  * Mirrors the reference's ClickHouse log rollups
  * (clickhouse/migrations/009_create_sli_metrics.sql — countIf/count over
  * groups) and alt-backend's article/feed reads
  * (alt-backend/app/shared/driver/alt_db — the fetch_*_driver.go files:
  * counts, latest-per-feed, exists/not-exists filters).
  *
  * Scale notes: facts (lineitem/orders) shuffle once on their group/join
  * keys with map-side partial aggregation; dimension tables
  * (region/nation/customer at TPC-H proportions) are explicitly
  * broadcast. Money aggregates follow the Numeric.scala micro-unit
  * discipline: per-row exact integer units, long sums, at most one
  * scale-0 round — so results are bit-stable across engines and across
  * partition orders (the DuckDB oracle mirrors the op sequence).
  */
object Relational {

  /** q01: grouped multi-aggregate scan (TPC-H Q1 pattern).
    *
    * Source columns are exact 2 dp, so price/discount/tax become exact
    * integer units per row (cents; disc/tax percent points) and every
    * sum is an exact LONG sum — order-independent, identical across
    * engines. disc_price/charge are products of those integers (1e4 /
    * 1e6 units), and every averaged or finer-than-source statistic ends
    * in ONE scale-0 round (the Numeric.scala discipline; a naked
    * `round(sum(double), 2)` over 4-dp-true products can sit on a .xx5
    * boundary and flip between engines). Unit sums fit a long to ~SF100
    * (u6 ≈ 1e11/row); past that the sums move to decimal(38,0).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("p_c"),
        units(col("l_discount"), 2).as("d_c"),
        units(col("l_tax"), 2).as("t_c"))
      .withColumn("u4", col("p_c") * (lit(100L) - col("d_c")))
      .withColumn("u6", col("u4") * (lit(100L) + col("t_c")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum("qty") * lit(1.0)).as("sum_qty"),
        (sum("p_c") / 1e2).as("sum_base_price"),
        (round(sum("u4") / 1e2, 0).cast("long") / 1e2).as("sum_disc_price"),
        (round(sum("u6") / 1e4, 0).cast("long") / 1e2).as("sum_charge"),
        (round(sum("qty") * 1e2 / count(lit(1)), 0).cast("long") / 1e2).as("avg_qty"),
        (round(sum("p_c") / count(lit(1)), 0).cast("long") / 1e2).as("avg_price"),
        (round(sum("d_c") * 1e2 / count(lit(1)), 0).cast("long") / 1e4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q02: filtered revenue aggregate (TPC-H Q6 pattern) — the predicate and
    * the two-column projection must both reach the parquet scan.
    */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg((round(sum(cents(col("l_extendedprice")) * units(col("l_discount"), 2)) / 1e2, 0)
        .cast("long") / 1e2).as("revenue"))

  /** q03: multi-way join with broadcast dims (TPC-H Q5 pattern): revenue by
    * nation. lineitem⋈orders shuffles on orderkey; customer/nation/region
    * broadcast.
    */
  def joinNationRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((round(sum(cents(col("l_extendedprice")) * (lit(100L) - units(col("l_discount"), 2))) / 1e2, 0)
             .cast("long") / 1e2).as("revenue"),
           count(lit(1)).as("n_items"))

  /** q04: top-N by aggregate, deterministic tie-break (mirrors Grafana
    * top-paths/status panels). The sort input is post-aggregation (one row
    * per customer), so the global TakeOrdered is cheap at any scale.
    */
  def topNCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      // o_totalprice carries full double precision (unlike the 2 dp fact
      // columns), so revenue sums go through exact per-row cents
      .agg((sum(cents(col("o_totalprice"))) / 1e2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(10)

  /** q05: argmax-per-key via window (mirrors
    * alt-backend fetch_latest_article_by_feed_driver.go).
    */
  def latestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
              col("o_orderdate").as("latest_orderdate"),
              (cents(col("o_totalprice")) / 1e2).as("latest_totalprice"))
  }

  /** q06: count-distinct per group (unique visitors pattern). */
  def distinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))

  /** q07: left-semi join / EXISTS (feeds-with-articles pattern). */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** q08: left-anti join (unread/unsummarized-count pattern,
    * alt_db/fetch_unsummarized_articles_count_driver.go).
    */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** q09: ROLLUP hierarchical totals region→nation. */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg((sum(cents(col("o_totalprice"))) / 1e2).as("revenue"), count(lit(1)).as("n_orders"))

  /** q10: conditional aggregation (countIf pattern,
    * clickhouse sli_error_rate_mv).
    */
  def conditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(lit(1)).as("n_total"),
        microRatio(count(when(col("o_orderstatus") === "F", 1)), count(lit(1)), 4)
          .as("finished_rate"))

  /** q11: GROUP BY + HAVING. */
  def bigOrdersHaving(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"), count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 150)

  /** q12: UNION DISTINCT of heterogeneous sources. */
  def unionSegments(s: SparkSession, dir: String): DataFrame = {
    val highBal = Tables.customer(s, dir).filter(col("c_acctbal") > 7000)
      .select(col("c_custkey").as("custkey"), lit("high_balance").as("segment"))
    val bigSpend = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"), lit("big_spender").as("segment"))
    highBal.union(bigSpend).distinct()
  }

  /** q13: per-key average comparison (decorrelated subquery pattern):
    * orders 50% above their customer's average order value.
    */
  def aboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    // The 1.5×-average gate is cross-multiplied into exact integers
    // (2·n·cents > 3·Σcents): a double `avg` differs between engines in
    // its last ulps (summation order), so an order sitting exactly at
    // 1.5× its customer's average could flip in or out of the result.
    val o = Tables.orders(s, dir).withColumn("tp_c", cents(col("o_totalprice")))
    val avgPer = o.groupBy(col("o_custkey").as("a_custkey"))
      .agg(sum("tp_c").as("sum_c"), count(lit(1)).as("n_o"))
    o.join(avgPer, col("o_custkey") === col("a_custkey"))
      .filter(col("tp_c") * 2 * col("n_o") > col("sum_c") * 3)
      .select(col("o_custkey"), col("o_orderkey"), (col("tp_c") / 1e2).as("totalprice"))
  }

  /** q15: keyset (cursor) pagination — the alt-backend feed/article
    * list pattern (cursor on (created_at, id) instead of OFFSET, so page
    * N costs the same as page 1). The predicate reaches the parquet scan.
    */
  def keysetPage(s: SparkSession, dir: String): DataFrame = {
    val cDate = lit("1997-06-01").cast("timestamp")
    Tables.orders(s, dir)
      .filter(col("o_orderdate") > cDate ||
              (col("o_orderdate") === cDate && col("o_orderkey") > 1000))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(20)
      .select(col("o_orderkey"), col("o_orderdate"), (cents(col("o_totalprice")) / 1e2).as("totalprice"))
  }

  /** q21: cursor page enriched with aggregated children — alt-backend's
    * article-list shape (fetch_articles_cursor_driver.go:75: a LIMIT'd
    * keyset page LEFT JOIN LATERAL an ARRAY_AGG of the page rows' tags;
    * feed_link_export_driver.go:21 is the same lateral pattern). In
    * Spark the lateral inverts: broadcast the 20-row page INTO the
    * child scan (so only the page's lineitems are ever aggregated —
    * the whole point of LATERAL vs aggregating the world), aggregate
    * per parent, left-join back. Child lists are sorted for
    * deterministic string assembly, empty-coalesced like the
    * reference's COALESCE(tags, '{}').
    */
  def latestOrdersEnriched(s: SparkSession, dir: String): DataFrame = {
    // persisted: the page drives both the child filter and the final
    // join — uncached it would run the orders top-20 twice
    val page = Tables.orders(s, dir)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(20)
      .select(col("o_orderkey"), col("o_orderdate"), (cents(col("o_totalprice")) / 1e2).as("totalprice"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val children = Tables.lineitem(s, dir)
      .join(broadcast(page.select("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("li_count"),
        array_join(transform(array_sort(collect_list(col("l_partkey"))),
          p => p.cast("string")), ",").as("li_parts"))
    // children is bounded by the 20-row page (≤1 group per page row) —
    // broadcast it explicitly; file-size statistics must never be allowed
    // to tip this into a sort-merge join of a 20-row frame
    page.join(broadcast(children), col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_orderdate"), col("totalprice"),
        coalesce(col("li_count"), lit(0L)).as("n_items"),
        coalesce(col("li_parts"), lit("")).as("part_list"))
  }

  /** q18: GROUPING SETS — simultaneous independent rollups (status and
    * priority marginals in one pass), the multi-panel dashboard shape.
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("o_totalprice"))) / 1e2).as("revenue"))

  /** q19: revenue quartiles of customers — the cohort-banding step of
    * engagement dashboards.
    *
    * Banding is by VALUE against the three quartile cut-points, not by
    * ntile rank: an ntile needs a global total order (a single-partition
    * WindowExec — tens of millions of rows on one task at 100×), while
    * cut-points come from the mergeable percentile_approx sketch and
    * banding is then a broadcast singleton + a when-chain inside one
    * codegen stage. percentile_approx is exact below its accuracy
    * buffer (100k), where it returns the same element quantile_disc
    * picks — the DuckDB oracle mirrors that definition.
    */
  def revenueQuartiles(s: SparkSession, dir: String): DataFrame = {
    // Cents stay exact longs end to end: cut-points are selected
    // ELEMENTS (percentile_approx below its accuracy buffer), banding
    // compares longs, and the quartile totals are long sums — nothing
    // downstream ever rounds an engine-order-dependent double.
    val perCust = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
    val cuts = perCust.agg(percentile_approx(
      col("rev_c"), array(lit(0.25), lit(0.5), lit(0.75)), lit(100000)).as("cuts"))
    perCust.crossJoin(broadcast(cuts))
      .withColumn("quartile",
        when(col("rev_c") > element_at(col("cuts"), 3), 1)
          .when(col("rev_c") > element_at(col("cuts"), 2), 2)
          .when(col("rev_c") > element_at(col("cuts"), 1), 3)
          .otherwise(4))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_customers"),
           (sum("rev_c") / 1e2).as("total_revenue"),
           (min("rev_c") / 1e2).as("min_revenue"))
  }

  /** q20: unpivot/melt — wide measure columns to (measure, value) long
    * form, then per-measure stats (the metric-explorer shape: one
    * chart per measure from one scan).
    */
  def unpivotMeasures(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .withColumn("v_c", cents(col("value")))
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
           (round(sum("v_c") * 1e2 / count(lit(1)), 0).cast("long") / 1e4).as("avg_value"),
           (max("v_c") / 1e2).as("max_value"))

  /** q17: part/supplier catalog rollup (TPC-H Q2 shape): cheapest part
    * per brand with supplier-nation context — exercises the remaining
    * dimension tables with broadcast joins and a per-brand argmin.
    */
  def partSupplierCatalog(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").asc, col("p_partkey").asc)
    Tables.part(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .agg(count(lit(1)).as("n_suppliers"), countDistinct("n_name").as("n_supplier_nations"))))
      .select(col("p_brand"), col("p_partkey").as("cheapest_partkey"),
              round(col("p_retailprice"), 2).as("price"),
              col("n_suppliers"), col("n_supplier_nations"))
  }

  /** q14: share-of-total via window over the aggregated (tiny) frame. */
  def segmentShare(s: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(cents(col("o_totalprice"))).as("seg_c"))
    seg.withColumn("share", microRatio(col("seg_c"), sum("seg_c").over(), 4))
      .select(col("c_mktsegment"), (col("seg_c") / 1e2).as("revenue"), col("share"))
  }

  /** q23: INTERSECT / EXCEPT set algebra over customer segments — the
    * audience-overlap reads the reference's tag/segment pages imply
    * (feeds in tag A but not tag B). Both set ops compile to
    * aggregate/join shapes that shuffle each side once on the full
    * row; the summary keeps the result small.
    */
  def segmentSetOps(s: SparkSession, dir: String): DataFrame = {
    val highBalance = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 5000).select("c_custkey")
    val bigSpenders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 300000).select(col("o_custkey").as("c_custkey")).distinct()
    val both = highBalance.intersect(bigSpenders)
      .withColumn("segment", lit("high_balance_and_big_spender"))
    val onlyBalance = highBalance.except(bigSpenders)
      .withColumn("segment", lit("high_balance_only"))
    val onlySpend = bigSpenders.except(highBalance)
      .withColumn("segment", lit("big_spender_only"))
    both.union(onlyBalance).union(onlySpend)
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"), min("c_custkey").as("min_custkey"))
  }

  /** q24: PIVOT — revenue matrix of order priority × status (the
    * inverse of q20's unpivot; ClickHouse dashboards pivot status
    * columns the same way). `pivot` with EXPLICIT values keeps the
    * plan a single one-shuffle conditional aggregation — the
    * values-discovering overload adds a distinct scan first.
    */
  def priorityStatusPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("tp_c", cents(col("o_totalprice")))
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum("tp_c"))
      .select(col("o_orderpriority"),
        (col("F") / 1e2).as("rev_f"), (col("O") / 1e2).as("rev_o"), (col("P") / 1e2).as("rev_p"))

  /** q22: market share per order year (TPC-H Q8 pattern) — within one
    * customer region, the revenue share supplied by one supplier nation.
    * Mirrors the per-source share panels the reference builds over
    * ClickHouse http_logs (share of traffic per service within an
    * environment). The fact join (lineitem⋈orders) shuffles once on
    * orderkey; customer/nation/region/supplier dims all broadcast, and
    * the share is a conditional-sum ratio inside the same single
    * aggregation — no second pass over the fact at any scale.
    */
  /** Exact top-N per group without sorting whole groups on one task:
    * phase 1 takes a local top-N inside each (group, salt) slice —
    * every slice is 1/salts of the group, sorted in parallel — and
    * phase 2 re-ranks only the surviving N·salts rows per group. Any
    * true top-N row is top-N within its slice, so no row is lost; this
    * is the map-side-combine idea applied to ranking, and the reason a
    * hot group (one priority holding half the table) cannot stall a
    * single window task at 100 TB. The salt is a content hash —
    * deterministic, retry-safe (Scale.saltedJoin's rule).
    */
  def topNPerGroup(df: DataFrame, grpCol: String, n: Int,
                   order: Seq[Column], saltOn: Column,
                   salts: Int = 16): DataFrame = {
    require(n >= 1 && salts >= 1)
    val w1 = Window.partitionBy(col(grpCol), col("__salt")).orderBy(order: _*)
    val w2 = Window.partitionBy(col(grpCol)).orderBy(order: _*)
    df.withColumn("__salt", pmod(saltOn, lit(salts)))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= n)
      .withColumn("rank_in_group", row_number().over(w2))
      .filter(col("rank_in_group") <= n)
      .drop("__salt", "__rn")
  }

  /** q25: top-3 orders per priority by price — the per-group ranking
    * read (every "top items per category" panel) in the salted
    * two-phase shape above.
    */
  def topOrdersPerPriority(s: SparkSession, dir: String): DataFrame =
    topNPerGroup(
      Tables.orders(s, dir), "o_orderpriority", 3,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      xxhash64(col("o_orderkey")))
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank_in_group")

  /** q26: the same per-group ranking as q25, computed by the EXACT
    * bounded-heap aggregate instead of windows — one shuffle moving at
    * most k entries per (group, partition), no sort of group members
    * anywhere (functions.TopKByAgg; identical output, identical
    * oracle). This is the form that survives a single group holding
    * half the table.
    */
  def topOrdersPerPriorityAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKByAgg.topKBy
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(topKBy(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("rk0", "e")))
      .select(col("o_orderpriority"),
        col("e.id").as("o_orderkey"),
        col("e.value").as("o_totalprice"),
        (col("rk0") + 1).cast("int").as("rank_in_group"))
  }

  /** q27: trailing 30-day customer spend at every order — a time-RANGE
    * window frame (`RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND
    * CURRENT ROW`), the capability row-frames (ev13's moving average)
    * cannot express: the frame is defined by VALUE distance on the
    * order timestamp, so sparse/bursty customers get correct windows
    * regardless of how many rows fall inside. ClickHouse exposes the
    * same via `RANGE` window frames over toUnixTimestamp; the alt
    * backend's "spend velocity" read uses this shape.
    *
    * Scale: one shuffle partitioned by customer; per-partition sort by
    * time is the windowing sort Spark would need for ANY per-customer
    * sequence op. Frame sums aggregate in CENTS (exact integers) so
    * the result is identical regardless of the engine's in-frame
    * summation order — window sums via segment trees (DuckDB) and
    * running accumulation (Spark) order doubles differently.
    */
  def trailingSpend(s: SparkSession, dir: String, days: Int = 30): DataFrame =
    trailingSpendOn(Tables.orders(s, dir), days)

  /** Trailing-window spend over any orders-shaped frame. */
  def trailingSpendOn(orders: DataFrame, days: Int = 30): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("epoch"))
      .rangeBetween(-days.toLong * 86400L, 0L)
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderdate").cast("timestamp").cast("long").as("epoch"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .withColumn("trailing_cents", sum("cents").over(w))
      .withColumn("trailing_orders", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (col("trailing_cents") / 1e2).as("trailing_spend"),
        col("trailing_orders"))
  }

  /** q28: multi-source trend dashboard — three independently
    * aggregated daily series (order volume + revenue, line items
    * shipped, event activity) FULL OUTER merged onto one bucket axis
    * with COALESCE-zero gap filling (alt-backend's trend-stats read:
    * `fetch_trend_stats_driver.go:142` builds per-bucket article /
    * summary / feed-activity CTEs and full-outer-joins them on the
    * bucket — the shape every activity dashboard needs when the
    * series come from DIFFERENT fact tables with different gaps).
    *
    * Scale: each fact aggregates independently with map-side partials
    * (no cross-table shuffle of raw rows); the outer joins run on
    * |days|-sized frames. Revenue merges in exact cents.
    */
  def trendDashboard(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val shipped = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("bucket"))
      .agg(count(lit(1)).as("n_shipped"))
    val activity = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    orders.join(shipped, Seq("bucket"), "full_outer")
      .join(activity, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        (coalesce(col("cents"), lit(0L)) / 1e2).as("revenue"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  def marketShare(s: SparkSession, dir: String,
                  region: String = "ASIA", supplierNation: String = "NATION_7"): DataFrame = {
    val asiaCustomers = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
            col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).withColumnRenamed("n_name", "s_nation")),
            col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nation")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCustomers), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rev_u4",
        cents(col("l_extendedprice")) * (lit(100L) - units(col("l_discount"), 2)))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("s_nation") === supplierNation, col("rev_u4")).otherwise(lit(0L))).as("nation_u4"),
        sum("rev_u4").as("total_u4"))
      .select(
        col("o_year"),
        (round(col("nation_u4") / 1e2, 0).cast("long") / 1e2).as("nation_revenue"),
        (round(col("total_u4") / 1e2, 0).cast("long") / 1e2).as("total_revenue"),
        microRatio(col("nation_u4"), col("total_u4"), 4).as("mkt_share"))
  }
}
