package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Knowledge-trail read models — knowledge-sovereign's CQRS query side
  * beyond the es01-es07 projection machinery:
  *
  *  - es08: producer-liveness ages (app/driver/sovereign_db/
  *    read_projection_health.go:26): per REQUESTED event type, the age
  *    of its most recent event — the signal that distinguishes "the
  *    producer died" from "no usage". Types never seen publish a large
  *    sentinel age (the exporter's convention: visibly stale, never
  *    absent).
  *  - es09: trail footprints with wear bands (read_trail.go:124): the
  *    user's walked-item spine. Repeated contacts with one (item,
  *    verb) collapse to a single row that sorts by its LATEST contact,
  *    remembers its first, and carries the contact count; wear still
  *    folds over raw rows (a revisit deepens the path even though it
  *    no longer adds a row). Wear bands: has_ask or ≥4 raw contacts or
  *    (engaged and ≥2) → deep; ≥2 contacts or engaged → worn; else
  *    thin — where engaged means a dwell at or above the threshold or
  *    a legacy engaged label (the act-outcome side table, folded onto
  *    the same composed events here).
  *
  * The reference serves both per user id; the Spark form computes the
  * projection for EVERY user in one pass (the es01 batch-read-model
  * discipline) — the per-user query is then a key lookup.
  *
  * Scale: es08 is one map-side-combined max per type joined to a
  * literal requested-type frame; es09 is two aggregations of the same
  * scan keyed by (user, item[, verb]) — both map-side combined, the
  * wear join on the bounded collapsed frame. No windows: the
  * latest-contact exemplar is a struct-max aggregate, not a sort.
  */
object Trail {

  /** es08: seconds since each requested producer's latest event, with
    * the never-seen sentinel. `now` is the corpus max timestamp, so
    * the ages are deterministic (the reference uses wall-clock now()).
    */
  def producerLiveness(s: SparkSession, dir: String,
                       requested: Seq[String] = Seq("view", "click", "purchase",
                         "signup", "error", "recap.topic_snapshotted"),
                       sentinelAge: Long = 999999999L): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("second", col("ts")).as("ts_s"))
    val perType = e.groupBy("event_type").agg(max("ts_s").as("latest"))
    val now = e.agg(max("ts_s").as("now_ts"))
    requested.toDF("event_type")
      .join(broadcast(perType), Seq("event_type"), "left")
      .crossJoin(broadcast(now))
      .select(col("event_type"),
        when(col("latest").isNotNull,
          unix_timestamp(col("now_ts")) - unix_timestamp(col("latest")))
          .otherwise(sentinelAge).as("age_seconds"))
  }

  /** es09: the collapsed trail spine with wear bands, for every user.
    * Composition: item from the payload key, verb from the event type
    * (click is the 'asked' verb that deepens wear), dwell = value with
    * the engaged threshold at 150, legacy engaged label on k % 19.
    */
  def trailWear(s: SparkSession, dir: String,
                engagedDwell: Double = 150.0): DataFrame = {
    val e = Tables.events(s, dir)
    val k = coalesce(
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0))
    trailWearOn(e.select(
      coalesce(col("user_id"), lit(0L)).as("user_id"),
      concat(lit("item-"), pmod(k, lit(20))).as("item_key"),
      when(col("event_type") === "view", "walked")
        .when(col("event_type") === "click", "asked")
        .when(col("event_type") === "purchase", "acted")
        .when(col("event_type") === "signup", "saved")
        .otherwise("flagged").as("verb"),
      col("ts"), col("event_id"),
      coalesce(col("value"), lit(0.0)).as("dwell"),
      (k % 19 === 0).as("legacy_engaged")), engagedDwell)
  }

  /** The spine + wear computation over any (user_id, item_key, verb,
    * ts, event_id, dwell, legacy_engaged) footprints frame.
    */
  def trailWearOn(base: DataFrame, engagedDwell: Double = 150.0): DataFrame = {
    // ONE scan: the per-(user, item, verb) collapse carries partial
    // wear evidence (row count, ask flag, engagement flag), and the
    // per-(user, item) wear fold is a window over the collapsed frame
    // — the previous form aggregated the RAW rows twice (a second
    // full scan) and joined the two aggregates (guide §2.3 "aggregate
    // before you shuffle" / §2.4: the wear totals are exact functions
    // of the per-verb partials, so the second scan bought nothing)
    val collapsed = base.groupBy("user_id", "item_key", "verb")
      .agg(count(lit(1)).as("contact_count"),
        min("ts").as("first_ts"),
        max(struct(col("ts"), col("event_id"))).as("last"),
        max(when(col("verb") === "asked", 1).otherwise(0)).as("v_ask"),
        max(when(col("dwell") >= engagedDwell || col("legacy_engaged"), 1).otherwise(0))
          .as("v_eng"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id", "item_key")
    collapsed
      .withColumn("cnt", sum(col("contact_count")).over(w))
      .withColumn("has_ask", max(col("v_ask")).over(w))
      .withColumn("engaged", max(col("v_eng")).over(w))
      .select(col("user_id"), col("item_key"), col("verb"),
        col("contact_count"), col("first_ts"),
        col("last.ts").as("last_ts"), col("last.event_id").as("last_event_id"),
        when(col("has_ask") === 1 || col("cnt") >= 4 ||
             (col("engaged") === 1 && col("cnt") >= 2), "deep")
          .when(col("cnt") >= 2 || col("engaged") === 1, "worn")
          .otherwise("thin").as("wear"))
  }

  /** es10: the stream hard-cap trim report (mq-hub/app/usecase/
    * trim_streams_usecase.go:17 TrimStreamsUsecase) — every known
    * stream is held to an absolute MAXLEN ceiling; the maintenance
    * pass exists because publish-time trimming rides XADD, which is
    * exactly the command a maxmemory-locked Redis rejects, so only
    * the out-of-band XTRIM can release the latch. The report records
    * per-stream deletions ONLY where something was trimmed
    * (report.PerStream keeps `deleted > 0`, :58) plus the pass total.
    *
    * The batch form needs no ranking at all: deleted = max(n − cap,
    * 0) per stream — one map-side-combined count, the under-cap
    * streams filtered out, the total a broadcast one-row frame. (The
    * retained-rows side of a count-capped retention is q25's
    * top-N-per-group shape; the REPORT is pure aggregation.)
    */
  def streamTrimReport(s: SparkSession, dir: String,
                       hardMaxLen: Long = 200L): DataFrame =
    streamTrimReportOn(Tables.events(s, dir), hardMaxLen)

  def streamTrimReportOn(events: DataFrame, hardMaxLen: Long): DataFrame = {
    val perStream = events
      .groupBy(col("event_type").as("stream"))
      .agg(count(lit(1)).as("n_before"))
      .filter(col("n_before") > hardMaxLen)
      .select(col("stream"), col("n_before"),
        (col("n_before") - hardMaxLen).as("n_deleted"),
        lit(hardMaxLen).as("n_kept"))
    val total = perStream.agg(coalesce(sum("n_deleted"), lit(0L)).as("total_deleted"))
    perStream.crossJoin(broadcast(total))
  }

  // ---- es11: trail episodes ----

  /** tagclean junkWords (usecase/tagclean/tagclean.go:18-27), verbatim
    * — the table IS the spec (td02/ti02 data-as-semantics precedent).
    */
  val JunkTags: Seq[String] = Seq(
    "also", "could", "might", "would", "said", "says",
    "wrote", "becomes", "without", "even", "great",
    "three", "week", "types", "example",
    "こと", "もの", "ため", "よう", "それ", "これ",
    "https", "http", "www", "com", "gt", "lt", "amp")

  /** tagclean.Normalize (:31-44): lowercase+trim, then junk → "" —
    * shorter than two runes, digit-only (unicode Nd, both engines'
    * regex classes), or a junkWords member. Premises shared with
    * is01: Go strings.TrimSpace trims ALL whitespace where both
    * engines' trim() strips ASCII spaces (composed tags pad with
    * spaces only), and rune count = code points = length() on BMP
    * tags.
    */
  def tagNormalize(t: Column): Column = {
    val c = lower(trim(t))
    when(length(c) < 2, lit(""))
      .when(c.rlike("^\\p{Nd}+$"), lit(""))
      .when(c.isInCollection(JunkTags), lit(""))
      .otherwise(c)
  }

  /** 14-day stage-2 chain window (trail_episodes.go:30), microseconds. */
  val TagChainWindowMicros: Long = 14L * 24 * 3600 * 1000000L

  /** Enforced premise: the (user << 20) + ordinal node encoding holds a
    * 20-bit item ordinal. The reference's episode derivation is bounded
    * by construction (episodeWindowRows=500 footprints per call —
    * trail_episodes.go), so a >2^20-item catalog is unreachable there;
    * here the bound is ASSERTED, not assumed — an ordinal past the
    * width raises instead of silently colliding (user, item) nodes and
    * merging unrelated episodes. Distributed and free: a per-row guard
    * inside the projection, no extra driver action.
    */
  private[graft] def encodedOrd(ord: Column): Column =
    when(ord < (1L << 20), ord).otherwise(raise_error(concat(
      lit("es11 node encoding overflow: item ordinal "), ord.cast("string"),
      lit(" exceeds the 20-bit catalog premise (trail_episodes.go bounded-window invariant)"))))

  /** es11: derived trail EPISODES (knowledge-sovereign
    * usecase/trail_episodes/trail_episodes.go Derive :54-108 — the
    * trail RPC's sole display unit since D24/D30: rpc_trail.go:60
    * derives them on every GetTrailFootprints call). A pure
    * derivation over the es09 collapsed footprints:
    *
    *  - stage 1 (:122-153 groupByItem): footprints sharing item_key
    *    join one group unconditionally; the group's tag set is the
    *    cleaned union (tagclean.Normalize), its span
    *    [min effectiveFirst, max occurredAt] where effectiveFirst
    *    (:156) falls back to the latest contact when first is unset
    *    (our collapsed frame always sets first_ts, = last_ts for
    *    single contacts — same value).
    *  - stage 2 (:166-171 chains): two groups chain when their
    *    cleaned tags share ≥ 2 members (minSharedTags) AND the gap
    *    between their nearest contacts (:186-197 — zero when spans
    *    overlap, else the distance between the earlier latest and the
    *    later earliest) is ≤ 14 days, INCLUSIVE. The reference runs
    *    union-find over all pairs (:66-87), so episodes are exactly
    *    the connected components of the pairwise-chains graph
    *    (transitive: A-B, B-C merge even when A-C alone would not).
    *  - episode assembly (:199-237 buildEpisode): EpisodeKey = "ep:" +
    *    the OLDEST member footprint's key (min by (effectiveFirst,
    *    footprint_key) — the init at all[0] cannot win a tie, the
    *    strict < replacement makes it the true lexicographic min);
    *    wear = the deepest member band (thin < worn < deep, unknown
    *    ranks thin); footprints newest-first (occurred_at DESC,
    *    footprint_key DESC), episodes newest-lead-first with the same
    *    tie rule (:99-106).
    *
    * The reference derives per user per RPC over a fixed
    * episodeWindowRows = 500 window (rpc_trail.go:25-29 — the window
    * is deliberately independent of the client's page cursor, with a
    * loud window-exhausted log as the redesign trigger); the batch
    * form computes EVERY user in one pass (es01's batch-read-model
    * discipline) — per-user graphs stay bounded by the item catalog
    * exactly as the reference's are bounded by the window.
    *
    * Output: one row per footprint with its episode's key/wear/rank
    * and its position inside the episode (arrays would trip Verify's
    * scalar rule; the flat form is the same join the RPC response
    * encodes).
    *
    * Scale: stage-1 groups are one (user, item) agg; candidate pairs
    * come from a (user, tag) equi-join over the EXPLODED cleaned tag
    * sets (the banded-candidate discipline — never per-user
    * all-pairs), aggregated map-side to shared-tag counts with the
    * span gate applied before any component work; components run on
    * the bounded edge residue through Dedup.connectedComponents
    * (driver union-find under the 2M-edge gate, distributed min-label
    * past it) over long-encoded (user, item-ordinal) nodes; the two
    * output windows partition by user / (user, episode). The one
    * global window ranks the DISTINCT item catalog (a bounded
    * dimension — the q19 pre-aggregated-frame convention).
    */
  def trailEpisodes(s: SparkSession, dir: String): DataFrame = {
    val fps = trailWear(s, dir)
    val n = regexp_extract(col("item_key"), "([0-9]+)$", 1).cast("int")
    // composed read-model tags_json per item: two signal tags (items
    // agreeing on BOTH topic and genre — n ≡ n' mod 15 — chain; one
    // agreement alone stays below minSharedTags), one unique tag, and
    // three junk members that Normalize must drop (a case-variant
    // junkword, a digit-only, a sub-2-rune) — shared junk across ALL
    // items must never chain anything
    val tags = array(
      concat(lit("Topic-"), (n % 5).cast("string")),
      concat(lit("genre-"), (n % 3).cast("string")),
      concat(lit(" spotlight-"), n.cast("string"), lit(" ")),
      lit("Also"), lit("42"), lit("x"))
    episodesOn(fps
      .withColumn("footprint_key",
        concat(lit("fp-"), lpad(col("last_event_id").cast("string"), 12, "0")))
      .withColumn("tags", tags))
  }

  /** The episode derivation over any collapsed footprint frame with
    * (user_id, item_key, verb, contact_count, first_ts, last_ts,
    * footprint_key, wear, tags) columns.
    */
  def episodesOn(fps0: DataFrame,
                 windowMicros: Long = TagChainWindowMicros,
                 minSharedTags: Int = 2): DataFrame =
    // lazy on purpose: the output is per-footprint (corpus-scale at
    // 100 TB), so the gd01 collect-materialize release idiom does not
    // apply — measured +1.2 s (+18%) at sf0.1 just shipping the sorted
    // rows through the driver. The three stage caches are consumed
    // within this one plan; a long-lived session that sinks the frame
    // itself should use episodesPlan and call the release closure
    // after its write (the harness's clearCache covers bench/verify).
    episodesPlan(fps0, windowMicros, minSharedTags)._1

  /** The lazy episode plan plus the closure releasing its stage
    * caches — split out so callers that sink the frame themselves
    * (and profiling) can release after their own action.
    */
  private[operators] def episodesPlan(fps0: DataFrame,
                 windowMicros: Long = TagChainWindowMicros,
                 minSharedTags: Int = 2): (DataFrame, () => Unit) = {
    val fps = fps0
      .withColumn("eff_first_us",
        unix_micros(coalesce(col("first_ts"), col("last_ts"))))
      .withColumn("last_us", unix_micros(col("last_ts")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 1: per-(user, item) groups — cleaned tag union + span
    val groups = fps
      .withColumn("ctags",
        array_distinct(filter(transform(col("tags"), t => tagNormalize(t)),
          t => t =!= "")))
      .groupBy("user_id", "item_key")
      .agg(min(col("eff_first_us")).as("earliest"),
        max(col("last_us")).as("latest"),
        array_distinct(flatten(collect_list(col("ctags")))).as("gtags"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 2: banded candidate generation on (user, tag), shared-tag
    // counts map-side combined, the nearest-contact gap gate exact in
    // integer microseconds
    val tagRows = groups.select(col("user_id"), col("item_key"),
      col("earliest"), col("latest"), explode(col("gtags")).as("tag"))
    val ta = tagRows.select(col("user_id"), col("tag"), col("item_key").as("ia"),
      col("earliest").as("ea"), col("latest").as("la"))
    val tb = tagRows.select(col("user_id"), col("tag"), col("item_key").as("ib"),
      col("earliest").as("eb"), col("latest").as("lb"))
    val edges = ta.join(tb, Seq("user_id", "tag"))
      .filter(col("ia") < col("ib"))
      .groupBy("user_id", "ia", "ib")
      .agg(count(lit(1)).as("shared"),
        min(col("ea")).as("ea"), min(col("la")).as("la"),
        min(col("eb")).as("eb"), min(col("lb")).as("lb"))
      .filter(col("shared") >= minSharedTags &&
        greatest(col("eb") - col("la"), col("ea") - col("lb"), lit(0L)) <= windowMicros)

    // long-encoded nodes: (user << 20) | item ordinal — the ordinal
    // window ranks the bounded DISTINCT item catalog only
    import org.apache.spark.sql.expressions.Window
    val itemDim = groups.select("item_key").distinct()
      .withColumn("ord",
        row_number().over(Window.orderBy("item_key")).cast("long"))
    def node(user: Column, ord: Column): Column =
      shiftleft(user, 20) + encodedOrd(ord)
    val ePairs = edges
      .join(broadcast(itemDim.select(col("item_key").as("ia"), col("ord").as("oa"))), Seq("ia"))
      .join(broadcast(itemDim.select(col("item_key").as("ib"), col("ord").as("ob"))), Seq("ib"))
      .select(node(col("user_id"), col("oa")).as("na"),
        node(col("user_id"), col("ob")).as("nb"))
    val cc = Dedup.connectedComponents(ePairs, "na", "nb")

    // every group labeled; singletons keep their own node
    val labeled = groups
      .join(broadcast(itemDim), Seq("item_key"))
      .withColumn("node", node(col("user_id"), col("ord")))
      .join(cc, Seq("node"), "left")
      .select(col("user_id"), col("item_key"),
        coalesce(col("label"), col("node")).as("label"))

    // footprints attached to episodes; per-episode key/wear/lead
    val fpl = fps.join(labeled, Seq("user_id", "item_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wearRank = when(col("wear") === "deep", 3)
      .when(col("wear") === "worn", 2).otherwise(1)
    val eps = fpl.groupBy("user_id", "label")
      .agg(
        min(struct(col("eff_first_us").as("f"), col("footprint_key").as("k"))).as("oldest"),
        max(struct(col("last_us").as("t"), col("footprint_key").as("k"))).as("lead"),
        max(wearRank).as("wr"))
      .select(col("user_id"), col("label"),
        concat(lit("ep:"), col("oldest.k")).as("episode_key"),
        col("lead.t").as("lead_t"), col("lead.k").as("lead_k"),
        when(col("wr") === 3, "deep").when(col("wr") === 2, "worn")
          .otherwise("thin").as("episode_wear"))
      .withColumn("episode_rank", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("lead_t").desc, col("lead_k").desc)))

    val out = fpl.join(eps.select("user_id", "label", "episode_key", "episode_wear",
        "episode_rank"), Seq("user_id", "label"))
      .withColumn("position", row_number().over(
        Window.partitionBy("user_id", "label")
          .orderBy(col("last_us").desc, col("footprint_key").desc)))
      .select(col("user_id"), col("episode_rank"), col("episode_key"),
        col("episode_wear"), col("position"), col("footprint_key"),
        col("item_key"), col("verb"), col("contact_count"),
        col("first_ts"), col("last_ts"), col("wear"))
      .orderBy("user_id", "episode_rank", "position")
    (out, () => {
      fps.unpersist(); groups.unpersist(); fpl.unpersist(); cc.unpersist()
    })
  }

  /** es11 DuckDB mirror: the es09 footprint CTEs + the same cleaning,
    * banded chaining and gap gate; components via the dd01
    * reach-recursion pattern over string nodes (labels only ever
    * GROUP — the per-component outputs are label-representation-free,
    * so the two engines' different label choices cannot diverge).
    */
  val es11OracleSql: String = {
    val junkList = JunkTags.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE e AS (SELECT coalesce(user_id, 0) AS user_id, event_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   coalesce(value, 0) AS v, event_type,
                   coalesce(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER), 0) AS k
            FROM events),
 b AS (SELECT user_id, 'item-' || (k % 20) AS item_key,
              CASE event_type WHEN 'view' THEN 'walked' WHEN 'click' THEN 'asked'
                   WHEN 'purchase' THEN 'acted' WHEN 'signup' THEN 'saved'
                   ELSE 'flagged' END AS verb,
              ts, event_id, v, k
       FROM e),
 iw AS (SELECT user_id, item_key, count(*) AS cnt,
               max(CASE WHEN verb = 'asked' THEN 1 ELSE 0 END) AS has_ask,
               max(CASE WHEN v >= 150 OR k % 19 = 0 THEN 1 ELSE 0 END) AS engaged
        FROM b GROUP BY 1, 2),
 c AS (SELECT user_id, item_key, verb, count(*) AS contact_count,
              min(ts) AS first_ts
       FROM b GROUP BY 1, 2, 3),
 ex AS (SELECT user_id, item_key, verb, ts AS last_ts, event_id AS last_event_id
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, item_key, verb
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM b)
        WHERE rn = 1),
 fp AS (SELECT c.user_id, c.item_key, c.verb, c.contact_count, c.first_ts,
               ex.last_ts,
               'fp-' || lpad(CAST(ex.last_event_id AS VARCHAR), 12, '0') AS footprint_key,
               CASE WHEN iw.has_ask = 1 OR iw.cnt >= 4
                         OR (iw.engaged = 1 AND iw.cnt >= 2) THEN 'deep'
                    WHEN iw.cnt >= 2 OR iw.engaged = 1 THEN 'worn'
                    ELSE 'thin' END AS wear,
               CAST(regexp_extract(c.item_key, '([0-9]+)$$', 1) AS INTEGER) AS n,
               epoch_us(c.first_ts) AS eff_first_us, epoch_us(ex.last_ts) AS last_us
        FROM c
        JOIN iw ON iw.user_id = c.user_id AND iw.item_key = c.item_key
        JOIN ex ON ex.user_id = c.user_id AND ex.item_key = c.item_key AND ex.verb = c.verb),
 grp AS (SELECT user_id, item_key, min(eff_first_us) AS earliest,
                max(last_us) AS latest, min(n) AS n
         FROM fp GROUP BY 1, 2),
 gt AS (SELECT user_id, item_key, earliest, latest, tag
        FROM (SELECT g.user_id, g.item_key, g.earliest, g.latest,
                unnest(list_distinct(list_filter(
                  list_transform(
                    ['Topic-' || (n % 5), 'genre-' || (n % 3),
                     ' spotlight-' || n || ' ', 'Also', '42', 'x'],
                    t -> CASE WHEN length(lower(trim(t))) < 2 THEN ''
                              WHEN regexp_matches(lower(trim(t)), '^\\p{Nd}+$$') THEN ''
                              WHEN list_contains($junkList, lower(trim(t))) THEN ''
                              ELSE lower(trim(t)) END),
                  t -> t <> ''))) AS tag
              FROM grp g)),
 ed AS (SELECT a.user_id, a.item_key AS ia, b.item_key AS ib,
               count(*) AS shared,
               min(a.earliest) AS ea, min(a.latest) AS la,
               min(b.earliest) AS eb, min(b.latest) AS lb
        FROM gt a JOIN gt b ON a.user_id = b.user_id AND a.tag = b.tag
                           AND a.item_key < b.item_key
        GROUP BY 1, 2, 3),
 ch AS (SELECT user_id, ia, ib FROM ed
        WHERE shared >= 2
          AND greatest(eb - la, ea - lb, CAST(0 AS BIGINT)) <= 1209600000000),
 sym AS (SELECT CAST(user_id AS VARCHAR) || '|' || ia AS src,
                CAST(user_id AS VARCHAR) || '|' || ib AS dst FROM ch
         UNION
         SELECT CAST(user_id AS VARCHAR) || '|' || ib,
                CAST(user_id AS VARCHAR) || '|' || ia FROM ch),
 reach(node, r) AS (
   SELECT src, src FROM sym
   UNION
   SELECT sym.src, reach.r FROM sym JOIN reach ON sym.dst = reach.node),
 lab AS (SELECT node, min(r) AS rep FROM reach GROUP BY node),
 glab AS (SELECT g.user_id, g.item_key,
                 coalesce(l.rep, CAST(g.user_id AS VARCHAR) || '|' || g.item_key) AS label
          FROM grp g
          LEFT JOIN lab l ON l.node = CAST(g.user_id AS VARCHAR) || '|' || g.item_key),
 fpl AS (SELECT fp.*, glab.label FROM fp
         JOIN glab ON glab.user_id = fp.user_id AND glab.item_key = fp.item_key),
 eps AS (SELECT user_id, label,
           'ep:' || (array_agg(footprint_key ORDER BY eff_first_us ASC, footprint_key ASC))[1] AS episode_key,
           (array_agg(last_us ORDER BY last_us DESC, footprint_key DESC))[1] AS lead_t,
           (array_agg(footprint_key ORDER BY last_us DESC, footprint_key DESC))[1] AS lead_k,
           CASE max(CASE wear WHEN 'deep' THEN 3 WHEN 'worn' THEN 2 ELSE 1 END)
                WHEN 3 THEN 'deep' WHEN 2 THEN 'worn' ELSE 'thin' END AS episode_wear
         FROM fpl GROUP BY 1, 2),
 epr AS (SELECT *, row_number() OVER (PARTITION BY user_id
                     ORDER BY lead_t DESC, lead_k DESC) AS episode_rank
         FROM eps)
SELECT f.user_id, e.episode_rank, e.episode_key, e.episode_wear,
       row_number() OVER (PARTITION BY f.user_id, f.label
                          ORDER BY f.last_us DESC, f.footprint_key DESC) AS position,
       f.footprint_key, f.item_key, f.verb, f.contact_count,
       f.first_ts, f.last_ts, f.wear
FROM fpl f JOIN epr e ON e.user_id = f.user_id AND e.label = f.label
ORDER BY 1, 2, 5"""
  }
}
