package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** cb01: recap bullet-citation reconciliation — recap-worker's
  * `reconcile_bullet_citations`
  * (recap-worker/recap-worker/src/pipeline/persist.rs:62-124,
  * production-wired at :567 inside `build_bullets_json` on every recap
  * persist).
  *
  * Semantics, per the reference:
  *
  *  - `REFERENCE_MARKER_RE` (:23): every `[n]` occurrence in the bullet
  *    (`\[(\d+)\]`) is a citation marker; `n` parses as usize, so
  *    leading zeros are accepted (`[01]` == `[1]`) and a parse overflow
  *    is SKIPPED like an out-of-range marker (:79-84 treats Ok(_)
  *    out-of-range and Err identically). Spark try_casts the digits to
  *    long (overflow → null → filtered); the oracle mirrors with
  *    TRY_CAST. Valid range is 1 ≤ n ≤ refs.len().
  *  - refs-empty short-circuit (:73-75): no references → `vec![]` no
  *    matter what the bullet cites. Structural here: markers inner-join
  *    the per-group reference list, so a group with no refs emits
  *    nothing.
  *  - Three resolution paths per marker, MERGED as a set union, not
  *    exclusive (ADR-890 followup, :88-107):
  *      1. `references[n-1].article_id` is admitted only when it is
  *         UUID-shaped (:88-93) — production LLMs emit domain strings
  *         (`"dev.to"`) in that field. `is_uuid_shape` delegates to
  *         `uuid::Uuid::parse_str`, which accepts the hyphenated,
  *         simple (32-hex), urn-prefixed, and braced forms —
  *         [[UuidShapeRe]] covers all four.
  *      2. exact-URL match through the `url_to_article` map (:96-98).
  *      3. host-level MULTI-match (:99-104): `url_host` (:36-48) strips
  *         ONE `https://`/`http://` scheme prefix (case-sensitive),
  *         truncates at the first `/`, strips one `www.` prefix, and
  *         lowercases; a pure-domain ref URL (`"dev.to"`) is its own
  *         host. All articles indexed under that host
  *         (`build_host_to_articles`, :127-138) join the set. The host
  *         path runs for EVERY ref, so an exact-matched URL also pulls
  *         its same-host siblings.
  *  - Markers whose union resolves empty are skipped with a warn
  *    (:109-116) — silent-loss surfacing, not an error.
  *  - The matched articles' sentence ids union into one `BTreeSet`
  *    (:118-122): deduplicated, ascending. Ascending order is emitted
  *    here as a `seq` ordinal per bullet (the driver comparator needs
  *    scalar rows, and BTreeSet iteration order IS the sort).
  *
  * All three paths are deterministic — no iteration-order pin needed
  * (the r15 es12 contrast: this fold is already order-free).
  *
  * Composition (the qe03/ev31 precedent — driver tables carry no recap
  * bullets): one citation group per document source; its references are
  * the source's first five docs with slot 1 = UUID id + exact URL,
  * slot 2 = a domain-string id (`dev.to`) + exact URL, slot 3 = no id +
  * a pure-domain URL, slot 4 = UUID id + an unmatched URL (path 1
  * only), slot 5 = junk id + unmatched URL (unresolvable). Doc URLs
  * split across TWO hosts per source (odd/even ref slots) so the
  * host path multi-matches without flattening every marker to the
  * whole group. Bullet 1 exercises dedup ([1] vs [01]), out-of-range
  * ([6], [99]) and non-marker text ([x]); bullet 2 exercises the
  * pure-domain host fan-out, the path-1-only ref, the unresolvable
  * ref, and [0]/[007] range parsing. The lexicographically first
  * source keeps ZERO references — the refs-empty short-circuit on
  * real rows. Each article carries three sentence ids (doc_id·10+k).
  *
  * Scale: markers are a stateless regex explode bounded by bullet
  * length; refs / url-map / host-map are per-group dimensions (≤5
  * entries in the reference — `top_sources` truncates to 5 at :510)
  * joined broadcast; the sentence union is one distinct + one
  * per-bullet window over the bounded per-bullet result. Nothing
  * shuffles the corpus more than once.
  */
object CitationReconcile {

  /** The four textual forms `uuid::Uuid::parse_str` accepts:
    * hyphenated, urn-prefixed hyphenated, braced hyphenated, simple
    * 32-hex. Case-insensitive hex, like the parser.
    */
  val UuidShapeRe: String =
    "^(urn:uuid:)?[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$" +
      "|^[0-9a-fA-F]{32}$" +
      "|^\\{[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\}$"

  /** persist.rs `url_host` (:36-48): trim, strip one scheme prefix,
    * take up to the first '/', strip one `www.`, lowercase; NULL when
    * empty. Pure domains pass through as their own host.
    */
  def urlHost(u: Column): Column = {
    val noScheme = regexp_replace(trim(u), "^(https://|http://)", "")
    val beforeSlash = element_at(split(noScheme, "/"), 1)
    val host = lower(regexp_replace(beforeSlash, "^www\\.", ""))
    when(length(host) > 0, host)
  }

  /** The reconciliation over any composed frames:
    *  - `bullets`:   (group, bullet_ord, text)
    *  - `refs`:      (group, ref_n, article_id, url) — 1-based slots
    *  - `urlMap`:    (group, url, map_aid) — the reference's
    *                 `url_to_article`; the host index derives from it
    *                 exactly as `build_host_to_articles` does
    *  - `sentences`: (map_aid, sentence_id)
    * Returns (group, bullet_ord, seq, sentence_id) with `seq` the
    * 1-based ascending-ordinal of the bullet's deduplicated union.
    */
  def reconcile(bullets: DataFrame, refs: DataFrame, urlMap: DataFrame,
                sentences: DataFrame): DataFrame = {
    val refCount = refs.groupBy("group").agg(count(lit(1)).as("n_refs"))
    val markers = bullets
      .select(col("group"), col("bullet_ord"),
        explode(regexp_extract_all(col("text"), lit("\\[(\\d+)\\]"), lit(1))).as("nstr"))
      .withColumn("ref_n", col("nstr").try_cast("long"))
      .join(broadcast(refCount), Seq("group"))
      .filter(col("ref_n").between(1, col("n_refs")))
    val m2r = markers.join(refs, Seq("group", "ref_n"))
      .select(col("group"), col("bullet_ord"), col("article_id"), col("url"))

    val p1 = m2r
      .filter(col("article_id").isNotNull && col("article_id").rlike(UuidShapeRe))
      .select(col("group"), col("bullet_ord"), col("article_id").as("aid"))
    val p2Exact = m2r.select(col("group"), col("bullet_ord"), col("url"))
      .join(broadcast(urlMap), Seq("group", "url"))
      .select(col("group"), col("bullet_ord"), col("map_aid").as("aid"))
    val hostMap = urlMap
      .withColumn("host", urlHost(col("url")))
      .filter(col("host").isNotNull)
      .select(col("group"), col("host"), col("map_aid"))
    val p2Host = m2r
      .withColumn("host", urlHost(col("url")))
      .filter(col("host").isNotNull)
      .select(col("group"), col("bullet_ord"), col("host"))
      .join(broadcast(hostMap), Seq("group", "host"))
      .select(col("group"), col("bullet_ord"), col("map_aid").as("aid"))

    val articles = p1.union(p2Exact).union(p2Host).distinct()
    articles.join(sentences, col("aid") === sentences("map_aid"))
      .select(col("group"), col("bullet_ord"), col("sentence_id"))
      .distinct()
      .withColumn("seq", row_number().over(
        Window.partitionBy("group", "bullet_ord").orderBy("sentence_id")))
      .select(col("group").as("source"), col("bullet_ord"), col("seq"), col("sentence_id"))
  }

  /** Deterministic UUID-shape article id for a composed doc. */
  private def aidOf(docId: Column): Column =
    concat(lit("00000000-0000-4000-8000-"), lpad(docId.cast("string"), 12, "0"))

  /** cb01 adapter: composes the bullet/ref/url/sentence frames from the
    * documents table and reconciles.
    */
  def cb01(s: SparkSession, dir: String): DataFrame = {
    val top5 = Tables.documents(s, dir)
      .select(col("source").as("group"), col("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("group").orderBy("doc_id")))
      .filter(col("rn") <= 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val urled = top5
      .withColumn("aid", aidOf(col("doc_id")))
      .withColumn("url",
        concat(lit("https://www."), col("group"), lit("-h"), col("rn") % 2,
          lit(".example.com/p/"), col("doc_id")))

    val minSrc = Tables.documents(s, dir).agg(min("source").as("msrc"))
    val refs = urled
      .join(broadcast(minSrc), urled("group") === minSrc("msrc"), "left_anti")
      .select(col("group"), col("rn").cast("long").as("ref_n"),
        when(col("rn") === 1 || col("rn") === 4, col("aid"))
          .when(col("rn") === 2, lit("dev.to"))
          .when(col("rn") === 5, lit("not-a-uuid"))
          .as("article_id"),
        when(col("rn") === 3, concat(col("group"), lit("-h1.example.com")))
          .when(col("rn") === 4, concat(lit("https://unmatched.example.org/p/"), col("doc_id")))
          .when(col("rn") === 5, lit("https://nowhere.test/y"))
          .otherwise(col("url")).as("url"))

    val urlMap = urled.select(col("group"), col("url"), col("aid").as("map_aid"))
    val sentences = urled
      .select(col("aid").as("map_aid"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("k"), col("doc_id"))
      .select(col("map_aid"), (col("doc_id") * 10 + col("k")).as("sentence_id"))

    val bulletTexts = Seq(
      (1, "alpha [1] and [2] plus [01] end [6] big [99] word [x]"),
      (2, "host [3] direct [4] miss [5] zero [0] drop [007]"))
    import s.implicits._
    val bullets = top5.select("group").distinct()
      .crossJoin(broadcast(bulletTexts.toDF("bullet_ord", "text")))

    reconcile(bullets, refs, urlMap, sentences)
  }

  /** DuckDB twin of [[cb01]] — same composition, same three-path merge.
    * `url_host` mirrors as regexp_replace/split_part; marker parse uses
    * TRY_CAST (Spark's non-ANSI overflow-null twin).
    */
  val cb01OracleSql: String = {
    val hostSql = (u: String) =>
      s"lower(regexp_replace(split_part(regexp_replace(trim($u), '^(https://|http://)', ''), '/', 1), '^www\\.', ''))"
    s"""WITH ranked AS (SELECT source AS grp, doc_id,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         FROM documents),
       top5 AS (SELECT * FROM ranked WHERE rn <= 5),
       urled AS (SELECT grp, doc_id, rn,
                '00000000-0000-4000-8000-' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS aid,
                'https://www.' || grp || '-h' || (rn % 2) || '.example.com/p/' || doc_id AS url
         FROM top5),
       refs AS (SELECT grp, CAST(rn AS BIGINT) AS ref_n,
                CASE WHEN rn IN (1, 4) THEN aid WHEN rn = 2 THEN 'dev.to'
                     WHEN rn = 5 THEN 'not-a-uuid' END AS article_id,
                CASE WHEN rn = 3 THEN grp || '-h1.example.com'
                     WHEN rn = 4 THEN 'https://unmatched.example.org/p/' || doc_id
                     WHEN rn = 5 THEN 'https://nowhere.test/y'
                     ELSE url END AS url
         FROM urled WHERE grp <> (SELECT min(source) FROM documents)),
       umap AS (SELECT grp, url, aid AS map_aid FROM urled),
       hmap AS (SELECT grp, ${hostSql("url")} AS host, map_aid FROM umap),
       sent AS (SELECT aid AS map_aid, doc_id * 10 + k AS sentence_id
         FROM urled CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) ks),
       bullets AS (SELECT grp, b.bullet_ord, b.txt
         FROM (SELECT DISTINCT source AS grp FROM documents) s
         CROSS JOIN (VALUES (1, 'alpha [1] and [2] plus [01] end [6] big [99] word [x]'),
                            (2, 'host [3] direct [4] miss [5] zero [0] drop [007]')) b(bullet_ord, txt)),
       nref AS (SELECT grp, count(*) AS n_refs FROM refs GROUP BY grp),
       marks AS (SELECT grp, bullet_ord, TRY_CAST(m AS BIGINT) AS ref_n
         FROM (SELECT grp, bullet_ord, unnest(regexp_extract_all(txt, '\\[(\\d+)\\]', 1)) AS m
               FROM bullets)),
       m2r AS (SELECT mk.grp, mk.bullet_ord, r.article_id, r.url
         FROM marks mk JOIN nref n ON n.grp = mk.grp
         JOIN refs r ON r.grp = mk.grp AND r.ref_n = mk.ref_n
         WHERE mk.ref_n BETWEEN 1 AND n.n_refs),
       p1 AS (SELECT grp, bullet_ord, article_id AS aid FROM m2r
         WHERE article_id IS NOT NULL AND regexp_matches(article_id,
           '^(urn:uuid:)?[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$$|^[0-9a-fA-F]{32}$$|^\\{[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\}$$')),
       p2a AS (SELECT m.grp, m.bullet_ord, u.map_aid AS aid
         FROM m2r m JOIN umap u ON u.grp = m.grp AND u.url = m.url),
       mhost AS (SELECT grp, bullet_ord, ${hostSql("url")} AS host FROM m2r),
       p2b AS (SELECT m.grp, m.bullet_ord, h.map_aid AS aid
         FROM mhost m JOIN hmap h ON h.grp = m.grp AND h.host = m.host
         WHERE m.host <> ''),
       arts AS (SELECT DISTINCT grp, bullet_ord, aid
         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2a UNION ALL SELECT * FROM p2b) u),
       sres AS (SELECT DISTINCT a.grp, a.bullet_ord, s.sentence_id
         FROM arts a JOIN sent s ON s.map_aid = a.aid)
       SELECT grp AS source, bullet_ord,
              row_number() OVER (PARTITION BY grp, bullet_ord ORDER BY sentence_id) AS seq,
              sentence_id
       FROM sres"""
  }
}
