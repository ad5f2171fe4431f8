package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** rag17: incremental chunk-diff events — rag-orchestrator's
  * `DiffChunks` (internal/domain/diff_chunks.go:24-168,
  * production-wired at index_article_usecase.go:238: every re-indexed
  * article diffs its new chunk list against the stored one, and only
  * the add/update/delete events hit the vector store — the incremental
  * path that keeps 100 TB of embeddings from being rewritten on every
  * crawl). Found by the round-16 full-basename diff, like rag16.
  *
  * Reference semantics:
  *
  *  - computeLCS (:85-133): textbook LCS DP on chunk HASH equality
  *    (the sha256 identity rag16 emits); the max tie (`dp[i-1][j] >
  *    dp[i][j-1]`) takes dp[i][j-1] on equality, and the BACKTRACE
  *    tie rule moves j-- on equality — observable on swapped chunks
  *    ([A,B] → [B,A] diffs as delete A / unchanged B / add A, never
  *    the mirror; spec-pinned).
  *  - DiffChunks (:24-82): walks the match list; each inter-match gap
  *    goes through processGap (:137-168): EQUAL-length non-empty gaps
  *    pair 1-to-1 as `updated` (the heuristic — a total rewrite of
  *    equal length is all updates), unequal gaps emit all `deleted`
  *    then all `added`; matches emit `unchanged`; the tail gap after
  *    the last match processes the same way without a trailing match.
  *
  * Output: (doc_id, seq, etype, old_ord, new_ord) — the event stream
  * in emission order; old_ord NULL for added, new_ord NULL for
  * deleted.
  *
  * Implementation: the DP table, backtrace and gap walk are in-row
  * folds (aggregate HOFs) over the two bounded per-document chunk
  * lists — the reference's own comment caps them at "tens to
  * hundreds". ROWS-ONLY: a 2D DP with backtrace is not
  * SQL-expressible in DuckDB without a per-cell recursive CTE (the
  * lp02/iterative precedent); every rule is spec-pinned instead and
  * the dump is byte-stable.
  *
  * Scale: one stateless scan projection per document pair — O(n·m)
  * per row with n,m bounded by the chunk counts; zero shuffles. The
  * old-chunk side would join from the chunk store keyed by article
  * (one equi-join) in the full pipeline.
  */
object ChunkDiff {

  private def emptyMatches: Column =
    array().cast("array<struct<oi:int,ni:int>>")
  private def emptyEvents: Column =
    array().cast("array<struct<etype:string,old_ord:int,new_ord:int>>")
  private def emptyInts: Column = array().cast("array<int>")

  /** The event array for one (oldH, newH) hash-list pair. */
  def diffEvents(oldH: Column, newH: Column): Column = {
    val n = size(oldH)
    val m = size(newH)
    // DP rows, 1-based indices into the (n+1)×(m+1) table
    val row0 = transform(sequence(lit(0), m), _ => lit(0))
    val dp = aggregate(sequence(lit(1), n), array(row0),
      (rows, i) => {
        val prev = element_at(rows, -1)
        val newRow = aggregate(sequence(lit(1), m), array(lit(0)),
          (row, j) => {
            val eq = element_at(oldH, i) === element_at(newH, j)
            val diag = element_at(prev, j)
            val up = element_at(prev, j + 1)
            val left = element_at(row, -1)
            concat(row, array(when(eq, diag + 1)
              .otherwise(when(up > left, up).otherwise(left))))
          })
        concat(rows, array(newRow))
      })
    // backtrace: n+m bounded steps; matches collected in reverse
    val bt = aggregate(sequence(lit(1), n + m),
      struct(n.as("i"), m.as("j"), emptyMatches.as("ms")),
      (st, _) => {
        val i = st.getField("i"); val j = st.getField("j")
        val ms = st.getField("ms")
        val live = i > 0 && j > 0
        val eq = element_at(oldH, i) === element_at(newH, j)
        val up = element_at(element_at(dp, i), j + 1) // dp[i-1][j]
        val left = element_at(element_at(dp, i + 1), j) // dp[i][j-1]
        when(!live, st)
          .when(eq, struct((i - 1).as("i"), (j - 1).as("j"),
            concat(ms, array(struct((i - 1).as("oi"), (j - 1).as("ni")))).as("ms")))
          .when(up > left, struct((i - 1).as("i"), j.as("j"), ms.as("ms")))
          .otherwise(struct(i.as("i"), (j - 1).as("j"), ms.as("ms")))
      })
    val matches = reverse(bt.getField("ms"))
    // gap walk over matches + a sentinel at (n, m)
    val withSentinel = concat(matches, array(struct(n.as("oi"), m.as("ni"))))
    def gapEvents(po: Column, pn: Column, mo: Column, mn: Column): Column = {
      val go = mo - po; val gn = mn - pn
      val upd = when(go > 0 && go === gn,
        transform(sequence(lit(0), go - 1), k =>
          struct(lit("updated").as("etype"),
            (po + k).cast("int").as("old_ord"), (pn + k).cast("int").as("new_ord"))))
        .otherwise(emptyEvents)
      val dels = when((go =!= gn || go === 0) && go > 0,
        transform(sequence(lit(0), go - 1), k =>
          struct(lit("deleted").as("etype"),
            (po + k).cast("int").as("old_ord"), lit(null).cast("int").as("new_ord"))))
        .otherwise(emptyEvents)
      val adds = when(go =!= gn && gn > 0,
        transform(sequence(lit(0), gn - 1), k =>
          struct(lit("added").as("etype"),
            lit(null).cast("int").as("old_ord"), (pn + k).cast("int").as("new_ord"))))
        .otherwise(emptyEvents)
      concat(upd, dels, adds)
    }
    val walk = aggregate(withSentinel,
      struct(lit(0).as("po"), lit(0).as("pn"), emptyEvents.as("ev")),
      (st, mtc) => {
        val po = st.getField("po"); val pn = st.getField("pn")
        val mo = mtc.getField("oi"); val mn = mtc.getField("ni")
        val isSentinel = mo === n && mn === m
        val unchanged = when(!isSentinel,
          array(struct(lit("unchanged").as("etype"),
            mo.cast("int").as("old_ord"), mn.cast("int").as("new_ord"))))
          .otherwise(emptyEvents)
        struct((mo + 1).as("po"), (mn + 1).as("pn"),
          concat(st.getField("ev"), gapEvents(po, pn, mo, mn), unchanged).as("ev"))
      })
    val _ = emptyInts
    walk.getField("ev")
  }

  /** The diff over (doc_id, old_hashes, new_hashes) rows →
    * (doc_id, seq, etype, old_ord, new_ord).
    */
  def diff(rows: DataFrame): DataFrame =
    rows.select(col("doc_id"),
      posexplode(diffEvents(col("old_hashes"), col("new_hashes")))
        .as(Seq("seq", "ev")))
      .select(col("doc_id"), col("seq"),
        col("ev.etype").as("etype"), col("ev.old_ord").as("old_ord"),
        col("ev.new_ord").as("new_ord"))

  /** rag17 adapter: seven composed old/new hash-list classes (hash
    * identity is opaque string equality — the sha rag16 provides).
    */
  def rag17(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 7
    def h(tag: String) = concat(lit("h"), col("doc_id").cast("string"), lit("-" + tag))
    val oldH = when(cls === 0, array(h("a"), h("b"), h("c")))
      .when(cls === 1, array(h("a"), h("b"), h("c")))
      .when(cls === 2, array(h("a"), h("b"), h("c"), h("d")))
      .when(cls === 3, array(h("a"), h("b")))
      .when(cls === 4, array(h("a"), h("b"), h("c")))
      .when(cls === 5, array(h("a"), h("b")))
      .otherwise(array().cast("array<string>"))
    val newH = when(cls === 0, array(h("a"), h("b"), h("c")))
      .when(cls === 1, array(h("a"), h("b2"), h("c")))
      .when(cls === 2, array(h("a"), h("x"), h("d")))
      .when(cls === 3, array(h("a"), h("b"), h("c"), h("d")))
      .when(cls === 4, array(h("b")))
      .when(cls === 5, array(h("x"), h("y")))
      .otherwise(array(h("a"), h("b")))
    diff(Tables.documents(s, dir)
      .select(col("doc_id"), oldH.as("old_hashes"), newH.as("new_hashes")))
  }
}
