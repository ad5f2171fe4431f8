package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** hc01 — hierarchical-summarization chunk planning (news-creator
  * usecase/recap_summary_usecase.py:902 _split_clusters_into_chunks):
  * when a recap job's cluster list exceeds one model context, the
  * map-reduce summarizer splits it into chunks under a char budget
  * WITH backward overlap, so chunk boundaries don't lose context —
  * the data-prep plan under the (env-blocked) LLM map-reduce:
  *
  *  - cluster cost = Σ sentence chars + 200 overhead (:918);
  *  - greedy packing: close the open chunk when adding the next
  *    cluster would exceed max_chars (6000, hierarchical_config:23) —
  *    unless the chunk is empty (an oversized first cluster still
  *    packs alone, :931);
  *  - on close, the new chunk STARTS WITH the previous chunk's
  *    trailing clusters up to 15% of the budget (900 chars) — walked
  *    backwards with a BREAK, not a filter: one oversized trailing
  *    cluster stops the carry even when earlier ones would fit
  *    (:939-946, spec-pinned);
  *  - the :959 empty-chunks fallback is dead code (a non-empty input
  *    always yields the final append) and is not reproduced.
  *
  * The fold is inherently sequential per job, so it runs as ONE
  * in-row `aggregate` HOF over the job's ordered cluster array (the
  * ke01/gb01 in-row-fold precedent): collect per job, fold, explode
  * assignments. Rows-only: DuckDB 1.0's list_reduce corrupts
  * list-typed accumulator state (verified: a three-step fold
  * concatenating lists keeps only the last element), so the honest
  * oracle is the independent Scala reference fold the property spec
  * compares against on random inputs, plus repeat-run byte-stability.
  *
  * Scale: one shuffle (the per-job collect); the fold and explode are
  * in-row; per-job lists are bounded by the job's cluster count
  * exactly as the reference's per-request lists are.
  */
object HierarchicalChunks {

  val MaxChars = 6000
  val OverlapChars: Int = (MaxChars * 0.15).toInt // 900

  /** The composed (job, cluster_pos, doc_id, cluster_len) view: each
    * source is a recap job, its documents are the ordered clusters,
    * cost = n_chars + 200.
    */
  def jobClusters(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("source").as("job_id"),
      col("doc_id"),
      (col("n_chars") + 200).cast("int").as("cluster_len"))

  /** The fold as a Spark SQL expression over array<struct<doc_id,len>>
    * (ordered), yielding array<struct<doc_id,len,chunk>>. The
    * backward-overlap walk binds ONCE per chunk close (HOF lambdas
    * have no CSE, so the `transform(array(walk), ot -> …)[0]` wrapper
    * is the let-binding — one O(|cur|) walk, not three).
    */
  private def foldExpr(maxChars: Int, ovChars: Int): String =
    s"""aggregate(
         clusters,
         named_struct(
           'asg', cast(array() as array<struct<doc_id:bigint,len:int,chunk:int>>),
           'cur', cast(array() as array<struct<doc_id:bigint,len:int>>),
           'curlen', 0, 'cidx', 0),
         (a, c) -> CASE WHEN size(a.cur) > 0 AND a.curlen + c.len > $maxChars THEN
             transform(
               array(aggregate(reverse(a.cur),
                 named_struct('s', 0, 'k', 0, 'stop', false),
                 (t, x) -> IF(NOT t.stop AND t.s + x.len <= $ovChars,
                   named_struct('s', t.s + x.len, 'k', t.k + 1, 'stop', false),
                   named_struct('s', t.s, 'k', t.k, 'stop', true)))),
               ot -> named_struct(
                 'asg', concat(a.asg, transform(a.cur,
                   x -> named_struct('doc_id', x.doc_id, 'len', x.len, 'chunk', a.cidx))),
                 'cur', concat(
                   slice(a.cur, size(a.cur) - ot.k + 1, ot.k),
                   array(c)),
                 'curlen', ot.s + c.len,
                 'cidx', a.cidx + 1))[0]
           ELSE named_struct('asg', a.asg,
             'cur', concat(a.cur, array(c)),
             'curlen', a.curlen + c.len, 'cidx', a.cidx) END,
         a -> concat(a.asg, transform(a.cur,
           x -> named_struct('doc_id', x.doc_id, 'len', x.len, 'chunk', a.cidx))))"""

  /** hc01 over any (job_id, doc_id, cluster_len) frame: one row per
    * chunk MEMBERSHIP (overlap carries duplicate a cluster into the
    * following chunk).
    */
  def chunkPlanOn(clusters: DataFrame, maxChars: Int = MaxChars,
                  ovChars: Int = OverlapChars): DataFrame =
    clusters
      .groupBy("job_id")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("cluster_len").as("len"))))
        .as("clusters"))
      .withColumn("m", explode(expr(foldExpr(maxChars, ovChars))))
      .select(col("job_id"), col("m.chunk").as("chunk_idx"),
        col("m.doc_id"), col("m.len").as("cluster_len"))
      .orderBy("job_id", "chunk_idx", "doc_id")

  def hc01(s: SparkSession, dir: String): DataFrame =
    chunkPlanOn(jobClusters(s, dir))

  /** The independent reference fold (a direct transcription of the
    * Python loop) — the property spec's ground truth.
    */
  def referenceFold(lens: Seq[(Long, Int)], maxChars: Int = MaxChars,
                    ovChars: Int = OverlapChars): Seq[(Long, Int, Int)] = {
    if (lens.isEmpty) return Seq.empty
    val chunks = scala.collection.mutable.ListBuffer.empty[Seq[(Long, Int)]]
    var cur = Vector.empty[(Long, Int)]
    var curLen = 0
    lens.foreach { case (id, len) =>
      if (curLen + len > maxChars && cur.nonEmpty) {
        chunks += cur
        var overlap = Vector.empty[(Long, Int)]
        var ovLen = 0
        var j = cur.length - 1
        var stop = false
        while (j >= 0 && !stop) {
          if (ovLen + cur(j)._2 <= ovChars) {
            overlap = cur(j) +: overlap
            ovLen += cur(j)._2
            j -= 1
          } else stop = true
        }
        cur = overlap :+ ((id, len))
        curLen = ovLen + len
      } else {
        cur = cur :+ ((id, len))
        curLen += len
      }
    }
    chunks += cur
    chunks.toSeq.zipWithIndex.flatMap { case (members, ci) =>
      members.map { case (id, len) => (id, len, ci) }
    }
  }
}
