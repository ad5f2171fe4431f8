package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** mr01 — token-budget model routing (news-creator gateway/
  * model_router.py:66 _select_model_3mode + utils/token_counter.py:8):
  * the per-prompt decision of WHICH context-size model serves a
  * generation request — the serving-side counterpart of the
  * training-pipeline token budgeting ops (tx13/tx23):
  *
  *  - prompt_tokens = max(1, ⌊chars·3/4⌋) (:32 — the 0.75
  *    tokens-per-char estimate, integer floor division);
  *  - safety_margin = max(tokens·10 // 100, 512) (:85 — percent vs
  *    fixed, larger wins);
  *  - needed = tokens + num_predict(1200) + margin;
  *  - bucket: ≤8192 → the 8K model, ≤61440 → 60K, past 60K still 60K
  *    (:128 — hierarchical summarization handles the overflow
  *    upstream), with the 8K-only branch (:108) when the 60K model is
  *    disabled.
  *
  * The 2× downgrade hysteresis (:140 — only switch to a SMALLER
  * bucket when current ≥ 2 × requested; upgrades always allowed) is
  * sequential per router process and runs as the st27 stream op; this
  * batch form emits the stateless per-prompt decision columns the
  * fold consumes.
  *
  * Scale: a pure arithmetic projection fused into the scan — zero
  * shuffles; the decision can gate 100 TB of prompts at ingest.
  */
object ModelRouting {

  val Bucket8K = 8192L
  val Bucket60K = 61440L

  /** count_tokens (:32): max(1, chars·3 // 4). */
  def promptTokens(text: Column): Column =
    greatest(lit(1L), floor(length(text) * 3 / 4).cast("long"))

  def routingColumns(text: Column, numPredict: Long = 1200,
                     marginPct: Long = 10, marginFixed: Long = 512,
                     model60kEnabled: Boolean = true): Seq[Column] = {
    val tokens = promptTokens(text)
    val margin = greatest(floor(tokens * marginPct / 100).cast("long"), lit(marginFixed))
    val needed = tokens + numPredict + margin
    val bucket =
      if (!model60kEnabled) lit(Bucket8K)
      else when(needed <= Bucket8K, Bucket8K).otherwise(Bucket60K)
    Seq(tokens.as("prompt_tokens"), margin.as("safety_margin"),
      needed.as("needed_tokens"), bucket.as("bucket"),
      when(bucket === Bucket8K, "gemma3-4b-8k").otherwise("gemma3-4b-60k").as("model"),
      (needed > Bucket60K).as("needs_hierarchical"))
  }

  def mr01(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id") +: routingColumns(col("text")): _*)
      .orderBy("doc_id")
}
