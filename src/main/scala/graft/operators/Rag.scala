package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RAG retrieval + context assembly.
  *
  * Mirrors knowledge-augur's "Ask Augur" flow: ground a question in
  * cosine top-k article embeddings, then assemble the retrieved
  * article snippets into an ordered context block for the generator
  * (knowledge-augur + knowledge-embedder services). Retrieval is
  * Similarity.knnBruteOn (broadcast query set, codegen'd cosine);
  * assembly is a rank-ordered aggregation — deterministic, so the
  * DuckDB oracle reproduces it with string_agg ORDER BY.
  */
object Rag {

  /** rag01: for each query vector, top-3 neighbors joined to their
    * document snippets, assembled rank-ordered into one context string.
    */
  def contextAssembly(s: SparkSession, dir: String): DataFrame = {
    val hits = Similarity.knnBruteOn(
      Tables.embeddings(s, dir), col("vec_id") % 100 === 0, k = 3)
    val snippets = Tables.documents(s, dir)
      .select(col("doc_id").as("neighbor_id"), substring(col("text"), 1, 30).as("chunk"))
    hits.join(snippets, "neighbor_id")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_ctx_docs"),
        max("cos").as("top_score"),
        array_join(
          transform(array_sort(collect_list(struct(col("rank"), col("chunk")))),
            p => p.getField("chunk")),
          " | ").as("context"))
  }
}
