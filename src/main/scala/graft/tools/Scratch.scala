package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: regenerate EXPLAIN.md (formatted plans of headline
  * queries) and smoke-check the driver's entry contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // same session timezone as Verify/Bench/Probe/SparkSpec — the NTZ
      // timestamp normalization in Tables is session-timezone-sensitive
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = SparkEntry.entry(spark).count()
    println(s"entry rows (driver smoke-check, must be >0): $n")

    val dir = "/root/testdata/sf0.01"
    // args override the headline set (each must be a queries key)
    val headline = if (args.nonEmpty) {
      args.toSeq.foreach(a => require(SparkEntry.queries.contains(a), s"unknown query: $a"))
      args.toSeq
    } else Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_join_nation_revenue",
      "q05_latest_order_per_customer", "ev04_sessionize",
      "tx07_minhash_lsh_dedup", "sim01_knn_brute", "asof01_purchase_after_view",
      "q19_revenue_quartiles", "lp01_label_propagation", "km01_spherical_kmeans",
      "tx18_bm25_search", "sim05_rp_neardup", "q21_latest_orders_enriched",
      "q22_market_share", "tx23_sequence_packing", "tx26_decontamination",
      "smp01_stratified_sample", "sim07_quantized_knn", "ev21_slo_burn",
      "q26_topn_agg", "ev24_gap_islands", "ev26_attribution",
      "tx31_phrase_search", "rag04_token_chunks",
      "tx37_fuzzy_search", "tx39_gopher_rules", "tx40_prefix_search",
      "tx41_bigram_loglik", "dq06_snapshot_diff",
      "q27_trailing_spend", "lt02_novel_templates", "rag05_hybrid_rrf",
      "es07_incremental_rollup", "ev29_sequence_count", "ev30_sli_metrics",
      "q28_trend_dashboard", "sim11_binary_ann",
      "tx42_filtered_search", "ot03_trace_error_logs",
      "ev31_http_golden_signals", "ev32_apdex", "ot04_span_events",
      "dq08_field_shape_drift", "lt03_template_bursts", "qe01_output_quality",
      "tx44_rouge2", "tx45_synonym_search", "tg01_tag_genre_graph",
      "smp06_dedup_weighted_sample",
      "rag06_retrieval_eval", "qe03_citation_audit",
      "ev33_otel_http_requests", "ev34_pipeline_drilldown",
      "qe04_recap_quality", "ev36_severity_profile",
      "ot05_api_performance", "es09_trail_wear",
      "pf01_run_stats", "pf02_load_report", "ml04_multilabel_metrics",
      "jq01_stale_pending", "hs01_service_health", "slo01_violations",
      "tx46_short_doc_triage", "smp07_round_robin_cap",
      "pp02_language_quota", "qe05_run_comparison", "es10_stream_trim",
      "km07_cluster_quality", "pulse01_topic_selection",
      "dd06_syndication", "smp08_genre_trim", "pp03_evidence_scores",
      "tg04_genre_refine",
      "ce01_evidence_compression", "kw01_genre_keyword_scores",
      "kw02_genre_presence_scores", "gd01_golden_summary",
      "rag08_multilist_rrf", "ps01_prompt_sanitize",
      "qf01_query_facets", "fz01_embedding_zscore",
      "hy01_hyde_sanitize", "qv01_query_variants", "xs01_exec_summary",
      "rp01_llm_repetition", "gb01_graph_boost_snapshot",
      "tv01_tag_validation", "ke01_keyword_selection",
      "mt01_http_endpoint_stats", "mt06_sli_trends",
      "mt09_service_dependencies", "sat01_resource_utilization",
      "sat02_queue_saturation", "eb01_error_budget",
      "ti01_tier1_gate", "kh01_lens_visibility", "tt01_trending_tags",
      "gw01_genre_weights", "gw02_genre_embedding_bias",
      "qe06_recap_coverage", "qe07_ja_summary_quality",
      "ti02_feed_url_genres", "lt04_docker_log_issues",
      "gv01_strategy_breakdown", "gv03_confidence_profile",
      "bd01_graph_match_diagnosis", "gb02_boost_param_grid",
      "ur01_feed_url_dedup", "bf01_article_feed_backfill",
      "pf05_benchmark_stats", "ic01_content_inspection",
      "ng01_nginx_request_stats", "lg01_tag_label_graph",
      "as01_article_sizes", "vg02_golden_dataset_report",
      "td01_training_csv_build", "tt02_threshold_tuning",
      "pl01_pseudo_label_selection", "pe01_pipeline_health",
      "td02_tag_vote_labels",
      "fo01_recap_outlier_filter", "ml08_accuracy_wilson_ci",
      "ml09_confusion_effect", "gw03_retrain_weights",
      "gw04_retrain_embed_bias", "gc01_classifier_decision",
      "hm01_bm25_features", "hm02_hybrid_scores",
      "pre01_preprocess_gate", "hm03_corpus_vocab",
      "eq01_expansion_parse",
      "hd01_article_neardup", "hd02_dedup_stats",
      "is01_input_sanitize", "ex01_extract_metrics", "cc01_cascade_decisions",
      "ks01_knowledge_slo", "es11_trail_episodes", "ka01_projection_audit",
      "rag09_quality_verdict", "rag10_context_allocation", "rag11_article_bm25",
      "rag12_temporal_boost", "es12_home_item_score", "kh02_home_ranked",
      "cb01_bullet_citations", "gp01_rescue_propagation", "gp02_rescue_knn",
      "qj01_summary_quality_gate", "cf01_citation_format",
      "rag13_query_filters", "rag14_answer_validate", "rag15_answer_quality",
      "gc02_genre_blend", "rag16_paragraph_chunks", "rag17_chunk_diff",
      "ld01_detect_language", "rag18_query_intent")
    val out = new StringBuilder
    out ++= "# EXPLAIN — formatted physical plans of headline queries (sf0.01)\n\n"
    out ++= "Regenerate with `sbt \"runMain graft.tools.Scratch\"`. What to look\n"
    out ++= "for: `PushedFilters` + narrow `ReadSchema` on scans, `BroadcastHashJoin`\n"
    out ++= "for dimension joins, no `CartesianProduct` (PlanSpec enforces these).\n\n"
    headline.foreach { name =>
      out ++= s"## $name\n\n```\n"
      out ++= SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      out ++= "```\n\n"
    }
    Files.writeString(Paths.get("/root/repo/EXPLAIN.md"), out.toString)
    println("wrote EXPLAIN.md")
    spark.stop()
  }
}
