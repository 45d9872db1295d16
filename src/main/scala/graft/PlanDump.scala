package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: the formatted physical plan of each headline
  * query at a given sf dir — the `.explain("formatted")` review the
  * scale posture is judged on (pushdown, broadcasts, exchange count).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val headline = Seq(
      "rel_pricing_summary", "rel_filter_proj", "rel_top_revenue_orders",
      "rel_revenue_by_nation", "rel_window_running_sum", "rel_percentiles",
      "ev_sessionize", "dedup_minhash_sig", "dedup_ngram_jaccard",
      "dedup_simhash", "sim_cosine_topk", "sim_embedding_neardup",
      "sim_ann_ivf", "txt_fingerprint", "par_page_line_banding",
      "rel_range_join_binned", "ev_funnel", "ev_session_attribution",
      "txt_pack_batches", "txt_split_hash", "txt_gopher_quality",
      "sim_lang_centroid", "ev_first_seen", "rel_correlated_max",
      "rel_bloom_prune", "rel_pivot_priority", "txt_tfidf_topk",
      "ev_retention", "dedup_cc", "rel_outer_nation_balance",
      "rel_profile_columns", "rel_grouping_sets", "ev_mode_event",
      "ev_lag_lead", "txt_stratified_sample", "txt_contamination",
      "rel_asof_join", "rel_salted_skew_join", "rel_unpivot",
      "rel_trailing_30d_revenue", "dedup_lsh_keep_best",
      "ev_session_window", "txt_bpe_tokens", "sim_ivf_assign",
      "mm_resize_plan", "rel_sql_frontend", "ev_interval_coverage",
      "ev_rank_metrics", "dedup_fuzzy_verify",
      "ev_user_journey", "par_column_threshold", "ev_gap_fill",
      "rel_scd2_dimension", "rel_merge_upsert", "rel_data_skew_profile",
      "txt_bigram_lm", "ev_anomaly_zscore", "ev_markov_transitions",
      "ev_rfm_segments", "ev_heavy_hitters", "ev_sliding_window_counts",
      "sim_knn_graph", "sim_kmeans_step", "mm_shard_manifest",
      "dedup_span_exact", "dedup_span_ratio", "sim_pq_encode",
      "txt_bigram_surprisal", "txt_quality_buckets",
      "rel_waiting_suppliers", "rel_range_join_auto",
      "rel_interval_overlap_join", "rel_winsorized_stats",
      "rel_shipping_priority", "ev_ab_ttest", "ev_hourly_uniques",
      "sim_pq_adc_topk", "ev_velocity_flags", "rel_exists_sql",
      "rel_lateral_topk", "rel_corr_manual", "txt_hashed_features",
      "rel_small_qty_revenue", "rel_large_orders", "rel_dq_audit",
      "rel_incremental_agg", "gr_pagerank", "gr_triangle_count",
      "txt_char_diversity", "txt_classifier_score", "mm_audio_windows",
      "ev_constrained_funnel", "txt_chunk_manifest", "rel_asof_tolerance",
      "rel_disjunctive_join", "ev_topk_per_type", "rel_snapshot_diff",
      "sim_semantic_verdict", "rel_hll_rollup", "rel_not_in_nulls",
      "rel_null_agg_semantics", "rel_revenue_share", "rel_benford_check",
      "ev_cumulative_users", "rel_month_end_arith", "rel_sequence_gaps",
      "ev_stickiness", "ev_gap_histogram", "rel_asof_forward",
      "gr_kcore", "gr_common_neighbors", "gr_degree_hist",
      "txt_weighted_sample", "txt_pmi_collocations", "txt_readability",
      "txt_mixture_weights", "txt_source_overlap", "txt_source_diversity",
      "txt_rake_keywords", "txt_bpe_merge_count",
      "ev_changepoint_cusum", "ev_peak_concurrency", "ev_cohort_ltv",
      "ev_seasonality", "rel_price_deciles", "rel_weighted_median",
      "rel_pareto_frontier", "rel_rank_movers", "mm_scene_cuts",
      "ev_streaks", "ev_multitouch_attribution", "ev_churn_risk",
      "dedup_containment", "rel_decile_lift", "txt_ngram_novelty",
      "txt_vocab_coverage", "gr_bfs_reach", "mm_phash_hamming",
      "mm_modality_balance",
      "rel_table_fingerprint", "sim_ivf_recall", "txt_domain_affinity",
      "gr_modularity", "gr_assortativity", "ev_ewma_trend",
      "ev_semi_additive_balance", "txt_inverted_postings",
      "dedup_minhash_accuracy", "gr_local_clustering",
      "dedup_stack_verdict", "dedup_span_scrub", "ev_forecast_backtest",
      "rel_merkle_ranges", "mm_decode_features", "rel_approx_distinct",
      "rel_approx_percentiles",
      "sim_matryoshka_recall", "txt_source_tvd", "ev_lifetime_table",
      "gr_personalized_ppr",
      "mm_dedup_verdict", "sim_sq_recall", "txt_filter_funnel",
      "rel_min_cost_supplier",
      "gr_hits", "ev_user_concentration", "txt_zipf_check",
      "sim_lsh_recall", "sim_kmeans_quality", "ev_trigram_paths",
      "dedup_source_impact", "txt_fertility_by_lang",
      "rel_k_anonymity", "ev_m4_downsample",
      "ev_cms_accuracy", "mm_tile_plan",
      "dedup_onion", "ev_user_overlap", "sim_kpp_init",
      "rel_chi2_independence", "rel_outlier_iqr", "txt_code_detect",
      "rel_scd2_lookup", "gr_random_walk",
      "dedup_lsh_recall_curve", "ev_kpi_deltas",
      "sim_embedding_health", "txt_length_histogram",
      "sim_probe_sweep", "gr_graph_summary",
      "ev_burn_rate_alert", "rel_grouping_id",
      "ev_new_vs_returning", "txt_quality_dedup_matrix",
      "ev_attribution_compare", "dedup_shingle_sweep",
      "rel_keep_last_n", "dedup_cluster_purity")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans (")
      .append(sfDir).append(")\n\n")
    sb.append("Generated by `graft.PlanDump`. What to look for: ")
      .append("`PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` ")
      .append("for dims and query sets, `TakeOrderedAndProject` for top-k, ")
      .append("exchange count (one per intended shuffle), codegen spans.\n")
    for (name <- headline) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
