"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the full plan with the noop sink (count()
would let Catalyst prune the projections away). One warmup query runs
first so JVM/codegen startup isn't billed to the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from awsbeats_spark.registry import load_all
from awsbeats_spark.session import get_spark

HEADLINE = [
    "q_flagship_revenue_by_nation",
    "agg_group_sum_avg",
    "agg_rollup",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "window_topn_rank",
    "window_running_sum",
    "stream_session_window",
    "project_record",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "sim_search_topk",
    "sim_search_ivf",
    "text_quality_score",
    "text_fingerprint",
    "multimodal_decode",
    "sort_limit",
    # the reference's actual job: project-to-records + chunked retrying
    # delivery (filesystem stand-in client), measured end-to-end
    "sink_kinesis_batched_retry",
]

# Measured by tools/scale_probe.py and planned by tools/dump_plans.py but
# NOT part of the headline bench metric (keeps the recorded BASELINE
# comparison stable across rounds).
EXTENDED_PROBE = [
    "corpus_tfidf_topk",
    "corpus_doc_chunk",
    "corpus_pii_scrub",
    "corpus_token_pack",
    "corpus_decontaminate",
    "corpus_stratified_split",
    "corpus_filter_funnel",
    "text_normalize",
    "ts_gap_fill_ffill",
    "ts_ohlc_hourly",
    "ts_anomaly_mad",
    "events_retention_cohort",
    "events_markov_transitions",
    "graph_pagerank_transitions",
    "profile_columns",
    "scd2_history_intervals",
    "embed_knn_classify",
    "dedup_latest_per_key",
    "corpus_lm_score",
    "events_path_topk",
    "orders_open_backlog",
    "q_shipmode_priority",
    "q_waiting_suppliers",
    "join_interval_bucketed",
    "ts_ewma",
    "window_sliding_distinct",
    "join_asof_nearest",
    "corpus_global_shuffle",
    "q_min_cost_supplier",
    "q_dominant_part_suppliers",
    "text_repetition_gopher",
    "corpus_dup_span_detect",
    "corpus_mix_sample",
    "embed_quantize_sq8",
    "graph_triangle_count",
    "corpus_sample_k_per_group",
    "join_fuzzy_name_blocked",
    # round 2 additions
    "dq_constraint_violations",
    "dq_referential_orphans",
    "dq_duplicate_keys",
    "dq_freshness_watermark",
    "profile_columns_approx",
    "sim_search_range",
    "corpus_quantile_filter",
    "corpus_source_mix",
    "events_attribution_last_touch",
    "events_pattern_match",
    "embed_matryoshka_energy",
    "udtf_sentence_split",
    "codec_orc_roundtrip",
    "text_entropy_char",
    "scan_partition_pruned",
    "scan_schema_evolution",
    "embed_outlier_topk",
    "events_rfm_segmentation",
    "join_null_safe",
    "agg_bitmap_distinct",
    "scalar_interval_math",
    "agg_string_concat_ordered",
    # round 3 additions
    "retrieval_bm25_topk",
    "retrieval_query_likelihood",
    "retrieval_rrf_hybrid",
    "text_hashed_bow",
    "join_dynamic_in_pushdown",
    "part_skyline_pareto",
    "agg_decimal_exact_sum",
    "dedup_semantic_cluster",
    "agg_weighted_percentile",
    "ts_seasonal_decompose",
    "events_lateness_stats",
    "dedup_incremental_merge",
    "observability_observe_inline",
    "dedup_ngram_df_capped",
    # round 3b additions
    "geo_grid_neighbor_join",
    "geo_cell_density_topk",
    "text_readability_flesch",
    "text_zipf_slope",
    "dq_distribution_drift_psi",
    "dq_benford_first_digit",
    "ts_acf_hourly",
    "ts_downsample_lttb",
    "corpus_temperature_resample",
    "dq_ks_test_two_sample",
    "agg_gini_by_priority",
    "ts_changepoint_cusum",
    "corpus_bpe_pair_stats",
    "ts_trend_mann_kendall",
    "multimodal_audio_energy",
    "ts_max_drawdown",
    "events_ltv_decay",
    "sample_weighted_es",
    "ts_percentile_bands_daily",
    "text_pmi_collocations",
    "events_alert_episodes",
    "sketch_kmv_distinct",
    "events_assoc_rules",
    "orders_survival_km",
    "agg_winsorized_mean",
    # round 3c additions
    "ts_rolling_corr",
    "ts_cross_correlation_lag",
    "window_moving_median",
    "dq_outlier_iqr",
    "agg_entropy_by_group",
    "text_code_detect",
    "graph_type_overlap_jaccard",
    "corpus_ngram_novelty",
    "dedup_cross_source_priority",
    # round 3d additions
    "sketch_countmin_user_freq",
    "sketch_bloom_membership",
    "ts_period_over_period",
    "events_conversion_latency",
    "text_keyword_rake_topk",
    "embed_drift_centroid",
    # round 3e additions
    "corpus_span_mask_t5",
    "agg_hhi_concentration",
    "eval_ann_recall_ivf",
    "window_streak_longest",
    # round 3f additions
    "eval_pair_rouge_overlap",
    "scalar_try_safe_math",
    "window_share_of_total",
    # round 3g additions
    "events_bounce_rate",
    "events_lifecycle_stages",
    "events_dau_wau_mau",
    # round 3h additions
    "sql_recursive_cte",
    "scalar_url_parse",
    # round 3i additions
    "corpus_line_dedup_ccnet",
    "dq_volume_anomaly_daily",
    # round 3j additions
    "eval_minhash_vs_exact",
    "events_activity_heatmap",
    "events_new_vs_returning",
    "scalar_bitmask_flags",
    # round 3k additions
    "corpus_budget_allocate_lrm",
    "orders_cohort_ltv_curve",
    # round 3l additions
    "events_error_budget_burn",
    "text_compression_ratio",
    # round 3m additions
    "multimodal_shard_balance_lpt",
    "agg_higher_moments",
    # round 3n additions
    "ts_burstiness_fano",
    "dq_quarantine_rows",
    # round 3o additions
    "corpus_sft_pair_synth",
    "events_lorenz_deciles",
    # round 3p additions
    "corpus_vocab_growth_heaps",
    "text_source_js_divergence",
    # round 3q additions
    "events_diff_in_diff",
    "embed_cluster_purity",
    # round 3r additions
    "orders_interpurchase_gaps",
    "corpus_bigram_entropy_rate",
    # round 3s additions
    "q_customer_migration_matrix",
    "ts_seasonal_naive_error",
    # round 3t additions
    "text_word_burstiness",
    "corpus_mix_kl_to_target",
    # round 4 additions
    "dedup_ngram_topk_bounded",
    "sim_search_hamming_packed",
    "agg_partial_merge_shards",
    "ts_theil_sen_slope",
    "agg_quantile_merge_shards",
    "ts_dow_anova",
    "join_keyhash_sample_estimate",
    "join_bucketed_noshuffle",
    "eval_langid_confusion",
    "retrieval_overlap_at_k",
    "sim_search_cascade_rerank",
    "corpus_dedup_impact_report",
    "ts_forecast_linear_holdout",
    "multimodal_decode_quarantine",
    "ts_anomaly_seasonal_zscore",
    "join_asof_tolerance",
    "q_nation_trade_balance",
    "codec_csv_quoted_roundtrip",
    "events_peak_concurrency",
    "agg_histogram_equi_depth",
    "window_outlier_hampel",
    "dedup_containment_asymmetric",
    "graph_bipartite_projection",
    "dq_join_key_skew_profile",
    "dq_sequence_gap_audit",
    # round 5 additions
    "eval_containment_cap_impact",
    "eval_approx_distinct_error",
    "eval_freq_items_vs_exact",
    "eval_hll_union_vs_exact",
    "set_intersect_all",
    "set_except_all",
    "join_existence_mark",
    "agg_percentile_disc_rank",
    "events_audience_overlap_daily",
    "graph_degree_distribution",
    "multimodal_image_ahash",
    "eval_ahash_decode_parity",
    "events_ab_welch_ttest",
    "dq_key_candidate_scan",
    "orders_abc_classification",
    "embed_dim_variance_topk",
    "multimodal_video_luma_stats",
    "events_ratio_metric_delta_ci",
    "dq_functional_dependency_check",
    "retrieval_ndcg_graded",
    "codec_csv_corrupt_permissive",
    "events_funnel_windowed",
    "q_part_yoy_growth_topk",
    "ts_runs_test_randomness",
    "join_asof_forward",
    "sketch_kmv_set_ops",
    "events_hour_uniformity_chi2",
    "text_source_vocab_overlap",
    "join_not_in_vs_not_exists",
    "dq_order_total_reconciliation",
    "ts_ljung_box_q",
    "orders_ship_latency_quantiles",
    "events_ab_srm_check",
    "graph_assortativity_degree",
    "multimodal_image_edge_density",
    "q_revenue_concentration_topn_share",
    "multimodal_audio_silence_gate",
    "events_attribution_first_touch",
    "events_transition_entropy_rate",
    "events_ab_cuped",
    "ts_lagged_regression",
    "window_gap_islands",
    "embed_random_projection_jl",
    "multimodal_audio_zero_crossing",
    "eval_jl_distance_distortion",
    "text_dense_hashed_embedding",
    "corpus_bigram_kneser_ney",
    "q_order_status_mix_yearly",
    "orders_seasonality_index",
    "ts_decomposition_strength",
    "ts_spectral_peak_dft",
    "agg_theil_inequality_decomp",
    "multimodal_bmp_color_moments",
    "agg_eb_shrunk_rates",
    "q_discount_elasticity",
    "dq_value_drift_emd",
    "multimodal_audio_fingerprint",
    "eval_markov_top1_accuracy",
    "geo_knn_grid",
    "sketch_hll_manual_registers",
    "window_bollinger_breach",
    "events_ab_power_mde",
    "agg_cramers_v_association",
    "orders_month_end_loading",
    "agg_hill_tail_index",
    "corpus_sft_lint",
    "agg_lognormal_fit_audit",
    "corpus_token_efficiency_by_lang",
    "multimodal_corpus_mix",
    "agg_spearman_corr",
    "agg_mutual_information",
    "events_poisson_burst_chernoff",
    "ts_hurst_rs",
    "window_rsi_cutler",
    "ts_pacf_durbin_levinson",
    "events_burst_fdr_bh",
    "text_hapax_ratio",
    "corpus_msttr_diversity",
    "multimodal_audio_dynamic_range",
    "graph_clustering_coefficient",
    "eval_sq8_cosine_preservation",
    "embed_label_centroid_cosine",
    "corpus_oov_rate_topk_vocab",
    "agg_corr_matrix_pairs",
    "agg_bootstrap_ci_poisson",
    "events_interarrival_cv",
    "multimodal_image_histogram_entropy",
    "sketch_linear_counting_distinct",
    "graph_lpa_communities",
    "dedup_image_ahash_pairs",
    "retrieval_maxsim_late_interaction",
    "ts_holt_linear_forecast",
    "sim_search_ivfpq",
    "graph_kcore_peel",
    "sample_stratified_neyman",
    "corpus_split_leakage_audit",
    "udtf_json_flatten",
    "geo_user_travel_haversine",
    "retrieval_mmr_diversify",
    "corpus_chunk_overlap_windows",
    "eval_ahash_band_recall",
    "upsert_scd2_merge",
    "eval_chunk_overlap_vs_disjoint",
    "reco_item_item_cooccurrence",
    "join_bloom_prefilter_audit",
    "ts_sma_crossover_signals",
    "events_nb_feature_loglik",
    "mv_incremental_refresh",
    "scan_manifest_filelist",
    "geo_dbscan_cells",
    "multimodal_audio_active_segments",
    "geo_impossible_travel_flags",
    "codec_json_corrupt_permissive",
    "corpus_length_bucket_batching",
    "reco_user_recommendations",
    "eval_reco_holdout_hitrate",
    "supplier_scorecard_composite",
    "dq_schema_contract_check",
    "agg_median_two_pass_binned",
    "sample_md5_threshold",
    "eval_pq_rank_quality",
    "corpus_contrastive_pair_mining",
    "dq_simpsons_paradox_probe",
    "corpus_dedup_apply_chain",
    "agg_eta_squared_by_keys",
    "multimodal_bmp_spatial_autocorr",
    "eval_token_pack_efficiency",
    "scalar_surrogate_key_uuid5",
    "orders_basket_size_histogram",
    "dq_rare_category_audit",
    "agg_weighted_corr",
    "agg_pythagorean_means",
    "events_kpi_daily_snapshot",
    "q_revenue_bridge_decomposition",
    "events_ab_sequential_sprt",
    "graph_transition_reciprocity",
    "events_sessions_per_user_hist",
    "corpus_version_hash",
    "dq_partition_checksums",
    "q_discount_depth_bands",
    "corpus_prefix_boilerplate_topk",
    "events_conformance_illegal_transitions",
    "join_point_in_time_scd2",
    "ts_time_weighted_average",
    "events_cohens_d_effect_size",
    "multimodal_rgb_channel_correlation",
    # round 6 additions
    "corpus_bpe_encode",
    "dedup_url_registered_domain",
    "retrieval_crossencoder_rerank",
    "geo_geohash_density",
    "geo_bbox_assign",
    "udtf_pcm_frames",
    "corpus_bt_source_strength",
    "corpus_mix_reweight_mw",
    "scale_zorder_clustering_audit",
    "profile_value_topk",
    "corpus_dsir_importance",
    "corpus_quality_classifier_filter",
    "graph_adamic_adar_topk",
    "text_winnowing_fingerprints",
    "multimodal_video_scene_cuts",
    "set_symmetric_diff_all",
    "sketch_ddsketch_quantiles",
    "orders_littles_law_audit",
    "corpus_bpe_compression_by_lang",
    "dq_spc_western_electric",
    "dedup_content_defined_chunks",
    "embed_isotropy_audit",
    "embed_kcenter_coreset",
    "agg_huber_m_location",
    "graph_hits_hubs_authorities",
    "orders_weibull_fit_interpurchase",
    "ts_page_hinkley_drift",
    "scan_rowgroup_stats_audit",
    "ts_gumbel_block_maxima",
    "events_mannwhitney_u",
    "dq_mahalanobis_outliers",
    "geo_geometric_median_weiszfeld",
    "events_kruskal_wallis_h",
    "dq_luhn_checksum_validate",
    "dedup_idf_weighted_jaccard",
    # round 7 additions
    "udtf_markdown_sections",
    "profile_daily_column_stats",
    "set_multiset_compare",
    "embed_semdedup_prune",
    "eval_semdedup_lexical_overlap",
    "retrieval_prf_rm3",
    "text_unigram_perplexity",
    "corpus_epoch_shard_plan",
    "scale_compaction_binpack",
    "stream_hopping_topk",
    "ts_holt_winters_additive",
    "udtf_run_length_encode",
    "eval_prf_rank_shift",
    "dq_levene_variance_homogeneity",
    "embed_cosine_pair_histogram",
    "dedup_edit_distance_verify",
    "corpus_dsir_ess",
    "multimodal_video_keyframe_per_shot",
    "graph_markov_absorption_time",
    "eval_lsh_band_tradeoff",
    "corpus_interleave_sources_roundrobin",
    "ts_intervention_its",
    "graph_first_passage_cdf",
    "set_relational_division",
    "stream_watermark_lateness_curve",
    "eval_ivf_nprobe_curve",
    "corpus_canary_scan",
    "events_session_gap_sensitivity",
    # round 8 additions
    "embed_semdedup_prune_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("awsbeats-bench")
    specs = load_all()

    # Warmup before measuring: run every headline query once at the
    # smallest SF (plus a pandas-UDF no-op for the Arrow worker pool).
    # This JITs the hot expression paths (the md5/higher-order-function
    # trees otherwise pay ~5s of HotSpot warmup billed to whichever
    # query runs them first), compiles codegen, and primes parquet
    # footers — so the recorded numbers measure the engine, not JVM
    # startup. Falls back to the target SF if sf0.001 is absent.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for name in HEADLINE:
        specs[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # median of 3 runs per query: single-shot numbers on a shared host
    # showed 2x run-to-run variance (GC, page cache, sibling load);
    # the median is the honest steady-state figure
    timings: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
