"""Empty-input robustness: every operator family must return an empty
(or well-defined) result on zero-row tables — not throw. At 100 TB,
empty partitions/days are routine (a new tenant, a filtered date range);
an operator that NPEs on size(null) or divides by an empty count takes
the whole pipeline down.

The empty tables are written with pyarrow using the EXACT physical
schemas of the testdata (including events' TIMESTAMP(NANOS)) so the
catalog's normalization path is exercised too.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.catalog import TABLE_NAMES
from awsbeats_spark.registry import load_all

SPECS = load_all()

# operators whose outputs are legitimately non-empty on empty input
# (global aggregates return one row of zeros/nulls)
GLOBAL_AGG = {
    "q6_forecast_revenue",
    "events_conversion_latency",
    "eval_minhash_vs_exact",
    "sketch_bloom_membership",
    "graph_triangle_count",
    "text_zipf_slope",
    "dq_ks_test_two_sample",
    "ts_trend_mann_kendall",
    "ts_theil_sen_slope",
    "join_keyhash_sample_estimate",
    "orders_littles_law_audit",
    "embed_isotropy_audit",
    "orders_weibull_fit_interpurchase",
    "ts_gumbel_block_maxima",
    "events_mannwhitney_u",
}

# operators with a fixed output shape regardless of input rows
FIXED_ROWS = {
    "profile_columns": 11,
    "profile_columns_approx": 11,
    "dq_constraint_violations": 7,
    "dq_referential_orphans": 4,
    "dq_duplicate_keys": 3,
    "dq_distribution_drift_psi": 10,
    "dq_benford_first_digit": 9,
}

SAMPLE = [
    "scan_parquet",
    "filter_predicate",
    "project_record",
    "scalar_math",
    "agg_group_sum_avg",
    "agg_skew_salted",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "join_skew_salted",
    "window_topn_rank",
    "window_running_sum",
    "set_union",
    "stream_tumbling_agg",
    "stream_watermark_dedup",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_search_topk",
    "sim_search_ivf",
    "text_stats",
    "text_quality_score",
    "text_fingerprint",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_feature_extract",
    "stream_stateful_totals",
    "q_flagship_revenue_by_nation",
    "q_market_share",
    "codec_json_roundtrip",
    "corpus_tfidf_topk",
    "corpus_doc_chunk",
    "corpus_pii_scrub",
    "corpus_token_pack",
    "corpus_decontaminate",
    "corpus_stratified_split",
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
    "text_normalize",
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
    # round-5/6 session additions (cross-section)
    "graph_lpa_communities",
    "dedup_image_ahash_pairs",
    "retrieval_maxsim_late_interaction",
    "ts_holt_linear_forecast",
    "sim_search_ivfpq",
    "graph_kcore_peel",
    "sample_stratified_neyman",
    "corpus_split_leakage_audit",
    "geo_user_travel_haversine",
    "corpus_chunk_overlap_windows",
    "upsert_scd2_merge",
    "reco_item_item_cooccurrence",
    "ts_sma_crossover_signals",
    "mv_incremental_refresh",
    "geo_dbscan_cells",
    "multimodal_audio_active_segments",
    "geo_impossible_travel_flags",
    "corpus_length_bucket_batching",
    "supplier_scorecard_composite",
    "agg_median_two_pass_binned",
    "sample_md5_threshold",
    "agg_freq_items_approx",
    "graph_triangle_count",
    "corpus_sample_k_per_group",
    "join_fuzzy_name_blocked",
    "agg_conditional_bools",
    "agg_regression_by_group",
    "scalar_higher_order",
    "scalar_sequence_months",
    "lateral_posexplode",
    "scalar_array_setops",
    "cdc_apply_tombstones",
    "embed_kmeans_cluster",
    "sim_search_pq",
    "scalar_variant_json",
    # round-2 operators
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
    # round-3b operators
    "geo_grid_neighbor_join",
    "geo_cell_density_topk",
    "text_readability_flesch",
    "text_zipf_slope",
    "dq_distribution_drift_psi",
    "dq_benford_first_digit",
    "dq_ks_test_two_sample",
    "agg_gini_by_priority",
    "ts_acf_hourly",
    "ts_downsample_lttb",
    "ts_changepoint_cusum",
    "ts_trend_mann_kendall",
    "corpus_temperature_resample",
    "corpus_bpe_pair_stats",
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
    # round-3c..3j operators
    "ts_rolling_corr",
    "ts_cross_correlation_lag",
    "window_moving_median",
    "dq_outlier_iqr",
    "agg_entropy_by_group",
    "text_code_detect",
    "graph_type_overlap_jaccard",
    "corpus_ngram_novelty",
    "dedup_cross_source_priority",
    "sketch_countmin_user_freq",
    "sketch_bloom_membership",
    "ts_period_over_period",
    "events_conversion_latency",
    "text_keyword_rake_topk",
    "embed_drift_centroid",
    "corpus_span_mask_t5",
    "agg_hhi_concentration",
    "eval_ann_recall_ivf",
    "window_streak_longest",
    "eval_pair_rouge_overlap",
    "scalar_try_safe_math",
    "window_share_of_total",
    "events_bounce_rate",
    "events_lifecycle_stages",
    "events_dau_wau_mau",
    "sql_recursive_cte",
    "scalar_url_parse",
    "corpus_line_dedup_ccnet",
    "dq_volume_anomaly_daily",
    "eval_minhash_vs_exact",
    "events_activity_heatmap",
    "events_new_vs_returning",
    "scalar_bitmask_flags",
    # round-4 operators
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
    # round-6 session-4 additions
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
    "orders_littles_law_audit",
    "sketch_ddsketch_quantiles",
    "corpus_bpe_compression_by_lang",
    "dq_spc_western_electric",
    "dedup_content_defined_chunks",
    "embed_isotropy_audit",
    "agg_huber_m_location",
    "graph_hits_hubs_authorities",
    "orders_weibull_fit_interpurchase",
    "ts_page_hinkley_drift",
    "ts_gumbel_block_maxima",
    "events_mannwhitney_u",
    "dq_mahalanobis_outliers",
    "geo_geometric_median_weiszfeld",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", SAMPLE)
def test_operator_handles_empty_input(spark, empty_dir, name):
    out = SPECS[name].fn(spark, empty_dir)
    rows = out.collect()
    if name in GLOBAL_AGG:
        assert len(rows) <= 1
    elif name in FIXED_ROWS:
        assert len(rows) == FIXED_ROWS[name]
    else:
        assert rows == []
