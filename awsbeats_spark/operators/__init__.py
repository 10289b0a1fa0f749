"""Operator modules. Importing this package registers every operator
into ``awsbeats_spark.registry.QUERIES``.

Registration ORDER is part of the correctness strategy: the driver's
per-round pass walks ``queries()`` in registration order under a ~50-key
budget, so keys that most need a driver-green row must register first.
After importing every module (which registers keys in module order),
``_reorder()`` rebuilds the registry dict to the explicit rotation below.

Rotation plan (kept current each round; the flip at the top of a round is
the single highest-leverage edit — see VERDICT round 3 item 1):

* **Rounds 1-3** (history): r1 checked aggregates/extended/graph/joins/
  pipeline (46 keys), r2 llm.*/quality/udtf (46), r3 the 8 fixed-but-red
  keys + relational/windows/setops/sqlfuncs/streaming stragglers (50/50
  green — first fully-green round). 142/279 keys had a driver row after
  round 3; zero red anywhere.
* **Round 4** (``_ROUND4_WINDOW``, exactly 50, all driver-green in
  CORRECTNESS_r04): the 45-key round-4 block (scale 18, profiling 3,
  timeseries 8, tpch_more 13, agg_bitmap_distinct,
  events_attribution_last_touch, events_pattern_match) plus the first
  5 of the old round-5 front (llm.retrieval x4,
  join_dynamic_in_pushdown). After round 4: 192/304.
* **Round 5** (``_ROUND5_WINDOW``, exactly 50, all driver-green in
  CORRECTNESS_r05): the remaining 9 of the old round-5 front, then
  corpus/similarity/text/quality/scalar/window/sketch keys in
  registry order. After round 5: 242/450 (the catalog grew to 478 in
  round 6; denominators below use 485).
* **Round 6** (``_ROUND6_WINDOW``, exactly 50, all driver-green in
  CORRECTNESS_r06): the remaining timeseries/events/geo/graph tail
  plus the first 13 operators added in round 4. After round 6:
  292/485.
* **Round 7** (``_ROUND7_WINDOW``, exactly 50, all driver-green in
  CORRECTNESS_r07 — 49/49 checkable + 1 declared rows-only): the 12
  round-4 additions that overflow round 6's budget plus the earliest
  38 round-5 additions. After round 7: 342/513.
* **Round 8** (``_ROUND8_WINDOW``, exactly 50, all driver-green in
  CORRECTNESS_r08): the later round-5 additions that overflow round
  7's budget. After round 8: 392/525 driver-evidenced.
* **Round 9** (``_ROUND9_WINDOW``, exactly 50, all driver-green in
  CORRECTNESS_r09): round-5 late additions (442/530 after round 9; the
  catalog grew to 530 with the five round-9 keys, which queue in
  ``_ROUND11_WINDOW``).
* **Round 10** (``_ROUND10_WINDOW``, 46 + 4 rechecks, all driver-green
  in CORRECTNESS_r10 — 50/50 hash-checked): the overflow past round
  9's budget plus round-6/7 additions. After round 10: 492/534.
* **Round 11**
  (``_ROUND11_WINDOW``, 46 + 4 rechecks = the full 50-key budget, all
  driver-green in CORRECTNESS_r11 — 50/50): round-7/8/9 additions plus
  the 4 round-10 additions. Every key registered through round 10 is
  now driver-evidenced.
* **Round 12** (NOW FRONTED): ``_ROUND12_WINDOW`` (the 4 round-11
  additions — the only never-driver-checked keys left) + 46 rolling
  re-checks (``_ROUND12_RECHECKS``): all 19 HEADLINE keys (the final
  optimization round restructures several; the driver re-oracles every
  touched query) then the oldest round-1 greens. New keys would open
  ``_ROUND13_WINDOW``.

The window lists partition the keys that had no driver row as of
CORRECTNESS_r03 plus every key added since (25 in round 4, 116 in
round 5, 35 in round 6); a test in tests/test_rotation.py pins this against the
CORRECTNESS_r0{1,2,3} files so the flip cannot silently drift. New
keys are ALWAYS appended to the last window. Post-flip registration
order is r10, rechecks, r11, rechecks-r11, then the already-green
r9/r8/r7/r6/r5/r4 blocks — never-driver-checked keys queue ahead of
everything that already has a green driver row.
"""

from awsbeats_spark import registry
from awsbeats_spark.operators.llm import (  # noqa: F401
    corpus,
    dedup,
    multimodal,
    retrieval,
    similarity,
    text,
)
from awsbeats_spark.operators import (  # noqa: F401
    quality,
    udtf,
    relational,
    windows,
    setops,
    sqlfuncs,
    streaming_batch,
    scale,
    profiling,
    timeseries,
    tpch_more,
    aggregates,
    extended,
    graph,
    joins,
    pipeline,
    geo,
)

_ROUND4_WINDOW = [
    "agg_bitmap_distinct",
    "stream_stateful_totals",
    "agg_skew_salted",
    "join_skew_salted",
    "codec_json_roundtrip",
    "codec_csv_roundtrip",
    "q_market_share",
    "q_ship_priority",
    "agg_mode_argmax",
    "window_ntile_cume",
    "multimodal_feature_extract",
    "upsert_scd1",
    "lateral_explode_props",
    "q_small_qty_revenue",
    "q_returned_items",
    "sample_hash_deterministic",
    "events_funnel",
    "dedup_latest_per_key",
    "codec_orc_roundtrip",
    "profile_columns",
    "profile_columns_approx",
    "scd2_history_intervals",
    "ts_gap_fill_ffill",
    "ts_ohlc_hourly",
    "events_retention_cohort",
    "ts_anomaly_mad",
    "orders_open_backlog",
    "ts_ewma",
    "ts_interpolate_linear",
    "events_rfm_segmentation",
    "q_promo_revenue_ratio",
    "q_large_volume_customers",
    "q_customer_distribution",
    "q_volume_shipping",
    "q_product_profit_by_nation",
    "q_top_supplier",
    "q_important_suppliers",
    "q_rich_inactive_customers",
    "q_disjunctive_brand_filter",
    "q_shipmode_priority",
    "q_waiting_suppliers",
    "q_min_cost_supplier",
    "q_dominant_part_suppliers",
    "events_attribution_last_touch",
    "events_pattern_match",
    "retrieval_bm25_topk",
    "retrieval_query_likelihood",
    "retrieval_rrf_hybrid",
    "text_hashed_bow",
    "join_dynamic_in_pushdown",
]


_ROUND5_WINDOW = [
    "part_skyline_pareto",
    "agg_decimal_exact_sum",
    "dedup_semantic_cluster",
    "agg_weighted_percentile",
    "ts_seasonal_decompose",
    "events_lateness_stats",
    "dedup_incremental_merge",
    "observability_observe_inline",
    "dedup_ngram_df_capped",
    "corpus_temperature_resample",
    "corpus_bpe_pair_stats",
    "corpus_ngram_novelty",
    "corpus_span_mask_t5",
    "corpus_line_dedup_ccnet",
    "corpus_budget_allocate_lrm",
    "corpus_sft_pair_synth",
    "corpus_vocab_growth_heaps",
    "corpus_bigram_entropy_rate",
    "corpus_mix_kl_to_target",
    "embed_drift_centroid",
    "eval_ann_recall_ivf",
    "embed_cluster_purity",
    "dedup_cross_source_priority",
    "eval_minhash_vs_exact",
    "eval_pair_rouge_overlap",
    "multimodal_audio_energy",
    "multimodal_shard_balance_lpt",
    "text_readability_flesch",
    "text_zipf_slope",
    "text_pmi_collocations",
    "text_code_detect",
    "text_keyword_rake_topk",
    "text_compression_ratio",
    "text_source_js_divergence",
    "text_word_burstiness",
    "dq_distribution_drift_psi",
    "dq_benford_first_digit",
    "dq_ks_test_two_sample",
    "agg_gini_by_priority",
    "dq_outlier_iqr",
    "dq_volume_anomaly_daily",
    "dq_quarantine_rows",
    "scalar_try_safe_math",
    "scalar_url_parse",
    "scalar_bitmask_flags",
    "window_moving_median",
    "window_streak_longest",
    "window_share_of_total",
    "sample_weighted_es",
    "sketch_kmv_distinct",
]


_ROUND6_WINDOW = [
    "events_assoc_rules",
    "agg_winsorized_mean",
    "sketch_countmin_user_freq",
    "sketch_bloom_membership",
    "ts_acf_hourly",
    "ts_downsample_lttb",
    "ts_changepoint_cusum",
    "ts_trend_mann_kendall",
    "ts_max_drawdown",
    "events_ltv_decay",
    "ts_percentile_bands_daily",
    "events_alert_episodes",
    "orders_survival_km",
    "ts_rolling_corr",
    "ts_cross_correlation_lag",
    "ts_period_over_period",
    "events_conversion_latency",
    "events_bounce_rate",
    "events_lifecycle_stages",
    "events_dau_wau_mau",
    "events_activity_heatmap",
    "events_new_vs_returning",
    "orders_cohort_ltv_curve",
    "events_error_budget_burn",
    "ts_burstiness_fano",
    "events_lorenz_deciles",
    "events_diff_in_diff",
    "orders_interpurchase_gaps",
    "ts_seasonal_naive_error",
    "q_customer_migration_matrix",
    "agg_entropy_by_group",
    "agg_hhi_concentration",
    "agg_higher_moments",
    "sql_recursive_cte",
    "graph_type_overlap_jaccard",
    "geo_grid_neighbor_join",
    "geo_cell_density_topk",
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
]


_ROUND7_WINDOW = [
    # round-4 overflow + earliest round-5 additions, capped at the
    # ~50-key per-round driver budget (split like round 4 did for r6)
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
]

_ROUND8_WINDOW = [
    # later round-5 additions that overflow the round-7 budget;
    # new keys always append to the LAST window
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
]

_ROUND9_WINDOW = [
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
]

_ROUND10_WINDOW = [
    "dq_partition_checksums",
    "q_discount_depth_bands",
    "corpus_prefix_boilerplate_topk",
    "events_conformance_illegal_transitions",
    "join_point_in_time_scd2",
    "ts_time_weighted_average",
    "events_cohens_d_effect_size",
    "multimodal_rgb_channel_correlation",
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
    # round-7 additions (window now 46 + 4 deliberate re-checks = the
    # full 50-key round-10 driver budget; round-8+ additions open
    # _ROUND11_WINDOW)
    "udtf_markdown_sections",
    "profile_daily_column_stats",
    "set_multiset_compare",
]


# Round-11 driver window (NOW FRONTED): _ROUND11_WINDOW +
# _DELIBERATE_RECHECKS_R11 is exactly the 50-key round-11 budget —
# zero slack. Keys added in round 11 or later MUST go to
# _ROUND12_WINDOW below (appending here overflows the budget and the
# <=50 guard in tests/test_rotation.py fails at add time).
_ROUND11_WINDOW = [
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
    # round-8 additions
    "embed_semdedup_prune_ivf",
    "udtf_ndjson_repair",
    "profile_parquet_footer_drift",
    "eval_matryoshka_recall_curve",
    "dedup_cluster_size_powerlaw",
    "dedup_source_conflict_audit",
    "corpus_temperature_sampling_plan",
    "stream_backpressure_queue_depth",
    "pipeline_slo_burn_alert",
    "udtf_seq_pack_nextfit",
    "eval_backpressure_capacity_curve",
    "eval_seq_pack_efficiency",
    # round-9 additions (cap <= 10, VERDICT r8 item 3; actual +5)
    "ts_ewma_time_decay",
    "eval_pack_attention_contamination",
    "eval_quality_calibration_ece",
    "eval_blocking_quality",
    "multimodal_audio_clipping_detect",
    # round-10 additions (cap <= 4, VERDICT r9 item 4; actual +4 — this
    # exactly fills round 11's 50-key budget: 46 window + 4 rechecks)
    "dq_k_anonymity",
    "eval_dedup_cluster_bcubed",
    "corpus_rho_excess_loss",
    "multimodal_audio_spectral_centroid",
]

# Deliberate driver RE-checks (VERDICT r6 item 3): these four keys were
# converted from rows-only to hash-checked in r5/r6 but their latest
# driver row still predates the conversion (stale ``no_oracle``). They
# queue immediately after _ROUND10_WINDOW so round 10's spare driver
# budget (50 - len(_ROUND10_WINDOW)) produces fresh green rows for the
# converted oracles. The overlap tripwire in tests/test_rotation.py
# whitelists exactly this list.
_DELIBERATE_RECHECKS = [
    "agg_percentile_approx",
    "agg_approx_distinct",
    "agg_hll_sketch_union",
    "embed_kmeans_cluster",
]

# Second deliberate-recheck batch (VERDICT r7 item 3): the three keys
# converted from rows-only to hash-checked in ROUND 7 (exact-count
# sandwiches for freq-items/profile, quantized power iteration for
# PCA). Their latest driver rows still say ``no_oracle`` (r1/r4/r2) and
# round 10's budget is exactly full (46 + 4 = 50), so they queue in
# round 11's slack (25 + 3 = 28 <= 50), consumed right after
# _ROUND11_WINDOW. The overlap tripwire whitelists both recheck lists.
# Round-12 driver window: round 11's budget is exactly full (46 + 4),
# so keys added in round 11+ queue here (checked round 12 onward; new
# keys ALWAYS append to the last window).
_ROUND12_WINDOW: list[str] = [
    # round-11 additions (round 11's own budget is full, so these take
    # the FRONT of the round-12 driver window)
    "eval_contamination_ngram_overlap",
    "embed_alignment_uniformity",
    "dedup_suffix_array_substring",
    "multimodal_image_dct_phash",
]

_DELIBERATE_RECHECKS_R11 = [
    "agg_freq_items_approx",
    "profile_columns_approx",
    "embed_pca_project",
    # converted from rows-only to hash-checked in ROUND 9 (bit-exact
    # DuckDB replay of the aHash pipeline incl. signed int64 packing);
    # its r7 driver row predates the oracle, so re-evidence it
    "multimodal_image_ahash",
]

# Round-12 rolling re-checks (the docstring's "spare round-12+ slots
# recheck round-1/2 greens on a rolling basis" — every key registered
# through round 11 is driver-evidenced after CORRECTNESS_r11's 50/50, so
# round 12's spare budget is 50 - len(_ROUND12_WINDOW) = 46). Priority
# within the spare budget:
# 1. All 19 HEADLINE bench keys (oracle rows from r1-r3). Round 12 is
#    the final optimization round: several of these are restructured
#    (dedup_ngram_jaccard pair exchange, sink manifest path, join_asof /
#    stream_session_window builds), and fronting them makes the driver
#    re-oracle every touched query immediately after the changes —
#    "queries_newly_failing" insurance at zero budget cost.
# 2. The oldest driver evidence in the repo: round-1 greens in their
#    original CORRECTNESS_r01 order (skipping keys already queued in
#    the earlier recheck lists).
_ROUND12_RECHECKS = [
    # headline bench keys (bench.py HEADLINE, same order)
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
    "sink_kinesis_batched_retry",
    # oldest round-1 greens, rolling
    "agg_group_count",
    "agg_distinct",
    "graph_triangle_count",
    "agg_cube",
    "agg_stats",
    "agg_bucketed_histogram",
    "agg_pivot",
    "agg_corr_stats",
    "agg_collect_sorted",
    "agg_percentile_exact",
    "scan_events_stream",
    "udf_pandas_zscore",
    "udf_pandas_grouped_agg",
    "sql_cte_query",
    "agg_grouping_sets",
    "subquery_correlated",
    "unpivot_stack",
    "scalar_conditional",
    "q6_forecast_revenue",
    "q_order_priority_exists",
    "q_top_customers",
    "q_brand_supplier_stats",
    "window_first_last",
    "scan_python_datasource",
    "events_markov_transitions",
    "graph_pagerank_transitions",
    "events_path_topk",
]


def _reorder() -> None:
    # Re-check keys may legitimately also appear in an old (already
    # driver-checked) window — e.g. profile_columns_approx sits in
    # _ROUND4_WINDOW; drop them from the tail so they register exactly
    # once, at their recheck position.
    old_rechecks = set(_DELIBERATE_RECHECKS) | set(_DELIBERATE_RECHECKS_R11)
    r12 = set(_ROUND12_RECHECKS)
    old_windows = [
        n
        for n in _ROUND9_WINDOW
        + _ROUND8_WINDOW
        + _ROUND7_WINDOW
        + _ROUND6_WINDOW
        + _ROUND5_WINDOW
        + _ROUND4_WINDOW
        if n not in old_rechecks
    ]
    tail = [
        n
        for n in _ROUND11_WINDOW
        + _DELIBERATE_RECHECKS_R11
        + _ROUND10_WINDOW
        + _DELIBERATE_RECHECKS
        + old_windows
        if n not in r12
    ]
    # Round-12 flip: never-driver-checked keys (the 4 round-11
    # additions) first, then the 46 rolling re-checks — exactly the
    # driver's 50-key budget — then every already-evidenced window in
    # reverse-round order.
    priority = _ROUND12_WINDOW + _ROUND12_RECHECKS + tail
    if len(set(priority)) != len(priority):
        dupes = sorted({n for n in priority if priority.count(n) > 1})
        raise ValueError(f"rotation lists overlap: {dupes}")
    missing = [n for n in priority if n not in registry.QUERIES]
    if missing:
        raise ValueError(f"rotation names not registered: {missing}")
    rest = [n for n in registry.QUERIES if n not in set(priority)]
    ordered = {n: registry.QUERIES[n] for n in priority + rest}
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_reorder()
