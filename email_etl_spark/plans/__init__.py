"""Named query plans. Importing this package registers every query in
the engine registry (`email_etl_spark.plans.registry.REGISTRY`)."""

from email_etl_spark.plans import (  # noqa: F401  (import for side effect)
    attachments,
    core,
    curation,
    dedup,
    governance,
    lexical,
    llm,
    multimodal,
    patterns,
    relational,
    relational_ext,
    search,
    sessions,
    stats,
    temporal,
    text,
    timeseries,
)
from email_etl_spark.plans.registry import REGISTRY, Query, oracle_sql_map, query_map

# ---------------------------------------------------------------------------
# Registration order is part of the external contract: correctness
# harnesses that sample "the first N registered queries" must see the
# right tier first. Rotation policy: this round's NEW operators go
# first, then never-driver-checked queries whose code or oracle
# CHANGED this round, then the never-checked backlog (retired over
# rounds 5-7), then changed-but-previously-green re-verification and
# the standing flagship surface. Everything — in or out of the window
# — stays verified by the repo sweep (scripts/sweep.py +
# sweep_delta.py -> SWEEP.json, the driver-gate mirror: same compare,
# same SFs; heavy unchanged sf0.1 oracle re-runs may defer per the
# SURVEY §5 policy).
# ---------------------------------------------------------------------------
_GATE_ORDER = (
    # ---- round-8 driver window (first 50) ----
    # tier 0: this round's 15 NEW operators (never driver-checked)
    "yule_k_by_source",
    "mattr_diversity",
    "ann_range_search",
    "page_hinkley_drift",
    "holt_winters_forecast",
    "gunning_fog",
    "bigram_entropy_rate",
    "rbo_rankers",
    "band_join_events",
    "cross_source_dup_matrix",
    "range_lsh_recall",
    "theil_index_tokens",
    "classical_decompose_daily",
    "mutual_information_type_hour",
    "packed_sequence_stats",
    # tier 1: never-driver-checked queries whose SHARED CODE changed
    # this round (_km_assign gained the bounded-K Arrow-kernel path;
    # these two route through the helper)
    "cluster_top_terms",
    "label_purity",
    # tier 2: never-checked backlog head — 33 slots (15 new ops +
    # 2 changed-helper queries fill the rest of the 50), retiring the
    # r7 late batch in registration order (VERDICT r7 #2)
    "mannwhitney_value",
    "periodogram_daily",
    "embedding_isotropy",
    "temperature_sampling_weights",
    "kruskal_wallis_value",
    "levene_value",
    "poisson_dispersion_daily",
    "runs_test_daily",
    "bm25f_search",
    "readability_ari_cli",
    "word_length_profile",
    "silhouette_centroid",
    "davies_bouldin",
    "knn_confusion",
    "attribution_first_touch",
    "pack_efficiency_curve",
    "calinski_harabasz",
    "ks_uniform_hour",
    "spearman_value_hour",
    "cohens_d_value",
    "new_vs_returning_daily",
    "holt_linear_forecast",
    "iqr_outlier_days",
    "welch_t_value",
    "smog_readability",
    "rolling_7d_active_users",
    "returns_odds_ratio",
    "cochran_q_filters",
    "value_quartiles_by_type",
    "ab_srm_check",
    "capture_recapture_users",
    "price_elasticity_loglog",
    "parquet_compression_profile",
    # ---- below the 50-query window ----
    # never-checked backlog tail (round 9 retires it: 55 queries —
    # the 15 displaced by this round's new-ops tier, then the 40)
    "source_gini_tokens",
    "join_estimate_qerror",
    "deseasonalized_acf",
    "unigram_noise_table",
    "friedman_weekday",
    "event_id_gap_audit",
    "dup_rate_by_ingest_bucket",
    "pii_density_by_source",
    "shuffle_partition_plan",
    "session_gap_sensitivity",
    "mixture_anneal_schedule",
    "cluster_source_span",
    "predicate_selectivity_report",
    "pca_top2_loadings",
    "pca_explained_variance",
    "burst_days_kleinberg",
    "wasserstein_value_drift",
    "discord_weeks",
    "motif_weeks",
    "term_burstiness_topk",
    "revenue_yoy",
    "quantile_drift_table",
    "ab_power_mde",
    "revenue_concentration",
    "first_order_ltv",
    "expanded_search",
    "activity_streaks",
    "peak_load_report",
    "props_k_liftcurve",
    "supplier_delay_variance",
    "purchase_hazard",
    "int8_quant_report",
    "hub_vectors",
    "asof_join_forward",
    "text_drift",
    "ndcg_eval",
    "ngram_novelty",
    "burstiness",
    "topic_coherence",
    "user_entropy",
    "value_ks_drift",
    "text_index_stats",
    "props_schema_profile",
    "order_backlog_aging",
    "segment_flow",
    "weighted_length_quantiles",
    "range_partition_plan",
    "pca_projection_hist",
    "ooo_report",
    "bloom_semi_join",
    "zorder_layout",
    "linear_probe",
    "vocab_growth",
    "quality_length_corr",
    "ann_ivfpq",
    # changed-this-round, previously green, re-verified at both SFs
    # by sweep_delta + the sf0.1 records (the _km_assign bounded-K
    # rework touches semdedup_prune's join path and the K=8 literal
    # consumers' shared helper)
    "semdedup_prune",
    "kmeans_codebook",
    "cluster_exemplars",
    # round-7 driver window (all green in CORRECTNESS_r07.json)
    "closure_edge_stats",
    "minhash_est_error",
    "dedup_method_agreement",
    "dp_mean_release",
    "ljung_box_daily",
    "ann_pq",
    "ann_ivfpq_indexed",
    "pq_recall_eval",
    "bm25_indexed",
    "hard_negatives",
    "ivf_recall_curve",
    "prefix_dup_rate",
    "image_resize_plan",
    "table_profile",
    "join_skew_report",
    "ship_delay_profile",
    "corr_matrix",
    "benford_fit",
    "cube_status_priority",
    "revenue_mom",
    "pareto_customers",
    "segment_share_trend",
    "supplier_hhi",
    "markov_transitions",
    "error_bursts",
    "seasonal_forecast",
    "latency_slo_report",
    "topk_movers",
    "user_affinity_jaccard",
    "ordered_funnel",
    "dau_wau",
    "session_paths",
    "attribution_last_touch",
    "rfm_segments",
    "engagement_scores",
    "ann_index_stats",
    "maxsim_search",
    "kwic_contexts",
    "bootstrap_mean_ci",
    "ab_test_lift",
    "code_switch_report",
    "activity_punchcard",
    "emb_dim_variance",
    "graph_triangles",
    "length_filter_curve",
    "churn_risk",
    "copurchase_types",
    "returns_by_delay",
    "attribution_linear",
    # prior-round changed-set re-verification (green r7, unchanged r8)
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_savings",
    "dup_cluster_size_hist",
    "incremental_neardup",
    "fuzzy_decontaminate",
    "mv_refresh_delta",
    "rocchio_expansion",
    "join_size_estimate",
    "knn_join",
    "dedup_embedding",
    "hybrid_search",
    "semantic_topk",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "rag_context",
    "q1_pricing_summary",
    "sessionize",
    "tumbling_counts",
    "image_decode_stats",
)


def _apply_gate_order() -> None:
    missing = [n for n in _GATE_ORDER if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"gate order references unknown queries: {missing}")
    ordered = {n: REGISTRY[n] for n in _GATE_ORDER}
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_gate_order()

__all__ = ["REGISTRY", "Query", "query_map", "oracle_sql_map"]
