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
    # ---- round-5 driver window (first 50): this round's new
    # operators, then never-driver-checked queries whose code or
    # oracle changed this round (broadcast-hint removal, semdedup
    # corpus-derived K), then parquet_skipping_stats (now oracle-
    # backed; its r4 row was no_oracle), then backlog head ----
    "lsh_bucket_skew",
    "t_closeness_profile",
    "bloom_fpr_report",
    "epoch_allocation",
    "filter_agreement_kappa",
    "keyphrase_rake",
    "bounce_rate_daily",
    "weekday_anova",
    "score_rank_corr",
    "pacf_daily",
    "simpson_diversity",
    "lm_cross_source",
    "collocation_llr",
    "stratified_kfold_assign",
    "slo_burn_rate",
    "payload_partition_plan",
    "asof_join_nearest",
    "km_survival_gaps",
    "attribution_time_decay",
    "props_schema_drift",
    "yule_k",
    "good_turing_counts",
    "content_chunk_dedup",
    "trigger_followup_rates",
    "minhash_index_integrity",
    "dp_quantile_release",
    "fleiss_kappa_filters",
    "semdedup_prune",
    "dedup_tiers",
    "dedup_minhash_indexed",
    "incremental_neardup",
    "winnowing_dedup",
    "dup_source_matrix",
    "dup_pagerank",
    "dup_quality_gap",
    "lsh_band_curve",
    "minhash_calibration",
    "simhash_calibration",
    "near_dup_rate_curve",
    "reciprocal_best_match",
    "ann_int8",
    "crossencoder_rerank",
    "parquet_skipping_stats",
    "ewma_anomaly",
    "ref_integrity_profile",
    "fd_profile",
    "doc_keywords",
    "retention_purge_audit",
    "search_snippets",
    "query_autocomplete",
    "split_leakage",
    "dim_ablation_recall",
    "shot_boundaries",
    "readability_fk",
    "snapshot_diff",
    "cdc_apply",
    "expectations_report",
    "winsorized_stats",
    "k_anonymity_profile",
    "ann_lsh_indexed",
    "embedding_drift",
    "gopher_quality",
    "bigram_logprob",
    "char_entropy",
    "zipf_fit",
    "langid_chargram",
    "perplexity_buckets",
    "vocab_coverage",
    # ---- below the 50-query window: never-checked backlog for
    # rounds 6-7, then changed-this-round re-verification, then
    # the standing flagship surface; rest keep module order ----
    "charclass_profile",
    "dsir_weights",
    "contamination_by_benchmark",
    "filter_ablation",
    "weighted_sample",
    "dataset_card",
    "ann_pq",
    "ann_ivfpq_indexed",
    "cluster_exemplars",
    "pq_recall_eval",
    "bm25_indexed",
    "hard_negatives",
    "ivf_recall_curve",
    "prefix_dup_rate",
    "dup_cluster_size_hist",
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
    "dedup_savings",
    "churn_risk",
    "copurchase_types",
    "returns_by_delay",
    "attribution_linear",
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
    "label_purity",
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
    "cluster_top_terms",
    "sessionize",
    "join_size_estimate",
    "dedup_minhash",
    "fuzzy_decontaminate",
    "knn_join",
    "dedup_embedding",
    "dedup_ngram_jaccard",
    "hybrid_search",
    "semantic_topk",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "rag_context",
    "q1_pricing_summary",
    "tumbling_counts",
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
