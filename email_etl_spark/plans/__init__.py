"""Named query plans. Importing this package registers every query in
the engine registry (`email_etl_spark.plans.registry.REGISTRY`)."""

from email_etl_spark.plans import (  # noqa: F401  (import for side effect)
    attachments,
    core,
    curation,
    dedup,
    llm,
    multimodal,
    patterns,
    relational,
    relational_ext,
    search,
    sessions,
    temporal,
    text,
)
from email_etl_spark.plans.registry import REGISTRY, Query, oracle_sql_map, query_map

# ---------------------------------------------------------------------------
# Registration order is part of the external contract: correctness
# harnesses that sample "the first N registered queries" must see the
# right tier first, not whatever alphabetical import order happens to
# yield. Round-3 rotation policy: (1) every query that has never had
# an external correctness row leads, (2) then the sketches (rows-only
# by design), (3) then everything added or fixed this round, (4) then
# the flagship search/ANN surface for continuous re-verification.
# Long-tail queries already externally verified in r1/r2 rotate past
# the window; ALL queries stay covered by the repo's own sweep
# (scripts/sweep.py -> SWEEP.json) at both SFs every round.
# ---------------------------------------------------------------------------
_GATE_ORDER = (
    # -- round-3 rotation: every query that has never had a driver
    # correctness row (absent from CORRECTNESS_r01 and _r02) leads the
    # window this round --
    "top_docs_per_lang",
    "doc_by_id",
    "pivot_status_priority",
    "label_centroids",
    "fuzzy_name_match",
    "hourly_histogram",
    "audit_error_daily",
    "archive_layout_stats",
    "token_length_histogram",
    "mixture_weights",
    "audio_meta_stats",
    "video_frame_stats",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_count",
    "q20_promo_suppliers",
    "knn_join",
    "scd2_history",
    # sketches: no SQL oracle by design → driver records rows-only
    "approx_user_counts",
    "approx_value_quantiles",
    # -- new this round --
    "dedup_substring",
    "ann_recall_eval",
    "shard_plan",
    "kmeans_codebook",
    "label_top_terms",
    "embedding_outliers",
    "cooccurrence_pmi",
    "bm25_search",
    "pca_power_top1",
    "dedup_keep_best",
    "anomaly_zscore",
    "length_deciles",
    "source_overlap",
    "dup_graph_degrees",
    "retention_cohorts",
    "salted_topk_users",
    "ann_multiprobe",
    "hybrid_search_rrf",
    "mmr_rerank",
    "minhash_recall_eval",
    "time_to_conversion",
    "js_divergence",
    # -- fixed this round (TIMESTAMP_NTZ epoch casts) — must re-verify --
    "sessionize",
    "range_join_count",
    "asof_join",
    "tumbling_counts",
    # -- flagship + headline surface stays continuously verified --
    "hybrid_search",
    "semantic_topk",
    "text_rank",
    "hybrid_search_dated",
    "semantic_topk_dated",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "rag_context",
    "tfidf_search",
    "dedup_minhash",
    "dedup_clusters",
    # positions 51+: r1/r2-driver-passed queries rotate past the window
    # (all stay repo-sweep green at both SFs — SWEEP.json is the
    # committed record).
    "value_percentiles",
    "conversion_funnel",
    "daily_retention",
    "inter_event_gaps",
    "part_type_revenue",
    "attachment_mime_stats",
    "attachment_risk_by_source",
    "html_to_md",
    "bpe_token_count",
    "provider_status",
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
