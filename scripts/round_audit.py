#!/usr/bin/env python
"""Registry-wide audit of the final-ROUND(double) hazard class.

Round 8 produced the engine's first-ever red driver hash row
(ks_uniform_hour): rows and schema matched, values matched both local
engines at every SF, yet the driver's environment hashed differently.
Diagnosis (VERDICT r8 #1): the query's OUTPUT columns were
ROUND(double, n) of freshly computed quotients — IEEE doubles that can
land arbitrarily close to a decimal halfway point, where Spark's
BigDecimal HALF_UP on the exact binary value and another engine's
multiply-and-nearbyint disagree. ROUND over DECIMAL children is exact
and immune; unrounded shared IEEE expressions are bit-identical and
immune; only ROUND-over-double at the output boundary is the hazard.

This script walks every registered query's ANALYZED Catalyst plan (no
execution beyond plan constants) and records each Round/BRound
expression: the child dataType, whether it sits in the topmost
Project/Aggregate (an output column) or deeper (internal bucketing /
ordering keys, which only bite when a tie flips), and the expression
SQL. Output: ROUND_AUDIT.json, consumed by
tests/test_round_hazard.py's gate-window lint (zero output-level
Round-over-double in the driver's 50-query window).

Usage: python scripts/round_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# Output-level ROUND(double) columns REVIEWED AND JUSTIFIED (the
# "argued residue" of VERDICT r9 #6): each is a grid-pin of an
# irrational-valued quantity (sqrt/Rayleigh-quotient compositions),
# where the halfway-hit risk is measure-zero — unlike the
# small-denominator rationals (jaccard, rocchio) that produced the
# actual reds, all converted to exact integers. A RAW double here
# would drift with the engine environment (the r9 ks_stat red); the
# 6-dp grid absorbs ulp-level drift everywhere except exactly at a
# halfway point, which these values cannot sit on.
IRRATIONAL_GRID_OK: dict[str, set[str]] = {
    # unit-norm loadings: component / sqrt(sum of squares)
    "pca_top2_loadings": {"loading1", "loading2"},
    # Rayleigh quotient of corpus-sized decimal-derived sums
    "pca_explained_variance": {"eigenvalue"},
}

# One-line justification per REMAINING output-level Round-over-double
# user (VERDICT r9 #6: the audit converges to a stable ARGUED residue,
# not a shrinking TODO). Classes:
#   cosine-grid  — 4-dp grid-pin of a cosine/L2 norm (sqrt-valued,
#                  irrational ⇒ measure-zero halfway risk); also the
#                  corpus-wide rounded-cosine tiebreak contract
#                  (functions/vectors.cosine_rounded) every vector
#                  query shares — converting one would fork the grid.
#   log-valued   — grid-pin of an ln/exp/power composition
#                  (transcendental ⇒ measure-zero halfway risk).
#   sqrt-stat    — grid-pin of a sqrt-normalized test statistic
#                  (irrational ⇒ measure-zero halfway risk).
#   fold-state   — grid-pin of a sequential-fold (Holt/Page-Hinkley)
#                  state: value is a deep alternating IEEE recursion,
#                  effectively irrational; the 4-dp grid absorbs drift.
#   hash-grid    — stub value derived from an md5 byte on a /255 grid;
#                  PROVABLY never lands on a round-k halfway point
#                  (parity argument: 2*57000*b ≢ 255 mod 510).
#   rational-r11 — genuinely rational quotient; conversion to exact
#                  integer units scheduled next round (this round
#                  converted 15: ks/srm/acf/absorption/vad/bot/
#                  session/image/mixture/q8/q14/q17/MI/logprobs/rrf).
#   shared-lattice — the DECIMAL(5,4) quality-heuristic lattice
#                  (quality_score): dozens of contracts consume it;
#                  migration is a coordinated multi-contract change,
#                  deferred to a dedicated round.
_CLS = {
    "cosine-grid": (
        "ann_ivf", "ann_lsh", "ann_lsh_indexed", "ann_multiprobe", "ann_pq",
        "ann_range_search", "dedup_embedding", "semantic_topk",
        "semantic_topk_dated", "hybrid_search", "hybrid_search_dated",
        "maxsim_search", "embedding_drift", "doc_by_id", "embed_docs",
        "embedding_isotropy", "label_centroids",
    ),
    "log-valued": (
        "bigram_entropy_rate", "bigram_entropy_text", "char_entropy",
        "collocation_llr", "column_entropy_profile", "cooccurrence_pmi",
        "js_divergence", "markov_entropy_rate", "bm25_indexed", "bm25_search",
        "bm25f_search", "tfidf_search", "text_rank", "hurst_exponent",
        "heaps_law_fit", "zipf_fit", "price_elasticity_loglog",
        "returns_odds_ratio", "bloom_fpr_report", "weighted_sample",
        "dp_mean_release", "dp_release_counts",
    ),
    "sqrt-stat": (
        "anomaly_zscore", "ab_test_lift", "cohens_d_value", "welch_t_value",
        "mann_kendall_trend", "mannwhitney_value", "runs_test_daily",
        "smog_readability", "spearman_value_hour", "word_length_profile",
        "label_purity", "silhouette_centroid",
    ),
    "fold-state": (
        "holt_linear_forecast", "holt_winters_forecast", "page_hinkley_drift",
    ),
    "hash-grid": ("audio_meta_stats",),
    "rational-r11": (
        "ab_cuped_lift", "cochran_q_filters", "gunning_fog",
        "kruskal_wallis_value", "levene_value", "ols_price_size",
        "poisson_dispersion_daily", "seasonal_strength",
        "temperature_sampling_weights", "theil_index_tokens",
        "theil_sen_trend", "time_to_conversion", "value_percentiles",
        "weekday_anova", "winsorized_stats", "embedding_norm_profile",
        "embedding_qa", "embedding_sim_hist", "davies_bouldin",
        "calinski_harabasz", "rbo_rankers",
    ),
    "shared-lattice": ("quality_score", "curation_funnel"),
}
ROUND_CLASS: dict[str, str] = {
    name: cls for cls, names in _CLS.items() for name in names
}

# Frontier-preserving nodes: they reorder/filter/limit/relabel rows
# but do not REPLACE the output column list, so the output projection
# is the first Project/Aggregate below them ON EACH BRANCH (Union has
# one per branch — the r9 single-global-flag walk misclassified the
# second branch's top projection as internal, ADVICE r9 low).
_PASSTHROUGH = {
    "Sort",
    "GlobalLimit",
    "LocalLimit",
    "Limit",
    "Filter",
    "Union",
    "Distinct",
    "Deduplicate",
    "SubqueryAlias",
    "Repartition",
    "RepartitionByExpression",
    "WithCTE",
    "CTERelationDef",
}


def collect_rounds(df):
    """[(node_kind, position, child_dtype, column, sql)] for every
    Round/BRound in the analyzed plan. position='output' when the
    expression belongs to the output-frontier Project/Aggregate of its
    branch (frontier propagates through Sort/Limit/Filter/Union/... so
    multi-branch plans classify every branch's top projection as
    output), else 'internal'."""
    plan = df._jdf.queryExecution().analyzed()
    found = []

    def walk_exprs(expr, position, node_kind, column):
        cls = expr.getClass().getSimpleName()
        if cls in ("Round", "BRound"):
            child = expr.children().apply(0)
            found.append(
                {
                    "node": node_kind,
                    "position": position,
                    "child_type": child.dataType().simpleString(),
                    "column": column,
                    "sql": expr.sql()[:200],
                }
            )
        for i in range(expr.children().size()):
            walk_exprs(expr.children().apply(i), position, node_kind, column)

    def walk_plan(node, on_frontier):
        kind = node.getClass().getSimpleName()
        is_output = kind in ("Project", "Aggregate") and on_frontier
        child_frontier = (
            on_frontier and not is_output and kind in _PASSTHROUGH
        )
        exprs = node.expressions()
        for i in range(exprs.size()):
            e = exprs.apply(i)
            try:
                col = e.name() if is_output else None
            except Exception:  # non-named top expression
                col = None
            walk_exprs(e, "output" if is_output else "internal", kind, col)
        for i in range(node.children().size()):
            walk_plan(node.children().apply(i), child_frontier)

    walk_plan(plan, True)
    return found


def main() -> int:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    report: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    for name, q in REGISTRY.items():
        try:
            rounds = collect_rounds(q.builder(spark, sf_dir))
        except Exception as exc:  # plan-constant collects can fail loudly
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        hazards = [r for r in rounds if r["child_type"] == "double"]
        if hazards:
            report[name] = hazards
    def _unjustified(n, rs):
        ok = IRRATIONAL_GRID_OK.get(n, set())
        return [
            r for r in rs if r["position"] == "output" and r.get("column") not in ok
        ]

    out = {
        "sf_dir": sf_dir,
        "queries_scanned": len(REGISTRY),
        "queries_with_round_over_double": len(report),
        "output_level": sorted(
            n for n, rs in report.items() if _unjustified(n, rs)
        ),
        # class tag per surviving output-level user (VERDICT r9 #6) —
        # "UNCLASSIFIED" is a lint failure for the next round
        "output_level_class": {
            n: ROUND_CLASS.get(n, "UNCLASSIFIED")
            for n, rs in sorted(report.items())
            if _unjustified(n, rs)
        },
        "output_level_justified_irrational": sorted(
            n
            for n, rs in report.items()
            if any(r["position"] == "output" for r in rs) and not _unjustified(n, rs)
        ),
        "internal_only": sorted(
            n for n, rs in report.items() if all(r["position"] != "output" for r in rs)
        ),
        "errors": errors,
        "detail": report,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "ROUND_AUDIT.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"round_audit: {len(report)} of {len(REGISTRY)} queries carry "
        f"Round-over-double ({len(out['output_level'])} at output level); "
        f"{len(errors)} plan errors -> ROUND_AUDIT.json"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
