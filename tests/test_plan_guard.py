"""Physical-plan regression guard (SURVEY §4): the headline surface
must never silently acquire a CartesianProduct, and
BroadcastNestedLoopJoin is allowed only where a plan-constant or
broadcast-tiny side makes it the intended strategy (PLANS.md records
the full audit; this test makes the review rule executable)."""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE

# queries whose BNL is a deliberate broadcast of a 1-to-20-row side
# (query vectors, stats rows, codebooks) — see PLANS.md justifications
_BNL_ALLOWED = {
    "ann_bruteforce",
    "ann_ivf",
    "hybrid_search",
    "hybrid_search_dated",
    "hybrid_search_rrf",
    "semantic_topk",
    "semantic_topk_dated",
    "rag_context",
    "tfidf_search",
    "bm25_search",
    "incremental_sync",
    "unigram_logprob",
    "fuzzy_decontaminate",
    "dedup_minhash",
    "image_decode_stats",
}


def test_headline_plans_stay_clean(spark):
    from email_etl_spark.plans.registry import headline_queries

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    offenders = {}
    for q in headline_queries():
        df = q.builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(mode)
        n_cart = len(re.findall(r"\bCartesianProduct", plan))
        n_bnl = len(re.findall(r"\bBroadcastNestedLoopJoin", plan))
        if n_cart:
            offenders[q.name] = f"CartesianProduct x{n_cart}"
        elif n_bnl and q.name not in _BNL_ALLOWED:
            offenders[q.name] = f"BroadcastNestedLoopJoin x{n_bnl} (not allowed)"
    assert not offenders, offenders


def test_no_tokenizer_inside_lambda_bodies(spark):
    """The O(rows x positions) re-tokenization pitfall (documented in
    functions/hashing.py): referencing the tokenizer expression inside
    a per-element lambda re-runs the split per array element —
    measured 9x on dsir_weights at sf0.1. Token arrays must be
    materialized in a projection BEFORE any transform/filter lambda
    dereferences them, so no optimized plan may contain the tokenizer
    split inside a lambdafunction body."""
    from email_etl_spark.plans.registry import REGISTRY

    offenders = {}
    for name in (
        "bigram_logprob",
        "dsir_weights",
        "winnowing_dedup",
        "gopher_quality",
        "token_count",
        "unigram_logprob",
        "zipf_fit",
        "vocab_coverage",
        "perplexity_buckets",
    ):
        plan = (
            REGISTRY[name]
            .builder(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        if re.search(r"lambdafunction\([^\n]*split\(", plan):
            offenders[name] = "tokenizer split inside lambda body"
    assert not offenders, offenders
