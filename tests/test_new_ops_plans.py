"""Physical-plan pins for the round-7 second-session operators: each
assertion is a scale property the doc strings claim — one ordered
pass where one is promised, window-free rewrites staying window-free,
dimension-sized broadcasts staying broadcasts (SURVEY §5.5)."""

from __future__ import annotations

import re

from email_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _n_window_nodes(plan: str) -> int:
    # formatted plans print each operator twice (tree + detail); the
    # detail header "(N) Window" appears once per physical node
    return len(re.findall(r"^\(\d+\) Window$", plan, re.M))


def test_session_gap_sensitivity_single_ordered_pass(spark):
    # the gap is computed by ONE user-keyed window; the 4 thresholds
    # must ride an explode, never add sorts/windows of their own
    plan = _plan(spark, "session_gap_sensitivity")
    assert _n_window_nodes(plan) == 1, plan
    assert "Generate" in plan, plan


def test_attribution_first_touch_single_window(spark):
    plan = _plan(spark, "attribution_first_touch")
    assert _n_window_nodes(plan) == 1, plan


def test_rolling_7d_active_users_shape(spark):
    # sliding distinct = explode-to-window-end rewrite (the Generate);
    # the ONE allowed Window is the r10 bounds derivation over the
    # joined day-rollup (dimension-sized, ~1 row/calendar day, single
    # partition shared with the presentation sort) — it replaced a
    # third full events scan+distinct branch. More windows, or a third
    # events scan, would mean someone reintroduced an unscalable
    # formulation.
    plan = _plan(spark, "rolling_7d_active_users")
    assert _n_window_nodes(plan) == 1, plan
    assert "Generate" in plan, plan
    assert plan.count("events.parquet]") == 2, plan


def test_event_id_gap_audit_no_sort_no_window(spark):
    # run starts are counted via a LEFT ANTI equi-join — the audit
    # must never acquire a sorted-adjacency pass
    plan = _plan(spark, "event_id_gap_audit")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "LeftAnti" in plan, plan


def test_pack_efficiency_curve_partial_agg(spark):
    # the 4-length explode must collapse map-side before the shuffle
    plan = _plan(spark, "pack_efficiency_curve")
    assert plan.count("HashAggregate") >= 2, plan
    assert "Generate" in plan, plan


def test_discord_weeks_no_cartesian(spark):
    # the window-pair join is a reviewed dimension-sized broadcast,
    # never a CartesianProduct
    plan = _plan(spark, "discord_weeks")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_levene_median_dim_broadcast(spark):
    # the k-row group-median table must broadcast, not shuffle the
    # corpus against it
    plan = _plan(spark, "levene_value")
    assert "BroadcastHashJoin" in plan, plan


def test_knn_confusion_rides_block_tiling(spark):
    # the confusion matrix must reuse knn_join's tiled pipeline, not
    # introduce an all-pairs join of its own
    plan = _plan(spark, "knn_confusion")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# round-8 operators
# ---------------------------------------------------------------------------


def test_mattr_single_window_pass(spark):
    # r10 shape: the previous-occurrence lag is doc-local, so the
    # whole contribution sum is ONE zero-shuffle Arrow pass over the
    # token arrays — no Window, no explode anywhere; a Window or
    # Generate reappearing means the kernel formulation regressed to
    # the shuffled token-stream shape
    plan = _plan(spark, "mattr_diversity")
    assert _n_window_nodes(plan) == 0, plan
    assert "Generate" not in plan, plan
    assert "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan, plan


def test_yule_k_two_level_agg_no_window(spark):
    plan = _plan(spark, "yule_k_by_source")
    assert not re.search(r"\bWindow\b", plan), plan
    assert plan.count("HashAggregate") >= 2, plan


def test_single_array_folds_stay_window_free(spark):
    # page_hinkley_drift / holt_winters_forecast are single-array
    # sequential folds: the distributed part is the daily rollup; a
    # Window or a join anywhere means the formulation regressed
    for name in ("page_hinkley_drift", "holt_winters_forecast"):
        plan = _plan(spark, name)
        assert not re.search(r"\bWindow\b", plan), (name, plan)
        assert "Join" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_ann_range_search_map_only_corpus_side(spark):
    # the query batch broadcasts (reviewed BNL); the corpus side must
    # not shuffle before the presentation sort — no aggregate, no
    # window, exactly the broadcast join
    plan = _plan(spark, "ann_range_search")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert not re.search(r"\bWindow\b", plan), plan
    assert "HashAggregate" not in plan, plan


def test_gunning_fog_single_scan(spark):
    plan = _plan(spark, "gunning_fog")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # map-side combined


def test_bigram_entropy_no_second_corpus_pass(spark):
    # context counts derive from the vocab-sized bigram rollup; the
    # static plan prints both branches, but at runtime AQE must reuse
    # the c2 aggregate exchange so the corpus explode runs ONCE (the
    # bigram_logprob convention)
    df = REGISTRY["bigram_entropy_rate"].builder(spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 1, executed


def test_rbo_two_windows_one_scan(spark):
    # both rankings ride the same broadcast-query scored stream: two
    # Window nodes, no CartesianProduct, the BNL is the reviewed
    # query-batch broadcast
    plan = _plan(spark, "rbo_rankers")
    assert _n_window_nodes(plan) == 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_band_join_is_pure_equi_join(spark):
    # the bucketized band join must plan as an equi-join on
    # (user, bucket) — an inequality-only join here (BNL/Cartesian)
    # means the bucketization regressed to the quadratic form
    plan = _plan(spark, "band_join_events")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan
    assert len(re.findall(r"^\(\d+\) Generate$", plan, re.M)) == 1, plan


def test_range_lsh_recall_candidates_via_equality_join(spark):
    # candidate discovery must be the (t, key) bucket equality join —
    # a BroadcastHashJoin — with the BNL confined to the 5-row
    # ground-truth broadcast
    plan = _plan(spark, "range_lsh_recall")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_theil_terms_dimension_sized(spark):
    # every ln term lives on the distinct-count spectrum / source dim:
    # the corpus contributes two rollups, never a per-doc ln column
    plan = _plan(spark, "theil_index_tokens")
    assert "CartesianProduct" not in plan, plan
    assert not re.search(r"\bWindow\b", plan), plan


def test_decompose_windows_on_dim_table_only(spark):
    # the centered-MA window runs AFTER the daily rollup (day-
    # cardinality input). The static plan prints the dt subtree once
    # per consumer (dt/sw/adj), but at runtime AQE must reuse the
    # daily-rollup exchanges so the corpus is scanned once (the
    # bigram_logprob convention)
    plan = _plan(spark, "classical_decompose_daily")
    assert "CartesianProduct" not in plan, plan
    df = REGISTRY["classical_decompose_daily"].builder(spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 2, executed


def test_mi_lives_on_contingency_table(spark):
    # one corpus aggregate to the 5x24 cell table; margins and
    # entropies derive from the cells, never a second corpus pass
    plan = _plan(spark, "mutual_information_type_hour")
    assert "CartesianProduct" not in plan, plan
    assert not re.search(r"\bWindow\b", plan), plan


# ---- round-9 operators ----------------------------------------------------


def test_chao1_two_level_aggregate(spark):
    # tokenize scan -> map-side-combined vocab rollup -> 1-row fold;
    # no window, no join anywhere
    plan = _plan(spark, "chao1_vocab_estimate")
    assert not re.search(r"\bWindow\b", plan), plan
    assert not re.search(r"\bJoin\b", plan), plan
    assert plan.count("HashAggregate") >= 2, plan


def test_grubbs_single_day_rollup(spark):
    # one distributed day rollup + a broadcast 1-row stats join +
    # TakeOrdered head; no corpus-wide window
    plan = _plan(spark, "grubbs_outlier_daily")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_cramers_v_contingency_shape(spark):
    # margins broadcast onto the cell table (priority_status_chi2
    # shape): no sort-merge join, no window
    plan = _plan(spark, "cramers_v_type_weekday")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "SortMergeJoin" not in plan, plan


def test_uncertainty_coeff_contingency_shape(spark):
    plan = _plan(spark, "uncertainty_coeff_type_hour")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "SortMergeJoin" not in plan, plan


def test_dup_jaccard_histogram_rides_pair_stream(spark):
    # bucket rollup over the verified pair stream: no cartesian, no
    # broadcast hint on the corpus-derived pair side (plan-guard rule)
    plan = _plan(spark, "dup_jaccard_histogram")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_quality_tradeoff_two_pass_matches_ntile(spark):
    # r10 two-pass decile (VERDICT r9 #7): no corpus-wide
    # RangePartitioning sort survives — the result materializes from
    # the exact q-histogram + boundary-group prefixes, so the returned
    # plan is a bounded local relation...
    plan = _plan(spark, "quality_token_tradeoff")
    # only the 10-row presentation sort remains — no corpus scan, no
    # ntile window in the returned plan
    assert "ntile" not in plan.lower(), plan
    assert len(re.findall(r"Scan parquet", plan)) == 0, plan
    # ...and the values still replay NTILE(10) OVER (q DESC, doc_id)
    # bit-for-bit, boundary tie-splits included
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from email_etl_spark.functions import text as T
    from email_etl_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    d = docs.select(
        "doc_id",
        (T.quality_score(F.col("text")).cast("decimal(5,4)") * 10000)
        .cast("bigint")
        .alias("q_bps"),
        T.token_count(F.col("text")).cast("bigint").alias("n"),
    )
    ref = (
        d.select(
            F.ntile(10)
            .over(Window.orderBy(F.desc("q_bps"), "doc_id"))
            .alias("decile"),
            "q_bps",
            "n",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.min("q_bps").alias("min_quality_bps"),
        )
        .orderBy("decile")
        .collect()
    )
    got = REGISTRY["quality_token_tradeoff"].builder(spark, SF_SMOKE).collect()
    assert [
        (r["decile"], r["n_docs"], r["n_tokens"], r["min_quality_bps"])
        for r in got
    ] == [
        (r["decile"], r["n_docs"], r["n_tokens"], r["min_quality_bps"])
        for r in ref
    ]


def test_packed_attention_waste_two_level_offsets(spark):
    # the offsets must come from the sink's two-level prefix sum: no
    # unpartitioned window over the corpus-sized doc stream (windows
    # on bucket subtotals only), explode for the span fan-out
    plan = _plan(spark, "packed_attention_waste")
    assert "Generate" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---- round-10 new operators ----


def test_cms_freq_audit_dimension_sized_sketch(spark):
    # one corpus token explode feeds the 4096-cell sketch; the 4-row
    # lane dim broadcasts (reviewed BNL); no cartesian on data paths
    plan = _plan(spark, "cms_freq_audit")
    assert "CartesianProduct" not in plan, plan
    assert "Generate" in plan, plan  # the token explode


def test_ocr_artifact_score_no_token_explode(spark):
    # all three artifact predicates are array-local filters inside one
    # projection: a single scan, no Generate, rollup only
    plan = _plan(spark, "ocr_artifact_score")
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Generate" not in plan, plan
    assert _n_window_nodes(plan) == 0, plan


def test_token_budget_apportionment_exact_budget(spark):
    # the Hamilton guarantee: allocations sum to the budget EXACTLY,
    # extras are 0/1 and go to the largest remainders
    from email_etl_spark.plans.curation import _BUDGET_TOKENS

    rows = REGISTRY["token_budget_apportionment"].builder(spark, SF_SMOKE).collect()
    assert sum(r["alloc"] for r in rows) == _BUDGET_TOKENS
    assert all(r["extra"] in (0, 1) for r in rows)
    assert all(r["alloc"] - r["base_alloc"] == r["extra"] for r in rows)
    # dimension-sized window only: no corpus-wide sort in the plan
    plan = _plan(spark, "token_budget_apportionment")
    assert _n_window_nodes(plan) == 1, plan


def test_recency_decay_weights_exact_shift(spark):
    # weights are exact 10^6 >> half_lives (clamped) — verify against
    # python integers and pin the calendar-bounded shape
    rows = REGISTRY["recency_decay_weights"].builder(spark, SF_SMOKE).collect()
    assert rows, "empty result"
    for r in rows:
        assert r["weight_ppm"] == 1_000_000 >> min(r["half_lives"], 62)
    plan = _plan(spark, "recency_decay_weights")
    assert _n_window_nodes(plan) == 0, plan


# ---- round-10 second-session operators ----


def test_binary_segmentation_calendar_bounded(spark):
    # one event scan feeds the daily aggregate; both CUSUM scans are
    # O(days) windows; the 1-row root argmax broadcasts (reviewed BNL)
    plan = _plan(spark, "binary_segmentation")
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "CartesianProduct" not in plan, plan
    rows = REGISTRY["binary_segmentation"].builder(spark, SF_SMOKE).collect()
    by_seg = {r["seg_id"]: r for r in rows}
    # children partition the root: day counts and event mass add up
    assert by_seg[1]["n_days"] + by_seg[2]["n_days"] == by_seg[0]["n_days"]
    assert by_seg[1]["n_events"] + by_seg[2]["n_events"] == by_seg[0]["n_events"]


def test_hll_register_audit_no_distinct_on_sketch_path(spark):
    # the register table is a 64-row max agg over the raw stream; the
    # exact COUNT(DISTINCT) calibration side is a separate 1-row agg
    from email_etl_spark.plans.relational_ext import _HLL_M, _HLL_REM_BITS

    rows = REGISTRY["hll_register_audit"].builder(spark, SF_SMOKE).collect()
    (r,) = rows
    assert r["n_occupied"] + r["n_zero"] == _HLL_M
    assert 1 <= r["rho_max"] <= _HLL_REM_BITS + 1
    # harmonic denominator lower bound: every register contributes >= 1
    assert r["harmonic_denom"] >= _HLL_M
    plan = _plan(spark, "hll_register_audit")
    assert "CartesianProduct" not in plan, plan


def test_binary_quant_recall_no_corpus_square(spark):
    # both rankings broadcast the 5-row query batch — corpus x corpus
    # never materializes; hamming rides bit_count(xor) on packed ints
    plan = _plan(spark, "binary_quant_recall")
    assert "CartesianProduct" not in plan, plan
    assert _n_window_nodes(plan) == 2, plan
    rows = REGISTRY["binary_quant_recall"].builder(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert r["recall_bps"] == r["n_hits"] * 1000


def test_rm3_expansion_feedback_bounded(spark):
    # expansion aggregates run over the 10-doc feedback set only; the
    # corpus contributes one TakeOrdered base ranking
    plan = _plan(spark, "rm3_expansion")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = REGISTRY["rm3_expansion"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["fb_df"] <= 10
        # RM3 = (query-model + RM1) div 2 — never exceeds RM1 alone
        # once rm1 >= qw; always a valid truncating interpolation
        assert r["rm3_e6"] <= (1_000_000 // 3 + r["rm1_e6"]) // 2


def test_cramer_von_mises_drift_support_bounded(spark):
    # one (type, value) count agg; the cumulative window runs over
    # DISTINCT support values, never raw rows; midpoint broadcasts
    plan = _plan(spark, "cramer_von_mises_drift")
    assert _n_window_nodes(plan) == 1, plan
    assert "CartesianProduct" not in plan, plan
    rows = REGISTRY["cramer_von_mises_drift"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["cvm_e9"] >= 0


def test_energy_distance_binned_histogram_pairs(spark):
    # corpus collapses to a (type, bin) histogram; pair space is
    # histogram x histogram (broadcast), never row x row
    plan = _plan(spark, "energy_distance_binned")
    assert "CartesianProduct" not in plan, plan
    rows = REGISTRY["energy_distance_binned"].builder(spark, SF_SMOKE).collect()
    (r,) = rows
    assert r["type_a"] != r["type_b"]
    # each term is the truncating e6 mean; energy is their exact diff
    assert r["energy_e6"] == r["t_cross_e6"] - r["t_within_a_e6"] - r["t_within_b_e6"]
