"""connected_components convergence contract (VERDICT r6 #1): long
chains (diameter ≫ rounds) must either converge — pointer jumping
gives O(log diameter) rounds — or fail LOUDLY, never return partial
labels that look like valid (split) clusters.
"""

from __future__ import annotations

import pytest

from email_etl_spark.operators.graph import ConvergenceError, connected_components


def _chain_edges(spark, n: int):
    """Path graph 0-1-2-…-(n-1): diameter n-1, the worst case for
    neighbor-only propagation (a version-chain corpus: v1≈v2≈…≈vn
    where only adjacent versions clear the threshold)."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )


def test_long_chain_converges_in_log_rounds(spark):
    # diameter 199 ≫ 20: neighbor-only propagation needs ~199 rounds
    # and would previously exit silently with split clusters; pointer
    # jumping converges well inside the default max_iter=20.
    comp = connected_components(_chain_edges(spark, 200))
    rows = comp.collect()
    assert len(rows) == 200
    assert all(r.component == 0 for r in rows)


def test_unconverged_raises_not_partial(spark):
    # with max_iter=2 even pointer jumping can't span a 64-chain
    # (reach ~2^2 hops); the old behavior returned split clusters here.
    with pytest.raises(ConvergenceError, match="did not converge"):
        connected_components(_chain_edges(spark, 64), max_iter=2)


def test_multi_component_chains_keep_min_labels(spark):
    # two disjoint chains + one clique: labels are per-component mins
    edges = [(i, i + 1) for i in range(0, 30)]          # chain 0..30
    edges += [(100 + i, 101 + i) for i in range(0, 25)]  # chain 100..125
    edges += [(200, 201), (200, 202), (201, 202)]        # triangle
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert {got[i] for i in range(31)} == {0}
    assert {got[100 + i] for i in range(26)} == {100}
    assert {got[n] for n in (200, 201, 202)} == {200}
