"""Connected components over an edge list (SURVEY §2.E cluster step).

Near-dup PAIRS are only half of dedup: to keep one representative per
duplicate group you need the transitive closure — A≈B, B≈C puts A,C
in one cluster even if A,C never met a threshold. The reference dodges
this by exact-message-id identity; a corpus-scale dedup cannot.

Algorithm: min-label propagation WITH POINTER JUMPING (label-of-label
shortcutting, the path-halving idea behind large-star/small-star,
Kiveris et al., "Connected Components in MapReduce and Beyond"):
every node starts as its own label; each round every node takes the
minimum of (its label, its neighbors' labels, its label's label).
Plain neighbor propagation needs O(diameter) rounds — fine for
near-dup cliques (2-3 rounds) but a version-chain corpus (crawl
snapshots, serially edited boilerplate v1≈v2≈…≈v40) has diameter
proportional to chain length. The label-of-label hop doubles the
propagation distance per round, so convergence is O(log diameter):
max_iter=20 covers diameters up to ~2^20 nodes. The driver loop
carries only a convergence count, never data; each round is two
shuffles on node id (neighbor min + label hop).

Non-convergence is an ERROR, never a silent partial answer: a loop
that exhausts max_iter with labels still changing would return split
clusters that LOOK valid — the one plausible-wrong-answer shape a
closure consumer can produce — so the operator raises instead
(pinned by tests/test_graph_convergence.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when label propagation exhausts max_iter with labels
    still changing — the result would be split (wrong) clusters."""


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node
    id in the connected component. Nodes are the ids appearing in
    edges; isolated nodes are the caller's concern.

    Raises ConvergenceError if max_iter rounds don't reach a fixpoint
    (with pointer jumping that needs diameter > ~2^max_iter — a
    pathological input worth failing loudly on, not absorbing).
    Fixpoint implies exactness: at a fixpoint every node's label is
    ≤ its neighbors' labels, so labels are constant along any path and
    equal the component minimum (whose own label can never drop below
    itself — labels only ever hold ids of nodes inside the component).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        joined = labels.join(nbr_min, labels.node == nbr_min.node2, "left")
        candidates = [
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        ]
        if it > 0:
            # pointer jump: my label's label. Every label value is the
            # id of a node in my component (inductively: initial labels
            # are node ids; propagated values come from neighbors' /
            # labels' labels), so the self-join is total — left join is
            # belt and braces against an isolated-node caller. Skipped
            # in round 1, where labels are still the identity map and
            # label-of-label is a no-op join over the full node set.
            hop = labels.select(
                F.col("node").alias("pnode"), F.col("component").alias("pcomp")
            )
            joined = joined.join(hop, F.col("component") == hop.pnode, "left")
            candidates.append(F.coalesce(F.col("pcomp"), F.col("component")))
        updated = (
            joined.select(
                "node",
                F.least(*candidates).alias("new_component"),
                F.col("component").alias("old_component"),
            )
            .select(
                "node",
                F.col("new_component").alias("component"),
                (F.col("new_component") < F.col("old_component")).alias("changed"),
            )
        )
        # localCheckpoint truncates the lineage: without it each round
        # nests the previous round's plan and deep graphs (long chains)
        # blow up analysis around iteration ~10. On a cluster prefer
        # reliable checkpoint(dir) for executor-loss tolerance.
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.where(F.col("changed")).count()
        labels = updated.select("node", "component")
        if n_changed == 0:
            return labels
    raise ConvergenceError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(labels still changing); the graph's effective diameter "
        f"exceeds ~2^{max_iter}. Raise max_iter — returning partial "
        f"labels would silently split clusters."
    )
