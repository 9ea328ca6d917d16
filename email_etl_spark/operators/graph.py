"""Connected components over an edge list (SURVEY §2.E cluster step).

Near-dup PAIRS are only half of dedup: to keep one representative per
duplicate group you need the transitive closure — A≈B, B≈C puts A,C
in one cluster even if A,C never met a threshold. The reference dodges
this by exact-message-id identity; a corpus-scale dedup cannot.

Algorithm: iterative min-label propagation (the standard large-graph
CC under Spark): every node starts as its own label; each round every
node takes the min label in its neighborhood; converges in at most
O(diameter) rounds — near-dup clusters are tiny cliques, so 2-3
rounds in practice. The driver loop carries only a convergence count,
never data; each round is one shuffle on node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node
    id in the connected component. Nodes are the ids appearing in
    edges; isolated nodes are the caller's concern."""
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
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = labels.join(nbr_min, labels.node == nbr_min.node2, "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("component"),
            (F.coalesce(F.col("nbr_component"), F.col("component")) < F.col("component")).alias(
                "changed"
            ),
        )
        # localCheckpoint truncates the lineage: without it each round
        # nests the previous round's plan and deep graphs (long chains)
        # blow up analysis around iteration ~10. On a cluster prefer
        # reliable checkpoint(dir) for executor-loss tolerance.
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.where(F.col("changed")).count()
        labels = updated.select("node", "component")
        if n_changed == 0:
            break
    return labels
