"""Connected components via iterative min-label propagation.

Upgrades the near-dup greedy rule to true duplicate CLUSTERS: every
doc gets the minimum doc-id of its connected component in the
verified-pair graph, so one representative per cluster survives
regardless of clique shape.

Execution model: a driver loop of join+aggregate rounds (the standard
Spark shape for iterative graph algorithms without GraphFrames).
Per round: labels join edges, each node takes min(own, neighbors');
convergence when no label changes. Rounds = graph diameter, which for
near-dup graphs is tiny (cliques and short chains). ``localCheckpoint``
truncates lineage each round so round N doesn't replay rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) — component = min id reachable in the
    undirected graph. Nodes absent from edges keep their own id."""
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).distinct()
    # materialize ONCE: the edge plan (often an LSH candidate join)
    # would otherwise be re-executed inside every iteration
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    prev_sum = labels.agg(F.sum("component")).collect()[0][0] or 0
    converged = False
    for _ in range(max_iterations):
        # step 1: take the minimum label among direct neighbors
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        )
        # step 2: pointer jumping — adopt the label OF my label, halving
        # the effective chain length each round (O(log diameter) total,
        # where neighbor propagation alone needs O(diameter))
        parent = updated.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_component")
        )
        updated = (
            updated.join(parent, updated.component == parent.p_id, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_component"), F.col("component")),
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        # labels are monotone non-increasing, so the label sum strictly
        # decreases until the fixpoint — one cheap aggregate replaces a
        # join-based change detector
        new_sum = updated.agg(F.sum("component")).collect()[0][0] or 0
        labels = updated
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels
