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

    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    for _ in range(max_iterations):
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
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels
