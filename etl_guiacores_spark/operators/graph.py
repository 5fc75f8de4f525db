"""Connected components via iterative min-label propagation.

Upgrades the near-dup greedy rule to true duplicate CLUSTERS: every
doc gets the minimum doc-id of its connected component in the
verified-pair graph, so one representative per cluster survives
regardless of clique shape.

Execution model: a driver loop of join+aggregate rounds (the standard
Spark shape for iterative graph algorithms without GraphFrames).
Per round: labels join edges, each node takes min(own, neighbors');
convergence when no label changes. Rounds = graph diameter, which for
near-dup graphs is tiny (cliques and short chains).

Lineage control: each round truncates lineage so round N doesn't
replay rounds 1..N-1. ``localCheckpoint`` (default) stores blocks on
executors — fast, but an executor loss mid-iteration kills the job.
For long-running cluster jobs pass ``checkpoint_dir`` to use reliable
``checkpoint()`` into HDFS/object storage instead: every round's
labels survive executor loss and the job resumes from the last
materialized round.
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
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) — component = min id reachable in the
    undirected graph. Nodes absent from edges keep their own id.

    Ids may be any orderable type (numeric, string, ...): convergence
    is detected by counting rows whose label changed, never by
    arithmetic on the label column.

    ``checkpoint_dir``: when set, uses reliable ``checkpoint()`` (the
    directory is registered via ``setCheckpointDir``) instead of
    executor-local ``localCheckpoint`` — the durable choice on a real
    cluster where executors can be lost mid-iteration.
    """
    spark = nodes.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist_round(df: DataFrame, eager: bool = True) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).distinct()
    # materialize ONCE: the edge plan (often an LSH candidate join)
    # would otherwise be re-executed inside every iteration
    sym = _persist_round(sym)

    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
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
                F.col("component").alias("old_component"),
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
                "old_component",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # lazy checkpoint: the convergence aggregate right below is the
        # round's ONE action — it materializes the checkpoint blocks and
        # computes n_changed in the same job (eager=True would spend a
        # separate job per round just materializing)
        updated = _persist_round(updated.select(
            "id",
            "component",
            (F.col("component") != F.col("old_component")).cast("int").alias("changed"),
        ), eager=False)
        # labels are monotone non-increasing, so the fixpoint is exactly
        # "no row changed this round" — a count, not arithmetic on the
        # label column, so string/any-type ids converge correctly too
        n_changed = updated.agg(F.sum("changed")).collect()[0][0] or 0
        labels = updated.select("id", "component")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels
