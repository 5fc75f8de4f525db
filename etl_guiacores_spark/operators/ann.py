"""IVF approximate nearest-neighbor search (the scale path for ANN).

Brute-force kNN (similarity.knn_brute_force) scans the whole corpus
per query batch — correct, but at 10^10 vectors the scan dominates.
IVF (inverted-file) prunes it:

1. TRAIN: k-means over (a sample of) the corpus -> ``nlist``
   centroids. Model state is tiny (nlist x dim floats) and lives
   driver-side like any ML model.
2. INDEX: one pass assigns every vector to its nearest centroid —
   the cluster id becomes a PARTITIONING KEY; at scale the index
   table is written partitioned/bucketed by it.
3. SEARCH: each query probes only its ``nprobe`` nearest clusters —
   an equi-join on cluster id replaces the full scan, touching
   roughly nprobe/nlist of the corpus.

Uses pyspark.ml KMeans (seeded, deterministic) with
``array_to_vector`` for the array<float> -> Vector bridge.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector

from etl_guiacores_spark.operators.similarity import cosine


@dataclass
class IvfIndex:
    model: KMeansModel | None  # None <=> empty corpus (R4 guard)
    indexed: DataFrame  # original columns + __cluster
    id_col: str
    vec_col: str


def ivf_build(
    embeddings: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    train: DataFrame | None = None,
    init_mode: str | None = None,
) -> IvfIndex:
    """Train the coarse quantizer and assign every vector a cluster.

    ``train`` (default: the full corpus) is the k-means training set —
    at 10^10 vectors you train on a sample and only the one-pass
    cluster ASSIGNMENT touches every vector. ``max_iter`` trades
    centroid quality for training time; recall at partial probe
    degrades gracefully with worse centroids, and full-probe results
    don't depend on them at all. ``init_mode`` (``"random"`` /
    ``"k-means||"``) passes through to Spark ML — k-means|| init is
    itself several distributed passes + driver collects, so callers
    whose downstream never depends on centroid quality (full-probe
    search) can pick ``"random"`` and skip them; default leaves the
    Spark ML default."""
    to_vec = lambda df: df.withColumn("__v", array_to_vector(F.col(vec_col)))
    train_df = train if train is not None else embeddings
    if train_df.isEmpty():  # R4 — KMeans cannot fit zero rows
        indexed = embeddings.withColumn("__cluster", F.lit(0))
        return IvfIndex(model=None, indexed=indexed, id_col=id_col, vec_col=vec_col)
    # k-means iterates over its input: cache the pruned feature column
    # for the duration of the fit so each iteration reads memory, not
    # the scan lineage (fit is an action, so the handle can be
    # released immediately after — no session-lifetime cache)
    fit_input = to_vec(train_df).select("__v").persist()
    try:
        km = KMeans(
            k=nlist, seed=seed, maxIter=max_iter, featuresCol="__v", predictionCol="__cluster"
        )
        if init_mode is not None:
            km = km.setInitMode(init_mode)
        model = km.fit(fit_input)
    finally:
        fit_input.unpersist()
    indexed = model.transform(to_vec(embeddings)).drop("__v")
    return IvfIndex(model=model, indexed=indexed, id_col=id_col, vec_col=vec_col)


def _probe_clusters(index: IvfIndex, queries: DataFrame, nprobe: int) -> DataFrame:
    """(query_id, __cluster) pairs for each query's nprobe nearest
    centroids. Centroids are model state (nlist x dim) — broadcast as
    a literal array; distances compute distributedly per query row."""
    if index.model is None:  # empty corpus: probe the lone empty cluster
        return queries.select(
            F.col(index.id_col).alias("query_id"), F.lit(0).alias("__cluster")
        )
    centers = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(index.model.clusterCenters())
    ]
    spark = queries.sparkSession
    centers_df = spark.createDataFrame(centers, ["__cluster", "__center"])
    q = queries.select(
        F.col(index.id_col).alias("query_id"), F.col(index.vec_col).alias("__qv")
    )
    scored = q.crossJoin(F.broadcast(centers_df)).select(
        "query_id",
        "__cluster",
        cosine(F.col("__qv"), F.col("__center")).alias("__csim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__csim").desc(), F.col("__cluster"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "__cluster")
    )


def ivf_search(
    index: IvfIndex, queries: DataFrame, k: int = 5, nprobe: int = 4
) -> DataFrame:
    """Top-k cosine neighbors per query, searching only probed clusters.

    Output: (query_id, neighbor_id, sim, rank) — same shape as
    knn_brute_force, so recall is directly comparable.
    """
    probes = _probe_clusters(index, queries, nprobe)
    q = queries.select(
        F.col(index.id_col).alias("query_id"), F.col(index.vec_col).alias("__qv")
    )
    candidates = (
        index.indexed.join(probes, on="__cluster")  # prune: only probed clusters
        .join(F.broadcast(q), on="query_id")
        # null-safe like knn_brute_force: a plain != is NULL for a
        # NULL-id corpus vector and would drop it from every search,
        # skewing recall vs the brute-force baseline
        .filter(~F.col(index.id_col).eqNullSafe(F.col("query_id")))
        .select(
            "query_id",
            F.col(index.id_col).alias("neighbor_id"),
            F.round(cosine(F.col("__qv"), F.col(index.vec_col)), 6).alias("sim"),
        )
    )
    from etl_guiacores_spark.operators.ordering import topk_per_key

    # two-stage top-k: at full probe (nprobe = nlist, the q63 oracle
    # configuration) the candidate set per query is the whole corpus —
    # never funnel it through one reducer per query
    return topk_per_key(
        candidates,
        ["query_id"],
        [F.col("sim").desc(), F.col("neighbor_id")],
        k,
        salt_expr=F.col("neighbor_id"),
    ).select("query_id", "neighbor_id", "sim", "rank")


def kmeans_step_exact(
    embeddings: DataFrame,
    codebook: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_id_col: str = "cid",
    dim: int = 64,
) -> DataFrame:
    """ONE exact Lloyd iteration in integer fixed point — the
    verifiable unit of k-means training. ``ivf_build`` above trains
    with Spark ML's KMeans (float, seed-dependent, fine for an index
    whose QUALITY is what matters); this operator is the twin for
    pipelines that need the training step itself to be auditable and
    reproducible across engines: assignment and re-estimation both
    run on 1e-6 fixed-point coordinates with truncating division, so
    a DuckDB oracle (q176) replays the step bit-for-bit. Production
    loops it (assignments stabilize = converged); each iteration is
    the same two-shuffle plan.

    Step: assign every vector to its nearest codebook centroid
    (quantize.pq_assign with n_sub=1 — exact integer argmin, ties by
    centroid id), then re-estimate each centroid as the per-dimension
    TRUNCATED mean of its members. Empty clusters keep their old
    centroid (shift 0, size 0) — the keep-centroid convention, made
    visible rather than resampled.

    Returns one row per centroid: (cluster, n_assigned, inertia,
    centroid_checksum, shift_l1) — inertia the exact summed squared
    distance of members, checksum the sum of the NEW centroid's
    fixed-point coords (the engine-comparable fingerprint), shift_l1
    the L1 move from the old centroid in 1e-6 units (the convergence
    monitor).
    """
    from etl_guiacores_spark.operators.quantize import pq_assign

    assign = pq_assign(
        embeddings, codebook, vec_col=vec_col, id_col=id_col,
        code_id_col=code_id_col, dim=dim, n_sub=1,
    ).select(F.col(id_col).alias("__vid"), "code", "d2")

    edim = embeddings.select(
        F.col(id_col).alias("__vid"),
        F.posexplode(vec_col).alias("d", "x"),
    ).select(
        "__vid", "d",
        F.floor(F.col("x").cast("double") * 1_000_000)
        .cast("long")
        .alias("fx"),
    )
    cdim = codebook.select(
        F.col(code_id_col).alias("code"),
        F.posexplode(vec_col).alias("d", "x"),
    ).select(
        "code", "d",
        F.floor(F.col("x").cast("double") * 1_000_000)
        .cast("long")
        .alias("old_fx"),
    )
    members = edim.join(assign.select("__vid", "code"), "__vid")
    new_dims = members.groupBy("code", "d").agg(
        F.expr("CAST(sum(fx) div count(*) AS BIGINT)").alias("new_fx"),
        F.count("*").cast("long").alias("__n"),
    )
    per_cluster = (
        cdim.join(new_dims, ["code", "d"], "left")
        .withColumn(
            "new_fx", F.coalesce(F.col("new_fx"), F.col("old_fx"))
        )
        .groupBy("code")
        .agg(
            F.sum("new_fx").cast("long").alias("centroid_checksum"),
            F.sum(F.abs(F.col("new_fx") - F.col("old_fx")))
            .cast("long")
            .alias("shift_l1"),
        )
    )
    stats = assign.groupBy("code").agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.sum("d2").cast("long").alias("inertia"),
    )
    return (
        per_cluster.join(stats, "code", "left")
        .select(
            F.col("code").cast("long").alias("cluster"),
            F.coalesce(F.col("n_assigned"), F.lit(0))
            .cast("long")
            .alias("n_assigned"),
            F.coalesce(F.col("inertia"), F.lit(0))
            .cast("long")
            .alias("inertia"),
            "centroid_checksum",
            "shift_l1",
        )
    )
