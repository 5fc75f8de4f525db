"""IVF ANN: recall vs the brute-force baseline on the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.ann import ivf_build, ivf_search
from etl_guiacores_spark.operators.similarity import knn_brute_force
from etl_guiacores_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 5)

    exact = knn_brute_force(emb, queries, k=5)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    index = ivf_build(emb, nlist=8)
    approx = ivf_search(index, queries, k=5, nprobe=4)
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}

    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, f"recall {recall} too low for nprobe=half the clusters"
    # probing ALL clusters must reproduce brute force exactly
    full = ivf_search(index, queries, k=5, nprobe=8)
    assert {(r["query_id"], r["neighbor_id"]) for r in full.collect()} == truth


def test_ivf_random_init_full_probe_exact(spark):
    # init_mode="random" (the q63 cheap-train path: skips the
    # k-means|| init passes) must still reproduce brute force
    # EXACTLY at full probe — centroid quality affects partial-probe
    # recall only, never the full-probe result
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = knn_brute_force(emb, queries, k=5)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    index = ivf_build(emb, nlist=8, max_iter=2, init_mode="random")
    full = ivf_search(index, queries, k=5, nprobe=8)
    assert {(r["query_id"], r["neighbor_id"]) for r in full.collect()} == truth


def test_ivf_prunes_candidates(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    index = ivf_build(emb, nlist=8)
    sizes = index.indexed.groupBy("__cluster").count().collect()
    assert len(sizes) == 8  # every centroid got members
    total = sum(r["count"] for r in sizes)
    assert total == emb.count()


# --- exact k-means step --------------------------------------------------------

def test_kmeans_step_reduces_inertia_and_reports_shift(spark):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.ann import kmeans_step_exact

    # two tight blobs around (0,0,0,0) and (10,10,10,10); seed
    # centroids = first point of each blob -> one step moves each
    # centroid to its blob's truncated mean and assigns 3 members.
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [10.0, 10.0, 10.0, 10.0]),
        (2, [0.2, 0.2, 0.2, 0.2]),
        (3, [0.4, 0.4, 0.4, 0.4]),
        (4, [10.2, 10.2, 10.2, 10.2]),
        (5, [10.4, 10.4, 10.4, 10.4]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = df.filter(F.col("vec_id") < 2)
    got = {r["cluster"]: r for r in
           kmeans_step_exact(df, cb, code_id_col="vec_id", dim=4).collect()}
    assert set(got) == {0, 1}
    for c in (0, 1):
        assert got[c]["n_assigned"] == 3
        # mean of (0, 0.2, 0.4) fixed-point = 200000 per dim, old 0
        # -> shift 4 * 200000 for cluster 0; same offset for cluster 1
        assert got[c]["shift_l1"] == 4 * 200_000
        assert got[c]["inertia"] > 0
    # checksum is the new centroid's coord sum
    assert got[0]["centroid_checksum"] == 4 * 200_000
    assert got[1]["centroid_checksum"] == 4 * 10_200_000


def test_kmeans_step_empty_cluster_keeps_centroid(spark):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.ann import kmeans_step_exact

    # centroid 1 is far from every point -> empty cluster
    rows = [
        (0, [0.0, 0.0]),
        (1, [1000.0, 1000.0]),
        (2, [0.1, 0.1]),
        (3, [0.2, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # exclude the far centroid's own vector from assignment input to
    # truly empty it
    pts = df.filter(F.col("vec_id") != 1)
    cb = df.filter(F.col("vec_id") < 2)
    got = {r["cluster"]: r for r in
           kmeans_step_exact(pts, cb, code_id_col="vec_id", dim=2).collect()}
    assert got[1]["n_assigned"] == 0
    assert got[1]["shift_l1"] == 0          # kept old centroid
    assert got[1]["centroid_checksum"] == 2 * 1_000_000_000
