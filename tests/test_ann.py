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


def test_ivf_prunes_candidates(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    index = ivf_build(emb, nlist=8)
    sizes = index.indexed.groupBy("__cluster").count().collect()
    assert len(sizes) == 8  # every centroid got members
    total = sum(r["count"] for r in sizes)
    assert total == emb.count()
