"""Embedding normalization / quantization: round-trip error bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.quantize import dequantize_int8, l2_normalize, quantize_int8
from etl_guiacores_spark.operators.similarity import cosine, with_minhash
from etl_guiacores_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_l2_normalize_unit_norm(spark):
    emb = load_table(spark, "embeddings", SF_DIR).limit(50)
    normed = emb.select(l2_normalize(F.col("embedding")).alias("v"))
    norms = normed.select(
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)).alias("n")
    ).collect()
    assert all(math.isclose(r["n"], 1.0, rel_tol=1e-9) for r in norms)


def test_quantize_round_trip_cosine_error(spark):
    emb = load_table(spark, "embeddings", SF_DIR).limit(100)
    q = emb.select(
        "vec_id", "embedding", dequantize_int8(quantize_int8(F.col("embedding"))).alias("deq")
    )
    sims = q.select(cosine(F.col("embedding"), F.col("deq")).alias("s")).collect()
    assert all(r["s"] > 0.995 for r in sims)  # <0.5% cosine distortion

    zero = spark.createDataFrame([([0.0, 0.0],)], ["embedding"])
    z = zero.select(dequantize_int8(quantize_int8(F.col("embedding"))).alias("d")).collect()
    assert z[0]["d"] == [0.0, 0.0]


def test_fast_minhash_variant(spark):
    docs = load_table(spark, "documents", SF_DIR).filter(F.length(F.trim("text")) > 0)
    fast = with_minhash(docs.select("doc_id", "text"), "text", portable=False)
    rows = fast.limit(5).collect()
    # 64-bit int signatures, deterministic across invocations
    assert all(isinstance(r["sig_0"], int) for r in rows)
    again = {r["doc_id"]: r["sig_0"] for r in fast.limit(5).collect()}
    assert {r["doc_id"]: r["sig_0"] for r in rows} == again
