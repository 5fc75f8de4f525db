"""Streaming upsert sink: foreachBatch + merge_upsert into parquet.

The streaming twin of L4's Postgres UPSERT loop
(reference: src/extractors/manual_scraper.py:241-295): each
micro-batch merges into the keyed target exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_guiacores_spark.operators.joins import merge_upsert

SCHEMA = T.StructType(
    [T.StructField("contador_id", T.StringType()), T.StructField("nombre", T.StringType())]
)


def test_foreachbatch_merge(spark, tmp_path):
    src, target, ckpt = (str(tmp_path / d) for d in ("src", "target", "ckpt"))
    spark.createDataFrame([("a", "v1"), ("b", "v1")], SCHEMA).write.parquet(target)
    spark.createDataFrame([("b", "v2"), ("c", "v2")], SCHEMA).write.mode("append").parquet(src)

    def merge_batch(batch_df, batch_id):
        current = batch_df.sparkSession.read.parquet(target)
        merged = merge_upsert(current, batch_df, "contador_id")
        # collect-then-rewrite keeps the test hermetic; real deployments
        # use MERGE INTO / dynamic partition overwrite here
        rows = merged.collect()
        batch_df.sparkSession.createDataFrame(rows, merged.schema).write.mode(
            "overwrite"
        ).parquet(target)

    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["contador_id"]: r["nombre"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": "v1", "b": "v2", "c": "v2"}
