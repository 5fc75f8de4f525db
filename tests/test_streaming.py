"""Streaming surface: watermarked windows, stateful dedupe,
checkpointed exactly-once append, incremental discovery."""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_guiacores_spark.streaming import (
    discover_until_idle,
    session_agg,
    stream_dedupe,
    tumbling_counts,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ev(eid, minute, user=1, etype="click", value=1.0):
    return (eid, datetime(2024, 1, 1, minute // 60, minute % 60), user, etype, value)


def run_stream(spark, src_dir, transform, out_name, checkpoint, mode="append"):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    return q


class TestWindowedStreams:
    def test_tumbling_counts_with_watermark(self, spark, tmp_path):
        src = str(tmp_path / "src")
        batch1 = [ev(1, 5), ev(2, 15), ev(3, 65)]
        spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("append").parquet(src)

        q = run_stream(spark, src, tumbling_counts, "tumbling_out",
                       str(tmp_path / "ckpt"), mode="append")
        try:
            # append mode emits only watermark-closed windows; push the
            # watermark forward with a late-hour batch
            spark.createDataFrame([ev(4, 300)], EVENTS_SCHEMA).write.mode("append").parquet(src)
            q.processAllAvailable()
            rows = {
                (r["window_start"].minute, r["window_start"].hour): r["n_events"]
                for r in spark.sql("select * from tumbling_out").collect()
            }
            assert rows.get((0, 0)) == 2  # hour 0: events at :05 and :15
            assert rows.get((0, 1)) == 1  # hour 1: event at 1:05
        finally:
            q.stop()

    def test_session_agg_batch_twin(self, spark):
        # gap > 30min splits sessions
        df = spark.createDataFrame([ev(1, 0), ev(2, 10), ev(3, 50)], EVENTS_SCHEMA)
        got = session_agg(df).collect()
        assert sorted(r["n_events"] for r in got) == [1, 2]


class TestStreamDedupe:
    def test_dedupe_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        spark.createDataFrame([ev(1, 0), ev(2, 1)], EVENTS_SCHEMA).write.mode("append").parquet(src)
        q = run_stream(spark, src, stream_dedupe, "dedupe_out", str(tmp_path / "ckpt"))
        try:
            # same (user, type) again in a later batch -> suppressed by state
            spark.createDataFrame([ev(3, 2)], EVENTS_SCHEMA).write.mode("append").parquet(src)
            q.processAllAvailable()
            assert spark.sql("select count(*) n from dedupe_out").collect()[0]["n"] == 1
        finally:
            q.stop()


class TestExactlyOnceAppend:
    def test_checkpoint_prevents_reprocessing(self, spark, tmp_path):
        src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
        spark.createDataFrame([ev(1, 0)], EVENTS_SCHEMA).write.mode("append").parquet(src)

        def start():
            return (
                spark.readStream.schema(EVENTS_SCHEMA)
                .parquet(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        q.processAllAvailable()
        q.stop()
        # restart over the same checkpoint: batch 0 must not re-append (L2)
        q = start()
        q.processAllAvailable()
        q.stop()
        assert spark.read.parquet(out).count() == 1


class TestDiscovery:
    def test_stops_after_idle_rounds(self, spark):
        calls = []

        def batch(i):
            calls.append(i)
            if i == 0:
                return spark.createDataFrame([("1", "u1"), ("2", "u2")], ["id_negocio", "url"])
            if i == 1:  # only dups -> idle
                return spark.createDataFrame([("1", "u1dup")], ["id_negocio", "url"])
            if i == 4:  # never reached: 3 idle rounds (1,2,3) stop the loop
                return spark.createDataFrame([("9", "u9")], ["id_negocio", "url"])
            return spark.createDataFrame([], "id_negocio string, url string")

        got = discover_until_idle(batch, idle_rounds=3)
        assert sorted(r["id_negocio"] for r in got.collect()) == ["1", "2"]
        assert calls == [0, 1, 2, 3]

    def test_source_exhaustion(self, spark):
        batches = iter([spark.createDataFrame([("1", "u")], ["id_negocio", "url"])])
        got = discover_until_idle(lambda i, it=batches: next(it, None))
        assert got.count() == 1


class TestStreamStreamJoin:
    def test_interval_join_within_delay(self, spark, tmp_path):
        lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
        # left: purchases at minute 30; right: views at minutes 0 (inside
        # 1h window) and a view 2h earlier (outside)
        spark.createDataFrame([ev(1, 150, user=1, etype="purchase")], EVENTS_SCHEMA) \
            .write.mode("append").parquet(lsrc)
        spark.createDataFrame(
            [ev(2, 120, user=1, etype="view"), ev(3, 10, user=1, etype="view")],
            EVENTS_SCHEMA,
        ).write.mode("append").parquet(rsrc)

        left = spark.readStream.schema(EVENTS_SCHEMA).parquet(lsrc).select(
            "user_id", F.col("ts").alias("lts"), F.col("event_id").alias("l_id")
        ).withColumnRenamed("lts", "ts")
        right = spark.readStream.schema(EVENTS_SCHEMA).parquet(rsrc).select(
            "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("r_id")
        )
        l = left.withWatermark("ts", "2 hours").alias("l")
        r = right.withWatermark("rts", "2 hours").alias("r")
        joined = l.join(
            r,
            F.expr("l.user_id = r.user_id AND "
                   "r.rts > l.ts - INTERVAL 1 HOUR AND r.rts <= l.ts"),
        )
        q = (
            joined.writeStream.format("memory").queryName("ssj_out")
            .option("checkpointLocation", str(tmp_path / "ckpt")).start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("select l_id, r_id from ssj_out").collect()
            assert {(r["l_id"], r["r_id"]) for r in rows} == {(1, 2)}
        finally:
            q.stop()
