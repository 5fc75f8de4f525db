"""Streaming max drawdown — the stream twin of
``operators/rollup_time.max_drawdown`` (q187), extending the §2.10
twin set (OHLC, CUSUM, Holt, daily acquisition) to the round-8
analytics wave's running-sum/running-peak shape.

The batch operator stacks two per-key ROWS windows (running sum, then
running peak) on one partition-sort and aggregates the path maxima.
The recurrence's whole memory is FOUR integers per key —
(cum, peak, maxdd, n_flows) — plus the last-seen (time, tiebreak), so the
stream version carries exactly that between micro-batches and replays
each batch's rows through the SAME two stacked windows seeded by the
carried values:

    cum_i  = cum_carried + running_sum(flow)
    peak_i = greatest(peak_carried, running_max(cum_i))
    maxdd  = greatest(maxdd_carried, max(peak_i - cum_i))

Per-batch output is one CUMULATIVE report row per key touched by the
batch (keys, n_flows, final, peak, max_drawdown, batch_id) — an
upsert: ``read_max_drawdown`` merges to the latest batch's row per
key, which equals running the batch operator over the full history
(equivalence-tested in tests/test_streaming.py, including a
redelivery replay).

Delivery/replay contracts are the smooth.py/drift.py protocol
verbatim: rows must arrive in per-key event-time order ACROSS batches
(fail loud — a late row would need path rewrite); outputs and state
snapshots land in ``batch=<id>`` dirs with overwrite + ``_SUCCESS``
fencing; batch N reads the latest fenced snapshot with id < N
(Hadoop-FS listing + replay fence), so a foreachBatch redelivery
recomputes from its original inputs and overwrites its own output:
exactly-once upserts. State at 100 TB is one 6-field row per key,
shuffled like any keyed join; snapshots parquet-pruned.

State-size bound: the snapshot holds EXACTLY one row per key ever
seen — never per batch (asserted over 20 micro-batches with key churn
in tests/test_streaming.py::TestTwinStateBounds), and only
``keep_snapshots`` fenced snapshot dirs survive on disk. Key-churn
retention: whole-history drawdown legitimately remembers every key
forever; when a deployment retires keys (closed accounts), compact by
filtering the latest fenced snapshot — it is a plain parquet table —
before restarting the stream, or leave them: the carry cost is one
narrow row per retired key, anti-joined (never rescanned) each batch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_guiacores_spark.streaming.drift import (
    _delete_dir,
    _resolve_prev_snapshot,
    _snapshot_ids,
)


def max_drawdown_stream(
    events: DataFrame,
    out_dir: str,
    key_cols: Sequence[str],
    flow_col: Column | str,
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    checkpoint_dir: str | None = None,
    keep_snapshots: int = 3,
):
    """Start the streaming drawdown tracker over ``events`` (a
    streaming DataFrame). ``flow_col`` must already be in integer
    units (the engine-wide micro-unit rule — the caller casts, the
    operator never touches floats). Returns the StreamingQuery."""
    keys = list(key_cols)
    reserved = {"cum", "peak", "maxdd", "n_flows", "ts_last", "tb_last",
                "final", "max_drawdown", "batch_id", "__ts", "__tb",
                "__flow", "__cum", "__peak", "__cum0", "__peak0",
                "__maxdd0", "__n0", "__first", "__held", "__ts_last",
                "__tb_last"}
    clash = sorted(reserved.intersection(keys))
    if clash:
        raise ValueError(
            f"max_drawdown_stream: key columns {clash} collide with the "
            "operator's state/working/output columns — rename them first"
        )
    flow = F.col(flow_col) if isinstance(flow_col, str) else flow_col

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import types as T

        spark = batch_df.sparkSession
        state_root = f"{out_dir}/state"
        prev = _resolve_prev_snapshot(
            spark, state_root, batch_id, "max_drawdown_stream"
        )
        # key fields typed from the stream itself (the acquisition.py
        # round-8 lesson: never hard-code a state field's type)
        state_schema = T.StructType(
            [batch_df.schema[k] for k in keys]
            + [
                T.StructField("cum", T.LongType()),
                T.StructField("peak", T.LongType()),
                T.StructField("maxdd", T.LongType()),
                T.StructField("n_flows", T.LongType()),
                T.StructField("ts_last", batch_df.schema[time_col].dataType),
                T.StructField(
                    "tb_last", batch_df.schema[tiebreak_col].dataType
                ),
            ]
        )
        if prev is not None:
            state = spark.read.schema(state_schema).parquet(prev)
        else:
            state = spark.createDataFrame([], state_schema)

        rows = batch_df.select(
            *keys,
            F.col(time_col).alias("__ts"),
            F.col(tiebreak_col).alias("__tb"),
            flow.cast("long").alias("__flow"),
        )

        # in-order contract across batches — fail loud, as every twin
        # does: folding carried state over an older row would silently
        # rewrite the path. The comparison is on the SAME (ts, tiebreak)
        # total order the operator folds in, so a later batch may
        # legally carry the same timestamp with a larger tiebreak
        # (round-9 review catch — comparing ts alone rejected it)
        firsts = rows.groupBy(*keys).agg(
            F.min(F.struct("__ts", "__tb")).alias("__first")
        )
        n_late = (
            firsts.join(
                state.select(
                    *keys,
                    F.struct(
                        F.col("ts_last").alias("__ts"),
                        F.col("tb_last").alias("__tb"),
                    ).alias("__held"),
                ),
                keys,
            )
            .filter(F.col("__first") <= F.col("__held"))
            .count()
        )
        if n_late:
            raise RuntimeError(
                f"max_drawdown_stream: batch {batch_id} carries rows at "
                f"or before already-processed event time for {n_late} "
                f"key(s) — per-key event-time order across batches is "
                f"the operator's delivery contract"
            )

        seeded = rows.join(
            state.select(
                *keys,
                F.col("cum").alias("__cum0"),
                F.col("peak").alias("__peak0"),
                F.col("maxdd").alias("__maxdd0"),
                F.col("n_flows").alias("__n0"),
            ),
            keys,
            "left",
        )
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        path = seeded.withColumn(
            "__cum",
            F.coalesce("__cum0", F.lit(0)) + F.sum("__flow").over(w),
        ).withColumn(
            # greatest() skips NULL, so a fresh key's peak is just the
            # running max — identical to the batch operator's seed
            "__peak",
            F.greatest(F.col("__peak0"), F.max("__cum").over(w)),
        )
        report = path.groupBy(*keys).agg(
            (
                F.coalesce(F.max("__n0"), F.lit(0)) + F.count("*")
            ).cast("long").alias("n_flows"),
            (
                F.coalesce(F.max("__cum0"), F.lit(0)) + F.sum("__flow")
            ).cast("long").alias("final"),
            F.max("__peak").cast("long").alias("peak"),
            F.greatest(
                F.max("__maxdd0"),
                F.max(F.col("__peak") - F.col("__cum")),
            ).cast("long").alias("max_drawdown"),
            F.max("__ts").alias("__ts_last"),
            F.max_by("__tb", F.struct("__ts", "__tb")).alias("__tb_last"),
        )
        report.select(
            *keys,
            "n_flows",
            "final",
            "peak",
            "max_drawdown",
            F.lit(batch_id).cast("long").alias("batch_id"),
        ).write.mode("overwrite").parquet(f"{out_dir}/out/batch={batch_id}")

        new_state = report.select(
            *keys,
            F.col("final").alias("cum"),
            "peak",
            F.col("max_drawdown").alias("maxdd"),
            "n_flows",
            F.col("__ts_last").alias("ts_last"),
            F.col("__tb_last").alias("tb_last"),
        )
        carried = state.join(new_state.select(*keys), keys, "left_anti")
        snap = carried.unionByName(new_state)
        snap.write.mode("overwrite").parquet(f"{state_root}/batch={batch_id}")
        done = _snapshot_ids(spark, state_root)
        for old in done[:-keep_snapshots]:
            _delete_dir(spark, f"{state_root}/batch={old}")

    writer = events.writeStream.foreachBatch(process_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_max_drawdown(
    spark: SparkSession, out_dir: str, key_cols: Sequence[str]
) -> DataFrame:
    """Current cumulative report: latest batch's row per key (the
    shared drift.read_latest_upsert merge). Matches the batch
    ``max_drawdown`` output columns."""
    from etl_guiacores_spark.streaming.drift import read_latest_upsert

    return read_latest_upsert(spark, out_dir, key_cols)
