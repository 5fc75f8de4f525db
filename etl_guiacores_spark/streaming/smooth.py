"""Streaming Holt smoothing — the stream twin of
``operators/rollup_time.holt_smooth`` (q170), completing the §2.10
parity set alongside the OHLC and CUSUM stream twins.

The batch operator folds each key's ordered series in-plan from a
NULL seed. The stream version carries exactly the recurrence's state
between micro-batches — (level, trend, ts_last) per key, two BIGINTs
plus a watermark timestamp, never row history — and folds each
micro-batch's rows FROM that carried seed through the identical
blocked two-level scan (the ``seed_sql`` parameter of the batch
helpers), so the concatenated outputs are bit-identical to running
``holt_smooth`` over the full history: equivalence-tested in
tests/test_streaming.py.

Delivery/replay contracts are the cusum_drift_stream ones verbatim:
rows must arrive in per-key event-time order ACROSS batches (fail
loud otherwise — a late row would need history rewrite); both output
and state snapshot write to ``batch=<id>`` dirs with overwrite and
``_SUCCESS`` fencing, and batch N reads the latest fenced snapshot
with id < N, so a foreachBatch redelivery recomputes from its
original inputs: exactly-once results. State at 100 TB is one row
per key, shuffled like any keyed join; snapshots parquet-pruned.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_guiacores_spark.streaming.drift import (
    _delete_dir,
    _resolve_prev_snapshot,
    _snapshot_ids,
)


def holt_smooth_stream(
    events: DataFrame,
    out_dir: str,
    key_cols: Sequence[str],
    value_micro: Column | str,
    alpha_ppm: int = 200_000,
    beta_ppm: int = 100_000,
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    checkpoint_dir: str | None = None,
    keep_snapshots: int = 3,
):
    """Start the streaming Holt (level+trend) smoother over ``events``
    (a streaming DataFrame). Per-batch outputs land in
    ``out_dir/out/batch=<id>`` with the batch operator's columns
    (keys + ts, tiebreak, v_micro, level_micro, trend_micro); state
    snapshots in ``out_dir/state/batch=<id>``. Returns the
    StreamingQuery."""
    from etl_guiacores_spark.operators.rollup_time import (
        _holt_block_seeds_expr,
        _holt_scan_expr,
    )

    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    if not 0 < beta_ppm <= 1_000_000:
        raise ValueError("beta_ppm must be in (0, 1e6]")
    keys = list(key_cols)
    a, b = alpha_ppm, 1_000_000 - alpha_ppm
    g, h = beta_ppm, 1_000_000 - beta_ppm
    val = F.col(value_micro) if isinstance(value_micro, str) else value_micro

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import types as T

        spark = batch_df.sparkSession
        state_root = f"{out_dir}/state"
        prev = _resolve_prev_snapshot(
            spark, state_root, batch_id, "holt_smooth_stream"
        )
        state_schema = T.StructType(
            [batch_df.schema[k] for k in keys]
            + [
                T.StructField("level", T.LongType()),
                T.StructField("trend", T.LongType()),
                T.StructField("ts_last", batch_df.schema[time_col].dataType),
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
            val.cast("long").alias("__v"),
        )
        grouped = (
            rows.groupBy(*keys)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("__ts", "__tb", "__v"))
                ).alias("__arr"),
                F.min("__ts").alias("__first_ts"),
            )
            .withColumn("__vals", F.expr("transform(__arr, x -> x.__v)"))
            .join(F.broadcast(state), keys, "left")
        )
        # in-order contract across batches — fail loud, as the CUSUM
        # twin does: continuing from carried state with an older row
        # would silently rewrite history
        n_late = grouped.filter(
            F.col("ts_last").isNotNull()
            & (F.col("__first_ts") <= F.col("ts_last"))
        ).count()
        if n_late:
            raise RuntimeError(
                f"holt_smooth_stream: batch {batch_id} carries rows at "
                f"or before already-processed event time for {n_late} "
                f"key(s) — per-key event-time order across batches is "
                f"the operator's delivery contract"
            )
        seed = "named_struct('l', level, 't', trend)"
        scanned = grouped.withColumn(
            "__bseeds",
            F.expr(
                _holt_block_seeds_expr("__vals", a, b, g, h, seed_sql=seed)
            ),
        ).withColumn(
            "__s", F.expr(_holt_scan_expr("__vals", "__bseeds", a, b, g, h))
        )
        exploded = scanned.select(
            *keys,
            F.explode(F.arrays_zip("__arr", F.col("__s").alias("__st")))
            .alias("__z"),
        ).select(
            *keys,
            F.col("__z.__arr.__ts").alias(time_col),
            F.col("__z.__arr.__tb").alias(tiebreak_col),
            F.col("__z.__arr.__v").alias("v_micro"),
            F.col("__z.__st.l").alias("level_micro"),
            F.col("__z.__st.t").alias("trend_micro"),
        )
        out_path = f"{out_dir}/out/batch={batch_id}"
        exploded.write.mode("overwrite").parquet(out_path)

        ordk = F.struct(F.col(time_col), F.col(tiebreak_col))
        new_state = exploded.groupBy(*keys).agg(
            F.max_by("level_micro", ordk).cast("long").alias("level"),
            F.max_by("trend_micro", ordk).cast("long").alias("trend"),
            F.max(time_col).alias("ts_last"),
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
