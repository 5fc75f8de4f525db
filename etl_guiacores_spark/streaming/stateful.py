"""Custom stateful streaming operator: incremental sessionizer.

``session_window`` covers declarative sessionization; this operator
demonstrates the ARBITRARY-state path (``applyInPandasWithState``)
the engine uses when built-in operators can't express the semantics —
the Spark-native analog of the reference's mutable crawl-state dicts
(reference: src/extractors/sequential_scraper.py:84-99).

Semantics: per user, events accumulate into a session; a gap larger
than ``gap_seconds`` CLOSES the current session and emits one row for
it. An EVENT-TIME TIMEOUT at last_event + gap flushes and evicts a
quiet user's final session once the watermark passes it, so the state
store holds only users whose session could still be extended — state
per key is four scalars and the store is bounded by ACTIVE keys, not
all keys ever seen.

Works identically under batch `groupBy().applyInPandas` semantics?
No — this is streaming-only by design; the batch twin is
q32_sessionization (lag + cumsum), and the two are reconciled in
tests/test_stateful.py.

Why not Spark 4's ``transformWithStateInPandas``: evaluated and
environment-blocked — its driver worker imports
``google.protobuf`` (pyspark/sql/streaming/proto/StateMessage_pb2),
which is not installed here and cannot be added. The operator
semantics are fully expressible with ``applyInPandasWithState``;
swapping to TWS (ValueState + TTL + timers) is a mechanical port once
protobuf is available.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

#: state = (session_start_us, last_ts_us, n_events, total_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_us: int):
    (user_id,) = key
    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = -1
        n, total = 0, 0.0

    cols = [f.name for f in SESSION_SCHEMA.fields]

    if state.hasTimedOut:
        # the watermark passed this session's gap horizon: no event can
        # extend it any more — flush the final session and EVICT the
        # state (this is what keeps the store bounded when users go
        # quiet forever; NoTimeout would grow it monotonically)
        state.remove()
        if start_us >= 0:
            yield pd.DataFrame(
                [(user_id, start_us, last_us, n, round(total, 2))], columns=cols
            )
        return

    # a key's events may arrive as SEVERAL arrow chunks in arbitrary
    # order (maxRecordsPerBatch splits big groups) — concatenate and
    # sort ONCE so the gap scan sees one globally time-ordered pass;
    # per-chunk sorting would move last_us backward on out-of-order
    # chunks and merge events into the wrong session
    chunks = list(pdfs)
    closed: list[tuple] = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            # pandas Timestamp -> integer microseconds (exact, matches
            # the batch twin's unix_micros arithmetic)
            tus = ts.value // 1000
            if start_us < 0:
                start_us, last_us, n, total = tus, tus, 1, float(value)
            elif tus - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, round(total, 2)))
                start_us, last_us, n, total = tus, tus, 1, float(value)
            else:
                # a LATE event (earlier batch's watermark not yet past,
                # tus < last_us) joins the open session but must never
                # move its bounds backward: session_end is the max event
                # time seen, session_start the min — otherwise the
                # event-time timeout regresses and the session flushes
                # early, splitting one real session into corrupt halves
                start_us = min(start_us, tus)
                last_us = max(last_us, tus)
                n, total = n + 1, total + float(value)

    if start_us >= 0:
        state.update((start_us, last_us, n, total))
        # event-time timeout at last_event + gap: when the watermark
        # crosses it, the hasTimedOut branch above flushes + evicts
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
    if closed:
        yield pd.DataFrame(closed, columns=cols)


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """events(user_id, ts, value) stream -> closed-session rows."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        yield from _sessionize(key, pdfs, state, gap_us)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# mapInPandas-style closures travel by value (see shipping.py)
import sys as _sys  # noqa: E402

from etl_guiacores_spark import shipping as _shipping  # noqa: E402

_shipping.register_udf_module(_sys.modules[__name__])
