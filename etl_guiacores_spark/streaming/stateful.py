"""Custom stateful streaming operator: incremental sessionizer.

``session_window`` covers declarative sessionization; this operator
demonstrates the ARBITRARY-state path (``applyInPandasWithState``)
the engine uses when built-in operators can't express the semantics —
the Spark-native analog of the reference's mutable crawl-state dicts
(reference: src/extractors/sequential_scraper.py:84-99).

Semantics: per user, events accumulate into session INTERVALS; a gap
larger than ``gap_seconds`` splits them. A session is emitted only
once the WATERMARK passes its gap horizon (end + gap) — before that a
late-but-admissible event could still extend it or bridge it with a
neighbor, and an append-mode emission is irrevocable, so early
emission would produce overlapping corrupt sessions. An EVENT-TIME
TIMEOUT at the earliest held horizon drives the flush for quiet users
and evicts empty state, so the store holds only ACTIVE keys, and each
key's state is a short interval-summary list (bounded by
watermark_delay / gap + 1 entries), never a raw-event buffer.

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

#: state = the key's session INTERVALS as parallel arrays
#: (start_us[i], end_us[i], n[i], total[i]) — gap-closed sessions stay
#: in state until the watermark passes their gap horizon, because a
#: late-but-within-watermark event may still belong to (or BRIDGE)
#: them, and append mode can never retract an emitted row. The list is
#: bounded: intervals are emitted as soon as the watermark clears them,
#: so its length is at most watermark_delay / gap + 1 per key.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
        T.StructField("totals", T.ArrayType(T.DoubleType())),
    ]
)


def _merge_intervals(ivs: list[list], gap_us: int) -> list[list]:
    """Session algebra: sort interval summaries by start and coalesce
    any neighbors within ``gap_us`` of each other — the same merge
    Spark's built-in session_window state performs. A late event can
    extend a session backward/forward or BRIDGE two sessions into one;
    representing every event as a unit interval and re-merging handles
    all cases with summaries only (no raw-event buffer)."""
    ivs.sort(key=lambda iv: iv[0])
    out: list[list] = []
    for iv in ivs:
        if out and iv[0] - out[-1][1] <= gap_us:
            last = out[-1]
            last[1] = max(last[1], iv[1])
            last[2] += iv[2]
            last[3] += iv[3]
        else:
            out.append(list(iv))
    return out


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_us: int):
    (user_id,) = key
    ivs: list[list] = (
        [list(iv) for iv in zip(*state.get)] if state.exists else []
    )

    # a key's events may arrive as SEVERAL arrow chunks in arbitrary
    # order (maxRecordsPerBatch splits big groups); each event becomes
    # a unit interval and the merge below orders everything once
    for pdf in pdfs:
        for ts, value in zip(pdf["ts"], pdf["value"]):
            # NULL ts -> NaT whose .value is Long.MIN: no event time
            # means no session membership — drop, don't fabricate a
            # garbage interval at the dawn of time
            if pd.isna(ts):
                continue
            # pandas Timestamp -> integer microseconds (exact, matches
            # the batch twin's unix_micros arithmetic)
            tus = ts.value // 1000
            # NULL value counts the event but adds 0 — the batch
            # twin's COUNT(*) + SUM(value) (null-skipping) semantics
            ivs.append([tus, tus, 1, 0.0 if pd.isna(value) else float(value)])
    ivs = _merge_intervals(ivs, gap_us)

    # emit ONLY sessions whose gap horizon the watermark has passed: no
    # event the stream can still accept (ts >= watermark) satisfies
    # ts <= end + gap for such a session, so it is final. Sessions
    # closed by an in-batch gap but still inside the watermark stay in
    # state — a late event may yet extend or bridge them, and an
    # append-mode emission is irrevocable.
    wm_us = state.getCurrentWatermarkMs() * 1000
    final = [iv for iv in ivs if iv[1] + gap_us <= wm_us]
    ivs = [iv for iv in ivs if iv[1] + gap_us > wm_us]

    if ivs:
        state.update(tuple(list(col) for col in zip(*ivs)))
        # event-time timeout at the EARLIEST remaining horizon: when the
        # watermark crosses it this function runs again (with no rows)
        # and the emission scan above flushes what became final — and
        # eventually evicts the state entirely (bounded store: quiet
        # users must not hold entries forever). CEIL to ms: a floor
        # could land exactly ON the watermark, which Spark rejects.
        horizon_us = min(iv[1] for iv in ivs) + gap_us
        state.setTimeoutTimestamp(-(-horizon_us // 1000))
    elif state.exists:
        state.remove()

    if final:
        cols = [f.name for f in SESSION_SCHEMA.fields]
        yield pd.DataFrame(
            [(user_id, s, e, n, round(t, 2)) for s, e, n, t in final],
            columns=cols,
        )


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """events(user_id, ts, value) stream -> closed-session rows.

    Requires a UTC session: Arrow hands the operator tz-NAIVE
    timestamps rendered in the session timezone, while
    getCurrentWatermarkMs is epoch-based — under any other zone the
    horizon comparison would shift by the UTC offset and emit sessions
    hours early (configure_session pins UTC; enforced here for
    externally built sessions)."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"sessionize_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): the event-time/watermark comparison is only "
            "correct when Arrow's session-zone timestamps coincide with "
            "epoch microseconds"
        )
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
