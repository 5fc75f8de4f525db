"""Round-8 analytics wave (queries_analytics.py): independent Python
references and conservation invariants.

The DuckDB oracles prove cross-engine agreement; these tests add an
ENGINE-INDEPENDENT third check — a straight-line Python reference
over the collected sf0.001 rows — so a semantics misunderstanding
shared by both SQL programs cannot hide, plus invariants (dwell-time
conservation, revenue conservation, orphan injection) that pin the
operators' meaning rather than their output hashes.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import etl_guiacores_spark.queries_analytics  # noqa: F401 — registers
from etl_guiacores_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF)


def _events(spark):
    from etl_guiacores_spark.sources.tables import load_table

    return load_table(spark, "events", SF).collect()


def test_max_drawdown_matches_python_reference(spark):
    rows = [
        r for r in _events(spark) if r["event_type"] in ("purchase", "error")
    ]
    series = defaultdict(list)
    for r in rows:
        flow = int(r["value"] * 1_000_000 // 1)  # floor on positive values
        if r["event_type"] != "purchase":
            flow = -flow
        series[r["user_id"]].append((r["ts"], r["event_id"], flow))
    want = {}
    for uid, evs in series.items():
        evs.sort()
        cum = peak = 0
        max_dd = None
        peak = None
        for _, _, f in evs:
            cum += f
            peak = cum if peak is None else max(peak, cum)
            dd = peak - cum
            max_dd = dd if max_dd is None else max(max_dd, dd)
        want[uid] = (len(evs), cum, peak, max_dd)
    got = {
        r["user_id"]: (
            r["n_flows"], r["final_micro"], r["peak_micro"],
            r["max_drawdown_micro"],
        )
        for r in _run(spark, "q187_max_drawdown").collect()
    }
    assert got == want
    # drawdown is a path property: non-negative, and at least
    # peak - final (the end-of-path drawdown)
    for n, final, peak, dd in got.values():
        assert dd >= 0 and dd >= peak - final


def test_state_dwell_conserves_user_spans(spark):
    from pyspark.sql import functions as F

    # sum over states of total dwell == sum over users of
    # (last event - first event): every microsecond of a user's span
    # is attributed to exactly one state
    out = _run(spark, "q188_state_dwell")
    total = out.agg(F.sum("total_dwell_us")).first()[0]
    evs = _events(spark)
    spans = defaultdict(list)
    for r in evs:
        spans[r["user_id"]].append(r["ts"])
    want = sum(
        int((max(ts) - min(ts)).total_seconds() * 1_000_000)
        for ts in spans.values()
        if len(ts) > 1
    )
    assert total == want
    # n_holds conservation: every event except each user's last holds
    n_holds = out.agg(F.sum("n_holds")).first()[0]
    assert n_holds == len(evs) - sum(1 for _ in spans)


def test_xcorr_lag0_matches_python_reference(spark):
    evs = _events(spark)
    x, y = defaultdict(int), defaultdict(int)
    for r in evs:
        h = int(r["ts"].timestamp() // 3600)
        if r["event_type"] == "view":
            x[h] += 1
        elif r["event_type"] == "purchase":
            y[h] += 1
    rows = {
        r["lag_hours"]: r for r in _run(spark, "q189_lead_lag_xcorr").collect()
    }
    for lag in range(-3, 4):
        common = [(x[h], y[h + lag]) for h in x if (h + lag) in y]
        n = len(common)
        sxy = sum(a * b for a, b in common)
        sx = sum(a for a, _ in common)
        sy = sum(b for _, b in common)
        assert rows[lag]["n_hours"] == n
        assert rows[lag]["cov_num"] == n * sxy - sx * sy


def test_coo_matmul_spot_check_against_python_md5(spark):
    from etl_guiacores_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF).limit(5).collect()
        if r["text"] and r["text"].strip()
    }
    got = {
        (r["doc_id"], r["topic"]): r["score"]
        for r in _run(spark, "q190_coo_matmul")
        .filter(f"doc_id in ({','.join(str(d) for d in docs)})")
        .collect()
    }

    def weight(term, topic):
        h = int(hashlib.md5(f"mm:{term}:{topic}".encode()).hexdigest()[:8], 16)
        return h % 5 - 2

    for doc_id, text in docs.items():
        counts = defaultdict(int)
        for term in text.strip().split():
            counts[term] += 1
        for topic in range(8):
            want = sum(c * weight(t, topic) for t, c in counts.items())
            assert got[(doc_id, topic)] == want


def test_fk_orphan_audit_detects_injected_orphan(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    # clone sf0.001 by symlink, then append ONE orphan order row
    # (o_custkey with no customer parent); the audit must count
    # exactly it and nothing else
    from etl_guiacores_spark.sources.tables import TABLE_NAMES, load_table

    sf = tmp_path / "sf_orphan"
    sf.mkdir()
    for t in TABLE_NAMES:
        if t != "orders":
            os.symlink(f"{SF}/{t}.parquet", sf / f"{t}.parquet")
    orders = load_table(spark, "orders", SF)
    orphan = orders.limit(1).withColumn(
        "o_orderkey", F.lit(999_999_999).cast("long")
    ).withColumn("o_custkey", F.lit(-12345).cast("long"))
    orders.unionByName(orphan).coalesce(1).write.parquet(
        str(sf / "orders.parquet")
    )

    base = {
        r["fk"]: (r["n_rows"], r["n_orphans"])
        for r in _run(spark, "q191_fk_orphan_audit").collect()
    }
    got = {
        r["fk"]: (r["n_rows"], r["n_orphans"])
        for r in REGISTRY["q191_fk_orphan_audit"].fn(spark, str(sf)).collect()
    }
    ck = "orders.o_custkey->customer"
    assert base[ck][1] == 0
    assert got[ck] == (base[ck][0] + 1, 1)
    # untouched edges unchanged
    for k in base:
        if k != ck:
            assert got[k] == base[k]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-10**9, 10**9)),
        min_size=1,
        max_size=60,
    )
)
def test_max_drawdown_property(spark, flows):
    """Random signed flows over up to 4 keys: the operator must match
    a sequential peak-trough walk exactly — including all-negative
    paths, ties, and single-element series."""
    from etl_guiacores_spark.operators.rollup_time import max_drawdown

    rows = [(k, i, v) for i, (k, v) in enumerate(flows)]
    df = spark.createDataFrame(rows, "k long, seq long, flow long")
    got = {
        r["k"]: (r["n_flows"], r["final"], r["peak"], r["max_drawdown"])
        for r in max_drawdown(df, ["k"], ["seq"], "flow").collect()
    }
    series = defaultdict(list)
    for k, i, v in rows:
        series[k].append(v)
    for k, vs in series.items():
        cum = 0
        peak = None
        dd = None
        for v in vs:
            cum += v
            peak = cum if peak is None else max(peak, cum)
            d = peak - cum
            dd = d if dd is None else max(dd, d)
        assert got[k] == (len(vs), cum, peak, dd)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 10**6),      # offset seconds
            st.sampled_from("abc"),     # state
        ),
        min_size=1,
        max_size=50,
    )
)
def test_state_dwell_property(spark, evs):
    """Random event streams: per-state dwell totals must match a
    sequential walk, and the conservation law (sum of dwells == sum of
    per-key first-to-last spans) must hold for any input."""
    from datetime import datetime, timedelta

    from etl_guiacores_spark.operators.temporal import state_dwell

    t0 = datetime(2024, 5, 1)
    rows = [
        (k, i, t0 + timedelta(seconds=s), st_)
        for i, (k, s, st_) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "k long, eid long, ts timestamp_ntz, state string"
    )
    got = {
        r["state"]: (r["n_holds"], r["total_dwell_us"], r["max_dwell_us"])
        for r in state_dwell(df, ["k"], "state", "ts", "eid").collect()
    }
    series = defaultdict(list)
    for k, i, ts, st_ in rows:
        series[k].append((ts, i, st_))
    want = defaultdict(lambda: [0, 0, None])
    for k, s in series.items():
        s.sort()
        for (ts, _, st_), (nts, _, _) in zip(s, s[1:]):
            us = int((nts - ts).total_seconds() * 1_000_000)
            want[st_][0] += 1
            want[st_][1] += us
            want[st_][2] = us if want[st_][2] is None else max(
                want[st_][2], us)
    assert got == {s: tuple(v) for s, v in want.items()}
    total = sum(v[1] for v in want.values())
    spans = sum(
        int((max(x[0] for x in s) - min(x[0] for x in s)).total_seconds()
            * 1_000_000)
        for s in series.values()
    )
    assert total == spans


def test_wow_growth_conserves_revenue(spark):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.sources.tables import load_table

    out = _run(spark, "q192_wow_growth")
    total = out.agg(
        F.sum("revenue_cents").alias("r"), F.sum("n_orders").alias("n")
    ).first()
    orders = load_table(spark, "orders", SF)
    want = orders.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("r"),
        F.count("*").alias("n"),
    ).first()
    assert (total["r"], total["n"]) == (want["r"], want["n"])
    def trunc_div(a, b):
        # the engine-wide TRUNCATING div (Spark div / DuckDB //),
        # not Python's floor // — they differ on negative growth
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = out.orderBy("week").collect()
    assert rows[0]["prev_cents"] is None and rows[0]["wow_ppm"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_cents"] == prev["revenue_cents"]
        assert cur["wow_ppm"] == trunc_div(
            1_000_000 * (cur["revenue_cents"] - cur["prev_cents"]),
            cur["prev_cents"],
        )


def test_q198_q199_scratch_dirs_are_bounded(spark, tmp_path):
    """The side-effecting queries must not accumulate one /tmp tree
    per invocation (bench runs each query 1 cold + warm repeats, the
    determinism sweep runs everything twice): each call frees the
    previous call's scratch dir, so at most ONE tree per query is
    live in a process."""
    import os

    from etl_guiacores_spark import queries_analytics as qa
    from etl_guiacores_spark.queries import REGISTRY

    fn = REGISTRY["q198_orc_pushdown_roundtrip"].fn
    fn(spark, SF).collect()
    first = qa._SCRATCH["q198_orc"]
    assert os.path.isdir(first)
    fn(spark, SF).collect()
    second = qa._SCRATCH["q198_orc"]
    assert second != first
    assert not os.path.exists(first)  # previous tree freed
    assert os.path.isdir(second)


def test_q199_empty_events_returns_empty_report(spark, tmp_path):
    """Suite-wide empty-input contract (R4): an empty events table
    yields an empty report with the full output schema — never the
    TypeError the unguarded None midpoint arithmetic would raise."""
    from etl_guiacores_spark.queries import REGISTRY
    from etl_guiacores_spark.sources.tables import load_table

    schema = load_table(spark, "events", SF).schema
    empty_sf = str(tmp_path / "sf_empty")
    spark.createDataFrame([], schema).write.parquet(
        f"{empty_sf}/events.parquet"
    )
    out = REGISTRY["q199_streaming_acquisition_twin"].fn(spark, empty_sf)
    assert out.columns == [
        "day", "n_events", "n_active", "n_new", "n_returning",
        "cum_users",
    ]
    assert out.count() == 0
