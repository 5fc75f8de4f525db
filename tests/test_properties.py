"""Property-based tests for the pure column functions (SURVEY §5.4).

Strategy: generate inputs with hypothesis, evaluate the Column
expressions over one batched DataFrame per property (a Spark action
per example would be prohibitively slow), and assert the invariant
row-wise.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_guiacores_spark.functions import (
    clean_phone_list,
    clean_text,
    normalize_phone,
    split_address,
)

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=60
)


def run_batch(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["y"] for r in df.select(fn(F.col("x")).alias("y")).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_clean_text_idempotent_and_collapsed(spark, values):
    once = run_batch(spark, clean_text, values)
    twice = run_batch(spark, clean_text, [v if v is not None else "" for v in once])
    assert once == twice
    for out in once:
        if out is not None:
            # engine whitespace = Java \s (ASCII); Python's str.strip()
            # is broader (e.g. \x1f), so assert against the engine spec
            assert "  " not in out
            assert not out.startswith(" ") and not out.endswith(" ")


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="0123456789-() +", max_size=20), min_size=1, max_size=20))
def test_normalize_phone_shape(spark, values):
    got = run_batch(spark, normalize_phone, values)
    for raw, out in zip(values, got):
        digits = re.sub(r"\D", "", raw)
        if len(digits) < 10:
            assert out is None
        elif len(digits) == 10:
            assert re.fullmatch(r"\d{3}-\d{4}-\d{3}", out)
        elif len(digits) == 11:
            assert re.fullmatch(r"\d{2}-\d{3}-\d{3}-\d{3}", out)
        else:
            assert out == digits


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="0123456789- ,", max_size=30), min_size=1, max_size=20))
def test_clean_phone_list_idempotent(spark, values):
    once = run_batch(spark, clean_phone_list, values)
    twice = run_batch(spark, clean_phone_list, [v if v is not None else "" for v in once])
    assert once == twice
    for out in once:
        if out is not None:
            parts = out.split(", ")
            assert len(parts) == len(set(parts))  # deduped
            assert all("-" not in p and " " not in p for p in parts)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc 1", min_size=1, max_size=15).filter(
                lambda s: " - " not in s and s.strip()
            ),
            st.text(alphabet="xyz 2", min_size=1, max_size=15).filter(
                lambda s: " - " not in s and s.strip()
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_split_address_round_trip(spark, pairs):
    # direccion + ' - ' + localidad must split back into its parts
    values = [f"{d} - {l}" for d, l in pairs]
    df = spark.createDataFrame([(v,) for v in values], "x string")
    direccion, localidad = split_address(F.col("x"))
    got = df.select(direccion.alias("d"), localidad.alias("l")).collect()
    for (d, l), row in zip(pairs, got):
        assert row["d"] == d
        assert row["l"] == l


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10_000), st.integers(1, 50)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 8),
)
def test_prefix_sum_conservation_and_partition_invariance(spark, rows, parts):
    """global_prefix_sum: the max inclusive total equals the plain SUM,
    offsets are a permutation-free function of (order, value) — the
    same result at any partition count."""
    from etl_guiacores_spark.operators.ordering import global_prefix_sum

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["run"]
        for r in global_prefix_sum(
            df, "k", "v", out_col="run", num_partitions=parts
        ).collect()
    }
    run = 0
    for k, v in sorted(rows):
        run += v
        assert got[k] == run


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 100_000), st.integers(1, 100)),
        min_size=5,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),
)
def test_weighted_sample_partition_invariant(spark, rows, parts):
    """A-Res selection is a pure function of (key, seed, weight):
    repartitioning the input must not change the selected set."""
    from etl_guiacores_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(rows, "k long, w long")
    k = max(1, len(rows) // 2)
    a = {r["k"] for r in weighted_sample_topk(df, "k", "w", k).collect()}
    b = {
        r["k"]
        for r in weighted_sample_topk(df.repartition(parts), "k", "w", k).collect()
    }
    assert a == b and len(a) == min(k, len(rows))


def test_prefix_sum_null_values_and_temp_collisions(spark):
    """exclusive=True start offsets treat NULL values as 0 (the window
    sums already skip them); reserved temp columns are rejected rather
    than silently clobbered."""
    import pytest

    from etl_guiacores_spark.operators.ordering import dense_ids, global_prefix_sum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "k long, v long"
    )
    out = {r["k"]: r["start"] for r in global_prefix_sum(
        df, "k", "v", out_col="start", exclusive=True
    ).collect()}
    # NULL contributes nothing: row 2 starts where row 1 ended, row 3
    # sees only the 10 from row 1
    assert out == {1: 0, 2: 10, 3: 10}

    with pytest.raises(ValueError, match="__lsum"):
        global_prefix_sum(df.withColumn("__lsum", df.v), "k", "v")
    with pytest.raises(ValueError, match="__one"):
        dense_ids(df.withColumn("__one", df.v), "k")


# --- round-4 operators: Bloom, SCD2, linkage -------------------------------

@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=30),
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=30),
)
def test_bloom_never_false_negative(spark, members, probes):
    """For ANY member/probe sets: every probe that IS a member must
    test positive — the Bloom contract has no exceptions."""
    from etl_guiacores_spark.operators.bloom import bloom_build, bloom_probe

    m = spark.createDataFrame([(v,) for v in set(members)], "v string")
    p = spark.createDataFrame([(v,) for v in set(probes)], "v string")
    bits = bloom_build(m, "v", num_bits=4096, num_hashes=3, seed="prop")
    out = bloom_probe(p, bits, "v", num_bits=4096, num_hashes=3, seed="prop").collect()
    member_set = set(members)
    for r in out:
        if r["v"] in member_set:
            assert r["maybe_member"], r["v"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),            # key
            st.integers(min_value=0, max_value=20),           # day offset
            st.sampled_from(["A", "B", "C"]),                 # state
        ),
        min_size=1,
        max_size=40,
    )
)
def test_scd2_invariants(spark, rows):
    """For ANY change stream: per key, exactly one current version,
    versions numbered 1..n, intervals tile (valid_to[i] ==
    valid_from[i+1]), and no two consecutive versions share a state."""
    import datetime as dt

    from etl_guiacores_spark.operators.scd import scd2_history

    base = dt.datetime(2024, 1, 1)
    data = [(k, base + dt.timedelta(days=d), s) for k, d, s in rows]
    df = spark.createDataFrame(data, "k long, ts timestamp, state string")
    out = scd2_history(df, "k", "ts", ["state"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["version_n"])
        assert [r["version_n"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            # same-instant duplicate states can produce zero-length
            # intervals, but ADJACENT versions never carry equal state
            # unless separated by a timestamp tie
            if a["valid_from"] != b["valid_from"]:
                assert a["state"] != b["state"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=10).filter(lambda s: s.strip()),
        min_size=2,
        max_size=15,
        unique=True,
    )
)
def test_fuzzy_pairs_are_sound(spark, names):
    """Every emitted pair must satisfy the spec exactly: same block,
    id_a < id_b, and true edit distance == reported dist <= max_dist."""
    import difflib

    from etl_guiacores_spark.operators.linkage import fuzzy_match_pairs

    def lev(a, b):
        if not a: return len(b)
        if not b: return len(a)
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    out = fuzzy_match_pairs(df, "id", "name", max_dist=3).collect()
    by_id = dict(enumerate(names))
    for r in out:
        a, b = by_id[r["id_a"]], by_id[r["id_b"]]
        assert r["id_a"] < r["id_b"]
        assert a.strip().split()[0].lower() == b.strip().split()[0].lower()
        assert r["dist"] == lev(a, b) <= 3


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "pad"]),
                 min_size=1, max_size=12),
        min_size=2, max_size=15,
    ),
    st.sets(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=3),
)
def test_bm25_matches_integer_spec(spark, token_lists, terms):
    """Random tiny corpora: bm25_scores must equal the exact integer
    recurrence computed in Python (same truncating arithmetic)."""
    from etl_guiacores_spark.operators.retrieval import PPM, bm25_scores

    docs = {i: " ".join(toks) for i, toks in enumerate(token_lists)}
    qterms = sorted(terms)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["score_ppm"], r["n_hit_terms"])
        for r in bm25_scores(df, qterms).collect()
    }
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl_micro = sum(len(v) for v in toks.values()) * PPM // n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in qterms}
    want = {}
    for i, v in toks.items():
        score, hits = 0, 0
        for t in qterms:
            tf = v.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = (2 * (n - dfreq[t]) + 1) * PPM // (2 * dfreq[t] + 1)
            ratio = len(v) * PPM * PPM // avgdl_micro
            tfc = (44 * PPM * tf * PPM) // (20 * PPM * tf + 6 * PPM + 18 * ratio)
            score += idf * tfc // PPM
        if hits:
            want[i] = (score, hits)
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(st.integers(0, 30), st.integers(-100, 100),
                    min_size=0, max_size=20),
    st.dictionaries(st.integers(0, 30), st.integers(-100, 100),
                    min_size=0, max_size=20),
)
def test_snapshot_diff_reconstructs_new_from_old(spark, old_map, new_map):
    """Applying the diff to the old snapshot must reproduce the new
    one exactly: removed ids vanish, added appear, changed keys differ,
    and every key absent from the diff is identical on both sides."""
    from etl_guiacores_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        list(old_map.items()) or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        list(new_map.items()) or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull())
    delta = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    for k, kind in delta.items():
        if kind == "removed":
            assert k in old_map and k not in new_map
        elif kind == "added":
            assert k not in old_map and k in new_map
        else:
            assert old_map[k] != new_map[k]
    for k in (set(old_map) | set(new_map)) - set(delta):
        assert old_map[k] == new_map[k]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
        min_size=2,
        max_size=40,
    )
)
def test_spearman_matches_direct_formula(spark, pairs):
    from etl_guiacores_spark.operators.rankstats import spearman_corr

    rows = [("g", x, y, i) for i, (x, y) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "g string, x long, y long, i long")
    got = spearman_corr(df, "g", "x", "y", "i").collect()[0]

    n = len(rows)
    rx = {i: r + 1 for r, (_, _, _, i) in enumerate(
        sorted(rows, key=lambda t: (t[1], t[3])))}
    ry = {i: r + 1 for r, (_, _, _, i) in enumerate(
        sorted(rows, key=lambda t: (t[2], t[3])))}
    d2 = sum((rx[i] - ry[i]) ** 2 for _, _, _, i in rows)
    denom = n * (n * n - 1)
    want = int((1_000_000 * denom - 6 * 1_000_000 * d2) / denom)  # trunc
    assert got["sum_d2"] == d2
    assert got["rho_ppm"] == want
    assert -1_000_000 <= got["rho_ppm"] <= 1_000_000


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=40))
def test_gini_matches_direct_formula_and_bounds(spark, xs):
    from etl_guiacores_spark.operators.rankstats import gini_index

    rows = [("g", x, i) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, x long, i long")
    got = gini_index(df, "g", "x", "i").collect()[0]

    n, total = len(xs), sum(xs)
    if total == 0:
        assert got["gini_ppm"] is None
        return
    sx = sorted(xs)
    ix = sum((i + 1) * x for i, x in enumerate(sx))
    num = (2 * ix - (n + 1) * total) * 1_000_000
    want = int(num / (n * total))  # truncation toward zero
    assert got["gini_ppm"] == want
    assert 0 <= got["gini_ppm"] < 1_000_000


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
        min_size=1,
        max_size=60,
    )
)
def test_kappa_matches_direct_formula(spark, pairs):
    from etl_guiacores_spark.operators.labels import cohen_kappa

    rows = [("g", a, b) for a, b in pairs]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = cohen_kappa(df, ["g"], "a", "b").collect()[0]

    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    marg = sum(
        sum(1 for a, _ in pairs if a == c) * sum(1 for _, b in pairs if b == c)
        for c in "abc"
    )
    assert got["n_items"] == n and got["n_agree"] == agree
    if n * n == marg:
        assert got["kappa_ppm"] is None
    else:
        num = (n * agree - marg) * 1_000_000
        den = n * n - marg
        q = abs(num) // den  # DECIMAL div truncates toward zero
        assert got["kappa_ppm"] == (q if num >= 0 else -q)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7200), st.integers(-5000, 5000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_twap_conservation_and_bounds(spark, obs):
    """Per key: bucket spans tile [first event, last bucket end]
    exactly, and each bucket's TWAP lies within [min, max] of the
    values that could hold in it."""
    from datetime import datetime, timedelta

    from etl_guiacores_spark.operators.rollup_time import time_weighted_avg

    t0 = datetime(2024, 5, 1)
    rows = [
        (i, t0 + timedelta(seconds=s), 1, "k", 0.0)
        for i, (s, _) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    ).withColumn("v_micro", F.col("event_id") % 97)
    out = time_weighted_avg(
        df.select("event_type", "event_id", "ts", "v_micro"), ["event_type"]
    ).collect()

    # documented semantics: each observation holds until min(next
    # observation, its OWN bucket end) — a gap spanning a bucket
    # boundary leaves the tail of the gap uncovered by design
    secs = sorted(s for s, _ in obs)
    want_span = sum(
        min(nxt, (s // 3600 + 1) * 3600) - s
        for s, nxt in zip(secs, secs[1:] + [10**9])
    )
    total_span = sum(r["span_micros"] for r in out)
    assert total_span == want_span * 1_000_000
    for r in out:
        assert r["twap_micro"] is None or 0 <= r["twap_micro"] <= 96
