"""Eval / drift metrics (operators/evalmetrics): exact AUC, KS,
confusion breakdown, Markov transitions, Pareto frontier, Benford."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_guiacores_spark.operators.evalmetrics import (
    BENFORD_PPM,
    auc_roc,
    benford_profile,
    confusion_metrics,
    ks_2samp,
    pareto_frontier,
    transition_matrix,
)

PPM = 1_000_000


def _auc_direct(pairs):
    """Mann-Whitney AUC with tie-average ranks, as exact ppm."""
    n_pos = sum(1 for _, p in pairs if p)
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    two_r_pos = 0
    by_score: dict[int, list[bool]] = {}
    for s, p in pairs:
        by_score.setdefault(s, []).append(p)
    cum = 0
    for s in sorted(by_score):
        grp = by_score[s]
        pos = sum(grp)
        two_r_pos += pos * (2 * cum + len(grp) + 1)
        cum += len(grp)
    return PPM * (two_r_pos - n_pos * (n_pos + 1)) // (2 * n_pos * n_neg)


class TestAuc:
    def test_perfect_reverse_and_single_class(self, spark):
        rows = (
            [("perf", s, s >= 3) for s in range(6)]
            + [("rev", s, s < 3) for s in range(6)]
            + [("one", s, True) for s in range(4)]
        )
        df = spark.createDataFrame(rows, "g string, score long, lab boolean")
        got = {
            r["g"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
            for r in auc_roc(df, ["g"], "score", "lab").collect()
        }
        assert got["perf"] == (3, 3, PPM)
        assert got["rev"] == (3, 3, 0)
        assert got["one"] == (4, 0, None)

    def test_null_label_raises_in_plan(self, spark):
        # NULL labels have no rank semantics; the old arithmetic
        # silently counted them as negatives. Must fail loud.
        import pytest
        from py4j.protocol import Py4JJavaError

        df = spark.createDataFrame(
            [("g", 1, True), ("g", 2, None)],
            "g string, score long, lab boolean",
        )
        with pytest.raises((Py4JJavaError, Exception), match="NULL"):
            auc_roc(df, ["g"], "score", "lab").collect()
        with pytest.raises((Py4JJavaError, Exception), match="NULL"):
            ks_2samp(df, ["g"], "score", "lab").collect()

    def test_reserved_column_collision_raises(self, spark):
        import pytest

        df = spark.createDataFrame(
            [("g", 1, True, 0)], "g string, score long, lab boolean, __cum int"
        )
        with pytest.raises(ValueError, match="collide"):
            auc_roc(df, ["g"], "score", "lab")
        df2 = spark.createDataFrame(
            [("g", 1, True, 0)], "g string, score long, lab boolean, __dnum int"
        )
        with pytest.raises(ValueError, match="collide"):
            ks_2samp(df2, ["g"], "score", "lab")
        df3 = spark.createDataFrame(
            [("g", "a", "a", 0)], "g string, gold string, pred string, __tp int"
        )
        with pytest.raises(ValueError, match="collide"):
            confusion_metrics(df3, ["g"], "gold", "pred")

    def test_all_tied_is_half(self, spark):
        rows = [("g", 7, i % 2 == 0) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, score long, lab boolean")
        assert auc_roc(df, ["g"], "score", "lab").collect()[0][
            "auc_ppm"
        ] == PPM // 2

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 8), st.booleans()),
            min_size=1,
            max_size=50,
        )
    )
    def test_matches_direct_formula(self, spark, pairs):
        df = spark.createDataFrame(
            [("g", s, p) for s, p in pairs],
            "g string, score long, lab boolean",
        )
        got = auc_roc(df, ["g"], "score", "lab").collect()[0]
        assert got["auc_ppm"] == _auc_direct(pairs)
        if got["auc_ppm"] is not None:
            assert 0 <= got["auc_ppm"] <= PPM


def _ks_direct(vals):
    a = sorted(v for v, b in vals if not b)
    b = sorted(v for v, b in vals if b)
    if not a or not b:
        return None
    best = 0
    for x in sorted({v for v, _ in vals}):
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * len(b) - cb * len(a)))
    return PPM * best // (len(a) * len(b))


class TestKs:
    def test_identical_zero_disjoint_full(self, spark):
        same = [("s", v, i % 2 == 0) for i, v in enumerate([1, 1, 2, 2, 3, 3])]
        disj = [("d", v, False) for v in (1, 2)] + [
            ("d", v, True) for v in (10, 11)
        ]
        df = spark.createDataFrame(
            same + disj, "g string, v long, in_b boolean"
        )
        got = {
            r["g"]: r["d_ppm"]
            for r in ks_2samp(df, ["g"], "v", "in_b").collect()
        }
        assert got["s"] == 0
        assert got["d"] == PPM

    def test_one_empty_sample_null(self, spark):
        df = spark.createDataFrame(
            [("g", 1, False), ("g", 2, False)],
            "g string, v long, in_b boolean",
        )
        r = ks_2samp(df, ["g"], "v", "in_b").collect()[0]
        assert r["n_b"] == 0 and r["d_ppm"] is None

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(-5, 5), st.booleans()),
            min_size=1,
            max_size=50,
        )
    )
    def test_matches_direct_formula(self, spark, vals):
        df = spark.createDataFrame(
            [("g", v, b) for v, b in vals], "g string, v long, in_b boolean"
        )
        got = ks_2samp(df, ["g"], "v", "in_b").collect()[0]
        assert got["d_ppm"] == _ks_direct(vals)


class TestConfusion:
    def test_hallucinated_and_missed_classes_get_rows(self, spark):
        # gold: a,a,b — pred: a,c,c. 'b' never predicted, 'c' never gold.
        df = spark.createDataFrame(
            [("g", "a", "a"), ("g", "a", "c"), ("g", "b", "c")],
            "g string, gold string, pred string",
        )
        got = {
            r["class"]: r
            for r in confusion_metrics(df, ["g"], "gold", "pred").collect()
        }
        assert set(got) == {"a", "b", "c"}
        a, b, c = got["a"], got["b"], got["c"]
        assert (a["tp"], a["fp"], a["fn"]) == (1, 0, 1)
        assert a["precision_ppm"] == PPM and a["recall_ppm"] == PPM // 2
        assert a["f1_ppm"] == 2 * PPM * 1 // 3
        assert (b["tp"], b["fp"], b["fn"]) == (0, 0, 1)
        assert b["precision_ppm"] is None and b["recall_ppm"] == 0
        assert (c["tp"], c["fp"], c["fn"]) == (0, 2, 0)
        assert c["precision_ppm"] == 0 and c["recall_ppm"] is None

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
            min_size=1,
            max_size=60,
        )
    )
    def test_matches_direct_counts(self, spark, pairs):
        df = spark.createDataFrame(
            [("g", a, b) for a, b in pairs],
            "g string, gold string, pred string",
        )
        got = {
            r["class"]: r
            for r in confusion_metrics(df, ["g"], "gold", "pred").collect()
        }
        classes = {a for a, _ in pairs} | {b for _, b in pairs}
        assert set(got) == classes
        for c in classes:
            tp = sum(1 for a, b in pairs if a == c and b == c)
            fp = sum(1 for a, b in pairs if a != c and b == c)
            fn = sum(1 for a, b in pairs if a == c and b != c)
            r = got[c]
            assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
            assert r["f1_ppm"] == (
                2 * PPM * tp // (2 * tp + fp + fn)
                if 2 * tp + fp + fn
                else None
            )


class TestTransitions:
    def test_chain_counts_and_probs(self, spark):
        # user 1: a b a b ; user 2: a a  →  a->b:2, b->a:1, a->a:1
        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
            (2, 1, "a"), (2, 2, "a"),
        ]
        df = spark.createDataFrame(rows, "u long, t long, s string")
        got = {
            (r["prev_state"], r["next_state"]): (r["n_trans"], r["p_ppm"])
            for r in transition_matrix(df, ["u"], "s", ["t"]).collect()
        }
        assert got[("a", "b")] == (2, 2 * PPM // 3)
        assert got[("a", "a")] == (1, PPM // 3)
        assert got[("b", "a")] == (1, PPM)

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 2), st.sampled_from("ab")),
            min_size=2,
            max_size=40,
        )
    )
    def test_row_sums_and_totals(self, spark, rows):
        data = [(u, i, s) for i, (u, s) in enumerate(rows)]
        df = spark.createDataFrame(data, "u long, t long, s string")
        out = transition_matrix(df, ["u"], "s", ["t"]).collect()
        n_chains = len({u for u, _ in rows})
        assert sum(r["n_trans"] for r in out) == len(rows) - n_chains
        by_prev: dict[str, list] = {}
        for r in out:
            by_prev.setdefault(r["prev_state"], []).append(r)
        for rs in by_prev.values():
            assert all(r["n_from"] == sum(x["n_trans"] for x in rs) for r in rs)
            s = sum(r["p_ppm"] for r in rs)
            assert PPM - len(rs) < s <= PPM  # truncation residue only


def _frontier_direct(pts):
    out = []
    for c, g in pts:
        dom = any(
            (c2 <= c and g2 >= g) and (c2 < c or g2 > g) for c2, g2 in pts
        )
        if not dom:
            out.append((c, g))
    return sorted(out)


class TestPareto:
    def test_duplicates_kept_dominated_dropped(self, spark):
        pts = [(1, 5), (1, 5), (2, 5), (2, 7), (3, 6)]
        df = spark.createDataFrame(
            [("g", c, v) for c, v in pts], "g string, cost long, gain long"
        )
        got = sorted(
            (r["cost"], r["gain"])
            for r in pareto_frontier(df, ["g"], "cost", "gain").collect()
        )
        assert got == [(1, 5), (1, 5), (2, 7)]

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 6)),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_brute_force(self, spark, pts):
        df = spark.createDataFrame(
            [("g", c, v) for c, v in pts], "g string, cost long, gain long"
        )
        got = sorted(
            (r["cost"], r["gain"])
            for r in pareto_frontier(df, ["g"], "cost", "gain").collect()
        )
        assert got == _frontier_direct(pts)


class TestBenford:
    def test_constants_sum_exactly(self):
        assert sum(BENFORD_PPM.values()) == PPM

    def test_digits_and_exclusion(self, spark):
        vals = [0.5, 1.0, 19.0, 190.0, 2.5, 999.9]  # 0.5 excluded
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        got = {
            r["digit"]: r
            for r in benford_profile(df, ["g"], "v").collect()
        }
        assert set(got) == {1, 2, 9}
        assert got[1]["n"] == 3 and got[2]["n"] == 1 and got[9]["n"] == 1
        assert got[1]["obs_ppm"] == 3 * PPM // 5
        assert got[1]["benford_ppm"] == 301_030
        assert got[1]["dev_ppm"] == 3 * PPM // 5 - 301_030


def _lift_direct(rows, n_buckets=4):
    """Brute-force decile lift with standard-SQL NTILE semantics."""
    srt = sorted(rows, key=lambda t: (-t[0], t[1]))  # (score, tb, pos)
    n = len(srt)
    base, rem = divmod(n, n_buckets)
    out, i = {}, 0
    for b in range(1, n_buckets + 1):
        size = base + (1 if b <= rem else 0)
        if size == 0:
            continue
        chunk = srt[i: i + size]
        i += size
        out[b] = (len(chunk), sum(p for _, _, p in chunk))
    tot_n = n
    tot_pos = sum(p for _, _, p in rows)
    res = {}
    cum_n = cum_pos = 0
    for b in sorted(out):
        nn, pp = out[b]
        cum_n += nn
        cum_pos += pp
        lift = (
            PPM * cum_pos * tot_n // (cum_n * tot_pos) if tot_pos else None
        )
        res[b] = (nn, pp, PPM * pp // nn, lift)
    return res


class TestDecileLift:
    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 9), st.booleans()),
            min_size=1,
            max_size=50,
        )
    )
    def test_matches_brute_force(self, spark, rows):
        from etl_guiacores_spark.operators.evalmetrics import decile_lift

        data = [("g", s, p, i) for i, (s, p) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "g string, score long, pos boolean, tb long"
        )
        got = {
            r["bucket"]: (r["n"], r["n_pos"], r["rate_ppm"], r["cum_lift_ppm"])
            for r in decile_lift(
                df, ["g"], "score", "pos", "tb", n_buckets=4
            ).collect()
        }
        want = _lift_direct(
            [(s, i, int(p)) for i, (s, p) in enumerate(rows)], 4
        )
        assert got == want

    def test_perfect_ranking_concentrates_lift(self, spark):
        from etl_guiacores_spark.operators.evalmetrics import decile_lift

        # 20 rows, top 5 scores are the 5 positives -> bucket 1 pure
        data = [("g", 100 - i, i < 5, i) for i in range(20)]
        df = spark.createDataFrame(
            data, "g string, score long, pos boolean, tb long"
        )
        got = {
            r["bucket"]: (r["rate_ppm"], r["cum_lift_ppm"])
            for r in decile_lift(
                df, ["g"], "score", "pos", "tb", n_buckets=4
            ).collect()
        }
        assert got[1] == (PPM, 4 * PPM)   # 100% rate, 4x base lift
        assert got[4][0] == 0
        assert got[4][1] == PPM           # full population = base rate


class TestAssocRules:
    def test_counts_and_lift(self, spark):
        # baskets: u1={a,b}, u2={a,b}, u3={a}, u4={c}
        rows = [
            (1, "a"), (1, "b"), (1, "b"),  # duplicate presence collapses
            (2, "a"), (2, "b"),
            (3, "a"),
            (4, "c"),
        ]
        df = spark.createDataFrame(rows, "u long, i string")
        from etl_guiacores_spark.operators.evalmetrics import assoc_rules

        got = {
            (r["antecedent"], r["consequent"]): r
            for r in assoc_rules(df, "u", "i").collect()
        }
        ab = got[("a", "b")]
        assert (ab["n_both"], ab["n_antecedent"], ab["n_consequent"]) == (
            2, 3, 2,
        )
        assert ab["support_ppm"] == 2 * PPM // 4
        assert ab["confidence_ppm"] == 2 * PPM // 3
        assert ab["lift_ppm"] == PPM * 2 * 4 // (3 * 2)
        ba = got[("b", "a")]
        assert ba["confidence_ppm"] == PPM  # every b-basket has a
        assert ("a", "c") not in got  # never co-occur -> no row

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 4), st.sampled_from("abc")),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_brute_force(self, spark, rows):
        from etl_guiacores_spark.operators.evalmetrics import assoc_rules

        df = spark.createDataFrame(rows, "u long, i string")
        got = {
            (r["antecedent"], r["consequent"]): (
                r["n_both"], r["support_ppm"], r["confidence_ppm"],
                r["lift_ppm"],
            )
            for r in assoc_rules(df, "u", "i").collect()
        }
        baskets: dict[int, set[str]] = {}
        for u, i in rows:
            baskets.setdefault(u, set()).add(i)
        nb = len(baskets)
        items = sorted({i for _, i in rows})
        want = {}
        for a in items:
            for c in items:
                if a == c:
                    continue
                n_both = sum(
                    1 for s in baskets.values() if a in s and c in s
                )
                if not n_both:
                    continue
                na = sum(1 for s in baskets.values() if a in s)
                nc = sum(1 for s in baskets.values() if c in s)
                want[(a, c)] = (
                    n_both,
                    PPM * n_both // nb,
                    PPM * n_both // na,
                    PPM * n_both * nb // (na * nc),
                )
        assert got == want


class TestTopPaths:
    def test_prefix_counts_and_rank_tiebreak(self, spark):
        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
            (2, 1, "a"), (2, 2, "b"),
            (3, 1, "a"), (3, 2, "b"), (3, 3, "c"), (3, 4, "d"),
            (4, 1, "z"),
        ]
        df = spark.createDataFrame(rows, "u long, t long, s string")
        from etl_guiacores_spark.operators.evalmetrics import top_paths

        got = [
            (r["path"], r["n_chains"], r["path_rank"])
            for r in top_paths(
                df, ["u"], "s", ["t"], prefix_len=2, top_k=3
            ).collect()
        ]
        got.sort(key=lambda t: t[2])
        # users 1,2,3 open a>b; user 4 opens z
        assert got == [("a>b", 3, 1), ("z", 1, 2)]

    def test_prefix_truncation(self, spark):
        rows = [(1, i, str(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "u long, t long, s string")
        from etl_guiacores_spark.operators.evalmetrics import top_paths

        out = top_paths(df, ["u"], "s", ["t"], prefix_len=3).collect()
        assert out[0]["path"] == "0>1>2"


class TestWeightedMedian:
    def test_unit_weights_are_lower_median(self, spark):
        from etl_guiacores_spark.operators.robust import weighted_median

        df = spark.createDataFrame(
            [("g", v, 1) for v in (1, 2, 3, 4)], "g string, v long, w long"
        )
        r = weighted_median(df, ["g"], "v", "w").collect()[0]
        assert (r["total_weight"], r["wmedian"]) == (4, 2)

    def test_mass_pulls_median(self, spark):
        from etl_guiacores_spark.operators.robust import weighted_median

        # one heavy value dominates half the mass
        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 2, 1), ("g", 100, 2)],
            "g string, v long, w long",
        )
        r = weighted_median(df, ["g"], "v", "w").collect()[0]
        assert (r["total_weight"], r["wmedian"]) == (4, 2)

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 5)),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_brute_force(self, spark, rows):
        from etl_guiacores_spark.operators.robust import weighted_median

        df = spark.createDataFrame(
            [("g", v, w) for v, w in rows], "g string, v long, w long"
        )
        out = weighted_median(df, ["g"], "v", "w").collect()
        tot = sum(w for _, w in rows)
        if tot == 0:
            # zero total mass: every prefix satisfies 2*0 >= 0, so the
            # smallest value wins — degenerate but deterministic
            assert out[0]["wmedian"] == min(v for v, _ in rows)
            return
        cum = 0
        want = None
        for v in sorted({v for v, _ in rows}):
            cum += sum(w for vv, w in rows if vv == v)
            if 2 * cum >= tot:
                want = v
                break
        assert out[0]["wmedian"] == want
        assert out[0]["total_weight"] == tot
