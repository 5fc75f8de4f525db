"""Label aggregation + temporal split: determinism of tie-breaks and
the no-future-leakage property."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_majority_label_tiebreak_and_agreement(spark):
    from etl_guiacores_spark.operators.labels import majority_label

    rows = (
        [(1, "pos")] * 3 + [(1, "neg")] * 2
        + [(2, "b")] * 2 + [(2, "a")] * 2  # tie -> lexicographic 'a'
        + [(3, "only")]
    )
    df = spark.createDataFrame(rows, "example long, label string")
    got = {r["example"]: r for r in majority_label(df, "example", "label").collect()}
    assert got[1]["label"] == "pos" and got[1]["votes_top"] == 3
    assert got[1]["votes_total"] == 5 and got[1]["n_labels"] == 2
    assert got[1]["agreement_ppm"] == 600_000
    assert got[2]["label"] == "a" and got[2]["agreement_ppm"] == 500_000
    assert got[3]["label"] == "only" and got[3]["agreement_ppm"] == 1_000_000


def test_temporal_split_never_leaks_future_and_covers_entities(spark):
    from etl_guiacores_spark.operators.sampling import temporal_split

    rows = [
        (u, t, u * 100 + t) for u in range(7) for t in range(1, 1 + u * 3 + 1)
    ]
    df = spark.createDataFrame(rows, "user long, ts long, event_id long")
    out = temporal_split(df, "user", "ts", test_ppm=200_000,
                         tiebreak_col="event_id").collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["ts"])
        n = len(rs)
        # every train ts strictly precedes every test ts
        max_train = max((r["ts"] for r in rs if r["split"] == "train"), default=None)
        min_test = min(r["ts"] for r in rs if r["split"] == "test")
        if max_train is not None:
            assert max_train < min_test
        # exact test count = ceil(n * 0.2), and >= 1
        want_test = -(-n * 200_000 // 1_000_000)
        assert sum(r["split"] == "test" for r in rs) == max(want_test, 1)

    # test_ppm = 0 -> everything trains
    all_train = temporal_split(df, "user", "ts", test_ppm=0,
                               tiebreak_col="event_id")
    assert all_train.filter(F.col("split") == "test").count() == 0


class TestCohenKappa:
    def _run(self, spark, rows):
        from etl_guiacores_spark.operators.labels import cohen_kappa

        df = spark.createDataFrame(rows, "g string, a string, b string")
        return {
            r["g"]: (r["n_items"], r["n_agree"], r["kappa_ppm"])
            for r in cohen_kappa(df, ["g"], "a", "b").collect()
        }

    def test_perfect_and_textbook(self, spark):
        rows = [("p", "x", "x")] * 7 + [("p", "y", "y")] * 3
        # textbook 2x2: [[20,5],[10,15]] -> kappa = 0.4 exactly
        rows += (
            [("t", "x", "x")] * 20 + [("t", "x", "y")] * 5
            + [("t", "y", "x")] * 10 + [("t", "y", "y")] * 15
        )
        got = self._run(spark, rows)
        assert got["p"] == (10, 10, 1_000_000)
        assert got["t"] == (50, 35, 400_000)

    def test_degenerate_and_negative(self, spark):
        # both raters constant -> p_e = 1 -> NULL
        rows = [("c", "x", "x")] * 5
        # perfect disagreement [[0,10],[10,0]] -> kappa = -1 exactly
        rows += [("n", "x", "y")] * 10 + [("n", "y", "x")] * 10
        # fractional negative [[1,4],[3,1]] -> -22/41 -> truncates
        # toward zero to -536585 (floor would give -536586) — pins the
        # engine-matching truncation semantics on negatives
        rows += (
            [("f", "x", "x")] * 1 + [("f", "x", "y")] * 4
            + [("f", "y", "x")] * 3 + [("f", "y", "y")] * 1
        )
        got = self._run(spark, rows)
        assert got["c"] == (5, 5, None)
        assert got["n"] == (20, 0, -1_000_000)
        assert got["f"] == (9, 2, -536_585)
