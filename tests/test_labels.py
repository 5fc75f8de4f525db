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
