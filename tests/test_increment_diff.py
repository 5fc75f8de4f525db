"""Incremental near-dup (batch vs history) and snapshot CDC diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.scd import snapshot_diff
from etl_guiacores_spark.operators.similarity import (
    lsh_collision_flags,
    lsh_candidate_pairs,
    staged_minhash_shingles,
)

TEXTS = [
    (i, f"alpha beta gamma delta epsilon zeta token{i % 4} end of doc")
    for i in range(20)
] + [(100 + i, f"totally unrelated content number {i} nothing shared here at all xyz{i}") for i in range(5)]


def _docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


class TestIncrementalNearDup:
    def test_matches_full_selfjoin_cross_pairs(self, spark):
        """Flags must equal the cross-(batch,history) slice of the full
        corpus self-join, with dup_of = min history partner."""
        d = _docs(spark)
        new = d.filter(F.col("doc_id") % 5 == 0)
        hist = d.filter(F.col("doc_id") % 5 != 0)
        got = {
            r["doc_id"]: r["dup_of"]
            for r in lsh_collision_flags(new, hist).collect()
        }
        pairs = lsh_candidate_pairs(d, "doc_id", "text").collect()
        new_ids = {r[0] for r in TEXTS if r[0] % 5 == 0}
        want: dict[int, int] = {}
        for r in pairs:
            for a, b in ((r["id_a"], r["id_b"]), (r["id_b"], r["id_a"])):
                if a in new_ids and b not in new_ids:
                    want[a] = min(want.get(a, b), b)
        assert got == want
        # history-internal duplicates are never reported
        assert all(k in new_ids for k in got)

    def test_staged_signature_history_identical(self, spark):
        d = _docs(spark)
        new = d.filter(F.col("doc_id") % 5 == 0)
        hist = d.filter(F.col("doc_id") % 5 != 0)
        fresh = sorted(map(tuple, lsh_collision_flags(new, hist).collect()))
        staged = staged_minhash_shingles(hist, "doc_id", "text")
        try:
            reused = sorted(
                map(tuple, lsh_collision_flags(new, staged).collect())
            )
        finally:
            staged.unpersist()
        assert fresh == reused

    def test_shuffle_mode_identical_and_empty_batch(self, spark):
        d = _docs(spark)
        new = d.filter(F.col("doc_id") % 5 == 0)
        hist = d.filter(F.col("doc_id") % 5 != 0)
        a = sorted(map(tuple, lsh_collision_flags(new, hist).collect()))
        b = sorted(
            map(
                tuple,
                lsh_collision_flags(new, hist, broadcast_new=False).collect(),
            )
        )
        assert a == b
        assert lsh_collision_flags(new.limit(0), hist).count() == 0


class TestSnapshotDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
            "k long, s string, v long",
        )
        new = spark.createDataFrame(
            [(2, "b", 21), (3, "c", None), (4, "d", 40), (5, "e", 50)],
            "k long, s string, v long",
        )
        return old, new

    def test_classification(self, spark):
        old, new = self._frames(spark)
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
        }
        # 1 removed, 2 changed (20->21), 3 unchanged (NULL <=> NULL),
        # 4 unchanged, 5 added
        assert got == {1: "removed", 2: "changed", 5: "added"}

    def test_include_unchanged_covers_all_keys(self, spark):
        old, new = self._frames(spark)
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff(
                old, new, ["k"], ["s", "v"], include_unchanged=True
            ).collect()
        }
        assert got[3] == "unchanged" and got[4] == "unchanged"
        assert set(got) == {1, 2, 3, 4, 5}

    def test_null_to_value_is_changed(self, spark):
        old = spark.createDataFrame([(1, None)], "k long, v string")
        new = spark.createDataFrame([(1, "x")], "k long, v string")
        rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
        assert [(r["k"], r["change_type"]) for r in rows] == [(1, "changed")]

    def test_null_keys_match_null_safely(self, spark):
        """A NULL-keyed entity present in both snapshots must classify
        as changed/unchanged — never phantom removed+added (the join is
        eqNullSafe; presence comes from literal markers, not key
        null-ness). Composite keys with a NULL first column likewise."""
        old = spark.createDataFrame(
            [(None, "a"), (1, "b")], "k long, v string"
        )
        new = spark.createDataFrame(
            [(None, "z"), (1, "b")], "k long, v string"
        )
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff(
                old, new, ["k"], ["v"], include_unchanged=True
            ).collect()
        }
        assert got == {None: "changed", 1: "unchanged"}

        old2 = spark.createDataFrame(
            [(None, "x", 5)], "k1 long, k2 string, v long"
        )
        new2 = spark.createDataFrame(
            [(None, "x", 5)], "k1 long, k2 string, v long"
        )
        rows = snapshot_diff(
            old2, new2, ["k1", "k2"], ["v"], include_unchanged=True
        ).collect()
        assert [(r["k1"], r["k2"], r["change_type"]) for r in rows] == [
            (None, "x", "unchanged")
        ]

    def test_compound_key(self, spark):
        old = spark.createDataFrame(
            [(1, "x", 5), (1, "y", 6)], "k1 long, k2 string, v long"
        )
        new = spark.createDataFrame(
            [(1, "x", 5), (1, "z", 7)], "k1 long, k2 string, v long"
        )
        got = {
            (r["k1"], r["k2"]): r["change_type"]
            for r in snapshot_diff(old, new, ["k1", "k2"], ["v"]).collect()
        }
        assert got == {(1, "y"): "removed", (1, "z"): "added"}


def test_collision_flags_broadcasts_the_batch(spark):
    """The 100 TB contract: with broadcast_new (default) the HISTORY
    side must never plan a join-key exchange — the batch broadcasts."""
    d = _docs(spark)
    new = d.filter(F.col("doc_id") % 5 == 0)
    hist = d.filter(F.col("doc_id") % 5 != 0)
    plan = (
        lsh_collision_flags(new, hist)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(__band" not in plan
