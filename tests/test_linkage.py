"""Fuzzy record linkage: blocked Levenshtein pairs + entity resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.linkage import (
    default_block_key,
    fuzzy_match_pairs,
    resolve_entities,
)


def _biz(spark):
    rows = [
        (1, "panaderia san juan"),
        (2, "panaderia san juan srl"),   # dist 4 from 1 -> match
        (3, "panaderia central"),        # same block, too far from 1/2
        (4, "ferreteria lopez"),
        (5, "ferreteria lopes"),         # dist 1 from 4 -> match
        (6, "kiosco 24"),
        (7, None),                       # NULL name: dropped from blocking
    ]
    return spark.createDataFrame(rows, "id long, name string")


class TestFuzzyMatchPairs:
    def test_known_pairs_and_distances(self, spark):
        out = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_match_pairs(_biz(spark), "id", "name", max_dist=5).collect()
        }
        assert out == {(1, 2): 4, (4, 5): 1}

    def test_blocking_prevents_cross_block_pairs(self, spark):
        """'kiosco 24' vs 'kiosko 24' is dist 1 but different first
        token -> different block -> never compared. This is the
        deliberate recall trade of blocking."""
        df = spark.createDataFrame(
            [(1, "kiosco 24"), (2, "kiosko 24")], "id long, name string"
        )
        assert fuzzy_match_pairs(df, "id", "name", max_dist=5).count() == 0

    def test_custom_block_key_restores_recall(self, spark):
        df = spark.createDataFrame(
            [(1, "kiosco 24"), (2, "kiosko 24")], "id long, name string"
        )
        # a stronger key (2-char prefix) puts both in one block
        key = F.substring(F.lower(F.col("name")), 1, 2)
        out = fuzzy_match_pairs(df, "id", "name", max_dist=5, block_key=key).collect()
        assert [(r["id_a"], r["id_b"], r["dist"]) for r in out] == [(1, 2, 1)]

    def test_length_prefilter_is_lossless(self, spark):
        """A pair removed by the length filter must also fail the
        distance test (|len diff| <= edit distance always)."""
        df = spark.createDataFrame(
            [(1, "shop"), (2, "shop with a very long suffix")],
            "id long, name string",
        )
        key = F.lit("same")
        assert fuzzy_match_pairs(df, "id", "name", max_dist=5, block_key=key).count() == 0


class TestResolveEntities:
    def test_transitive_closure_and_singletons(self, spark):
        """b matches a and c but a-c are >max_dist apart: one entity
        anyway (transitivity is the point of the cluster stage)."""
        df = spark.createDataFrame(
            [
                (10, "zapateria aaaa"),
                (11, "zapateria aabb"),   # dist 2 from 10, dist 2 from 12
                (12, "zapateria bbbb"),   # dist 4 from 10 — still linked via 11
                (20, "libreria sur"),
            ],
            "id long, name string",
        )
        out = {r["id"]: r["entity_id"] for r in
               resolve_entities(df, "id", "name", max_dist=3).collect()}
        assert out == {10: 10, 11: 10, 12: 10, 20: 20}

    def test_null_names_stay_singleton(self, spark):
        out = {r["id"]: r["entity_id"] for r in
               resolve_entities(_biz(spark), "id", "name", max_dist=5).collect()}
        assert out[7] == 7  # NULL name: no block, no edges, own entity
        assert out[1] == out[2] == 1 and out[4] == out[5] == 4


def test_default_block_key(spark):
    df = spark.createDataFrame([("  Panaderia San Juan ",)], "name string")
    assert df.select(default_block_key(F.col("name")).alias("k")).first()["k"] == "panaderia"


class TestQgramMatchPairs:
    def test_lossless_superset_of_blocking(self, spark):
        """'kiosco 24' vs 'kiosko 24' (dist 1, different first token)
        is invisible to the blocking path but MUST be found by the
        q-gram count filter."""
        from etl_guiacores_spark.operators.linkage import (
            fuzzy_match_pairs,
            qgram_match_pairs,
        )

        df = spark.createDataFrame(
            [
                (1, "kiosco 24"),
                (2, "kiosko 24"),
                (3, "panaderia san juan"),
                (4, "panaderia san juam"),
                (5, "totally unrelated place"),
            ],
            "id long, name string",
        )
        qg = {(r["id_a"], r["id_b"]): r["dist"]
              for r in qgram_match_pairs(df, "id", "name", max_dist=3).collect()}
        blocked = {(r["id_a"], r["id_b"]): r["dist"]
                   for r in fuzzy_match_pairs(df, "id", "name", max_dist=3).collect()}
        assert qg == {(1, 2): 1, (3, 4): 1}
        assert set(blocked) <= set(qg)          # blocking is a subset
        assert (1, 2) not in blocked            # the recall gap, proven

    def test_exhaustive_against_brute_force(self, spark):
        """Every brute-force pair within max_dist must appear with the
        same distance — the lossless contract on a random-ish set."""
        from etl_guiacores_spark.operators.linkage import qgram_match_pairs

        names = [
            "abcd", "abce", "abde", "xyzw", "xyzv", "mnopq", "mnopr",
            "short", "shirt", "shore", "completely different", "abcd",
        ]
        df = spark.createDataFrame(list(enumerate(names)), "id long, name string")

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        k = 2
        expect = {
            (i, j): lev(a, b)
            for i, a in enumerate(names)
            for j, b in enumerate(names)
            if i < j and lev(a, b) <= k
        }
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in qgram_match_pairs(df, "id", "name", max_dist=k).collect()}
        assert got == expect

    def test_short_strings_previous_losslessness_hole(self, spark):
        """Round-4 verdict/advice hole: pairs whose count bound is
        non-positive share zero q-grams and were silently missed —
        'abc'/'cba' (dist 2, disjoint bigrams), 'ab'/'ba' (dist 2),
        and single-char names (no bigrams at all). All must pair via
        the short-string fallback now."""
        from etl_guiacores_spark.operators.linkage import qgram_match_pairs

        df = spark.createDataFrame(
            [(1, "abc"), (2, "cba"), (3, "ab"), (4, "ba"), (5, "x"), (6, "y")],
            "id long, name string",
        )
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in qgram_match_pairs(df, "id", "name", max_dist=3).collect()}
        assert got[(1, 2)] == 2      # disjoint bigram sets
        assert got[(3, 4)] == 2      # bound vacuous at len 2
        assert got[(5, 6)] == 1      # len < q: no grams, fallback only
        # duplicates would break the driver's hash compare
        pairs = qgram_match_pairs(df, "id", "name", max_dist=3)
        assert pairs.count() == pairs.distinct().count()

    def test_brute_force_over_short_random_strings(self, spark):
        """Lossless contract swept over lengths 0..6 at max_dist 1..3
        — exactly the region where the count bound is vacuous and the
        fallback path carries the guarantee. Includes duplicate and
        empty names."""
        import itertools
        import random

        from etl_guiacores_spark.operators.linkage import qgram_match_pairs

        rng = random.Random(1105)
        names = [""] + [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        names += names[:5]  # duplicates: same-name ids must pair at dist 0
        df = spark.createDataFrame(list(enumerate(names)), "id long, name string")

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        for k in (1, 2, 3):
            expect = {
                (i, j): lev(a, b)
                for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
                if lev(a, b) <= k
            }
            got = {(r["id_a"], r["id_b"]): r["dist"]
                   for r in qgram_match_pairs(df, "id", "name", max_dist=k).collect()}
            assert got == expect, f"max_dist={k}"

    def test_max_posting_freq_cap_completes_and_logs(self, spark, caplog):
        """Hot-gram input with the stop-gram cap: the join completes,
        the drop is LOGGED (no silent caps), and pairs recoverable
        from non-hot postings survive."""
        import logging

        from etl_guiacores_spark.operators.linkage import qgram_match_pairs

        # every name shares the hot prefix 'aaaaaaaaaa'; suffixes differ
        rows = [(i, "aaaaaaaaaa" + s) for i, s in enumerate(
            ["xyzw", "xyzv", "qrst", "qrsu", "mnop"]
        )]
        df = spark.createDataFrame(rows, "id long, name string")
        uncapped = {(r["id_a"], r["id_b"]) for r in
                    qgram_match_pairs(df, "id", "name", max_dist=1).collect()}
        with caplog.at_level(logging.WARNING,
                             logger="etl_guiacores_spark.operators.linkage"):
            capped = {(r["id_a"], r["id_b"]) for r in
                      qgram_match_pairs(df, "id", "name", max_dist=1,
                                        max_posting_freq=3).collect()}
        assert uncapped == {(0, 1), (2, 3)}
        # the 'aa' postings (freq 5 > 3) are dropped and the drop is logged
        assert any("hot postings" in r.message for r in caplog.records)
        # distinguishing suffix grams are not hot, so recall survives here
        assert capped == uncapped

    def test_resolve_entities_qgram_method(self, spark):
        """The lossless pairer merges the cross-block pair blocking
        misses, changing the entity structure accordingly."""
        from etl_guiacores_spark.operators.linkage import resolve_entities

        df = spark.createDataFrame(
            [(1, "kiosco 24"), (2, "kiosko 24"), (3, "libreria sur")],
            "id long, name string",
        )
        blocked = {r["id"]: r["entity_id"]
                   for r in resolve_entities(df, "id", "name", max_dist=3).collect()}
        qg = {r["id"]: r["entity_id"]
              for r in resolve_entities(df, "id", "name", max_dist=3, method="qgram").collect()}
        assert blocked == {1: 1, 2: 2, 3: 3}   # blocking misses 1-2
        assert qg == {1: 1, 2: 1, 3: 3}        # qgram merges them


class TestGoldenRecord:
    def test_mode_recency_and_provenance(self, spark):
        from datetime import datetime
        from etl_guiacores_spark.operators.linkage import golden_record

        rows = [
            # entity 1: mode 'a' (2 vs 1), latest non-null value at t3
            (1, "a", 10.0, datetime(2024, 1, 1, 0, 0), 1),
            (1, "a", 20.0, datetime(2024, 1, 2, 0, 0), 2),
            (1, "b", None, datetime(2024, 1, 3, 0, 0), 3),  # null never wins
            # entity 2: tie 'x'/'y' -> lexicographic min 'x'
            (2, "y", 5.0, datetime(2024, 1, 1, 0, 0), 4),
            (2, "x", 7.0, datetime(2024, 1, 1, 0, 0), 5),
        ]
        df = spark.createDataFrame(
            rows, ["uid", "etype", "value", "ts", "eid"]
        )
        got = {
            r["uid"]: r
            for r in golden_record(
                df, "uid", "etype", "value", "ts", "eid"
            ).collect()
        }
        assert got[1]["top_value"] == "a" and got[1]["top_value_n"] == 2
        assert got[1]["latest_value"] == 20.0  # t3's null skipped
        assert got[1]["n_records"] == 3
        assert got[2]["top_value"] == "x"  # deterministic tiebreak
        assert got[2]["latest_value"] == 7.0  # same ts -> higher eid

    def test_all_mode_null_entity_keeps_provenance(self, spark):
        from datetime import datetime
        from etl_guiacores_spark.operators.linkage import golden_record

        df = spark.createDataFrame(
            [(1, None, 3.0, datetime(2024, 1, 1), 1)],
            "uid long, etype string, value double, ts timestamp, eid long",
        )
        r = golden_record(df, "uid", "etype", "value", "ts", "eid").collect()[0]
        assert r["top_value"] is None and r["n_records"] == 1
        assert r["latest_value"] == 3.0
