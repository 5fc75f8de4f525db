"""Decontamination / PII / repetition operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.decontam import (
    contaminated_doc_ids,
    redact_pii,
    repetition_score,
)


class TestDecontamination:
    def test_flags_overlapping_docs_only(self, spark):
        bench = spark.createDataFrame(
            [(100, "the secret benchmark question about spark engines")],
            ["doc_id", "text"],
        )
        docs = spark.createDataFrame(
            [
                (1, "totally unrelated content here with no overlap at all"),
                (2, "leaked copy of the secret benchmark question about spark"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["n_overlapping_ngrams"]
               for r in contaminated_doc_ids(docs, bench).collect()}
        assert 2 in got and got[2] >= 3
        assert 1 not in got


class TestPiiRedaction:
    def test_redacts_each_kind(self, spark):
        vals = [
            "mail me at a.b+c@foo.com.ar thanks",
            "call +54 299 471-2345 today",
            "order 12345678 shipped",
            "clean text stays",
        ]
        df = spark.createDataFrame([(v,) for v in vals], ["t"])
        got = [r[0] for r in df.select(redact_pii(F.col("t"))).collect()]
        assert got[0] == "mail me at [EMAIL] thanks"
        assert got[1] == "call [PHONE] today"
        assert got[2] == "order [NUM] shipped"
        assert got[3] == "clean text stays"


class TestRepetition:
    def test_scores(self, spark):
        df = spark.createDataFrame(
            [("a b c d e f g h",), ("x y x y x y x y x y",), ("a b",)], ["t"]
        )
        got = [r[0] for r in df.select(repetition_score(F.col("t"))).collect()]
        assert got[0] == 0.0          # all distinct 3-grams
        assert got[1] > 0.5           # degenerate loop
        assert got[2] is None         # too short
