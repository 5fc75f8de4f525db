"""Chunking / vocabulary operators."""

from __future__ import annotations

import pytest

from etl_guiacores_spark.operators.chunking import build_vocab, chunk_documents, chunk_spans


def test_chunking_windows_and_overlap(spark):
    text = " ".join(str(i) for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in rows] == ["0 1 2 3", "3 4 5 6", "6 7 8 9"]
    assert [r["start_token"] for r in rows] == [1, 4, 7]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]


def test_blank_and_null_text_yield_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None), (4, "   ")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(1, "a b")]


def test_overlap_validation():
    with pytest.raises(ValueError):
        from pyspark.sql import functions as F

        chunk_spans(F.lit("x"), chunk_tokens=4, overlap=4)


def test_vocab_deterministic_ranking(spark):
    df = spark.createDataFrame(
        [(1, "b a a"), (2, "b c  a")], ["doc_id", "text"]
    )
    got = [(r["token"], r["count"], r["rank"]) for r in
           build_vocab(df).orderBy("rank").collect()]
    assert got == [("a", 3, 1), ("b", 2, 2), ("c", 1, 3)]
