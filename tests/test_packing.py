"""Sequence packing: budget respected, nothing lost, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.chunking import chunk_documents
from etl_guiacores_spark.operators.packing import pack_chunks
from etl_guiacores_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_packing_budget_and_conservation(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text").filter(
        F.length(F.trim("text")) > 0
    )
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=0)
    total_tokens = chunks.agg(F.sum("n_chunk_tokens")).collect()[0][0]

    packed = pack_chunks(chunks, budget_tokens=128, num_bins=8)
    rows = packed.collect()
    # every sequence within budget (single oversized chunks would be the
    # only exception; chunk_tokens=32 < 128 rules that out)
    assert all(r["n_tokens"] <= 128 for r in rows)
    # token conservation: packing rearranges, never drops
    assert sum(r["n_tokens"] for r in rows) == total_tokens
    # most sequences are well-filled (greedy first-fit quality floor)
    full = [r for r in rows if r["n_tokens"] >= 96]
    assert len(full) >= len(rows) * 0.5

    again = pack_chunks(chunks, budget_tokens=128, num_bins=8).collect()
    key = lambda rs: sorted((r["bin_id"], r["seq_id"], r["n_tokens"]) for r in rs)
    assert key(rows) == key(again)  # deterministic


def test_packing_preserves_document_order(spark):
    """Chunks pack in chunk_idx order, not alphabetical-text order
    (regression: sorting by text scrambled within-doc token order)."""
    chunks = spark.createDataFrame(
        # text sorts alphabetically as zebra < apple is False: apple < zebra,
        # so idx order (zebra first) differs from text order
        [(1, 0, "zebra one", 2), (1, 1, "apple two", 2), (1, 2, "mango three", 2)],
        ["doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens"],
    )
    packed = pack_chunks(chunks, budget_tokens=100, num_bins=1)
    rows = packed.collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "zebra one apple two mango three"
