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


# --- padding-waste report -----------------------------------------------------

def test_padding_waste_strategies_ordered_and_exact(spark):
    import pytest

    from etl_guiacores_spark.operators.packing import padding_waste_report

    rows = [(i, l) for i, l in enumerate([10, 20, 100, 200, 500, 512, 600])]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {r["strategy"]: r for r in
           padding_waste_report(df, "n", "doc_id", max_len=512,
                                batch_size=2).collect()}
    assert set(got) == {"pad_to_max", "pow2_bucket", "sorted_batch",
                        "packed_lower_bound"}
    total = 10 + 20 + 100 + 200 + 500 + 512 + 512  # 600 clipped
    assert all(r["total_tokens"] == total for r in got.values())
    assert got["pad_to_max"]["padded_tokens"] == 7 * 512
    # pow2: 16,32,128,256,512,512,512
    assert got["pow2_bucket"]["padded_tokens"] == 16 + 32 + 128 + 256 + 512 * 3
    # sorted desc: [512,512],[500,200],[100,20],[10] -> 1024+1000+200+10
    assert got["sorted_batch"]["padded_tokens"] == 1024 + 1000 + 200 + 10
    assert got["packed_lower_bound"]["padded_tokens"] == \
        (total + 511) // 512 * 512
    # guaranteed bounds: every strategy pads (>= total), pad-to-max is
    # the ceiling, and the packing floor bounds the other FIXED-row
    # strategy. pow2/sorted emit variable-length rows, so they can
    # undercut the packing floor (pow2 does here: 1968 < 2048) and
    # have no fixed order between themselves — that's what the
    # report is for.
    hi = got["pad_to_max"]["padded_tokens"]
    for s in ("pow2_bucket", "sorted_batch", "packed_lower_bound"):
        assert total <= got[s]["padded_tokens"] <= hi
    with pytest.raises(ValueError):
        padding_waste_report(df, "n", "doc_id", max_len=100)
    with pytest.raises(ValueError):
        padding_waste_report(df, "n", "doc_id", batch_size=0)


def test_padding_waste_string_and_huge_ids(spark):
    # Regression for the arithmetic rank key `(max_len - l)*10^12 + id`:
    # a STRING id cast to NULL decimal (nondeterministic ranking) and an
    # id >= 10^12 bled into the next length band. The struct key must
    # give the same sorted-batch result for string, huge-numeric, and
    # small-numeric ids over the same lengths.
    from etl_guiacores_spark.operators.packing import padding_waste_report

    lens = [10, 20, 100, 200, 500, 512, 600]
    expect_sorted = 1024 + 1000 + 200 + 10

    small = spark.createDataFrame(
        list(enumerate(lens)), "doc_id long, n long"
    )
    huge = spark.createDataFrame(
        [(10**13 + i, l) for i, l in enumerate(lens)], "doc_id long, n long"
    )
    strs = spark.createDataFrame(
        [(f"doc-{i}", l) for i, l in enumerate(lens)],
        "doc_id string, n long",
    )
    for df in (small, huge, strs):
        got = {
            r["strategy"]: r
            for r in padding_waste_report(
                df, "n", "doc_id", max_len=512, batch_size=2
            ).collect()
        }
        assert got["sorted_batch"]["padded_tokens"] == expect_sorted
        assert got["sorted_batch"]["n_seqs"] == 7
