"""Sequence packing: greedy-fill chunks into fixed token budgets.

Pretraining consumes fixed-length sequences; short documents waste
budget unless packed. Packing is inherently sequential, so it can't
be a pure column expression — the engine shape is:

1. distribute chunks across ``num_bins`` hash buckets (a shuffle on
   the bucket key — each bucket packs independently and in parallel),
2. greedy first-fit WITHIN each bucket via ``applyInPandas`` (the
   per-group sequential part, Arrow-batched).

Packing quality loses only at bucket boundaries (<= num_bins
partially-filled final sequences), while parallelism scales with
num_bins — the standard trade at corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("bin_id", T.IntegerType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("text", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 512,
    num_bins: int = 32,
    id_col: str = "doc_id",
    text_col: str = "chunk_text",
    count_col: str = "n_chunk_tokens",
    order_col: str = "chunk_idx",
    bin_expr: Column | None = None,
) -> DataFrame:
    """(doc chunks) -> packed training sequences <= budget_tokens.

    Deterministic: bucket assignment hashes the doc id, and packing
    order within a bucket is (doc_id, chunk_idx) — within-document
    token order is preserved in the packed text. When ``order_col``
    is absent from the input, falls back to (doc_id, text) order
    (deterministic but not position-aware).

    Contract caveat: a SINGLE chunk larger than ``budget_tokens``
    cannot be split here (chunking owns token boundaries) and is
    emitted as its own over-budget pack — size the upstream chunker's
    ``chunk_tokens`` <= ``budget_tokens`` (the pipeline default does),
    or filter ``n_tokens > budget`` packs downstream.

    ``bin_expr`` overrides the bucket assignment (must evaluate to an
    int in [0, num_bins)). The default Murmur3 hash spreads skewed id
    spaces well but is Spark-specific; pass e.g.
    ``F.pmod(F.col("doc_id"), F.lit(num_bins))`` when the packing must
    be reproducible by another engine (the cross-engine oracle case).
    """
    sort_key = order_col if order_col in chunks.columns else text_col

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, sort_key]).reset_index(drop=True)
        bin_id = int(pdf["__bin"].iloc[0])
        out, cur_ids, cur_txt, cur_n, seq = [], [], [], 0, 0
        # zip over plain-python column lists, not iterrows(): the greedy
        # fill is the one legitimately-Python leg, and per-row Series
        # construction was ~5-10x of its runtime
        for did, txt, n in zip(
            pdf[id_col].tolist(), pdf[text_col].tolist(), pdf[count_col].tolist()
        ):
            n = int(n)
            if cur_n and cur_n + n > budget_tokens:
                out.append((bin_id, seq, cur_ids, " ".join(cur_txt), cur_n))
                seq, cur_ids, cur_txt, cur_n = seq + 1, [], [], 0
            cur_ids.append(int(did))
            cur_txt.append(str(txt))
            cur_n += n
        if cur_n:
            out.append((bin_id, seq, cur_ids, " ".join(cur_txt), cur_n))
        return pd.DataFrame(out, columns=[f.name for f in PACKED_SCHEMA.fields])

    # pmod, not abs(hash) % n: hash covers the full int32 range and
    # abs(Int.MIN_VALUE) overflows under ANSI — near-certain to occur
    # somewhere in a billions-of-rows corpus
    if bin_expr is None:
        bin_expr = F.pmod(F.hash(F.col(id_col)), F.lit(num_bins))
    bucketed = chunks.withColumn("__bin", bin_expr.cast("int"))
    return bucketed.groupBy("__bin").applyInPandas(pack, PACKED_SCHEMA)


# applyInPandas closures travel by value (see shipping.py)
import sys as _sys  # noqa: E402

from etl_guiacores_spark import shipping as _shipping  # noqa: E402

_shipping.register_udf_module(_sys.modules[__name__])
