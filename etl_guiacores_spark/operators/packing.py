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

def padding_waste_report(
    df: DataFrame,
    len_col: str,
    id_col: str,
    max_len: int = 512,
    batch_size: int = 32,
) -> DataFrame:
    """Padding-waste accounting across batching strategies — the
    sizing study a training pipeline runs before choosing how to
    batch variable-length sequences (padding is pure wasted FLOPs;
    at 100 TB the difference between pad-to-max and length-sorted
    batching is a double-digit compute percentage).

    Four strategies, one report row each (lengths CLIPPED at
    ``max_len``; splitting overflow into chunks is q44's job):

    - ``pad_to_max``: every sequence padded to ``max_len`` — the
      naive collator.
    - ``pow2_bucket``: padded to the next power of two (min 16, cap
      ``max_len``) — static bucketing, kernel-cache friendly.
    - ``sorted_batch``: global sort by length desc, fixed
      ``batch_size`` batches, each padded to its batch max — the
      standard length-sorted collator. The global ordering uses the
      q80 dense-ids range exchange (local ranks + broadcast offsets,
      NO single-reducer stage); ties break by ``id_col``.
    - ``packed_lower_bound``: ceil(total/max_len)*max_len — what
      perfect sample packing (q66) into FIXED max_len rows would
      cost. A floor for pad_to_max (which also emits fixed rows),
      NOT for pow2/sorted batching: those emit shorter rows, so
      their padded totals can undercut it. The only universal floor
      is total_tokens itself.

    All integer arithmetic; waste_ppm = (padded-total)*1e6 div
    padded. ``max_len`` must be a power of two >= 16 (the bucket
    ladder's contract).

    Returns (strategy, n_seqs, total_tokens, padded_tokens,
    waste_ppm).
    """
    from etl_guiacores_spark.operators.ordering import dense_ids

    if max_len < 16 or max_len & (max_len - 1):
        raise ValueError("max_len must be a power of two >= 16")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    clip = F.least(F.col(len_col).cast("long"), F.lit(max_len))
    base = df.select(
        F.col(id_col).alias("__id"), clip.alias("__l")
    )
    # pow2 ladder (engine-independent; no float log2 at boundaries)
    buckets = [16]
    while buckets[-1] < max_len:
        buckets.append(buckets[-1] * 2)
    pow2 = F.lit(buckets[0])
    for b in buckets[1:]:
        pow2 = F.when(F.col("__l") > b // 2, F.lit(b)).otherwise(pow2)

    def _report(name: str, padded_agg, src: DataFrame) -> DataFrame:
        return src.groupBy().agg(
            F.lit(name).alias("strategy"),
            F.count("*").cast("long").alias("n_seqs"),
            F.coalesce(F.sum("__l"), F.lit(0)).cast("long").alias(
                "total_tokens"
            ),
            padded_agg.cast("long").alias("padded_tokens"),
        )

    pad_max = _report(
        "pad_to_max", F.count("*") * max_len, base
    )
    pad_pow2 = _report(
        "pow2_bucket",
        F.coalesce(F.sum(pow2), F.lit(0)),
        base,
    )
    # Rank key as a STRUCT (length-gap, id) ordered lexicographically —
    # not an arithmetic packed key: the old `(max_len - __l) * 10^12 +
    # __id` assumed a numeric id below 10^12 (a string id cast to NULL
    # decimal => nondeterministic ranking; an id >= 10^12 bled into the
    # next length band). Struct ordering is exact for any orderable id
    # type, and dense_ids range-partitions on the struct directly.
    ranked = dense_ids(
        base.withColumn(
            "__k",
            F.struct(
                (F.lit(max_len) - F.col("__l")).cast("long").alias("g"),
                F.col("__id").alias("i"),
            ),
        ),
        "__k",
        id_name="__rank",
    ).withColumn("__batch", F.expr(f"(__rank - 1) div {batch_size}"))
    per_batch = ranked.groupBy("__batch").agg(
        F.count("*").cast("long").alias("__n"),
        F.max("__l").alias("__bmax"),
        F.sum("__l").cast("long").alias("__btok"),
    )
    pad_sorted = per_batch.groupBy().agg(
        F.lit("sorted_batch").alias("strategy"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_seqs"),
        F.coalesce(F.sum("__btok"), F.lit(0)).cast("long").alias(
            "total_tokens"
        ),
        F.coalesce(F.sum(F.col("__n") * F.col("__bmax")), F.lit(0))
        .cast("long")
        .alias("padded_tokens"),
    )
    lower = base.groupBy().agg(
        F.lit("packed_lower_bound").alias("strategy"),
        F.count("*").cast("long").alias("n_seqs"),
        F.coalesce(F.sum("__l"), F.lit(0)).cast("long").alias(
            "total_tokens"
        ),
        F.expr(
            f"CAST((coalesce(sum(__l), 0) + {max_len} - 1) "
            f"div {max_len} * {max_len} AS BIGINT)"
        ).alias("padded_tokens"),
    )
    out = pad_max.unionByName(pad_pow2).unionByName(pad_sorted).unionByName(
        lower
    )
    return out.withColumn(
        "waste_ppm",
        F.expr(
            "CAST((padded_tokens - total_tokens) * 1000000 "
            "div NULLIF(padded_tokens, 0) AS BIGINT)"
        ),
    )


import sys as _sys  # noqa: E402

from etl_guiacores_spark import shipping as _shipping  # noqa: E402

_shipping.register_udf_module(_sys.modules[__name__])
