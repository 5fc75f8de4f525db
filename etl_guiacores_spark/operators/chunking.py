"""Document chunking + vocabulary operators for training-data prep.

Chunking: split each document into token-bounded windows with overlap
(the standard pre-tokenization step before embedding/training). The
window arithmetic happens per row with array expressions, then ONE
explode materializes chunk rows — no UDF, no shuffle until the caller
aggregates. At 100 TB this is scan-speed work whose output row count
(docs x chunks) is the only cost.

Vocabulary: corpus word frequencies -> ranked vocab. One explode +
one groupBy (the shuffle is on the token, high-cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_spans(col: Column, chunk_tokens: int, overlap: int = 0) -> Column:
    """array<struct<chunk_idx,int start, text>> of token windows.

    Stride = chunk_tokens - overlap; the last partial window is kept
    (matches the usual training-data convention).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    # blank text -> empty token array (split of "" yields [""] which
    # would otherwise produce one empty chunk)
    raw = F.split(F.trim(col), r"\s+")
    toks = F.when(F.length(F.trim(col)) > 0, raw).otherwise(
        F.array().cast("array<string>")
    )

    def build(t: Column) -> Column:
        n = F.size(t)
        # stop once a window's fresh (non-overlap) region is exhausted:
        # ceil((n - overlap) / stride) windows cover every token with no
        # fully-redundant tail window
        n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
            F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast("int")
        )
        idx = F.sequence(F.lit(0), n_chunks - 1)
        mk = lambda i: F.struct(
            i.alias("chunk_idx"),
            (i * stride + 1).alias("start_token"),
            F.array_join(F.slice(t, i * stride + 1, chunk_tokens), " ").alias("chunk_text"),
        )
        return F.when(n_chunks > 0, F.transform(idx, mk)).otherwise(
            F.array().cast("array<struct<chunk_idx:int,start_token:int,chunk_text:string>>")
        )

    return F.element_at(F.transform(F.array(toks), build), 1)


def id_contract_counters(id_col: str) -> list:
    """The two aggregate columns behind :func:`require_unique_ids`
    (``nulls``, ``dups``) — exposed so run_corpus_pipeline can ride
    them on the n_raw count job it already pays instead of
    re-implementing the contract inline (round-10 review finding:
    two copies of the counters could silently diverge)."""
    return [
        F.sum(F.when(F.col(id_col).isNull(), 1).otherwise(0)).alias(
            "nulls"
        ),
        (F.count(id_col) - F.count_distinct(id_col)).alias("dups"),
    ]


def require_unique_ids(df: DataFrame, id_col: str, op_name: str) -> None:
    """Eagerly enforce the chunk-merge key contract: ``id_col`` unique
    and non-null. One column-pruned aggregate scan — the loud-contract
    price the salted operators pay up front (round-10 review finding:
    in-plan raise_error guards are unreliable here because the merge
    join's IsNotNull pushdown filters a NULL-keyed row out BELOW the
    guard projection, so a NULL id silently vanished instead of
    erroring; a duplicate id silently merged two documents)."""
    row = df.agg(*id_contract_counters(id_col)).first()
    nulls, dups = row["nulls"] or 0, row["dups"] or 0
    if nulls or dups:
        raise ValueError(
            f"{op_name}: {id_col} must be unique and non-null (it is "
            f"the chunk-merge key) — found {nulls} NULL id row(s) and "
            f"{dups} duplicate id row(s); score such rows with the "
            "per-row operators"
        )


def salted_explode(
    df: DataFrame, id_col: str, chunks: Column, out_col: str
) -> DataFrame:
    """(id_col, __cpos, out_col) rows: posexplode a per-row chunk
    array, then hash-repartition on (id, chunk position) — THE salt
    that the skew-proof operators (similarity.salted_minhash,
    textstats.salted_text_scores) share. Without the repartition the
    exploded chunks stay co-located with their parent row and a fat
    document still runs on one task.

    This is the one copy of the explode-and-salt scaffold (round-10
    review finding: three hand-rolled copies carried the same
    load-bearing repartition). ``chunks`` must arrive PRE-BUILT as an
    array Column; expensive derivations (tokenization) must be bound
    once by the caller via the array/transform/element_at trick —
    interpreted HOFs have no common-subexpression elimination, so an
    unbound expression would recompute per chunk (the kgrams lesson).
    ``__cpos`` is also the callers' row-multiplicity probe: position 0
    occurs exactly once per input row."""
    return df.select(
        id_col,
        F.posexplode_outer(chunks).alias("__cpos", out_col),
    ).repartition(F.col(id_col), F.col("__cpos"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """One row per (doc, chunk): id, chunk_idx, start_token, chunk_text,
    n_chunk_tokens."""
    spans = chunk_spans(F.col(text_col), chunk_tokens, overlap)
    out = df.select(id_col, F.explode(spans).alias("c"))
    return out.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_token").alias("start_token"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.size(F.split(F.col("c.chunk_text"), r"\s+")).alias("n_chunk_tokens"),
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", top_k: int | None = None, min_count: int = 1
) -> DataFrame:
    """Corpus vocabulary: (token, count, rank) by descending frequency
    (ties broken lexicographically -> fully deterministic ids)."""
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.length("token") > 0)
    counts = toks.groupBy("token").agg(F.count("*").alias("count"))
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    if top_k:
        # distributed TakeOrdered: per-partition top-k heads merge at
        # the driver — k rows, never the vocabulary — then the rank
        # window runs over only those k rows. The partition-less window
        # alone would funnel the ENTIRE distinct-token table through
        # one task (the single-node bottleneck ordering.py documents).
        counts = counts.orderBy(F.col("count").desc(), "token").limit(top_k)
        w = Window.orderBy(F.col("count").desc(), F.col("token"))
        return counts.withColumn("rank", F.row_number().over(w))
    # full ranking (no top_k): contiguous rank == dense id over the
    # (desc count, token) order — reuse the range-partitioned prefix-sum
    # machinery instead of a single-partition window
    from etl_guiacores_spark.operators.ordering import dense_ids

    ordered = counts.withColumn(
        "__ord",
        F.struct((-F.col("count")).alias("nc"), F.col("token").alias("t")),
    )
    return dense_ids(ordered, "__ord", id_name="rank").drop("__ord")
