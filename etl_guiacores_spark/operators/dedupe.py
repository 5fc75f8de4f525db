"""Deduplication operators (SURVEY §2.4, D1-D5).

The reference dedupes with an O(n²) ``if item not in list`` walk
(reference: src/common/data_cleaner.py:29-32) and dict
insert-if-absent during the crawl
(reference: src/extractors/sequential_collector.py:591-594). Here
every variant is a shuffle-based distributed operator:

- exact dedupe       -> hash-aggregate ``dropDuplicates``
- keyed keep-ANY     -> ``dropDuplicates(keys)`` (one shuffle, no sort)
- keyed keep-FIRST   -> ranking window over an explicit order column —
  "first" is undefined under distributed execution without one
  (SURVEY §7 hard part (b))
- dup report         -> single window pass splitting unique/duplicate

Scale note: all of these shuffle on the dedupe key; at 100 TB the key
should be high-cardinality (business id is) and AQE skew-join /
salting handles hot keys. None of them collect to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_exact(df: DataFrame) -> DataFrame:
    """D1 — full-record distinct."""
    return df.dropDuplicates()


def dedupe_keyed(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D4 — keep an arbitrary row per key (cheapest: no ordering)."""
    return df.dropDuplicates(list(keys))


def dedupe_keyed_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """D2 — keep the FIRST row per key under an explicit order.

    reference: src/extractors/sequential_collector.py:591-594 keeps
    first-discovered; distributed keep-first needs the discovery-order
    column made explicit.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def split_duplicates(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """D3 — ``(unique, duplicates)`` split with one window pass.

    reference: src/common/utils.py:48-62 returns both lists so callers
    can report dup counts.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.filter(F.col("__rn") == 1).drop("__rn"),
        ranked.filter(F.col("__rn") > 1).drop("__rn"),
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MAXIMAL repeated token spans across documents — the exact
    substring-dedup primitive of Lee et al.'s "Deduplicating Training
    Data Makes Language Models Better", re-expressed as sliding
    n-grams + interval coalescing. Every n-token window occurring in
    >= ``min_docs`` distinct documents marks the interval
    ``[pos, pos+n)``; overlapping/adjacent marked intervals merge into
    maximal spans. Unlike the tiled q81 segmentation (non-overlapping
    5-token cuts), the sliding window catches duplicated passages at
    ANY offset — a copy straddling a tile boundary still matches — and
    the merged span recovers the full extent of the shared passage,
    not just one n-gram of it.

    Plan shape: one posting shuffle on the 128-bit gram key
    (textstats.gram_key — the binary md5 digest, half the bytes of
    the hex string it replaced; the interval algebra is
    hash-agnostic), one
    count-distinct agg, one co-partitioned join back, then a window
    PARTITIONED BY document — parallel across docs, bounded by
    document length, never corpus-global. Because all intervals have
    the same width ``n`` and per-doc start positions are unique, the
    classic "start > running max(end)" island test reduces to
    ``start - lag(start) > n`` — one LAG instead of a running-max
    frame.

    Returns (id_col, span_start 0-based, span_end exclusive,
    span_tokens, n_grams).
    """
    from etl_guiacores_spark.operators.textstats import (
        gram_key as _gram_key,
        kgrams,
        tokens,
    )

    if n < 1 or min_docs < 2:
        raise ValueError("repeated_spans: need n >= 1 and min_docs >= 2")
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") >= n)
    grams = base.select(
        id_col, F.posexplode(kgrams(F.col("__toks"), n)).alias("__pos", "__gram")
    ).select(id_col, "__pos", _gram_key("__gram").alias("__g"))
    return _spans_from_grams(grams, n, min_docs, id_col)


def _spans_from_grams(
    grams: DataFrame, n: int, min_docs: int, id_col: str
) -> DataFrame:
    """The repeated-span core over a ``(id_col, __pos, __g)`` gram
    relation — factored so the whole-document and pre-chunked gram
    builders share ONE copy of the count-distinct test and the
    constant-width island coalesce (see :func:`repeated_spans` for
    the algebra; decontam.cross_span_contamination shares
    :func:`coalesce_span_islands` with a membership test instead)."""
    dup = (
        grams.groupBy("__g")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__g")
    )
    hits = grams.join(dup, "__g").select(id_col, "__pos")
    return coalesce_span_islands(hits, n, id_col)


def coalesce_span_islands(
    hits: DataFrame, n: int, id_col: str
) -> DataFrame:
    """Merge constant-width-``n`` gram hits ``(id_col, __pos)`` into
    maximal spans: because all intervals share width ``n`` and
    per-document positions are unique, the classic
    "start > running max(end)" island test reduces to
    ``start - lag(start) > n`` — one LAG instead of a running-max
    frame. Window is PARTITIONED BY document and bounded by that
    document's HIT count. Returns (id_col, span_start, span_end,
    span_tokens, n_grams); one copy shared by repeated_spans,
    cross_span_contamination, and their pre-chunked twins."""
    w = Window.partitionBy(id_col).orderBy("__pos")
    flagged = hits.withColumn(
        "__new",
        F.when(
            F.coalesce(
                F.col("__pos") - F.lag("__pos").over(w), F.lit(n + 1)
            )
            > n,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(id_col, "__isl").agg(
        F.min("__pos").cast("long").alias("span_start"),
        (F.max("__pos") + n).cast("long").alias("span_end"),
        (F.max("__pos") + n - F.min("__pos")).cast("long").alias(
            "span_tokens"
        ),
        F.count("*").cast("long").alias("n_grams"),
    ).drop("__isl")


def prechunked_repeated_spans(
    chunks: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    pos_col: str = "chunk_pos",
    chunk_col: str = "chunk_text",
    validate: bool = True,
    keep_ids: DataFrame | None = None,
) -> DataFrame:
    """:func:`repeated_spans` from a PRE-CHUNKED bronze table
    (chunking.prechunk_documents) — bit-identical spans, but the scan
    reads balanced chunk rows: no task tokenizes or kgram-walks a
    whole fat document (the same storage-layer skew bound as
    similarity.prechunked_minhash, extended to the span-dedup family
    — the last per-row whole-document compute path in the corpus
    pipeline). Global gram positions come from
    chunking.prechunked_positional_grams; requires every non-final
    chunk to hold >= ``n - 1`` tokens (enforced under ``validate``),
    i.e. a bronze written with ``chunk_tokens >= n - 1``."""
    from etl_guiacores_spark.operators.chunking import (
        prechunked_positional_grams,
    )

    if min_docs < 2:
        raise ValueError("prechunked_repeated_spans: need min_docs >= 2")
    if validate and keep_ids is not None:
        # a keep_ids doc with no chunk rows would yield zero grams
        # and so zero spans SILENTLY (the same stale-bronze vanish
        # near_dup_removal guards against); probe coverage eagerly
        from etl_guiacores_spark.operators.chunking import (
            require_chunk_coverage,
        )

        require_chunk_coverage(
            keep_ids, chunks, id_col, "prechunked_repeated_spans"
        )
    grams = prechunked_positional_grams(
        chunks, n, id_col, pos_col, chunk_col,
        validate=validate, op_name="prechunked_repeated_spans",
        keep_ids=keep_ids,
    )
    return _spans_from_grams(grams, n, min_docs, id_col)


def strip_repeated_spans(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_text: bool = False,
) -> DataFrame:
    """Remove every maximal repeated span (:func:`repeated_spans`)
    from each document and account for the result — the apply step of
    substring-level dedup: per document, total/duplicated/retained
    token counts plus the md5 of the reconstructed survivor text
    (order proven end-to-end, the q81 discipline). Documents shorter
    than ``n`` tokens or with no repeated span pass through intact
    (dup_tokens = 0).

    The strip itself is IN-PLAN per row: the doc's merged spans
    (bounded by document length / n) collect into one array column and
    a positional ``filter``/``exists`` HOF drops covered tokens — no
    second explode, no range join, no extra shuffle beyond
    :func:`repeated_spans`'s own aggregation plus one co-partitioned
    join back to the corpus.

    Returns (id_col, n_tokens, dup_tokens, retained_tokens,
    retained_md5); with ``keep_text=True`` also ``retained_text``
    (the whitespace-joined survivor tokens — what the corpus
    pipeline's span-strip stage writes forward for chunking).
    """
    spans = repeated_spans(docs, n=n, min_docs=min_docs, id_col=id_col,
                           text_col=text_col)
    return strip_given_spans(docs, spans, id_col=id_col,
                             text_col=text_col, keep_text=keep_text)


def strip_given_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_text: bool = False,
) -> DataFrame:
    """The APPLY half of span stripping, factored so any span source
    can drive it: :func:`repeated_spans` (within-corpus dedup) and
    ``decontam.cross_span_contamination`` (eval-leakage excision)
    produce the same (id, span_start, span_end, span_tokens) shape,
    and the excision + accounting is identical. Spans must be
    non-overlapping per document (both producers merge islands, so
    they are by construction).

    Same in-plan mechanics and return contract as
    :func:`strip_repeated_spans`.
    """
    from etl_guiacores_spark.operators.textstats import tokens

    spans = (
        spans
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct("span_start", "span_end")
            ).alias("__spans"),
            F.sum("span_tokens").cast("long").alias("__dup"),
        )
    )
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    joined = base.join(spans, id_col, "left").withColumn(
        "__spans", F.coalesce("__spans", F.array())
    )
    kept = F.filter(
        F.transform(
            "__toks", lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda s: ~F.exists(
            "__spans",
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] < sp["span_end"]),
        ),
    )
    cols = [
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.coalesce("__dup", F.lit(0)).cast("long").alias("dup_tokens"),
        (F.size("__toks") - F.coalesce("__dup", F.lit(0)))
        .cast("long")
        .alias("retained_tokens"),
        F.md5(
            F.array_join(F.transform(kept, lambda s: s["t"]), " ")
        ).alias("retained_md5"),
    ]
    if keep_text:
        cols.append(
            F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
                "retained_text"
            )
        )
    return joined.select(*cols)


def prechunked_strip_given_spans(
    chunks: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "chunk_pos",
    chunk_col: str = "chunk_text",
    keep_text: bool = False,
    validate: bool = True,
    keep_ids: DataFrame | None = None,
    chunk_tokens: int | None = None,
) -> DataFrame:
    """:func:`strip_given_spans` from a PRE-CHUNKED bronze table —
    bit-identical output (same columns, same retained_md5), but the
    token filtering runs per CHUNK with global offsets: no task walks
    a whole fat document's token array (the apply half of the span
    family's storage-layer skew bound; the detection halves are
    :func:`prechunked_repeated_spans` /
    decontam.cross_span_contamination(chunks=)).

    Mechanics: each chunk's exact token slice
    (chunking.prechunked_tokens) gets GLOBAL indices from the running
    token-count offset (a per-document window over chunk ROWS), the
    per-document span array joins on and the positional filter drops
    covered tokens chunk-locally; the per-document reassembly joins
    the per-chunk retained strings in chunk order, skipping chunks
    whose retained token count is ZERO (so separators appear exactly
    between kept tokens — a chunk whose only retained token is a
    phantom empty string still contributes its separator, matching
    the flat per-row join). The reassembly's collect_list is bounded
    by the document's CHUNK COUNT and concatenates already-filtered
    strings — string IO, not token compute. Spans must be
    non-overlapping per document (producer contract, same as
    :func:`strip_given_spans`); documents with zero tokens are
    excluded by contract. ``chunks`` must cover every document the
    spans reference AND every keep_ids document (the bronze coverage
    contract)."""
    from etl_guiacores_spark.operators.chunking import (
        require_chunk_contract,
        tokenized_with_offsets,
    )

    if chunk_tokens is not None and chunk_tokens < 1:
        raise ValueError(
            "prechunked_strip_given_spans: chunk_tokens must be >= 1 "
            f"when given (the write-time bronze chunk size), got "
            f"{chunk_tokens}"
        )
    if validate:
        require_chunk_contract(
            chunks, id_col, pos_col, "prechunked_strip_given_spans"
        )
    kept_rel = chunks
    if keep_ids is not None:
        kept_rel = chunks.join(
            keep_ids.select(id_col), id_col, "left_semi"
        )
    toked = tokenized_with_offsets(kept_rel, id_col, pos_col, chunk_col)
    if chunk_tokens is not None and "tok_off" in chunks.columns:
        # assign-by-arithmetic path: the bronze layout makes every
        # chunk's global token range a closed form (tok_off =
        # pos * chunk_tokens + leading-phantom), so each span can be
        # EXPLODED to exactly the chunk positions it overlaps — a
        # span ships once per covered chunk instead of the whole
        # per-document span array shipping once per chunk (the
        # array path's |spans| x |chunks| fan-out on a heavily
        # duplicated fat document — the very case this operator
        # exists for). The leading-phantom shift is recovered from
        # the pos-1 chunk's tok_off; both endpoints clamp into
        # [0, max_pos] (a span covering the trailing phantom token
        # would otherwise index one past the final chunk).
        meta = (
            chunks.groupBy(id_col)
            .agg(
                F.max(pos_col).alias("__mx"),
                F.max(
                    F.when(F.col(pos_col) == 1, F.col("tok_off"))
                ).alias("__off1"),
            )
            .withColumn(
                # any bronze written by prechunk_documents has
                # tok_off(pos=1) == chunk_tokens + leading-phantom
                # (0 or 1); a caller-supplied chunk_tokens that
                # doesn't reproduce that identity would shift every
                # derived span position and corrupt retained_text
                # SILENTLY, so the mismatch fails loud in-plan
                # (same stance as the NULL-tok_off guard in
                # chunking.tokenized_with_offsets)
                "__lp",
                F.when(F.col("__off1").isNull(), F.lit(0).cast("long"))
                .when(
                    (F.col("__off1") - F.lit(chunk_tokens)).between(
                        0, 1
                    ),
                    (F.col("__off1") - F.lit(chunk_tokens)).cast(
                        "long"
                    ),
                )
                .otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "prechunked_strip_given_spans: "
                                f"chunk_tokens={chunk_tokens} does "
                                "not match the bronze write-time "
                                f"layout ({id_col}="
                            ),
                            F.col(id_col).cast("string"),
                            F.lit(" has tok_off="),
                            F.col("__off1").cast("string"),
                            F.lit(
                                " at pos=1, expected chunk_tokens"
                                " + {0,1}) — pass the chunk size "
                                "prechunk_documents wrote the "
                                "bronze with"
                            ),
                        )
                    ).cast("long")
                ),
            )
            .select(id_col, "__mx", "__lp")
        )

        def clamp(pos_expr):
            return F.least(
                F.col("__mx").cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(pos_expr / F.lit(chunk_tokens)),
                ),
            ).cast("int")

        assigned = (
            spans.join(meta, id_col)
            .withColumn(
                "__c0", clamp(F.col("span_start") - F.col("__lp"))
            )
            .withColumn(
                "__c1", clamp(F.col("span_end") - 1 - F.col("__lp"))
            )
            .select(
                id_col,
                F.explode(F.sequence("__c0", "__c1")).alias(pos_col),
                F.struct("span_start", "span_end").alias("__sp"),
            )
        )
        sp_local = assigned.groupBy(id_col, pos_col).agg(
            F.collect_list("__sp").alias("__local")
        )
        joined = toked.join(
            sp_local, [id_col, pos_col], "left"
        ).withColumn("__local", F.coalesce("__local", F.array()))
    else:
        # generic path (foreign chunk tables / unknown chunk size):
        # ship the per-document span array to each chunk, then
        # localize — only spans OVERLAPPING this chunk's global token
        # range can cover its tokens, so the per-token exists test
        # still runs over the (usually empty or tiny) local subset
        sp = spans.groupBy(id_col).agg(
            F.collect_list(F.struct("span_start", "span_end")).alias(
                "__spans"
            ),
        )
        joined = toked.join(sp, id_col, "left").withColumn(
            "__spans", F.coalesce("__spans", F.array())
        )
        joined = joined.withColumn(
            "__local",
            F.filter(
                "__spans",
                lambda span: (span["span_end"] > F.col("__off"))
                & (
                    span["span_start"]
                    < F.col("__off") + F.size("__toks")
                ),
            ),
        )
    kept = F.filter(
        F.transform(
            "__toks",
            lambda t, i: F.struct(
                t.alias("t"), (i + F.col("__off")).alias("i")
            ),
        ),
        lambda s: ~F.exists(
            "__local",
            lambda span: (s["i"] >= span["span_start"])
            & (s["i"] < span["span_end"]),
        ),
    )
    pieces = joined.select(
        F.col(id_col),
        F.col(pos_col),
        F.size("__toks").alias("__n"),
        F.size(kept).alias("__kn"),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
            "__piece"
        ),
    )
    ret = F.array_join(
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(pos_col).alias("p"),
                            F.col("__kn").alias("k"),
                            F.col("__piece").alias("s"),
                        )
                    )
                ),
                lambda x: x["k"] > 0,
            ),
            lambda x: x["s"],
        ),
        " ",
    )
    dup = spans.groupBy(id_col).agg(
        F.sum("span_tokens").cast("long").alias("__dup")
    )
    agg = (
        pieces.groupBy(id_col)
        .agg(
            F.sum("__n").cast("long").alias("n_tokens"),
            ret.alias("__ret"),
        )
        .filter(F.col("n_tokens") > 0)
        .join(dup, id_col, "left")
        .withColumn(
            "dup_tokens",
            F.coalesce("__dup", F.lit(0)).cast("long"),
        )
    )
    cols = [
        F.col(id_col),
        F.col("n_tokens"),
        F.col("dup_tokens"),
        (F.col("n_tokens") - F.col("dup_tokens"))
        .cast("long")
        .alias("retained_tokens"),
        F.md5("__ret").alias("retained_md5"),
    ]
    if keep_text:
        cols.append(F.col("__ret").alias("retained_text"))
    return agg.select(*cols)
