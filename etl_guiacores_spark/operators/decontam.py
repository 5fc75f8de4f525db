"""Training-data hygiene operators: decontamination, PII redaction,
repetition scoring.

- ``contaminated_doc_ids``: docs sharing any word n-gram with a
  benchmark/eval set — the decontamination step before pretraining.
  Same LSH-free bucket-join shape as near-dup: shingles explode into
  (shingle -> id) postings, the join hits only true overlaps, and the
  benchmark side is small (it's an eval set) so it broadcasts.
- ``redact_pii``: email/phone/id-number redaction as chained regex
  replaces — pure column expression, scan-speed.
- ``repetition_score``: 1 - distinct/total shingle ratio; high values
  flag degenerate repeated text (a standard quality filter signal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_guiacores_spark.operators.similarity import word_shingles

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"
LONG_NUMBER_RE = r"\b\d{7,}\b"


def contaminated_doc_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlaps: int = 1,
) -> DataFrame:
    """doc ids sharing >= min_overlaps distinct word n-grams with the
    benchmark set, with the overlap count."""
    doc_posts = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("__sh")
    )
    bench_posts = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("__sh"))
        .distinct()
    )
    hits = doc_posts.join(F.broadcast(bench_posts), on="__sh")
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("__sh").alias("n_overlapping_ngrams"))
        .filter(F.col("n_overlapping_ngrams") >= min_overlaps)
    )


def contaminated_doc_ids_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlaps: int = 1,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """``contaminated_doc_ids`` with a Bloom prefilter — identical
    output (test-asserted), different scaling regime.

    The exact operator broadcasts the benchmark POSTINGS and joins the
    corpus gram stream against them — already map-side, and for an
    eval-set-sized benchmark it is the faster path (measured ~1.5x at
    100k docs; it pays one hash per gram where the filter pays k
    md5s). Use THIS variant when the member set outgrows the
    broadcast: the union of every benchmark, a fleet-wide contaminated
    n-gram registry. Postings grow with members; the set-bit table is
    FIXED-SIZE (num_bits), so the corpus gram stream still drops
    non-matches map-side — no false negatives, nothing real lost —
    and only the tiny maybe-set (true overlaps + the fp rate) reaches
    the exact verification join that removes false positives.
    Two-phase probe-then-verify, the same pattern as
    LSH-candidates-then-Jaccard.
    """
    from etl_guiacores_spark.operators.bloom import bloom_build, bloom_probe

    doc_posts = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("__sh")
    )
    bench_posts = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("__sh"))
        .distinct()
    )
    bits = bloom_build(bench_posts, "__sh", num_bits, num_hashes, seed="decontam")
    maybe = bloom_probe(doc_posts, bits, "__sh", num_bits, num_hashes, seed="decontam")
    candidates = maybe.filter(F.col("maybe_member")).drop("maybe_member")
    hits = candidates.join(F.broadcast(bench_posts), on="__sh")
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("__sh").alias("n_overlapping_ngrams"))
        .filter(F.col("n_overlapping_ngrams") >= min_overlaps)
    )


def redact_pii(col: Column) -> Column:
    """Emails -> [EMAIL], phone-shaped numbers -> [PHONE], long digit
    runs -> [NUM]. Order matters: emails first (they contain digits),
    phones before bare numbers."""
    out = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_RE, "[PHONE]")
    return F.regexp_replace(out, LONG_NUMBER_RE, "[NUM]")


def repetition_score(col: Column, n: int = 3) -> Column:
    """1 - distinct/total n-gram ratio in [0,1]; 0 = no repetition,
    ->1 = degenerate loops. NULL for texts shorter than n tokens."""
    toks = F.split(F.trim(col), r"\s+")

    def build(t: Column) -> Column:
        k = F.size(t)
        total = k - (n - 1)
        idx = F.sequence(F.lit(1), total)
        gram = lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
        distinct = F.size(F.array_distinct(F.transform(idx, gram)))
        return F.when(
            k >= n, 1.0 - distinct.cast("double") / total.cast("double")
        )

    return F.element_at(F.transform(F.array(toks), build), 1)


def cross_span_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunks: DataFrame | None = None,
    validate: bool = True,
) -> DataFrame:
    """SPAN-level cross-set decontamination: maximal token spans of a
    training document that appear verbatim (as sliding n-gram
    windows) anywhere in the eval/benchmark set. Document-level
    decontamination (exact_decontaminate above, q59/q107's bloom
    twin) drops a doc when it IS a benchmark member; this finds docs
    that QUOTE one — the eval-leakage mode Lee et al. flag, where a
    training page embeds a benchmark question — and returns the
    exact char... token extents, so the strip step can excise the
    quotation instead of discarding the document.

    Machinery is repeated_spans' sliding-gram + interval-merge with
    the duplicate test swapped for membership in the EVAL gram
    dictionary: train grams semi-join the distinct eval grams, and
    surviving positions coalesce by the constant-width LAG island
    test. The eval gram dictionary is bounded by the benchmark's
    size — KBs-to-MBs against a 100 TB corpus — so it BROADCASTS and
    the train side never shuffles at all for the membership test;
    the only exchange left is the per-doc window, parallel across
    docs. (repeated_spans must shuffle its postings because its test
    is a cross-document COUNT; membership needs no count.)

    Returns (id_col, span_start 0-based, span_end exclusive,
    span_tokens, n_grams) — one row per maximal contaminated span
    per training document.

    ``chunks`` (a pre-chunked bronze table covering ``train``'s ids
    with text identical to what the chunks were written from) derives
    the TRAIN-side positional grams from balanced chunk rows instead
    of whole documents — bit-identical spans, no task kgram-walks a
    fat document (chunking.prechunked_positional_grams; requires a
    bronze written with chunk_tokens >= n - 1). The eval side stays
    per-row: benchmarks are KBs-to-MBs.
    """
    from etl_guiacores_spark.operators.dedupe import (
        coalesce_span_islands,
    )
    from etl_guiacores_spark.operators.textstats import (
        gram_key as _gram_key,
        kgrams,
        tokens,
    )

    if n < 1:
        raise ValueError("cross_span_contamination: need n >= 1")

    def grams(df: DataFrame) -> DataFrame:
        base = df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        ).filter(F.size("__toks") >= n)
        return base.select(
            id_col,
            F.posexplode(kgrams(F.col("__toks"), n)).alias(
                "__pos", "__gram"
            ),
        ).select(id_col, "__pos", _gram_key("__gram").alias("__g"))

    if chunks is not None:
        from etl_guiacores_spark.operators.chunking import (
            prechunked_positional_grams,
            require_chunk_coverage,
        )

        if validate:
            # a train doc with no chunk rows yields zero grams, so
            # its contamination spans silently vanish — the same
            # stale-bronze failure mode near_dup_removal probes for
            require_chunk_coverage(
                train, chunks, id_col, "cross_span_contamination"
            )
        train_grams = prechunked_positional_grams(
            chunks, n, id_col, "chunk_pos", "chunk_text",
            validate=validate, op_name="cross_span_contamination",
            keep_ids=train,
        )
    else:
        train_grams = grams(train)
    eval_grams = grams(eval_docs).select("__g").distinct()
    hits = train_grams.join(
        F.broadcast(eval_grams), "__g", "left_semi"
    ).select(id_col, "__pos")
    return coalesce_span_islands(hits, n, id_col)
