"""Training-data corpus pipeline: the north-star operators composed.

documents -> quality/language filter -> exact dedup -> [doc + span
decontamination] -> near-dup removal (MinHash-LSH candidates,
exact-Jaccard verify, greedy keep-lowest-id or exact CC) -> [repeated
-span strip] -> [Gopher quality gate] -> [exact mixture quota] ->
chunking -> vocabulary -> [packed training shards + atomic manifest],
with per-stage metrics and cross-stage conservation asserts (token
totals, monotone filters, exact quota counts) — the full "golden
corpus run" a pretraining-data job executes as ONE invocation
(reference analog: the staged E->T->L chain at
/root/reference/src/extractors/run_extraction.py:49-152 ->
run_transformation.py -> run_loading.py, generalized to curation).

Every stage is one of the engine's tested operators; the pipeline is
the composition a 100 TB pretraining-data job runs. Stage boundaries
are Parquet tables, so each stage restarts independently (SURVEY §3.4
bronze/silver pattern applied to corpus prep).

Scale notes: the near-dup stage shuffles only (band, signature) keys
and verified pairs; the greedy survivor rule (drop the higher id of
any verified pair) is a one-pass approximation of connected-component
clustering — at clique sizes >2 it may keep fewer docs than true
CC-based dedup, never more, which is the conservative direction for
training data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_guiacores_spark import io as gio
from etl_guiacores_spark.operators.bucketing import write_bucketed
from etl_guiacores_spark.operators.chunking import build_vocab, chunk_documents
from etl_guiacores_spark.operators.dedupe import dedupe_keyed_first
from etl_guiacores_spark.operators.similarity import (
    jaccard_of_shingles,
    lsh_candidate_pairs,
    lsh_candidate_pairs_from_sigs,
    prechunked_minhash,
    staged_minhash_shingles,
    with_minhash,
    word_shingles,
)
from etl_guiacores_spark.operators.textstats import fingerprint, lang_id, quality_score


@dataclass
class CorpusConfig:
    min_quality: float = 0.5
    allowed_langs: tuple[str, ...] = ()  # empty = keep all
    near_dup_jaccard: float = 0.8
    #: when set, every heavy per-row text stage is SALTED by
    #: (doc_id, chunk) with per-task work bounded by this many tokens
    #: instead of the document length: the near-dup shingle/signature
    #: pass (similarity.salted_minhash — bit-identical signatures,
    #: shingle sets reassembled by union), the filter-leg quality/lang
    #: scoring (textstats.salted_text_scores), and the gopher gate
    #: (textstats.salted_gopher_quality) — all bit-identical to their
    #: per-row twins from chunk-merged counters. Costs extra shuffles
    #: per salted stage plus one column-pruned id-validation scan
    #: each. Operating guidance (round-11, measured): enable whenever
    #: ``doc_id`` is unique and non-null — salting won the sf0.1 soak
    #: at BOTH Zipf-tail (125.5 -> 79.9 s, round 10) and UNIFORM
    #: lengths (52.6 -> 40.6 s; bounding the per-evaluation array
    #: size also bounds the superlinear interpreted-HOF costs, not
    #: just the tail — SCALE.md round-11 crossover table). It stays
    #: opt-in only because it hard-requires the id contract that the
    #: per-row path tolerates violating. None = per-row compute.
    salt_chunk_tokens: int | None = None
    #: requires ``salt_chunk_tokens``: write the PRE-CHUNKED bronze
    #: layout (chunking.prechunk_documents — (doc_id, chunk_pos,
    #: chunk_text) rows, landed + fenced as ``bronze_chunks``) once
    #: at ingest, and feed the prechunked consumers
    #: (prechunked_text_scores / prechunked_minhash /
    #: prechunked_gopher_quality) from it instead of re-chunking
    #: whole documents in-task per stage. This closes the raw-scan
    #: skew floor the in-task salted path keeps (one task must still
    #: tokenize a fat document before the salt spreads its chunks —
    #: the ~20x max/median residual in the round-10 soak): after the
    #: one-time bronze write, every salted stage scans balanced
    #: chunk-sized parquet rows. Outputs are bit-identical. The SPAN
    #: stages read chunk rows too (prechunked_repeated_spans /
    #: cross_span_contamination(chunks=) / prechunked_strip_given_
    #: spans — round 12), provided ``salt_chunk_tokens >= n - 1`` for
    #: that stage's gram width (``decontam_span_n`` / ``span_n``;
    #: below that the stage falls back to the bit-identical per-row
    #: path). After each text REWRITE the pipeline re-chunks the
    #: landed rewritten survivors once (``bronze_rechunked`` after
    #: the eval-span excision, ``bronze_restripped`` after the
    #: repeated-span strip — both fenced, both cheap because the
    #: funnel narrows), so near-dup and the gopher gate always read
    #: chunk rows: no stage in ANY config tokenizes a whole document
    #: in-task after the ingest bronze write.
    prechunk: bool = False
    #: True = connected-components clustering (one survivor per
    #: component, exact); False = greedy drop-higher-id per pair
    #: (one pass, conservative)
    cluster_exact: bool = False
    #: False (default) = native xxhash64 signatures (~3x faster, the
    #: production path); True = md5-hex family, required only when a
    #: DuckDB oracle must reproduce signatures bit-for-bit. The flag
    #: must be CONSISTENT between staging and every later incremental
    #: run over the same artifact tables (one hash family per corpus).
    portable_hashes: bool = False
    chunk_tokens: int = 64
    chunk_overlap: int = 8
    vocab_top_k: int = 1000
    #: parquet path of a benchmark/eval set (text column): when set,
    #: docs sharing >= decontam_min_overlaps word 3-grams with it are
    #: dropped after exact dedup (Bloom prefilter + exact verify —
    #: operators/decontam.contaminated_doc_ids_bloom)
    benchmark_path: str | None = None
    decontam_min_overlaps: int = 1
    #: parquet path of a linear-model weight table (bucket BIGINT,
    #: weight_ppm BIGINT — e.g. exported fastText/LR unigram weights):
    #: when set, the filter stage ALSO drops docs whose hashed-feature
    #: margin falls below model_threshold_ppm
    #: (operators/inference.linear_score)
    model_weights_path: str | None = None
    model_threshold_ppm: int = 0
    #: when True, after near-dup survivor selection the pipeline ALSO
    #: strips maximal repeated token spans (Lee-et-al substring-level
    #: dedup, operators/dedupe.strip_repeated_spans) from survivor
    #: texts before chunking/vocab, landing a ``span_stripped`` stage
    #: plus a per-doc ``span_accounting`` table. Token conservation
    #: (n_tokens == dup + retained, and the WRITTEN stripped text
    #: re-tokenizing to exactly the accounted retained total) is
    #: asserted on the stored artifact — a corrupted strip fails the
    #: run, it does not silently feed truncated text to training.
    strip_spans: bool = False
    span_n: int = 10
    span_min_docs: int = 2
    #: when True (requires benchmark_path), ALSO excise maximal token
    #: spans that quote the benchmark verbatim (sliding n-grams,
    #: operators/decontam.cross_span_contamination) from documents
    #: that survived the doc-level decontam drop — the eval-leakage
    #: mode where a page QUOTES a benchmark instead of being one.
    #: Lands an ``eval_span_accounting`` table and rewrites text
    #: before near-dup/chunking, with the same token-conservation
    #: assert as the strip_spans stage.
    decontam_spans: bool = False
    decontam_span_n: int = 8
    #: when True, after span stripping the pipeline ALSO applies the
    #: Gopher-style document quality rules (textstats.gopher_quality —
    #: token band, mean-token-length band, alpha fraction, stopword
    #: presence) as a second gate. Runs at scan speed (pure codegen
    #: arithmetic) but is placed here rather than first because the
    #: span-strip stages REWRITE text — gating must see final text.
    gopher_gate: bool = False
    gopher_min_tokens: int = 20
    gopher_max_tokens: int = 80
    #: when set, survivors are downsampled to EXACTLY this many
    #: documents with source shares preserved (largest-remainder
    #: apportionment over ``mixture_strata`` —
    #: sampling.exact_quota_stratified). None = keep all.
    mixture_total: int | None = None
    mixture_strata: tuple[str, ...] = ("source",)
    #: when True, the run's last mile packs the final survivor set
    #: into fixed-budget training sequences and lands them as
    #: size-bounded shards with an atomically-committed manifest
    #: (plans/shard_writer.write_training_shards) under
    #: ``{out_dir}/shards``. Chunk/overlap parameters are shared with
    #: the chunking stage, so the pipeline asserts chunk-count and
    #: token conservation between its own ``chunks`` artifact and the
    #: shard manifest — the composition invariant that proves the
    #: stages agree on what a token is.
    write_shards: bool = False
    budget_tokens: int = 512
    sequences_per_shard: int = 10_000
    shard_bins: int = 32


def filter_documents(
    docs: DataFrame,
    config: CorpusConfig,
    validate_ids: bool = True,
    chunks: DataFrame | None = None,
) -> DataFrame:
    if chunks is not None:
        # bronze path: the scores come from balanced pre-chunked rows
        # (no task ever tokenizes a whole document); bit-identical to
        # both other legs. The inner join onto the scores would
        # silently DROP any document missing from a stale/partial
        # bronze table, so standalone callers get the coverage probe
        # (the pipeline wrote the bronze from these docs this run)
        from etl_guiacores_spark.operators.textstats import (
            prechunked_text_scores,
        )

        if validate_ids:
            from etl_guiacores_spark.operators.chunking import (
                require_chunk_coverage,
            )

            require_chunk_coverage(
                docs, chunks, "doc_id", "filter_documents"
            )
        scored = docs.join(
            prechunked_text_scores(chunks, validate=validate_ids),
            "doc_id",
        )
    elif config.salt_chunk_tokens is not None:
        # skew-proof leg: chunk-merged counters, bit-identical scores
        # (textstats.salted_text_scores); the join back onto the doc
        # row is the documented salting price — narrow score rows and
        # one text shuffle versus an unbounded per-row straggler
        from etl_guiacores_spark.operators.textstats import (
            salted_text_scores,
        )

        scored = docs.join(
            salted_text_scores(
                docs, "doc_id", "text",
                chunk_tokens=config.salt_chunk_tokens,
                validate_ids=validate_ids,
            ),
            "doc_id",
        )
    else:
        scored = docs.withColumns(
            {
                "quality": quality_score(F.col("text")),
                "pred_lang": lang_id(F.col("text")),
            }
        )
    out = scored.filter(F.col("quality") >= config.min_quality)
    if config.allowed_langs:
        out = out.filter(F.col("pred_lang").isin(*config.allowed_langs))
    if config.model_weights_path is not None:
        from etl_guiacores_spark.operators.inference import linear_score

        weights = docs.sparkSession.read.parquet(config.model_weights_path)
        keep = linear_score(out, weights).filter(
            F.col("score_ppm") >= config.model_threshold_ppm
        )
        # key-only semi join: the model verdict travels as doc ids,
        # document text never rides the gating shuffle
        out = out.join(keep.select("doc_id"), "doc_id", "left_semi")
    return out


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Drop exact duplicates by content fingerprint, keeping the
    lowest doc_id (deterministic)."""
    with_fp = docs.withColumn("fp", fingerprint(F.col("text")))
    return dedupe_keyed_first(with_fp, ["fp"], ["doc_id"]).drop("fp")


def near_dup_removal(
    docs: DataFrame,
    threshold: float,
    cluster_exact: bool = False,
    portable: bool = False,
    salt_chunk_tokens: int | None = None,
    validate_ids: bool = True,
    chunks: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (survivors, removed_pairs). LSH proposes, exact Jaccard
    verifies; survivors are either one-per-connected-component
    (``cluster_exact``, iterative label propagation) or the greedy
    drop-higher-id-of-each-pair rule (one pass, conservative).

    ``salt_chunk_tokens`` routes shingling through the skew-proof
    salted path (similarity.salted_minhash): ONE salted
    (id, shingles, sigs) table — per-task work bounded by the chunk
    size instead of the document length — feeds both the LSH banding
    and the Jaccard verify, so the heavy per-row HOF compute is both
    salted AND computed once. The persisted handle rides out on the
    pair result as ``staged_sigs`` (the pipeline releases it after
    landing the pairs, same lifecycle as ``staged_bands``).

    ``chunks`` (a pre-chunked bronze table covering at least the ids
    in ``docs``, with text identical to what the chunks were written
    from) routes the shingle pass through
    ``similarity.prechunked_minhash`` instead: the scan reads
    balanced chunk rows, no task tokenizes a whole document. The
    chunk table is key-semi-joined down to ``docs``' ids first so
    upstream stages' drops are respected."""
    staged_sigs = None
    if chunks is not None:
        # an uncovered doc would have NO signature rows and become an
        # automatic near-dup survivor — silently; probe unless the
        # caller vouches (the pipeline wrote the bronze this run)
        if validate_ids:
            from etl_guiacores_spark.operators.chunking import (
                require_chunk_coverage,
            )

            require_chunk_coverage(
                docs, chunks, "doc_id", "near_dup_removal"
            )
        # keep_ids INSIDE the operator, not a pre-join here: the
        # operator self-joins its chunk input, so a caller-side
        # semi-join would execute twice
        staged_sigs = prechunked_minhash(
            chunks, "doc_id", portable=portable, with_shingles=True,
            validate=validate_ids, keep_ids=docs,
        ).persist()
        candidates = lsh_candidate_pairs_from_sigs(staged_sigs, "doc_id")
        sh = staged_sigs.select("doc_id", F.col("shingles").alias("sh"))
    elif salt_chunk_tokens is not None:
        staged_sigs = staged_minhash_shingles(
            docs, "doc_id", "text",
            salt_chunk_tokens=salt_chunk_tokens, portable=portable,
            validate_ids=validate_ids,
        )
        candidates = lsh_candidate_pairs_from_sigs(staged_sigs, "doc_id")
        sh = staged_sigs.select("doc_id", F.col("shingles").alias("sh"))
    else:
        candidates = lsh_candidate_pairs(docs, "doc_id", "text", portable=portable)
        sh = docs.select("doc_id", word_shingles(F.col("text")).alias("sh"))
    verified = (
        candidates.join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", jaccard_of_shingles(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if cluster_exact:
        from etl_guiacores_spark.operators.graph import connected_components

        labels = connected_components(
            docs.select("doc_id"), verified.select("id_a", "id_b"), id_col="doc_id"
        )
        survivors = docs.join(
            labels.filter(F.col("id") == F.col("component")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
        )
    else:
        # The doomed-id set scales with the corpus dup rate — no
        # broadcast hint; AQE picks broadcast only when it truly fits.
        doomed = verified.select(F.col("id_b").alias("doc_id")).distinct()
        survivors = docs.join(doomed, "doc_id", "left_anti")
    # ride the cache handles out to the pipeline so they can be
    # released once the consuming actions finish (similarity.py
    # persists them per invocation and CacheManager never GCs them)
    verified.staged_bands = getattr(candidates, "staged_bands", None)
    verified.staged_sigs = staged_sigs
    return survivors, verified


def _staged_sigs_for(
    docs: DataFrame,
    portable: bool,
    salt_chunk_tokens: int | None,
    chunks: DataFrame | None,
    validate_ids: bool,
    op_name: str,
) -> DataFrame:
    """One PERSISTED ``(doc_id, shingles, sig_0..k-1)`` frame for
    ``docs`` via whichever leg the caller selected — the ONE copy of
    the plain/salted/pre-chunked dispatch shared by the staged-shape
    functions (stage_corpus_artifacts, incremental_near_dup,
    append_corpus_artifacts); the first draft copy-pasted it three
    ways and promptly drifted (the coverage probe existed in only one
    copy — round-11 review finding). The caller owns the returned
    handle's unpersist, per the staged_minhash_shingles lifecycle."""
    if chunks is not None:
        if validate_ids:
            from etl_guiacores_spark.operators.chunking import (
                require_chunk_coverage,
            )

            # an uncovered doc would silently get NO signature rows:
            # dropped from staged tables / auto-admitted by the
            # incremental dedup — the same failure mode
            # near_dup_removal probes for
            require_chunk_coverage(docs, chunks, "doc_id", op_name)
        return prechunked_minhash(
            chunks, "doc_id", portable=portable, with_shingles=True,
            validate=validate_ids, keep_ids=docs,
        ).persist()
    # staged_minhash_shingles persists internally and handles BOTH the
    # salted (salt_chunk_tokens) and plain (None) legs
    return staged_minhash_shingles(
        docs, "doc_id", "text",
        salt_chunk_tokens=salt_chunk_tokens, portable=portable,
        validate_ids=validate_ids,
    )


def stage_corpus_artifacts(
    docs: DataFrame,
    table_prefix: str,
    num_buckets: int = 16,
    portable: bool = False,
    salt_chunk_tokens: int | None = None,
    chunks: DataFrame | None = None,
    validate_ids: bool = True,
) -> dict[str, str]:
    """Pay the shingle/signature computation and the doc_id shuffle
    ONCE: per-doc shingle arrays and minhash signatures land as
    bucketed-by-doc_id managed tables. Every later dedup run (and any
    verify join) reads them bucket-aligned — no re-shingling, and no
    exchange on the heavy array-carrying side of the join. This is the
    100 TB shape: signatures are ingest-time artifacts, not per-query
    recomputation.

    ``salt_chunk_tokens`` routes the one staging pass through the
    skew-proof salted shingle build; ``chunks`` (a pre-chunked bronze
    table) routes it through balanced chunk rows instead — the
    staging pass IS the pass where a fat document's one-task shingle
    build hurts, since everything downstream reads these tables.
    Outputs are bit-identical either way (shingle sets sorted on the
    salted/bronze paths — consumers treat them as sets)."""
    shingles_t, sigs_t = f"{table_prefix}_shingles", f"{table_prefix}_sigs"
    # ONE shingling pass feeds both tables: every leg exposes the
    # shingle array it computes anyway, and the transient persist
    # carries it across the two bucketed writes — shingling the
    # corpus a second time for the signature table would double the
    # most expensive per-row expression at ingest
    handle = _staged_sigs_for(
        docs, portable, salt_chunk_tokens, chunks, validate_ids,
        "stage_corpus_artifacts",
    )
    # unpersist must target the HANDLE whose plan carries the cache
    # entry — a renamed child df's unpersist would silently no-op
    staged = handle.withColumnRenamed("shingles", "sh")
    try:
        write_bucketed(staged.select("doc_id", "sh"), shingles_t, "doc_id", num_buckets)
        write_bucketed(staged.drop("sh"), sigs_t, "doc_id", num_buckets)
    finally:
        handle.unpersist()
    return {"shingles": shingles_t, "sigs": sigs_t}


def near_dup_removal_staged(
    docs: DataFrame, tables: dict[str, str], threshold: float
) -> tuple[DataFrame, DataFrame]:
    """near_dup_removal over pre-staged bucketed artifacts: candidates
    come from the signature table (no re-hashing), the Jaccard verify
    joins the bucketed shingle table on its bucket key — the planner
    elides the exchange under each shingle scan (plan-asserted in
    tests), so only the slim (id_a, id_b) pair list shuffles."""
    spark = docs.sparkSession
    candidates = lsh_candidate_pairs_from_sigs(spark.table(tables["sigs"]), "doc_id")
    sh = spark.table(tables["shingles"])
    sh_a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        candidates.hint("merge")
        .join(sh_a, "id_a")
        .hint("merge")
        .join(sh_b, "id_b")
        .withColumn("jaccard", jaccard_of_shingles(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    doomed = verified.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = docs.join(doomed, "doc_id", "left_anti")
    # same band-cache handoff as near_dup_removal: the per-invocation
    # persisted band table must be releasable by the caller
    verified.staged_bands = getattr(candidates, "staged_bands", None)
    return survivors, verified


def incremental_near_dup(
    new_docs: DataFrame,
    tables: dict[str, str],
    threshold: float,
    portable: bool = False,
    salt_chunk_tokens: int | None = None,
    chunks: DataFrame | None = None,
    validate_ids: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW ingest batch against an already-staged corpus — the
    daily-ingest shape at 100 TB: only the new batch is shingled and
    hashed; the existing corpus contributes its bucketed signature and
    shingle tables as-is (no recomputation, no re-shuffle of the heavy
    side).

    Priority rule: staged docs are already accepted, so a new doc is
    dropped if it near-dups ANY staged doc, or a lower-id doc within
    its own batch. Caller contract: new ids are disjoint from staged
    ids; for EXACT equivalence with a full greedy recompute over the
    union, new ids must also sort AFTER every staged id (monotone
    ingest ids) — otherwise the greedy rule could have dropped the
    staged doc instead. Staged rows whose ids appear in the batch are
    ignored (a doc can never doom itself), which makes a crash-replayed
    batch recompute the same survivors. Returns (surviving new docs,
    verified pairs where id_b is the dropped new doc)."""
    from etl_guiacores_spark.operators.similarity import band_rows

    spark = new_docs.sparkSession
    # salted / pre-chunked legs stage ONE (id, shingles, sigs) table
    # that serves both the banding below and the shingle verify —
    # which also removes the unsalted path's historical duplication
    # of the batch's shingle pass (with_minhash here + word_shingles
    # later); the handle rides out on the pair result as staged_sigs,
    # same lifecycle contract as near_dup_removal's
    staged_new = None
    if chunks is not None or salt_chunk_tokens is not None:
        staged_new = _staged_sigs_for(
            new_docs, portable, salt_chunk_tokens, chunks,
            validate_ids, "incremental_near_dup",
        )
        new_sigs = staged_new.drop("shingles")
    else:
        new_sigs = with_minhash(
            new_docs.select("doc_id", "text"), "text", portable=portable
        ).drop("text")
    try:
        # replay-safety: a re-delivered batch may already be IN the staged
        # tables; its own staged copies must not doom it
        staged_sigs = spark.table(tables["sigs"])
        # hash-family guard: the staged signatures and this batch's must
        # come from the SAME family (portable md5-hex = strings, native
        # xxhash64 = longs). A mismatch would make the band equi-join match
        # NOTHING and silently admit every duplicate — the schema is the
        # family fingerprint, so assert it instead of failing open.
        staged_types = {f.name: f.dataType for f in staged_sigs.schema.fields}
        new_types = {f.name: f.dataType for f in new_sigs.schema.fields}
        if staged_types != new_types:
            raise ValueError(
                "incremental_near_dup: staged signature schema "
                f"{staged_types} != batch signature schema {new_types} — "
                "the staged corpus was built with a different hash family "
                "(portable=) than this call; re-stage or match the flag"
            )
        old_sigs = staged_sigs.join(
            new_docs.select("doc_id"), on="doc_id", how="left_anti"
        )

        def bands_of(sigs: DataFrame, origin: str) -> DataFrame:
            return band_rows(sigs, "doc_id").select(
                F.col("__id").alias("doc_id"), F.lit(origin).alias("origin"),
                F.col("__band").alias("band"),
            )

        new_bands = bands_of(new_sigs, "new")
        other = bands_of(old_sigs, "old").unionByName(new_bands)
        candidates = (
            new_bands.select(F.col("doc_id").alias("id_b"), "band")
            .join(
                other.select(
                    F.col("doc_id").alias("id_a"), F.col("origin").alias("origin_a"), "band"
                ),
                on="band",
            )
            .filter((F.col("origin_a") == "old") | (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b")
            .distinct()
        )
        if staged_new is not None:
            new_sh = staged_new.select(
                "doc_id", F.col("shingles").alias("sh")
            )
        else:
            new_sh = new_docs.select(
                "doc_id", word_shingles(F.col("text")).alias("sh")
            )
        # replay-safety on the SHINGLE side too: a re-delivered batch's
        # rows may already sit in the staged table, and keeping both
        # copies would fan every verified pair out twice through the id_a
        # join (the sigs table above gets the same left_anti)
        all_sh = (
            spark.table(tables["shingles"])
            .join(new_docs.select("doc_id"), on="doc_id", how="left_anti")
            .unionByName(new_sh)
        )
        verified = (
            candidates.join(
                all_sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
            )
            .join(new_sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
            .withColumn("jaccard", jaccard_of_shingles(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        doomed = verified.select(F.col("id_b").alias("doc_id")).distinct()
        survivors = new_docs.join(doomed, "doc_id", "left_anti")
        # caller releases once the consuming action has run — the same
        # handle-riding contract as near_dup_removal's staged_sigs
        verified.staged_sigs = staged_new
    except BaseException:
        # ANY raise before the handle reaches the caller (missing or
        # renamed staged table, schema mismatch, analysis error) must
        # release the just-persisted batch signatures, or the cache
        # entry leaks for the session lifetime (round-11 advice item)
        if staged_new is not None:
            staged_new.unpersist()
        raise
    return survivors, verified


def append_corpus_artifacts(
    new_docs: DataFrame,
    tables: dict[str, str],
    portable: bool = False,
    salt_chunk_tokens: int | None = None,
    chunks: DataFrame | None = None,
    validate_ids: bool = True,
) -> None:
    """Fold an accepted batch into the staged artifacts: appended
    bucket files join the existing spec (same bucket count/key), so
    the next incremental run still reads bucket-aligned. Same
    plain/salted/pre-chunked legs as the staging/increment functions
    (the round-11 review caught this one function still re-paying the
    per-row shingle skew after the increment had just computed the
    batch skew-proof).

    CAUTION: any still-lazy plan built over these tables (e.g. the
    survivors frame from ``incremental_near_dup``) re-reads them on its
    next action and would now see the batch's own signatures —
    materialize (collect/write) the survivors BEFORE appending."""
    if chunks is not None or salt_chunk_tokens is not None:
        handle = _staged_sigs_for(
            new_docs, portable, salt_chunk_tokens, chunks,
            validate_ids, "append_corpus_artifacts",
        )
        staged = handle.withColumnRenamed("shingles", "sh")
        try:
            staged.select("doc_id", "sh").write.mode("append").format(
                "parquet"
            ).insertInto(tables["shingles"])
            staged.drop("sh").write.mode("append").format(
                "parquet"
            ).insertInto(tables["sigs"])
        finally:
            handle.unpersist()
        return
    sh = new_docs.select("doc_id", word_shingles(F.col("text")).alias("sh"))
    sh.write.mode("append").format("parquet").insertInto(tables["shingles"])
    sigs = with_minhash(
        new_docs.select("doc_id", "text"), "text", portable=portable
    ).drop("text")
    sigs.write.mode("append").format("parquet").insertInto(tables["sigs"])


def streaming_corpus_ingest(
    spark,
    input_dir: str,
    tables: dict[str, str],
    accepted_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    schema: str = "doc_id bigint, text string",
    portable: bool = False,
    shards_dir: str | None = None,
    shard_kwargs: dict | None = None,
):
    """Continuous corpus ingest: document files land in ``input_dir``,
    each micro-batch dedups against the staged artifacts via
    ``incremental_near_dup``, survivors land in
    ``accepted_dir/batch=<id>``, and the artifacts fold the survivors
    in for the NEXT batch.

    With ``shards_dir`` set the loop also keeps a TRAINING-SHARD set
    current: each batch's survivors append to the shard stream via
    the marker-idempotent ``append_batch_shards`` (shard_writer.py) —
    stream in documents, train off contiguous packed shards, no
    nightly re-shard. ``shard_kwargs`` forwards budget/chunking knobs.

    Crash-replay semantics: the dedup plan executes ONCE per batch
    (the idempotent per-batch write; the artifact append re-reads the
    written parquet), the per-batch output directory is OVERWRITTEN (so a
    re-delivered batch rewrites, never duplicates, its accepted rows),
    and ``incremental_near_dup`` ignores staged rows carrying the
    batch's own ids — so a replay after a completed artifact append
    still computes the original survivor set. The one non-idempotent
    residue is artifact-table row duplication for a replayed batch,
    which inflates storage but not results (the pair candidates are
    DISTINCT and dooming is by id set).

    Returns the StreamingQuery.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        survivors, _ = incremental_near_dup(
            batch_df.select("doc_id", "text"), tables, threshold, portable=portable
        )
        # execute the dedup plan ONCE via the idempotent per-batch
        # write, then RE-READ the parquet for the artifact append —
        # never collect(): a big backlog batch carrying full document
        # text would OOM the driver
        out = f"{accepted_dir}/batch={batch_id}"
        survivors.write.mode("overwrite").parquet(out)
        spark_b = batch_df.sparkSession
        accepted = spark_b.read.schema(survivors.schema).parquet(out)
        if not accepted.isEmpty():
            append_corpus_artifacts(accepted, tables, portable=portable)
            if shards_dir is not None:
                from etl_guiacores_spark.plans.shard_writer import (
                    append_batch_shards,
                )

                append_batch_shards(
                    accepted.select("doc_id", "text"),
                    shards_dir,
                    batch_id,
                    **(shard_kwargs or {}),
                )

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# every stage dir run_corpus_pipeline ever lands via _land. The
# missing-fingerprint resume guard probes ALL of them: any one
# surviving fence means the out_dir holds prior artifacts whose
# provenance a missing pipeline_config.json can no longer vouch for.
# Keep in sync with the _land call sites below. The shard writer's
# output is probed separately via its stats.json sidecar — the shard
# resume path reads stats.json, not a _SUCCESS fence at shards/, so a
# fence probe there would be dead code (round-10 review finding).
_LANDED_STAGES = (
    "bronze_chunks",
    "filtered",
    "decontaminated",
    "eval_span_accounting",
    "eval_span_stripped",
    "bronze_rechunked",
    "dup_pairs",
    "clean",
    "span_accounting",
    "span_stripped",
    "bronze_restripped",
    "gopher_gated",
    "sampled",
    "chunks",
    "vocab",
)


def _fenced(spark, path: str) -> bool:
    """True when ``path`` is a committed parquet stage dir
    (``_SUCCESS`` present), via the Hadoop FileSystem API so resume
    works on any Spark path scheme (the streaming drift.py lesson)."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hp))


def _read_text(spark, path: str) -> str | None:
    """Read a small sidecar (pipeline_config.json / metrics.json)
    through the Hadoop FileSystem API, like ``_fenced``. The round-8
    advice caught the asymmetry: stage fencing was scheme-agnostic but
    the fingerprint used ``os.path`` — on an HDFS/S3 ``out_dir`` the
    fingerprint was never found, so ``resume=True`` silently reused
    ``_SUCCESS``-fenced stages that may have been produced under a
    DIFFERENT config. Returns None when the file does not exist."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hp):
        return None
    stream = fs.open(hp)
    try:
        return str(
            jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        )
    finally:
        stream.close()


def _write_text(spark, path: str, text: str) -> None:
    """Overwrite-write a small sidecar via the Hadoop FileSystem API
    (creates parent dirs on any scheme; replaces os.makedirs+open)."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _config_fingerprint(config: CorpusConfig) -> dict:
    from dataclasses import asdict

    d = asdict(config)
    d["mixture_strata"] = list(d["mixture_strata"])
    d["allowed_langs"] = list(d["allowed_langs"])
    return d


def run_corpus_pipeline(
    docs: DataFrame,
    out_dir: str,
    config: CorpusConfig | None = None,
    progress_callback=None,
    resume: bool = False,
) -> dict:
    """``progress_callback(stage, info)`` fires after each stage lands
    (raw/filtered/exact_dedup/near_dup/chunks/vocab/done) with the
    counts the run computes anyway — the same seam as
    ``run_batch_pipeline``, so the CLI's ``--progress`` lines and
    ``--serve-port`` board cover corpus mode too.

    ``resume=True`` makes a rerun over the same ``out_dir`` skip every
    stage whose handoff is already landed (``_SUCCESS``-fenced): the
    stage's stored table is read back (one cheap count job) instead of
    recomputed, so a run that died at near-dup restarts WITHOUT paying
    the filter/decontam legs again — what "stage boundaries are
    parquet tables" is for at 100 TB. Guarded by a config fingerprint
    (``{out_dir}/pipeline_config.json``): resuming with ANY changed
    CorpusConfig field refuses loudly — stale artifacts from a
    different configuration must never silently feed downstream
    stages. A non-resume run overwrites everything and rewrites the
    fingerprint. Non-landed derivations (exact dedup, the survivor
    rule) recompute from their landed upstream — the resume unit is
    the landed artifact, exactly the restart granularity the stored
    tables give any external orchestrator. The fingerprint also
    covers the INPUT's identity (schema + non-empty row count), so
    ``resume=True`` with a different ``docs`` refuses too; and resume
    over fenced stage artifacts that carry NO fingerprint (pre-guard
    artifacts, or a deleted sidecar) refuses rather than trusting
    them. The PIPELINE's sidecar IO (fingerprint, metrics.json) goes
    through the Hadoop FileSystem API so resume works on any Spark
    path scheme, exactly like the ``_SUCCESS`` fencing itself. The
    optional shard writer is the one local-only component: its atomic
    manifest publish is a posix ``os.rename`` swap by design
    (shard_writer.py), so ``write_shards=True`` with a remote
    ``out_dir`` scheme refuses loudly instead of half-working.
    """
    import json as _json

    from pyspark.sql import Observation

    from etl_guiacores_spark.sources.tables import spread_narrow_input

    config = config or CorpusConfig()
    if config.decontam_spans and config.benchmark_path is None:
        raise ValueError(
            "decontam_spans requires benchmark_path (the eval set "
            "whose quoted spans get excised)"
        )
    if config.prechunk and (
        config.salt_chunk_tokens is None or config.salt_chunk_tokens < 3
    ):
        raise ValueError(
            "prechunk=True requires salt_chunk_tokens >= 3 (the "
            "bronze chunk size; the near-dup shingle n=3 needs every "
            f"non-final chunk to hold >= n-1 tokens) — got "
            f"{config.salt_chunk_tokens!r}"
        )
    if config.write_shards and "://" in out_dir and not out_dir.startswith(
        "file://"
    ):
        raise ValueError(
            "run_corpus_pipeline: write_shards=True requires a local "
            f"(posix) out_dir — got {out_dir!r}. The shard writer's "
            "atomic manifest publish is an os.rename swap "
            "(plans/shard_writer.py) and its stats.json sidecars are "
            "driver-local; write shards to local disk and ship them, "
            "or run the pipeline without shards on this scheme."
        )
    emit = progress_callback or (lambda stage, info: None)
    spark = docs.sparkSession

    # spread once at ingest (a few-row-group parquet input would
    # otherwise serialize every per-row stage), drop empty texts, and
    # count — the count is paid every run anyway (the "raw" metric),
    # and together with the schema it identifies the INPUT in the
    # resume fingerprint: artifacts computed from a different input
    # are exactly as stale as artifacts from a different config.
    docs = spread_narrow_input(docs, "doc_id")
    docs = docs.filter(F.length(F.trim("text")) > 0)
    if config.salt_chunk_tokens is not None:
        # the salted stages' chunk-merge key contract, validated ONCE
        # here riding the n_raw job the run pays anyway — the salted
        # operators are then called with validate_ids=False so a
        # RESUME (which reads stages back without computing them)
        # doesn't pay three wasted validation scans (the first soak
        # after the eager checks failed its resume<wall/2 assertion)
        from etl_guiacores_spark.operators.chunking import (
            id_contract_counters,
        )

        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            *id_contract_counters("doc_id"),
        ).first()
        n_raw = row["n"]
        if (row["nulls"] or 0) or (row["dups"] or 0):
            raise ValueError(
                "run_corpus_pipeline: salt_chunk_tokens requires unique "
                f"non-null doc_id (the chunk-merge key) — found "
                f"{row['nulls'] or 0} NULL and {row['dups'] or 0} "
                "duplicate id row(s) in the input"
            )
    else:
        n_raw = docs.count()

    fp = _config_fingerprint(config)
    fp["__input_schema"] = docs.schema.simpleString()
    fp["__input_rows"] = n_raw

    fp_path = f"{out_dir}/pipeline_config.json"
    stored_text = _read_text(spark, fp_path) if resume else None
    if stored_text is not None:
        stored = _json.loads(stored_text)
        if stored != fp:
            diff = sorted(
                k for k in fp if stored.get(k) != fp[k]
            ) + sorted(k for k in stored if k not in fp)
            raise ValueError(
                "run_corpus_pipeline(resume=True): the landed artifacts "
                f"in {out_dir} were produced under a DIFFERENT config "
                f"or input (fields differing: {diff}) — resuming would "
                "feed stale stages downstream. Rerun without resume, "
                "or use a fresh out_dir."
            )
    elif resume and (
        any(_fenced(spark, f"{out_dir}/{s}") for s in _LANDED_STAGES)
        or _read_text(spark, f"{out_dir}/shards/stats.json") is not None
    ):
        # probe EVERY landed stage name, not just the first: a torn
        # out_dir whose "filtered" fence is missing but whose later
        # fences (clean, dup_pairs, ...) survive would otherwise write
        # a fresh fingerprint here and have _land silently reuse those
        # unverified later-stage artifacts (round-9 advice item). The
        # shard output is probed via stats.json — what the shard
        # resume path below actually reuses
        raise ValueError(
            "run_corpus_pipeline(resume=True): fenced stage artifacts "
            f"exist in {out_dir} but no pipeline_config.json fingerprint "
            "does — they predate the fingerprint guard or the sidecar "
            "was deleted, so their provenance cannot be checked. Rerun "
            "without resume, or use a fresh out_dir."
        )
    else:
        _write_text(
            spark, fp_path, _json.dumps(fp, indent=1, sort_keys=True)
        )

    def _land(df: DataFrame, name: str) -> tuple[DataFrame, int]:
        """Write a stage handoff with its count OBSERVED on the same
        job, then re-read the parquet: every downstream stage consumes
        the STORED table, so the expensive upstream lineage (scoring,
        shingling, the LSH verify) executes exactly once per stage
        instead of once per downstream action — the same
        execute-once-then-reread discipline run_batch_pipeline applies
        to bronze/silver/gold. Explicit schema on the re-read: an
        empty stage writes no row groups and inference would crash.
        Under ``resume``, a landed (``_SUCCESS``-fenced) stage is read
        back without recomputing ``df``'s lineage."""
        path = f"{out_dir}/{name}"
        if resume and _fenced(spark, path):
            back = spark.read.schema(df.schema).parquet(path)
            n = back.count()
            emit(f"{name}_resumed", {"records": n})
            return back, n
        obs = Observation(f"{name}_metrics")
        gio.write_handoff(
            df.observe(obs, F.count(F.lit(1)).alias("records")),
            path,
        )
        back = spark.read.schema(df.schema).parquet(path)
        return back, obs.get["records"]

    emit("raw", {"records": n_raw})

    bronze = None
    if config.prechunk:
        # the one-time chunk build: THIS write pays the fat-document
        # tokenization once; every salted stage below scans the
        # landed table's balanced chunk rows instead (and a resumed
        # run re-reads it without re-chunking at all)
        from etl_guiacores_spark.operators.chunking import (
            prechunk_documents,
        )

        bronze, n_bronze = _land(
            prechunk_documents(
                docs, chunk_tokens=config.salt_chunk_tokens
            ),
            "bronze_chunks",
        )
        emit("bronze_chunks", {"records": n_bronze})

    filtered, n_filtered = _land(
        filter_documents(docs, config, validate_ids=False, chunks=bronze),
        "filtered",
    )
    emit("filtered", {"records": n_filtered})

    exact = exact_dedup(filtered)
    n_exact = exact.count()
    emit("exact_dedup", {"records": n_exact})

    n_decontam = None
    if config.benchmark_path is not None:
        from etl_guiacores_spark.operators.decontam import contaminated_doc_ids_bloom

        bench = spark.read.parquet(config.benchmark_path).select("text")
        dirty = contaminated_doc_ids_bloom(
            exact, bench, min_overlaps=config.decontam_min_overlaps
        ).select("doc_id")
        exact, n_decontam = _land(
            exact.join(dirty, "doc_id", "left_anti"), "decontaminated"
        )
        emit("decontam", {"records": n_decontam})

        if config.decontam_spans:
            from etl_guiacores_spark.operators.decontam import (
                cross_span_contamination,
            )
            from etl_guiacores_spark.operators.dedupe import (
                prechunked_strip_given_spans,
                strip_given_spans,
            )
            from etl_guiacores_spark.operators.textstats import (
                tokens as _dtoks,
            )

            # pre-chunked span leg: detection AND apply read the
            # ingest bronze's balanced chunk rows (exact's text is
            # still ingest text here) — bit-identical spans/strips
            # with no whole-document token walk. The boundary
            # requirement (non-final chunks hold >= n-1 tokens) must
            # be checked HERE because the operators run validate=False
            # on the pipeline's own bronze: an undersized chunk would
            # silently lose boundary n-grams.
            span_bronze = (
                bronze
                if bronze is not None
                and config.salt_chunk_tokens
                >= config.decontam_span_n - 1
                else None
            )
            ev_spans = cross_span_contamination(
                exact,
                bench.select(F.lit(0).alias("doc_id"), "text"),
                n=config.decontam_span_n,
                chunks=span_bronze,  # None -> whole-document leg
                validate=False,
            )
            if span_bronze is not None:
                excised = prechunked_strip_given_spans(
                    span_bronze, ev_spans, keep_text=True,
                    validate=False, keep_ids=exact,
                    # the pipeline wrote this bronze at exactly this
                    # chunk size -> the apply can assign spans to
                    # chunks arithmetically (no per-chunk span-array
                    # fan-out)
                    chunk_tokens=config.salt_chunk_tokens,
                )
            else:
                excised = strip_given_spans(
                    exact, ev_spans, keep_text=True
                )
            ev_acct, _ = _land(
                excised.select(
                    "doc_id", "n_tokens", "dup_tokens",
                    "retained_tokens", "retained_md5",
                ),
                "eval_span_accounting",
            )
            rebuilt = (
                exact.join(
                    excised.select(
                        "doc_id", F.col("retained_text").alias("__rt")
                    ),
                    "doc_id",
                    "left",
                )
                .withColumn("text", F.coalesce("__rt", "text"))
                .drop("__rt")
            )
            exact, n_excised = _land(rebuilt, "eval_span_stripped")
            ev_tot = ev_acct.agg(
                F.sum("n_tokens").alias("t"),
                F.sum("dup_tokens").alias("d"),
                F.sum("retained_tokens").alias("r"),
            ).first()
            ev_rewritten = (
                exact.join(ev_acct.select("doc_id"), "doc_id")
                .select(F.sum(F.size(_dtoks(F.col("text")))).alias("k"))
                .first()["k"]
            ) or 0
            if (
                ev_tot["t"] != (ev_tot["d"] or 0) + (ev_tot["r"] or 0)
            ) or ev_rewritten != (ev_tot["r"] or 0):
                raise RuntimeError(
                    "eval-span-strip token conservation violated: "
                    f"total={ev_tot['t']} dup={ev_tot['d']} "
                    f"retained={ev_tot['r']} rewritten={ev_rewritten}"
                )
            emit(
                "decontam_spans",
                {
                    "records": n_excised,
                    "excised_tokens": int(ev_tot["d"] or 0),
                },
            )

            if bronze is not None:
                # the span excision rewrote survivor TEXT (every
                # non-empty doc: retained_text is token-rejoined), so
                # the ingest bronze no longer concatenates to the
                # current documents — re-chunk the landed rewritten
                # survivors ONCE, fenced like the ingest bronze, so
                # the near-dup leg below still reads balanced chunk
                # rows instead of falling back to in-task chunking
                # (the last path where one task had to tokenize a
                # whole fat document — round-11 verdict, item #2)
                from etl_guiacores_spark.operators.chunking import (
                    prechunk_documents as _prechunk,
                )

                bronze, n_rechunk = _land(
                    _prechunk(
                        exact, chunk_tokens=config.salt_chunk_tokens
                    ),
                    "bronze_rechunked",
                )
                emit("bronze_rechunked", {"records": n_rechunk})

    # land the VERIFIED PAIRS, not the lazy survivor plan: both the
    # survivor derivation and the pair count then read the stored pair
    # list, so the LSH+Jaccard leg — the most expensive in the
    # pipeline — executes exactly once
    survivors_lazy, dup_pairs = near_dup_removal(
        exact,
        config.near_dup_jaccard,
        cluster_exact=config.cluster_exact,
        portable=config.portable_hashes,
        salt_chunk_tokens=config.salt_chunk_tokens,
        validate_ids=False,  # checked once at ingest
        # bronze is always current here: it reflects ingest text, and
        # when decontam_spans rewrote documents the bronze_rechunked
        # refresh above re-derived it from the landed rewritten text
        chunks=bronze,
    )
    pairs, n_pairs = _land(dup_pairs, "dup_pairs")
    staged_bands = getattr(dup_pairs, "staged_bands", None)
    if staged_bands is not None:  # the pairs are materialized — release
        staged_bands.unpersist()
    staged_sigs = getattr(dup_pairs, "staged_sigs", None)
    if staged_sigs is not None:  # salted path: release the sig cache too
        staged_sigs.unpersist()
    if config.cluster_exact:
        from etl_guiacores_spark.operators.graph import connected_components

        labels = connected_components(
            exact.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id"
        )
        survivors_lazy = exact.join(
            labels.filter(F.col("id") == F.col("component")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
        )
    else:
        survivors_lazy = exact.join(
            pairs.select(F.col("id_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
    survivors, n_clean = _land(survivors_lazy, "clean")
    emit("near_dup", {"records": n_clean})

    span_totals = None
    if config.strip_spans:
        from etl_guiacores_spark.operators.dedupe import (
            prechunked_repeated_spans,
            prechunked_strip_given_spans,
            strip_repeated_spans,
        )

        # pre-chunked span leg: at this point bronze (when on) is
        # CURRENT for the survivors — the ingest table, or the
        # bronze_rechunked refresh when decontam_spans rewrote text —
        # so both the repeated-span detection and the strip read
        # balanced chunk rows. keep_ids matters for CORRECTNESS here,
        # not just cost: min_docs counts distinct docs and must count
        # survivors only. Boundary requirement checked here
        # (validate=False on our own bronze), as in the decontam leg.
        if (
            bronze is not None
            and config.salt_chunk_tokens >= config.span_n - 1
        ):
            rep_spans = prechunked_repeated_spans(
                bronze,
                n=config.span_n,
                min_docs=config.span_min_docs,
                validate=False,
                keep_ids=survivors,
            )
            stripped = prechunked_strip_given_spans(
                bronze, rep_spans, keep_text=True,
                validate=False, keep_ids=survivors,
                chunk_tokens=config.salt_chunk_tokens,
            )
        else:
            stripped = strip_repeated_spans(
                survivors,
                n=config.span_n,
                min_docs=config.span_min_docs,
                keep_text=True,
            )
        accounting, _ = _land(
            stripped.select(
                "doc_id", "n_tokens", "dup_tokens", "retained_tokens",
                "retained_md5",
            ),
            "span_accounting",
        )
        # survivors whose text tokenizes to [] pass through untouched
        # (strip_repeated_spans excludes them by contract)
        rebuilt = (
            survivors.join(
                stripped.select(
                    "doc_id", F.col("retained_text").alias("__rt")
                ),
                "doc_id",
                "left",
            )
            .withColumn("text", F.coalesce("__rt", "text"))
            .drop("__rt")
        )
        survivors, n_span = _land(rebuilt, "span_stripped")
        # conservation, asserted on the STORED artifacts: per-doc
        # split sums to the whole, and the written stripped text
        # re-tokenizes to exactly the accounted retained total
        from etl_guiacores_spark.operators.textstats import tokens as _toks

        totals = accounting.agg(
            F.sum("n_tokens").alias("t"),
            F.sum("dup_tokens").alias("d"),
            F.sum("retained_tokens").alias("r"),
        ).first()
        rewritten = (
            survivors.join(accounting.select("doc_id"), "doc_id")
            .select(F.sum(F.size(_toks(F.col("text")))).alias("k"))
            .first()["k"]
        ) or 0
        if (totals["t"] != (totals["d"] or 0) + (totals["r"] or 0)) or (
            rewritten != (totals["r"] or 0)
        ):
            raise RuntimeError(
                "span-strip token conservation violated: "
                f"total={totals['t']} dup={totals['d']} "
                f"retained={totals['r']} rewritten={rewritten}"
            )
        span_totals = {
            "span_docs": n_span,
            "span_total_tokens": int(totals["t"] or 0),
            "span_dup_tokens": int(totals["d"] or 0),
            "span_retained_tokens": int(totals["r"] or 0),
        }
        emit("span_strip", {"records": n_span})

        if bronze is not None and config.gopher_gate:
            # the strip rewrote survivor text a second time — refresh
            # the chunk table once more from the landed span_stripped
            # artifact (cheap: the funnel is narrow here) so the
            # gopher gate below reads balanced chunk rows too; with
            # the pre-chunked span legs above, NO stage in any config
            # now tokenizes a whole document in-task after ingest
            from etl_guiacores_spark.operators.chunking import (
                prechunk_documents as _prechunk_post,
            )

            bronze, n_restrip = _land(
                _prechunk_post(
                    survivors, chunk_tokens=config.salt_chunk_tokens
                ),
                "bronze_restripped",
            )
            emit("bronze_restripped", {"records": n_restrip})

    n_before_gopher = n_clean if span_totals is None else span_totals["span_docs"]
    n_gopher = None
    if config.gopher_gate:
        from etl_guiacores_spark.operators.textstats import (
            gopher_quality,
            salted_gopher_quality,
        )

        if bronze is not None:
            # bronze path: survivor text matches the chunk table
            # (untouched since ingest, or refreshed after whichever
            # span stage rewrote it last), so the gate reads balanced
            # chunk rows keyed down to the survivor ids — identical
            # metrics and flags
            from etl_guiacores_spark.operators.textstats import (
                prechunked_gopher_quality,
            )

            gq = prechunked_gopher_quality(
                bronze.join(
                    survivors.select("doc_id"), "doc_id", "left_semi"
                ),
                min_tokens=config.gopher_min_tokens,
                max_tokens=config.gopher_max_tokens,
                validate=False,  # the pipeline wrote the bronze table
            )
        elif config.salt_chunk_tokens is not None:
            # skew-proof gate, same salt knob as the shingle/filter
            # legs — identical metrics and pass flags, chunk-merged
            gq = salted_gopher_quality(
                survivors,
                min_tokens=config.gopher_min_tokens,
                max_tokens=config.gopher_max_tokens,
                chunk_tokens=config.salt_chunk_tokens,
                validate_ids=False,  # checked once at ingest
            )
        else:
            gq = gopher_quality(
                survivors,
                min_tokens=config.gopher_min_tokens,
                max_tokens=config.gopher_max_tokens,
            )
        passing = gq.filter(F.col("passes") == 1).select("doc_id")
        survivors, n_gopher = _land(
            survivors.join(passing, "doc_id", "left_semi"), "gopher_gated"
        )
        if n_gopher > n_before_gopher:
            raise RuntimeError(
                "gopher gate produced MORE docs than it was given "
                f"({n_gopher} > {n_before_gopher}) — a filter stage "
                "must be monotone"
            )
        emit("gopher_gate", {"records": n_gopher})

    n_sampled = None
    if config.mixture_total is not None:
        from etl_guiacores_spark.operators.sampling import (
            exact_quota_stratified,
        )

        missing = [c for c in config.mixture_strata
                   if c not in survivors.columns]
        if missing:
            raise ValueError(
                f"mixture_total set but strata column(s) {missing} are "
                f"not in the document schema {survivors.columns} — "
                "carry them through ingest (the CLI keeps 'source' "
                "when present)"
            )
        survivors, n_sampled = _land(
            exact_quota_stratified(
                survivors,
                list(config.mixture_strata),
                config.mixture_total,
                key_col="doc_id",
            ),
            "sampled",
        )
        n_avail = n_gopher if n_gopher is not None else n_before_gopher
        want = min(config.mixture_total, n_avail)
        if n_sampled != want:
            raise RuntimeError(
                "mixture quota did not land the exact budget: got "
                f"{n_sampled}, expected {want} (= min(total="
                f"{config.mixture_total}, available={n_avail}))"
            )
        emit("mixture", {"records": n_sampled})

    chunks, n_chunks = _land(
        chunk_documents(
            survivors, chunk_tokens=config.chunk_tokens, overlap=config.chunk_overlap
        ),
        "chunks",
    )
    emit("chunks", {"records": n_chunks})
    vocab, n_vocab = _land(build_vocab(survivors, top_k=config.vocab_top_k), "vocab")
    emit("vocab", {"records": n_vocab})

    shard_stats = None
    shard_stats_text = (
        _read_text(spark, f"{out_dir}/shards/stats.json")
        if (config.write_shards and resume)
        else None
    )
    if shard_stats_text is not None:
        shard_stats = _json.loads(shard_stats_text)
        emit(
            "shards_resumed",
            {
                "records": shard_stats["n_sequences"],
                "n_shards": shard_stats["n_shards"],
            },
        )
    elif config.write_shards:
        from etl_guiacores_spark.plans.shard_writer import (
            write_training_shards,
        )

        shard_stats = write_training_shards(
            survivors.select("doc_id", "text"),
            f"{out_dir}/shards",
            budget_tokens=config.budget_tokens,
            chunk_tokens=config.chunk_tokens,
            overlap=config.chunk_overlap,
            num_bins=config.shard_bins,
            sequences_per_shard=config.sequences_per_shard,
        )
        # Composition invariants, asserted on the STORED artifacts:
        # the shard writer re-chunks with the same parameters, so its
        # chunk count must equal the pipeline's landed chunks table,
        # and the manifest's token total must equal the chunk tables'
        # token sum — packing may only rearrange tokens, never create
        # or drop them. A disagreement means two stages disagree on
        # tokenization, the bug class that silently truncates
        # training data.
        chunk_tok = (
            chunks.agg(F.sum("n_chunk_tokens").cast("long").alias("t"))
            .first()["t"]
        ) or 0
        if shard_stats["n_chunks"] != n_chunks:
            raise RuntimeError(
                "shard-writer chunk count disagrees with the chunks "
                f"stage: {shard_stats['n_chunks']} != {n_chunks}"
            )
        if shard_stats["total_tokens"] != chunk_tok:
            raise RuntimeError(
                "token conservation violated between chunks and shard "
                f"manifest: manifest={shard_stats['total_tokens']} "
                f"chunks={chunk_tok}"
            )
        emit(
            "shards",
            {
                "records": shard_stats["n_sequences"],
                "n_shards": shard_stats["n_shards"],
            },
        )

    metrics = {
        "raw_docs": n_raw,
        "after_quality_lang_filter": n_filtered,
        "after_exact_dedup": n_exact,
        "after_near_dup": n_clean,
        "near_dup_pairs": n_pairs,
        "chunks": n_chunks,
        "vocab_size": n_vocab,
    }
    if n_decontam is not None:
        metrics["after_decontamination"] = n_decontam
    if span_totals is not None:
        metrics.update(span_totals)
    if n_gopher is not None:
        metrics["after_gopher_gate"] = n_gopher
    if n_sampled is not None:
        metrics["after_mixture_quota"] = n_sampled
    if shard_stats is not None:
        metrics["shards"] = shard_stats
    _write_text(
        spark,
        f"{out_dir}/metrics.json",
        _json.dumps(metrics, indent=2, ensure_ascii=False, default=str),
    )
    emit("done", {"records": n_clean})
    return metrics
