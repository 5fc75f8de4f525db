"""Incremental discovery (SURVEY §2.10) — the "Ver más" loop, Spark-first.

The reference clicks a load-more button until 3 consecutive rounds
discover nothing new (reference: src/extractors/sequential_collector.py:452-495),
deduping by business id as it goes (:591-594). Two engine forms:

1. ``discover_until_idle`` — a driver-side micro-batch loop over ANY
   batch-producing callable: per batch, left-anti join against what's
   known, append only novel keys, stop after ``idle_rounds`` empty
   batches. This is exactly the reference's semantics with the dedupe
   and resume state as DataFrames instead of Python sets.

2. Streaming form (tests/test_streaming.py): new listing pages land
   in a directory watched by a file-source ``readStream``; parse +
   ``dropDuplicates`` + checkpointed append sink gives exactly-once
   accumulation (L2's idempotent-append intent,
   reference: src/extractors/sequential_scraper.py:310-327).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def discover_until_idle(
    batches: Iterator[DataFrame] | Callable[[int], DataFrame | None],
    key: str = "id_negocio",
    idle_rounds: int = 3,
    max_rounds: int = 1000,
    progress_callback: Callable[[str, dict], None] | None = None,
) -> DataFrame | None:
    """Accumulate unique-by-key rows from successive discovery batches
    until ``idle_rounds`` consecutive batches yield nothing new.

    ``batches`` is either an iterator of DataFrames or a callable
    ``round_index -> DataFrame | None`` (None = source exhausted).
    Returns the accumulated DataFrame (or None if nothing arrived).

    Each round's novelty check is a broadcast-friendly anti-join on a
    single key column; accumulated state stays distributed (no
    driver-side set, unlike the reference).

    ``progress_callback(stage, info)`` mirrors the reference's UI hook
    (reference: streamlit_app.py:66-81, sequential_collector.py:452):
    called once per round with ``("round", {round, n_new, total,
    idle})`` and once at the end with ``("done", {rounds, total})`` —
    counts the loop already computes, so the hook costs no extra job.
    """
    get = batches if callable(batches) else lambda i, it=iter(batches): next(it, None)
    emit = progress_callback or (lambda stage, info: None)

    known: DataFrame | None = None
    total = 0
    idle = 0
    rounds = 0
    rounds_since_cut = 0
    for i in range(max_rounds):
        batch = get(i)
        if batch is None:
            break
        rounds = i + 1
        batch = batch.dropDuplicates([key])
        if known is None:
            novel = batch
        else:
            novel = batch.join(known.select(key), on=key, how="left_anti")
        # materialize the round's lineage ONCE, then count the blocks:
        # counting first and checkpointing later would execute the
        # dedupe + anti-join twice per round, and a non-deterministic
        # batch source could even diverge between the two runs
        novel = novel.localCheckpoint(eager=True)
        # the reference's stop-condition needs the novel count
        # (sequential_collector.py:465-471)
        n_new = novel.count()
        if n_new == 0:
            idle += 1
            emit("round", {"round": i, "n_new": 0, "total": total, "idle": idle})
            if idle >= idle_rounds:
                break
            continue
        idle = 0
        total += n_new
        emit("round", {"round": i, "n_new": n_new, "total": total, "idle": 0})
        known = novel if known is None else known.unionByName(novel)
        # keep the lineage shallow so round N doesn't replan N-1 unions
        # — but only every K rounds: each novel batch is ALREADY
        # checkpointed above, so the union plan between cuts is a flat
        # fan-in of at most K checkpointed legs (depth 1). Re-cutting
        # the full accumulation every round would copy all previously
        # checkpointed rows again — O(rounds x total) I/O on a long
        # crawl instead of O(total x rounds / K).
        rounds_since_cut += 1
        if rounds_since_cut >= 8:
            known = known.localCheckpoint(eager=True)
            rounds_since_cut = 0
    emit("done", {"rounds": rounds, "total": total})
    return known
