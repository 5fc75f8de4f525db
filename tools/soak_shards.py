"""End-to-end soak: bronze -> silver -> training shards at 20x docs.

The operator stress harness (tools/stress_corpus.py) covers the
corpus pipeline in isolation; this soak runs the FULL path a training
job takes — quality filter, exact dedup, LSH near-dup removal, then
the shard writer (chunk -> pack -> distributed prefix sum -> range-
clustered shards + manifest) — and asserts the conservation
invariants on the WRITTEN artifacts, not the in-memory plan:

- every packed token is a chunk token (manifest total == chunk total)
- global_seq is dense and contiguous across shards (0..n-1)
- shards tile the token stream: each shard's first_token equals the
  previous shard's first_token + n_tokens, starting at 0
- no sequence exceeds the budget
- fill ratio (budget utilisation) is reported, not assumed

Two shard-writer passes: one over the pipeline's survivors (the
faithful composition — dedup collapses the 20x replica cliques back
toward the base corpus) and one over the full pre-dedup replica
volume (the packing/prefix-sum/shard-IO stage soak at ~100k docs).

Usage: python tools/soak_shards.py [--replicas 20] [--sf DIR]
Prints ONE JSON line with per-stage seconds and invariant results.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def assert_invariants(spark, out_dir: str, stats: dict, budget: int) -> dict:
    from pyspark.sql import functions as F

    chunks = spark.read.parquet(f"{out_dir}/chunks")
    shards = spark.read.parquet(f"{out_dir}/shards")
    manifest = [r.asDict() for r in
                spark.read.parquet(f"{out_dir}/manifest")
                .orderBy("shard_id").collect()]

    chunk_tokens = chunks.agg(F.sum("n_chunk_tokens")).first()[0]
    agg = shards.agg(
        F.sum("n_tokens").alias("tok"),
        F.count("*").alias("n"),
        F.min("global_seq").alias("lo"),
        F.max("global_seq").alias("hi"),
        F.count_distinct("global_seq").alias("nd"),
        F.max((F.col("n_tokens") > budget).cast("int")).alias("over"),
    ).first()
    assert agg["tok"] == chunk_tokens == stats["total_tokens"], (
        agg["tok"], chunk_tokens, stats["total_tokens"])
    assert (agg["lo"], agg["hi"], agg["nd"]) == (0, agg["n"] - 1, agg["n"])
    assert agg["over"] == 0, "sequence over budget"
    run = 0
    for m in manifest:
        assert m["first_token"] == run, (m["shard_id"], m["first_token"], run)
        run += m["n_tokens"]
    assert run == chunk_tokens
    return {"invariants": "ok", "checked_sequences": int(agg["n"])}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.plans.corpus_pipeline import (
        CorpusConfig,
        run_corpus_pipeline,
    )
    from etl_guiacores_spark.plans.shard_writer import write_training_shards
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="soak-shards")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    reps = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep")
    ).select(
        (F.col("doc_id") * args.replicas + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" rep "), (F.col("rep") % 7).cast("string"))
        ).alias("text"),
        "lang",
        "source",
    )

    out = tempfile.mkdtemp(prefix="soak_shards_")
    stage_t: dict[str, float] = {}
    last = time.time()

    def cb(stage, info):
        nonlocal last
        now = time.time()
        stage_t[stage] = round(now - last, 1)
        last = now

    t0 = time.time()
    metrics = run_corpus_pipeline(reps, f"{out}/pipeline", CorpusConfig(),
                                  progress_callback=cb)
    pipeline_wall = round(time.time() - t0, 1)

    survivors = spark.read.parquet(f"{out}/pipeline/clean").select("doc_id", "text")
    t0 = time.time()
    s_stats = write_training_shards(survivors, f"{out}/shards_survivors")
    survivors_wall = round(time.time() - t0, 1)
    s_inv = assert_invariants(spark, f"{out}/shards_survivors", s_stats, 512)

    t0 = time.time()
    v_stats = write_training_shards(
        reps.filter(F.length(F.trim("text")) > 0).select("doc_id", "text"),
        f"{out}/shards_volume",
    )
    volume_wall = round(time.time() - t0, 1)
    v_inv = assert_invariants(spark, f"{out}/shards_volume", v_stats, 512)

    # --- streaming append soak: the marker-idempotent batch protocol
    # at full replica volume, with a FORCED crash inside the batch-2
    # manifest swap (the worst residual window) and a restart. The
    # combined artifact must stay dense/tiled with every batch's
    # content exactly once, and batch-0's landed files untouched. ---
    import os

    from etl_guiacores_spark.plans import shard_writer as sw

    vol = reps.filter(F.length(F.trim("text")) > 0).select("doc_id", "text")
    n_batches, crash_batch = 5, 2
    app_dir = f"{out}/shards_append"
    t0 = time.time()
    batch_stats = []
    landed_mtimes: dict[str, float] = {}
    for b in range(n_batches):
        docs_b = vol.filter(F.col("doc_id") % n_batches == b)
        if b == crash_batch:
            real_rename, calls = os.rename, {"n": 0}

            def crashing(src, dst):
                calls["n"] += 1
                if calls["n"] == 2:  # between the swap's two renames
                    raise RuntimeError("soak: simulated crash mid-swap")
                real_rename(src, dst)

            os.rename = crashing
            try:
                sw.append_batch_shards(docs_b, app_dir, b)
                raise AssertionError("simulated crash did not fire")
            except RuntimeError as e:
                assert "simulated crash" in str(e)
            finally:
                os.rename = real_rename
            assert os.path.isdir(f"{app_dir}/manifest.__commit_old__")
        s = sw.append_batch_shards(docs_b, app_dir, b)  # (re)try lands
        assert s is not None, f"batch {b} marker-skipped unexpectedly"
        batch_stats.append(s)
        if b == 0:
            for root, _, files in os.walk(f"{app_dir}/shards"):
                for f in files:
                    if f.endswith(".parquet"):
                        p = os.path.join(root, f)
                        landed_mtimes[p] = os.path.getmtime(p)
    append_wall = round(time.time() - t0, 1)

    for p, m in landed_mtimes.items():
        assert os.path.getmtime(p) == m, f"batch-0 file touched: {p}"
    shards = spark.read.parquet(f"{app_dir}/shards")
    agg = shards.agg(
        F.sum("n_tokens").alias("tok"),
        F.count("*").alias("n"),
        F.min("global_seq").alias("lo"),
        F.max("global_seq").alias("hi"),
        F.count_distinct("global_seq").alias("nd"),
        F.sum(F.size("doc_ids")).alias("chunkrefs"),
        F.max((F.col("n_tokens") > 512).cast("int")).alias("over"),
    ).first()
    want_tok = sum(s["total_tokens"] for s in batch_stats)
    want_chunks = sum(s["n_chunks"] for s in batch_stats)
    assert agg["tok"] == want_tok, (agg["tok"], want_tok)
    assert agg["chunkrefs"] == want_chunks, "chunk duplicated or lost across crash"
    assert (agg["lo"], agg["hi"], agg["nd"]) == (0, agg["n"] - 1, agg["n"])
    assert agg["over"] == 0
    run = 0
    for m in (r.asDict() for r in spark.read.parquet(f"{app_dir}/manifest")
              .orderBy("shard_id").collect()):
        assert m["first_token"] == run, (m["shard_id"], m["first_token"], run)
        run += m["n_tokens"]
    assert run == want_tok
    a_inv = {"invariants": "ok", "checked_sequences": int(agg["n"]),
             "batches": n_batches, "crashed_batch": crash_batch,
             "total_tokens": int(want_tok)}

    print(json.dumps({
        "replicas": args.replicas,
        "pipeline": {"wall_s": pipeline_wall, "stage_s": stage_t, **metrics},
        "shards_survivors": {"wall_s": survivors_wall, **s_stats, **s_inv},
        "shards_volume": {"wall_s": volume_wall, **v_stats, **v_inv},
        "shards_append_crash_restart": {"wall_s": append_wall, **a_inv},
        "out_dir": out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
