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

    print(json.dumps({
        "replicas": args.replicas,
        "pipeline": {"wall_s": pipeline_wall, "stage_s": stage_t, **metrics},
        "shards_survivors": {"wall_s": survivors_wall, **s_stats, **s_inv},
        "shards_volume": {"wall_s": volume_wall, **v_stats, **v_inv},
        "out_dir": out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
