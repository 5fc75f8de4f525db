"""Batch-MMR scale soak: many queries, one job, vs looped driver calls.

``mmr_rerank_batch`` exists because an eval harness re-ranks hundreds
of queries and looping ``mmr_rerank`` serializes one Spark job (and
one driver-side greedy) per query. This soak proves both claims at a
real query count:

1. correctness: for a sample of the batch's queries, the batch rows
   are IDENTICAL to the single-query operator's output;
2. throughput: wall time of the one-job batch vs a measured subset of
   sequential ``mmr_rerank`` calls, extrapolated to the same count —
   printed, not asserted (machine-dependent), with the per-query
   ratio recorded for SCALE.md.

Usage: python tools/soak_mmr_batch.py [--queries 200] [--sample 5]
           [--sf /root/testdata/sf0.1] [--loop-sample 10]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--sample", type=int, default=5)
    ap.add_argument("--loop-sample", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from etl_guiacores_spark.operators.retrieval import (
        mmr_rerank,
        mmr_rerank_batch,
    )
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="soak-mmr-batch")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    n_vec = e.count()
    qids = list(range(min(args.queries, n_vec // 2)))

    # warm the scan so both arms pay the same IO
    e.count()

    t0 = time.time()
    batch = mmr_rerank_batch(e, qids, k=10, n_candidates=32).collect()
    batch_wall = time.time() - t0
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], set()).add(
            (r["rank"], r["vec_id"], r["rel"], r["mmr_score"])
        )
    assert sorted(by_q) == qids, (len(by_q), len(qids))

    # correctness sample: batch rows == single-query operator rows
    step = max(1, len(qids) // args.sample)
    checked = 0
    for q in qids[::step][: args.sample]:
        solo = {
            (r["rank"], r["vec_id"], r["rel"], r["mmr_score"])
            for r in mmr_rerank(e, query_id=q, k=10, n_candidates=32).collect()
        }
        assert solo == by_q[q], f"batch != solo for query {q}"
        checked += 1

    # throughput: measured sequential subset, extrapolated
    loop_n = min(args.loop_sample, len(qids))
    t0 = time.time()
    for q in qids[:loop_n]:
        mmr_rerank(e, query_id=q, k=10, n_candidates=32).collect()
    loop_wall = time.time() - t0
    extrapolated = loop_wall / loop_n * len(qids)

    print(
        json.dumps(
            {
                "soak": "mmr_batch",
                "n_vectors": n_vec,
                "n_queries": len(qids),
                "sample_checked": checked,
                "batch_wall_s": round(batch_wall, 1),
                "loop_sample_n": loop_n,
                "loop_sample_wall_s": round(loop_wall, 1),
                "loop_extrapolated_s": round(extrapolated, 1),
                "speedup_x": round(extrapolated / batch_wall, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
