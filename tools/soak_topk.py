"""Volume soak for ordering.topk_per_key: the batch-retrieval top-k
hotspot, measured.

Builds the exact shape the round-10 lever targets — a scored relation
of |corpus| rows PER query (few keys, data-sized groups) — and runs
the per-query top-k cut both ways:

- plain:  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ...)
          (every query's full corpus through ONE reducer task)
- salted: ordering.topk_per_key (pre-cut within (query, salt) groups,
          then rank the bounded survivors)

Asserts the two outputs are IDENTICAL (the operator's contract), then
reports wall time and the per-stage task-time distribution off the
status REST API for each phase — the plain shape's final window stage
must show its |queries| hot tasks; the salted shape must not.

Usage: python tools/soak_topk.py [--rows N] [--queries Q] [--k K]
                                 [--salt-buckets B]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _stage_stats(spark, min_stage: int) -> list[dict]:
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages?status=complete"
        f"&withSummaries=true&quantiles=0.0,0.5,1.0"
    )
    out = []
    for s in json.load(urllib.request.urlopen(url)):
        if int(s["stageId"]) < min_stage:
            continue
        d = (s.get("taskMetricsDistributions") or {}).get("executorRunTime")
        if not d:
            continue
        out.append(
            {
                "stage": int(s["stageId"]),
                "n_tasks": int(s["numCompleteTasks"]),
                "median_ms": int(d[1]),
                "max_ms": int(d[2]),
            }
        )
    return out


def _max_stage(spark) -> int:
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages"
    )
    ids = [int(s["stageId"]) for s in json.load(urllib.request.urlopen(url))]
    return max(ids) + 1 if ids else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--queries", type=int, default=4)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.ordering import topk_per_key
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(
        app_name="soak-topk", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # |corpus| rows per query: deterministic pseudo-scores with heavy
    # ties (xxhash64 mod 1000) so the id tiebreak is load-bearing
    qids = spark.range(args.queries).select(F.col("id").alias("query_id"))
    scored = (
        spark.range(args.rows)
        .select(F.col("id").alias("cand_id"))
        .crossJoin(F.broadcast(qids))
        .select(
            "query_id",
            "cand_id",
            F.pmod(
                F.xxhash64(F.col("cand_id") * 7 + F.col("query_id")),
                F.lit(1000),
            ).alias("score"),
        )
    )
    # pin the input so both phases read the same materialized rows
    scored = scored.localCheckpoint()

    order = [F.col("score").desc(), F.col("cand_id")]

    def run_plain():
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= args.k)
            .collect()
        )

    def run_salted():
        return topk_per_key(
            scored,
            ["query_id"],
            order,
            args.k,
            salt_expr=F.col("cand_id"),
            salt_buckets=args.salt_buckets,
        ).collect()

    results = {}
    phases = {}
    for name, fn in (("plain", run_plain), ("salted", run_salted)):
        first = _max_stage(spark)
        t0 = time.time()
        rows = fn()
        wall = round(time.time() - t0, 2)
        stats = _stage_stats(spark, first)
        # the hot signature: any stage whose task count is the query
        # count (the per-query window exchange) and whose max task
        # dwarfs the phase's other stages
        hottest = max(stats, key=lambda s: s["max_ms"]) if stats else None
        results[name] = sorted(
            (r["query_id"], r["rank"], r["cand_id"], r["score"])
            for r in rows
        )
        phases[name] = {
            "wall_s": wall,
            "hottest_stage": hottest,
            "stages": stats,
        }

    assert results["plain"] == results["salted"], (
        "topk_per_key diverged from the single-window result"
    )
    assert len(results["plain"]) == args.queries * args.k

    def _hot_ms(phase: str):
        # REST summaries can be absent for very fast stages — report
        # the identity/wall results rather than dying on the metric
        hot = phases[phase]["hottest_stage"]
        return hot["max_ms"] if hot else None

    plain_hot = _hot_ms("plain")
    salted_hot = _hot_ms("salted")
    print(
        json.dumps(
            {
                "soak": "topk_per_key",
                "rows_per_query": args.rows,
                "queries": args.queries,
                "k": args.k,
                "salt_buckets": args.salt_buckets,
                "identical_output": True,
                "plain": phases["plain"],
                "salted": phases["salted"],
                "hot_task_ms": {"plain": plain_hot, "salted": salted_hot},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
