"""Solo steady-state re-measure for bench-variance adjudication.

The full 187-query bench runs queries back-to-back in one session, so
ambient machine load and cache rotation swing individual timings up
to ~6x run-to-run (SCALE.md round-7 coda). When a committed bench
artifact shows a per-query move with no code change, the adjudication
protocol is: re-measure the query SOLO — fresh warmed session, one
cold run, then N warm repeats — and compare the warm median against
both rounds' committed numbers. Matches the q86/q118 precedent.

Usage: python tools/solo_bench.py q114_random_projection ... \
           [--repeats 3] [--sf DIR]
Prints ONE JSON line: {name: {"cold": s, "warm": [s...], "median": s}}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import etl_guiacores_spark.queries_corpus  # noqa: F401
    import etl_guiacores_spark.queries_eval  # noqa: F401
    import etl_guiacores_spark.queries_analytics  # noqa: F401 — registers round-8 analytics queries
    import etl_guiacores_spark.queries_extra  # noqa: F401
    import etl_guiacores_spark.queries_scale  # noqa: F401
    from etl_guiacores_spark.queries import REGISTRY
    from etl_guiacores_spark.session import get_spark

    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="solo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py: parquet footers + Python worker pool
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: (pdf for pdf in it), "id long").count()

    out: dict[str, dict] = {}
    for name in args.names:
        spec = REGISTRY[name]
        runs = []
        for _ in range(args.repeats + 1):
            t0 = time.time()
            spec.fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "cold": runs[0],
            "warm": runs[1:],
            "median": round(statistics.median(runs[1:]), 3),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
