"""Capture .explain("formatted") output for named queries.

Optimization-round deliverable helper: writes
``plans/<tag>/<query>_<suffix>.txt`` for each named query so plan
claims (Exchange counts, join strategies, PushedFilters) are
checkable without running Spark.

Usage: python tools/capture_plans.py --tag r13 --suffix before q101_pagerank_neardup ...
       python tools/capture_plans.py --tag r13 --suffix before --all
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import etl_guiacores_spark.queries_corpus  # noqa: F401
    import etl_guiacores_spark.queries_eval  # noqa: F401
    import etl_guiacores_spark.queries_analytics  # noqa: F401
    import etl_guiacores_spark.queries_extra  # noqa: F401
    import etl_guiacores_spark.queries_scale  # noqa: F401
    from etl_guiacores_spark.queries import REGISTRY
    from etl_guiacores_spark.session import get_spark

    names = list(REGISTRY) if args.all else args.names
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
