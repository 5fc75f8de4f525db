"""Where does a query's wall time go? Planning vs execution.

For each named query, reports:
- build_s: Python-side DataFrame construction (py4j + analysis)
- plan_s: optimizer + physical planning (executedPlan, pre-AQE)
- exec_s: noop-sink execution, repeated --repeats times (warm list)

Usage: python tools/profile_query.py q101_pagerank_neardup [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
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
    import etl_guiacores_spark.queries_analytics  # noqa: F401
    import etl_guiacores_spark.queries_extra  # noqa: F401
    import etl_guiacores_spark.queries_scale  # noqa: F401
    from etl_guiacores_spark.queries import REGISTRY
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: (pdf for pdf in it), "id long").count()

    out = {}
    for name in args.names:
        spec = REGISTRY[name]
        execs = []
        build = plan = None
        for i in range(args.repeats):
            t0 = time.time()
            df = spec.fn(spark, args.sf)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            if i == 0:
                build, plan = round(t1 - t0, 3), round(t2 - t1, 3)
            execs.append(round(t3 - t2, 3))
            spark.catalog.clearCache()
        out[name] = {"build_s": build, "plan_s": plan, "exec_s": execs}
        print(name, json.dumps(out[name]))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
