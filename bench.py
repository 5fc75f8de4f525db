"""Benchmark harness — times the headline query suite.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line with keys, in order: {"queries_cold", "queries",
"n_queries", "timing_mode", "cold_total", "metric", "value", "unit",
"sf"} — the big per-query dicts first so the headline stats sit at
the END of the line, where a tail-capturing artifact recorder cannot
truncate them away.

Each query executes twice; ``queries``/``value`` are the SECOND
(warm) timings — steady-state engine execution with JVM codegen and
Python workers warm but the data cache cleared — and ``queries_cold``
keeps the first-run pairs so cross-round comparisons can separate
plan regressions from first-touch noise (SCALE.md, variance policy).

Per-query timing forces the full plan with a noop-sink write that
avoids driver-side materialization cost (the driver's correctness run
collects separately; here we measure engine execution).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import etl_guiacores_spark.queries_extra  # noqa: F401 — registers coverage queries
    import etl_guiacores_spark.queries_eval  # noqa: F401 — registers eval/drift queries
    import etl_guiacores_spark.queries_analytics  # noqa: F401 — registers round-8 analytics queries
    import etl_guiacores_spark.queries_scale  # noqa: F401 — registers scale queries
    import etl_guiacores_spark.queries_corpus  # noqa: F401 — registers corpus-curation queries
    from etl_guiacores_spark.queries import REGISTRY
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM/codegen/parquet footers so the first timed query
    # isn't charged for session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # warm up the Python worker pool: the first mapInPandas stage in a
    # session spawns one Python worker per core (~8s on local[32]) —
    # a one-time environment cost, not a property of whichever Arrow
    # query happens to run first (measured: q65 10.7s cold-attributed
    # vs 1.0s steady-state)
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: (pdf for pdf in it), "id long").count()

    # Each query runs TWICE: the first (cold) run pays first-touch
    # codegen compilation, Python-worker spin-up, and broadcast build;
    # the second (warm) run is the steady-state number a long-lived
    # cluster job actually sees. Round 3's q27 "regression" (3.33s
    # cold vs 0.83s warm) was exactly this noise class — so the
    # headline `queries`/`value` now carry WARM timings and the cold
    # pairs ride along in `queries_cold` for variance forensics.
    # adaptive second run: sub-300ms queries are already steady-state
    # (nothing to warm at that size — cold ~= warm, measured), so only
    # queries above the threshold pay the re-run; keeps total bench
    # wall ~1.4x of single-run instead of 2x
    WARM_RERUN_THRESHOLD_S = 0.3
    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        for run, sink in ((0, timings_cold), (1, timings)):
            if run == 1 and timings_cold[name] < WARM_RERUN_THRESHOLD_S:
                sink[name] = timings_cold[name]
                continue
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            # force full execution without collecting rows to the driver
            df.write.format("noop").mode("overwrite").save()
            sink[name] = round(time.time() - t0, 3)
            # queries that stage persisted tables (the MinHash/LSH
            # family) hand cache ownership to the caller; reclaim
            # between runs so the warm run re-executes the full plan
            # (warm = JVM/codegen warm, NOT cached-data warm) and a
            # 112-query session doesn't accumulate cache pressure
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    payload = {
        "queries_cold": timings_cold,
        "queries": timings,
        "n_queries": len(timings),
        "timing_mode": "warm_of_2_runs",
        "cold_total": round(sum(timings_cold.values()), 3),
        "metric": "query_suite_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
    }
    # key order matters for artifact robustness: the driver records the
    # TAIL of stdout, so the per-query dict goes first and the headline
    # metric/value/sf land at the end of the line where truncation
    # can't eat them (round 2's artifact lost the head of the line).
    # A full, never-truncated copy also lands next to the script
    # (BENCH_full_latest.json) so cross-round per-query comparisons
    # stop depending on the driver's tail window — tools/bench_compare
    # prefers it when present.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_full_latest.json"), "w") as f:
            json.dump(payload, f)
    except OSError:
        pass  # a read-only checkout must not fail the bench
    spark.stop()
    # The JSON line is the LAST bytes this process writes to stdout
    # (after spark.stop(), flushed), so nothing — JVM shutdown chatter
    # included — can displace the headline keys from a tail-capturing
    # artifact window (the r12 artifact loss, r13 verdict item 6).
    # The output contract stays exactly ONE JSON line: a second
    # "compact headline" line was considered and rejected because a
    # driver that parses the last stdout line would then lose the
    # per-query dict — a far worse failure than the one being fixed.
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
