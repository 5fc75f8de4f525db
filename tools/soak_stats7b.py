"""Round-7b statistical family soak: survival / bootstrap / A-B /
gap-percentile queries at 20x volume, DuckDB-exact.

q178 (Kaplan-Meier), q183 (Poisson-bootstrap CIs), q184 (exact
chi-square A/B), q185 (inter-event gap percentiles) shipped round 7
with sf-scale oracles only. This soak stages a 20x corpus — events
replicated to ~2M rows (fresh user ids per replica, second-shifted
timestamps: 20x the users/arms/series the rank windows and survival
tables must handle) and documents to ~100k rows (fresh doc ids: 20x
the bootstrap resample universe) — with the remaining tables
symlinked, then runs the EXACT driver comparison
(tools/check_oracle.py: row count + schema + order-insensitive value
hash vs the registered DuckDB oracle SQL) against the staged
directory. Zero new comparison code; the contract proven is the same
one the driver grades.

Usage: python tools/soak_stats7b.py [--replicas 20] [--sf DIR]
Prints one JSON line; exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

def _write_single_file(df, dest: str) -> None:
    """Land ``df`` as ONE parquet FILE at ``dest`` (the testdata
    layout check_oracle's DuckDB views expect — ``read_parquet`` on a
    Spark part-file DIRECTORY named x.parquet fails)."""
    import glob

    tmp = dest + ".spark"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(f"{tmp}/part-*.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


QUERIES = [
    "q178_kaplan_meier",
    "q183_bootstrap_ci",
    "q184_ab_readout",
    "q185_gap_percentiles",
    # round-8 analytics wave riding the same staged tables: q187-q189
    # stress the per-user window paths at 2M events / 20x users,
    # q190 the explode-x8 SpMM at 100k docs
    "q187_max_drawdown",
    "q188_state_dwell",
    "q189_lead_lag_xcorr",
    "q190_coo_matmul",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.session import get_spark
    from etl_guiacores_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark(app_name="stats7b-soak")
    spark.sparkContext.setLogLevel("ERROR")

    stage = tempfile.mkdtemp(prefix="soak_stats7b_")
    t0 = time.time()

    ev = load_table(spark, "events", args.sf)
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(args.replicas - 1))
    ).alias("rep")
    ev20 = ev.select("*", reps).select(
        (F.col("event_id") * args.replicas + F.col("rep")).alias("event_id"),
        # fresh users per replica; shift ts by rep seconds so replicas
        # are not byte-identical histories
        (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        (F.col("ts") + F.make_interval(secs=F.col("rep"))).alias("ts"),
        *[c for c in ev.columns if c not in
          ("event_id", "user_id", "ts")],
    )
    _write_single_file(ev20, f"{stage}/events.parquet")
    n_events = spark.read.parquet(f"{stage}/events.parquet").count()

    docs = load_table(spark, "documents", args.sf)
    d20 = docs.select("*", reps).select(
        (F.col("doc_id") * args.replicas + F.col("rep")).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    ).drop("rep")
    _write_single_file(d20, f"{stage}/documents.parquet")
    n_docs = spark.read.parquet(f"{stage}/documents.parquet").count()

    for t in TABLE_NAMES:
        if t in ("events", "documents"):
            continue
        os.symlink(f"{args.sf}/{t}.parquet", f"{stage}/{t}.parquet")
    stage_s = round(time.time() - t0, 1)
    spark.stop()

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "--sf", stage, *QUERIES],
        capture_output=True,
        text=True,
    )
    check_s = round(time.time() - t0, 1)
    tail = [
        ln.strip()
        for ln in (proc.stdout + proc.stderr).splitlines()
        if ("OK" in ln or "MISMATCH" in ln or "match" in ln)
        and "Stage" not in ln
    ][-8:]
    print(
        json.dumps(
            {
                "soak": "stats7b",
                "replicas": args.replicas,
                "n_events": n_events,
                "n_docs": n_docs,
                "stage_s": stage_s,
                "check_s": check_s,
                "rc": proc.returncode,
                "check_tail": tail,
            }
        )
    )
    shutil.rmtree(stage, ignore_errors=True)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
