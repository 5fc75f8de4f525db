"""Rank-statistics soak: q146 (Spearman) and q148 (Gini) shapes at
20x event volume.

Both operators do a per-group rank window before one aggregate — the
bounded-group shape shared with the exact-percentile family: parallel
ACROSS groups, a sort WITHIN each group. The adversarial fact at
scale is few, huge groups (5 event types x ~400k rows each at 20x):
each group ranks inside one task, so this soak measures exactly the
worst case the operator docstrings warn about, plus correctness at
volume via a DuckDB twin on the identical staged rows.

Usage: python tools/soak_rankstats.py [--replicas 20] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.rankstats import gini_index, spearman_corr
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="rankstats-soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{args.sf}/events.parquet")
    reps = ev.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep"),
        "event_id",
        "ts",
        "value",
    ).select(
        "event_type",
        (F.col("event_id") * args.replicas + F.col("rep")).alias("event_id"),
        # nudge replica values deterministically so ranks don't
        # degenerate into pure-tiebreak runs
        F.expr(
            "CAST(FLOOR(value * 1000000) AS BIGINT)"
        ).alias("v0"),
        "rep",
        "ts",
    ).select(
        "event_type",
        "event_id",
        (F.col("v0") + F.col("rep") * 7).alias("v_micro"),
        "ts",
    )
    tmp = tempfile.mkdtemp(prefix="soak_rank_")
    reps.write.mode("overwrite").parquet(f"{tmp}/ev.parquet")
    df = spark.read.parquet(f"{tmp}/ev.parquet")
    n = df.count()

    t0 = time.time()
    sp = {
        r["event_type"]: (r["n_rows"], r["sum_d2"], r["rho_ppm"])
        for r in spearman_corr(
            df, "event_type", "v_micro", "ts", "event_id"
        ).collect()
    }
    t_sp = time.time() - t0

    t0 = time.time()
    gi = {
        r["event_type"]: (r["n_rows"], r["total"], r["gini_ppm"])
        for r in gini_index(df, "event_type", "v_micro", "event_id").collect()
    }
    t_gi = time.time() - t0

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW e AS SELECT * FROM "
        f"read_parquet('{tmp}/ev.parquet/*.parquet')"
    )
    o_sp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            """
            WITH r AS (
                SELECT event_type,
                       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v_micro, event_id) AS BIGINT) rx,
                       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS BIGINT) ry
                FROM e)
            SELECT event_type, CAST(COUNT(*) AS BIGINT),
                   CAST(SUM((rx-ry)*(rx-ry)) AS BIGINT),
                   CAST((CAST(1000000 AS HUGEINT)*COUNT(*)
                         *(COUNT(*)*COUNT(*)-1)
                         - 6*CAST(1000000 AS HUGEINT)*SUM((rx-ry)*(rx-ry)))
                        // NULLIF(CAST(COUNT(*) AS HUGEINT)
                                  *(COUNT(*)*COUNT(*)-1), 0) AS BIGINT)
            FROM r GROUP BY event_type
            """
        ).fetchall()
    }
    o_gi = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            """
            WITH r AS (
                SELECT event_type, v_micro AS x,
                       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v_micro, event_id) AS BIGINT) i
                FROM e)
            SELECT event_type, CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(x) AS BIGINT),
                   CAST((2*SUM(CAST(i AS HUGEINT)*x)
                         - (COUNT(*)+1)*CAST(SUM(x) AS HUGEINT))*1000000
                        // NULLIF(CAST(COUNT(*) AS HUGEINT)*SUM(x), 0)
                        AS BIGINT)
            FROM r GROUP BY event_type
            """
        ).fetchall()
    }
    assert sp == o_sp, f"spearman diverges at volume: {sp} vs {o_sp}"
    assert gi == o_gi, f"gini diverges at volume: {gi} vs {o_gi}"

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    biggest = max(v[0] for v in sp.values())
    print(
        json.dumps(
            {
                "n_rows": n,
                "n_groups": len(sp),
                "largest_group": biggest,
                "spearman_sec": round(t_sp, 1),
                "gini_sec": round(t_gi, 1),
                "oracle_match": True,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
