"""Round-7 continuation soak: Holt scan, interval union, and quantile
normalization at 20x event volume (~2M rows).

What each leg stresses:

- holt_smooth (q170 shape): 2M rows across 1500 users (~2k-row
  series after 20x). Verified EXACTLY against a sequential Python
  reference over EVERY row (the oracle's recursive CTE would need
  per-row recursion steps in DuckDB — the reference is the honest
  at-volume twin). The long-series worst case (one key, 200k rows)
  is probed separately and recorded in SCALE.md — the blocked scan
  is linear there; a naive array_append fold would be quadratic.
- interval_coverage (q165 shape): 2M intervals through the two
  shared-exchange windows; DuckDB twin on the identical staged rows.
- quantile_normalize (q169 shape): global ranking via the dense-ids
  range exchange at 2M rows plus the per-group rank window; DuckDB
  twin (plain ROW_NUMBER windows) on the same rows.

Usage: python tools/soak_round7b.py [--replicas 20] [--sf DIR]
Prints one JSON line; exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _trunc_div(x: int, y: int) -> int:
    q = abs(x) // abs(y)
    return q if (x >= 0) == (y >= 0) else -q


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.intervals import interval_coverage
    from etl_guiacores_spark.operators.rankstats import quantile_normalize
    from etl_guiacores_spark.operators.rollup_time import holt_smooth
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="round7b-soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{args.sf}/events.parquet")
    reps = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.explode(
                F.sequence(F.lit(0), F.lit(args.replicas - 1))
            ).alias("rep"),
        )
        .select(
            "user_id",
            (F.col("event_id") * args.replicas + F.col("rep")).alias(
                "event_id"
            ),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.col("rep") * 977
            ).alias("t_us"),
            (
                F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)")
                + F.col("rep") * 13
            ).alias("v_micro"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="soak_r7b_")
    reps.write.mode("overwrite").parquet(f"{tmp}/ev.parquet")
    df = spark.read.parquet(f"{tmp}/ev.parquet")
    n = df.count()
    out = {"rows": n}

    # --- 1. Holt scan, exact vs sequential reference over ALL rows ---
    t0 = time.time()
    holt_rows = holt_smooth(
        df, "user_id", "t_us", "v_micro",
        alpha_ppm=200_000, beta_ppm=100_000, tiebreak_col="event_id",
    ).collect()
    out["holt_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    inputs: dict[int, list] = {}
    for r in df.select("user_id", "t_us", "event_id", "v_micro").collect():
        inputs.setdefault(r[0], []).append((r[1], r[2], r[3]))
    a, b, g, h = 200_000, 800_000, 100_000, 900_000
    ref: dict[tuple, tuple] = {}
    for uid, rows in inputs.items():
        rows.sort()
        level = trend = None
        for t_us, eid, v in rows:
            if level is None:
                level, trend = v, 0
            else:
                lp = _trunc_div(a * v + b * (level + trend), 1_000_000)
                trend = _trunc_div(g * (lp - level) + h * trend, 1_000_000)
                level = lp
            ref[(uid, eid)] = (level, trend)
    holt_bad = sum(
        1
        for r in holt_rows
        if ref[(r["user_id"], r["event_id"])]
        != (r["level_micro"], r["trend_micro"])
    )
    out["holt_ref_s"] = round(time.time() - t0, 1)
    out["holt_rows"] = len(holt_rows)
    out["holt_mismatches"] = holt_bad
    out["holt_max_series"] = max(len(v) for v in inputs.values())
    del holt_rows, ref, inputs

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW e AS SELECT * FROM "
        f"read_parquet('{tmp}/ev.parquet/*.parquet')"
    )

    # --- 2. interval union at 2M intervals, DuckDB twin ---
    iv = df.select(
        "user_id",
        F.col("t_us").alias("s"),
        (F.col("t_us") + (F.pmod(F.col("v_micro"), 120) + 1) * 1_000_000)
        .alias("e"),
    )
    t0 = time.time()
    got_iv = {
        r["user_id"]: (
            r["n_intervals"], r["n_islands"], r["covered"], r["max_island"]
        )
        for r in interval_coverage(iv, ["user_id"], "s", "e").collect()
    }
    out["intervals_s"] = round(time.time() - t0, 1)
    oracle_iv = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            """
            WITH iv AS (
                SELECT user_id, t_us AS s,
                       t_us + ((v_micro % 120 + 120) % 120 + 1) * 1000000 AS e
                FROM e
            ),
            f AS (
                SELECT user_id, s, e,
                       CASE WHEN s > MAX(e) OVER (PARTITION BY user_id
                            ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) THEN 1 ELSE 0 END AS nw
                FROM iv),
            i AS (
                SELECT user_id, s, e,
                       SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS island
                FROM f),
            g AS (
                SELECT user_id, island, MIN(s) i_s, MAX(e) i_e,
                       CAST(COUNT(*) AS BIGINT) n
                FROM i GROUP BY user_id, island)
            SELECT user_id, CAST(SUM(n) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(i_e - i_s) AS BIGINT),
                   CAST(MAX(i_e - i_s) AS BIGINT)
            FROM g GROUP BY user_id
            """
        ).fetchall()
    }
    out["intervals_users"] = len(got_iv)
    out["intervals_mismatches"] = sum(
        1 for k, v in got_iv.items() if oracle_iv.get(k) != v
    )

    # --- 3. quantile normalize at 2M rows, DuckDB twin ---
    qn_in = df.select("event_id", "user_id", "v_micro")
    t0 = time.time()
    got_qn = quantile_normalize(
        qn_in,
        ["user_id"],
        "v_micro",
        F.col("v_micro") * F.lit(100_000_000) + F.col("event_id"),
        out_col="norm",
    )
    qn_sum = got_qn.agg(
        F.count("*").alias("n"),
        F.sum(F.col("norm").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    out["qnorm_s"] = round(time.time() - t0, 1)
    o_n, o_s = con.execute(
        """
        WITH base AS (
            SELECT event_id, user_id, v_micro,
                   CAST(v_micro AS HUGEINT) * 100000000 + event_id AS k
            FROM e),
        g AS (SELECT *, ROW_NUMBER() OVER (ORDER BY k) grank,
                     COUNT(*) OVER () n FROM base),
        s AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY k) rs,
                     COUNT(*) OVER (PARTITION BY user_id) ms FROM g),
        idx AS (SELECT CASE WHEN ms > 1
                       THEN 1 + CAST(rs - 1 AS HUGEINT) * (n - 1) // (ms - 1)
                       ELSE (n + 1) // 2 END AS i
                FROM s)
        SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(l.v_micro) AS HUGEINT)
        FROM idx x JOIN g l ON l.grank = x.i
        """
    ).fetchone()
    out["qnorm_rows"] = qn_sum["n"]
    out["qnorm_sum_match"] = bool(
        qn_sum["n"] == o_n and int(qn_sum["s"]) == int(o_s)
    )

    shutil.rmtree(tmp, ignore_errors=True)
    ok = (
        out["holt_mismatches"] == 0
        and out["intervals_mismatches"] == 0
        and out["qnorm_sum_match"]
    )
    out["ok"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
