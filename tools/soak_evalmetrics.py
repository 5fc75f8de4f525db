"""Eval-metrics soak: q150 (AUC), q151 (KS), q153 (transitions)
shapes at 20x event volume, DuckDB-exact at volume.

The adversarial facts at scale, per operator:
- AUC / KS first collapse to per-(group, score) counts, so the rank
  window runs over DISTINCT scores — replicas nudge values so the
  distinct-score relation actually grows 20x (the worst case), not
  collapses onto the base-data values.
- AUC groups per day (30 groups x ~67k rows), KS per event type
  (5 groups x ~400k): few, large groups — each group's distinct-score
  relation sorts inside one task, the bounded-group caveat the
  docstrings warn about, measured here.
- Transition matrix: 2M LAG rows across ~1k user chains, then a
  groupBy to the bounded 25-cell matrix.

Usage: python tools/soak_evalmetrics.py [--replicas 20] [--sf DIR]
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

    from etl_guiacores_spark.operators.evalmetrics import (
        auc_roc,
        ks_2samp,
        transition_matrix,
    )
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="evalmetrics-soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{args.sf}/events.parquet")
    reps = (
        ev.select(
            "event_type",
            "user_id",
            "ts",
            "event_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(args.replicas - 1))
            ).alias("rep"),
            F.expr("CAST(FLOOR(value * 1000000) AS BIGINT)").alias("v0"),
        )
        .select(
            "event_type",
            (F.col("user_id") * args.replicas + F.col("rep")).alias(
                "user_id"
            ),
            "ts",
            (F.col("event_id") * args.replicas + F.col("rep")).alias(
                "event_id"
            ),
            # nudge replica values so distinct scores grow 20x
            (F.col("v0") + F.col("rep") * 7).alias("v_micro"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="soak_eval_")
    reps.write.mode("overwrite").parquet(f"{tmp}/ev.parquet")
    df = spark.read.parquet(f"{tmp}/ev.parquet")
    n = df.count()

    prepped = df.select(
        F.to_date("ts").alias("day"),
        "event_type",
        "user_id",
        "ts",
        "event_id",
        "v_micro",
        (F.col("event_type") == "purchase").alias("is_purchase"),
        (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"))
        .alias("in_b"),
    )

    t0 = time.time()
    auc = {
        str(r["day"]): (r["n_pos"], r["n_neg"], r["auc_ppm"])
        for r in auc_roc(
            prepped, ["day"], "v_micro", "is_purchase"
        ).collect()
    }
    t_auc = time.time() - t0

    t0 = time.time()
    ks = {
        r["event_type"]: (r["n_a"], r["n_b"], r["d_ppm"])
        for r in ks_2samp(prepped, ["event_type"], "v_micro", "in_b").collect()
    }
    t_ks = time.time() - t0

    t0 = time.time()
    tm = {
        (r["prev_state"], r["next_state"]): (
            r["n_trans"],
            r["n_from"],
            r["p_ppm"],
        )
        for r in transition_matrix(
            df, ["user_id"], "event_type", ["ts", "event_id"]
        ).collect()
    }
    t_tm = time.time() - t0

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW e AS SELECT * FROM "
        f"read_parquet('{tmp}/ev.parquet/*.parquet')"
    )
    o_auc = {
        str(r[0]): (r[1], r[2], r[3])
        for r in con.execute(
            """
            WITH s AS (
                SELECT CAST(ts AS DATE) AS day, v_micro AS score,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                            END AS pos
                FROM e),
            by_score AS (
                SELECT day, score, CAST(COUNT(*) AS BIGINT) cnt,
                       CAST(SUM(pos) AS BIGINT) pos
                FROM s GROUP BY day, score),
            r AS (
                SELECT day, cnt, pos,
                       COALESCE(SUM(cnt) OVER (PARTITION BY day
                           ORDER BY score ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) cum
                FROM by_score)
            SELECT day, CAST(SUM(pos) AS BIGINT),
                   CAST(SUM(cnt) - SUM(pos) AS BIGINT),
                   CAST(1000000 * (SUM(CAST(pos AS HUGEINT)
                                       * (2*cum + cnt + 1))
                                   - CAST(SUM(pos) AS HUGEINT)
                                     * (SUM(pos) + 1))
                        // NULLIF(2 * CAST(SUM(pos) AS HUGEINT)
                                  * (SUM(cnt) - SUM(pos)), 0) AS BIGINT)
            FROM r GROUP BY day
            """
        ).fetchall()
    }
    o_ks = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            """
            WITH s AS (
                SELECT event_type, v_micro AS v,
                       ts >= TIMESTAMP '2024-01-16 00:00:00' AS in_b
                FROM e),
            by_val AS (
                SELECT event_type, v,
                       CAST(SUM(CASE WHEN in_b THEN 0 ELSE 1 END)
                            AS BIGINT) ca,
                       CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END)
                            AS BIGINT) cb
                FROM s GROUP BY event_type, v),
            st AS (
                SELECT event_type,
                       SUM(ca) OVER (PARTITION BY event_type ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) cuma,
                       SUM(cb) OVER (PARTITION BY event_type ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) cumb,
                       SUM(ca) OVER (PARTITION BY event_type) na,
                       SUM(cb) OVER (PARTITION BY event_type) nb
                FROM by_val)
            SELECT event_type, CAST(MAX(na) AS BIGINT),
                   CAST(MAX(nb) AS BIGINT),
                   CAST(1000000 * MAX(ABS(CAST(cuma AS HUGEINT) * nb
                                          - CAST(cumb AS HUGEINT) * na))
                        // NULLIF(CAST(MAX(na) AS HUGEINT) * MAX(nb), 0)
                        AS BIGINT)
            FROM st GROUP BY event_type
            """
        ).fetchall()
    }
    o_tm = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            """
            WITH seq AS (
                SELECT LAG(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) prev_state,
                       event_type next_state
                FROM e),
            counts AS (
                SELECT prev_state, next_state,
                       CAST(COUNT(*) AS BIGINT) n_trans
                FROM seq WHERE prev_state IS NOT NULL
                GROUP BY prev_state, next_state)
            SELECT prev_state, next_state, n_trans,
                   CAST(SUM(n_trans) OVER (PARTITION BY prev_state)
                        AS BIGINT),
                   CAST(1000000 * n_trans
                        // SUM(n_trans) OVER (PARTITION BY prev_state)
                        AS BIGINT)
            FROM counts
            """
        ).fetchall()
    }
    assert auc == o_auc, "AUC diverges at volume"
    assert ks == o_ks, f"KS diverges at volume: {ks} vs {o_ks}"
    assert tm == o_tm, "transition matrix diverges at volume"

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_rows": n,
                "auc_days": len(auc),
                "ks_groups": len(ks),
                "tm_cells": len(tm),
                "largest_ks_group": max(v[0] + v[1] for v in ks.values()),
                "auc_sec": round(t_auc, 1),
                "ks_sec": round(t_ks, 1),
                "transitions_sec": round(t_tm, 1),
                "oracle_match": True,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
