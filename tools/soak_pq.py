"""PQ-assignment soak (q174/q176 shapes) at 20x embeddings.

100k vectors x 64 dims explode to 6.4M dimension rows; the broadcast
codebook join multiplies by k=8 before the partial aggregate — the
operator's real cost center. Verified exactly against a DuckDB twin
(same fixed-point distances, same tie-break) on the identical staged
rows; the k-means step's re-estimated centroid checksums are compared
the same way.

Usage: python tools/soak_pq.py [--replicas 20] [--sf DIR]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.ann import kmeans_step_exact
    from etl_guiacores_spark.operators.quantize import pq_assign
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="pq-soak")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    # replicate with a deterministic per-replica nudge on ONE dim so
    # replicas aren't bit-identical vectors
    reps = emb.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias(
            "rep"
        ),
        "vec_id",
        "embedding",
    ).select(
        (F.col("vec_id") * args.replicas + F.col("rep")).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 "
            "THEN CAST(x AS DOUBLE) + rep * 0.001 "
            "ELSE CAST(x AS DOUBLE) END)"
        ).alias("embedding"),
    )
    tmp = tempfile.mkdtemp(prefix="soak_pq_")
    reps.write.mode("overwrite").parquet(f"{tmp}/emb.parquet")
    e = spark.read.parquet(f"{tmp}/emb.parquet")
    n_vec = e.count()
    cb = e.filter(F.col("vec_id") < 8)

    t0 = time.time()
    got = {
        (r["vec_id"], r["sub"]): (r["code"], r["d2"])
        for r in pq_assign(
            e, cb, code_id_col="vec_id", dim=64, n_sub=4
        ).collect()
    }
    pq_s = round(time.time() - t0, 1)

    t0 = time.time()
    km = {
        r["cluster"]: (
            r["n_assigned"], r["inertia"], r["centroid_checksum"],
            r["shift_l1"],
        )
        for r in kmeans_step_exact(
            e, cb, code_id_col="vec_id", dim=64
        ).collect()
    }
    km_s = round(time.time() - t0, 1)

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp}/emb.parquet/*.parquet')"
    )
    core = """
        edim AS (
            SELECT vec_id, d - 1 AS d0, (d - 1) // 16 AS sub,
                   CAST(FLOOR(CAST(embedding[d] AS DOUBLE) * 1000000)
                        AS BIGINT) AS fx
            FROM embeddings CROSS JOIN generate_series(1, 64) t(d)
        ),
        cdim AS (
            SELECT vec_id AS cid, d0, sub, fx AS cfx
            FROM edim WHERE vec_id < 8
        ),
        d2 AS (
            SELECT e.vec_id, e.sub, c.cid,
                   CAST(SUM((e.fx - c.cfx) * (e.fx - c.cfx)) AS BIGINT)
                       AS d2
            FROM edim e JOIN cdim c ON c.d0 = e.d0
            GROUP BY e.vec_id, e.sub, c.cid
        ),
        best AS (
            SELECT vec_id, sub, cid AS code, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2, cid) AS rn
            FROM d2
        )
    """
    o_pq = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            f"WITH {core} SELECT vec_id, sub, code, d2 FROM best "
            f"WHERE rn = 1"
        ).fetchall()
    }
    pq_bad = sum(1 for k, v in got.items() if o_pq.get(k) != v)
    pq_bad += sum(1 for k in o_pq if k not in got)

    # k-means step twin: full-vector assignment (sub spans all 64)
    o_km = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            """
            WITH edim AS (
                SELECT vec_id, d - 1 AS d0,
                       CAST(FLOOR(CAST(embedding[d] AS DOUBLE) * 1000000)
                            AS BIGINT) AS fx
                FROM embeddings CROSS JOIN generate_series(1, 64) t(d)
            ),
            cdim AS (SELECT vec_id AS cid, d0, fx AS old_fx
                     FROM edim WHERE vec_id < 8),
            d2 AS (
                SELECT e.vec_id, c.cid,
                       CAST(SUM((e.fx - c.old_fx) * (e.fx - c.old_fx))
                            AS BIGINT) AS d2
                FROM edim e JOIN cdim c ON c.d0 = e.d0
                GROUP BY e.vec_id, c.cid
            ),
            best AS (
                SELECT vec_id, cid AS code, d2,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d2
            ),
            assign AS (SELECT vec_id, code, d2 FROM best WHERE rn = 1),
            nd AS (
                SELECT a.code, e.d0,
                       CAST(SUM(e.fx) // COUNT(*) AS BIGINT) AS new_fx
                FROM edim e JOIN assign a ON a.vec_id = e.vec_id
                GROUP BY a.code, e.d0
            ),
            pc AS (
                SELECT c.cid AS cluster,
                       CAST(SUM(COALESCE(n.new_fx, c.old_fx)) AS BIGINT)
                           AS cs,
                       CAST(SUM(ABS(COALESCE(n.new_fx, c.old_fx)
                                    - c.old_fx)) AS BIGINT) AS sh
                FROM cdim c LEFT JOIN nd n
                  ON n.code = c.cid AND n.d0 = c.d0
                GROUP BY c.cid
            ),
            st AS (
                SELECT code AS cluster, CAST(COUNT(*) AS BIGINT) AS na,
                       CAST(SUM(d2) AS BIGINT) AS it
                FROM assign GROUP BY code
            )
            SELECT p.cluster, COALESCE(s.na, 0), COALESCE(s.it, 0),
                   p.cs, p.sh
            FROM pc p LEFT JOIN st s ON s.cluster = p.cluster
            """
        ).fetchall()
    }
    km_bad = sum(1 for k, v in km.items() if o_km.get(k) != v)

    shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "vectors": n_vec,
        "pq_s": pq_s,
        "pq_pairs": len(got),
        "pq_mismatches": pq_bad,
        "kmeans_s": km_s,
        "kmeans_mismatches": km_bad,
        "ok": pq_bad == 0 and km_bad == 0,
    }
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
