"""Cross-set span-decontamination soak (q177 shape) at 20x documents.

The scale-relevant facts to verify at volume: the eval gram
dictionary stays broadcastable (bounded by the eval split, not the
corpus), the train side's only exchange is the per-doc island window,
and the span extents are exact — checked against a DuckDB twin of the
full sliding-gram + LAG interval-merge on the identical staged rows.

Usage: python tools/soak_spandecontam.py [--replicas 20] [--sf DIR]
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

    from etl_guiacores_spark.operators.decontam import (
        cross_span_contamination,
    )
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="spandecontam-soak")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.sf}/documents.parquet").filter(
        F.length(F.trim("text")) > 0
    )
    reps = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias(
            "rep"
        ),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * args.replicas + F.col("rep")).alias("doc_id"),
        "text",
    )
    tmp = tempfile.mkdtemp(prefix="soak_span_")
    reps.write.mode("overwrite").parquet(f"{tmp}/docs.parquet")
    d = spark.read.parquet(f"{tmp}/docs.parquet")
    n_docs = d.count()

    train = d.filter(F.col("doc_id") % 37 != 0)
    ev = d.filter(F.col("doc_id") % 37 == 0)
    n_eval = ev.count()

    t0 = time.time()
    got = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_grams"])
        for r in cross_span_contamination(train, ev, n=8).collect()
    }
    wall = round(time.time() - t0, 1)

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/docs.parquet/*.parquet')"
    )
    toks = "string_split_regex(trim(text), '[ \\t\\n\\r\\f\\v]+')"
    oracle = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            f"""
            WITH tbase AS MATERIALIZED (
                SELECT doc_id, toks
                FROM (SELECT doc_id, {toks} AS toks FROM documents
                      WHERE doc_id % 37 <> 0)
                WHERE len(toks) >= 8
            ),
            ebase AS MATERIALIZED (
                SELECT doc_id, toks
                FROM (SELECT doc_id, {toks} AS toks FROM documents
                      WHERE doc_id % 37 = 0)
                WHERE len(toks) >= 8
            ),
            egrams AS (
                SELECT DISTINCT
                       md5(array_to_string(toks[u.i:u.i+7], ' ')) AS g
                FROM ebase, LATERAL unnest(range(1, len(toks) - 6)) u(i)
            ),
            tgrams AS (
                SELECT doc_id, u.i - 1 AS pos,
                       md5(array_to_string(toks[u.i:u.i+7], ' ')) AS g
                FROM tbase, LATERAL unnest(range(1, len(toks) - 6)) u(i)
            ),
            hits AS (SELECT doc_id, pos FROM tgrams JOIN egrams USING (g)),
            flagged AS (
                SELECT doc_id, pos,
                       CASE WHEN COALESCE(pos - LAG(pos) OVER (
                                PARTITION BY doc_id ORDER BY pos), 9) > 8
                            THEN 1 ELSE 0 END AS nf
                FROM hits),
            islands AS (
                SELECT doc_id, pos,
                       SUM(nf) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS isl
                FROM flagged)
            SELECT doc_id, CAST(MIN(pos) AS BIGINT),
                   CAST(MAX(pos) + 8 AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM islands GROUP BY doc_id, isl
            """
        ).fetchall()
    }
    shutil.rmtree(tmp, ignore_errors=True)
    mismatches = sum(1 for k, v in got.items() if oracle.get(k) != v)
    mismatches += sum(1 for k in oracle if k not in got)
    out = {
        "docs": n_docs,
        "eval_docs": n_eval,
        "spans": len(got),
        "wall_s": wall,
        "mismatches": mismatches,
        "ok": mismatches == 0,
    }
    print(json.dumps(out))
    return 0 if mismatches == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
