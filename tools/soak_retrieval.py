"""Batch-retrieval soak: the q131/q132 shapes at 20x corpus volume.

Two claims under test (VERDICT r6 asked for both):

1. **Wall-clock holds at volume**: bm25_batch_topk (top-k per query)
   and the full-rank retrieval-metrics aggregate over ~100k documents
   finish in seconds, not minutes, on local[32].
2. **The one-scan shape survives scale AND query-set growth**: the
   number of parquet scans of the corpus in the physical plan is a
   small CONSTANT (stats + postings = 2), identical for a 4-query and
   a 64-query batch — i.e. the plan never degrades to
   scan-per-query. Asserted on the executed plan string, the same
   surface plan_audit reads.

Usage: python tools/soak_retrieval.py [--replicas 20] [--sf DIR]
                                      [--queries 64] [--terms 4]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def corpus_scan_count(df, path_fragment: str) -> int:
    """Number of FileScan/Scan-parquet leaves over the corpus path in
    the final plan. AQE hides the real count until execution, so read
    the initial (pre-AQE) physical plan — scan multiplicity is decided
    at logical planning, not by AQE."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Scan parquet" in line and path_fragment in line
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--terms", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.retrieval import bm25_batch_topk, tokens
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="retrieval-soak")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text"
    )
    # replicate with a deterministic suffix so every row is distinct
    # but the vocabulary (hence df/idf shape) is preserved
    reps = base.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep"),
    ).select(
        (F.col("doc_id") * args.replicas + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.concat(F.col("text"), F.lit(" rep "), (F.col("rep") % 7).cast("string"))
        )
        .alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="soak_retrieval_")
    corpus_path = f"{tmp}/corpus.parquet"
    reps.write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()

    # deterministic query sets over the ACTUAL vocabulary (the
    # synthetic corpus has ~31 words, nearly all with df ~ 78% — so
    # the postings filter keeps most of the token stream: the WORST
    # case for the one-scan claim, which is the point of a soak).
    # Query qi takes vocab indices qi, qi+s, qi+2s, ... (s = stride
    # that guarantees within-query distinctness mod |vocab|); queries
    # may share terms, each query's terms are distinct.
    vocab = [
        r["tok"]
        for r in (
            docs.select(
                F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
            )
            .distinct()
            .select("tok", F.md5("tok").alias("h"))
            .orderBy("h")
            .collect()
        )
    ]
    if len(vocab) < args.terms:
        raise SystemExit(f"vocabulary too small: {len(vocab)}")
    stride = max(1, len(vocab) // args.terms)
    n_q = args.queries
    qrows = []
    for qi in range(n_q):
        terms, seen = [], set()
        j, steps = qi, 0
        while len(terms) < args.terms and steps < 2 * len(vocab):
            t = vocab[j % len(vocab)]
            if t not in seen:
                seen.add(t)
                terms.append(t)
            j += stride
            steps += 1
        for t in vocab:  # fill linearly if the stride orbit was small
            if len(terms) >= args.terms:
                break
            if t not in seen:
                seen.add(t)
                terms.append(t)
        qrows.append((qi, terms))
    qdf = spark.createDataFrame(qrows, "query_id long, terms array<string>")
    qdf_small = spark.createDataFrame(qrows[:4], "query_id long, terms array<string>")

    # --- scan-shape assertion: corpus scans constant in |queries| ----
    plan_small = bm25_batch_topk(docs, qdf_small, k=20)
    plan_full = bm25_batch_topk(docs, qdf, k=20)
    s_small = corpus_scan_count(plan_small, "corpus.parquet")
    s_full = corpus_scan_count(plan_full, "corpus.parquet")
    assert s_small == s_full, (
        f"corpus scan count grew with query count: {s_small} -> {s_full}"
    )
    assert s_full <= 2, f"expected <=2 corpus scans (stats+postings), got {s_full}"

    # --- leg A: q131 shape, top-20 per query -------------------------
    t0 = time.time()
    topk = bm25_batch_topk(docs, qdf, k=20)
    n_topk = topk.count()
    t_topk = time.time() - t0

    # --- leg B: q132 shape, FULL-rank metrics ------------------------
    t0 = time.time()
    ranked = bm25_batch_topk(docs, qdf, k=1 << 60)
    nq = qdf.select("query_id", F.size("terms").cast("long").alias("n_terms"))
    full = F.col("n_hit_terms") == F.col("n_terms")
    metrics = (
        ranked.join(F.broadcast(nq), "query_id")
        .groupBy("query_id", "n_terms")
        .agg(
            F.count_if(full).cast("long").alias("n_relevant"),
            F.expr(
                "CAST(count_if(n_hit_terms = n_terms AND rank <= 20) "
                "* 1000000 div LEAST(20, NULLIF(count_if("
                "n_hit_terms = n_terms), 0)) AS BIGINT)"
            ).alias("recall_at20_ppm"),
            F.expr(
                "CAST(1000000 div MIN(CASE WHEN n_hit_terms = n_terms "
                "THEN rank END) AS BIGINT)"
            ).alias("mrr_ppm"),
        )
    )
    rows = metrics.collect()
    t_metrics = time.time() - t0
    n_answered = sum(1 for r in rows if r["n_relevant"] and r["n_relevant"] > 0)

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_queries": n_q,
                "terms_per_query": args.terms,
                "corpus_scans_in_plan": s_full,
                "topk_rows": n_topk,
                "topk_sec": round(t_topk, 1),
                "metrics_queries": len(rows),
                "queries_with_relevant": n_answered,
                "metrics_sec": round(t_metrics, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
