"""Corpus-pipeline stress: sf0.1 documents replicated N-fold with
near-dup variants, pushed through the full pipeline (filter -> exact
dedup -> LSH+Jaccard near-dup removal -> chunk -> vocab).

The adversarial shape: every base doc becomes a clique of ~N near
duplicates, so the verify stage sees pair volume ~N^2/2 per doc and
the greedy survivor rule must collapse each clique back to ~1 doc.
Checks the LSH path's cost scales with TRUE near-dup density and that
dedup semantics hold under replication.

Usage: python tools/stress_corpus.py [--replicas 20] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cluster-exact", action="store_true",
                    help="connected-components survivor rule (exercises "
                    "the distributed CC loop above the union-find "
                    "threshold at stress edge volumes)")
    ap.add_argument("--strip-spans", action="store_true",
                    help="also run the Lee-et-al repeated-span strip "
                    "stage over the survivors (conservation invariants "
                    "asserted on the written artifact inside the "
                    "pipeline)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_guiacores_spark.plans.corpus_pipeline import CorpusConfig, run_corpus_pipeline
    from etl_guiacores_spark.session import get_spark

    spark = get_spark(app_name="corpus-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    n_base = base.count()
    # replica 0 is the original; replicas >0 append a tiny deterministic
    # suffix, keeping 3-shingle Jaccard >= the 0.8 default threshold's
    # reach for long docs while making every row byte-distinct
    reps = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))).alias("rep")
    ).select(
        (F.col("doc_id") * args.replicas + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" rep "), (F.col("rep") % 7).cast("string"))
        ).alias("text"),
        "lang",
        "source",
    )
    if args.strip_spans:
        # give the span-strip stage real work: a 12-token boilerplate
        # passage PREPENDED to every 3rd doc (prepended so it sits at
        # a different token offset than the docs' own shared prefixes
        # and survives near-dup removal on otherwise-distinct docs)
        boiler = ("standard legal boilerplate notice repeated verbatim "
                  "across many unrelated documents in this corpus")
        reps = reps.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(boiler + " "), F.col("text")),
            ).otherwise(F.col("text")).alias("text"),
            "lang",
            "source",
        )

    out = tempfile.mkdtemp(prefix="corpus_stress_")
    t0 = time.time()
    cfg = CorpusConfig(cluster_exact=args.cluster_exact,
                       strip_spans=args.strip_spans)
    metrics = run_corpus_pipeline(reps, out, cfg)
    wall = round(time.time() - t0, 1)
    print(json.dumps({
        "cluster_exact": args.cluster_exact,
        "strip_spans": args.strip_spans,
        "replicas": args.replicas,
        "base_docs": n_base,
        "wall_s": wall,
        "docs_per_sec": round(metrics["raw_docs"] / wall, 1),
        **metrics,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
