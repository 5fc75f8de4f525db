"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``etl_guiacores_spark.queries.REGISTRY``: the driver
runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]``
at sf=0.01 and compares against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import etl_guiacores_spark.queries_corpus  # noqa: F401 — registers corpus-curation queries
import etl_guiacores_spark.queries_extra  # noqa: F401 — registers coverage queries
import etl_guiacores_spark.queries_scale  # noqa: F401 — registers scale queries
from etl_guiacores_spark.queries import REGISTRY
from etl_guiacores_spark.session import configure_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Round 1's driver CORRECTNESS run truncated after 50 of 62 registry
# entries, leaving the 12 newest queries untested (plus one hash
# mismatch, since fixed). Emit those 12 first so that even a truncated
# run confirms them; the displaced queries all hold round-1 passes.
_FIRST = [
    "q32_sessionization",
    "q33_event_dedupe_first",
    "q44_document_chunking",
    "q45_vocabulary",
    "q46_tfidf",
    "q49_hypertable_rollup",
    "q50_corpus_dedup_survivors",
    "q58_source_mixture",
    "q59_decontamination",
    "q60_pii_redaction",
    "q61_repetition_score",
    "q62_dedup_clusters",
    "q56_extract_all_numbers",
    # round-2 additions — also driver-unconfirmed until they appear in
    # a CORRECTNESS artifact
    "q63_ivf_ann_fullprobe",
    "q64_quantize_int8",
    "q65_multimodal_decode",
    "q66_sequence_packing",
    "q67_stratified_sample",
    "q68_bigram_counts",
    "q69_simhash_hamming_pairs",
    "q70_salted_distinct_count",
    "q71_dup_ngram_fraction",
    "q72_winnowing_fingerprints",
    "q73_hash_split_counts",
    "q74_bigram_lm_score",
    "q75_bpe_token_count",
    "q76_source_length_deciles",
    "q77_winnow_overlap_pairs",
    "q78_gopher_quality_rules",
    "q79_centroid_outliers",
    "q80_dense_ids",
    "q81_span_dedup_reconstruct",
    "q82_temperature_mixture",
    "q83_zorder_layout",
    "q84_knn_label_vote",
    "q85_split_leakage",
    "q86_minhash_estimate_error",
]


def _ordered_names() -> list[str]:
    head = [n for n in _FIRST if n in REGISTRY]
    return head + [n for n in REGISTRY if n not in _FIRST]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    configure_session(spark)
    return REGISTRY["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(REGISTRY[name].fn) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted -> rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
