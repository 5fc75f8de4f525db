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

# The driver's CORRECTNESS artifact truncates at 50 rows, so emission
# order decides which rows get a fresh confirmation each round. Round-5
# rotation: (1) queries NEW or whose code/oracle changed this round
# (q117-q124 new — q119 BM25, q120 leakage-safe split, q121 collision
# flags, q122 snapshot diff, q123 EWMA, q124 MAD gate;
# q116 short-string fallback + ground-truth oracle;
# q66 gained its recursive-CTE oracle and the pinned bin key; q66b
# rides the same pack_chunks change; q88 rides the NULL-key blocklist
# fix), then (2) the 22 round-2-stale rows that overflowed round 4's
# window, then (3) round-3 rows oldest-first (22 of 45 fit). The
# round-3 tail (q38 onward, q47, q87, q90-q105) rides its round-3
# passes one more round — front of block (3) in round 6; with this
# schedule nothing in the artifact union is ever more than two rounds
# stale. All rows are locally oracle-verified every round regardless
# (tools/check_oracle.py).
_FIRST = [
    # new this round — no driver row at all yet
    "q117_dsir_select",
    "q118_qgram_entity_resolution",
    "q119_bm25_topk",
    "q120_leakage_safe_split",
    "q121_incremental_dedup",
    "q122_snapshot_diff",
    "q123_ewma_smooth",
    "q124_mad_outliers",
    # round-5 code/oracle changes — need a fresh driver row
    "q116_qgram_fuzzy_join",
    "q66_sequence_packing",
    "q66b_packing_invariants",
    "q88_blocklist_filter",
    # round-2-stale rows that overflowed round 4's window
    "q71_dup_ngram_fraction",
    "q72_winnowing_fingerprints",
    "q73_hash_split_counts",
    "q74_bigram_lm_score",
    "q75_bpe_token_count",
    "q63_ivf_ann_fullprobe",
    "q64_quantize_int8",
    "q65_multimodal_decode",
    "q76_source_length_deciles",
    "q77_winnow_overlap_pairs",
    "q78_gopher_quality_rules",
    "q79_centroid_outliers",
    "q81_span_dedup_reconstruct",
    "q82_temperature_mixture",
    "q83_zorder_layout",
    "q84_knn_label_vote",
    "q56_extract_all_numbers",
    "q67_stratified_sample",
    "q68_bigram_counts",
    "q69_simhash_hamming_pairs",
    "q85_split_leakage",
    "q86_minhash_estimate_error",
    # round-3 rows, oldest-first (q38 onward overflow to round 6)
    "q14_phone_normalize",
    "q15_email_validate",
    "q16_url_pipeline",
    "q17_address_split",
    "q18_business_id_from_url",
    "q19_urlgen",
    "q20_clean_text_documents",
    "q21_token_quality",
    "q22_lang_id",
    "q23_fingerprint",
    "q24_minhash_signatures",
    "q25_lsh_candidates",
    "q26_ngram_jaccard",
    "q27_simhash",
    "q28_cosine_topk",
    "q29_embedding_neardup",
    "q30_tumbling_window",
    "q31_sliding_window",
    "q34_merge_upsert",
    "q35_type_coercion",
    "q36_phone_list_ops",
    "q37_exact_dedupe",
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
