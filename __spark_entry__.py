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
import etl_guiacores_spark.queries_eval  # noqa: F401 — registers eval/drift queries
import etl_guiacores_spark.queries_analytics  # noqa: F401 — registers round-8 analytics queries
import etl_guiacores_spark.queries_scale  # noqa: F401 — registers scale queries
from etl_guiacores_spark.queries import REGISTRY
from etl_guiacores_spark.session import configure_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's CORRECTNESS artifact truncates at 50 rows, so emission
# order decides which rows get a fresh confirmation each round. Round-8
# rotation: (1) the 41 queries added after the round-7 window was
# emitted (q146-q186) — locally oracle-verified in round 7, never yet
# in a driver window — then (2) the 9 lowest-numbered of the 46 rows
# whose latest driver pass is round 5. That is exactly 50 rows. The
# remaining 37 round-5 rows lead the round-9 window (positions 51-87
# below). NOTE on the staleness contract: with 187 registered queries
# and a hard 50-row driver cap, the full rotation period is
# ceil(187/50) = 4 rounds, so the steady-state worst case is 3 rounds
# stale (the 37 leftover round-5 rows after this window) — the old
# "<=2 rounds" phrasing was only achievable below 150 queries. Every
# row is still locally oracle-verified every round regardless
# (tools/check_oracle.py 187/187 at sf0.01).
_FIRST = [
    # ---- round-8 window rows 1-41: added after the round-7 window
    # was emitted; no driver CORRECTNESS row yet
    "q146_spearman_trend",
    "q147_last_touch",
    "q148_gini_tokens",
    "q149_twap",
    "q150_auc_roc",
    "q151_ks_drift",
    "q152_confusion_metrics",
    "q153_transition_matrix",
    "q154_pareto_frontier",
    "q155_benford_digits",
    "q156_rrf_fusion",
    "q157_decile_lift",
    "q158_vocab_jaccard",
    "q159_weighted_median",
    "q160_assoc_rules",
    "q161_top_paths",
    "q162_kcore_dedup",
    "q163_golden_record",
    "q164_kanonymity",
    "q165_interval_union",
    "q166_l_diversity",
    "q167_column_profile",
    "q168_countmin_audit",
    "q169_quantile_normalize",
    "q170_holt_trend",
    "q171_position_attribution",
    "q172_mixture_waterfill",
    "q173_padding_waste",
    "q174_pq_assign",
    "q175_hll_audit",
    "q176_kmeans_step",
    "q177_span_decontam",
    "q178_kaplan_meier",
    "q179_codebook_balance",
    "q180_negative_sampling",
    "q181_cluster_cohesion",
    "q182_threshold_sweep",
    "q183_bootstrap_ci",
    "q184_ab_readout",
    "q185_gap_percentiles",
    "q186_daily_acquisition",
    # ---- round-8 window rows 42-50: the 9 lowest-numbered rows whose
    # latest driver pass is round 5 (the rest of the round-5 cohort is
    # below, leading round 9)
    "q14_phone_normalize",
    "q15_email_validate",
    "q16_url_pipeline",
    "q17_address_split",
    "q18_business_id_from_url",
    "q19_urlgen",
    "q20_clean_text_documents",
    "q21_token_quality",
    "q22_lang_id",
    # ---- positions 51-58: the 8 queries ADDED in round 8 (analytics
    # wave, queries_analytics.py) — no driver row yet; they lead the
    # round-9 window ahead of the stale round-5 rows (new-row debt
    # outranks stale-row debt). 8 new + 37 round-5 = 45 <= 50: the
    # round-9 window closes the whole backlog with 5 rows of slack.
    "q187_max_drawdown",
    "q188_state_dwell",
    "q189_lead_lag_xcorr",
    "q190_coo_matmul",
    "q191_fk_orphan_audit",
    "q192_wow_growth",
    "q193_lorenz_concentration",
    "q194_quantile_sketch_audit",
    # ---- positions 59-95: the 37 remaining round-5 rows (3 rounds
    # stale after this window, the steady-state worst case for a
    # 195-query registry under a 50-row cap; see header comment).
    "q23_fingerprint",
    "q24_minhash_signatures",
    "q25_lsh_candidates",
    "q26_ngram_jaccard",
    "q27_simhash",
    "q28_cosine_topk",
    "q29_embedding_neardup",
    "q56_extract_all_numbers",
    "q63_ivf_ann_fullprobe",
    "q64_quantize_int8",
    "q65_multimodal_decode",
    "q66_sequence_packing",
    "q66b_packing_invariants",
    "q67_stratified_sample",
    "q68_bigram_counts",
    "q69_simhash_hamming_pairs",
    "q71_dup_ngram_fraction",
    "q72_winnowing_fingerprints",
    "q73_hash_split_counts",
    "q74_bigram_lm_score",
    "q75_bpe_token_count",
    "q76_source_length_deciles",
    "q77_winnow_overlap_pairs",
    "q78_gopher_quality_rules",
    "q79_centroid_outliers",
    "q81_span_dedup_reconstruct",
    "q82_temperature_mixture",
    "q83_zorder_layout",
    "q84_knn_label_vote",
    "q85_split_leakage",
    "q86_minhash_estimate_error",
    "q88_blocklist_filter",
    "q116_qgram_fuzzy_join",
    "q117_dsir_select",
    "q118_qgram_entity_resolution",
    "q120_leakage_safe_split",
    "q121_incremental_dedup",
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
