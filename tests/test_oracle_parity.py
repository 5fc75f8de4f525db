"""In-suite oracle parity: representative queries vs DuckDB at sf0.001.

The full sweep lives in tools/check_oracle.py (all 57 queries, any
SF); this test pins a fast representative subset into pytest so
oracle drift is caught by `pytest` alone in future rounds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from etl_guiacores_spark.sources.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"

REPRESENTATIVE = [
    "q01_pricing_summary",      # agg
    "q03_regional_revenue",     # broadcast star join
    "q07_keep_first_dedupe",    # window dedupe
    "q14_phone_normalize",      # cleaning fn
    "q24_minhash_signatures",   # portable hash family
    "q30_tumbling_window",      # event-time window / nanos path
    "q47_asof_join",            # temporal join
    "q57_decimal_exact",        # exact decimal
    "q62_dedup_clusters",       # adaptive CC vs recursive-CTE closure
    "q64_quantize_int8",        # quantization checksums
    "q65_multimodal_decode",    # sha256 digest arithmetic across engines
    "q67_stratified_sample",    # hash-threshold sampling portability
    "q69_simhash_hamming_pairs",  # byte-banded Hamming pairs
    "q81_span_dedup_reconstruct",  # ordered reconstruction md5
    "q83_zorder_layout",        # 64-bit bit-interleave portability
    "q201_fetch_parse_roundtrip",  # scrape path end-to-end vs closed forms
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
    scols = sorted(sdf.columns)

    res = duck.execute(oracles[name])
    dcols = sorted(d[0] for d in res.description)
    drows = sorted(tuple(str(v) for v in r) for r in res.fetchall())

    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows
