"""Every registry query must run (not necessarily return rows) on
ZERO-row inputs — the R4 empty-guard discipline applied to the whole
suite. Catches .head()/first()/assume-nonempty bugs that only surface
on an empty partition, which at 100 TB is any filter that matches
nothing."""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from etl_guiacores_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Same schemas as the synthetic tables, zero rows."""
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    failures = []
    for name, fn in em.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)
