"""IO parity helpers: CSV consolidation, JSON round-trip, stats, audit."""

from __future__ import annotations

import json

from etl_guiacores_spark import io as gio


def test_csv_consolidation_scan(spark, tmp_path):
    # S9: two run CSVs -> one union scan
    a = spark.createDataFrame([("1", "x")], ["id_negocio", "nombre"])
    b = spark.createDataFrame([("2", "y")], ["id_negocio", "nombre"])
    a.write.option("header", True).csv(str(tmp_path / "runs" / "r1"))
    b.write.option("header", True).csv(str(tmp_path / "runs" / "r2"))
    got = gio.read_processed_csvs(spark, str(tmp_path / "runs" / "*"))
    assert got.count() == 2
    assert sorted(r["id_negocio"] for r in got.collect()) == ["1", "2"]


def test_json_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    gio.write_json(df, str(tmp_path / "j"))
    back = gio.read_json(spark, str(tmp_path / "j"))
    assert {(r["k"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_stats_and_audit(spark, tmp_path):
    gio.write_stats_json({"records": 5, "errors": 0}, str(tmp_path / "stats.json"))
    assert json.load(open(tmp_path / "stats.json"))["records"] == 5

    gio.append_audit_log(spark, str(tmp_path / "audit"), status="success", records=5)
    gio.append_audit_log(spark, str(tmp_path / "audit"), status="warning", records=0)
    log = gio.read_json(spark, str(tmp_path / "audit"))
    assert log.count() == 2
    entries = [json.loads(r["entry"]) for r in log.collect()]
    assert {e["status"] for e in entries} == {"success", "warning"}
    assert all("logged_at" in e for e in entries)


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A partition-column filter must prune at planning time
    (PartitionFilters on the scan), not post-read."""
    import os

    from etl_guiacores_spark.io import write_partitioned
    from etl_guiacores_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", "text", "source"
    )
    out = str(tmp_path / "docs_by_source")
    write_partitioned(docs, out, ["source"], max_records_per_file=1000)
    # hive layout on disk
    dirs = [d for d in os.listdir(out) if d.startswith("source=")]
    assert len(dirs) == docs.select("source").distinct().count()

    back = spark.read.parquet(out).filter("source = 'src3'")
    n = back.count()
    assert n == docs.filter("source = 'src3'").count() and n > 0
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src3" in plan
