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
