"""Canonical schema: tolerant ingestion + export codec (SURVEY §1.2)."""

from __future__ import annotations

from etl_guiacores_spark.schema import EXPORT_COLUMNS, LEAD_SCHEMA, canonicalize, to_export


class TestCanonicalize:
    def test_manual_mode_rename_and_missing_columns(self, spark):
        # manual-mode Spanish-capitalized variant (T14, SURVEY §0 defect #6)
        df = spark.createDataFrame(
            [("10", "Panadería Sol", "299-123-4567, 2991112222", "-38.95")],
            ["ID", "Nombre", "Teléfonos", "Latitud"],
        )
        got = canonicalize(df)
        assert [f.name for f in got.schema.fields] == [f.name for f in LEAD_SCHEMA.fields]
        row = got.collect()[0]
        assert row["id_negocio"] == "10"
        assert row["nombre"] == "Panadería Sol"
        assert row["telefonos"] == ["299-123-4567", "2991112222"]
        assert row["latitud"] == -38.95
        assert row["email"] is None

    def test_export_renders_na_and_joins_arrays(self, spark):
        df = canonicalize(
            spark.createDataFrame([("10", "Sol", "a, b")], ["ID", "Nombre", "Teléfonos"])
        )
        out = to_export(df)
        assert out.columns == EXPORT_COLUMNS
        row = out.collect()[0]
        assert row["telefonos"] == "a, b"
        assert row["email"] == "N/A"
