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


class TestAnsiTolerance:
    def test_canonicalize_malformed_sentinels_null_not_crash(self, spark):
        """The reference scraper emits 'N/A' pervasively; under ANSI
        (Spark 4 default) a plain cast would ABORT the bronze write —
        tolerant ingestion means malformed -> NULL."""
        from etl_guiacores_spark.schema import canonicalize

        d = spark.createDataFrame(
            [("N/A", "N/A", "not-a-number")],
            "fecha_extraccion string, latitud string, id_negocio string",
        )
        row = canonicalize(d).select("fecha_extraccion", "latitud").collect()[0]
        assert row["fecha_extraccion"] is None
        assert row["latitud"] is None

    def test_export_empty_array_renders_na(self, spark):
        """[] and NULL are the same 'missing' and must export
        identically as N/A — not as two distinct encodings."""
        from etl_guiacores_spark.schema import to_export

        d = spark.createDataFrame(
            [("1", []), ("2", None)],
            "id_negocio string, telefonos array<string>",
        )
        vals = {r["id_negocio"]: r["telefonos"] for r in to_export(d).collect()}
        assert vals == {"1": "N/A", "2": "N/A"}
