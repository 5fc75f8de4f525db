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


class TestSchemaEvolution:
    def test_align_fills_casts_and_drops(self, spark):
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import align_to_schema

        df = spark.createDataFrame(
            [("1", "x", "junk")], "id string, name string, legacy string"
        )
        target = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("added_later", T.DoubleType()),
            ]
        )
        out = align_to_schema(df, target)
        assert [f.name for f in out.schema.fields] == ["id", "name", "added_later"]
        assert out.schema["id"].dataType.simpleString() == "bigint"
        row = out.first()
        assert row["id"] == 1 and row["added_later"] is None
        out2 = align_to_schema(df, target, keep_extra=True)
        assert "legacy" in out2.columns

    def test_align_strict_raises_on_missing(self, spark):
        import pytest
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import align_to_schema

        df = spark.createDataFrame([(1,)], "id long")
        target = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("gone", T.StringType())]
        )
        with pytest.raises(ValueError, match="gone"):
            align_to_schema(df, target, strict=True)

    def test_align_malformed_casts_to_null_not_abort(self, spark):
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import align_to_schema

        df = spark.createDataFrame([("not-a-number",)], "id string")
        target = T.StructType([T.StructField("id", T.LongType())])
        assert align_to_schema(df, target).first()["id"] is None

    def test_read_evolved_across_shard_generations(self, spark, tmp_path):
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import read_evolved

        p = str(tmp_path / "t")
        # generation 1: (id int, name)
        spark.createDataFrame([(1, "a")], "id int, name string").write.mode(
            "append"
        ).parquet(p)
        # generation 2: (id long, name, score) — widened + added
        spark.createDataFrame(
            [(2**40, "b", 0.5)], "id long, name string, score double"
        ).write.mode("append").parquet(p)
        target = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        rows = {r["name"]: r for r in read_evolved(spark, p, target).collect()}
        assert rows["a"]["id"] == 1 and rows["a"]["score"] is None
        assert rows["b"]["id"] == 2**40 and rows["b"]["score"] == 0.5


class TestSchemaDrift:
    def test_classifies_all_kinds(self):
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import schema_drift

        old = T.StructType([
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.LongType()),
            T.StructField("d", T.StringType()),
        ])
        new = T.StructType([
            T.StructField("a", T.LongType()),      # widened
            T.StructField("b", T.IntegerType()),   # retyped
            T.StructField("c", T.LongType()),      # unchanged
            T.StructField("e", T.DoubleType()),    # added; d removed
        ])
        got = {d["column"]: d["kind"] for d in schema_drift(old, new)}
        assert got == {"a": "widened", "b": "retyped",
                       "d": "removed", "e": "added"}

    def test_order_change_is_not_drift(self):
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import schema_drift

        old = T.StructType([
            T.StructField("x", T.StringType()),
            T.StructField("y", T.LongType()),
        ])
        new = T.StructType([
            T.StructField("y", T.LongType()),
            T.StructField("x", T.StringType()),
        ])
        assert schema_drift(old, new) == []

    def test_widened_matches_read_evolved_behavior(self, spark, tmp_path):
        """The 'widened' class must be exactly what read_evolved
        absorbs: write an int shard, read with a long target."""
        from pyspark.sql import types as T

        from etl_guiacores_spark.schema import read_evolved, schema_drift

        p = str(tmp_path / "gen")
        spark.createDataFrame([(1,), (2,)], "v int").write.parquet(p)
        target = T.StructType([T.StructField("v", T.LongType())])
        drift = schema_drift(
            T.StructType([T.StructField("v", T.IntegerType())]), target
        )
        assert drift == [{"column": "v", "kind": "widened",
                          "old_type": "int", "new_type": "bigint"}]
        rows = read_evolved(spark, p, target).collect()
        assert sorted(r["v"] for r in rows) == [1, 2]


def test_drift_report_matches_dict_version(spark):
    """The relational twin (q126's engine) must classify identically to
    the dict-returning schema_drift on all four kinds."""
    from pyspark.sql import types as T

    from etl_guiacores_spark.schema import schema_drift, schema_drift_report

    old = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.DoubleType()),
            T.StructField("c", T.StringType()),
            T.StructField("keep", T.LongType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("a", T.LongType()),      # widened
            T.StructField("b", T.StringType()),    # retyped
            T.StructField("keep", T.LongType()),   # unchanged
            T.StructField("d", T.BooleanType()),   # added; c removed
        ]
    )
    want = schema_drift(old, new)
    got = sorted(
        (r.asDict() for r in schema_drift_report(spark, old, new).collect()),
        key=lambda d: d["col_name"],
    )
    assert [
        {"column": g["col_name"], "kind": g["kind"],
         "old_type": g["old_type"], "new_type": g["new_type"]}
        for g in got
    ] == want
