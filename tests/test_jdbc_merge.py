"""Keyed JDBC upsert: generated DDL + merge statements are executed
for real against SQLite and DuckDB (which share the ON CONFLICT
dialect with the reference's Postgres), and the ANSI MERGE text is
contract-checked. No JDBC driver ships in this container, so the
staging-write plumbing itself is exercised only up to SQL generation.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import types as T

from etl_guiacores_spark.jdbc_merge import (
    bootstrap_ddl,
    jdbc_keyed_upsert,
    merge_sql,
    staging_name,
)

SCHEMA = T.StructType(
    [
        T.StructField("id_negocio", T.StringType()),
        T.StructField("nombre", T.StringType()),
        T.StructField("visits", T.LongType()),
    ]
)
COLS = [f.name for f in SCHEMA.fields]


def _run_upsert_roundtrip(execute, fetch_all):
    """Shared scenario: bootstrap, seed target+staging, merge, verify
    update-existing / insert-new / keep-untouched semantics."""
    table, staging = "leads", staging_name("leads")
    execute(bootstrap_ddl(SCHEMA, table, "id_negocio"))
    execute(bootstrap_ddl(SCHEMA, staging, "id_negocio"))
    execute(f"INSERT INTO {table} VALUES ('a', 'old-a', 1), ('b', 'old-b', 2)")
    execute(f"INSERT INTO {staging} VALUES ('b', 'new-b', 20), ('c', 'new-c', 30)")
    execute(merge_sql(table, staging, "id_negocio", COLS, dialect="onconflict"))
    got = {r[0]: (r[1], r[2]) for r in fetch_all(f"SELECT * FROM {table}")}
    assert got == {"a": ("old-a", 1), "b": ("new-b", 20), "c": ("new-c", 30)}


def test_onconflict_upsert_executes_on_sqlite():
    con = sqlite3.connect(":memory:")
    _run_upsert_roundtrip(
        lambda sql: con.execute(sql),
        lambda sql: con.execute(sql).fetchall(),
    )


def test_onconflict_upsert_executes_on_duckdb():
    import duckdb

    con = duckdb.connect()
    # DuckDB enforces ON CONFLICT against constraints just like Postgres
    _run_upsert_roundtrip(con.execute, lambda sql: con.execute(sql).fetchall())


def test_merge_dialect_contract():
    sql = merge_sql("leads", "leads__staging", "id_negocio", COLS, dialect="merge")
    assert sql == (
        'MERGE INTO "leads" t USING "leads__staging" s '
        'ON t."id_negocio" = s."id_negocio"\n'
        'WHEN MATCHED THEN UPDATE SET "nombre" = s."nombre", "visits" = s."visits"\n'
        'WHEN NOT MATCHED THEN INSERT ("id_negocio", "nombre", "visits") '
        'VALUES (s."id_negocio", s."nombre", s."visits")'
    )


def test_bootstrap_ddl_types_and_unique_key():
    ddl = bootstrap_ddl(SCHEMA, "leads", "id_negocio")
    assert 'CREATE TABLE IF NOT EXISTS "leads"' in ddl
    assert '"id_negocio" TEXT UNIQUE' in ddl
    assert '"visits" BIGINT' in ddl


def test_array_columns_fall_back_to_text():
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("telefonos", T.ArrayType(T.StringType())),
            T.StructField("precio", T.DecimalType(18, 2)),
        ]
    )
    ddl = bootstrap_ddl(schema, "t", "k")
    assert '"telefonos" TEXT' in ddl
    assert '"precio" DECIMAL(18,2)' in ddl


def test_unknown_dialect_rejected():
    with pytest.raises(ValueError, match="dialect"):
        merge_sql("t", "s", "k", ["k", "v"], dialect="nope")


def test_driver_gated_error_names_statements(spark):
    """Without a JDBC driver the failure is loud and shows the exact
    statements that would have run."""
    df = spark.createDataFrame([("a", "x", 1)], SCHEMA)
    with pytest.raises(RuntimeError, match='MERGE INTO .leads.'):
        jdbc_keyed_upsert(df, "jdbc:postgresql://nowhere/db", "leads", "id_negocio")
