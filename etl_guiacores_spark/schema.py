"""Canonical lead-record schema + tolerant ingestion + export codec.

The reference's widest producer emits 17 all-string fields
(reference: src/extractors/bulk_scraper.py:86-104); manual mode emits
Spanish-capitalized variants (reference: src/extractors/manual_scraper.py:92-177,
SURVEY §0 defect #6). The engine fixes ONE typed StructType:
multi-valued fields are arrays, timestamps/coordinates are typed,
missing data is real NULL; the 'N/A' sentinel exists only at the CSV
boundary (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical schema — reference: src/extractors/bulk_scraper.py:86-104,
#: typed per SURVEY §1.2; `localidad` added by the clean tool
#: (reference: src/tools/clean_data.py:117-128).
LEAD_SCHEMA = T.StructType(
    [
        T.StructField("id_negocio", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("fecha_extraccion", T.TimestampType()),
        T.StructField("nombre", T.StringType()),
        T.StructField("direccion", T.StringType()),
        T.StructField("localidad", T.StringType()),
        T.StructField("telefonos", T.ArrayType(T.StringType())),
        T.StructField("whatsapp", T.StringType()),
        T.StructField("sitio_web", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("facebook", T.StringType()),
        T.StructField("instagram", T.StringType()),
        T.StructField("horarios", T.StringType()),
        T.StructField("rubros", T.ArrayType(T.StringType())),
        T.StructField("descripcion", T.StringType()),
        T.StructField("servicios", T.StringType()),
        T.StructField("latitud", T.DoubleType()),
        T.StructField("longitud", T.DoubleType()),
    ]
)

#: manual-mode Spanish-capitalized -> canonical rename map (T14).
#: reference: src/extractors/manual_scraper.py:92-177.
MANUAL_RENAME = {
    "ID": "id_negocio",
    "URL": "url",
    "Nombre": "nombre",
    "Dirección": "direccion",
    "Teléfonos": "telefonos",
    "WhatsApp": "whatsapp",
    "Sitio Web": "sitio_web",
    "Email": "email",
    "Facebook": "facebook",
    "Instagram": "instagram",
    "Horario": "horarios",
    "Rubros": "rubros",
    "Descripción": "descripcion",
    "Servicios": "servicios",
    "Latitud": "latitud",
    "Longitud": "longitud",
}

#: export column order of the offline clean tool
#: (reference: src/tools/clean_data.py:117-128).
EXPORT_COLUMNS = [
    "id_negocio",
    "nombre",
    "direccion",
    "localidad",
    "telefonos",
    "whatsapp",
    "sitio_web",
    "email",
    "facebook",
    "instagram",
]


def canonicalize(df: DataFrame) -> DataFrame:
    """Tolerant ingestion: rename manual-mode columns (T14), add any
    missing canonical columns as NULL, cast to the canonical types,
    and project in schema order (T13)."""
    renames = {old: new for old, new in MANUAL_RENAME.items() if old in df.columns}
    if renames:
        df = df.withColumnsRenamed(renames)

    cols = []
    for field in LEAD_SCHEMA.fields:
        if field.name not in df.columns:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        c = F.col(field.name)
        if isinstance(field.dataType, T.ArrayType) and not isinstance(
            df.schema[field.name].dataType, T.ArrayType
        ):
            # comma-joined string -> array (SURVEY §1.2)
            c = F.split(c, r",\s*")
        # try_cast, not cast: under ANSI (Spark 4 default) a plain cast
        # THROWS on the reference scraper's pervasive 'N/A'/malformed
        # sentinels — tolerant ingestion means malformed -> NULL, not
        # malformed -> job abort
        cols.append(c.try_cast(field.dataType).alias(field.name))
    return df.select(*cols)


def to_export(df: DataFrame) -> DataFrame:
    """Render the canonical frame for CSV export: arrays re-joined with
    ', ', NULL -> 'N/A', fixed column order (T13), tolerant of a
    narrower input the way the clean tool is
    (reference: src/tools/clean_data.py:113-134)."""
    out = df
    for field in LEAD_SCHEMA.fields:
        if field.name not in out.columns:
            continue
        c = F.col(field.name)
        if isinstance(field.dataType, T.ArrayType):
            # an EMPTY array would join to '' and dodge the N/A
            # coalesce below — nullify it so both missing encodings
            # ([] and NULL) export identically as 'N/A'
            c = F.nullif(F.array_join(c, ", "), F.lit(""))
        elif isinstance(field.dataType, T.TimestampType):
            c = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        elif not isinstance(field.dataType, T.StringType):
            c = c.cast("string")
        out = out.withColumn(field.name, F.coalesce(c, F.lit("N/A")))
    return out.select(*[c for c in EXPORT_COLUMNS if c in out.columns])


def align_to_schema(
    df: DataFrame,
    target: T.StructType,
    *,
    keep_extra: bool = False,
    strict: bool = False,
) -> DataFrame:
    """Generic schema-evolution alignment: project ``df`` onto
    ``target`` — missing columns become typed NULLs, present columns
    ``try_cast`` to the target type (malformed values -> NULL, never a
    job abort under ANSI), extra columns drop unless ``keep_extra``.

    ``strict=True`` raises on missing target columns instead of
    null-filling — the mode for feeds where a vanished column means a
    broken producer, not legitimate drift.

    This is ``canonicalize``'s rule generalized to ANY schema: years
    of parquet shards drift (columns added, retired, widened), and at
    100 TB the reader must absorb that without a backfill rewrite.
    """
    missing = [f.name for f in target.fields if f.name not in df.columns]
    if strict and missing:
        raise ValueError(f"columns missing from input: {missing}")
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).try_cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    if keep_extra:
        tnames = {f.name for f in target.fields}
        cols.extend(F.col(c) for c in df.columns if c not in tnames)
    return df.select(*cols)


def read_evolved(spark, path: str, target: T.StructType) -> DataFrame:
    """Read a parquet directory whose shards were written under
    DIFFERENT schema versions and serve them as ``target`` by handing
    the reader the target schema directly: shards missing a column
    yield typed NULLs for it, and Spark 4's parquet reader widens
    compatible primitives (int->long, float->double) INSIDE the scan.

    Preferred over ``mergeSchema`` + cast for drift within widening
    rules: no footer-merge job over every shard, and column pruning /
    predicate pushdown negotiate against the target schema. Spark's
    schema merge also refuses to widen at all ([CANNOT_MERGE_SCHEMAS]
    on an int->long drift), so the explicit schema is both faster and
    strictly more capable here. For drift OUTSIDE widening rules (a
    generation that stored ids as strings), read each generation
    separately and union through ``align_to_schema`` — that rewrite
    genuinely needs per-row try_cast.
    """
    return spark.read.schema(target).parquet(path)


#: widenings Spark's parquet reader performs inside the scan — drift
#: within these is absorbable by read_evolved without a rewrite
_SAFE_WIDENINGS = {
    ("int", "bigint"), ("float", "double"), ("int", "double"),
    ("smallint", "int"), ("smallint", "bigint"), ("tinyint", "smallint"),
    ("tinyint", "int"), ("tinyint", "bigint"), ("date", "timestamp_ntz"),
}


def schema_drift(old: T.StructType, new: T.StructType) -> list[dict]:
    """Classify the drift between two schema versions — the DETECTION
    side of the evolution story (align_to_schema/read_evolved are the
    absorption side, snapshot_diff the row-level one).

    One dict per changed column: ``kind`` is ``added`` / ``removed`` /
    ``widened`` (drift read_evolved absorbs inside the scan — the
    _SAFE_WIDENINGS table) / ``retyped`` (needs align_to_schema's
    per-row try_cast or a generation-split read). An ingest monitor
    alerts on ``removed``/``retyped`` and waves ``added``/``widened``
    through; CI can assert drift == [] against a frozen contract.
    Column order changes are NOT drift (parquet is name-addressed).
    """
    old_f = {f.name: f.dataType for f in old.fields}
    new_f = {f.name: f.dataType for f in new.fields}
    out: list[dict] = []
    for name in old_f:
        if name not in new_f:
            out.append({"column": name, "kind": "removed",
                        "old_type": old_f[name].simpleString(),
                        "new_type": None})
        elif old_f[name] != new_f[name]:
            pair = (old_f[name].simpleString(), new_f[name].simpleString())
            kind = "widened" if pair in _SAFE_WIDENINGS else "retyped"
            out.append({"column": name, "kind": kind,
                        "old_type": pair[0], "new_type": pair[1]})
    for name in new_f:
        if name not in old_f:
            out.append({"column": name, "kind": "added",
                        "old_type": None,
                        "new_type": new_f[name].simpleString()})
    return sorted(out, key=lambda d: d["column"])


def schema_drift_report(
    spark: SparkSession, old: T.StructType, new: T.StructType
) -> DataFrame:
    """DataFrame twin of :func:`schema_drift` — the same classification
    computed RELATIONALLY, so the ingest-monitor query is itself
    oracle-checkable (q126): the two schemas become (col_name, type)
    relations, drift is a name-keyed full outer join filtered to
    null-safe inequality, and the widened/retyped split is a broadcast
    lookup against the _SAFE_WIDENINGS table. Equivalence with the
    dict version is pytest-pinned; scale is irrelevant (schemas are
    hundreds of rows at most) — the relational form exists for the
    driver signal and for composing with other metadata queries.
    """
    o = spark.createDataFrame(
        [(f.name, f.dataType.simpleString()) for f in old.fields],
        "col_name string, old_type string",
    )
    n = spark.createDataFrame(
        [(f.name, f.dataType.simpleString()) for f in new.fields],
        "col_name string, new_type string",
    )
    widen = spark.createDataFrame(
        sorted(_SAFE_WIDENINGS), "w_old string, w_new string"
    ).withColumn("__w", F.lit(1))
    drift = (
        o.join(n, "col_name", "full_outer")
        .filter(~F.col("old_type").eqNullSafe(F.col("new_type")))
        .join(
            F.broadcast(widen),
            (F.col("old_type") == F.col("w_old"))
            & (F.col("new_type") == F.col("w_new")),
            "left",
        )
    )
    kind = (
        F.when(F.col("new_type").isNull(), F.lit("removed"))
        .when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("__w").isNotNull(), F.lit("widened"))
        .otherwise(F.lit("retyped"))
    )
    return drift.select(
        "col_name", kind.alias("kind"), "old_type", "new_type"
    )
