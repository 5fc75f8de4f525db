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

from pyspark.sql import DataFrame
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
