"""Named query suite — the engine's verifiable operator surface.

Each entry pairs a Spark DataFrame program with an equivalent DuckDB
SQL oracle over the same parquet tables (driver contract in
``__spark_entry__.py``). Naming convention: every computed column is
explicitly aliased identically in both, doubles are rounded, and
timestamps are rendered as strings, so the order-insensitive
value-hash comparison is bit-stable across engines.

Queries marked ``oracle=None`` are non-SQL-expressible (streaming,
iterative) and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_guiacores_spark.functions import (
    business_id_from_url,
    clean_text,
    normalize_phone,
    scrub_social,
    split_address,
    validate_email,
    validate_url,
)
from etl_guiacores_spark.functions.url import normalize_url
from etl_guiacores_spark.operators.dedupe import dedupe_keyed_first
from etl_guiacores_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Register a (Spark program, DuckDB oracle) pair.

    Every oracle's FINAL SELECT must meet the output-column contract
    in QUERIES.md ("Oracle output-type contract"): integer aggregates
    cast to BIGINT (DuckDB SUM(BIGINT) is HUGEINT, which a pandas/
    Arrow fetch renders as float64 and splits the value hash — q58
    burned two rounds on this), doubles ROUND()ed to a fixed scale on
    BOTH sides, timestamps rendered as strings, and every computed
    column aliased identically in Spark and SQL.
    ``tools/check_oracle.py`` enforces the HUGEINT rule mechanically.
    """

    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.6) — flagship pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A2-family grouped aggregation; hash partial+final agg via Catalyst.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.5)
# ---------------------------------------------------------------------------

@register(
    "q02_top_revenue_orders",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + deterministic top-k (TPC-H Q3 shape).",
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q03_regional_revenue",
    """
    SELECT r_name AS region,
           COUNT(*)                                          AS num_orders,
           ROUND(SUM(o_totalprice), 2)                       AS total_revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey   = c_custkey
    GROUP BY r_name
    """,
    doc="Star join with broadcast dims (J-family; dims region/nation broadcast).",
)
def q03_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("num_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@register(
    "q04_resume_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    """,
    doc="J2 resume anti-join — the reference's processed-ID skip "
    "(reference: src/extractors/sequential_scraper.py:346,359-375); the "
    "'processed' side here is the recent-orders subset so the result is "
    "non-trivial on the synthetic data.",
)
def q04_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    processed = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(processed, on="c_custkey", how="left_anti").select("c_custkey", "c_name")


@register(
    "q05_semi_join_segments",
    """
    SELECT c_mktsegment, COUNT(*) AS active_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="Semi join (set membership, the positive dual of J2).",
)
def q05_semi_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(o, on="c_custkey", how="left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("active_customers"))
    )


@register(
    "q06_filter_cross_product",
    """
    SELECT r_name AS rubro, o_orderpriority AS localidad
    FROM (SELECT DISTINCT r_name FROM region)
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    """,
    doc="J1 filter-combination cross product "
    "(reference: src/extractors/sequential_collector.py:140-154).",
)
def q06_filter_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("rubro")).distinct()
    p = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("localidad"))
        .distinct()
    )
    return r.crossJoin(p)


# ---------------------------------------------------------------------------
# Dedupe / windows (SURVEY §2.4, §2.7)
# ---------------------------------------------------------------------------

@register(
    "q07_keep_first_dedupe",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_shipdate, l_linenumber,
                                           l_quantity, l_extendedprice) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
    doc="D2/D3 keep-first keyed dedupe via ranking window "
    "(reference: src/extractors/sequential_collector.py:591-594). The "
    "order spec covers every output column: the synthetic data carries "
    "duplicate (orderkey, linenumber) rows, and an under-specified "
    "'first' is engine-dependent (SURVEY §7 hard part (b)) — exactly "
    "why dedupe_keyed_first demands an explicit order.",
)
def q07_keep_first_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return dedupe_keyed_first(
        li, ["l_orderkey"], ["l_shipdate", "l_linenumber", "l_quantity", "l_extendedprice"]
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q08_dup_report",
    """
    SELECT is_dup, COUNT(*) AS n
    FROM (
        SELECT CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey) = 1
                    THEN false ELSE true END AS is_dup
        FROM orders
    ) GROUP BY is_dup
    """,
    doc="D3 unique/duplicate split report (reference: src/common/utils.py:48-62).",
)
def q08_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("is_dup", F.row_number().over(w) > 1)
        .groupBy("is_dup")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q09_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rnk
    FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
    doc="Top-k per group — ranking window (SURVEY §2.7).",
)
def q09_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@register(
    "q10_latest_version",
    """
    SELECT o_custkey,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS latest_orderdate,
           COUNT(*)                               AS versions
    FROM orders
    GROUP BY o_custkey
    """,
    doc="L6/versioning analog — newest version per key "
    "(reference: src/common/versioning.py:75-94).",
)
def q10_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("latest_orderdate"),
        F.count("*").alias("versions"),
    )


# ---------------------------------------------------------------------------
# Set operations / grouping sets
# ---------------------------------------------------------------------------

@register(
    "q11_set_ops",
    """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'building_only' AS tag, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
    """,
    doc="intersect / except surface (SURVEY §2.4 'free' set ops).",
)
def q11_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    both = building.intersect(rich).select(F.lit("both").alias("tag"), "c_custkey")
    # subtract == SQL EXCEPT (set difference): a key present in rich is
    # removed ENTIRELY. exceptAll().distinct() is bag-difference-then-
    # dedup, which diverges whenever a key is duplicated on the left —
    # it only coincided here because c_custkey is unique.
    only = building.subtract(rich).select(
        F.lit("building_only").alias("tag"), "c_custkey"
    )
    return both.unionByName(only)


@register(
    "q12_rollup_acctbal",
    """
    SELECT r_name, n_name,
           COUNT(*)                 AS num_customers,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="rollup grouping sets (SURVEY §2.6 query-suite surface).",
)
def q12_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("num_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "q13_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="cube grouping sets.",
)
def q13_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Cleaning / validation surface (SURVEY §2.3) over synthesized dirty columns
# ---------------------------------------------------------------------------

@register(
    "q14_phone_normalize",
    """
    SELECT c_custkey, phone_norm FROM (
        SELECT c_custkey,
               CASE
                 WHEN LENGTH(d) < 10 THEN NULL
                 WHEN LENGTH(d) = 10 THEN SUBSTR(d,1,3) || '-' || SUBSTR(d,4,4) || '-' || SUBSTR(d,8,3)
                 WHEN LENGTH(d) = 11 THEN SUBSTR(d,1,2) || '-' || SUBSTR(d,3,3) || '-' || SUBSTR(d,6,3) || '-' || SUBSTR(d,9,3)
                 ELSE d
               END AS phone_norm
        FROM (
            SELECT c_custkey,
                   CASE c_custkey % 4
                     WHEN 0 THEN LPAD(CAST((c_custkey * 7919) % 10000000 AS VARCHAR), 7, '0')
                     WHEN 1 THEN LPAD(CAST((c_custkey * 7919) % 10000000000 AS VARCHAR), 10, '0')
                     WHEN 2 THEN LPAD(CAST((c_custkey * 7919) % 100000000000 AS VARCHAR), 11, '0')
                     ELSE LPAD(CAST((c_custkey * 7919) % 10000000000000 AS VARCHAR), 13, '0')
                   END AS d
            FROM customer
        )
    )
    """,
    doc="T2 canonical phone rule over synthesized mixed-length phones "
    "(reference: src/transformers/business_transformer.py:31-49).",
)
def q14_phone_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    digits = (
        F.when(k % 4 == 0, F.lpad(((k * 7919) % 10000000).cast("string"), 7, "0"))
        .when(k % 4 == 1, F.lpad(((k * 7919) % 10000000000).cast("string"), 10, "0"))
        .when(k % 4 == 2, F.lpad(((k * 7919) % 100000000000).cast("string"), 11, "0"))
        .otherwise(F.lpad(((k * 7919) % 10000000000000).cast("string"), 13, "0"))
    )
    return c.select("c_custkey", normalize_phone(digits).alias("phone_norm"))


@register(
    "q15_email_validate",
    """
    SELECT c_custkey, valid_email FROM (
        SELECT c_custkey,
               CASE WHEN regexp_matches(e, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
                    THEN e END AS valid_email
        FROM (
            SELECT c_custkey,
                   CASE c_custkey % 3
                     WHEN 0 THEN 'user' || CAST(c_custkey AS VARCHAR) || '@example.com'
                     WHEN 1 THEN 'broken@' || CAST(c_custkey AS VARCHAR)
                     ELSE 'no-at-sign.net'
                   END AS e
            FROM customer
        )
    )
    """,
    doc="T5 email regex validation "
    "(reference: src/transformers/business_transformer.py:51-57).",
)
def q15_email_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    email = (
        F.when(k % 3 == 0, F.concat(F.lit("user"), k.cast("string"), F.lit("@example.com")))
        .when(k % 3 == 1, F.concat(F.lit("broken@"), k.cast("string")))
        .otherwise(F.lit("no-at-sign.net"))
    )
    return c.select("c_custkey", validate_email(email).alias("valid_email"))


@register(
    "q16_url_pipeline",
    """
    SELECT p_partkey, final_url FROM (
        SELECT p_partkey,
               CASE WHEN u3 IS NULL THEN NULL
                    WHEN NOT regexp_matches(u3, '^[A-Za-z][A-Za-z0-9+.-]*://[^/[:space:]]+') THEN NULL
                    ELSE u3 END AS final_url
        FROM (
            SELECT p_partkey,
                   CASE WHEN lower(u2) LIKE '%guiacores%' THEN NULL ELSE u2 END AS u3
            FROM (
                SELECT p_partkey,
                       CASE WHEN NOT regexp_matches(lower(u), '^https?://')
                            THEN 'https://' || u ELSE u END AS u2
                FROM (
                    SELECT p_partkey,
                           CASE p_partkey % 4
                             WHEN 0 THEN 'https://example.com/p/' || CAST(p_partkey AS VARCHAR)
                             WHEN 1 THEN 'shop' || CAST(p_partkey AS VARCHAR) || '.com.ar'
                             WHEN 2 THEN 'http://www.guiacores.com.ar/x/' || CAST(p_partkey AS VARCHAR)
                             ELSE 'not a url'
                           END AS u
                    FROM part
                )
            )
        )
    )
    """,
    doc="T6/T7/T10 URL normalize -> social scrub -> validate pipeline "
    "(reference: src/transformers/url_transformer.py:28-53, "
    "src/tools/clean_data.py:30-39).",
)
def q16_url_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    raw = (
        F.when(k % 4 == 0, F.concat(F.lit("https://example.com/p/"), k.cast("string")))
        .when(k % 4 == 1, F.concat(F.lit("shop"), k.cast("string"), F.lit(".com.ar")))
        .when(k % 4 == 2, F.concat(F.lit("http://www.guiacores.com.ar/x/"), k.cast("string")))
        .otherwise(F.lit("not a url"))
    )
    url = validate_url(scrub_social(normalize_url(raw)))
    return p.select("p_partkey", url.alias("final_url"))


@register(
    "q17_address_split",
    """
    SELECT s_suppkey, direccion, localidad FROM (
        SELECT s_suppkey,
               CASE WHEN LEN(addr_parts) > 1
                    THEN ARRAY_TO_STRING(addr_parts[1:LEN(addr_parts)-1], ' - ')
                    ELSE a END AS direccion,
               CASE WHEN LEN(addr_parts) > 1
                    THEN addr_parts[LEN(addr_parts)]
                    ELSE NULL END AS localidad
        FROM (
            SELECT s_suppkey, a, STRING_SPLIT(a, ' - ') AS addr_parts
            FROM (
                SELECT s_suppkey,
                       CASE WHEN s_suppkey % 3 = 0
                            THEN s_name || ' 742 - (8300) Neuquen'
                            WHEN s_suppkey % 3 = 1
                            THEN s_name || ' 10 - Cipolletti - (8324) Rio Negro'
                            ELSE s_name || ' 1 sin localidad' END AS a
                FROM supplier
            )
        )
    )
    """,
    doc="T12 address rsplit into (direccion, localidad) "
    "(reference: src/tools/clean_data.py:41-57).",
)
def q17_address_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    addr = (
        F.when(k % 3 == 0, F.concat(F.col("s_name"), F.lit(" 742 - (8300) Neuquen")))
        .when(k % 3 == 1, F.concat(F.col("s_name"), F.lit(" 10 - Cipolletti - (8324) Rio Negro")))
        .otherwise(F.concat(F.col("s_name"), F.lit(" 1 sin localidad")))
    )
    direccion, localidad = split_address(addr)
    return s.select("s_suppkey", direccion.alias("direccion"), localidad.alias("localidad"))


@register(
    "q18_business_id_from_url",
    """
    SELECT c_custkey,
           regexp_extract('https://www.guiacores.com.ar/index.php?r=search/detail&id='
                          || CAST(c_custkey AS VARCHAR) || '&src=list',
                          'id=([0-9]+)', 1) AS id_negocio
    FROM customer
    """,
    doc="X12 business-id from URL query param "
    "(reference: src/common/utils.py:115-134).",
)
def q18_business_id_from_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://www.guiacores.com.ar/index.php?r=search/detail&id="),
        F.col("c_custkey").cast("string"),
        F.lit("&src=list"),
    )
    return c.select("c_custkey", business_id_from_url(url).alias("id_negocio"))


@register(
    "q19_urlgen",
    """
    SELECT CAST(i AS VARCHAR) AS id_negocio,
           'https://www.guiacores.com.ar/index.php?r=search/detail&id=' || CAST(i AS VARCHAR) AS url
    FROM generate_series(1, 1000) AS t(i)
    """,
    doc="S1 ID-range URL generator (reference: src/extractors/bulk_collector.py:27-44).",
)
def q19_urlgen(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = "https://www.guiacores.com.ar/index.php?r=search/detail&id="
    return spark.range(1, 1001).select(
        F.col("id").cast("string").alias("id_negocio"),
        F.concat(F.lit(base), F.col("id").cast("string")).alias("url"),
    )


@register(
    "q201_fetch_parse_roundtrip",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS id_negocio,
           'https://www.guiacores.com.ar/index.php?r=search/detail&id='
               || CAST(c_custkey AS VARCHAR) AS url,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE 'Negocio ' || CAST(c_custkey AS VARCHAR) END AS nombre,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE 'Calle ' || CAST(c_custkey % 90 + 1 AS VARCHAR)
                     || ' Nro ' || CAST(c_custkey * 7 % 10000 AS VARCHAR) END AS direccion,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE '+54 342 4' || printf('%06d', c_custkey)
                     || CASE WHEN c_custkey % 2 = 0
                             THEN ', 15-4' || printf('%06d', c_custkey + 1)
                             ELSE '' END END AS telefonos,
           CASE WHEN c_custkey % 97 = 0 OR c_custkey % 3 = 0 THEN NULL
                ELSE '549342' || printf('%06d', c_custkey % 1000000) END AS whatsapp,
           CASE WHEN c_custkey % 97 <> 0 AND c_custkey % 3 = 0
                THEN 'https://negocio-' || CAST(c_custkey AS VARCHAR) || '.example.com'
                END AS sitio_web,
           CASE WHEN c_custkey % 97 <> 0 AND c_custkey % 4 = 0
                THEN 'contacto' || CAST(c_custkey AS VARCHAR) || '@example.com'
                END AS email,
           CASE WHEN c_custkey % 97 <> 0 AND c_custkey % 5 = 0
                THEN 'https://facebook.com/negocio' || CAST(c_custkey AS VARCHAR)
                END AS facebook,
           CASE WHEN c_custkey % 97 <> 0 AND c_custkey % 6 = 0
                THEN 'https://instagram.com/negocio' || CAST(c_custkey AS VARCHAR)
                END AS instagram,
           CASE WHEN c_custkey % 97 <> 0 AND c_custkey % 2 = 1
                THEN 'Lun a Vie de ' || CAST(8 + c_custkey % 3 AS VARCHAR) || ' a 17'
                END AS horarios,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE 'Rubro ' || CAST(c_custkey % 7 AS VARCHAR)
                     || CASE WHEN c_custkey % 10 = 0
                             THEN ', Extra ' || CAST(c_custkey % 3 AS VARCHAR)
                             ELSE '' END END AS rubros,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE 'Proveedor numero ' || CAST(c_custkey AS VARCHAR)
                     || ' de servicios' END AS descripcion,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE '-31.' || printf('%04d', c_custkey % 10000) END AS latitud,
           CASE WHEN c_custkey % 97 = 0 THEN NULL
                ELSE '-60.' || printf('%04d', c_custkey * 3 % 10000) END AS longitud,
           CASE WHEN c_custkey % 97 = 0
                THEN 'OSError: synthetic outage id=' || CAST(c_custkey AS VARCHAR)
                END AS fetch_error,
           CAST(CASE WHEN c_custkey % 97 = 0 THEN 3 ELSE 1 END AS INTEGER) AS attempts
    FROM customer
    """,
    doc="The scrape path END-TO-END under the driver's hash compare "
    "(S3 fetch + R1 retry + R2 quarantine + X1-X10 parse): the "
    "customer keys become a detail-URL worklist (S1), fetch_pages "
    "runs it through the deterministic synthetic guiacores site "
    "(sources/synthetic.py — every X1-X10 selector populated as a "
    "closed-form function of the id, ids divisible by 97 raise so "
    "the retry/quarantine columns are exercised), parse_pages "
    "extracts all thirteen fields, and the error/attempt columns "
    "join back from the fetch output. The oracle constant-folds the "
    "same closed forms in SQL WITHOUT running a parser, so a "
    "hash-match proves generator -> HTML -> stdlib-HTMLParser -> "
    "fields is the identity the reference's BeautifulSoup selectors "
    "define (reference: src/extractors/bulk_scraper.py:64-111). "
    "Scale shape: fetch parallelism == partition count, one "
    "transport per partition, Arrow-batched parse; the fetch output "
    "is persisted because both the parse and the error join consume "
    "it (a production pipeline lands it as a bronze table instead; "
    "bench.py reclaims the cache per query).",
)
def q201_fetch_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.sources.fetch import fetch_pages
    from etl_guiacores_spark.sources.html_parse import parse_pages
    from etl_guiacores_spark.sources.synthetic import (
        DETAIL_URL_BASE,
        synthetic_site_transport,
    )

    worklist = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id_negocio"),
        F.concat(
            F.lit(DETAIL_URL_BASE), F.col("c_custkey").cast("string")
        ).alias("url"),
    )
    fetched = fetch_pages(
        worklist, synthetic_site_transport, max_attempts=3, num_partitions=32
    ).persist()
    parsed = parse_pages(fetched)
    return parsed.join(
        fetched.select("id_negocio", "fetch_error", "attempts"),
        "id_negocio",
    )


@register(
    "q202_search_results_discovery",
    """
    WITH links AS (
        SELECT s.s_suppkey AS k, s.s_suppkey * 10 + u.j AS n
        FROM supplier s, LATERAL unnest(range(0, 11)) u(j)
    )
    SELECT CAST(n AS VARCHAR) AS id_negocio,
           'https://www.guiacores.com.ar/index.php?r=search/detail&id='
               || CAST(n AS VARCHAR) AS url,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_pages
    FROM links
    GROUP BY n
    """,
    doc="The S6 discovery path END-TO-END under the driver's hash "
    "compare (listing fetch -> search-results parse -> cross-page "
    "dedupe) — q201's sibling for the LISTING page shape "
    "(reference: src/extractors/manual_scraper.py:46-78). Each "
    "supplier key becomes a search-results URL; the synthetic site "
    "serves page k with detail links for ids k*10..k*10+9 plus an "
    "intra-page duplicate (D2 keep-first inside the parser — the "
    "oracle counts DISTINCT pages, so a double-count would "
    "hash-mismatch) and an overlap link k*10+10 shared with page "
    "k+1 (the cross-page case, resolved by the groupBy); half the "
    "hrefs use the HTML-escaped &amp; separator so both branches of "
    "the parser's href regex are driver-checked. n_pages therefore "
    "equals 2 exactly for ids on a page boundary covered from both "
    "sides, else 1 — all constant-folded by the oracle from the "
    "supplier keys. Same scale shape as q201: partition-parallel "
    "fetch, Arrow-batched parse, one aggregation shuffle on the "
    "discovered id.",
)
def q202_search_results_discovery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_guiacores_spark.sources.fetch import fetch_pages
    from etl_guiacores_spark.sources.html_parse import parse_listing_pages
    from etl_guiacores_spark.sources.synthetic import (
        LISTING_URL_BASE,
        synthetic_site_transport,
    )

    worklist = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("id_negocio"),
        F.concat(
            F.lit(LISTING_URL_BASE), F.col("s_suppkey").cast("string")
        ).alias("url"),
    )
    fetched = fetch_pages(
        worklist, synthetic_site_transport, max_attempts=3, num_partitions=32
    )
    return (
        parse_listing_pages(fetched)
        .groupBy("id_negocio", "url")
        .agg(F.count_distinct("page_url").alias("n_pages"))
    )


@register(
    "q20_clean_text_documents",
    """
    SELECT doc_id,
           CASE WHEN LENGTH(TRIM(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))) = 0
                THEN NULL
                ELSE TRIM(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) END AS clean,
           LENGTH(TRIM(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')))       AS clean_len
    FROM documents
    """,
    doc="T1 whitespace-collapse clean on the documents table "
    "(reference: src/transformers/business_transformer.py:25-29).",
)
def q20_clean_text_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cleaned = clean_text(F.col("text"))
    return d.select(
        "doc_id",
        cleaned.alias("clean"),
        F.length(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))).alias("clean_len"),
    )
