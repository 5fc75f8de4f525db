"""Coverage-completing queries: merge upsert (J3), type coercion (T9),
phone-list ops (T4/T11), exact dedupe (D1), frame windows, pivot,
total-matches extraction (X11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_guiacores_spark.functions import (
    clean_phone_list,
    coerce_bool,
    coerce_long,
    normalize_phone_list,
    total_matches,
)
from etl_guiacores_spark.operators.joins import merge_upsert
from etl_guiacores_spark.queries import register
from etl_guiacores_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@register(
    "q34_merge_upsert",
    """
    WITH target AS (
        SELECT c_custkey AS k, c_name AS nombre, c_acctbal AS bal FROM customer
    ),
    source AS (
        SELECT c_custkey AS k, 'UPD ' || c_name AS nombre, c_acctbal + 1000 AS bal
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey + 10000000 AS k, 'NEW ' || c_name AS nombre, 0.0 AS bal
        FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT COALESCE(t.k, s.k) AS k,
           CASE WHEN s.k IS NOT NULL THEN s.nombre ELSE t.nombre END AS nombre,
           ROUND(CASE WHEN s.k IS NOT NULL THEN s.bal ELSE t.bal END, 2) AS bal
    FROM target t FULL OUTER JOIN source s ON t.k = s.k
    """,
    doc="J3 keyed merge: source rows update matches and insert novelties, "
    "unmatched target rows pass through "
    "(reference: src/extractors/manual_scraper.py:270-290).",
)
def q34_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    target = c.select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("nombre"),
        F.col("c_acctbal").alias("bal"),
    )
    updates = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"),
        F.concat(F.lit("UPD "), F.col("c_name")).alias("nombre"),
        (F.col("c_acctbal") + 1000).alias("bal"),
    )
    inserts = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") + 10000000).alias("k"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("nombre"),
        F.lit(0.0).alias("bal"),
    )
    merged = merge_upsert(target, updates.unionByName(inserts), "k")
    return merged.select("k", "nombre", F.round("bal", 2).alias("bal"))


@register(
    "q35_type_coercion",
    """
    SELECT p_partkey,
           CASE WHEN regexp_matches(s, '^[0-9]+$') THEN CAST(s AS BIGINT) END AS as_long,
           CASE WHEN lower(trim(b)) IN ('true','false')
                THEN lower(trim(b)) = 'true' END AS as_bool
    FROM (
        SELECT p_partkey,
               CASE p_partkey % 3 WHEN 0 THEN CAST(p_size AS VARCHAR)
                                  WHEN 1 THEN CAST(p_size AS VARCHAR) || 'x'
                                  ELSE '' END AS s,
               CASE p_partkey % 4 WHEN 0 THEN 'true' WHEN 1 THEN ' False '
                                  WHEN 2 THEN 'yes' ELSE '1' END AS b
        FROM part
    )
    """,
    doc="T9 opportunistic type coercion as guarded casts "
    "(reference: src/common/data_cleaner.py:36-60).",
)
def q35_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    s = (
        F.when(k % 3 == 0, F.col("p_size").cast("string"))
        .when(k % 3 == 1, F.concat(F.col("p_size").cast("string"), F.lit("x")))
        .otherwise(F.lit(""))
    )
    b = (
        F.when(k % 4 == 0, F.lit("true"))
        .when(k % 4 == 1, F.lit(" False "))
        .when(k % 4 == 2, F.lit("yes"))
        .otherwise(F.lit("1"))
    )
    return p.select(
        "p_partkey", coerce_long(s).alias("as_long"), coerce_bool(b).alias("as_bool")
    )


@register(
    "q36_phone_list_ops",
    """
    SELECT s_suppkey, cleaned, normalized FROM (
        SELECT s_suppkey,
               -- T11: strip separators, order-preserving dedupe
               p1c || CASE WHEN p2c <> p1c THEN ', ' || p2c ELSE '' END AS cleaned,
               -- T4: normalize each (p2 is 11 digits for even keys, a
               -- 10-digit duplicate of p1 for odd keys)
               n1 || ', ' || CASE WHEN LENGTH(p2c) = 11
                    THEN SUBSTR(p2c,1,2) || '-' || SUBSTR(p2c,3,3) || '-' || SUBSTR(p2c,6,3) || '-' || SUBSTR(p2c,9,3)
                    ELSE SUBSTR(p2c,1,3) || '-' || SUBSTR(p2c,4,4) || '-' || SUBSTR(p2c,8,3)
               END AS normalized
        FROM (
            SELECT s_suppkey,
                   REPLACE(REPLACE(p1, '-', ''), ' ', '') AS p1c,
                   REPLACE(REPLACE(p2, '-', ''), ' ', '') AS p2c,
                   SUBSTR(REPLACE(REPLACE(p1, '-', ''), ' ', ''),1,3) || '-' ||
                   SUBSTR(REPLACE(REPLACE(p1, '-', ''), ' ', ''),4,4) || '-' ||
                   SUBSTR(REPLACE(REPLACE(p1, '-', ''), ' ', ''),8,3) AS n1
            FROM (
                SELECT s_suppkey,
                       '299-' || LPAD(CAST((s_suppkey*13) % 10000000 AS VARCHAR),7,'0') AS p1,
                       CASE WHEN s_suppkey % 2 = 0
                            THEN LPAD(CAST((s_suppkey*17) % 100000000000 AS VARCHAR),11,'0')
                            ELSE '299-' || LPAD(CAST((s_suppkey*13) % 10000000 AS VARCHAR),7,'0')
                       END AS p2
                FROM supplier
            )
        )
    )
    """,
    doc="T4 list-normalize + T11 strip/dedupe on comma-joined phone "
    "strings via higher-order functions "
    "(reference: src/transformers/business_transformer.py:91-96, "
    "src/tools/clean_data.py:7-28).",
)
def q36_phone_list_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    p1 = F.concat(F.lit("299-"), F.lpad(((k * 13) % 10000000).cast("string"), 7, "0"))
    p2 = F.when(
        k % 2 == 0, F.lpad(((k * 17) % 100000000000).cast("string"), 11, "0")
    ).otherwise(p1)
    joined = F.concat(p1, F.lit(", "), p2)
    return s.select(
        "s_suppkey",
        clean_phone_list(joined).alias("cleaned"),
        normalize_phone_list(joined).alias("normalized"),
    )


@register(
    "q37_exact_dedupe",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode FROM (
        SELECT l_returnflag, l_linestatus,
               CASE WHEN l_linenumber % 2 = 0 THEN 'AIR' ELSE 'SHIP' END AS l_shipmode
        FROM lineitem
    )
    """,
    doc="D1 full-record exact dedupe -> hash-aggregate distinct "
    "(reference: src/common/data_cleaner.py:29-32, O(n^2) there).",
)
def q37_exact_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.when(F.col("l_linenumber") % 2 == 0, F.lit("AIR"))
            .otherwise(F.lit("SHIP"))
            .alias("l_shipmode"),
        )
        .dropDuplicates()
    )


@register(
    "q38_running_totals",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg_last3
    FROM orders
    """,
    doc="Analytic frame windows: running sum + trailing-3 moving average "
    "(SURVEY §2.7 full window surface).",
)
def q38_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ma = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w_ma), 4).alias("avg_last3"),
    )


@register(
    "q39_pivot_events",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END)    AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END)    AS error,
           COUNT(CASE WHEN event_type = 'login' THEN 1 END)    AS login
    FROM events
    GROUP BY user_id
    """,
    doc="Pivot (wide aggregation) — event-type counts per user.",
)
def q39_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "error", "login"]
    out = e.groupBy("user_id").pivot("event_type", kinds).count()
    # pivot leaves NULL for empty cells; the CASE-count oracle yields 0
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@register(
    "q40_total_matches",
    """
    SELECT r_regionkey,
           CAST(regexp_extract('Se encontraron ' || CAST(r_regionkey * 37 AS VARCHAR)
                               || ' coincidencias', '([0-9]+)[ ]coincidencias', 1) AS INTEGER)
               AS total
    FROM region
    """,
    doc="X11 total-matches extraction from header text "
    "(reference: src/extractors/sequential_collector.py:606-639).",
)
def q40_total_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    text = F.concat(
        F.lit("Se encontraron "),
        (F.col("r_regionkey") * 37).cast("string"),
        F.lit(" coincidencias"),
    )
    return r.select("r_regionkey", total_matches(text).alias("total"))


@register(
    "q41_stat_aggregates",
    """
    SELECT o_orderpriority,
           ROUND(STDDEV_SAMP(o_totalprice), 4)      AS sd,
           ROUND(MEDIAN(o_totalprice), 4)           AS med,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90,
           ROUND(MIN(o_totalprice), 2)              AS lo,
           ROUND(MAX(o_totalprice), 2)              AS hi
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Statistical aggregates (stddev, median, interpolated p90) — "
    "aggregation-surface breadth beyond the reference's counts (A1-A5).",
)
def q41_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.median("o_totalprice"), 4).alias("med"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "q42_conditional_agg",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05)               AS discounted,
           ROUND(SUM(CASE WHEN l_quantity > 25 THEN l_extendedprice
                          ELSE 0 END), 2)                          AS bulk_revenue,
           COUNT(DISTINCT l_suppkey)                               AS suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Conditional/filtered aggregation + distinct aggregate in one "
    "pass (Catalyst plans the distinct as a partial expand).",
)
def q42_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("discounted"),
        F.round(
            F.sum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("bulk_revenue"),
        F.count_distinct("l_suppkey").alias("suppliers"),
    )


@register(
    "q43_json_props",
    """
    SELECT k_bucket, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket, value
        FROM events
    )
    GROUP BY k_bucket
    """,
    doc="Semi-structured JSON column handling: extract a field from the "
    "events.props JSON payload and aggregate on it.",
)
def q43_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long") % 10
    return (
        e.select(k.alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "q47_asof_join",
    """
    WITH purchases AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, event_id, ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ) WHERE rn = 1
    )
    SELECT p.user_id, p.event_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.event_id                          AS asof_event_id,
           ROUND(v.value, 2)                   AS asof_value
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join: each purchase paired with the user's latest view "
    "at-or-before it — union+window implementation, one shuffle "
    "(an operator Spark lacks as a built-in).",
)
def q47_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.dedupe import dedupe_keyed_first
    from etl_guiacores_spark.operators.temporal import as_of_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", "value"
    )
    # unique (user, ts) on the right side keeps both engines deterministic
    views = dedupe_keyed_first(
        views.withColumn("__neg", -F.col("event_id")), ["user_id", "ts"], ["__neg"]
    ).drop("__neg")
    joined = as_of_join(
        purchases, views, on="user_id", right_cols=["event_id", "value"],
        tie_breaker="event_id",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("asof_event_id"),
        F.round("asof_value", 2).alias("asof_value"),
    )


@register(
    "q48_range_join",
    """
    SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
    GROUP BY a.user_id
    """,
    doc="Range join: same-user event pairs within a 60s band via "
    "bucketed equi-join (probe own + adjacent buckets) — never a "
    "cartesian, cost bounded by genuine band neighborhoods.",
)
def q48_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.temporal import range_join_pairs

    e = _t(spark, sf_dir, "events")
    pairs = range_join_pairs(e, key="user_id", time_col="ts", band_seconds=60,
                             id_col="event_id")
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@register(
    "q51_range_frame_window",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w            AS orders_30d,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 epoch(o_orderdate) AS osec
          FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY osec
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-frame window (value-based, not row-based): trailing-30-day "
    "order count and spend per customer — peer rows at the same "
    "orderdate aggregate together, which a ROWS frame gets wrong.",
)
def q51_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("osec"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("osec")
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


_GROUPING_SETS_SQL = """
    SELECT r_name, c_mktsegment,
           COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
"""


@register(
    "q52_grouping_sets_sql",
    _GROUPING_SETS_SQL,
    doc="Explicit GROUPING SETS through the engine's SQL API entry "
    "(spark.sql over registered views) — same SQL text runs on both "
    "engines.",
)
def q52_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS top_price
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 1
    ) t
"""


@register(
    "q53_lateral_top_order",
    _LATERAL_SQL,
    doc="Correlated LATERAL subquery: each customer's single most "
    "expensive order — same SQL text on both engines via spark.sql.",
)
def q53_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@register(
    "q54_bag_set_ops",
    """
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 10
    EXCEPT ALL
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 40
    """,
    doc="Bag-semantics EXCEPT ALL (multiplicity-aware difference) — "
    "distinct-based set ops are q11.",
)
def q54_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_quantity") > 40).select("l_returnflag", "l_linestatus")
    return a.exceptAll(b)


@register(
    "q55_null_safe_join",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM (SELECT c_custkey, CASE WHEN c_custkey % 5 = 0 THEN NULL
                                 ELSE c_custkey % 7 END AS k FROM customer) a
    JOIN (SELECT c_custkey, CASE WHEN c_custkey % 3 = 0 THEN NULL
                                 ELSE c_custkey % 7 END AS k FROM customer) b
      ON a.k IS NOT DISTINCT FROM b.k AND a.c_custkey < b.c_custkey
    WHERE a.c_custkey % 31 = 0 AND b.c_custkey % 37 = 0
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "keys match each other instead of vanishing.",
)
def q55_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    mk = lambda mod: F.when(F.col("c_custkey") % mod == 0, F.lit(None)).otherwise(
        F.col("c_custkey") % 7
    )
    a = c.select(F.col("c_custkey").alias("id_a"), mk(5).alias("ka")).filter(
        F.col("id_a") % 31 == 0
    )
    b = c.select(F.col("c_custkey").alias("id_b"), mk(3).alias("kb")).filter(
        F.col("id_b") % 37 == 0
    )
    return (
        a.join(b, a.ka.eqNullSafe(b.kb) & (a.id_a < b.id_b))
        .select("id_a", "id_b")
    )


@register(
    "q56_extract_all_numbers",
    """
    SELECT doc_id,
           LEN(regexp_extract_all(text, '[0-9]{1,15}')) AS n_numbers,
           CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text, '[0-9]{1,15}'),
                                                 x -> CAST(x AS BIGINT))), 0)
                AS BIGINT) AS numbers_sum
    FROM documents
    """,
    doc="regexp_extract_all + array fold: pull every number out of "
    "free text and aggregate per document. Digit runs are bounded to 15 "
    "chars and the oracle sum is cast to BIGINT so DuckDB's HUGEINT "
    "(int128) promotion can never diverge from Spark's non-ANSI long.",
)
def q56_extract_all_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    nums = F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]{1,15}"))
    total = F.aggregate(nums, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))
    return d.select(
        "doc_id",
        F.size(nums).alias("n_numbers"),
        F.coalesce(total, F.lit(0)).alias("numbers_sum"),
    )


@register(
    "q57_decimal_exact",
    """
    SELECT o_orderpriority,
           SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,2))) AS exact_total,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact DECIMAL aggregation: no floating-point rounding in the "
    "oracle compare at all — the money-arithmetic path.",
)
def q57_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(38,2)")
    return o.groupBy("o_orderpriority").agg(
        F.sum(dec).cast("decimal(38,2)").alias("exact_total"),
        F.count("*").alias("n"),
    )
