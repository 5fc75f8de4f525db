"""Round-8 analytics wave: financial drawdown, state dwell times,
lead-lag cross-correlation, sparse COO matrix multiply, referential-
integrity audit, week-over-week growth.

Six territories the registry had not covered: finance-style path
statistics over a cumulative series (q187), telemetry state-duration
accounting (q188), signal lead-lag analysis between two event series
(q189), distributed sparse linear algebra (q190), cross-table data-
quality auditing (q191), and the BI reporting staple (q192).

Same contract as the whole suite: each Spark program has a DuckDB
oracle over the identical parquet tables, every computed column
aliased identically, ratios as truncating integer ppm, timestamps
rendered as strings (QUERIES.md output-type contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_guiacores_spark.queries import register
from etl_guiacores_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


#: live scratch dirs for the side-effecting queries (q198/q199): each
#: invocation frees the PREVIOUS invocation's tree first (a lazy
#: result must stay readable until the caller collects it, so the
#: current dir can't be freed synchronously), and atexit sweeps the
#: last one — bounded to one live tree per query per process instead
#: of one per bench/determinism/driver run accumulating in /tmp
_SCRATCH: dict[str, str] = {}


def _sweep_scratch() -> None:
    import shutil

    for d in _SCRATCH.values():
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH.clear()


_SWEEP_REGISTERED = False


def _scratch_dir(tag: str) -> str:
    import atexit
    import shutil
    import tempfile

    global _SWEEP_REGISTERED
    if not _SWEEP_REGISTERED:  # once per process, not once per call
        atexit.register(_sweep_scratch)
        _SWEEP_REGISTERED = True
    old = _SCRATCH.pop(tag, None)
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)
    d = tempfile.mkdtemp(prefix=f"egs_{tag}_")
    _SCRATCH[tag] = d
    return d


# ---------------------------------------------------------------------------
# q187: per-user maximum drawdown of the revenue-minus-cost curve
# ---------------------------------------------------------------------------

@register(
    "q187_max_drawdown",
    """
    WITH flows AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 1000000) AS BIGINT)
                    ELSE -CAST(FLOOR(value * 1000000) AS BIGINT)
               END AS flow
        FROM events WHERE event_type IN ('purchase', 'error')
    ),
    cums AS (
        SELECT user_id, ts, event_id, flow,
               SUM(flow) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM flows
    ),
    path AS (
        SELECT user_id, flow, cum,
               MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM cums
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           CAST(SUM(flow) AS BIGINT) AS final_micro,
           CAST(MAX(peak) AS BIGINT) AS peak_micro,
           CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_micro
    FROM path GROUP BY user_id
    """,
    doc="Per-user maximum drawdown of the cumulative revenue-minus-"
    "cost curve (purchase adds value, error subtracts; micro-units): "
    "running sum over the (ts, event_id) total order, running peak "
    "over the running sum, drawdown = peak - current, reported as "
    "the path maximum together with the final balance and global "
    "peak. The classic path statistic a plain groupBy cannot see "
    "(two identical final balances can hide wildly different risk "
    "paths). Shape: two stacked per-user ROWS windows on one "
    "partition-sort — parallel across users, no self-join, no "
    "O(n^2) peak scan; all integer micro-units.",
)
def q187_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.rollup_time import max_drawdown

    ev = _t(spark, sf_dir, "events")
    flow = F.when(
        F.col("event_type") == "purchase",
        F.floor(F.col("value") * 1_000_000).cast("long"),
    ).otherwise(-F.floor(F.col("value") * 1_000_000).cast("long"))
    flows = ev.filter(
        F.col("event_type").isin("purchase", "error")
    ).select("user_id", "ts", "event_id", flow.alias("flow"))
    return max_drawdown(
        flows, ["user_id"], ["ts", "event_id"], "flow"
    ).select(
        "user_id",
        "n_flows",
        F.col("final").alias("final_micro"),
        F.col("peak").alias("peak_micro"),
        F.col("max_drawdown").alias("max_drawdown_micro"),
    )


# ---------------------------------------------------------------------------
# q188: state dwell times (how long each event type "holds")
# ---------------------------------------------------------------------------

@register(
    "q188_state_dwell",
    """
    WITH d AS (
        SELECT event_type,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                   - epoch_us(ts) AS dwell
        FROM events
    ),
    held AS (SELECT event_type, dwell FROM d WHERE dwell IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_holds,
           CAST(SUM(dwell) AS BIGINT) AS total_dwell_us,
           CAST(CAST(SUM(dwell) AS BIGINT) // COUNT(*) AS BIGINT)
               AS mean_dwell_us,
           CAST(MAX(dwell) AS BIGINT) AS max_dwell_us
    FROM held GROUP BY event_type
    """,
    doc="State dwell-time accounting: each event 'holds' its state "
    "(event_type) until the user's next event — one LEAD over the "
    "per-user (ts, event_id) total order gives the dwell in integer "
    "microseconds; a user's last event holds indefinitely and is "
    "excluded (honest: its dwell is right-censored). Aggregated per "
    "state: hold count, total/mean/max dwell. The 'where does user "
    "time actually go' report — TWAP's (q149) categorical cousin: "
    "TWAP weights VALUES by hold time, this accounts the hold time "
    "itself. Shape: one per-user LEAD window (parallel across "
    "users), one map-side-combinable groupBy to |event types| rows; "
    "dwell arithmetic in the event_micros injective integer domain.",
)
def q188_state_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.temporal import state_dwell

    ev = _t(spark, sf_dir, "events")
    return state_dwell(ev, ["user_id"], "event_type", "ts", "event_id")


# ---------------------------------------------------------------------------
# q189: lead-lag cross-correlation between two event-type series
# ---------------------------------------------------------------------------

@register(
    "q189_lead_lag_xcorr",
    """
    WITH x AS (
        SELECT epoch_us(ts) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    y AS (
        SELECT epoch_us(ts) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    lags AS (SELECT UNNEST(range(-3, 4)) AS lag),
    joined AS (
        SELECT l.lag, x.c AS xc, y.c AS yc
        FROM lags l
        JOIN x ON TRUE
        JOIN y ON y.h = x.h + l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag_hours,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(COUNT(*) * SUM(xc * yc) - SUM(xc) * SUM(yc) AS BIGINT)
               AS cov_num
    FROM joined GROUP BY lag
    """,
    doc="Lead-lag cross-correlation between the hourly 'view' and "
    "'purchase' series: for each lag in -3..+3 hours, the exact "
    "Pearson NUMERATOR n*Sxy - Sx*Sy over the hours where both "
    "(shifted) series have observations — sign and argmax match the "
    "correlation itself at any fixed lag, with no sqrt/float "
    "denominator to break cross-engine exactness. The 'does "
    "browsing lead buying, and by how many hours' question; the "
    "lag maximizing cov_num is the causal-delay estimate. Shape: "
    "the raw scan collapses to two BOUNDED hourly-count relations "
    "(map-side combinable), the 7-lag shift-join and the aggregate "
    "run entirely on |hours| rows — at 100 TB the only data-volume "
    "pass is the first groupBy.",
)
def q189_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.temporal import event_micros

    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .withColumn("__m", event_micros(ev, "ts"))
        .withColumn("h", F.expr("__m div 3600000000"))
        .groupBy("event_type", "h")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # the 7-lag spine rides as an inline explode on the x side — no
    # broadcast-nested-loop join in the plan; the shift-join is then
    # a plain equi-join on the bounded hourly relation
    x = (
        hourly.filter(F.col("event_type") == "view")
        .select(
            "h",
            F.col("c").alias("xc"),
            F.explode(F.sequence(F.lit(-3), F.lit(3))).alias(
                "lag_hours"
            ),
        )
        .withColumn("lag_hours", F.col("lag_hours").cast("long"))
    )
    y = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("h").alias("hy"), F.col("c").alias("yc")
    )
    joined = x.join(y, F.col("hy") == F.col("h") + F.col("lag_hours"))
    return joined.groupBy("lag_hours").agg(
        F.count("*").cast("long").alias("n_hours"),
        (
            F.count("*") * F.sum(F.col("xc") * F.col("yc"))
            - F.sum("xc") * F.sum("yc")
        ).cast("long").alias("cov_num"),
    )


# ---------------------------------------------------------------------------
# q190: sparse COO matrix multiply (doc-term counts x hashed term-topic)
# ---------------------------------------------------------------------------

@register(
    "q190_coo_matmul",
    """
    WITH terms AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(text),
                      '[ \\t\\n\\r\\f\\v]+')) AS term
        FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    counts AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM terms GROUP BY doc_id, term
    ),
    contrib AS (
        SELECT doc_id, CAST(t.topic AS BIGINT) AS topic,
               cnt * (CAST(('0x' || substr(md5('mm:' || term || ':'
                       || CAST(t.topic AS VARCHAR)), 1, 8)) AS BIGINT)
                      % 5 - 2) AS v
        FROM counts, (SELECT UNNEST(range(0, 8)) AS topic) t
    )
    SELECT doc_id, topic, CAST(SUM(v) AS BIGINT) AS score
    FROM contrib GROUP BY doc_id, topic
    """,
    doc="Sparse COO matrix multiply: the doc-term count matrix times "
    "a dense 8-topic term weight matrix whose entries are a "
    "deterministic engine-portable hash of (term, topic) (md5-u32 "
    "mod 5 - 2, the q104 hashed-feature family) — the random-"
    "projection-by-hashing topic scorer, and the general shape of "
    "every distributed SpMM (embedding lookup-and-sum, feature "
    "crossing, graph aggregation). Shape: NO join at all — the "
    "weight entry is computed in-plan from (term, topic) literals, "
    "so the multiply is explode(x8) -> map-side-combinable groupBy "
    "on (doc, topic); the only shuffle carries (doc, topic) partial "
    "sums. At 100 TB the term dictionary never materializes, which "
    "is what makes hashed weights the scale path vs a broadcast "
    "weight table.",
)
def q190_coo_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.textstats import tokens

    docs = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    counts = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    weight = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("mm:"),
                        F.col("term"),
                        F.lit(":"),
                        F.col("topic").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
        - 2
    )
    # topics ride as an inline explode (x8 fan-out), not a cross
    # join — literally no join operator anywhere in the multiply
    return (
        counts.select(
            "doc_id",
            "cnt",
            "term",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("topic"),
        )
        .withColumn("topic", F.col("topic").cast("long"))
        .select("doc_id", "topic", (F.col("cnt") * weight).alias("v"))
        .groupBy("doc_id", "topic")
        .agg(F.sum("v").cast("long").alias("score"))
    )


# ---------------------------------------------------------------------------
# q191: referential-integrity audit (FK orphan counts across tables)
# ---------------------------------------------------------------------------

@register(
    "q191_fk_orphan_audit",
    """
    SELECT 'orders.o_custkey->customer' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders oo ON l.l_orderkey = oo.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    doc="Referential-integrity audit across the warehouse: for each "
    "declared FK edge (orders->customer, lineitem->orders/part/"
    "supplier), total rows and orphan rows whose key has no parent — "
    "the cross-TABLE completeness check q167's single-table column "
    "profile cannot see, and the first report any 100 TB ingest "
    "quality gate runs (a nonzero orphan count means a broken "
    "extract or an out-of-order load). Shape: four left joins "
    "collapsed to 1-row aggregates; dimension sides broadcast when "
    "small, shuffle-keyed when not — either way the output is 4 "
    "rows, and each fact table scans its two audit columns only.",
)
def q191_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def leg(
        fact: DataFrame, fk: str, dim: DataFrame, pk: str, label: str
    ) -> DataFrame:
        return (
            fact.select(fk)
            .join(dim.select(pk), fact[fk] == dim[pk], "left")
            .agg(
                F.lit(label).alias("fk"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col(pk).isNull().cast("long"))
                .cast("long")
                .alias("n_orphans"),
            )
        )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        leg(o, "o_custkey", _t(spark, sf_dir, "customer"), "c_custkey",
            "orders.o_custkey->customer")
        .unionByName(
            leg(li, "l_orderkey", o, "o_orderkey",
                "lineitem.l_orderkey->orders"))
        .unionByName(
            leg(li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey",
                "lineitem.l_partkey->part"))
        .unionByName(
            leg(li, "l_suppkey", _t(spark, sf_dir, "supplier"),
                "s_suppkey", "lineitem.l_suppkey->supplier"))
    )


# ---------------------------------------------------------------------------
# q192: week-over-week revenue growth
# ---------------------------------------------------------------------------

@register(
    "q192_wow_growth",
    """
    WITH weekly AS (
        SELECT STRFTIME(date_trunc('week', o_orderdate), '%Y-%m-%d')
                   AS week,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT week, n_orders, revenue_cents,
           CAST(LAG(revenue_cents) OVER (ORDER BY week) AS BIGINT)
               AS prev_cents,
           CAST(1000000 * (revenue_cents
                           - LAG(revenue_cents) OVER (ORDER BY week))
                // NULLIF(LAG(revenue_cents) OVER (ORDER BY week), 0)
                AS BIGINT) AS wow_ppm
    FROM weekly
    """,
    doc="Week-over-week revenue growth: ISO-Monday weekly rollup of "
    "order revenue in exact cents, previous week via LAG, growth as "
    "truncating integer ppm — the BI reporting staple (every revenue "
    "dashboard's first chart) done cross-engine exact. Shape: one "
    "map-side-combinable groupBy to the |weeks| relation; the LAG "
    "window orders those bounded rows only (the q186 pattern — "
    "never event volume through a global window).",
)
def q192_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd")
        .alias("week")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )
    w = Window.orderBy("week")
    prev = F.lag("revenue_cents").over(w)
    return weekly.select(
        "week",
        "n_orders",
        "revenue_cents",
        prev.cast("long").alias("prev_cents"),
        F.expr(
            "CAST(1000000 * (revenue_cents - lag(revenue_cents) "
            "OVER (ORDER BY week)) div NULLIF(lag(revenue_cents) "
            "OVER (ORDER BY week), 0) AS BIGINT)"
        ).alias("wow_ppm"),
    )


# ---------------------------------------------------------------------------
# q193: Lorenz concentration curve (top-decile revenue share)
# ---------------------------------------------------------------------------

@register(
    "q193_lorenz_concentration",
    """
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, cents,
               ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey)
                   AS rnk,
               SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents,
               COUNT(*) OVER () AS n,
               SUM(cents) OVER () AS total
        FROM rev
    )
    SELECT CAST(d.decile AS BIGINT) AS decile,
           CAST(rnk AS BIGINT) AS top_n,
           CAST(cum_cents AS BIGINT) AS cum_revenue_cents,
           CAST(1000000 * CAST(cum_cents AS HUGEINT) // total AS BIGINT)
               AS share_ppm
    FROM ranked, (SELECT UNNEST(range(1, 11)) AS decile) d
    WHERE rnk = (n * d.decile + 9) // 10
    """,
    doc="Lorenz concentration curve over customer revenue: customers "
    "ranked by spend (DESC, custkey tiebreak), and at each decile "
    "boundary rank ceil(n*d/10) the cumulative revenue share in "
    "exact ppm — 'the top 10% of customers hold X% of revenue', the "
    "concentration report that pairs with q148's Gini scalar (Gini "
    "is the area summary; this is the curve itself, the actionable "
    "form). Engine shape is the rank-statistics scale discipline: "
    "the customer ranking uses the q80 dense-ids RANGE exchange and "
    "the cumulative revenue the q89 distributed prefix sum — NO "
    "single-reducer ROW_NUMBER/SUM-OVER window anywhere, because "
    "|customers| is data-sized at 100 TB (the oracle's plain "
    "windows are fine single-node; the Spark plan must not be). "
    "The (n, total) pair rides as a 1-row broadcast scalar join "
    "(the q46/q58 allowlisted shape); boundary membership is an "
    "inline decile explode + filter on the bounded ranked relation.",
)
def q193_lorenz_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.ordering import (
        dense_ids,
        global_prefix_sum,
    )

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked = dense_ids(
        rev.withColumn(
            "__k", F.struct((-F.col("cents")).alias("nc"), "o_custkey")
        ),
        "__k",
        id_name="rnk",
    )
    cum = global_prefix_sum(
        ranked, order_col="__k", value_col="cents", out_col="cum_cents"
    )
    tot = cum.agg(
        F.max("rnk").cast("long").alias("__n"),
        F.sum("cents").cast("long").alias("__total"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "cum_cents",
            "__n",
            "__total",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        )
        .withColumn("decile", F.col("decile").cast("long"))
        .filter(F.expr("rnk = (__n * decile + 9) div 10"))
        .select(
            "decile",
            F.col("rnk").cast("long").alias("top_n"),
            F.col("cum_cents").cast("long").alias("cum_revenue_cents"),
            F.expr(
                "CAST(1000000 * CAST(cum_cents AS DECIMAL(38,0)) "
                "div __total AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# q194: quantile-sketch accuracy audit (approx_percentile vs exact rank)
# ---------------------------------------------------------------------------

@register(
    "q194_quantile_sketch_audit",
    """
    WITH v AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
        FROM events
    ),
    r AS (
        SELECT event_type, vm,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY vm) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN vm END)
                AS BIGINT) AS p50_exact,
           CAST(MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN vm END)
                AS BIGINT) AS p95_exact,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM r GROUP BY event_type
    """,
    doc="Quantile-sketch accuracy audit — completes the sketch-audit "
    "triad (HLL q105, Count-Min q168): per event type, exact p50/p95 "
    "of the micro-unit value via the q144/q185 rank-selection idiom, "
    "PLUS Spark's approx_percentile (Greenwald-Khanna, accuracy "
    "10000) audited by RANK error — the approx result's rank "
    "(count of values <= it) must sit within max(5n/accuracy, 2) "
    "ranks of the target, the merged-summary guarantee with "
    "degradation headroom. The oracle supplies the exact "
    "percentiles and asserts the flags TRUE, so the driver "
    "hash-checks the sketch's error contract on real data — the "
    "validate-then-trust step before running the fixed-width "
    "mergeable sketch fleet-wide at 100 TB. The exact leg itself "
    "routes through the q193 dense-ids RANGE exchange (global ids "
    "over the unique (type, vm, event_id) order, per-type rank by "
    "min-gid offset), so even the audit has no one-reducer-per-type "
    "window. Rank-space "
    "(not value-space) tolerance: heavy-tailed values make value "
    "deltas meaningless while the GK guarantee is exactly a rank "
    "bound.",
)
def q194_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.ordering import dense_ids

    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    # exact leg on the q193 dense-ids RANGE exchange, NOT a per-type
    # row_number window: global contiguous ids over the unique
    # (type, vm, event_id) order put each type's rows in a contiguous
    # gid range across MANY range partitions, and per-type rank is
    # gid minus the type's min gid — no one-reducer-per-type stage
    # (the round-8 verdict's flag on this query, now closed). The
    # value at rank r is unaffected by the event_id tiebreak: ties in
    # vm share the value.
    keyed = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vm"),
        "event_id",
    ).withColumn("__k", F.struct("event_type", "vm", "event_id"))
    ranked = dense_ids(keyed, "__k", id_name="gid")
    base = ranked.groupBy("event_type").agg(
        F.min("gid").alias("__g0"),
        F.count("*").cast("long").alias("n"),
    )
    exact = (
        ranked.join(base, "event_type")
        .withColumn("rn", F.col("gid") - F.col("__g0") + F.lit(1))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(
                F.when(
                    F.expr("rn = (n * 50 + 99) div 100"), F.col("vm")
                )
            ).cast("long").alias("p50_exact"),
            F.max(
                F.when(
                    F.expr("rn = (n * 95 + 99) div 100"), F.col("vm")
                )
            ).cast("long").alias("p95_exact"),
        )
    )
    approx = v.groupBy("event_type").agg(
        F.percentile_approx("vm", [0.5, 0.95], 10_000).alias("__ap")
    ).select(
        "event_type",
        F.col("__ap")[0].alias("__a50"),
        F.col("__ap")[1].alias("__a95"),
    )
    # rank of each approx value = count of values <= it, per type
    ranks = (
        v.join(approx, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("vm") <= F.col("__a50")).cast("long")).alias(
                "__r50"
            ),
            F.sum((F.col("vm") <= F.col("__a95")).cast("long")).alias(
                "__r95"
            ),
        )
    )
    tol = F.greatest(F.expr("(5 * n + 9999) div 10000"), F.lit(2))
    return (
        exact.join(ranks, "event_type")
        .select(
            "event_type",
            "n",
            "p50_exact",
            "p95_exact",
            (
                F.abs(F.col("__r50") - F.expr("(n * 50 + 99) div 100"))
                <= tol
            ).alias("p50_within_tol"),
            (
                F.abs(F.col("__r95") - F.expr("(n * 95 + 99) div 100"))
                <= tol
            ).alias("p95_within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# q195: batch MMR re-ranking — many queries, one job (round 9)
# ---------------------------------------------------------------------------

_MMR_SCORE_B = (
    "(700000*rel - 300000*COALESCE(maxsim, 0)"
    " - (((700000*rel - 300000*COALESCE(maxsim, 0)) % 1000000 + 1000000)"
    " % 1000000)) // 1000000"
)

@register(
    "q195_mmr_batch",
    f"""
    WITH RECURSIVE vq AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vq
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, vq AS qv FROM vq
          WHERE vec_id IN (0, 1, 2, 3)),
    rel_t AS (
        SELECT q.query_id, c.vec_id, c.vq,
               CAST(list_sum(list_transform(range(1, LEN(c.vq) + 1),
                    i -> c.vq[i] * q.qv[i])) AS BIGINT) AS rel
        FROM vq c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ),
    cands AS (
        SELECT query_id, vec_id, vq, rel FROM rel_t
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rel DESC, vec_id) <= 32
    ),
    rem AS (
        SELECT 0 AS it, query_id, vec_id, rel, vq,
               CAST(NULL AS BIGINT) AS maxsim
        FROM cands
        UNION ALL
        SELECT it + 1, query_id, vec_id, rel, vq,
               CASE WHEN maxsim IS NULL THEN
                   CAST(list_sum(list_transform(range(1, LEN(vq) + 1),
                        i -> vq[i] * pvq[i])) AS BIGINT)
               ELSE GREATEST(maxsim,
                   CAST(list_sum(list_transform(range(1, LEN(vq) + 1),
                        i -> vq[i] * pvq[i])) AS BIGINT))
               END
        FROM (
            SELECT it, query_id, vec_id, rel, vq, maxsim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY {_MMR_SCORE_B} DESC, vec_id) AS rk,
                   FIRST(vq) OVER (PARTITION BY query_id
                       ORDER BY {_MMR_SCORE_B} DESC, vec_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS pvq
            FROM rem
        ) WHERE rk > 1 AND it < 9
    )
    SELECT query_id, CAST(it + 1 AS BIGINT) AS rank, vec_id, rel,
           CAST({_MMR_SCORE_B} AS BIGINT) AS mmr_score
    FROM (
        SELECT it, query_id, vec_id, rel, maxsim,
               ROW_NUMBER() OVER (PARTITION BY it, query_id
                                  ORDER BY {_MMR_SCORE_B} DESC, vec_id) AS rk
        FROM rem
    ) WHERE rk = 1 AND it < 10
    """,
    doc="Batch MMR re-ranking: four queries diversified in ONE job — "
    "the applyInPandas shape q125's single-query operator prescribes "
    "for eval harnesses (looping driver calls would serialize one "
    "Spark job per query and run every greedy on the driver). The "
    "bounded query table broadcasts against one corpus pass "
    "(constant-key broadcast hash join: the fan-out is inherently "
    "|docs| x |queries|, the key just keeps the plan an equi-join "
    "with the probe side's partitioning intact); only narrow "
    "(query_id, id, rel) rows ride the single per-query top-32 "
    "window shuffle; the winners re-join their quantized vectors and "
    "the IDENTICAL exact-integer mmr_select greedy runs per query "
    "group on the executors. Oracle: q125's recursive-CTE greedy "
    "replay extended with a query_id dimension (every window "
    "partitioned by query) — bit-identical integers, Python floor "
    "division spelled out explicitly "
    "(operators/retrieval.mmr_rerank_batch).",
)
def q195_mmr_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.retrieval import mmr_rerank_batch

    e = _t(spark, sf_dir, "embeddings")
    return mmr_rerank_batch(e, [0, 1, 2, 3], k=10, n_candidates=32)


# ---------------------------------------------------------------------------
# q196: salted (chunk-merged) quality + lang scoring — same answer as the
# per-row operators, skew-proof plan
# ---------------------------------------------------------------------------

_SW196 = "'the','a','an','and','of','to','in','is','it','for'"
_TOKS196 = (
    "CASE WHEN LENGTH(trim(text)) > 0 "
    "THEN string_split_regex(trim(text), '[ \\t\\n\\r\\f\\v]+') "
    "ELSE [] END"
)
_PUNCT196 = "'[.,;:!?''\"()\\[\\]{}-]'"


def _q196_oracle() -> str:
    from etl_guiacores_spark.operators.textstats import LANG_MARKERS

    count_exprs = {
        lang: (
            "LEN(list_filter(toks, t -> lower(t) IN "
            f"({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = "'und'"
    best_n = "0"
    for lang in ("en", "es", "de", "fr"):
        c = count_exprs[lang]
        best = f"CASE WHEN {c} > {best_n} THEN '{lang}' ELSE {best} END"
        best_n = f"GREATEST({c}, {best_n})"
    return f"""
    SELECT doc_id,
           ROUND((CASE WHEN LEN(toks) BETWEEN 10 AND 10000
                       THEN 1.0 ELSE 0.0 END
                + CASE WHEN (CASE WHEN LENGTH(text) > 0
                                  THEN CAST(n_punct AS DOUBLE)/LENGTH(text)
                                  ELSE 0.0 END) <= 0.2 THEN 1.0 ELSE 0.0 END
                + CASE WHEN COALESCE(CASE WHEN LEN(toks) > 0
                            THEN CAST(LEN(list_filter(toks,
                                 t -> lower(t) IN ({_SW196}))) AS DOUBLE)
                                 / LEN(toks) END, 0.0)
                       BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)
                / 3.0, 6) AS quality,
           CASE WHEN COALESCE(LEN(regexp_extract_all(text,
                     '[\\x{{4e00}}-\\x{{9fff}}]')), 0) > 0
                THEN 'zh' ELSE {best} END AS pred_lang
    FROM (
        SELECT doc_id, text, {_TOKS196} AS toks,
               COALESCE(LEN(regexp_extract_all(text, {_PUNCT196})), 0)
                   AS n_punct
        FROM documents
    )
    """


@register(
    "q196_salted_quality_lang",
    _q196_oracle(),
    doc="The q103 pairing applied to the filter leg: chunk-merged "
    "quality + lang-id (textstats.salted_text_scores) whose ORACLE is "
    "the plain per-row formula — proving the salted plan computes the "
    "identical answer with per-task work bounded by the chunk size "
    "instead of the document length. Token/char counters merge as "
    "sums over non-overlapping slices, each exploded chunk relation "
    "hash-repartitioned on (doc_id, chunk_pos) — the skew-proof shape "
    "the round-10 skew soak measured for the 19x filter-leg residual. "
    "Covers ALL docs including empty/NULL text (quality computed, "
    "pred_lang 'und'), unlike q22's confusion matrix which drops "
    "empties (operators/textstats.salted_text_scores).",
)
def q196_salted_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.textstats import salted_text_scores

    d = _t(spark, sf_dir, "documents")
    out = salted_text_scores(d, "doc_id", "text", chunk_tokens=64)
    return out.select(
        "doc_id", F.round("quality", 6).alias("quality"), "pred_lang"
    )


# ---------------------------------------------------------------------------
# q197: salted (chunk-merged) gopher gate — same answer as q78's per-row
# operator, skew-proof plan; completes the chunk-merge family
# ---------------------------------------------------------------------------

_STOPLIST197 = "['the','a','an','and','of','to','in','is','it','for']"
_TOKS197 = "string_split_regex(trim(text), '[ \\t\\n\\r\\f\\v]+')"


@register(
    "q197_salted_gopher",
    f"""
    WITH m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               ROUND(CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS DOUBLE)
                     / len(toks), 6) AS mean_token_len,
               ROUND(CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                          AS DOUBLE) / len(toks), 6) AS alpha_frac,
               len(list_distinct(list_filter(list_transform(toks, t -> lower(t)),
                   t -> list_contains({_STOPLIST197}, t)))) AS n_stop_distinct
        FROM (SELECT doc_id, {_TOKS197} AS toks FROM documents
              WHERE LENGTH(trim(text)) > 0)
    )
    SELECT doc_id, n_tokens, mean_token_len, alpha_frac, n_stop_distinct,
           CAST(n_tokens BETWEEN 20 AND 80
                AND mean_token_len BETWEEN 3.0 AND 10.0
                AND alpha_frac >= 0.8
                AND n_stop_distinct >= 2 AS INT) AS passes
    FROM m
    """,
    doc="The q103 same-answer/different-plan pairing applied to the "
    "gopher gate (q78's oracle verbatim): chunk-merged gopher rules "
    "(textstats.salted_gopher_quality) with per-task work bounded by "
    "the chunk size. Token count, token-length total, and alpha count "
    "merge as sums over non-overlapping token slices; the DISTINCT "
    "stopword count merges as a BITMASK (10-word fixed vocabulary -> "
    "per-chunk presence bits, bit_or, bit_count — exact with "
    "constant-size state, no collect_set). Completes the chunk-merge "
    "family: shingles (salted_minhash), quality/lang "
    "(salted_text_scores, q196), gopher (this) — the whole heavy "
    "per-row text surface of run_corpus_pipeline is now skew-proof "
    "under one salt_chunk_tokens knob.",
)
def q197_salted_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.textstats import salted_gopher_quality

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return salted_gopher_quality(d, chunk_tokens=64)


# ---------------------------------------------------------------------------
# q198: ORC round-trip with scan pushdown (io.py format breadth)
# ---------------------------------------------------------------------------

@register(
    "q198_orc_pushdown_roundtrip",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
    GROUP BY o_orderpriority
    """,
    doc="ORC as a first-class interchange format (io.write_orc/"
    "read_orc, previously pytest-only): the full orders table is "
    "round-tripped through an ORC directory, then the aggregate runs "
    "on the ORC SCAN with its filter and 3-column projection pushed "
    "into the reader (ORC carries min/max stripe statistics exactly "
    "like parquet, so .explain shows PushedFilters + a pruned "
    "ReadSchema — at 100 TB the scan reads three columns of the "
    "stripes that can match, not the table). The oracle aggregates "
    "the same rows straight from parquet: format round-tripping must "
    "be value-exact, including the DOUBLE o_totalprice whose cents "
    "are floored AFTER the round trip. Revenue in integer cents "
    "(engine-wide micro-unit rule).",
)
def q198_orc_pushdown_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_guiacores_spark import io as gio

    orders = _t(spark, sf_dir, "orders")
    # scratch-dir lifecycle (_scratch_dir): the dir must outlive this
    # function — the driver collects the returned lazy DataFrame
    # later — so the PREVIOUS invocation's tree is freed instead,
    # and atexit sweeps the last one
    path = _scratch_dir("q198_orc") + "/orders_orc"
    gio.write_orc(orders, path)
    back = gio.read_orc(spark, path)
    return (
        back.filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > 1000.0)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q199: streaming acquisition twin, driver-checked against the batch oracle
# ---------------------------------------------------------------------------

@register(
    "q199_streaming_acquisition_twin",
    """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    news AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY first_day
    )
    SELECT STRFTIME(d.day, '%Y-%m-%d') AS day,
           d.n_events, d.n_active,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(d.n_active - COALESCE(n.n_new, 0) AS BIGINT)
               AS n_returning,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily d LEFT JOIN news n ON n.day = d.day
    """,
    doc="The streaming surface's first ORACLE-checked row: the events "
    "table is replayed through daily_acquisition_stream (the q186 "
    "foreachBatch twin) as two event-time-ordered micro-batches — "
    "a real Structured Streaming file source, checkpointed, with the "
    "open-day carry exercised at the split point — and the merged "
    "upsert output (read_daily_acquisition) must hash-match the "
    "plain batch SQL. Until now every streaming twin's batch "
    "equivalence lived in pytest only (the r10 verdict named this "
    "the candidate worth a registry row); this runs the twin under "
    "the driver's compare. The stream folds O(|keys|+|days|) state "
    "per batch and the merge reads the bounded day axis — the same "
    "plan at 100 TB with a real Kafka source.",
)
def q199_streaming_acquisition_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_guiacores_spark.streaming import (
        daily_acquisition_stream,
        read_daily_acquisition,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # two contiguous event-time ranges split at the midpoint
    # TIMESTAMP (min/max agg -> two scalars, fully deterministic; a
    # global ntile window would be the single-reducer shape the plan
    # audit exists to catch): batches arrive in event-day order, as
    # the stream's closed-day contract requires, and the midpoint
    # lands inside a day, so the split day's open carry is
    # exercised. Two batches, not more: each foreachBatch fold is a
    # fixed few seconds of state-join jobs regardless of data
    # volume, and carry/redelivery depth is pytest's job
    # (test_streaming) — this row buys the driver-checked
    # EQUIVALENCE, not the soak
    b = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    if b["lo"] is None:
        # suite-wide empty-input contract (R4): an empty events table
        # yields an empty report, never a crash (the None arithmetic
        # below would otherwise TypeError) — and there is nothing to
        # replay through the stream anyway
        return spark.createDataFrame(
            [],
            "day string, n_events long, n_active long, n_new long, "
            "n_returning long, cum_users long",
        )
    mid = b["lo"] + (b["hi"] - b["lo"]) / 2
    root = _scratch_dir("q199_stream")
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    ev.filter(F.col("ts") <= F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # the fold's state joins range over bounded axes (days + one
    # batch's users); micro-batch-scoped shuffle partitions trim the
    # per-job task-launch overhead that dominated this row's fixed
    # cost (round-11 verdict, item #4) — semantics untouched
    q = daily_acquisition_stream(
        stream, out, checkpoint_dir=ckpt, fold_shuffle_partitions=8
    )
    try:
        q.processAllAvailable()
        ev.filter(F.col("ts") > F.lit(mid)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    return read_daily_acquisition(spark, out).select(
        F.col("day").cast("string").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_new").cast("long").alias("n_new"),
        F.col("n_returning").cast("long").alias("n_returning"),
        F.col("cum_users").cast("long").alias("cum_users"),
    )
