"""Hypertable-style tiered time rollups (continuous aggregates).

Timeseries stores (hypertables) maintain multi-resolution aggregates
where each coarser tier derives from the next finer tier, not from
raw data. The scale property: raw events are aggregated ONCE (at the
finest resolution); every coarser tier re-aggregates the tier below —
hours touch minute rows (60x smaller), days touch hour rows, so the
full pyramid costs barely more than the finest tier alone.

Works because the maintained measures are decomposable aggregates:
count and sum re-aggregate exactly; min/max likewise; avg is derived
as sum/count at read time (never averaged across tiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: resolution -> truncation unit understood by date_trunc
RESOLUTIONS = {"minute": "minute", "hour": "hour", "day": "day"}
_ORDER = ["minute", "hour", "day"]


def _aggregate(
    df: DataFrame,
    bucket_src: str,
    resolution: str,
    keys: list[str],
    from_tier: bool,
) -> DataFrame:
    """Aggregate (raw, or a finer tier when ``from_tier``) into one
    resolution tier. The branch is an EXPLICIT flag — sniffing for a
    column named n_events would silently mis-aggregate a raw events
    table that happens to carry its own n_events metric column."""
    bucket = F.date_trunc(RESOLUTIONS[resolution], F.col(bucket_src)).alias("bucket")
    if from_tier:  # finer tier: re-aggregate partials
        measures = [
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]
    else:  # raw events
        measures = [
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ]
    return df.groupBy(*keys, bucket).agg(*measures)


def time_rollup(
    events: DataFrame,
    keys: list[str] | None = None,
    resolutions: list[str] | None = None,
    time_col: str = "ts",
) -> dict[str, DataFrame]:
    """Build the rollup pyramid: {resolution: aggregate DataFrame}.

    Tiers are chained — each coarser tier aggregates the one below.
    Callers persist each tier (these are the continuous-aggregate
    tables); avg at any tier = sum_value / n_events.
    """
    keys = keys or ["event_type"]
    resolutions = resolutions or _ORDER
    assert resolutions == sorted(resolutions, key=_ORDER.index), "finest first"

    tiers: dict[str, DataFrame] = {}
    current, src_col = events, time_col
    for i, res in enumerate(resolutions):
        current = _aggregate(current, src_col, res, keys, from_tier=i > 0)
        src_col = "bucket"
        tiers[res] = current
    return tiers


def resample_gapfill(
    tier: DataFrame,
    keys: list[str],
    step: str = "1 hour",
    bucket_col: str = "bucket",
    zero_cols: tuple[str, ...] = ("n_events",),
    ffill_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Densify a rollup tier: emit EVERY ``step`` bucket between each
    key's first and last observed bucket, zero-filling count measures
    and forward-filling (last observation carried forward) the
    ``ffill_cols`` — the gap-filling query every time-series store
    bolts onto its continuous aggregates (a dashboard cannot plot a
    gap it never received a row for).

    Scale shape: the spine is ``sequence(min, max, step)`` per key —
    generated WHERE the key lives (one groupBy for the bounds, the
    explode is map-side), never a global calendar cross join; output
    is keys x buckets-in-range, which is the dashboard's own size.
    Forward fill is a key-partitioned running ``last(ignorenulls)``
    window — parallel across keys, no global sort.
    """
    bounds = tier.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {step})")
        ).alias(bucket_col),
    )
    dense = spine.join(tier, [*keys, bucket_col], "left")
    out_cols = []
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in dense.columns:
        if c in keys or c == bucket_col:
            out_cols.append(F.col(c))
        elif c in zero_cols:
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif c in ffill_cols:
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        else:
            out_cols.append(F.col(c))
    return dense.select(*out_cols)


#: block size for the two-level scan: array_append copies its whole
#: accumulator per element, so building one n-element running-state
#: array is O(n^2) — the blocked form folds block seeds scalar-ly
#: (O(n)) and caps every array build at `block` elements, for
#: O(n * block + (n/block)^2) total. 256 balances the two terms from
#: thousands to millions of rows per series (measured: 2M rows in
#: seconds vs minutes-to-hours for the naive single-array fold).
_EWMA_BLOCK = 256


def _ewma_end_expr(vals_sql: str, seed_sql: str, a: int, b: int) -> str:
    """SQL for the END state of the truncated EWMA recurrence folded
    over ``vals_sql`` starting from ``seed_sql``. A NULL seed means
    'no state yet' — the first value starts the series — which unifies
    the seedless first chunk with seeded continuation chunks."""
    return (
        f"aggregate({vals_sql}, CAST({seed_sql} AS BIGINT), "
        f"(s, v) -> CASE WHEN s IS NULL THEN v "
        f"ELSE ({a} * v + {b} * s) div 1000000 END)"
    )


def _nb(vals_sql: str, block: int) -> str:
    return f"CAST(ceil(size({vals_sql}) / CAST({block} AS DOUBLE)) AS INT)"


def _ewma_block_seeds_expr(
    vals_sql: str, seed_sql: str, a: int, b: int, block: int = _EWMA_BLOCK
) -> str:
    """SQL for the per-block incoming states: element ``i+1`` is the
    state ENTERING block ``i`` (element 1 = the series seed). One O(n)
    scalar fold chained across blocks — the sequential part of the
    two-level scan, kept scalar so no O(n)-sized array is ever
    copied."""
    return (
        f"aggregate(sequence(0, greatest({_nb(vals_sql, block)}, 1) - 1), "
        f"array(CAST({seed_sql} AS BIGINT)), "
        f"(acc, i) -> array_append(acc, "
        + _ewma_end_expr(
            f"slice({vals_sql}, i * {block} + 1, {block})",
            "element_at(acc, -1)",
            a,
            b,
        )
        + "))"
    )


def _ewma_scan_expr(
    vals_sql: str, bseeds_sql: str, a: int, b: int, block: int = _EWMA_BLOCK
) -> str:
    """SQL for ALL running states (the per-row output): each block
    array-builds independently from its precomputed incoming state, so
    accumulator copies are capped at ``block`` elements."""
    prev = f"CASE WHEN size(o) = 0 THEN element_at({bseeds_sql}, i + 1) " \
           f"ELSE element_at(o, -1) END"
    return (
        f"CASE WHEN size({vals_sql}) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE flatten(transform(sequence(0, {_nb(vals_sql, block)} - 1), "
        f"i -> aggregate(slice({vals_sql}, i * {block} + 1, {block}), "
        f"CAST(array() AS ARRAY<BIGINT>), "
        f"(o, v) -> array_append(o, CASE WHEN ({prev}) IS NULL THEN v "
        f"ELSE ({a} * v + {b} * ({prev})) div 1000000 END)))) END"
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_micro_col: str,
    alpha_ppm: int = 200_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over event time,
    in exact integer micro-units — the smoothing leg the gap-fill
    (resample_gapfill) and rollup operators don't cover.

    EWMA is inherently sequential (each state depends on the previous
    one: ``s_t = alpha*v_t + (1-alpha)*s_{t-1}``), which windows can't
    express without a per-row shrinking frame. Instead of a Python
    UDF, each key's ordered series folds INSIDE the plan with the
    ``aggregate`` higher-order function over its collected
    (ts, tiebreak, v) structs — JVM-evaluated, zero Python, one
    shuffle on the key. The recurrence is integer fixed point
    (``s_t = (alpha_ppm*v + (1e6-alpha_ppm)*s_prev) div 1e6`` with
    ``s_1 = v_1``), so results are bit-identical across engines,
    retries, and partitionings — a float EWMA drifts with evaluation
    order. Sort order inside a key is (ts, tiebreak): pass a unique
    ``tiebreak_col`` when timestamps can collide, or the fold order —
    and thus the smoothed value — is not total.

    Scale shape: per-key memory is the key's series (the same bound
    as sessionization and grouped top-k via aggregation), and per-key
    WORK is linear via the blocked two-level scan (block seeds folded
    scalar-ly, array builds capped at ``_EWMA_BLOCK`` — a naive
    array_append fold would be quadratic in series length); right for
    per-entity event streams (hundreds-to-millions of rows per key),
    wrong for one global series — pre-aggregate with time_rollup
    first, or use :func:`ewma_smooth_global`, which chunks the series
    across EXECUTORS and carries the boundary state between chunks
    exactly. Keys parallelize perfectly; AQE splits nothing here since
    the fold is one row per key until the final explode.

    Integer division TRUNCATES toward zero (Spark ``div`` and DuckDB
    ``//`` agree; Python ``//`` floors — negative states differ by at
    most one micro-unit from a floored recurrence, test-pinned).

    Returns one row per input row: (key, ts, [tiebreak], v_micro,
    ewma_micro).
    """
    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    a, b = alpha_ppm, 1_000_000 - alpha_ppm
    fields = [F.col(ts_col).alias("ts")]
    if tiebreak_col is not None:
        fields.append(F.col(tiebreak_col).alias("tb"))
    fields.append(F.col(value_micro_col).cast("long").alias("v"))
    grouped = (
        df.groupBy(key_col)
        .agg(F.sort_array(F.collect_list(F.struct(*fields))).alias("__arr"))
        .withColumn("__vals", F.expr("transform(__arr, x -> x.v)"))
        .withColumn(
            "__bseeds", F.expr(_ewma_block_seeds_expr("__vals", "NULL", a, b))
        )
    )
    sarr = F.expr(_ewma_scan_expr("__vals", "__bseeds", a, b))
    exploded = grouped.select(
        key_col, F.explode(F.arrays_zip("__arr", sarr.alias("__s"))).alias("__z")
    )
    out = [
        F.col(key_col),
        F.col("__z.__arr.ts").alias(ts_col),
    ]
    if tiebreak_col is not None:
        out.append(F.col("__z.__arr.tb").alias(tiebreak_col))
    out.append(F.col("__z.__arr.v").alias("v_micro"))
    out.append(F.col("__z.__s").alias("ewma_micro"))
    return exploded.select(*out)


def ewma_smooth_global(
    df: DataFrame,
    ts_col: str,
    value_micro_col: str,
    alpha_ppm: int = 200_000,
    tiebreak_col: str | None = None,
    num_chunks: int | None = None,
    max_candidates: int = 4096,
) -> DataFrame:
    """EWMA over ONE global series with NO single-reducer stage —
    bit-identical to :func:`ewma_smooth` run on a single key, via a
    carry-select (speculative) scan.

    The truncated recurrence ``s_t = (a*v_t + b*s_{t-1}) div 1e6`` is
    not associative (per-step truncation), so it cannot be
    prefix-combined like a sum — but its chunk-level fold map
    ``F_c(seed)`` has two exploitable properties, both direct from the
    per-step algebra:

    - **monotone**: seed' >= seed implies F_c(seed') >= F_c(seed)
      (each step is monotone in the state; integer div preserves it);
    - **contracting**: one step shrinks a seed interval's width w to
      at most ``b*w div 1e6 + 1``, whose fixed point is
      ``~1e6/alpha_ppm`` — after a few dozen rows, the chunk's end
      state is pinned to a narrow integer interval REGARDLESS of its
      incoming seed.

    The carry-select protocol (the carry-select adder, lifted to
    scans):

    1. range-partition on (ts [, tiebreak]) into ``num_chunks``
       contiguous segments; pin the partitioning (eager
       localCheckpoint — same reasoning as global_prefix_sum's pid
       fact) and collect each segment's sorted values into one row;
    2. **pass A** (one job): fold every segment from the two extreme
       seeds LO/HI (global min/max value — the state provably never
       leaves this range), giving each segment's outgoing-state
       interval ``[F(LO), F(HI)]``; by monotonicity the TRUE outgoing
       state lies inside, whatever the true incoming seed is;
    3. **pass B** (one job): every non-first segment evaluates its
       end state from EVERY integer seed in its predecessor's
       interval (``sequence`` + a ``transform`` of scalar folds —
       the speculative evaluations). Interval widths are gated by
       ``max_candidates``: tiny-alpha series (width ~ 1e6/alpha_ppm)
       or very short chunks fail loudly instead of degrading;
    4. the driver chains the exact boundary states through the
       collected candidate tables (bounded: chunks x interval width
       integers — the operator's only collects, all bounded);
    5. **pass C** (lazy, returned): each segment folds once more from
       its now-exact incoming seed, emitting the per-row smoothed
       array, exploded back to rows.

    Three passes over pinned per-segment arrays instead of one
    sequential scan — the classic parallel-scan trade. Per-task memory
    is one segment (``n / num_chunks`` rows), the explicit knob a
    100 TB series sizes; every fold is a JVM higher-order function
    (zero Python). Same uniqueness contract on (ts, tiebreak) and the
    same |v| < ~9.2e12 micro-unit overflow bound as the keyed fold.

    Returns (ts, [tiebreak], v_micro, ewma_micro) — one row per input
    row, exactly :func:`ewma_smooth`'s per-key output (test-pinned
    equivalence on a 2M-row single-key series).
    """
    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    a, b = alpha_ppm, 1_000_000 - alpha_ppm
    spark = df.sparkSession
    if num_chunks is None:
        num_chunks = int(spark.conf.get("spark.sql.shuffle.partitions"))

    fields = [F.col(ts_col).alias("ts")]
    order_cols = [ts_col]
    if tiebreak_col is not None:
        fields.append(F.col(tiebreak_col).alias("tb"))
        order_cols.append(tiebreak_col)
    fields.append(F.col(value_micro_col).cast("long").alias("v"))

    out_fields = [F.col("__z.__arr.ts").alias(ts_col)]
    if tiebreak_col is not None:
        out_fields.append(F.col("__z.__arr.tb").alias(tiebreak_col))
    out_fields += [
        F.col("__z.__arr.v").alias("v_micro"),
        F.col("__z.__s").alias("ewma_micro"),
    ]
    out_shape = df.select(
        F.col(ts_col),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
        F.col(value_micro_col).cast("long").alias("v_micro"),
        F.lit(0).cast("long").alias("ewma_micro"),
    )
    if df.isEmpty():
        return out_shape.limit(0)

    seg = (
        df.select(*fields)
        .repartitionByRange(num_chunks, F.col("ts"), *( ["tb"] if tiebreak_col else [] ))
        .withColumn("__seg", F.spark_partition_id())
    )
    grouped = (
        seg.groupBy("__seg")
        .agg(F.sort_array(F.collect_list(F.struct("*"))).alias("__arr"))
    )
    # drop the struct's own __seg copy out of the array elements
    grouped = grouped.select(
        "__seg",
        F.transform(
            "__arr",
            lambda x: F.struct(
                *(
                    [x["ts"].alias("ts")]
                    + ([x["tb"].alias("tb")] if tiebreak_col else [])
                    + [x["v"].alias("v")]
                )
            ),
        ).alias("__arr"),
    ).withColumn(
        "__vals", F.expr("transform(__arr, x -> x.v)")
    ).localCheckpoint(eager=True)

    def fold_end(seed_sql: str) -> str:
        return _ewma_end_expr("__vals", seed_sql, a, b)

    lo, hi = df.select(
        (F.min(F.col(value_micro_col).cast("long")) - 1).alias("lo"),
        (F.max(F.col(value_micro_col).cast("long")) + 1).alias("hi"),
    ).first()
    # pass A: per-segment extreme-seed end states + the seedless end
    # (NULL seed = the first-value-starts rule)
    stats = {
        r["__seg"]: r
        for r in grouped.select(
            "__seg",
            F.expr(fold_end(str(lo))).alias("e_lo"),
            F.expr(fold_end(str(hi))).alias("e_hi"),
            F.expr(fold_end("NULL")).alias("e_first"),
        ).collect()
    }
    order = sorted(stats)
    widths = {
        s: stats[p]["e_hi"] - stats[p]["e_lo"] + 1
        for p, s in zip(order, order[1:])
    }
    too_wide = {s: w for s, w in widths.items() if w > max_candidates}
    if too_wide:
        raise ValueError(
            f"ewma_smooth_global: boundary-state interval width exceeds "
            f"max_candidates={max_candidates} for segment(s) "
            f"{sorted(too_wide)} (widths {sorted(too_wide.values())[-3:]}"
            f"...). The interval contracts like (b/1e6)^rows toward "
            f"~1e6/alpha_ppm — use fewer/larger chunks or a larger "
            f"alpha_ppm, or raise max_candidates deliberately."
        )

    # pass B: speculative end states for every candidate seed
    if len(order) > 1:
        cand = spark.createDataFrame(
            [
                (s, int(stats[p]["e_lo"]), int(stats[p]["e_hi"]))
                for p, s in zip(order, order[1:])
            ],
            "__seg int, __clo long, __chi long",
        )
        spec = {
            r["__seg"]: r
            for r in grouped.join(F.broadcast(cand), "__seg")
            .select(
                "__seg",
                "__clo",
                F.expr(
                    f"transform(sequence(__clo, __chi), "
                    f"sd -> {fold_end('sd')})"
                ).alias("__ends"),
            )
            .collect()
        }
    else:
        spec = {}

    # exact boundary chain (driver-side, bounded: one lookup per chunk)
    seeds: dict[int, int] = {}
    prev_end = None
    for i, s in enumerate(order):
        if i == 0:
            prev_end = int(stats[s]["e_first"])
        else:
            seeds[s] = int(prev_end)
            r = spec[s]
            prev_end = int(r["__ends"][prev_end - r["__clo"]])

    # pass C: one blocked scan per segment from its exact seed (NULL
    # for the first segment — the first-value-starts rule), exploded
    # back to rows
    seed_map = F.create_map(
        *[x for s, sd in seeds.items() for x in (F.lit(s), F.lit(sd))]
    ) if seeds else F.create_map(F.lit(-1), F.lit(0))
    folded = (
        grouped.withColumn("__seed", seed_map[F.col("__seg")].cast("long"))
        .withColumn(
            "__bseeds", F.expr(_ewma_block_seeds_expr("__vals", "__seed", a, b))
        )
        .withColumn("__sarr", F.expr(_ewma_scan_expr("__vals", "__bseeds", a, b)))
    )
    exploded = folded.select(
        F.explode(F.arrays_zip("__arr", F.col("__sarr").alias("__s"))).alias("__z")
    )
    return exploded.select(*out_fields)


def ohlc_resample(
    events: DataFrame,
    keys: list[str] | None = None,
    bucket: str = "1 hour",
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Downsample a tick stream to OHLC bars per key per time bucket —
    the telemetry/market resample every monitoring or feature pipeline
    runs before charting or model input. One partial-aggregable
    groupBy: open/close fold via min_by/max_by over the
    (time, tiebreak) STRUCT order (a total order — bare first()/last()
    are partition-order-nondeterministic, the D2 lesson), high/low via
    min/max. All five outputs are SELECTED raw values, never float
    arithmetic — no sum-of-doubles, so the result is bit-identical
    across engines, partitionings, and retries. Map-side combine does
    the heavy lifting; the shuffle carries one row per (key, bucket).

    Returns (keys..., bucket_start, open, high, low, close, n_events).
    """
    keys = keys or ["event_type"]
    ordk = F.struct(F.col(time_col), F.col(tiebreak_col))
    return (
        events.groupBy(
            *keys, F.window(time_col, bucket).start.alias("bucket_start")
        )
        .agg(
            F.min_by(value_col, ordk).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ordk).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def time_weighted_avg(
    events: DataFrame,
    keys: list[str] | None = None,
    bucket: str = "1 hour",
    time_col: str = "ts",
    value_micro_col: str = "v_micro",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average (TWAP) per key per bucket, exact
    integers: each observation holds its value until the NEXT
    observation of the same key (step interpolation); the last one in
    a bucket holds to the bucket end. The honest mean for irregular
    telemetry — the plain AVG the naive rollup computes overweights
    bursts (10 samples in one busy second count 10x a quiet sample
    covering an hour).

        twap_micro = sum(v * dt) div sum(dt)

    dt in microseconds from LEAD over the per-key (time, tiebreak)
    total order, clamped to the bucket boundary; the weighted sum in
    DECIMAL(38,0) (v_micro * dt_micros wraps BIGINT at ~2.5s of
    holding a ~1e6-micro value — any real gap). One LEAD window + one
    partial-aggregable groupBy, both on the same key partitioning.

    Returns (keys..., bucket_start, n_obs, span_micros, twap_micro);
    twap NULL only if a key's whole bucket span is zero (single
    observation exactly at the bucket end).
    """
    from etl_guiacores_spark.operators.temporal import event_micros

    keys = keys or ["event_type"]
    wk = Window.partitionBy(*keys).orderBy(time_col, tiebreak_col)
    # the dt arithmetic runs entirely in the event_micros domain
    # (injective for TIMESTAMP_NTZ, no session-zone round trip); hour
    # buckets are exact multiples of the duration in that domain, so
    # floor-division bucketing agrees with F.window/date_trunc
    dur = {"1 hour": 3_600_000_000}.get(bucket)
    if dur is None:
        raise ValueError(
            "time_weighted_avg: unsupported bucket (micros-exact "
            f"durations only): {bucket!r}"
        )
    m = event_micros(events, time_col)
    with_m = events.withColumn("__m", m)
    nxt_m = F.lead("__m").over(wk)
    # bucket end must use FLOOR-division semantics: Spark's % keeps the
    # dividend's sign, so `(__m - __m % dur) + dur` lands one bucket too
    # high for pre-epoch (negative) micros and disagrees with the
    # F.window-derived bucket_start. pmod gives the non-negative
    # residue, making bstart = __m - pmod(__m, dur) the true floor
    # bucket start for any sign.
    bend_m = (F.col("__m") - F.pmod(F.col("__m"), F.lit(dur))) + dur
    hold_m = F.least(F.coalesce(nxt_m, bend_m), bend_m)
    stepped = with_m.select(
        *keys,
        F.window(F.col(time_col), bucket).start.alias("bucket_start"),
        F.col(value_micro_col).cast("long").alias("__v"),
        (hold_m - F.col("__m")).cast("long").alias("__dt"),
    )
    return (
        stepped.groupBy(*keys, "bucket_start")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("__dt").cast("long").alias("span_micros"),
            F.expr(
                "CAST(sum(CAST(__v AS DECIMAL(38,0)) * __dt) "
                "AS DECIMAL(38,0))"
            ).alias("__vdt"),
        )
        .withColumn(
            "twap_micro",
            F.expr(
                "CAST(__vdt div NULLIF(CAST(span_micros AS DECIMAL(38,0)),"
                " 0) AS BIGINT)"
            ),
        )
        .drop("__vdt")
    )


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend), in-plan
# ---------------------------------------------------------------------------

_HOLT_NULL_SEED = (
    "named_struct('l', CAST(NULL AS BIGINT), 't', CAST(NULL AS BIGINT))"
)
_HOLT_ARR = "ARRAY<STRUCT<l: BIGINT, t: BIGINT>>"


def _holt_step(sl: str, st: str, v: str, a: int, b: int, g: int, h: int) -> str:
    """SQL for one truncated Holt step from state (sl, st) on value v:
    l' = (a*v + b*(l+t)) div 1e6; t' = (g*(l'-l) + h*t) div 1e6. The
    l' sub-expression is textually repeated inside t' — SQL has no
    let-binding — which costs nothing after codegen CSE."""
    lp = f"(({a} * ({v}) + {b} * (({sl}) + ({st}))) div 1000000)"
    return (
        f"CASE WHEN ({sl}) IS NULL THEN "
        f"named_struct('l', ({v}), 't', CAST(0 AS BIGINT)) "
        f"ELSE named_struct('l', {lp}, "
        f"'t', ({g} * ({lp} - ({sl})) + {h} * ({st})) div 1000000) END"
    )


def _holt_end_expr(
    vals_sql: str, seed_sql: str, a: int, b: int, g: int, h: int
) -> str:
    """END state of the Holt recurrence folded over ``vals_sql`` from
    ``seed_sql`` (a struct<l,t>; NULL l = no state yet)."""
    return (
        f"aggregate({vals_sql}, {seed_sql}, "
        f"(s, v) -> " + _holt_step("s.l", "s.t", "v", a, b, g, h) + ")"
    )


def _holt_block_seeds_expr(
    vals_sql: str,
    a: int,
    b: int,
    g: int,
    h: int,
    block: int = _EWMA_BLOCK,
    seed_sql: str = _HOLT_NULL_SEED,
) -> str:
    """Per-block incoming states — the scalar chained fold of the
    two-level scan, struct-state edition of _ewma_block_seeds_expr.
    ``seed_sql`` is the series' incoming struct<l,t> state (the NULL
    seed starts a fresh series; the streaming twin passes the carried
    per-key state so a batch continues its history exactly)."""
    return (
        f"aggregate(sequence(0, greatest({_nb(vals_sql, block)}, 1) - 1), "
        f"array(CAST({seed_sql} AS STRUCT<l: BIGINT, t: BIGINT>)), "
        f"(acc, i) -> array_append(acc, "
        + _holt_end_expr(
            f"slice({vals_sql}, i * {block} + 1, {block})",
            "element_at(acc, -1)",
            a, b, g, h,
        )
        + "))"
    )


def _holt_scan_expr(
    vals_sql: str,
    bseeds_sql: str,
    a: int,
    b: int,
    g: int,
    h: int,
    block: int = _EWMA_BLOCK,
) -> str:
    """ALL running (level, trend) states: per-block array builds from
    precomputed incoming states, capped at ``block`` elements."""
    prev = (
        f"(CASE WHEN size(o) = 0 THEN element_at({bseeds_sql}, i + 1) "
        f"ELSE element_at(o, -1) END)"
    )
    step = _holt_step(f"{prev}.l", f"{prev}.t", "v", a, b, g, h)
    return (
        f"CASE WHEN size({vals_sql}) = 0 THEN CAST(array() AS {_HOLT_ARR}) "
        f"ELSE flatten(transform(sequence(0, {_nb(vals_sql, block)} - 1), "
        f"i -> aggregate(slice({vals_sql}, i * {block} + 1, {block}), "
        f"CAST(array() AS {_HOLT_ARR}), "
        f"(o, v) -> array_append(o, {step})))) END"
    )


def holt_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_micro_col: str,
    alpha_ppm: int = 200_000,
    beta_ppm: int = 100_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) over
    event time, exact integer micro-units — the trend-aware upgrade
    of :func:`ewma_smooth` (EWMA lags a trending series by a constant
    offset; Holt's second state estimates the slope and feeds it
    back, so the level tracks ramps instead of trailing them). The
    standard short-horizon forecaster for capacity/ingest-rate
    monitoring: forecast(k) = level + k * trend.

    Recurrence (all BIGINT, ``div`` truncation, identical in DuckDB):

        l_1 = v_1, t_1 = 0
        l_i = (alpha*v_i + (1e6-alpha)*(l_{i-1} + t_{i-1})) div 1e6
        t_i = (beta*(l_i - l_{i-1}) + (1e6-beta)*t_{i-1}) div 1e6

    Same engine shape as ewma_smooth — inherently sequential per key,
    folded INSIDE the plan with the ``aggregate`` higher-order
    function over each key's collected structs, zero Python, one
    shuffle on the key — but with a STRUCT<l,t> accumulator, proving
    the blocked two-level scan generalizes from scalar state to any
    fixed-width state vector. Per-key work stays linear: block seeds
    fold scalar-ly, array builds cap at ``_EWMA_BLOCK`` elements.
    Trend can be NEGATIVE; Spark ``div`` and DuckDB ``//`` both
    truncate toward zero (verified), so engines agree on negatives.

    Headroom: interior products are ``(1e6 - alpha) * (l + t)`` — at
    micro-unit states up to ~1e12 that is ~1e18, inside BIGINT; for
    larger magnitudes pre-scale the input down (same contract as
    ewma_smooth).

    Returns one row per input row: (key, ts, [tiebreak], v_micro,
    level_micro, trend_micro).
    """
    if not 0 < alpha_ppm <= 1_000_000:
        raise ValueError("alpha_ppm must be in (0, 1e6]")
    if not 0 < beta_ppm <= 1_000_000:
        raise ValueError("beta_ppm must be in (0, 1e6]")
    a, b = alpha_ppm, 1_000_000 - alpha_ppm
    g, h = beta_ppm, 1_000_000 - beta_ppm
    fields = [F.col(ts_col).alias("ts")]
    if tiebreak_col is not None:
        fields.append(F.col(tiebreak_col).alias("tb"))
    fields.append(F.col(value_micro_col).cast("long").alias("v"))
    grouped = (
        df.groupBy(key_col)
        .agg(F.sort_array(F.collect_list(F.struct(*fields))).alias("__arr"))
        .withColumn("__vals", F.expr("transform(__arr, x -> x.v)"))
        .withColumn(
            "__bseeds",
            F.expr(_holt_block_seeds_expr("__vals", a, b, g, h)),
        )
    )
    sarr = F.expr(_holt_scan_expr("__vals", "__bseeds", a, b, g, h))
    exploded = grouped.select(
        key_col,
        F.explode(F.arrays_zip("__arr", sarr.alias("__s"))).alias("__z"),
    )
    out = [
        F.col(key_col),
        F.col("__z.__arr.ts").alias(ts_col),
    ]
    if tiebreak_col is not None:
        out.append(F.col("__z.__arr.tb").alias(tiebreak_col))
    out.append(F.col("__z.__arr.v").alias("v_micro"))
    out.append(F.col("__z.__s.l").alias("level_micro"))
    out.append(F.col("__z.__s.t").alias("trend_micro"))
    return exploded.select(*out)


# ---------------------------------------------------------------------------
# Path statistics: maximum drawdown
# ---------------------------------------------------------------------------

def max_drawdown(
    df: "DataFrame",
    keys: list[str],
    order_cols: list[str],
    flow_col: str,
) -> "DataFrame":
    """Per-key maximum drawdown of the cumulative ``flow_col`` curve
    (q187's core): running sum over the ``order_cols`` total order
    (include a unique tiebreak — the engine-wide determinism rule),
    running peak over the running sum, drawdown = peak - current,
    reported as the path maximum with the final balance and global
    peak. The path statistic a plain groupBy cannot see: two
    identical final balances can hide wildly different risk paths.

    Shape: two stacked per-key ROWS windows on ONE partition-sort —
    parallel across keys, no self-join, no O(n^2) peak scan. All
    integer arithmetic in the caller's units.

    Returns (keys..., n_flows, final, peak, max_drawdown).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    path = df.withColumn("__cum", F.sum(flow_col).over(w)).withColumn(
        "__peak", F.max("__cum").over(w)
    )
    return path.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_flows"),
        F.sum(flow_col).cast("long").alias("final"),
        F.max("__peak").cast("long").alias("peak"),
        F.max(F.col("__peak") - F.col("__cum")).cast("long").alias(
            "max_drawdown"
        ),
    )
