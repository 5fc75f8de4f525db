"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops
(the brief's preferred strategy), not UDFs:

- **as-of join**: for each left row, the LATEST right row with
  right_time <= left_time per key. Implemented with the union+window
  trick — tag both sides, union, and carry the last right-side values
  forward with ``last(ignoreNulls)`` over (key, time) ordering. ONE
  shuffle on (key, time); contrast with the naive approach (range
  join + argmax) which shuffles twice and explodes intermediate rows.
- **range join**: pairs within a time band. The band is bucketed to
  band width, each left row joins buckets {b-1, b, b+1}, and the
  exact predicate filters — an equi-join the planner can hash, never
  a cartesian. Cost is O(pairs-in-band), not O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def event_micros(df: DataFrame, time_col: str) -> Column:
    """Integer event-time microseconds, injective for EVERY input type.

    For TIMESTAMP (an instant) this is plain ``unix_micros``. For
    TIMESTAMP_NTZ a ``cast('timestamp')`` would route the wall-clock
    value through the SESSION timezone — non-injective across DST
    transitions (spring-forward wall times collapse onto one
    instant), which would silently merge band buckets and reorder
    as-of rows under a non-UTC session. Instead NTZ values are
    measured as wall-clock microseconds by pure FIELD EXTRACTION
    (date/hour/minute/fractional second), which never consults a
    timezone — even ``timestamp_diff`` won't do: it normalizes
    nonexistent spring-forward wall times through the session zone.
    DATE/STRING inputs take the cast path.
    """
    dt = df.schema[time_col].dataType
    if isinstance(dt, T.TimestampNTZType):
        # pure field extraction — date/hour/minute/fractional-second
        # are wall-clock reads on NTZ and never consult a zone (even
        # timestamp_diff normalizes nonexistent spring-forward wall
        # times through the session zone, collapsing the DST gap)
        c = F.col(time_col)
        days = F.unix_date(c.cast("date")).cast("long")
        mins = (F.hour(c) * 3600 + F.minute(c) * 60).cast("long")
        micros = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
        return days * 86_400_000_000 + mins * 1_000_000 + micros
    return F.unix_micros(F.col(time_col).cast("timestamp"))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    tie_breaker: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + the latest right row at-or-before their timestamp.

    ``tie_breaker`` orders simultaneous right rows (latest wins) so the
    result is deterministic under distributed execution.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    # event time becomes integer microseconds BEFORE the union (each
    # side may carry a different temporal type — instant vs NTZ — and
    # event_micros picks the injective mapping per side)
    order_cols = [F.col("__t"), F.col("__is_left")]
    if tie_breaker:
        order_cols.append(F.col(f"__tb"))

    l_tagged = left.withColumn("__t", event_micros(left, left_time)).withColumn(
        "__is_left", F.lit(1)
    )
    r_tagged = right.withColumn("__t", event_micros(right, right_time)).withColumn(
        "__is_left", F.lit(0)
    )
    if tie_breaker:
        # keep the tie-breaker's OWN type: casting to long would turn a
        # string version column ('v2') into NULL for every row and
        # silently reintroduce the nondeterminism the parameter exists
        # to prevent; any orderable type sorts fine in the window
        tb_type = right.schema[tie_breaker].dataType
        l_tagged = l_tagged.withColumn("__tb", F.lit(None).cast(tb_type))
        r_tagged = r_tagged.withColumn("__tb", F.col(tie_breaker))

    # align schemas: left payload on left rows, right payload on right rows
    all_left = [c for c in left.columns]
    united = l_tagged.select(
        on, "__t", "__is_left", *(["__tb"] if tie_breaker else []),
        *[F.col(c) for c in all_left if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in right_cols],
    ).unionByName(
        r_tagged.select(
            on, "__t", "__is_left", *(["__tb"] if tie_breaker else []),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in all_left if c != on],
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        )
    )

    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = united.select(
        on,
        "__is_left",
        *[c for c in all_left if c != on],
        *[
            F.last(F.col(f"{prefix}{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join_pairs(
    df: DataFrame,
    key: str,
    time_col: str,
    band_seconds: float,
    id_col: str,
) -> DataFrame:
    """Row pairs of ``df`` sharing ``key`` with |t_a - t_b| <= band and
    id_a < id_b. Bucketed equi-join: each row probes its own and the
    two adjacent band buckets, so the hash join sees (key, bucket)
    keys and the quadratic blowup is confined to genuine band
    neighborhoods."""
    band_us = int(band_seconds * 1_000_000)
    if band_us <= 0:
        # a zero-width band would divide by zero in the bucket key —
        # NULL buckets never join and every pair silently vanishes
        raise ValueError(
            f"band_seconds={band_seconds} is below 1 microsecond; "
            "use a positive band (equal timestamps need band >= 1e-6)"
        )
    tus = event_micros(df, time_col)
    a = df.select(
        F.col(key), F.col(id_col).alias("id_a"), tus.alias("t_a"),
        (tus / band_us).cast("long").alias("__b"),
    )
    b = df.select(
        F.col(key), F.col(id_col).alias("id_b"), tus.alias("t_b"),
        F.explode(
            F.array(
                (tus / band_us).cast("long") - 1,
                (tus / band_us).cast("long"),
                (tus / band_us).cast("long") + 1,
            )
        ).alias("__b"),
    )
    return (
        a.join(b, on=[key, "__b"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= band_us)
        )
        .select(key, "id_a", "id_b", "t_a", "t_b")
        .distinct()
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str,
    observed_col: str,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Kaplan-Meier survival curve in exact integer ppm — the
    standard retention/churn estimator under right-censoring (a user
    still active at the observation cutoff hasn't churned; dropping
    them biases survival down, counting them as churned biases it
    up; KM handles them correctly by shrinking the risk set).

    Input: one row per subject with its ``duration_col`` (integer
    time units) and ``observed_col`` (TRUE = the event happened,
    FALSE = censored at that duration). Estimator over the sorted
    distinct event times t_i with n_i at risk and d_i events:

        S_i = trunc(S_{i-1} * trunc((n_i - d_i) * ppm / n_i) / ppm)

    — a product of per-step truncated ppm factors, deterministic and
    engine-replayable (a float product drifts with evaluation
    order; the oracle replays the same recurrence as a recursive
    CTE).

    Engine shape: subjects aggregate to the per-duration risk table
    (one map-side-combinable groupBy + one prefix-sum window over
    the BOUNDED distinct-duration relation), and the sequential
    product folds IN-PLAN over that bounded table's collected
    structs via the aggregate higher-order function — the q123/q170
    fold pattern applied to a relation that is small by construction
    (|distinct durations|, never |subjects|), then explodes back to
    rows. Censored-only durations appear in the risk-set shrinkage
    but emit no curve step (standard KM: steps at event times only).

    Returns one row per distinct EVENT duration: (duration, n_risk,
    n_events, surv_ppm), surv_ppm non-increasing from ppm.
    """
    d, obs = F.col(duration_col), F.col(observed_col)
    per_t = durations.groupBy(d.alias("t")).agg(
        F.count("*").cast("long").alias("n_here"),
        F.sum(F.when(obs, 1).otherwise(0)).cast("long").alias("d_i"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_pre = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.withColumn(
        "n_i",
        (
            F.sum("n_here").over(w_all)
            - F.coalesce(F.sum("n_here").over(w_pre), F.lit(0))
        ).cast("long"),
    )
    folded = (
        risk.groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct("t", "n_i", "d_i"))
            ).alias("__arr")
        )
        .withColumn(
            "__s",
            F.expr(
                f"""
                aggregate(__arr, CAST(array() AS ARRAY<BIGINT>),
                  (o, x) -> array_append(o,
                    (CASE WHEN size(o) = 0 THEN CAST({ppm} AS BIGINT)
                          ELSE element_at(o, -1) END)
                    * (((x.n_i - x.d_i) * {ppm}) div x.n_i)
                    div {ppm}))
                """
            ),
        )
    )
    exploded = folded.select(
        F.explode(F.arrays_zip("__arr", F.col("__s").alias("__sv"))).alias(
            "__z"
        )
    )
    return exploded.select(
        F.col("__z.__arr.t").cast("long").alias("duration"),
        F.col("__z.__arr.n_i").alias("n_risk"),
        F.col("__z.__arr.d_i").alias("n_events"),
        F.col("__z.__sv").cast("long").alias("surv_ppm"),
    ).filter(F.col("n_events") > 0)


def state_dwell(
    df: "DataFrame",
    keys: list[str],
    state_col: str,
    time_col: str,
    tiebreak_col: str,
) -> "DataFrame":
    """Per-state dwell-time accounting (q188's core): each event holds
    its ``state_col`` until the key's next event — one LEAD over the
    per-key (time, tiebreak) total order, in the ``event_micros``
    injective integer domain; a key's last event holds indefinitely
    and is excluded (right-censored). One parallel window + one
    map-side-combinable groupBy to |states| rows.

    Returns (state_col, n_holds, total_dwell_us, mean_dwell_us
    [truncating], max_dwell_us).
    """
    m = event_micros(df, time_col)
    w = Window.partitionBy(*keys).orderBy(time_col, tiebreak_col)
    d = df.select(
        state_col, (F.lead(m).over(w) - m).alias("__dwell")
    ).filter(F.col("__dwell").isNotNull())
    return d.groupBy(state_col).agg(
        F.count("*").cast("long").alias("n_holds"),
        F.sum("__dwell").cast("long").alias("total_dwell_us"),
        F.expr("sum(__dwell) div count(*)").cast("long").alias(
            "mean_dwell_us"
        ),
        F.max("__dwell").cast("long").alias("max_dwell_us"),
    )
