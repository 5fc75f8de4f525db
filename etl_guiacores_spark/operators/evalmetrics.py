"""Model-evaluation and distribution-drift metrics, integer-exact.

The eval half of a training-data pipeline: once a corpus ships and a
model (or heuristic labeler) runs over it, the questions become "how
well does this score separate the classes" (AUC), "did the feature
distribution move between snapshots" (two-sample KS), and "where does
the classifier fail, per class" (confusion-matrix precision/recall/F1
— the per-class breakdown Cohen's kappa deliberately collapses, see
labels.cohen_kappa). The reference pipeline reports only raw counts
after its validation pass (`/root/reference/src/etl/transformers.py`
quality metrics); these are the standard generalizations every data
card and eval harness publishes.

All three are RANK/COUNT statistics, which is what makes them
cross-engine exact (the rankstats.py discipline): ranks and counts
are integers, each metric is a ratio of integer polynomials, so one
truncating DECIMAL(38,0) division at the end gives bit-identical ppm
on Spark and DuckDB — no float accumulation anywhere.

Scale shapes:
- AUC and KS first collapse the data to a per-(group, score) count
  relation (one map-side-combinable groupBy — raw rows never shuffle
  twice), then run rank windows over that BOUNDED relation
  (parallel across groups; within a group ordered by score — the
  percentile-family caveat: one group's distinct scores sit on one
  reducer).
- Confusion metrics never window at all: one groupBy to the
  confusion table, then joins on the bounded |groups|x|classes|
  marginal relations.
- AUC uses tie-AVERAGE ranks (the textbook Mann-Whitney definition),
  carried as 2x-scaled integers so half-ranks stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def _guard_columns(op: str, df: DataFrame, reserved: set[str]) -> None:
    """Fail loud when an input column collides with an operator's
    working/output names (the rankstats/intervals discipline: a silent
    collision would overwrite user data or break the final select)."""
    hit = reserved & set(df.columns)
    if hit:
        raise ValueError(
            f"{op}: input columns {sorted(hit)} collide with the "
            "operator's working/output names — rename them first"
        )


def _non_null(op: str, col: str, typ: str):
    """Column expr that casts ``col`` to ``typ`` and raises in-plan on
    NULL. AUC/KS are rank statistics over a labeled population — a NULL
    label has no rank semantics, and silently pooling it (the old
    ``count(*) - sum(label)`` arithmetic) biased the negative count.
    Fail-loud beats silent bias: the caller filters or imputes first."""
    return F.when(
        F.col(col).isNotNull(), F.col(col).cast(typ)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{op}: NULL in {col!r} — filter or impute NULL labels "
                "before computing the metric"
            )
        )
    )


def auc_roc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group exact ROC AUC in ppm via the rank (Mann-Whitney U)
    identity, with tie-average ranks:

        AUC = (R_pos - n_pos*(n_pos+1)/2) / (n_pos * n_neg)

    where ``R_pos`` is the sum over positive rows of their average
    rank in the pooled ascending ``score_col`` order. Carried as
    integers: for a score value v with ``cnt`` rows of which ``pos``
    are positive and ``cum`` rows strictly below, each tied row's
    2x-average-rank is ``2*cum + cnt + 1``, so

        auc_ppm = PPM * (2*R_pos - n_pos*(n_pos+1))
                  div (2 * n_pos * n_neg)

    with ``2*R_pos = sum_v pos_v * (2*cum_v + cnt_v + 1)`` — every
    interior in DECIMAL(38,0) (2*R_pos reaches n^2, past BIGINT at
    ~3e9 rows/group). NULL when the group is single-class (AUC
    undefined). The numerator is provably non-negative (min rank-sum
    is n_pos*(n_pos+1)/2), so truncating division is sign-unambiguous
    on both engines.

    ``score_col`` must be integer-typed (micro-scale floats first:
    the q124/q144 convention); ``label_col`` boolean.

    ``label_col`` must be NULL-free — a NULL label has no rank
    semantics, and the ``n_neg = count(*) - sum(label)`` arithmetic
    would silently count it as a negative; the operator raises in-plan
    instead (filter or impute first).

    Returns (group_cols..., n_pos, n_neg, auc_ppm).
    """
    g = list(group_cols)
    _guard_columns(
        "auc_roc",
        df,
        {"__cnt", "__pos", "__2rpos", "__cum", "n_pos", "n_neg", "auc_ppm"}
        - {*g, score_col},
    )
    by_score = df.groupBy(*g, score_col).agg(
        F.count("*").cast("long").alias("__cnt"),
        F.sum(_non_null("auc_roc", label_col, "long"))
        .cast("long")
        .alias("__pos"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("__cnt").over(w), F.lit(0)).cast("long")
    ranked = by_score.withColumn("__cum", cum)
    return (
        ranked.groupBy(*g)
        .agg(
            F.sum("__pos").cast("long").alias("n_pos"),
            (F.sum("__cnt") - F.sum("__pos")).cast("long").alias("n_neg"),
            F.expr(
                "CAST(sum(CAST(__pos AS DECIMAL(38,0)) "
                "* (2 * __cum + __cnt + 1)) AS DECIMAL(38,0))"
            ).alias("__2rpos"),
        )
        .withColumn(
            "auc_ppm",
            F.expr(
                f"CAST({PPM} * (__2rpos - CAST(n_pos AS DECIMAL(38,0)) "
                f"* (n_pos + 1)) div NULLIF(2 * CAST(n_pos AS "
                f"DECIMAL(38,0)) * n_neg, 0) AS BIGINT)"
            ),
        )
        .drop("__2rpos")
    )


def ks_2samp(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    in_b_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov statistic in exact ppm:

        D = max_x | F_a(x) - F_b(x) |

    over the pooled empirical CDFs of sample A (``in_b_col`` false)
    and sample B (true). Cross-multiplied to integers per distinct
    value: ``D_num = max | cum_a * n_b - cum_b * n_a |``, then
    ``d_ppm = PPM * D_num div (n_a * n_b)`` — interiors
    DECIMAL(38,0) (cum * n reaches n^2). NULL when either sample is
    empty. Evaluated at each DISTINCT value with the full tied count
    included (ECDFs are right-continuous), so ties need no tiebreak
    column — the statistic is deterministic by construction.

    The standard "did this feature's distribution move" drift test —
    run per feature with A = yesterday's snapshot, B = today's —
    complementing CUSUM (funnel.cusum_drift), which localizes WHEN a
    mean shifted; KS says whether the SHAPE changed, mean aside.

    ``value_col`` must be integer-typed; ``in_b_col`` boolean.

    ``in_b_col`` must be NULL-free — a row in neither sample is a
    caller bug, raised in-plan rather than silently dropped into A.

    Returns (group_cols..., n_a, n_b, d_ppm).
    """
    g = list(group_cols)
    _guard_columns(
        "ks_2samp",
        df,
        {"__ca", "__cb", "__cuma", "__cumb", "__na", "__nb", "__dnum",
         "n_a", "n_b", "d_ppm"} - {*g, value_col},
    )
    inb = _non_null("ks_2samp", in_b_col, "boolean")
    by_val = df.groupBy(*g, value_col).agg(
        F.sum(F.when(~inb, 1).otherwise(0)).cast("long").alias("__ca"),
        F.sum(F.when(inb, 1).otherwise(0)).cast("long").alias("__cb"),
    )
    w_cum = (
        Window.partitionBy(*g)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*g)
    stepped = by_val.select(
        *g,
        F.sum("__ca").over(w_cum).alias("__cuma"),
        F.sum("__cb").over(w_cum).alias("__cumb"),
        F.sum("__ca").over(w_all).alias("__na"),
        F.sum("__cb").over(w_all).alias("__nb"),
    )
    return (
        stepped.groupBy(*g)
        .agg(
            F.max("__na").cast("long").alias("n_a"),
            F.max("__nb").cast("long").alias("n_b"),
            F.expr(
                "CAST(max(abs(CAST(__cuma AS DECIMAL(38,0)) * __nb "
                "- CAST(__cumb AS DECIMAL(38,0)) * __na)) "
                "AS DECIMAL(38,0))"
            ).alias("__dnum"),
        )
        .withColumn(
            "d_ppm",
            F.expr(
                f"CAST({PPM} * __dnum div NULLIF(CAST(n_a AS "
                f"DECIMAL(38,0)) * n_b, 0) AS BIGINT)"
            ),
        )
        .drop("__dnum")
    )


def confusion_metrics(
    df: DataFrame,
    group_cols: list[str],
    gold_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-(group, class) confusion-matrix breakdown with exact ppm
    precision / recall / F1 — the one-vs-rest view kappa collapses:

        precision = tp / (tp + fp)      (NULL if class never predicted)
        recall    = tp / (tp + fn)      (NULL if class has no gold rows)
        f1        = 2*tp / (2*tp + fp + fn)

    each as ``PPM * num div den`` in BIGINT (counts only — no n^2
    interiors, plain longs suffice). The class axis is the UNION of
    gold and predicted labels (full outer on the marginals), so a
    class the model hallucinates (fp only) and a class it never emits
    (fn only) both get rows — the two failure modes a
    gold-classes-only report silently drops.

    Scale shape: one map-side-combinable groupBy to the confusion
    table, then marginal aggregates and joins entirely on bounded
    |groups| x |classes| relations; the raw rows shuffle once, as
    counts.

    Returns (group_cols..., class, tp, fp, fn, precision_ppm,
    recall_ppm, f1_ppm).

    Lifecycle note: construction runs one eager Spark job (the
    bounded confusion table is ``localCheckpoint(eager=True)``-ed so
    its three consumers share a stage boundary), and the checkpointed
    RDD blocks are NOT reclaimed by ``spark.catalog.clearCache()`` —
    they free when the returned DataFrame is garbage-collected, so a
    long-lived session calling this repeatedly should drop its
    references (same semantics as labels.cohen_kappa).
    """
    g = list(group_cols)
    _guard_columns(
        "confusion_metrics",
        df,
        {"__g", "__p", "__n", "__ng", "__np", "__tp", "class", "tp",
         "fp", "fn", "precision_ppm", "recall_ppm", "f1_ppm"} - {*g},
    )
    conf = df.groupBy(
        *g, F.col(gold_col).alias("__g"), F.col(pred_col).alias("__p")
    ).agg(F.count("*").cast("long").alias("__n"))
    # conf feeds THREE consumers (gold_m, pred_m, diag) under
    # different downstream grouping keys, so without a stage boundary
    # the raw scan + label expressions (q152: a full lang_id regex
    # pass over the corpus) replay once per consumer. conf itself is
    # bounded by |groups| x |classes|^2 — materializing it is a tiny
    # one-job barrier that makes everything downstream read the
    # bounded table (same measured fix as labels.cohen_kappa)
    conf = conf.localCheckpoint(eager=True)
    gold_m = (
        conf.groupBy(*g, F.col("__g").alias("class"))
        .agg(F.sum("__n").cast("long").alias("__ng"))
    )
    pred_m = (
        conf.groupBy(*g, F.col("__p").alias("class"))
        .agg(F.sum("__n").cast("long").alias("__np"))
    )
    diag = (
        conf.filter(F.col("__g") == F.col("__p"))
        .select(*g, F.col("__g").alias("class"),
                F.col("__n").alias("__tp"))
    )
    keys = [*g, "class"]
    return (
        gold_m.join(pred_m, keys, "full_outer")
        .join(diag, keys, "left")
        .select(
            *keys,
            F.coalesce("__tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("__np", F.lit(0)) - F.coalesce("__tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("__ng", F.lit(0)) - F.coalesce("__tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
        .withColumn(
            "precision_ppm",
            F.expr(f"CAST({PPM} * tp div NULLIF(tp + fp, 0) AS BIGINT)"),
        )
        .withColumn(
            "recall_ppm",
            F.expr(f"CAST({PPM} * tp div NULLIF(tp + fn, 0) AS BIGINT)"),
        )
        .withColumn(
            "f1_ppm",
            F.expr(
                f"CAST(2 * {PPM} * tp div NULLIF(2 * tp + fp + fn, 0) "
                f"AS BIGINT)"
            ),
        )
    )


def transition_matrix(
    df: DataFrame,
    chain_cols: list[str],
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition matrix over per-chain state
    sequences: each chain (user, session, device) is ordered by
    ``order_cols`` (must be a total order within a chain — include a
    unique id as the last key, the engine-wide determinism rule), LAG
    gives (prev -> next) transition pairs, and the matrix reports

        p_ppm = PPM * n_trans div n_from

    — the exact row-stochastic probability, truncating (row sums are
    <= PPM by construction; the deficit is truncation residue).

    The standard behavioral model for event streams: next-action
    prediction baselines, funnel leak detection (mass flowing into a
    terminal error state), and synthetic-sequence generation all
    start from this matrix.

    Scale shape: per-chain LAG windows (parallel across chains,
    bounded per chain), then one groupBy to the |states|^2 matrix —
    counts only past the first shuffle. Plain BIGINT suffices.

    Returns (prev_state, next_state, n_trans, n_from, p_ppm).
    """
    _guard_columns(
        "transition_matrix",
        df,
        {"prev_state", "next_state", "n_trans", "n_from", "p_ppm"}
        - {state_col},
    )
    w = Window.partitionBy(*chain_cols).orderBy(*order_cols)
    pairs = (
        df.select(
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count("*").cast("long").alias("n_trans")
    )
    w_from = Window.partitionBy("prev_state")
    return (
        counts.withColumn(
            "n_from", F.sum("n_trans").over(w_from).cast("long")
        )
        .withColumn(
            "p_ppm",
            F.expr(f"CAST({PPM} * n_trans div n_from AS BIGINT)"),
        )
    )


def pareto_frontier(
    df: DataFrame,
    group_cols: list[str],
    cost_col: str,
    gain_col: str,
) -> DataFrame:
    """Per-group 2-D Pareto frontier (skyline): keep each row for
    which no other row in the group is at least as good on BOTH axes
    (``cost_col`` minimized, ``gain_col`` maximized) and strictly
    better on at least one. Exact duplicates on both axes are
    mutually non-dominating and are all kept (deterministic without a
    tiebreak).

    Classic skyline via ONE sort, not the naive all-pairs O(n^2)
    dominance join: over the group ordered by cost, a row is
    dominated iff

        max(gain | cost <  c) >= g   (strictly cheaper, at least as good)
     OR max(gain | cost <= c) >  g   (at most as cheap, strictly better)

    both computable as RANGE-frame running maxima — so the whole
    operator is two window functions over one partition-sort.
    ``cost_col`` must be integer-typed (RANGE frames need numeric
    order keys; micro-scale floats first).

    Scale shape: one shuffle on ``group_cols``, per-group sort —
    parallel across groups, the bounded-group caveat within. The
    multi-dimensional generalization needs the dominance join; 2-D is
    the common case (price/quality, latency/accuracy) and stays
    sort-cheap.

    Returns the input rows (all columns) on the frontier.
    """
    _guard_columns("pareto_frontier", df, {"__dom"})
    w_lt = (
        Window.partitionBy(*group_cols)
        .orderBy(cost_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy(*group_cols)
        .orderBy(cost_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    best_lt = F.max(gain_col).over(w_lt)
    best_le = F.max(gain_col).over(w_le)
    dominated = (
        F.coalesce(best_lt >= F.col(gain_col), F.lit(False))
        | (best_le > F.col(gain_col))
    )
    return (
        df.withColumn("__dom", dominated)
        .filter(~F.col("__dom"))
        .drop("__dom")
    )


#: round(log10(1 + 1/d) * 1e6) for d = 1..9 — sums to exactly 1e6.
BENFORD_PPM = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}


def benford_profile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group first-significant-digit distribution vs Benford's
    law — the classic fabricated-data / synthetic-contamination audit
    for financial and telemetry columns (organically-generated
    multiplicative quantities lead with 1 ~30% of the time; uniform
    generators and hand-typed numbers don't).

    Rows with ``value_col`` < 1 are excluded (no first significant
    digit without crossing into fractional-digit semantics — the
    audit convention). The first digit is taken from the DECIMAL
    STRING of floor(value) — no log10 floats near power-of-ten
    boundaries where IEEE rounding flips the digit.

        obs_ppm = PPM * n_digit div n_total
        dev_ppm = obs_ppm - benford_ppm   (expected table as exact
                  integer literals, rounded log10(1+1/d)*1e6,
                  summing to exactly 1e6)

    Only digits PRESENT in the group are emitted (a 9-row-per-group
    scaffold join adds nothing the dev_ppm of missing digits can't be
    read from: absent digit = -benford_ppm).

    Scale shape: one map-side-combinable groupBy on (group, digit),
    then window totals over the bounded <= 9-rows-per-group relation.

    Returns (group_cols..., digit, n, obs_ppm, benford_ppm, dev_ppm).
    """
    g = list(group_cols)
    _guard_columns(
        "benford_profile",
        df,
        {"digit", "n", "__tot", "obs_ppm", "benford_ppm", "dev_ppm"}
        - {*g},
    )
    digit = F.substring(
        F.floor(F.col(value_col)).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(value_col) >= 1)
        .groupBy(*g, digit.alias("digit"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    w_all = Window.partitionBy(*g)
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
        ),
        F.col("digit"),
    )
    return (
        counts.withColumn("__tot", F.sum("n").over(w_all))
        .withColumn(
            "obs_ppm", F.expr(f"CAST({PPM} * n div __tot AS BIGINT)")
        )
        .withColumn("benford_ppm", expected.cast("long"))
        .withColumn(
            "dev_ppm", (F.col("obs_ppm") - F.col("benford_ppm")).cast("long")
        )
        .drop("__tot")
    )


def decile_lift(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-group decile lift table — the uplift/calibration view of a
    ranking score (AUC's operational cousin: AUC says the ranking is
    good, the lift table says WHERE to cut it): rows bucketed into
    ``n_buckets`` score-ordered tiles (best scores first), each
    bucket reporting its positive rate and the cumulative lift of
    targeting the top buckets,

        rate_ppm     = PPM * n_pos div n
        cum_lift_ppm = PPM * cum_pos * tot_n div (cum_n * tot_pos)

    (PPM = no lift; 3e6 = 3x the base rate; NULL when the group has
    no positives). Bucketing is NTILE over the (score DESC, tiebreak)
    total order — standard-SQL NTILE semantics (earlier tiles take
    the remainder rows) on both engines, deterministic because the
    order is total. Interiors DECIMAL(38,0): cum_pos * tot_n reaches
    n^2.

    Scale shape: one per-group NTILE window (the rankstats
    bounded-group caveat: a group sorts on one reducer), one groupBy
    to the n_buckets-row relation, cumulative windows over that
    bounded relation only.

    Returns (group_cols..., bucket, n, n_pos, rate_ppm,
    cum_lift_ppm).
    """
    g = list(group_cols)
    _guard_columns(
        "decile_lift",
        df,
        {"__pos", "bucket", "n", "n_pos", "__cum_n", "__cum_pos",
         "__tot_n", "__tot_pos", "rate_ppm", "cum_lift_ppm"} - {*g},
    )
    w_tile = Window.partitionBy(*g).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col)
    )
    tiled = df.select(
        *g,
        _non_null("decile_lift", label_col, "long").alias("__pos"),
        F.ntile(n_buckets).over(w_tile).alias("bucket"),
    )
    per_bucket = tiled.groupBy(*g, "bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
    )
    w_cum = (
        Window.partitionBy(*g)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*g)
    return (
        per_bucket.select(
            *g,
            "bucket",
            "n",
            "n_pos",
            F.sum("n").over(w_cum).alias("__cum_n"),
            F.sum("n_pos").over(w_cum).alias("__cum_pos"),
            F.sum("n").over(w_all).alias("__tot_n"),
            F.sum("n_pos").over(w_all).alias("__tot_pos"),
        )
        .withColumn(
            "rate_ppm",
            F.expr(f"CAST({PPM} * n_pos div n AS BIGINT)"),
        )
        .withColumn(
            "cum_lift_ppm",
            F.expr(
                f"CAST({PPM} * CAST(__cum_pos AS DECIMAL(38,0)) * __tot_n "
                f"div NULLIF(CAST(__cum_n AS DECIMAL(38,0)) * __tot_pos, 0) "
                f"AS BIGINT)"
            ),
        )
        .drop("__cum_n", "__cum_pos", "__tot_n", "__tot_pos")
    )


def assoc_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Association rules over (basket, item) pairs — market-basket
    support / confidence / lift for every ordered item pair, in exact
    integer ppm:

        support_ppm    = PPM * n_both div n_baskets
        confidence_ppm = PPM * n_both div n_antecedent
        lift_ppm       = PPM * n_both * n_baskets
                         div (n_antecedent * n_consequent)

    (lift > PPM: positive association; < PPM: substitution). Items
    are basket-DISTINCT first, so multiplicity within a basket does
    not inflate counts — the standard presence semantics.

    Scale shape: one distinct on (basket, item) (the only data-sized
    shuffle), a basket-keyed self-join whose fan-out per basket is
    |items-in-basket|^2 — bounded by the item vocabulary, NOT corpus
    volume (Zipf-large baskets are AQE skew territory; a
    max-basket-size filter is the documented guard for pathological
    baskets). Marginals and the basket total are aggregates of the
    deduplicated relation; the 1-row basket-count scalar rides the
    plan as a broadcast (the q46/q58 scalar-join shape). Interiors
    DECIMAL(38,0) — n_both * n_baskets reaches n^2.

    Returns (antecedent, consequent, n_both, n_antecedent,
    n_consequent, support_ppm, confidence_ppm, lift_ppm).
    """
    _guard_columns(
        "assoc_rules",
        df,
        {"__b", "__i", "__nb", "__ni", "antecedent", "consequent",
         "n_both", "n_antecedent", "n_consequent", "support_ppm",
         "confidence_ppm", "lift_ppm"},
    )
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = items.groupBy().agg(
        F.count_distinct("__b").cast("long").alias("__nb")
    )
    marg = items.groupBy("__i").agg(F.count("*").cast("long").alias("__ni"))
    pairs = (
        items.alias("a")
        .join(
            items.alias("b"),
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__i") != F.col("b.__i")),
        )
        .groupBy(
            F.col("a.__i").alias("antecedent"),
            F.col("b.__i").alias("consequent"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    return (
        pairs.join(
            marg.withColumnRenamed("__i", "antecedent").withColumnRenamed(
                "__ni", "n_antecedent"
            ),
            "antecedent",
        )
        .join(
            marg.withColumnRenamed("__i", "consequent").withColumnRenamed(
                "__ni", "n_consequent"
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            "n_antecedent",
            "n_consequent",
            F.expr(f"CAST({PPM} * n_both div __nb AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr(
                f"CAST({PPM} * n_both div n_antecedent AS BIGINT)"
            ).alias("confidence_ppm"),
            F.expr(
                f"CAST({PPM} * CAST(n_both AS DECIMAL(38,0)) * __nb "
                f"div (CAST(n_antecedent AS DECIMAL(38,0)) "
                f"* n_consequent) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def top_paths(
    df: DataFrame,
    chain_cols: list[str],
    state_col: str,
    order_cols: list[str],
    prefix_len: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Most common session-opening paths: each chain's first
    ``prefix_len`` states (ordered by ``order_cols``, which must be a
    total order within a chain) joined into one ``a>b>c`` path
    string, counted, top-``top_k`` by (count DESC, path) — the
    deterministic total order that keeps the cut boundary stable
    across runs and engines.

    The product-analytics "what do users actually do first"
    aggregation, and the funnel-discovery precursor (funnel_steps
    checks a KNOWN sequence; this surfaces the candidates).

    Scale shape: per-chain rank window (parallel across chains) to
    keep the prefix, one groupBy per chain folding the prefix with
    ``array_sort(collect_list(struct(rank, state)))`` — sorted AFTER
    collection, so the fold is order-insensitive and deterministic
    regardless of partitioning (bare collect_list order is not) —
    then a groupBy on the bounded path relation and one global sort
    of path COUNTS (|distinct prefixes| rows, never event volume).

    Returns (path, n_chains, path_rank).
    """
    _guard_columns(
        "top_paths", df, {"__s", "__rn", "path", "n_chains", "path_rank"}
    )
    w = Window.partitionBy(*chain_cols).orderBy(*order_cols)
    prefix = (
        df.select(
            *chain_cols,
            F.col(state_col).alias("__s"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") <= prefix_len)
    )
    paths = (
        prefix.groupBy(*chain_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__rn", "__s"))
                    ),
                    lambda x: x["__s"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n_chains"))
    )
    w_rank = Window.orderBy(F.col("n_chains").desc(), F.col("path"))
    return (
        paths.withColumn(
            "path_rank", F.row_number().over(w_rank).cast("long")
        )
        .filter(F.col("path_rank") <= top_k)
    )
