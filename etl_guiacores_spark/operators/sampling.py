"""Deterministic hash sampling for mixture construction.

Training-data mixtures are specified as per-source rates ("keep 25%
of web, all of books"). ``df.sample`` is seed-dependent on
partitioning and not reproducible across engines or re-runs with
different parallelism; the production-correct tool is a HASH
threshold: a document is kept iff a uniform hash of its key falls
under the rate. Properties that matter at 100 TB:

- deterministic per key: re-runs, retries, and backfills agree, and
  the sample is stable under repartitioning;
- no coordination: pure per-row expression, scan speed, no shuffle;
- nested rates compose: a 10% sample is a subset of a 50% sample of
  the same key space (threshold monotonicity), which makes
  down-sampling an existing mixture a filter, not a re-shuffle.

The hash is md5-based and engine-portable (same keep-set in DuckDB /
any engine with md5+substring), which is how the oracle checks it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: denominator of the hash threshold: first 8 md5 hex digits
_HASH_SPACE = 1 << 32


def uniform_hash_u32(key: Column, seed: str = "") -> Column:
    """Deterministic uniform value in [0, 2^32) from a key column.
    ``seed`` decorrelates independent samples over the same keys."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, rate: Column | float, seed: str = ""
) -> DataFrame:
    """Keep rows whose key hashes under ``rate`` (a float, or a Column
    for per-row/per-group rates — the mixture-construction case)."""
    rate_col = F.lit(rate) if isinstance(rate, (int, float)) else rate
    threshold = F.floor(rate_col * F.lit(float(_HASH_SPACE))).cast("long")
    return df.filter(uniform_hash_u32(F.col(key_col), seed) < threshold)


def weighted_sample_topk(
    df: DataFrame, key_col: str, weight_col: str, k: int, seed: str = "wrs"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-Res): each key draws u ~ Uniform(0,1) deterministically from its
    hash and enters an exponential race with key ``-ln(u) / w``; the k
    smallest race values win, giving P(selection) proportional to
    weight without replacement.

    Engine shape: one scan computes the race key per row, then a
    distributed top-k (per-partition heads, merged — never a global
    sort). Deterministic per key like :func:`hash_sample`: retries,
    backfills, and other engines agree on the selected set. Weights
    must be > 0; rows with NULL/non-positive weight are dropped.

    Cross-engine determinism caveat (accepted, unlike the integer-only
    hash_sample/hash_split): ``ln`` is a transcendental, so two
    engines' race values can differ in the last ulp (~1e-16 relative).
    The selected SET flips only if two keys' races are that close AND
    straddle rank k — expected minimum gap near the cutoff is ~1/n^2
    of the race range (~1e-8 even at n=1e5), eight orders of magnitude
    wider; verified hash-identical against DuckDB at sf0.001/0.01/0.1.
    Exact-integer A-Res does not exist (the race order has no
    monotone integer transform), so this residual risk is inherent to
    weighted sampling without replacement.
    """
    u = (
        uniform_hash_u32(F.col(key_col), seed).cast("double") + F.lit(0.5)
    ) / F.lit(float(_HASH_SPACE))
    race = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__race", race)
        .orderBy("__race", key_col)
        .limit(k)
        .drop("__race")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment by hash
    threshold: each key lands in exactly one named split, with the
    same guarantees as :func:`hash_sample` (reproducible across
    engines/retries/partitionings; no shuffle; a row never migrates
    between splits when OTHER splits' weights change only below it).

    ``splits`` maps name -> weight; weights are normalized, thresholds
    are cumulative in dict order, and the last split absorbs rounding
    remainder (every key is assigned).
    """
    total = float(sum(splits.values()))
    if total <= 0:
        raise ValueError("split weights must sum > 0")
    u = uniform_hash_u32(F.col(key_col), seed)
    names = list(splits)
    expr = F.lit(names[-1])  # remainder -> last split
    cum = 0.0
    bounds: list[tuple[str, int]] = []
    for name in names[:-1]:
        cum += splits[name] / total
        bounds.append((name, int(cum * _HASH_SPACE)))
    for name, bound in reversed(bounds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    nodes: DataFrame,
    near_dup_pairs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "gsplit",
    out_col: str = "split",
) -> DataFrame:
    """Group-aware train/val/test assignment: near-duplicate CLUSTERS
    (not documents) are the unit of splitting, so a document and its
    near-duplicates always land in the SAME split — the fix for the
    eval contamination q85_split_leakage measures (a per-document
    hash_split scatters verified near-dup pairs across splits, leaking
    train content into test).

    ``near_dup_pairs`` is any (id_a, id_b) edge set — LSH-verified
    near-dups, fuzzy-linkage matches, or a same-domain relation.
    Connected components labels every node with its cluster's minimum
    id (adaptive: driver union-find under the edge gate, distributed
    pointer-jumping above it — nodes never collected), then
    :func:`hash_split` assigns the CLUSTER label. Unpaired documents
    are singleton clusters and split independently, so the realized
    proportions converge to ``splits`` as long as clusters are small
    relative to the corpus.

    Returns (id_col, group_id, out_col). Deterministic per cluster:
    re-runs, engines, and partitionings agree; adding NEW documents
    can merge clusters (and thus move a cluster between splits) only
    when an edge connects them — the same stability contract as the
    underlying components.
    """
    from etl_guiacores_spark.operators.graph import connected_components

    labels = connected_components(
        nodes.select(id_col), near_dup_pairs, id_col=id_col
    )
    labeled = labels.select(
        F.col("id").alias(id_col), F.col("component").alias("group_id")
    )
    return hash_split(labeled, "group_id", splits, seed=seed, out_col=out_col)


def temporal_split(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    test_ppm: int = 200_000,
    tiebreak_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Per-entity TEMPORAL holdout: each entity's most recent
    ``test_ppm`` fraction of rows becomes ``test``, the rest
    ``train`` — the standard forecasting/recsys evaluation split,
    where a random split (hash_split) would leak the future into
    training.

    The cut is rank-based and integer-exact: with ``n`` rows for an
    entity, the newest ``ceil(n * test_ppm / 1e6)`` rows are test —
    expressed as ``(n - rank) * 1e6 < n * test_ppm`` over the
    (ts [, tiebreak]) ascending rank, so every entity gets at least
    one test row whenever ``test_ppm > 0`` and n > 0. Ranks come from
    an entity-partitioned window — parallel across entities, the
    sessionization memory bound per entity; ties on ts need
    ``tiebreak_col`` for a total order (same contract as EWMA).

    Returns the input plus (rank ascending from 1, n_rows, out_col).
    ``rank`` and ``n_rows`` are RESERVED output names: raises if the
    input already has either column (silently overwriting a caller's
    column of the same name would corrupt the result).
    """
    if not 0 <= test_ppm <= 1_000_000:
        raise ValueError("test_ppm must be in [0, 1e6]")
    clash = {"rank", "n_rows", out_col} & set(df.columns)
    if clash:
        raise ValueError(
            "temporal_split: input already has reserved output "
            f"column(s) {sorted(clash)}; rename them first"
        )
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    wn = Window.partitionBy(entity_col)
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("n_rows", F.count("*").over(wn).cast("long"))
        .withColumn(
            out_col,
            F.when(
                (F.col("n_rows") - F.col("rank")) * 1_000_000
                < F.col("n_rows") * test_ppm,
                F.lit("test"),
            ).otherwise(F.lit("train")),
        )
    )


def exact_quota_stratified(
    df: DataFrame,
    strata: Sequence[str],
    total: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Stratified sample hitting an EXACT total budget via
    largest-remainder (Hamilton) apportionment — the dataset-mixing
    primitive when the token/document budget is a hard contract
    ("exactly 10B documents, source shares preserved"): fractional
    rates (q73/q87) only hit a budget in expectation.

    Per stratum s: base_s = floor(total*c_s/N); the L = total -
    sum(base_s) leftover seats go to the L largest remainders
    (total*c_s mod N, ties broken by stratum key — a total order, so
    the apportionment is deterministic). All comparisons stay on the
    shared denominator N in DECIMAL(38,0) — no fractions, no floats.
    If total >= N every row is kept. Within each stratum the quota
    picks the (md5-hash, id)-smallest rows — reproducible across
    engines, retries, and repartitionings, and PREFIX-STABLE: a
    stratum's selection is always a prefix of its fixed hash order,
    so a budget change churns at most |quota delta| rows per stratum.
    (The quota itself is Hamilton-apportioned and therefore not
    monotone in ``total`` — the Alabama paradox — so a global
    only-adds guarantee is impossible without switching to a divisor
    method; prefix stability is the honest contract.)

    Scale shape: the apportionment runs entirely on the BOUNDED
    strata aggregate (grouping-key cardinality — the q82 contract);
    its single-partition window orders #strata rows, never data. The
    corpus itself sees one broadcast join of quotas and one
    per-stratum rank window (parallel across strata; Zipf-hot strata
    are AQE skew territory).

    Returns the selected rows of ``df`` unchanged.
    """
    if total < 0:
        raise ValueError("exact_quota_stratified: total must be >= 0")
    skeys = [F.col(c) for c in strata]
    counts = df.groupBy(*skeys).agg(F.count("*").cast("long").alias("__cs"))
    n_tot = counts.agg(F.sum("__cs").cast("long").alias("__nt"))
    q0 = (
        counts.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "__base",
            F.expr(
                f"CAST(CAST({total} AS DECIMAL(38,0)) * __cs div __nt "
                "AS BIGINT)"
            ),
        )
        .withColumn(
            "__md",
            F.expr(
                f"CAST(CAST({total} AS DECIMAL(38,0)) * __cs % __nt "
                "AS BIGINT)"
            ),
        )
    )
    leftover = q0.agg(
        (F.lit(total) - F.sum("__base")).cast("long").alias("__lv")
    )
    w = Window.orderBy(F.desc("__md"), *skeys)
    quota = (
        q0.withColumn("__rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            *skeys,
            F.when(F.col("__nt") <= F.lit(total), F.col("__cs"))
            .otherwise(
                F.col("__base")
                + F.when(
                    (F.col("__rk") <= F.col("__lv")) & (F.col("__md") > 0),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("__quota"),
        )
    )
    rw = Window.partitionBy(*skeys).orderBy(
        uniform_hash_u32(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(rw))
        .join(F.broadcast(quota), list(strata))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


#: cumulative Poisson(1) inverse-CDF thresholds on a 32-bit hash:
#: P(X<=k) * 2^32 for k = 0..4 (weight 5 beyond — P(X>=5) ~ 0.37%).
#: Frozen integers so Spark and any oracle draw IDENTICAL weights.
_POISSON1_T32 = (1580030169, 3160060337, 3950075422, 4213413783,
                 4279248374)


def poisson_bootstrap_weight(seed: str, *cols) -> "Column":
    """Deterministic Poisson(1) bootstrap weight for a row: an md5 of
    (seed, cols...) maps through the frozen inverse-CDF thresholds.

    The Poisson bootstrap is THE distributed bootstrap (each replicate
    re-weights every row independently with Poisson(1) counts —
    indistinguishable from multinomial resampling at scale), because
    it needs NO resampling shuffle: weights are computed map-side from
    the row's own key, so B replicates cost one pass with a
    map-side-combinable (group, b) aggregate, not B shuffles. Hash
    determinism is the q73/q87/q180 frozen-draw discipline: identical
    across engines, retries, and partitionings.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), *[c.cast("string") for c in cols])),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    w = F.lit(5)
    for k in range(len(_POISSON1_T32) - 1, -1, -1):
        w = F.when(h < F.lit(_POISSON1_T32[k]), F.lit(k)).otherwise(w)
    return w
