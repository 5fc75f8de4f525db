"""Evaluation / drift queries (round-7 continuation): exact AUC,
two-sample KS drift, per-class confusion metrics, Markov transitions,
Pareto frontier, Benford first-digit audit.

Same contract as the rest of the suite: each Spark program has a
DuckDB oracle over the identical parquet tables, every computed
column aliased identically, all ratios as truncating integer ppm, so
the driver's order-insensitive value-hash matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_guiacores_spark.queries import register
from etl_guiacores_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# q150: per-day exact ROC AUC (rank / Mann-Whitney identity)
# ---------------------------------------------------------------------------

@register(
    "q150_auc_roc",
    """
    WITH s AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(FLOOR(value * 1000000) AS BIGINT) AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ),
    by_score AS (
        SELECT day, score, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(pos) AS BIGINT) AS pos
        FROM s GROUP BY day, score
    ),
    r AS (
        SELECT day, cnt, pos,
               COALESCE(SUM(cnt) OVER (PARTITION BY day ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum
        FROM by_score
    )
    SELECT day,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
           CAST(1000000 * (SUM(CAST(pos AS HUGEINT) * (2 * cum + cnt + 1))
                           - CAST(SUM(pos) AS HUGEINT) * (SUM(pos) + 1))
                // NULLIF(2 * CAST(SUM(pos) AS HUGEINT)
                          * (SUM(cnt) - SUM(pos)), 0)
                AS BIGINT) AS auc_ppm
    FROM r GROUP BY day
    """,
    doc="Per-day exact ROC AUC of the event value score predicting "
    "the purchase class, via the rank (Mann-Whitney U) identity with "
    "tie-AVERAGE ranks carried as 2x-scaled integers — the daily "
    "'is the ranking signal decaying' eval-drift tracker. One "
    "map-side-combinable groupBy to (day, score) counts, one rank "
    "window over that bounded relation (parallel across days), "
    "DECIMAL(38,0)/HUGEINT interiors (2*R_pos reaches n^2), NULL on "
    "single-class days (operators/evalmetrics.auc_roc).",
)
def q150_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import auc_roc

    e = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("score"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    return auc_roc(e, ["day"], "score", "is_purchase")


# ---------------------------------------------------------------------------
# q151: two-sample Kolmogorov-Smirnov distribution drift
# ---------------------------------------------------------------------------

@register(
    "q151_ks_drift",
    """
    WITH s AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000) AS BIGINT) AS v,
               ts >= TIMESTAMP '2024-01-16 00:00:00' AS in_b
        FROM events
    ),
    by_val AS (
        SELECT event_type, v,
               CAST(SUM(CASE WHEN in_b THEN 0 ELSE 1 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM s GROUP BY event_type, v
    ),
    stepped AS (
        SELECT event_type,
               SUM(ca) OVER (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cuma,
               SUM(cb) OVER (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumb,
               SUM(ca) OVER (PARTITION BY event_type) AS na,
               SUM(cb) OVER (PARTITION BY event_type) AS nb
        FROM by_val
    )
    SELECT event_type,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(1000000 * MAX(ABS(CAST(cuma AS HUGEINT) * nb
                                  - CAST(cumb AS HUGEINT) * na))
                // NULLIF(CAST(MAX(na) AS HUGEINT) * MAX(nb), 0)
                AS BIGINT) AS d_ppm
    FROM stepped GROUP BY event_type
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic per event type, "
    "first half-month vs second — 'did the value distribution's "
    "SHAPE move', complementing CUSUM's mean-shift localization "
    "(q142). Exact: D evaluated at each distinct value with full "
    "tied counts (right-continuous ECDFs, no tiebreak needed), "
    "cross-multiplied to integer ppm with DECIMAL(38,0)/HUGEINT "
    "interiors (cum*n reaches n^2). One groupBy to (type, value) "
    "counts, cumulative windows over that bounded relation "
    "(operators/evalmetrics.ks_2samp).",
)
def q151_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import ks_2samp

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("v"),
        (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"))
        .alias("in_b"),
    )
    return ks_2samp(e, ["event_type"], "v", "in_b")


# ---------------------------------------------------------------------------
# q152: per-class confusion-matrix precision / recall / F1
# ---------------------------------------------------------------------------

def _conf_oracle() -> str:
    from etl_guiacores_spark.queries_corpus import _TOKS, _lang_pred_case

    return f"""
    WITH pred AS (
        SELECT source, lang AS gold, {_lang_pred_case()} AS predicted
        FROM (SELECT source, lang, text,
                     list_transform({_TOKS}, t -> lower(t)) AS toks
              FROM documents WHERE LENGTH(trim(text)) > 0)
    ),
    conf AS (
        SELECT source, gold, predicted, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY source, gold, predicted
    ),
    gold_m AS (SELECT source, gold AS class, CAST(SUM(n) AS BIGINT) AS ng
               FROM conf GROUP BY source, gold),
    pred_m AS (SELECT source, predicted AS class,
                      CAST(SUM(n) AS BIGINT) AS np
               FROM conf GROUP BY source, predicted),
    diag AS (SELECT source, gold AS class, n AS tp FROM conf
             WHERE gold = predicted),
    base AS (
        SELECT source, class,
               CAST(COALESCE(d.tp, 0) AS BIGINT) AS tp,
               CAST(COALESCE(p.np, 0) - COALESCE(d.tp, 0) AS BIGINT) AS fp,
               CAST(COALESCE(g.ng, 0) - COALESCE(d.tp, 0) AS BIGINT) AS fn
        FROM gold_m g
        FULL JOIN pred_m p USING (source, class)
        LEFT JOIN diag d USING (source, class)
    )
    SELECT source, class, tp, fp, fn,
           CAST(1000000 * tp // NULLIF(tp + fp, 0) AS BIGINT)
               AS precision_ppm,
           CAST(1000000 * tp // NULLIF(tp + fn, 0) AS BIGINT)
               AS recall_ppm,
           CAST(2000000 * tp // NULLIF(2 * tp + fp + fn, 0) AS BIGINT)
               AS f1_ppm
    FROM base
    """


@register(
    "q152_confusion_metrics",
    _conf_oracle(),
    doc="Per-(source, language) confusion-matrix breakdown of the "
    "q22 language-ID heuristic vs the gold label: tp/fp/fn plus "
    "exact ppm precision, recall, and F1 — the one-vs-rest view "
    "Cohen's kappa (q143) collapses to a single number. The class "
    "axis is the UNION of gold and predicted labels (full outer on "
    "the marginals), so hallucinated classes (fp only) and "
    "never-predicted classes (fn only) both get rows. One groupBy "
    "to the confusion table; everything downstream on bounded "
    "|sources| x |langs| relations "
    "(operators/evalmetrics.confusion_metrics).",
)
def q152_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import confusion_metrics
    from etl_guiacores_spark.operators.textstats import lang_id
    from etl_guiacores_spark.queries_corpus import _docs

    pred = _docs(spark, sf_dir).select(
        "source",
        F.col("lang").alias("gold"),
        lang_id(F.col("text")).alias("predicted"),
    )
    return confusion_metrics(pred, ["source"], "gold", "predicted")


# ---------------------------------------------------------------------------
# q153: first-order Markov transition matrix over event sequences
# ---------------------------------------------------------------------------

@register(
    "q153_transition_matrix",
    """
    WITH seq AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_state,
               event_type AS next_state
        FROM events
    ),
    counts AS (
        SELECT prev_state, next_state, CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_state IS NOT NULL
        GROUP BY prev_state, next_state
    )
    SELECT prev_state, next_state, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY prev_state) AS BIGINT)
               AS n_from,
           CAST(1000000 * n_trans
                // SUM(n_trans) OVER (PARTITION BY prev_state)
                AS BIGINT) AS p_ppm
    FROM counts
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences ((ts, event_id) total order): (prev -> next) counts "
    "and exact row-stochastic ppm probabilities — next-action "
    "baseline, funnel-leak detection, synthetic-sequence seed. "
    "Per-user LAG windows (parallel across users), one groupBy to "
    "the bounded |states|^2 matrix; row sums <= 1e6 by construction "
    "with truncation residue (operators/evalmetrics."
    "transition_matrix).",
)
def q153_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import transition_matrix

    e = _t(spark, sf_dir, "events")
    return transition_matrix(
        e, ["user_id"], "event_type", ["ts", "event_id"]
    )


# ---------------------------------------------------------------------------
# q154: per-brand Pareto frontier (price minimized, size maximized)
# ---------------------------------------------------------------------------

@register(
    "q154_pareto_frontier",
    """
    WITH p AS (
        SELECT p_partkey, p_brand, p_size,
               CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
    ),
    flagged AS (
        SELECT p_partkey, p_brand, p_size, price_cents,
               COALESCE(MAX(p_size) OVER (PARTITION BY p_brand
                   ORDER BY price_cents RANGE BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) >= p_size, FALSE)
               OR MAX(p_size) OVER (PARTITION BY p_brand
                   ORDER BY price_cents RANGE BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) > p_size AS dom
        FROM p
    )
    SELECT p_partkey, p_brand, p_size, price_cents
    FROM flagged WHERE NOT dom
    """,
    doc="Per-brand 2-D Pareto frontier (skyline) of parts: minimize "
    "price, maximize size — no other part in the brand is at least "
    "as cheap AND at least as large with one strict. Computed as "
    "ONE partition-sort with two RANGE-frame running maxima "
    "(strictly-cheaper and at-most-as-cheap best sizes), not the "
    "naive all-pairs dominance join; exact duplicates are mutually "
    "non-dominating and all kept, so no tiebreak is needed "
    "(operators/evalmetrics.pareto_frontier).",
)
def q154_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import pareto_frontier

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.floor(F.col("p_retailprice") * 100).cast("long")
        .alias("price_cents"),
    )
    return pareto_frontier(p, ["p_brand"], "price_cents", "p_size")


# ---------------------------------------------------------------------------
# q155: Benford first-digit audit
# ---------------------------------------------------------------------------

def _benford_case() -> str:
    from etl_guiacores_spark.operators.evalmetrics import BENFORD_PPM

    arms = " ".join(
        f"WHEN {d} THEN {ppm}" for d, ppm in BENFORD_PPM.items()
    )
    return f"CASE digit {arms} END"


@register(
    "q155_benford_digits",
    f"""
    WITH d AS (
        SELECT o_orderpriority,
               CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT o_orderpriority, digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY o_orderpriority, digit
    )
    SELECT o_orderpriority, digit, n,
           CAST(1000000 * n
                // SUM(n) OVER (PARTITION BY o_orderpriority)
                AS BIGINT) AS obs_ppm,
           CAST({_benford_case()} AS BIGINT) AS benford_ppm,
           CAST(1000000 * n
                // SUM(n) OVER (PARTITION BY o_orderpriority)
                - {_benford_case()} AS BIGINT) AS dev_ppm
    FROM counts
    """,
    doc="Benford first-significant-digit distribution of order "
    "totals per priority class, vs the exact-integer expected table "
    "(rounded log10(1+1/d)*1e6, summing to exactly 1e6) — the "
    "fabricated-data / synthetic-contamination audit for financial "
    "and telemetry columns. First digit via the decimal STRING of "
    "floor(value) (no log10 floats near power-of-ten boundaries); "
    "one map-side-combinable groupBy, window totals over <= 9 rows "
    "per group (operators/evalmetrics.benford_profile).",
)
def q155_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import benford_profile

    o = _t(spark, sf_dir, "orders")
    return benford_profile(o, ["o_orderpriority"], "o_totalprice")


# ---------------------------------------------------------------------------
# q156: reciprocal-rank fusion of cosine and L2 retriever rankings
# ---------------------------------------------------------------------------

@register(
    "q156_rrf_fusion",
    """
    WITH cos AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                       ROUND(
                         list_sum(list_transform(range(1, LEN(q.embedding) + 1),
                             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                         / (SQRT(list_sum(list_transform(range(1, LEN(q.embedding) + 1),
                             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
                          * SQRT(list_sum(list_transform(range(1, LEN(e.embedding) + 1),
                             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
                       , 6) DESC, e.vec_id) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id < 5
        ) WHERE rank <= 10
    ),
    l2 AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                       ROUND(
                         list_sum(list_transform(range(1, LEN(q.embedding) + 1),
                             i -> (CAST(q.embedding[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))
                                  * (CAST(q.embedding[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))))
                       , 6) ASC, e.vec_id) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id < 5
        ) WHERE rank <= 10
    ),
    fused AS (
        SELECT query_id, neighbor_id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_systems,
               CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm
        FROM (SELECT * FROM cos UNION ALL SELECT * FROM l2)
        GROUP BY query_id, neighbor_id
    )
    SELECT query_id, doc_id, n_systems, rrf_ppm, fused_rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rrf_ppm DESC, doc_id) AS BIGINT)
                      AS fused_rank
        FROM fused
    ) WHERE fused_rank <= 5
    """,
    doc="Reciprocal-rank fusion (Cormack et al.) of two retrievers' "
    "top-10 lists — cosine and (negative) L2 over the embedding "
    "table — into one hybrid top-5: rrf_ppm = sum PPM div (60 + "
    "rank), exact truncated integers, fused order pinned by "
    "(score DESC, doc_id). The calibration-free way to combine a "
    "lexical and a vector retriever; candidate tuples are top-k per "
    "system per query, never corpus-sized "
    "(operators/retrieval.rrf_fuse).",
)
def q156_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.retrieval import rrf_fuse
    from etl_guiacores_spark.operators.similarity import dot, knn_brute_force

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    cos = knn_brute_force(e, q, k=10).select(
        "query_id", "neighbor_id", "rank"
    )
    qb = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    diff_sq = F.aggregate(
        F.zip_with(
            F.col("__qv"),
            F.col("embedding"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from etl_guiacores_spark.operators.ordering import topk_per_key

    scored_l2 = (
        e.crossJoin(F.broadcast(qb))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(diff_sq, 6).alias("__dist"),
        )
    )
    # two-stage salted top-k, like knn_brute_force's cosine leg: the
    # L2 leg scores the whole corpus per query too
    l2 = topk_per_key(
        scored_l2,
        ["query_id"],
        [F.col("__dist"), F.col("neighbor_id")],
        10,
        salt_expr=F.col("neighbor_id"),
    ).select("query_id", "neighbor_id", "rank")
    return rrf_fuse(cos.unionByName(l2), top_k=5)


# ---------------------------------------------------------------------------
# q157: per-day decile lift of the value score predicting purchases
# ---------------------------------------------------------------------------

@register(
    "q157_decile_lift",
    """
    WITH s AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(FLOOR(value * 1000000) AS BIGINT) AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
               event_id
        FROM events
    ),
    tiled AS (
        SELECT day, pos,
               NTILE(10) OVER (PARTITION BY day
                   ORDER BY score DESC, event_id) AS bucket
        FROM s
    ),
    per_bucket AS (
        SELECT day, bucket, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS n_pos
        FROM tiled GROUP BY day, bucket
    )
    SELECT day, bucket, n, n_pos,
           CAST(1000000 * n_pos // n AS BIGINT) AS rate_ppm,
           CAST(1000000
                * CAST(SUM(n_pos) OVER (PARTITION BY day ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS HUGEINT)
                * SUM(n) OVER (PARTITION BY day)
                // NULLIF(CAST(SUM(n) OVER (PARTITION BY day ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS HUGEINT)
                      * SUM(n_pos) OVER (PARTITION BY day), 0)
                AS BIGINT) AS cum_lift_ppm
    FROM per_bucket
    """,
    doc="Per-day decile lift table of the event value score "
    "predicting the purchase class — AUC's operational cousin "
    "(q150 says the ranking works; this says WHERE to cut it): "
    "NTILE(10) over the (score DESC, event_id) total order, "
    "per-bucket positive rate and cumulative lift vs the day's base "
    "rate in exact ppm (DECIMAL(38,0)/HUGEINT interiors — cum_pos * "
    "tot_n reaches n^2). One per-day NTILE window, then cumulative "
    "windows over the bounded 10-rows-per-day relation "
    "(operators/evalmetrics.decile_lift).",
)
def q157_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import decile_lift

    e = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("score"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
        "event_id",
    )
    return decile_lift(
        e, ["day"], "score", "is_purchase", "event_id", n_buckets=10
    )


# ---------------------------------------------------------------------------
# q158: pairwise vocabulary Jaccard overlap between sources
# ---------------------------------------------------------------------------

@register(
    "q158_vocab_jaccard",
    """
    WITH vocab AS (
        SELECT DISTINCT source AS g, unnest(
            string_split_regex(trim(lower(text)),
                               '[ \\t\\n\\r\\f\\v]+')) AS tok
        FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vs
              FROM vocab GROUP BY g),
    inter AS (
        SELECT a.g AS group_a, b.g AS group_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM vocab a JOIN vocab b
          ON a.tok = b.tok AND a.g < b.g
        GROUP BY a.g, b.g
    )
    SELECT group_a, group_b,
           sa.vs AS vocab_a, sb.vs AS vocab_b, inter,
           CAST(1000000 * inter // (sa.vs + sb.vs - inter) AS BIGINT)
               AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON sa.g = group_a
    JOIN sizes sb ON sb.g = group_b
    """,
    doc="Pairwise vocabulary Jaccard overlap between sources over "
    "distinct lowercased token sets — 'is the new source adding "
    "vocabulary or repeating what we have', the corpus-comparison "
    "companion to the per-document near-dup legs. ONE corpus pass: "
    "per-token sorted group sets (collect_set partial-aggregates "
    "map-side, so Zipf-hot tokens shuffle <= |sources| values per "
    "map partition), then each token's group pairs and singletons "
    "aggregate into a C(|sources|,2)+|sources|-bounded stats table "
    "that every downstream relation reads "
    "(operators/textstats.vocab_overlap).",
)
def q158_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.textstats import vocab_overlap
    from etl_guiacores_spark.queries_corpus import _docs

    return vocab_overlap(_docs(spark, sf_dir), "source", "text")


# ---------------------------------------------------------------------------
# q159: token-mass weighted median document size per source
# ---------------------------------------------------------------------------

@register(
    "q159_weighted_median",
    """
    WITH d AS (
        SELECT source, n_chars,
               CAST(LEN(string_split_regex(trim(text),
                        '[ \\t\\n\\r\\f\\v]+')) AS BIGINT) AS w
        FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    by_val AS (
        SELECT source, n_chars, CAST(SUM(w) AS BIGINT) AS w
        FROM d GROUP BY source, n_chars
    ),
    st AS (
        SELECT source, n_chars,
               SUM(w) OVER (PARTITION BY source ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(w) OVER (PARTITION BY source) AS tot
        FROM by_val
    )
    SELECT source, CAST(MAX(tot) AS BIGINT) AS total_weight,
           CAST(MIN(n_chars) AS BIGINT) AS wmedian
    FROM st WHERE 2 * cum >= tot GROUP BY source
    """,
    doc="Lower weighted median of document size per source, weighted "
    "by token count — 'the document size below which half the "
    "source's TOKEN MASS lives', the right centering statistic for "
    "packing and shard sizing (long docs matter by their mass, not "
    "their count; the unweighted median undercounts them). Exact, "
    "no interpolation: smallest v with 2*cumweight(<=v) >= total. "
    "One groupBy to (source, size) weight sums, cumulative window "
    "over that bounded distinct-value relation "
    "(operators/robust.weighted_median).",
)
def q159_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.robust import weighted_median
    from etl_guiacores_spark.operators.textstats import tokens
    from etl_guiacores_spark.queries_corpus import _docs

    d = _docs(spark, sf_dir).select(
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("w"),
    )
    return weighted_median(d, ["source"], "n_chars", "w")


# ---------------------------------------------------------------------------
# q160: market-basket association rules over user event types
# ---------------------------------------------------------------------------

@register(
    "q160_assoc_rules",
    """
    WITH items AS (
        SELECT DISTINCT user_id AS b, event_type AS i FROM events
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets
           FROM items),
    marg AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni
             FROM items GROUP BY i),
    pairs AS (
        SELECT a.i AS antecedent, b2.i AS consequent,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM items a JOIN items b2
          ON a.b = b2.b AND a.i <> b2.i
        GROUP BY a.i, b2.i
    )
    SELECT antecedent, consequent, n_both,
           ma.ni AS n_antecedent, mc.ni AS n_consequent,
           CAST(1000000 * n_both // n_baskets AS BIGINT) AS support_ppm,
           CAST(1000000 * n_both // ma.ni AS BIGINT) AS confidence_ppm,
           CAST(1000000 * CAST(n_both AS HUGEINT) * n_baskets
                // (CAST(ma.ni AS HUGEINT) * mc.ni) AS BIGINT)
               AS lift_ppm
    FROM pairs
    JOIN marg ma ON ma.i = antecedent
    JOIN marg mc ON mc.i = consequent
    CROSS JOIN nb
    """,
    doc="Association rules over per-user event-type baskets: "
    "support / confidence / lift for every ordered pair in exact "
    "ppm (lift > 1e6 = positive association) — the market-basket "
    "view of behavioral coupling, complementing the transition "
    "matrix's SEQUENTIAL coupling (q153). Presence semantics (one "
    "distinct on (user, type) first); basket self-join fan-out "
    "bounded by |types|^2 per basket; the 1-row basket-count scalar "
    "rides the plan as a broadcast (the q46/q58 shape); lift "
    "interiors DECIMAL(38,0)/HUGEINT "
    "(operators/evalmetrics.assoc_rules).",
)
def q160_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import assoc_rules

    return assoc_rules(_t(spark, sf_dir, "events"), "user_id", "event_type")


# ---------------------------------------------------------------------------
# q161: most common session-opening paths
# ---------------------------------------------------------------------------

@register(
    "q161_top_paths",
    """
    WITH r AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 5 GROUP BY user_id
    ),
    c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_chains
          FROM p GROUP BY path)
    SELECT path, n_chains, path_rank FROM (
        SELECT path, n_chains,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chains DESC, path)
                    AS BIGINT) AS path_rank
        FROM c
    ) WHERE path_rank <= 20
    """,
    doc="Top-20 session-opening paths: each user's first 5 event "
    "types joined into an 'a>b>c' path, counted, ranked by "
    "(count DESC, path) — the funnel-DISCOVERY aggregation "
    "(funnel_steps checks a known sequence; this surfaces the "
    "candidates). Per-chain rank window, per-chain fold via "
    "array_sort(collect_list(struct(rank, state))) — sorted AFTER "
    "collection so the fold is deterministic regardless of "
    "partitioning (bare collect_list order is not) — then counts "
    "and one global sort of the bounded |distinct prefixes| "
    "relation (operators/evalmetrics.top_paths).",
)
def q161_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.evalmetrics import top_paths

    return top_paths(
        _t(spark, sf_dir, "events"),
        ["user_id"],
        "event_type",
        ["ts", "event_id"],
        prefix_len=5,
        top_k=20,
    )


# ---------------------------------------------------------------------------
# q163: golden-record survivorship merge (post-ER master data)
# ---------------------------------------------------------------------------

@register(
    "q163_golden_record",
    """
    WITH by_val AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id, event_type
    ),
    mode AS (
        SELECT user_id, event_type AS top_value, n AS top_value_n
        FROM (
            SELECT user_id, event_type, n,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY n DESC, event_type ASC) AS rn
            FROM by_val
        ) WHERE rn = 1
    ),
    prov AS (
        SELECT user_id,
               arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000000
                              + event_id)
                   FILTER (WHERE value IS NOT NULL) AS latest_value,
               STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
               STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
               CAST(COUNT(*) AS BIGINT) AS n_records
        FROM events GROUP BY user_id
    )
    SELECT p.user_id, m.top_value, m.top_value_n, p.latest_value,
           p.first_seen, p.last_seen, p.n_records
    FROM prov p LEFT JOIN mode m ON m.user_id = p.user_id
    """,
    doc="Golden-record survivorship merge per user: MODE rule for the "
    "characteristic action (most frequent event type, ties broken "
    "lexicographically — deterministic, never partition-order), "
    "RECENCY rule for the live metric (last non-null value under the "
    "(ts, event_id) total order via max_by..FILTER), plus "
    "first/last-seen provenance — the post-entity-resolution step "
    "that turns observation clusters into one master record, "
    "generalizing the reference's keep-first keyed dedupe "
    "(src/common/utils.py:48-62) to explicit field-level rules. "
    "Engine shape: mode = map-side-combinable groupBy to (entity, "
    "value) counts + a rank window over that BOUNDED relation; "
    "recency/provenance = one aggregate pass; one equi-join stitches "
    "— two shuffles total on one key regardless of field count. "
    "latest_value is a SELECTED raw double (never arithmetic), the "
    "q139 exactness convention; the oracle linearizes the struct "
    "order as a HUGEINT epoch_us*1e10+event_id key, order-identical "
    "while event_id < 1e10 (operators/linkage.golden_record).",
)
def q163_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.linkage import golden_record

    g = golden_record(
        _t(spark, sf_dir, "events"),
        entity_col="user_id", mode_col="event_type",
        value_col="value", ts_col="ts", order_col="event_id",
    )
    return g.select(
        "user_id", "top_value", "top_value_n", "latest_value",
        F.date_format("first_seen", "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        "n_records",
    )


# ---------------------------------------------------------------------------
# q164: k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

@register(
    "q164_kanonymity",
    """
    SELECT lang, source, n_chars // 100 AS chars_bin,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) < 5 AS violates
    FROM documents
    GROUP BY lang, source, n_chars // 100
    """,
    doc="k-anonymity audit (Sweeney 2002) of the corpus release: "
    "equivalence classes over the quasi-identifier combination "
    "(lang, source, 100-char size bucket) with class sizes and a "
    "violation flag for classes smaller than k=5 — the "
    "re-identification-risk report a data release review reads, "
    "generalizing the reference's direct-identifier scrub "
    "(src/etl/transformers.py social/phone cleanup) to indirect "
    "identifiers. One map-side-combinable groupBy; the companion "
    "suppress_below_k enforcement pass (nulls quasi columns in "
    "violating classes, null-safe on the class key) is "
    "pytest-covered (operators/privacy.k_anonymity_audit).",
)
def q164_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.privacy import k_anonymity_audit

    d = _t(spark, sf_dir, "documents").withColumn(
        "chars_bin", F.expr("n_chars div 100")
    )
    return k_anonymity_audit(d, ["lang", "source", "chars_bin"], k=5)


# ---------------------------------------------------------------------------
# q165: interval union — per-user activity coverage (overlap counted once)
# ---------------------------------------------------------------------------

@register(
    "q165_interval_union",
    """
    WITH iv AS (
        SELECT user_id,
               epoch_us(ts) AS s,
               epoch_us(ts)
                   + (CAST(FLOOR(value * 60) AS BIGINT) + 1) * 1000000 AS e
        FROM events
    ),
    f AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS nw
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM f
    ),
    g AS (
        SELECT user_id, island, MIN(s) AS i_s, MAX(e) AS i_e,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(n) AS BIGINT)          AS n_intervals,
           CAST(COUNT(*) AS BIGINT)        AS n_islands,
           CAST(SUM(i_e - i_s) AS BIGINT)  AS covered,
           CAST(MAX(i_e - i_s) AS BIGINT)  AS max_island
    FROM g GROUP BY user_id
    """,
    doc="Interval-union coverage per user: each event opens an "
    "activity span [ts, ts + (floor(value*60)+1)s]; overlapping and "
    "touching spans coalesce into islands via the classical sweep "
    "(running MAX(end) over preceding rows flags island starts, a "
    "running SUM of flags numbers them), and the report is per-user "
    "interval count, island count, UNION length (overlap counted "
    "once — the number naive SUM(duration) gets wrong), and longest "
    "contiguous extent. The primitive behind session coverage, "
    "crawler lease accounting, and span-dedupe bookkeeping; the "
    "substring-level twin already runs inside repeated_spans. Engine "
    "shape: both windows and both rollups share ONE exchange on "
    "user_id — the interval list never moves twice; integer epoch- "
    "microsecond arithmetic end to end "
    "(operators/intervals.interval_coverage).",
)
def q165_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.intervals import interval_coverage

    iv = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.floor(F.col("value") * 60).cast("long") + 1) * 1_000_000
        ).alias("e"),
    )
    return interval_coverage(iv, ["user_id"], "s", "e")


# ---------------------------------------------------------------------------
# q166: distinct l-diversity audit (homogeneity-attack check)
# ---------------------------------------------------------------------------

@register(
    "q166_l_diversity",
    """
    SELECT lang, n_chars // 200 AS chars_bin,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT source) < 3 AS violates
    FROM documents
    GROUP BY lang, n_chars // 200
    """,
    doc="Distinct l-diversity audit (Machanavajjhala 2007), the "
    "companion to q164's k-anonymity: a quasi-identifier class can "
    "be large enough to hide IN but still leak the sensitive "
    "attribute if every member shares it (homogeneity attack). Here "
    "the quasi combination is (lang, 200-char size bucket), the "
    "sensitive attribute is the crawl source, l=3: every class must "
    "span >=3 distinct sources. One map-side-combinable groupBy "
    "with an exact two-phase COUNT(DISTINCT) — the class table is "
    "bounded by combo cardinality, never row count "
    "(operators/privacy.l_diversity_audit).",
)
def q166_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.privacy import l_diversity_audit

    d = _t(spark, sf_dir, "documents").withColumn(
        "chars_bin", F.expr("n_chars div 200")
    )
    return l_diversity_audit(d, ["lang", "chars_bin"], "source", 3)


# ---------------------------------------------------------------------------
# q167: column profile — null/cardinality/mergeable content checksum
# ---------------------------------------------------------------------------

@register(
    "q167_column_profile",
    """
    WITH vals AS (
        SELECT 'o_orderkey' AS col_name,
               CAST(o_orderkey AS VARCHAR) AS val FROM orders
        UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
        FROM orders
        UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL SELECT 'o_totalprice',
               CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR)
        FROM orders
        UNION ALL SELECT 'o_orderdate',
               STRFTIME(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders
    )
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           CAST(SUM(COALESCE(CAST(('0x' || substr(md5(val), 1, 15))
                                  AS BIGINT), 0))
                % 2305843009213693951 AS BIGINT) AS checksum
    FROM vals GROUP BY col_name
    """,
    doc="Per-column profile of the orders table: row/null counts, "
    "exact distinct cardinality, and an ORDER-INSENSITIVE mergeable "
    "content checksum (sum of 60-bit md5 prefixes mod the Mersenne "
    "prime 2^61-1, DECIMAL(38,0) interiors) — the stage-boundary "
    "'is this still the same table' fingerprint that catches a "
    "silent backfill or codec bug row counts cannot. Values hash "
    "through engine-independent STRING renderings (ints as decimal "
    "strings, the price through a fixed-point cents floor, the date "
    "through one format), never raw binary. The checksum of a union "
    "is the modular sum of parts, so 1000 executors profile 100 TB "
    "with one tiny final reduce and an incremental loader updates a "
    "stored profile without rescanning history "
    "(operators/profiling.column_profile).",
)
def q167_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_guiacores_spark.operators.profiling import column_profile

    o = _t(spark, sf_dir, "orders")
    return column_profile(
        o,
        {
            "o_orderkey": F.col("o_orderkey").cast("string"),
            "o_custkey": F.col("o_custkey").cast("string"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_orderpriority": F.col("o_orderpriority"),
            "o_totalprice": F.floor(F.col("o_totalprice") * 100)
            .cast("long")
            .cast("string"),
            "o_orderdate": F.date_format(
                "o_orderdate", "yyyy-MM-dd HH:mm:ss"
            ),
        },
    )
