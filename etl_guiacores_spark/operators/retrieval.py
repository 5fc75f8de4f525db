"""BM25 ranked retrieval over a tokenized corpus.

The missing retrieval primitive between TF-IDF vectors
(operators/chunking.tfidf_vectors) and embedding kNN
(operators/similarity): score documents against a SHORT query term
list with Okapi BM25 and return the top-k — the lexical leg of every
retrieval-augmented pipeline and the standard hard-negative miner for
training retrievers.

Exactness discipline (the q58/q104/q112 lesson): published BM25 is

    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))
    idf(t)      = ln((N - df + 0.5) / (df + 0.5))

``ln`` is a transcendental (not IEEE-exact across engines) and a float
sum is order-dependent, so the oracle-parity path computes the same
monotone-per-term structure in exact BIGINT arithmetic:

- idf as the Robertson-Sparck-Jones ODDS RATIO in parts-per-million
  (the argument of the ln, which is monotone in it):
  ``idf_ppm = (2*(N - df) + 1) * PPM div (2*df + 1)``
- the tf saturation with k1 = 6/5 and b = 3/4 (the standard defaults)
  as an exact rational, after normalizing document length against
  ``avgdl_micro = total_tokens * PPM div N``:
  ``ratio_ppm = dl * PPM * PPM div avgdl_micro``
  ``tfc_ppm   = 44*PPM*tf*PPM div (20*PPM*tf + 6*PPM + 18*ratio_ppm)``
  (derivation: multiply numerator and denominator of the saturation
  by 20*PPM; 44 = 20*(k1+1), 6*PPM = 20*PPM*k1*(1-b),
  18 = 20*k1*b)
- per-term contribution ``idf_ppm * tfc_ppm div PPM`` and an exact
  BIGINT sum.

Dropping the ln changes absolute scores but each term's contribution
stays monotone in (rarity, tf), and single-term rankings are
IDENTICAL; production swaps in ``F.log`` idf with the same plan shape
when cross-engine bit-equality is not required. BIGINT bounds: the
largest intermediate is ``44*PPM*tf*PPM`` (~4.4e13 * tf), safe to
tf ~ 2e5; idf_ppm * tfc_ppm needs ``(2N+1)*PPM * PPM`` headroom — at
N beyond ~4e6 docs move the contribution product to DECIMAL(38,0)
(one cast, same plan).

Scale shape (100 TB): the posting explode filters to the query's
terms BEFORE any shuffle, so shuffle volume is bounded by
|matching docs| x |query terms| integer rows — text never moves. The
per-term df table (<= |query terms| rows) and the 1-row corpus stats
broadcast. Top-k is a distributed TakeOrderedAndProject (per-partition
heads, merged on the driver; never a global sort).

Reference parity: the reference engine has no ranked retrieval; this
extends the training-data surface (SURVEY.md extension ops) alongside
dedup/decontamination/DSIR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_guiacores_spark.operators.textstats import tokens

PPM = 1_000_000


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document containing >= 1 query term.

    Returns (id_col, score_ppm BIGINT, n_hit_terms BIGINT); documents
    sharing no term with the query are absent (their score is 0).
    k1 = 6/5 and b = 3/4 are fixed exact rationals — see module doc.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")

    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__dl", F.size("__toks").cast("long"))

    # 1-row corpus stats, broadcast back in-plan (the q58/q94 shape)
    stats = base.agg(
        F.count("*").cast("long").alias("__n"),
        F.expr(f"CAST(sum(__dl) * {PPM} div count(*) AS BIGINT)").alias(
            "__avgdl_micro"
        ),
    )

    # postings restricted to the query's terms BEFORE any aggregation:
    # shuffle rows are bounded by |docs with a hit| x |query terms|
    posts = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__tok"))
        .filter(F.col("__tok").isin(list(query_terms)))
    )
    tf = posts.groupBy(id_col, "__tok", "__dl").agg(
        F.count("*").cast("long").alias("__tf")
    )

    # per-term document frequency: <= |query_terms| rows, broadcast
    dfreq = tf.groupBy("__tok").agg(F.count("*").cast("long").alias("__df"))

    scored = (
        tf.join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf_ppm",
            F.expr(f"CAST((2*(__n - __df) + 1) * {PPM} div (2*__df + 1) AS BIGINT)"),
        )
        .withColumn(
            "__ratio_ppm",
            F.expr(f"CAST(__dl * {PPM} * {PPM} div __avgdl_micro AS BIGINT)"),
        )
        .withColumn(
            "__tfc_ppm",
            F.expr(
                f"CAST(44 * {PPM} * __tf * {PPM} div "
                f"(20 * {PPM} * __tf + 6 * {PPM} + 18 * __ratio_ppm) AS BIGINT)"
            ),
        )
        .withColumn(
            "__contrib", F.expr(f"CAST(__idf_ppm * __tfc_ppm div {PPM} AS BIGINT)")
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__contrib").cast("long").alias("score_ppm"),
        F.count("*").cast("long").alias("n_hit_terms"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score, ties broken by id (ascending) so
    the cut is total-ordered and engine-reproducible. Distributed
    top-k (TakeOrderedAndProject), never a global sort."""
    scores = bm25_scores(docs, query_terms, id_col=id_col, text_col=text_col)
    return scores.orderBy(F.desc("score_ppm"), F.col(id_col)).limit(k)
