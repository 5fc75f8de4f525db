"""DSIR importance weighting: ratio bounds, degenerate distributions,
target-ranking direction, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.importance import PPM, dsir_importance


def _docs(spark):
    rows = [
        (1, True, "alpha beta gamma alpha"),
        (2, True, "alpha beta beta"),
        (3, False, "delta epsilon zeta"),
        (4, False, "delta delta eta theta"),
        (5, False, "alpha delta"),  # mixed vocabulary
    ]
    return spark.createDataFrame(rows, "doc_id long, tgt boolean, text string")


def test_bounds_and_token_conservation(spark):
    d = _docs(spark)
    out = dsir_importance(d, F.col("tgt")).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3, 4, 5}
    for r in out:
        # each token's ratio is in (0, PPM]: (ct+1)//(cc+1) <= 1
        assert 0 < r["importance_ppm"] <= r["n_tok"] * PPM
    n_tok = {r["doc_id"]: r["n_tok"] for r in out}
    assert n_tok == {1: 4, 2: 3, 3: 3, 4: 4, 5: 2}


def test_all_target_is_exact_ppm(spark):
    """When every document is the target, ct == cc for every bucket, so
    each token contributes exactly PPM and importance == n_tok * PPM —
    pins the integer arithmetic (no smoothing drift)."""
    d = _docs(spark)
    out = dsir_importance(d, F.lit(True)).collect()
    for r in out:
        assert r["importance_ppm"] == r["n_tok"] * PPM


def test_target_docs_outrank_disjoint_nontarget(spark):
    """With disjoint vocabularies, every target document must outscore
    every pure non-target document — the selection direction DSIR
    exists for."""
    d = _docs(spark).filter(F.col("doc_id") != 5)  # drop the mixed doc
    out = {r["doc_id"]: r["importance_ppm"] / r["n_tok"]
           for r in dsir_importance(d, F.col("tgt")).collect()}
    assert min(out[1], out[2]) > max(out[3], out[4])


def test_partition_invariance(spark):
    d = _docs(spark)
    a = sorted(map(tuple, dsir_importance(d, F.col("tgt")).collect()))
    b = sorted(map(tuple, dsir_importance(d.repartition(7), F.col("tgt")).collect()))
    assert a == b


def test_empty_and_blank_text(spark):
    rows = [(1, True, "alpha"), (2, False, ""), (3, False, None)]
    d = spark.createDataFrame(rows, "doc_id long, tgt boolean, text string")
    out = dsir_importance(d, F.col("tgt")).collect()
    # blank/null docs have no tokens -> no output row (caller decides
    # their fate; the operator never divides by zero)
    assert {r["doc_id"] for r in out} == {1}


def test_null_target_predicate_counts_as_nontarget(spark):
    """NULL is_target (lang IS NULL) maps to non-target — the same
    CASE WHEN is_t THEN 1 ELSE 0 semantics the SQL oracle applies;
    without the coalesce an all-NULL bucket sums to NULL and its
    tokens silently vanish from importance_ppm."""
    rows = [(1, "en", "alpha beta"), (2, None, "gamma gamma"), (3, "fr", "alpha")]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in
           dsir_importance(d, F.col("lang") == "en").collect()}
    assert set(out) == {1, 2, 3}
    # doc 2's tokens live in an all-non-target bucket: ratio is
    # 1_000_000 // (cc + 1) = 1_000_000 // 3 per token, never NULL
    assert out[2]["importance_ppm"] == 2 * (1_000_000 // 3)


class TestDsirSelect:
    def test_selects_k_and_biases_toward_target(self, spark):
        from etl_guiacores_spark.operators.importance import dsir_select

        rows = (
            [(i, True, "alpha beta gamma delta") for i in range(20)]
            + [(100 + i, False, "omega psi chi phi") for i in range(20)]
        )
        d = spark.createDataFrame(rows, "doc_id long, tgt boolean, text string")
        out = dsir_select(d, F.col("tgt"), k=10).collect()
        assert len(out) == 10
        n_target_like = sum(1 for r in out if r["doc_id"] < 100)
        # target-vocabulary docs carry much higher importance weight,
        # so the weighted draw should strongly prefer them
        assert n_target_like >= 7, n_target_like

    def test_deterministic_selection(self, spark):
        from etl_guiacores_spark.operators.importance import dsir_select

        rows = [(i, i % 3 == 0, f"tok{i % 11} tok{i % 7} tok{i % 5}") for i in range(60)]
        d = spark.createDataFrame(rows, "doc_id long, tgt boolean, text string")
        a = sorted(r["doc_id"] for r in dsir_select(d, F.col("tgt"), k=15).collect())
        b = sorted(r["doc_id"] for r in dsir_select(d, F.col("tgt"), k=15).collect())
        assert a == b and len(a) == 15
