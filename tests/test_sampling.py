"""Hash sampling: determinism, rate accuracy, nested-rate subsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.sampling import hash_sample


def test_deterministic_and_rate_accurate(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    s1 = sorted(r["k"] for r in hash_sample(df, "k", 0.25).collect())
    s2 = sorted(r["k"] for r in hash_sample(df, "k", 0.25).collect())
    assert s1 == s2  # re-run identical
    assert 0.22 < len(s1) / 10_000 < 0.28  # close to the rate
    # repartitioning must not change the keep-set
    s3 = sorted(
        r["k"] for r in hash_sample(df.repartition(13), "k", 0.25).collect()
    )
    assert s1 == s3


def test_nested_rates_are_subsets(spark):
    """Threshold monotonicity: a 10% sample is contained in a 50%
    sample — down-sampling an existing mixture is a filter."""
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    small = {r["k"] for r in hash_sample(df, "k", 0.1).collect()}
    big = {r["k"] for r in hash_sample(df, "k", 0.5).collect()}
    assert small <= big


def test_seed_decorrelates(spark):
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, "k", 0.5, seed="a").collect()}
    b = {r["k"] for r in hash_sample(df, "k", 0.5, seed="b").collect()}
    overlap = len(a & b) / max(1, len(a))
    assert 0.3 < overlap < 0.7  # independent-ish, not identical


def test_per_group_rate_column(spark):
    df = spark.range(0, 4_000).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("even")
    )
    rate = F.when(F.col("even"), F.lit(1.0)).otherwise(F.lit(0.0))
    got = hash_sample(df, "k", rate)
    rows = got.collect()
    assert len(rows) == 2_000 and all(r["even"] for r in rows)


class TestWeightedSampleTopk:
    def test_deterministic_and_size(self, spark):
        from etl_guiacores_spark.operators.sampling import weighted_sample_topk

        df = spark.range(1, 501).select(
            F.col("id").alias("k"), (F.col("id") % 10 + 1).alias("w")
        )
        a = {r["k"] for r in weighted_sample_topk(df, "k", "w", 50).collect()}
        b = {r["k"] for r in weighted_sample_topk(df, "k", "w", 50).collect()}
        assert a == b and len(a) == 50

    def test_weight_proportionality(self, spark):
        from etl_guiacores_spark.operators.sampling import weighted_sample_topk

        # two strata, weight 10 vs 1: the heavy stratum must dominate
        df = spark.range(1, 2001).select(
            F.col("id").alias("k"),
            F.when(F.col("id") <= 1000, 10).otherwise(1).alias("w"),
        )
        got = weighted_sample_topk(df, "k", "w", 200).collect()
        heavy = sum(1 for r in got if r["k"] <= 1000)
        assert heavy > 150  # E[heavy] ~ 183 of 200; far above parity

    def test_nonpositive_weights_dropped(self, spark):
        from etl_guiacores_spark.operators.sampling import weighted_sample_topk

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], ["k", "w"]
        )
        got = {r["k"] for r in weighted_sample_topk(df, "k", "w", 10).collect()}
        assert got == {1}


class TestExactQuotaStratified:
    @staticmethod
    def _df(spark):
        rows = (
            [(i, "a") for i in range(10)]
            + [(i, "b") for i in range(100, 107)]
            + [(i, "c") for i in range(200, 203)]
        )
        return spark.createDataFrame(rows, ["doc_id", "src"])

    def test_hamilton_apportionment_exact_total(self, spark):
        from etl_guiacores_spark.operators.sampling import (
            exact_quota_stratified,
        )

        got = exact_quota_stratified(
            self._df(spark), ["src"], total=7, key_col="doc_id"
        ).collect()
        assert len(got) == 7
        per = {}
        for r in got:
            per[r["src"]] = per.get(r["src"], 0) + 1
        # shares 10/20, 7/20, 3/20 of 7 -> base 3,2,1 (sum 6); largest
        # remainder: a=.5, b=.45, c=.05 -> extra seat to 'a'
        assert per == {"a": 4, "b": 2, "c": 1}

    def test_prefix_stability_per_stratum(self, spark):
        """A stratum's selection is always a PREFIX of its fixed hash
        order — the honest stability contract (Hamilton quotas are
        non-monotone in total, so set-inclusion across budgets is not
        guaranteed in general)."""
        from collections import defaultdict

        from etl_guiacores_spark.operators.sampling import (
            exact_quota_stratified,
        )

        def by_stratum(total):
            sel = defaultdict(set)
            for r in exact_quota_stratified(
                self._df(spark), ["src"], total=total, key_col="doc_id"
            ).collect():
                sel[r["src"]].add(r["doc_id"])
            return sel

        a, b = by_stratum(7), by_stratum(12)
        assert sum(len(v) for v in b.values()) == 12
        for src in set(a) | set(b):
            small, big = a.get(src, set()), b.get(src, set())
            # one is a subset of the other (both prefixes of one order)
            assert small <= big or big <= small

    def test_budget_at_or_above_n_keeps_all(self, spark):
        from etl_guiacores_spark.operators.sampling import (
            exact_quota_stratified,
        )

        assert (
            exact_quota_stratified(
                self._df(spark), ["src"], total=50, key_col="doc_id"
            ).count()
            == 20
        )


# --- Poisson bootstrap weights ---------------------------------------------------

def test_poisson_bootstrap_weight_distribution_and_determinism(spark):
    from pyspark.sql import functions as F

    from etl_guiacores_spark.operators.sampling import (
        poisson_bootstrap_weight,
    )

    df = spark.range(20000).select(F.col("id"))
    w = df.select(
        poisson_bootstrap_weight("t", F.col("id")).alias("w")
    )
    counts = {r["w"]: r["n"] for r in
              w.groupBy("w").agg(F.count("*").alias("n")).collect()}
    n = 20000
    # Poisson(1): P(0)=P(1)~.368, P(2)~.184 — allow generous slack
    assert abs(counts.get(0, 0) / n - 0.368) < 0.02
    assert abs(counts.get(1, 0) / n - 0.368) < 0.02
    assert abs(counts.get(2, 0) / n - 0.184) < 0.02
    assert set(counts) <= {0, 1, 2, 3, 4, 5}
    # mean ~ 1 (weights preserve total mass in expectation)
    total = sum(k * v for k, v in counts.items())
    assert abs(total / n - 1.0) < 0.02
    # frozen draw: same seed+key -> same weight across evaluations
    a = w.collect()
    b = df.select(poisson_bootstrap_weight("t", F.col("id")).alias("w")).collect()
    assert a == b
    # different seed -> different (but valid) draw
    c = {r["w"] for r in df.select(
        poisson_bootstrap_weight("u", F.col("id")).alias("w")).collect()}
    assert c <= {0, 1, 2, 3, 4, 5}
