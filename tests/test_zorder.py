"""Z-order layout operator: key correctness vs a Python Morton
reference, and the disjoint-file-range guarantee of write_zordered
(the property that makes min-max stats prune both dimensions)."""

import random

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.ordering import write_zordered, zorder_key


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(1 << 20), rng.randrange(1 << 20)) for _ in range(200)]
    rows += [(0, 0), (65535, 65535), (65536, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_key(F.col("x"), F.col("y"))
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_ref(x & 0xFFFF, y & 0xFFFF), (x, y)


def test_zorder_key_is_bijective_on_16bit_pairs(spark):
    # distinct (x16, y16) pairs -> distinct keys (interleave loses nothing)
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    n = df.select(zorder_key(F.col("x"), F.col("y")).alias("z")).distinct().count()
    assert n == 4096


def test_write_zordered_disjoint_file_ranges(spark, tmp_path):
    rng = random.Random(11)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = str(tmp_path / "zordered")
    write_zordered(df, out, "x", "y", num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == 5000
    ranges = (
        back.withColumn("z", zorder_key(F.col("x"), F.col("y")))
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(ranges) > 1
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file z-ranges overlap: stats cannot prune"


class TestGlobalPrefixSum:
    def test_matches_window_semantics(self, spark):
        from etl_guiacores_spark.operators.ordering import global_prefix_sum

        df = spark.range(1, 301).select(
            F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
        )
        got = {
            r["k"]: (r["incl"], r["excl"])
            for r in global_prefix_sum(df, "k", "v", out_col="incl")
            .join(
                global_prefix_sum(df, "k", "v", out_col="excl", exclusive=True)
                .select("k", "excl"),
                "k",
            )
            .collect()
        }
        run = 0
        for k in range(1, 301):
            v = (k % 7) + 1
            assert got[k] == (run + v, run)
            run += v

    def test_no_single_partition_window(self, spark):
        from etl_guiacores_spark.operators.ordering import global_prefix_sum

        df = spark.range(1, 1001).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        plan = (
            global_prefix_sum(df, "k", "v")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        # every window must be keyed (__pid or one-row offsets), never
        # an unpartitioned window over the full data
        import re
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan.lower()):
            assert "__pid" in m.group(1) or "sortorder" not in m.group(1)

    def test_durable_checkpoint_pin_mode(self, spark, tmp_path):
        """pin='checkpoint' (the cluster mode: survives executor loss)
        must produce the same running totals as the local pin, and an
        unknown mode must be rejected."""
        import pytest

        from etl_guiacores_spark.operators.ordering import global_prefix_sum

        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        df = spark.range(1, 201).select(
            F.col("id").alias("k"), (F.col("id") % 5 + 1).alias("v")
        )
        durable = {
            r["k"]: r["running_total"]
            for r in global_prefix_sum(df, "k", "v", pin="checkpoint").collect()
        }
        local = {
            r["k"]: r["running_total"]
            for r in global_prefix_sum(df, "k", "v").collect()
        }
        assert durable == local
        with pytest.raises(ValueError, match="pin mode"):
            global_prefix_sum(df, "k", "v", pin="tachyon")


class TestTopkPerKey:
    """topk_per_key must equal the single-window per-key top-k exactly
    (any row in the global top-k is in its own salt group's top-k, so
    the two-stage pre-cut loses nothing) while keeping every window in
    the plan salted or bounded."""

    def _data(self, spark):
        # 4 keys x 500 rows with heavy score ties (score = id % 7) so
        # the id tiebreak is load-bearing, plus one tiny key
        rows = [(k, i, i % 7) for k in range(4) for i in range(500)]
        rows += [(9, 1, 5)]
        return spark.createDataFrame(rows, "key long, id long, score long")

    def test_equals_single_window(self, spark):
        from etl_guiacores_spark.operators.ordering import topk_per_key

        df = self._data(spark)
        got = sorted(
            (r["key"], r["rank"], r["id"], r["score"])
            for r in topk_per_key(
                df, ["key"],
                [F.col("score").desc(), F.col("id")],
                5, salt_expr=F.col("id"), salt_buckets=8,
            ).collect()
        )
        from pyspark.sql import Window

        w = Window.partitionBy("key").orderBy(F.col("score").desc(), "id")
        want = sorted(
            (r["key"], r["rank"], r["id"], r["score"])
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5).collect()
        )
        assert got == want
        # the tiny key (fewer rows than k) survives intact
        assert (9, 1, 1, 5) in got

    def test_salt_count_does_not_change_result(self, spark):
        from etl_guiacores_spark.operators.ordering import topk_per_key

        df = self._data(spark)
        outs = [
            sorted(
                tuple(r) for r in topk_per_key(
                    df, ["key"],
                    [F.col("score").desc(), F.col("id")],
                    3, salt_expr=F.col("id"), salt_buckets=b,
                ).collect()
            )
            for b in (2, 16, 64)
        ]
        assert outs[0] == outs[1] == outs[2]

    def test_every_window_in_plan_is_salted_or_final(self, spark):
        from etl_guiacores_spark.operators.ordering import topk_per_key

        df = self._data(spark)
        out = topk_per_key(
            df, ["key"], [F.col("score").desc(), F.col("id")],
            5, salt_expr=F.col("id"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__tk_salt" in plan  # the pre-cut stage really salts
        import sys
        sys.path.insert(0, "/root/repo")
        from tools.plan_audit import unpartitioned_window_in
        assert not unpartitioned_window_in(plan)

    def test_guards(self, spark):
        import pytest

        from etl_guiacores_spark.operators.ordering import topk_per_key

        df = self._data(spark)
        order = [F.col("score").desc(), F.col("id")]
        with pytest.raises(ValueError, match="k must be"):
            topk_per_key(df, ["key"], order, 0, salt_expr=F.col("id"))
        with pytest.raises(ValueError, match="salt_buckets"):
            topk_per_key(
                df, ["key"], order, 3, salt_expr=F.col("id"),
                salt_buckets=1,
            )
        clash = df.withColumn("__tk_salt", F.lit(1))
        with pytest.raises(ValueError, match="__tk_salt"):
            topk_per_key(clash, ["key"], order, 3, salt_expr=F.col("id"))
