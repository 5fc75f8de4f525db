"""Decontamination / PII / repetition operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_guiacores_spark.operators.decontam import (
    contaminated_doc_ids,
    redact_pii,
    repetition_score,
)


class TestDecontamination:
    def test_flags_overlapping_docs_only(self, spark):
        bench = spark.createDataFrame(
            [(100, "the secret benchmark question about spark engines")],
            ["doc_id", "text"],
        )
        docs = spark.createDataFrame(
            [
                (1, "totally unrelated content here with no overlap at all"),
                (2, "leaked copy of the secret benchmark question about spark"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["n_overlapping_ngrams"]
               for r in contaminated_doc_ids(docs, bench).collect()}
        assert 2 in got and got[2] >= 3
        assert 1 not in got


class TestPiiRedaction:
    def test_redacts_each_kind(self, spark):
        vals = [
            "mail me at a.b+c@foo.com.ar thanks",
            "call +54 299 471-2345 today",
            "order 12345678 shipped",
            "clean text stays",
        ]
        df = spark.createDataFrame([(v,) for v in vals], ["t"])
        got = [r[0] for r in df.select(redact_pii(F.col("t"))).collect()]
        assert got[0] == "mail me at [EMAIL] thanks"
        assert got[1] == "call [PHONE] today"
        assert got[2] == "order [NUM] shipped"
        assert got[3] == "clean text stays"


class TestRepetition:
    def test_scores(self, spark):
        df = spark.createDataFrame(
            [("a b c d e f g h",), ("x y x y x y x y x y",), ("a b",)], ["t"]
        )
        got = [r[0] for r in df.select(repetition_score(F.col("t"))).collect()]
        assert got[0] == 0.0          # all distinct 3-grams
        assert got[1] > 0.5           # degenerate loop
        assert got[2] is None         # too short


class TestBloomDecontam:
    def test_bloom_path_equals_exact_path(self, spark):
        """The Bloom prefilter is an optimization, not a semantics
        change: identical (id, overlap-count) output to the exact
        posting join on the same inputs."""
        from etl_guiacores_spark.operators.decontam import (
            contaminated_doc_ids,
            contaminated_doc_ids_bloom,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated text with different words entirely"),
                (3, "quick brown fox appears here too with more padding"),
                (4, "short"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "a quick brown fox jumps high",)], "bid long, text string"
        )
        exact = {
            (r["doc_id"], r["n_overlapping_ngrams"])
            for r in contaminated_doc_ids(docs, bench).collect()
        }
        bloom = {
            (r["doc_id"], r["n_overlapping_ngrams"])
            for r in contaminated_doc_ids_bloom(docs, bench, num_bits=1 << 12).collect()
        }
        assert exact == bloom and exact  # non-trivial and identical

    def test_pipeline_decontam_stage(self, spark, tmp_path):
        from etl_guiacores_spark.plans.corpus_pipeline import (
            CorpusConfig,
            run_corpus_pipeline,
        )

        bench_p = str(tmp_path / "bench")
        spark.createDataFrame(
            [("the forbidden benchmark passage lives here",)], "text string"
        ).write.parquet(bench_p)
        docs = spark.createDataFrame(
            [
                (1, "the forbidden benchmark passage lives here in this document too"),
                (2, "a perfectly clean training document with plenty of ordinary words"),
                (3, "another clean document carrying enough text to pass quality gates"),
            ],
            "doc_id long, text string",
        )
        res = run_corpus_pipeline(
            docs,
            str(tmp_path / "out"),
            CorpusConfig(min_quality=0.0, benchmark_path=bench_p),
        )
        clean_ids = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out" / "clean")).collect()
        }
        assert 1 not in clean_ids and {2, 3} <= clean_ids
        deconta = spark.read.parquet(str(tmp_path / "out" / "decontaminated"))
        assert {r["doc_id"] for r in deconta.collect()} == {2, 3}


# --- span-level cross-set decontamination --------------------------------------

def test_cross_span_finds_quoted_benchmark_extent(spark):
    from etl_guiacores_spark.operators.decontam import (
        cross_span_contamination,
    )

    bench = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
    train_rows = [
        # doc 1 embeds the benchmark mid-page -> one maximal span [3, 11)
        (1, "one two three " + bench + " tail1 tail2"),
        # doc 2 shares no 8-gram
        (2, "totally unrelated words that never quote the benchmark "
            "at all in any window"),
    ]
    eval_rows = [(100, "intro " + bench + " outro")]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = cross_span_contamination(train, ev, n=8).collect()
    assert len(got) == 1
    r = got[0]
    assert r["doc_id"] == 1
    assert (r["span_start"], r["span_end"]) == (3, 11)
    assert r["span_tokens"] == 8 and r["n_grams"] == 1


def test_cross_span_merges_adjacent_windows(spark):
    from etl_guiacores_spark.operators.decontam import (
        cross_span_contamination,
    )

    # a 10-token quotation yields three sliding 8-grams that coalesce
    quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    train = spark.createDataFrame(
        [(1, "pre " + quote + " post")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(9, quote)], "doc_id long, text string"
    )
    got = cross_span_contamination(train, ev, n=8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["span_start"], r["span_end"], r["n_grams"]) == (1, 11, 3)


def test_cross_span_no_false_positive_within_train(spark):
    from etl_guiacores_spark.operators.decontam import (
        cross_span_contamination,
    )

    # two TRAIN docs share a long passage but the eval set doesn't
    # have it -> cross-set contamination must stay empty (that case
    # belongs to repeated_spans, not this operator)
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    train = spark.createDataFrame(
        [(1, shared), (2, shared + " more")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(9, "nothing in common here at all with those words")],
        "doc_id long, text string",
    )
    assert cross_span_contamination(train, ev, n=8).count() == 0


def test_cross_span_chunked_coverage_probe(spark):
    """Round-12 advice item: a stale/partial bronze silently yields
    zero grams for uncovered train docs, so their contamination
    spans would vanish without a trace — under validate=True the
    chunk-fed path must probe coverage and fail loud (the pipeline's
    validate=False fast path is unaffected: it wrote the bronze from
    the same docs this run)."""
    import pytest

    from etl_guiacores_spark.operators.chunking import (
        prechunk_documents,
    )
    from etl_guiacores_spark.operators.decontam import (
        cross_span_contamination,
    )

    bench = "alpha bravo charlie delta echo foxtrot golf hotel"
    train = spark.createDataFrame(
        [(1, "one two three " + bench + " tail1 tail2"),
         (2, "other words that never quote the benchmark anywhere "
             "in any sliding window at all")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "intro " + bench + " outro")], "doc_id long, text string"
    )
    partial = prechunk_documents(
        train.filter("doc_id <> 1"), chunk_tokens=8
    )
    with pytest.raises(ValueError, match="no rows in the pre-chunked"):
        cross_span_contamination(train, ev, n=8, chunks=partial)
