"""Benchmark n-gram decontamination (functions/decontam.py)."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.decontam import decontaminate, ngram_overlap


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),     # = bench
            (1, "the quick brown fox jumps over the sleepy cat"),   # partial
            (2, "completely unrelated text about spark engines"),
            (3, "tiny"),                                            # < n words
            (4, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        ["doc_id", "text"],
    )


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",), ("tiny",)],
        ["text"],
    )


class TestNgramOverlap:
    def test_exact_copy_fully_contaminated(self, corpus, bench_df):
        out = {
            r["doc_id"]: r
            for r in ngram_overlap(
                corpus, "text", "doc_id", bench_df, n=5, threshold=0.8
            ).collect()
        }
        assert out[0]["overlap_frac"] == 1.0 and out[0]["contaminated"]
        assert out[2]["overlap_frac"] == 0.0 and not out[2]["contaminated"]
        # doc 1 shares the first 5 shingles of 5 words each (positions
        # 1..5 of 9 words -> 5 shingles, 4 of which avoid the changed
        # tail words): verify against a hand count
        # doc1 grams (n=5): [1-5],[2-6],[3-7],[4-8],[5-9]; bench has
        # [1-5],[2-6],[3-7],[4-8] with 'lazy dog' vs 'sleepy cat' in
        # tail -> grams containing words 8/9 differ. Words 8,9 appear in
        # grams starting at 4,5 -> hits = grams [1-5],[2-6],[3-7] = 3/5
        assert out[1]["n_shingles"] == 5
        assert out[1]["n_hits"] == 3
        assert out[1]["overlap_frac"] == pytest.approx(0.6)

    def test_short_doc_whole_text_shingle(self, corpus, bench_df):
        out = {
            r["doc_id"]: r
            for r in ngram_overlap(
                corpus, "text", "doc_id", bench_df, n=5
            ).collect()
        }
        # 'tiny' (1 word) matches the benchmark's whole-text shingle
        assert out[3]["n_shingles"] == 1
        assert out[3]["overlap_frac"] == 1.0 and out[3]["contaminated"]

    def test_hash_and_string_paths_agree(self, corpus, bench_df):
        a = ngram_overlap(
            corpus, "text", "doc_id", bench_df, n=5, hash_shingles=True
        ).orderBy("doc_id").collect()
        b = ngram_overlap(
            corpus, "text", "doc_id", bench_df, n=5, hash_shingles=False
        ).orderBy("doc_id").collect()
        assert a == b

    def test_shuffled_join_path_agrees(self, corpus, bench_df):
        a = ngram_overlap(
            corpus, "text", "doc_id", bench_df, n=5,
            broadcast_benchmark=False,
        ).orderBy("doc_id").collect()
        b = ngram_overlap(
            corpus, "text", "doc_id", bench_df, n=5
        ).orderBy("doc_id").collect()
        assert a == b

    def test_broadcast_in_plan(self, corpus, bench_df):
        df = ngram_overlap(corpus, "text", "doc_id", bench_df, n=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_every_doc_appears_once(self, corpus, bench_df):
        out = ngram_overlap(corpus, "text", "doc_id", bench_df, n=5)
        assert out.count() == corpus.count()
        assert out.select("doc_id").distinct().count() == corpus.count()


class TestDecontaminate:
    def test_drops_only_contaminated(self, corpus, bench_df):
        kept = decontaminate(
            corpus, "text", "doc_id", bench_df, n=5, threshold=0.8
        )
        ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
        assert ids == [1, 2, 4]  # 0 exact, 3 whole-text match dropped
        assert kept.columns == corpus.columns
