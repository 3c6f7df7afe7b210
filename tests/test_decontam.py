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


class TestSemanticOverlap:
    """semantic_overlap / semantic_decontaminate (decontam.py) —
    embedding-level contamination with a numpy differential."""

    @pytest.fixture()
    def vecs(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        v = rng.randn(8, 4)
        rows = [(i, [float(x) for x in v[i]]) for i in range(8)]
        return v, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_differential_and_flags(self, spark, vecs):
        import numpy as np

        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        v, corpus = vecs
        # benchmark: scaled copies of vectors 0 and 5 + one unrelated
        bench_rows = [
            (0, [float(2 * x) for x in v[0]]),
            (5, [float(3 * x) for x in v[5]]),
            (9, [1.0, 0.0, 0.0, 0.0]),
        ]
        bench = spark.createDataFrame(
            bench_rows, "bid long, bv array<double>"
        )
        out = {
            r["vec_id"]: r
            for r in semantic_overlap(
                corpus, bench, 0.99,
                "vec_id", "embedding", "bid", "bv",
            ).collect()
        }
        b = np.array([r[1] for r in bench_rows])
        bids = [r[0] for r in bench_rows]
        for i in range(8):
            cos = b @ v[i] / (
                np.linalg.norm(b, axis=1) * np.linalg.norm(v[i])
            )
            j = int(np.argmax(cos))
            r = out[i]
            assert r["max_cosine"] == pytest.approx(cos[j], abs=1e-9)
            assert r["nearest_bench_id"] == bids[j]
            assert r["contaminated"] == bool(cos[j] >= 0.99)
        # the planted scaled copies are flagged, nothing else
        flagged = sorted(k for k, r in out.items() if r["contaminated"])
        assert flagged == [0, 5]

    def test_decontaminate_drops_flagged(self, spark, vecs):
        from pandas_weights_spark.functions.decontam import (
            semantic_decontaminate,
        )

        v, corpus = vecs
        bench = spark.createDataFrame(
            [(0, [float(2 * x) for x in v[3]])],
            "bid long, bv array<double>",
        )
        kept = semantic_decontaminate(
            corpus, bench, 0.99, "vec_id", "embedding", "bid", "bv"
        )
        ids = sorted(r["vec_id"] for r in kept.collect())
        assert ids == [0, 1, 2, 4, 5, 6, 7]
        assert kept.columns == corpus.columns

    def test_tie_breaks_to_smaller_bench_id(self, spark):
        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        bench = spark.createDataFrame(
            [(7, [2.0, 0.0]), (3, [5.0, 0.0])],
            "bid long, bv array<double>",
        )
        r = semantic_overlap(
            corpus, bench, 0.5, "vec_id", "embedding", "bid", "bv"
        ).first()
        assert r["nearest_bench_id"] == 3  # cosine 1.0 tie -> min id

    def test_benchmark_broadcast_in_plan(self, spark, vecs):
        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        _, corpus = vecs
        bench = corpus.select(
            F.col("vec_id").alias("bid"),
            F.col("embedding").alias("bv"),
        )
        df = semantic_overlap(
            corpus, bench, 0.9, "vec_id", "embedding", "bid", "bv"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, plan
        assert "BatchEvalPython" not in plan


class TestSemanticOverlapArrow:
    def test_arrow_equals_jvm(self, spark):
        import numpy as np

        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        rng = np.random.RandomState(17)
        v = rng.randn(20, 5)
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in v[i]]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        bench = spark.createDataFrame(
            [(9, [float(2 * x) for x in v[4]]),
             (3, [float(x) for x in rng.randn(5)]),
             (7, [float(x) for x in v[4]])],  # tie with bid 9 on row 4
            "bid long, bv array<double>",
        )
        kw = dict(
            corpus_id="vec_id", corpus_vec="embedding",
            bench_id="bid", bench_vec="bv",
        )
        jvm = {
            r["vec_id"]: r
            for r in semantic_overlap(corpus, bench, 0.99, **kw)
            .collect()
        }
        arw = {
            r["vec_id"]: r
            for r in semantic_overlap(
                corpus, bench, 0.99, arrow=True, **kw
            ).collect()
        }
        assert set(jvm) == set(arw)
        for i in jvm:
            a, b = jvm[i], arw[i]
            assert a["max_cosine"] == pytest.approx(
                b["max_cosine"], abs=1e-9
            ), i
            assert a["nearest_bench_id"] == b["nearest_bench_id"], i
            assert a["contaminated"] == b["contaminated"], i
        # the tie row resolved to the SMALLER benchmark id
        assert arw[4]["nearest_bench_id"] == 7

    def test_arrow_zero_shuffle_plan(self, spark):
        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        corpus = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        bench = spark.createDataFrame(
            [(1, [0.0, 1.0])], "bid long, bv array<double>"
        )
        df = semantic_overlap(
            corpus, bench, 0.9, "vec_id", "embedding", "bid", "bv",
            arrow=True,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_arrow_null_corpus_vector_matches_jvm(self, spark):
        # r12 ADVICE: a NULL corpus embedding must not crash the
        # np.vstack — the JVM twin emits (NULL max_cosine, smallest
        # bench id, NULL contaminated) via the struct-max fallthrough
        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        corpus = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        bench = spark.createDataFrame(
            [(7, [1.0, 0.0]), (3, [0.5, 0.5])],
            "bid long, bv array<double>",
        )
        kw = dict(
            corpus_id="vec_id", corpus_vec="embedding",
            bench_id="bid", bench_vec="bv",
        )
        jvm = {
            r["vec_id"]: r
            for r in semantic_overlap(corpus, bench, 0.9, **kw)
            .collect()
        }
        arw = {
            r["vec_id"]: r
            for r in semantic_overlap(
                corpus, bench, 0.9, arrow=True, **kw
            ).collect()
        }
        assert set(jvm) == set(arw) == {0, 1, 2}
        for i in (0, 2):
            assert arw[i]["max_cosine"] == pytest.approx(
                jvm[i]["max_cosine"], abs=1e-9
            )
            assert arw[i]["contaminated"] == jvm[i]["contaminated"]
        for d in (jvm, arw):
            assert d[1]["max_cosine"] is None
            assert d[1]["contaminated"] is None
            assert d[1]["nearest_bench_id"] == 3  # smallest bench id

    def test_arrow_empty_benchmark_raises(self, spark):
        from pandas_weights_spark.functions.decontam import (
            semantic_overlap,
        )

        corpus = spark.createDataFrame(
            [(0, [1.0])], "vec_id long, embedding array<double>"
        )
        bench = spark.createDataFrame(
            [], "bid long, bv array<double>"
        )
        with pytest.raises(ValueError):
            semantic_overlap(
                corpus, bench, 0.9, "vec_id", "embedding",
                "bid", "bv", arrow=True,
            )
