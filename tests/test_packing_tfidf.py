"""Sequence packing (packing.py) and TF-IDF top terms (text.py) —
training-pipeline extensions."""

import math

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.packing import pack_sequences
from pandas_weights_spark.functions.text import tfidf_top_terms


class TestPackSequences:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, 300 + (i * 37) % 700) for i in range(200)]
        return spark.createDataFrame(rows, "doc_id long, tokens long")

    def test_offsets_are_running_totals(self, docs):
        out = pack_sequences(
            docs, F.col("tokens"), budget=1000, key_cols=["doc_id"],
            n_buckets=4,
        ).collect()
        by_bucket = {}
        for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
            start = by_bucket.get(r["bucket"], 0)
            assert r["pack_id"] == r["bucket"] * 1_000_000_000 + start // 1000
            assert r["pack_offset"] == start % 1000
            by_bucket[r["bucket"]] = start + r["tokens"]

    def test_every_doc_packed_once(self, docs):
        out = pack_sequences(
            docs, F.col("tokens"), budget=512, key_cols=["doc_id"]
        )
        assert out.count() == 200
        assert out.select("doc_id").distinct().count() == 200

    def test_deterministic_across_partitionings(self, docs):
        a = pack_sequences(docs, F.col("tokens"), 1000, ["doc_id"], n_buckets=4)
        b = pack_sequences(
            docs.repartition(7), F.col("tokens"), 1000, ["doc_id"], n_buckets=4
        )
        ka = {(r["doc_id"]): (r["pack_id"], r["pack_offset"]) for r in a.collect()}
        kb = {(r["doc_id"]): (r["pack_id"], r["pack_offset"]) for r in b.collect()}
        assert ka == kb

    def test_excludes_empty_docs(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 0), (3, None), (4, 5)], "doc_id long, tokens long"
        )
        out = pack_sequences(df, F.col("tokens"), 100, ["doc_id"])
        assert {r["doc_id"] for r in out.collect()} == {1, 4}

    def test_bad_budget_raises(self, spark):
        df = spark.createDataFrame([(1, 10)], "doc_id long, tokens long")
        with pytest.raises(ValueError):
            pack_sequences(df, F.col("tokens"), 0, ["doc_id"])


class TestTfidf:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "apple cherry cherry date"),
            (3, "elderberry"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_scores_match_formula(self, corpus):
        out = tfidf_top_terms(corpus, "text", "doc_id", k=10).collect()
        got = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
        n = 4

        def want(tf, df):
            return round(tf * (math.log((n + 1) / (df + 1)) + 1.0), 6)

        assert got[(0, "apple")] == pytest.approx(want(2, 2))
        assert got[(0, "banana")] == pytest.approx(want(1, 2))
        assert got[(2, "cherry")] == pytest.approx(want(2, 2))
        assert got[(2, "date")] == pytest.approx(want(1, 1))
        assert got[(3, "elderberry")] == pytest.approx(want(1, 1))

    def test_rank_and_k(self, corpus):
        out = tfidf_top_terms(corpus, "text", "doc_id", k=1).collect()
        top = {r["doc_id"]: (r["term"], r["rank"]) for r in out}
        assert len(out) == 4  # one per doc
        assert top[0] == ("apple", 1)   # tf=2 beats banana tf=1
        assert top[2] == ("cherry", 1)  # tf=2 beats the rarer date tf=1
        assert top[3] == ("elderberry", 1)

    def test_case_folding(self, spark):
        df = spark.createDataFrame(
            [(0, "Apple APPLE apple"), (1, "pear")], "doc_id long, text string"
        )
        out = tfidf_top_terms(df, "text", "doc_id", k=1).collect()
        top0 = [r for r in out if r["doc_id"] == 0][0]
        assert top0["term"] == "apple"


class TestClassTfidf:
    """r13: c-TF-IDF (Grootendorst 2022) — per-class distinctive
    terms; W(t,c) = tf(t,c) * ln(1 + A/f(t))."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            ("web", "spam spam click banner the the"),
            ("web", "click spam offer the"),
            ("book", "chapter prose narrative the the"),
            ("book", "prose chapter the"),
        ]
        return spark.createDataFrame(rows, "source string, text string")

    def test_pure_python_differential(self, corpus):
        from collections import Counter

        from pandas_weights_spark.functions.text import class_tfidf

        rows = corpus.collect()
        tf, ft = Counter(), Counter()
        for r in rows:
            for w in r["text"].lower().split():
                tf[(r["source"], w)] += 1
                ft[w] += 1
        n_classes = len({c for c, _ in tf})
        A = sum(tf.values()) / n_classes
        expect = {}
        for (c, t), n in tf.items():
            expect[(c, t)] = (n, round(n * math.log(1.0 + A / ft[t]), 6))
        got = {
            (r["source"], r["term"]): (r["tf"], r["score"])
            for r in class_tfidf(corpus, "text", "source", k=100).collect()
        }
        assert got == expect and expect

    def test_distinctive_terms_rank_first(self, corpus):
        from pandas_weights_spark.functions.text import class_tfidf

        out = class_tfidf(corpus, "text", "source", k=2).collect()
        by_class = {}
        for r in out:
            by_class.setdefault(r["source"], []).append(
                (r["rank"], r["term"])
            )
        # "the" appears everywhere -> low idf; class-specific terms win
        assert sorted(by_class["web"])[0][1] == "spam"
        assert sorted(by_class["book"])[0] == (1, "prose") or sorted(
            by_class["book"]
        )[0] == (1, "chapter")
        # shared "the" never ranks 1 despite being frequent
        assert all(
            t != "the" for rk, t in by_class["web"] + by_class["book"]
            if rk == 1
        )
        # k caps per class
        assert all(len(v) == 2 for v in by_class.values())

    def test_min_tf_prunes(self, corpus):
        from pandas_weights_spark.functions.text import class_tfidf

        out = class_tfidf(
            corpus, "text", "source", k=100, min_tf=2
        ).collect()
        terms = {(r["source"], r["term"]) for r in out}
        assert ("web", "offer") not in terms  # tf=1 pruned
        assert ("web", "spam") in terms

    def test_rank_has_group_limit_pushdown(self, corpus):
        # r14: the per-class rank routes through partitioned_topk —
        # under the threshold the optimizer's Partial WindowGroupLimit
        # pre-filters every map task to its local top-k per class
        # BEFORE the exchange, so a web-scale class's vocabulary never
        # funnels into one sort task unfiltered
        from pandas_weights_spark.functions.text import class_tfidf

        df = class_tfidf(corpus, "text", "source", k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan and "Partial" in plan, plan

    def test_huge_k_salts_same_rows(self, corpus):
        # above the threshold the rank switches to the salted
        # two-stage (salt_by=term) — identical rows, no class's full
        # vocab in a single unsalted window task
        from pandas_weights_spark.functions.text import class_tfidf

        spark = corpus.sparkSession
        ref = {
            (r["source"], r["term"], r["tf"], r["score"], r["rank"])
            for r in class_tfidf(corpus, "text", "source", k=100).collect()
        }
        key = "spark.sql.optimizer.windowGroupLimitThreshold"
        old = spark.conf.get(key)
        spark.conf.set(key, "10")
        try:
            salted = class_tfidf(corpus, "text", "source", k=100)
            plan = salted._jdf.queryExecution().executedPlan().toString()
            assert "pmod" in plan, plan
            assert plan.count("Window [") == 2, plan
            got = {
                (r["source"], r["term"], r["tf"], r["score"], r["rank"])
                for r in salted.collect()
            }
        finally:
            spark.conf.set(key, old)
        assert got == ref and ref


class TestChunkDocuments:
    """Sliding-window chunking (packing.chunk_documents)."""

    def test_coverage_and_overlap(self, spark):
        from pandas_weights_spark.functions.packing import chunk_documents

        text = " ".join(f"w{i}" for i in range(1, 11))  # 10 tokens
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_documents(df, "text", "doc_id", chunk_tokens=8, overlap=4)
        rows = sorted(out.collect(), key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == [0, 1]
        assert rows[0]["chunk_text"].split() == [f"w{i}" for i in range(1, 9)]
        assert rows[1]["chunk_text"].split() == [f"w{i}" for i in range(5, 11)]
        assert rows[0]["n_tokens"] == 8 and rows[1]["n_tokens"] == 6
        # complete coverage: union of chunk tokens == all tokens
        seen = set()
        for r in rows:
            seen.update(r["chunk_text"].split())
        assert seen == {f"w{i}" for i in range(1, 11)}

    def test_short_doc_single_chunk(self, spark):
        from pandas_weights_spark.functions.packing import chunk_documents

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        out = chunk_documents(df, "text", "doc_id", chunk_tokens=8, overlap=4)
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["chunk_text"] == "a b c" and rows[0]["n_tokens"] == 3

    def test_exact_boundary_no_degenerate_tail(self, spark):
        from pandas_weights_spark.functions.packing import chunk_documents

        text = " ".join(f"t{i}" for i in range(8))  # exactly chunk_tokens
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_documents(df, "text", "doc_id", chunk_tokens=8, overlap=4)
        assert out.count() == 1

    def test_every_token_within_chunk_budget(self, spark):
        from pandas_weights_spark.functions.packing import chunk_documents

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = chunk_documents(docs, "text", "doc_id", chunk_tokens=16,
                              overlap=4)
        bad = out.where(
            (F.col("n_tokens") > 16) | (F.col("n_tokens") < 1)
        ).count()
        assert bad == 0
        # chunk token counts match the text
        mism = out.where(
            F.size(F.split(F.col("chunk_text"), r"\s+")) != F.col("n_tokens")
        ).count()
        assert mism == 0

    def test_overlap_validation(self, spark):
        from pandas_weights_spark.functions.packing import chunk_documents

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


class TestBestFitPacking:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        import random

        rng = random.Random(5)
        return spark.createDataFrame(
            [(i, rng.randint(10, 200)) for i in range(2000)],
            "doc_id long, ntok int",
        )

    def test_no_straddle_and_budget(self, docs):
        from pandas_weights_spark.functions.packing import (
            pack_sequences_bestfit,
        )

        out = pack_sequences_bestfit(
            docs, F.col("ntok"), budget=256, key_cols=["doc_id"],
            n_buckets=8,
        )
        agg = out.groupBy("pack_id").agg(
            F.sum("ntok").alias("s"), F.max("pack_tokens").alias("pt"),
            F.count("*").alias("n"),
        ).collect()
        # every pack within budget; pack_tokens equals the exact sum
        assert all(r["s"] <= 256 for r in agg)
        assert all(r["s"] == r["pt"] for r in agg)
        # every document appears exactly once (no straddle, no loss)
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()

    def test_waste_beats_naive_sequential(self, docs):
        # BFD pad waste must be well under first-come-first-served
        from pandas_weights_spark.functions.packing import (
            pack_sequences_bestfit,
        )

        out = pack_sequences_bestfit(
            docs, F.col("ntok"), budget=256, key_cols=["doc_id"],
            n_buckets=8,
        )
        n_packs = out.select("pack_id").distinct().count()
        total = docs.agg(F.sum("ntok")).first()[0]
        waste = n_packs * 256 - total
        assert waste / (n_packs * 256) < 0.03  # <3% padding

    def test_deterministic_under_repartition(self, docs):
        from pandas_weights_spark.functions.packing import (
            pack_sequences_bestfit,
        )

        f = lambda d: sorted(  # noqa: E731
            (r["doc_id"], r["pack_id"])
            for r in pack_sequences_bestfit(
                d, F.col("ntok"), 256, ["doc_id"], n_buckets=8
            ).collect()
        )
        assert f(docs) == f(docs.repartition(13))

    def test_oversize_modes(self, spark):
        from pandas_weights_spark.functions.packing import (
            pack_sequences_bestfit,
        )

        df = spark.createDataFrame(
            [(1, 100), (2, 999), (3, 50)], "doc_id long, ntok int"
        )
        with pytest.raises(Exception, match="exceeds budget"):
            pack_sequences_bestfit(
                df, F.col("ntok"), 256, ["doc_id"], n_buckets=1
            ).collect()
        dropped = pack_sequences_bestfit(
            df, F.col("ntok"), 256, ["doc_id"], n_buckets=1,
            oversize="drop",
        )
        assert sorted(
            r["doc_id"] for r in dropped.collect()
        ) == [1, 3]
        own = pack_sequences_bestfit(
            df, F.col("ntok"), 256, ["doc_id"], n_buckets=1,
            oversize="own_pack",
        ).collect()
        by_id = {r["doc_id"]: r for r in own}
        assert by_id[2]["pack_tokens"] == 999
        # the oversize doc sits alone in its pack
        packs = {}
        for r in own:
            packs.setdefault(r["pack_id"], []).append(r["doc_id"])
        assert [2] in packs.values()

    def test_null_and_nonpositive_tokens_drop(self, spark):
        from pandas_weights_spark.functions.packing import (
            pack_sequences_bestfit,
        )

        df = spark.createDataFrame(
            [(1, 100), (2, None), (3, 0), (4, -5), (5, 30)],
            "doc_id long, ntok int",
        )
        out = pack_sequences_bestfit(
            df, F.col("ntok"), 256, ["doc_id"], n_buckets=1
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]
