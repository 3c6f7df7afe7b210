"""BM25 ranked retrieval (functions/search.py) vs a transparent
Python reference."""

import math

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.search import bm25_topk


def _ref_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs if t is not None}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {}
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for qi, qt in queries:
        scores = {}
        for term in dict.fromkeys(qt.lower().split()):
            if term not in dfreq:
                continue
            idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            for di, ts in toks.items():
                tf = ts.count(term)
                if not tf:
                    continue
                s = idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl)
                )
                scores[di] = scores.get(di, 0.0) + s
        out[qi] = sorted(
            ((round(s, 6), di) for di, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )
    return out


class TestBM25:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        docs = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a fast brown fox is quick and clever"),
            (3, "the dog sleeps all day long the dog dreams"),
            (4, "spark engines shuffle data across the cluster"),
            (5, "quick quick quick repetition saturates term frequency"),
            (6, None),
        ]
        queries = [
            (10, "quick fox"),
            (11, "dog"),
            (12, "quick quick fox"),   # repeated query term == once
            (13, "zzz_nowhere"),       # no corpus hit -> no rows
        ]
        D = spark.createDataFrame(docs, "doc_id long, text string")
        Q = spark.createDataFrame(queries, "qid long, qtext string")
        return docs, queries, D, Q

    def test_matches_python_reference(self, spark, corpus):
        docs, queries, D, Q = corpus
        got = {}
        for r in bm25_topk(
            D, "text", "doc_id", Q, "qid", "qtext", k=10
        ).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        ref = _ref_bm25(
            [(i, t) for i, t in docs], [(i, t) for i, t in queries]
        )
        for qi, pairs in ref.items():
            mine = sorted(got.get(qi, []))
            assert len(mine) == len(pairs), qi
            for (rk, di, sc), (rs, rd) in zip(mine, pairs):
                assert di == rd and sc == pytest.approx(rs, abs=1e-9)
        assert 13 not in got  # no-hit query emits nothing

    def test_repeated_query_terms_count_once(self, spark, corpus):
        _, _, D, Q = corpus
        out = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_topk(
                D, "text", "doc_id", Q, "qid", "qtext", k=10
            ).collect()
        }
        # query 12 ("quick quick fox") == query 10 ("quick fox")
        for doc in (1, 2, 5):
            if (10, doc) in out:
                assert out[(12, doc)] == out[(10, doc)]

    def test_tf_saturation_and_k_cut(self, spark, corpus):
        _, _, D, Q = corpus
        rows = bm25_topk(
            D, "text", "doc_id", Q.where("qid = 11"), "qid", "qtext",
            k=1,
        ).collect()
        assert len(rows) == 1 and rows[0]["rank"] == 1
        assert rows[0]["doc_id"] == 3  # two 'dog's beat one

    def test_guards(self, spark, corpus):
        _, _, D, Q = corpus
        with pytest.raises(ValueError, match="k must"):
            bm25_topk(D, "text", "doc_id", Q, "qid", "qtext", k=0)
        with pytest.raises(ValueError, match="k1"):
            bm25_topk(D, "text", "doc_id", Q, "qid", "qtext", b=2.0)


class TestRrfFuse:
    """r10: rrf_fuse — reciprocal-rank fusion of per-query rankings."""

    def _lists(self, spark):
        lex = spark.createDataFrame(
            [(1, "a", 1), (1, "b", 2), (1, "c", 3),
             (2, "x", 1), (2, "y", 2)],
            ["q", "d", "rank"],
        )
        sem = spark.createDataFrame(
            [(1, "b", 1), (1, "a", 2), (1, "z", 3),
             (2, "y", 1)],
            ["q", "d", "rank"],
        )
        return lex, sem

    def test_fusion_math_and_order(self, spark):
        from pandas_weights_spark.functions.search import rrf_fuse

        lex, sem = self._lists(spark)
        got = {
            (r["q"], r["d"]): (r["rrf_score"], r["rank"])
            for r in rrf_fuse([lex, sem], "q", "d", k=60.0).collect()
        }
        # hand-computed sums (two-term IEEE sums are commutative)
        want = {
            (1, "a"): 1 / 61 + 1 / 62,
            (1, "b"): 1 / 62 + 1 / 61,
            (1, "c"): 1 / 63,
            (1, "z"): 1 / 63,
            (2, "x"): 1 / 61,
            (2, "y"): 1 / 62 + 1 / 61,
        }
        for k_, v in want.items():
            assert got[k_][0] == v, k_
        # q1: a and b tie on score -> id tiebreak (a first); c/z tie
        assert [got[(1, d)][1] for d in ("a", "b", "c", "z")] == [
            1, 2, 3, 4,
        ]
        assert got[(2, "y")][1] == 1 and got[(2, "x")][1] == 2

    def test_topk_and_three_lists(self, spark):
        from pandas_weights_spark.functions.search import rrf_fuse

        lex, sem = self._lists(spark)
        third = spark.createDataFrame([(1, "c", 1)], ["q", "d", "rank"])
        rows = rrf_fuse(
            [lex, sem, third], "q", "d", k=60.0, topk=2
        ).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["q"], []).append((r["rank"], r["d"]))
        assert len(per_q[1]) == 2 and len(per_q[2]) == 2
        # c gains the third list's 1/61 (total ~0.03227) but stays
        # below the a/b pair (~0.03252): top-2 is still a, b
        assert sorted(per_q[1]) == [(1, "a"), (2, "b")]

    def test_validation(self, spark):
        from pandas_weights_spark.functions.search import rrf_fuse

        lex, _ = self._lists(spark)
        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([], "q", "d")
        with pytest.raises(ValueError, match="k must be"):
            rrf_fuse([lex], "q", "d", k=0.0)
        with pytest.raises(ValueError, match="topk"):
            rrf_fuse([lex], "q", "d", topk=0)
