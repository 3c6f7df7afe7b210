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
