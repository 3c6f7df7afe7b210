"""Vocabulary building + document encoding (functions/vocab.py)."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.vocab import (
    build_vocabulary,
    encode_documents,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat"),
            (2, "a cat and a dog"),
        ],
        "doc_id long, text string",
    )


class TestBuildVocabulary:
    def test_masses_and_ids(self, corpus):
        v = {r["term"]: r for r in build_vocabulary(corpus, "text").collect()}
        assert v["the"]["mass"] == 3.0
        assert v["the"]["term_id"] == 0  # highest mass
        assert v["cat"]["mass"] == 2.0 and v["sat"]["mass"] == 2.0
        # ties rank by term text: a(2) < cat(2) < dog(2) < sat(2)
        tied = sorted(
            [t for t, r in v.items() if r["mass"] == 2.0],
        )
        ids = [v[t]["term_id"] for t in tied]
        assert ids == sorted(ids)

    def test_max_size_and_min_mass(self, corpus):
        top3 = build_vocabulary(corpus, "text", max_size=3).collect()
        assert len(top3) == 3
        heavy = build_vocabulary(corpus, "text", min_mass=2.0).collect()
        assert all(r["mass"] >= 2.0 for r in heavy)
        assert {r["term"] for r in heavy} == {"the", "a", "cat", "dog", "sat"}

    def test_weighted_mass(self, corpus):
        v = {
            r["term"]: r["mass"]
            for r in build_vocabulary(
                corpus, "text", weight=F.col("doc_id").cast("double")
            ).collect()
        }
        # 'dog' appears in docs 1 and 2 -> mass 1+2 = 3
        assert v["dog"] == 3.0

    def test_deterministic(self, corpus):
        a = sorted(map(tuple, build_vocabulary(corpus, "text").collect()))
        b = sorted(map(tuple, build_vocabulary(corpus, "text").collect()))
        assert a == b


class TestEncodeDocuments:
    def test_roundtrip_order_preserved(self, corpus):
        vocab = build_vocabulary(corpus, "text")
        id_of = {r["term"]: r["term_id"] for r in vocab.collect()}
        enc = {
            r["doc_id"]: r
            for r in encode_documents(corpus, "text", "doc_id", vocab).collect()
        }
        assert enc[0]["token_ids"] == [
            id_of[t] for t in "the cat sat on the mat".split()
        ]
        assert enc[0]["n_tokens"] == 6 and enc[0]["n_oov"] == 0

    def test_oov_and_drop(self, spark, corpus):
        vocab = build_vocabulary(corpus, "text", max_size=2)  # the, a? top2
        extra = spark.createDataFrame(
            [(9, "the zebra")], "doc_id long, text string"
        )
        enc = encode_documents(extra, "text", "doc_id", vocab).collect()[0]
        assert enc["token_ids"][0] != -1 and enc["token_ids"][1] == -1
        assert enc["n_oov"] == 1
        dropped = encode_documents(
            extra, "text", "doc_id", vocab, drop_oov=True
        ).collect()[0]
        assert -1 not in dropped["token_ids"]
        assert len(dropped["token_ids"]) == 1

    def test_broadcast_plan(self, corpus):
        vocab = build_vocabulary(corpus, "text")
        df = encode_documents(corpus, "text", "doc_id", vocab)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, plan
        assert "BatchEvalPython" not in plan
