"""Corpus datasheet rollup (functions/datasheet.py) — hand-computed
group expectations on a transparent fixture."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.datasheet import corpus_datasheet


class TestCorpusDatasheet:
    @pytest.fixture(scope="class")
    def out(self, spark):
        rows = [
            # group a: 4 docs, one exact-dup pair (token-set equal),
            # one empty
            ("a", "the cat sat on the mat"),
            ("a", "mat the on sat cat the"),  # same token SET -> dup
            ("a", "completely different words here"),
            ("a", ""),
            # group b: 2 docs, no dups
            ("b", "one two three"),
            ("b", None),
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        return {
            r["source"]: r
            for r in corpus_datasheet(df, "text", ["source"]).collect()
        }

    def test_counts(self, out):
        assert out["a"]["n_docs"] == 4 and out["a"]["n_empty"] == 1
        assert out["b"]["n_docs"] == 2 and out["b"]["n_empty"] == 1

    def test_token_totals(self, out):
        # a: 6 + 6 + 4 + 0 = 16; b: 3 + 0
        assert out["a"]["total_tokens"] == 16
        assert out["b"]["total_tokens"] == 3
        assert out["a"]["mean_tokens"] == pytest.approx(4.0)

    def test_dup_fraction_is_token_set_based(self, out):
        # the two reordered docs share the order-insensitive
        # fingerprint: 2 of 4 docs are in a duplicated group
        assert out["a"]["dup_frac"] == pytest.approx(0.5)
        assert out["b"]["dup_frac"] == 0.0

    def test_quantiles_unit_weight(self, out):
        # a token counts sorted: [0, 4, 6, 6] -> p50 = 4, p90 = 6
        assert out["a"]["p50_tokens"] == 4.0
        assert out["a"]["p90_tokens"] == 6.0

    def test_chars_and_scores_present(self, out):
        assert out["a"]["total_chars"] == len(
            "the cat sat on the mat"
        ) + len("mat the on sat cat the") + len(
            "completely different words here"
        )
        assert 0.0 <= out["a"]["mean_quality"] <= 1.0
        assert out["a"]["mean_code"] == 0.0
