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


class TestTokenBudget:
    def test_vs_pure_python(self, spark):
        import re

        from pandas_weights_spark.functions.datasheet import (
            token_budget,
        )

        docs = [
            ("en", "web", "The quick brown fox, it's fast."),
            ("en", "web", "Second doc with seven small words."),
            ("en", "book", "don't count twice"),
            ("zh", "web", "中文文本的字节数比较高"),
            ("zh", "web", ""),
        ]
        df = spark.createDataFrame(
            docs, "lang string, source string, text string"
        )
        out = {
            (r["lang"], r["source"]): r
            for r in token_budget(df, "text", ("lang", "source"))
            .collect()
        }
        pat = re.compile(
            r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
        )
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0, 0, 0])
        for lang, src, t in docs:
            a = agg[(lang, src)]
            a[0] += 1
            a[1] += len(t.split())
            a[2] += len(pat.findall(t))
            a[3] += len(t.encode("utf-8"))
        assert set(out) == set(agg)
        for k, (nd, wt, bt, nb) in agg.items():
            r = out[k]
            assert r["n_docs"] == nd, k
            assert r["ws_tokens"] == wt, k
            assert r["bpe_tokens"] == bt, k
            assert r["utf8_bytes"] == nb, k
            if bt:
                assert r["tokens_per_kib"] == pytest.approx(
                    round(bt * 1024.0 / nb, 6)
                )
                assert r["bytes_per_token"] == pytest.approx(
                    round(nb / bt, 6)
                )

    def test_cjk_fertility_exceeds_english(self, spark):
        from pandas_weights_spark.functions.datasheet import (
            token_budget,
        )

        df = spark.createDataFrame(
            [
                ("en", "plain english words all the way through"),
                ("zh", "这是一段没有空格的中文句子需要更多字节"),
            ],
            "lang string, text string",
        )
        out = {
            r["lang"]: r for r in token_budget(df, "text", ("lang",))
            .collect()
        }
        # under the regex proxy every CJK char is ONE single-char
        # token of exactly 3 UTF-8 bytes, while English packs a whole
        # word per token — the per-script fertility skew the report
        # exists to expose (direction flips under a trained BPE, the
        # magnitude is what mixture plans correct for)
        assert out["zh"]["bytes_per_token"] == pytest.approx(3.0)
        assert out["en"]["bytes_per_token"] > out["zh"][
            "bytes_per_token"
        ]
        assert out["zh"]["tokens_per_kib"] > out["en"][
            "tokens_per_kib"
        ]

    def test_single_shuffle_plan(self, spark):
        from pandas_weights_spark.functions.datasheet import (
            token_budget,
        )

        df = spark.createDataFrame(
            [("en", "a b c")], "lang string, text string"
        )
        plan = (
            token_budget(df, "text", ("lang",))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1, plan
        assert "BatchEvalPython" not in plan
