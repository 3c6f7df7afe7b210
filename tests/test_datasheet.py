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


class TestZipfStats:
    """r12: zipf_stats — head ranks, type/token/hapax scalars, and
    the ln-ln least-squares head slope, pure-Python differential."""

    ROWS = [
        (1, "the the the the quick quick brown fox fox fox"),
        (2, "THE quick dog runs past the lazy unique1 unique2"),
        (3, None),
        (4, "   "),
        (5, "the\tquick  fox"),
    ]

    def _got(self, spark, top_k=10):
        from pandas_weights_spark.functions.datasheet import zipf_stats

        df = spark.createDataFrame(self.ROWS, "i long, text string")
        return sorted(
            map(tuple, zipf_stats(df, "text", top_k=top_k).collect())
        )

    def test_pure_python_differential(self, spark):
        import math
        import re
        from collections import Counter

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        c = Counter()
        for _i, t in self.ROWS:
            if isinstance(t, str):
                for w in ws.split(t.lower().strip(" ")):
                    if w:
                        c[w] += 1
        n_tokens = sum(c.values())
        n_types = len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        head = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        n = float(len(head))
        xs = [math.log(r + 1) for r in range(len(head))]
        ys = [math.log(f) for _w, f in head]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        expect = sorted(
            (
                r + 1,
                w,
                f,
                n_tokens,
                n_types,
                round(n_types / n_tokens, 6),
                round(hapax / n_types, 6),
                slope,
            )
            for r, (w, f) in enumerate(head)
        )
        got = self._got(spark)
        assert [g[:3] for g in got] == [e[:3] for e in expect]
        for g, e in zip(got, expect):
            assert g[3:5] == e[3:5]
            for gi, ei in zip(g[5:], e[5:]):
                assert gi == pytest.approx(ei, abs=2e-6)

    def test_zipfian_fixture_slope_near_minus_one(self, spark):
        from pandas_weights_spark.functions.datasheet import zipf_stats

        # freq(rank) = 1024/rank exactly -> slope == -1
        words = []
        for r in range(1, 17):
            words += [f"w{r:02d}"] * (1024 // r)
        df = spark.createDataFrame(
            [(1, " ".join(words))], "i long, text string"
        )
        row = zipf_stats(df, "text", top_k=16).first()
        assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.02)
        assert row["n_types"] == 16

    def test_top_k_caps_head_not_scalars(self, spark):
        got = self._got(spark, top_k=3)
        assert len(got) == 3
        # scalars still reflect the WHOLE vocabulary
        assert got[0][4] > 3  # n_types

    def test_validation(self, spark):
        from pandas_weights_spark.functions.datasheet import zipf_stats

        df = spark.createDataFrame([(1, "a b")], "i long, text string")
        with pytest.raises(ValueError, match="top_k"):
            zipf_stats(df, "text", top_k=1)
