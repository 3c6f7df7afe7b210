"""Gopher-style repetition metrics + quality flags (functions/quality.py).

Differential strategy: every metric is recomputed by a transparent
pure-Python reference on the same strings; the Spark fold must match
exactly. Plan tests pin the row-local design (no explode, no UDF)."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.quality import (
    STOP_WORDS,
    dup_ngram_char_frac,
    duplicate_item_stats,
    quality_flags,
    repetition_metrics,
    top_ngram_char_frac,
)

DOCS = [
    # id, text
    (0, "a b c d e"),
    (1, "one line\none line\nanother line\none line"),
    (2, "x y x y x y x y x y"),            # heavy 2-gram repetition
    (3, ""),                                # empty
    (4, "word"),                            # single word, no dup
    (5, "l1\nl2\nl3"),                      # no dup lines
    (6, "spam spam spam spam spam spam"),   # one token repeated
    (7, "the cat sat on the mat and the cat sat again"),
]


def _words(t):
    t = t.strip()
    return re.split(r"\s+", t) if t else [""]


def _ngrams(t, n):
    ws = _words(t)
    if len(ws) >= n:
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
    return [" ".join(ws)]


def ref_dup_items(items):
    c = Counter(items)
    n = len(items)
    dup = sum(v - 1 for v in c.values())
    total = sum(len(i) for i in items)
    rep = sum((v - 1) * len(k) for k, v in c.items())
    return (
        dup / n if n else None,
        rep / total if total else None,
    )


def ref_top_frac(t, n):
    grams = _ngrams(t, n)
    best = max(cnt * len(g) for g, cnt in Counter(grams).items())
    return min(1.0, best / len(t)) if len(t) else None


def ref_dup_frac(t, n):
    grams = _ngrams(t, n)
    mass = sum(cnt * len(g) for g, cnt in Counter(grams).items() if cnt > 1)
    return min(1.0, mass / len(t)) if len(t) else None


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["id", "text"])


class TestRepetition:
    def test_duplicate_lines_vs_reference(self, docs):
        stats = duplicate_item_stats(F.split(F.col("text"), "\n"))
        rows = {
            r["id"]: r
            for r in docs.select(
                "id", stats["dup_frac"].alias("df"),
                stats["dup_char_frac"].alias("dcf"),
            ).collect()
        }
        for i, t in DOCS:
            exp_df, exp_dcf = ref_dup_items(t.split("\n"))
            assert rows[i]["df"] == pytest.approx(exp_df), (i, t)
            if exp_dcf is None:
                assert rows[i]["dcf"] is None, (i, t)
            else:
                assert rows[i]["dcf"] == pytest.approx(exp_dcf), (i, t)

    @pytest.mark.parametrize("n", [2, 3])
    def test_top_ngram_vs_reference(self, docs, n):
        rows = {
            r["id"]: r["v"]
            for r in docs.select(
                "id", top_ngram_char_frac(F.col("text"), n).alias("v")
            ).collect()
        }
        for i, t in DOCS:
            exp = ref_top_frac(t, n)
            if exp is None:
                assert rows[i] is None or rows[i] == 0.0
            else:
                assert rows[i] == pytest.approx(exp), (i, t, n)

    @pytest.mark.parametrize("n", [2, 5])
    def test_dup_ngram_vs_reference(self, docs, n):
        rows = {
            r["id"]: r["v"]
            for r in docs.select(
                "id", dup_ngram_char_frac(F.col("text"), n).alias("v")
            ).collect()
        }
        for i, t in DOCS:
            exp = ref_dup_frac(t, n)
            if exp is None:
                assert rows[i] is None or rows[i] == 0.0
            else:
                assert rows[i] == pytest.approx(exp), (i, t, n)

    def test_panel_on_real_docs(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        m = repetition_metrics(F.col("text"))
        out = docs.select(
            "doc_id", *[c.alias(k) for k, c in m.items()]
        ).collect()
        assert len(out) > 0
        for r in out:
            for k in ("dup_line_frac", "top2_char_frac", "dup5_char_frac"):
                assert r[k] is None or 0.0 <= r[k] <= 1.0, (r["doc_id"], k)

    def test_row_local_plan(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        m = repetition_metrics(F.col("text"))
        df = docs.select("doc_id", *[c.alias(k) for k, c in m.items()])
        plan = df._jdf.queryExecution().executedPlan().toString()
        # row-local: no explode, no shuffle, no Python eval
        assert "Generate" not in plan, plan
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestQualityFlags:
    def test_flags_on_crafted_docs(self, spark):
        good = " ".join(
            ["the quick brown fox jumps over the lazy dog to be of and "
             "that have with more words here filling space"] * 3
        )
        too_short = "tiny doc"
        symbols = " ".join(["woop###" for _ in range(80)])
        bullets = "\n".join(["- item %d with the words to be of and that "
                             "have with extra" % i for i in range(10)])
        df = spark.createDataFrame(
            [(0, good), (1, too_short), (2, symbols), (3, bullets)],
            ["id", "text"],
        )
        fl = quality_flags(F.col("text"))
        rows = {
            r["id"]: r
            for r in df.select(
                "id", *[c.alias(k) for k, c in fl.items()]
            ).collect()
        }
        assert rows[0]["keep"] is True
        assert rows[1]["ok_word_count"] is False and rows[1]["keep"] is False
        assert rows[2]["ok_symbol_ratio"] is False and rows[2]["keep"] is False
        assert rows[3]["ok_bullet_lines"] is False and rows[3]["keep"] is False

    def test_stop_word_rule(self, spark):
        no_stops = " ".join(["lorem ipsum dolor sit amet"] * 20)
        df = spark.createDataFrame([(0, no_stops)], ["id", "text"])
        fl = quality_flags(F.col("text"))
        r = df.select(*[c.alias(k) for k, c in fl.items()]).first()
        assert r["ok_stop_words"] is False
        assert len(STOP_WORDS) == 8

    def test_flags_row_local(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        fl = quality_flags(F.col("text"))
        df = docs.select("doc_id", *[c.alias(k) for k, c in fl.items()])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCodeDetection:
    """r8: code-vs-prose signals (quality.py code_metrics/code_score) —
    replace/regexp arithmetic only, fixtures shaped like real source."""

    PROSE = (
        "The quick brown fox jumps over the lazy dog. It was a "
        "bright morning and the meadow hummed with bees and birds."
    )
    CODE = (
        "def add(x, y):\n    return x + y;\n\nimport os\n"
        'const z = {1: 2};\nif (x == y && y != 0) {\n'
        '    printf("eq");\n}'
    )

    def _score(self, spark, t):
        from pandas_weights_spark.functions.quality import code_score

        df = spark.createDataFrame([(t,)], "t string")
        return df.select(code_score(F.col("t")).alias("s")).first()["s"]

    def test_separation_margin(self, spark):
        p, c = self._score(spark, self.PROSE), self._score(spark, self.CODE)
        assert p < 0.1 and c > 0.5 and c - p > 0.3

    def test_mixed_in_between(self, spark):
        m = self._score(spark, self.PROSE + "\n" + self.CODE)
        assert self._score(spark, self.PROSE) < m < self._score(
            spark, self.CODE
        )

    def test_empty_zero_null_null(self, spark):
        from pandas_weights_spark.functions.quality import code_score

        df = spark.createDataFrame([("",), (None,)], "t string")
        got = [
            r["s"]
            for r in df.select(code_score(F.col("t")).alias("s")).collect()
        ]
        assert got == [0.0, None]

    def test_metrics_hand_computed(self, spark):
        from pandas_weights_spark.functions.quality import code_metrics

        t = "a = 1;\n  indented\nplain def line"
        df = spark.createDataFrame([(t,)], "t string")
        m = df.select(
            *[
                v.alias(k)
                for k, v in code_metrics(F.col("t")).items()
            ]
        ).first()
        assert m["brace_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert m["indent_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
        # tokens: a = 1; indented plain def line -> 8? whitespace split:
        # ['a','=','1;','indented','plain','def','line'] = 7, keywords:
        # '=' not in list ('==' is), 'def' is -> 1/7
        assert m["keyword_frac"] == pytest.approx(1 / 7, abs=1e-6)

    def test_keyword_token_boundaries(self, spark):
        # 'definition' must not count as the keyword 'def'
        s_word = self._score(spark, "definition of terms")
        assert s_word == 0.0


class TestPipelineFunnel:
    """r10: pipeline_funnel — cumulative-gate attrition report."""

    def test_stages_and_masses(self, spark):
        from pandas_weights_spark.functions.quality import pipeline_funnel

        df = spark.createDataFrame(
            [
                (1, True, True, 2.0),
                (2, True, False, 3.0),
                (3, False, True, 5.0),   # g2 True but already dead
                (4, True, True, 1.0),
                (5, None, True, 7.0),    # NULL gate -> drops
            ],
            "id int, g1 boolean, g2 boolean, w double",
        )
        rows = {
            r["stage"]: (
                r["gate"], r["survivors"], r["dropped"],
                r["survival_rate"],
            )
            for r in pipeline_funnel(
                df,
                [("lang", F.col("g1")), ("quality", F.col("g2"))],
                weight=F.col("w"),
            ).collect()
        }
        assert rows[0] == ("input", 18.0, 0.0, 1.0)
        assert rows[1] == ("lang", 6.0, 12.0, 6.0 / 18.0)
        assert rows[2] == ("quality", 3.0, 3.0, 3.0 / 18.0)

    def test_unweighted_and_empty_input(self, spark):
        from pandas_weights_spark.functions.quality import pipeline_funnel

        df = spark.createDataFrame([(1, True), (2, False)], "id int, g boolean")
        rows = pipeline_funnel(df, [("g", F.col("g"))]).collect()
        assert [(r["survivors"], r["dropped"]) for r in rows] == [
            (2.0, 0.0), (1.0, 1.0),
        ]
        empty = df.where("id < 0")
        rows = pipeline_funnel(empty, [("g", F.col("g"))]).collect()
        assert [(r["survivors"], r["survival_rate"]) for r in rows] == [
            (0.0, None), (0.0, None),
        ]

    def test_validation(self, spark):
        from pandas_weights_spark.functions.quality import pipeline_funnel

        df = spark.createDataFrame([(1, True)], "id int, g boolean")
        with pytest.raises(ValueError, match="at least one"):
            pipeline_funnel(df, [])
        with pytest.raises(ValueError, match="unique"):
            pipeline_funnel(df, [("g", F.col("g")), ("g", F.col("g"))])
