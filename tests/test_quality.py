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


class TestPanelComputedOnce:
    """r15: the fused panel evaluates each expensive fold ONCE.

    Interpreted HOF expressions get no CSE, so before the r15
    LET-bindings the clamp re-ran every n-gram fold (isnotnull +
    least), ``keep`` re-ran all seven flags, and ``_rep_char_mass``
    re-sorted its array per reference — visible as duplicated
    ``sort_array`` subtrees in the plan."""

    def test_panel_matches_standalone_kernels(self, spark):
        from pandas_weights_spark.functions.quality import quality_panel

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        got = {
            r["doc_id"]: r
            for r in quality_panel(docs).drop("text").collect()
        }
        m = repetition_metrics(F.col("text"))
        fl = quality_flags(F.col("text"))
        exp = {
            r["doc_id"]: r
            for r in docs.select(
                "doc_id",
                *[c.alias(k) for k, c in m.items()],
                *[c.alias(k) for k, c in fl.items()],
            ).collect()
        }
        assert set(got) == set(exp) and len(got) > 0
        for did, g in got.items():
            e = exp[did]
            for k in e.asDict():
                if k == "doc_id":
                    continue
                assert g[k] == e[k], (did, k)

    def test_panel_plan_folds_once(self, spark):
        from pandas_weights_spark.functions.quality import quality_panel

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        plan = (
            quality_panel(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one sorted array per fold: top_ns (2,3,4) + dup_ns (5,10)
        # + the dup-line char mass = 6. The pre-r15 shape had 14.
        assert plan.count("sort_array(") == 6, plan.count("sort_array(")
        # still row-local
        assert "Exchange" not in plan and "Generate" not in plan


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


class TestC4Filter:
    """r11 (VERDICT r10 #3): C4's line/page rule filters — one
    crafted doc per rule, pure-Python expected values."""

    GOOD = "This line is a perfectly fine retained sentence."

    def _run(self, spark, text, **kw):
        from pandas_weights_spark.functions.quality import c4_filter

        df = spark.createDataFrame([(0, text)], ["i", "text"])
        return c4_filter(df, "text", **kw).first()

    def test_terminal_punctuation_keep(self, spark):
        r = self._run(
            spark,
            f"{self.GOOD}\nNo terminal punctuation here\n"
            'Quoted line keeps because of the closing mark"\n'
            "Is a question mark terminal?\nExclaim it loudly now!",
        )
        assert r["c4_n_lines"] == 5 and r["c4_n_lines_kept"] == 4
        assert "No terminal punctuation" not in r["c4_text"]

    def test_min_words_per_line(self, spark):
        r = self._run(
            spark, f"{self.GOOD}\nExactly three words.\nOk fine."
        )
        assert r["c4_n_lines_kept"] == 2  # 'Ok fine.' has 2 < 3 words
        assert "Exactly three words." in r["c4_text"]
        assert "Ok fine." not in r["c4_text"]

    def test_javascript_line_drop(self, spark):
        r = self._run(
            spark,
            f"{self.GOOD}\nPlease enable JavaScript to view this page.",
        )
        assert r["c4_n_lines_kept"] == 1
        assert "JavaScript" not in r["c4_text"]

    def test_policy_phrase_line_drop(self, spark):
        from pandas_weights_spark.functions.quality import (
            C4_POLICY_PHRASES,
        )

        for ph in C4_POLICY_PHRASES:
            r = self._run(
                spark,
                f"{self.GOOD}\nBy reading this you accept "
                f"our {ph.title()} as stated.",
            )
            assert r["c4_n_lines_kept"] == 1, ph

    def test_lines_stripped_before_rules(self, spark):
        r = self._run(spark, f"   {self.GOOD}\t \n\t{self.GOOD} ")
        assert r["c4_n_lines_kept"] == 2
        assert r["c4_text"] == f"{self.GOOD}\n{self.GOOD}"

    def test_lorem_ipsum_and_curly_page_drop(self, spark):
        five = "\n".join(
            f"Sentence number {i} is here and fully fine." for i in range(5)
        )
        assert self._run(spark, five)["c4_keep"] is True
        r = self._run(spark, five + "\nThis has Lorem Ipsum filler.")
        assert r["c4_has_lorem_ipsum"] and r["c4_keep"] is False
        r = self._run(spark, five + "\nfunction f() { return; }")
        assert r["c4_has_curly_brace"] and r["c4_keep"] is False

    def test_min_sentences_on_retained_text(self, spark):
        # 5 sentences in the raw page, but only 4 survive line rules
        four = "\n".join(
            f"Sentence number {i} is here and fully fine." for i in range(4)
        )
        r = self._run(spark, four + "\nshort js javascript line.")
        assert r["c4_n_sentences"] == 4 and r["c4_keep"] is False
        r = self._run(spark, four, min_sentences=4)
        assert r["c4_keep"] is True

    def test_multi_sentence_line_counts_each(self, spark):
        r = self._run(
            spark,
            "First sentence here. Second sentence too! A third one?\n"
            f"{self.GOOD}\n{self.GOOD}",
        )
        assert r["c4_n_sentences"] == 5

    def test_blocklist_page_drop(self, spark):
        five = "\n".join(
            f"Sentence number {i} is here and fully fine." for i in range(5)
        )
        r = self._run(spark, five, blocklist=("number 3",))
        assert r["c4_has_blocked_word"] is True
        assert r["c4_keep"] is False

    def test_null_text_is_null_keep(self, spark):
        from pandas_weights_spark.functions.quality import c4_filter

        df = spark.createDataFrame([(0, None)], "i int, text string")
        r = c4_filter(df, "text").first()
        assert r["c4_keep"] is None and r["c4_text"] is None

    def test_blocklist_word_mode_scunthorpe(self, spark):
        # r12 (VERDICT r11 wrong #4): the classic Scunthorpe false
        # positive — an EMBEDDED match must not drop the page in word
        # mode, while substring mode (the documented default) does
        five = "\n".join(
            "Residents of Scunthorpe wrote sentence number "
            f"{i} here today." for i in range(5)
        )
        sub = self._run(spark, five, blocklist=("thorpe",))
        assert sub["c4_has_blocked_word"] is True
        assert sub["c4_keep"] is False
        word = self._run(
            spark, five, blocklist=("thorpe",), blocklist_mode="word"
        )
        assert word["c4_has_blocked_word"] is False
        assert word["c4_keep"] is True
        # a standalone occurrence still trips word mode
        hit = self._run(
            spark,
            five + "\nThe village of Thorpe sits nearby as well.",
            blocklist=("thorpe",),
            blocklist_mode="word",
        )
        assert hit["c4_has_blocked_word"] is True

    def test_blocklist_word_mode_escapes_regex(self, spark):
        five = "\n".join(
            f"Sentence number {i} is here and fully fine." for i in range(5)
        )
        # a phrase with regex metachars must match literally, not as
        # a pattern
        r = self._run(
            spark,
            five + "\nBuy c.heap pills now.",
            blocklist=("c.heap",),
            blocklist_mode="word",
        )
        assert r["c4_has_blocked_word"] is True
        r2 = self._run(
            spark,
            five + "\nBuy cXheap pills now.",
            blocklist=("c.heap",),
            blocklist_mode="word",
        )
        assert r2["c4_has_blocked_word"] is False

    def test_blocklist_mode_validation(self, spark):
        with pytest.raises(ValueError, match="blocklist_mode"):
            self._run(spark, "x.", blocklist_mode="regex")


class TestFineWebFlags:
    """r11: FineWeb's three custom document filters (Penedo et al.
    2024) with pure-Python expected fractions."""

    def _run(self, spark, text, **kw):
        from pandas_weights_spark.functions.quality import fineweb_flags

        df = spark.createDataFrame(
            [(0, text)], "i int, text string"
        )
        return df.select(
            *[
                c.alias(k)
                for k, c in fineweb_flags(F.col("text"), **kw).items()
            ]
        ).first()

    def test_punct_line_fraction(self, spark):
        # 1 of 8 lines ends in punctuation: 0.125 > 0.12 -> keep
        text = "Ends well.\n" + "\n".join(f"bare line {i}" for i in range(7))
        r = self._run(spark, text)
        assert r["fw_punct_line_frac"] == pytest.approx(1 / 8)
        assert r["ok_punct_lines"] is True
        # 1 of 9 = 0.111 <= 0.12 -> drop
        text9 = text + "\nanother bare line"
        assert self._run(spark, text9)["ok_punct_lines"] is False

    def test_short_line_fraction(self, spark):
        long_l = "This line is comfortably longer than thirty characters."
        short = "tiny line."
        # 2 short of 3 = 0.667 -> >= 0.67 is False (0.6667 > 0.67? no:
        # 2/3 = 0.6667 < 0.67 is False... compute exactly)
        r = self._run(spark, f"{short}\n{short}\n{long_l}")
        assert r["fw_short_line_frac"] == pytest.approx(2 / 3)
        assert r["ok_short_lines"] is (2 / 3 < 0.67)
        r = self._run(spark, f"{short}\n{long_l}\n{long_l}")
        assert r["ok_short_lines"] is True

    def test_dup_line_char_fraction_matches_gopher_metric(self, spark):
        from pandas_weights_spark.functions.quality import (
            duplicate_item_stats,
        )

        text = "alpha beta gamma.\nalpha beta gamma.\nunique tail line."
        r = self._run(spark, text)
        expect = len("alpha beta gamma.") / (
            2 * len("alpha beta gamma.") + len("unique tail line.")
        )
        assert r["fw_dup_line_char_frac"] == pytest.approx(expect)
        assert r["ok_dup_line_chars"] is (expect < 0.1)

    def test_keep_conjunction_and_nulls(self, spark):
        good = "\n".join(
            f"A fully punctuated long enough line number {i}." for i in range(4)
        )
        assert self._run(spark, good)["keep"] is True
        r = self._run(spark, None)
        assert r["keep"] is None


class TestC4FineWebFunnelComposition:
    """r11 (VERDICT r10 #3 'compose with quality_flags into the
    funnel'): the C4 -> FineWeb -> Gopher gate chain through
    pipeline_funnel, with hand-computed survivor masses."""

    def test_funnel_stages(self, spark):
        from pandas_weights_spark.functions.quality import (
            c4_filter,
            fineweb_flags,
            pipeline_funnel,
            quality_flags,
        )

        good = "\n".join(
            f"A fully punctuated long enough line number {i}."
            for i in range(6)
        )
        rows = [
            (0, good),                         # passes C4 + FineWeb
            (1, good + "\nlorem ipsum here."),  # C4 page drop
            (2, "\n".join(["bare line"] * 8)),  # C4 + FineWeb drop
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        staged = c4_filter(df, "text")
        fw = fineweb_flags(F.col("text"))["keep"]
        gq = quality_flags(F.col("text"), min_words=5)["keep"]
        out = pipeline_funnel(
            staged,
            [
                ("c4", F.col("c4_keep")),
                ("fineweb", fw),
                ("gopher", gq),
            ],
        ).collect()
        surv = {r["gate"]: r["survivors"] for r in out}
        assert surv["input"] == 3.0
        assert surv["c4"] == 1.0       # docs 1 (lorem) and 2 (0 sent)
        assert surv["fineweb"] == 1.0  # doc 0 passes all three ratios
        # Gopher: doc 0 has ~42 words and no stop-word pair issues?
        # it lacks 2 distinct stop words? 'A' is not in the list;
        # the doc fails ok_stop_words -> 0 survivors
        assert surv["gopher"] == 0.0


class TestReadability:
    """readability_metrics / syllable_count (quality.py) vs a
    transparent pure-Python reference of the same public formulas."""

    TEXTS = [
        "The quick brown fox jumps over the lazy dog. "
        "It was a simple table of data! Make no mistake.",
        "one",
        "   ",
        "Incomprehensibilities notwithstanding, the multifaceted "
        "organization persevered. Extraordinary circumstances demand "
        "extraordinary responses.",
        "a b c a b c A B",
        "Dr. Smith met Mrs. J. Doe near mile 3.14 today! Really? "
        "Yes.",
    ]

    @staticmethod
    def _syl(w):
        wl = re.sub("[^a-z]", "", w.lower())
        if not wl:
            return 0
        groups = len(re.findall("[aeiouy]+", wl))
        silent = (
            1
            if re.search("[^aeiouy]e$", wl)
            and not wl.endswith("le")
            and groups > 1
            else 0
        )
        return max(groups - silent, 1)

    @staticmethod
    def _sentences(t):
        # mirror split_sentences: protect abbreviations + initials,
        # then split on punctuation-run + whitespace
        from pandas_weights_spark.functions.text import (
            SENTENCE_ABBREVIATIONS,
        )

        for ab in SENTENCE_ABBREVIATIONS:
            t = t.replace(ab, ab[:-1] + "\x01")
        t = re.sub(r"\b([A-Z])\.", "\\1\x01", t)
        t = re.sub(r"([.!?]+)[ \t\n\r\f]+", "\\1\x02", t)
        parts = [
            p.replace("\x01", ".").strip() for p in t.split("\x02")
        ]
        return [p for p in parts if p]

    def _expected(self, t):
        ws = t.split()
        W = len(ws)
        if W == 0:
            return {"n_words": 0}
        S = max(len(self._sentences(t)), 1)
        Y = sum(self._syl(w) for w in ws)
        L = sum(len(re.sub("[^A-Za-z]", "", w)) for w in ws)
        C = sum(len(re.sub("[^A-Za-z0-9]", "", w)) for w in ws)
        LW = sum(
            1 for w in ws if len(re.sub("[^A-Za-z]", "", w)) > 6
        )
        D = len({w.lower() for w in ws})
        return {
            "n_words": W,
            "n_sentences": S,
            "n_syllables": Y,
            "flesch": 206.835 - 1.015 * (W / S) - 84.6 * (Y / W),
            "fk_grade": 0.39 * (W / S) + 11.8 * (Y / W) - 15.59,
            "ari": 4.71 * (C / W) + 0.5 * (W / S) - 21.43,
            "coleman_liau": 0.0588 * (100 * L / W)
            - 0.296 * (100 * S / W)
            - 15.8,
            "lix": (W / S) + 100 * (LW / W),
            "ttr": D / W,
        }

    def test_differential(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_metrics,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "id long, text string",
        )
        m = readability_metrics(F.col("text"))
        rows = (
            df.select("id", *[v.alias(k) for k, v in m.items()])
            .orderBy("id")
            .collect()
        )
        for r in rows:
            exp = self._expected(self.TEXTS[r["id"]])
            if exp["n_words"] == 0:
                assert r["n_words"] == 0
                assert r["flesch"] is None and r["ttr"] is None
                continue
            for k, v in exp.items():
                got = r[k]
                assert got == pytest.approx(v, abs=1e-9), (
                    r["id"],
                    k,
                    got,
                    v,
                )

    @pytest.mark.parametrize(
        "word,syl",
        [
            ("make", 1),        # silent e
            ("table", 2),       # -le keeps the syllable
            ("simple", 2),
            ("see", 1),         # vowel-preceded final e: no subtract
            ("the", 1),
            ("mistake", 2),
            ("data", 2),
            ("syzygy", 3),      # y as vowel
            ("rhythm", 1),      # floor at 1
            ("123", 0),         # letterless token
            ("", 0),
            ("extraordinary", 5),
        ],
    )
    def test_syllable_cases(self, spark, word, syl):
        from pandas_weights_spark.functions.quality import (
            syllable_count,
            syllable_count_sql,
        )

        got = (
            spark.range(1)
            .select(syllable_count(F.lit(word)).alias("s"))
            .first()["s"]
        )
        assert got == syl, word
        # DuckDB replay agrees
        import duckdb

        sql_v = duckdb.sql(
            f"SELECT {syllable_count_sql(repr(word))} AS s"
        ).fetchone()[0]
        assert sql_v == syl, word

    def test_row_local_plan(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_metrics,
        )

        df = spark.createDataFrame([("x y. z",)], "text string")
        m = readability_metrics(F.col("text"))
        plan = (
            df.select(*[v.alias(k) for k, v in m.items()])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestCompressionRatio:
    def test_differential_and_ordering(self, spark):
        import zlib

        from pandas_weights_spark.functions.quality import (
            compression_ratio,
        )

        texts = [
            "spam " * 200,                       # repetitive -> low
            "The quarterly report outlines revenue, margin shifts, "
            "and the hiring plan across four distinct regions.",
            "k9$Qz!vX2@pL7#mW4&nB8*cJ5^hT1%gR3(dF6)sY0yU+eI-oA=",
            "",
            None,
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "id long, text string",
        )
        rows = {
            r["id"]: r["cr"]
            for r in df.select(
                "id", compression_ratio(F.col("text")).alias("cr")
            ).collect()
        }
        for i, t in enumerate(texts):
            if not t:
                assert rows[i] is None, i
                continue
            b = t.encode("utf-8")
            exp = len(zlib.compress(b, 6)) / len(b)
            assert rows[i] == pytest.approx(exp, abs=1e-12), i
        assert rows[0] < rows[1] < rows[2]  # the signal's whole point

    def test_level_validation(self):
        from pandas_weights_spark.functions.quality import (
            compression_ratio,
        )

        with pytest.raises(ValueError):
            compression_ratio(F.col("x"), level=17)

    def test_arrow_batched_plan(self, spark):
        from pandas_weights_spark.functions.quality import (
            compression_ratio,
        )

        df = spark.createDataFrame([("abc",)], "text string")
        plan = (
            df.select(compression_ratio(F.col("text")).alias("c"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestReadabilityPanel:
    def test_panel_equals_metrics(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_metrics,
            readability_panel,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TestReadability.TEXTS)],
            "id long, text string",
        )
        m = readability_metrics(F.col("text"))
        a = (
            df.select("id", *[v.alias(k) for k, v in m.items()])
            .orderBy("id")
            .collect()
        )
        b = (
            readability_panel(df, "text")
            .select("id", *[k for k in m])
            .orderBy("id")
            .collect()
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_panel_single_syllable_fold(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_panel,
        )

        df = spark.createDataFrame([("a b. c",)], "text string")
        plan = (
            readability_panel(df, "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the syllable fold (the aeiouy vowel-group count) must not
        # replicate once per formula column: the fold carries 2
        # aeiouy-patterns (group count + silent-e test); the panel
        # keeps ≤2 fold copies (4 hits) where the naive per-metric
        # dict measures 8
        assert plan.count("aeiouy") <= 4, plan.count("aeiouy")
        assert "Exchange" not in plan


class TestReadabilityArrow:
    """r12: readability_panel(arrow=True) — the mapInPandas compiled-re
    twin must mirror the JVM rules EXACTLY (counts bit-equal, formulas
    IEEE-identical): Java-\\s token split after space-only trim, the
    re.ASCII initial rule, abbreviation table order, silent-e."""

    EDGE_ROWS = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "\t\n"),               # trim strips SPACES only -> 2 tokens
        (5, "Dr. Smith saw 3.14 cats. The U. S. tables were simple! "
            "mistake here"),
        (6, "word"),
        (7, "é À ütf"),
        (8, "DNA. test A. B. ok"),  # \b keeps DNA. splitting
        (9, "a  b\tc"),
        (10, "O'Neill co-op naïve"),
        (11, "Prof. X vs. Y etc. e.g. i.e. done"),
        (12, "queueing strengths rhythm style able table e"),
    ]
    COLS = [
        "n_words", "n_sentences", "n_syllables", "flesch", "fk_grade",
        "ari", "coleman_liau", "lix", "ttr",
    ]

    def test_arrow_equals_jvm_edges(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_panel,
        )

        df = spark.createDataFrame(self.EDGE_ROWS, "id long, t string")
        a = {
            r["id"]: r
            for r in readability_panel(df, "t").collect()
        }
        b = {
            r["id"]: r
            for r in readability_panel(df, "t", arrow=True).collect()
        }
        assert set(a) == set(b)
        for i in a:
            for c in self.COLS:
                assert a[i][c] == b[i][c], (i, c, a[i][c], b[i][c])

    def test_arrow_equals_jvm_fixture(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_panel,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        a = {
            r["doc_id"]: r
            for r in readability_panel(docs, "text").collect()
        }
        b = {
            r["doc_id"]: r
            for r in readability_panel(
                docs, "text", arrow=True
            ).collect()
        }
        assert set(a) == set(b) and a
        for i in a:
            for c in self.COLS:
                assert a[i][c] == b[i][c], (i, c, a[i][c], b[i][c])

    def test_arrow_zero_shuffle_plan(self, spark):
        from pandas_weights_spark.functions.quality import (
            readability_panel,
        )

        df = spark.createDataFrame([("a b. c",)], "text string")
        plan = (
            readability_panel(df, "text", arrow=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
