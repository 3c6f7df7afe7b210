"""Tests for text-analysis operators (functions/text.py)."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions import text as TX
from tests.conftest import approx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "der Hund und die Katze ist nicht hier"),
        (2, "le chat et la souris est dans les champs"),
        (3, ""),
        (4, "xyzzy"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def col_map(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


class TestTokens:
    def test_token_count(self, docs):
        m = col_map(docs.select("doc_id", TX.token_count(F.col("text")).alias("n")), "n")
        assert m[0] == 9
        assert m[3] == 0
        assert m[4] == 1

    def test_word_ngrams(self, spark):
        df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
        out = df.select(TX.word_ngrams(F.col("text"), 3).alias("g")).first()["g"]
        assert out == ["a b c", "b c d"]

    def test_word_ngrams_short_doc(self, spark):
        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        out = df.select(TX.word_ngrams(F.col("text"), 3).alias("g")).first()["g"]
        assert out == ["a b"]

    def test_char_ngrams(self, spark):
        df = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
        out = df.select(TX.char_ngrams(F.col("text"), 2).alias("g")).first()["g"]
        assert out == ["ab", "bc", "cd"]


class TestLangId:
    def test_lang_id(self, docs):
        m = col_map(docs.select("doc_id", TX.lang_id(F.col("text")).alias("l")), "l")
        assert m[0] == "en"
        assert m[1] == "de"
        assert m[2] == "fr"
        assert m[3] == "und"
        assert m[4] == "und"

    def test_occurrences(self, spark):
        df = spark.createDataFrame([(0, "a b a b a")], "doc_id long, text string")
        out = df.select(TX.occurrences(F.col("text"), "a").alias("n")).first()["n"]
        assert out == approx(3.0)


class TestQualityAndFingerprint:
    def test_quality_bounds(self, docs):
        m = col_map(
            docs.select("doc_id", TX.quality_score(F.col("text")).alias("q")), "q"
        )
        assert all(0.0 <= v <= 1.0 for v in m.values())
        assert m[3] == 0.0  # empty text
        assert m[0] > m[4]  # real sentence beats noise token

    def test_fingerprint_order_insensitive(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "gamma alpha beta"), (2, "alpha beta")],
            "doc_id long, text string",
        )
        m = col_map(df.select("doc_id", TX.fingerprint(F.col("text")).alias("f")), "f")
        assert m[0] == m[1]
        assert m[0] != m[2]


class TestBpeTokens:
    def test_counts(self, spark):
        from pandas_weights_spark.functions.text import bpe_token_count

        df = spark.createDataFrame(
            [("Hello, world! It's 2024",),
             ("",),
             ("one-two",)],
            "text string",
        )
        got = [
            r["n"]
            for r in df.select(bpe_token_count(F.col("text")).alias("n")).collect()
        ]
        # Hello , world ! It 's 2024 → 7 ; "" → 0 ; one - two → 3
        assert got == [7, 0, 3]


class TestPIIAndURLs:
    """PII counts/redaction + URL/domain extraction (text.py)."""

    SAMPLE = (
        "Contact alice.smith+x@corp.example.com or call 555-123-4567. "
        "Server at 10.0.42.7, SSN 123-45-6789. "
        "See https://docs.example.org/guide?x=1 and http://mirror.net/a b"
    )

    def test_pii_counts(self, spark):
        from pandas_weights_spark.functions.text import pii_counts

        df = spark.createDataFrame([(self.SAMPLE,)], "text string")
        c = pii_counts(F.col("text"))
        r = df.select(*[v.alias(k) for k, v in c.items()]).first()
        assert r["n_email"] == 1
        assert r["n_phone"] == 1
        assert r["n_ipv4"] == 1
        assert r["n_ssn"] == 1

    def test_redaction_removes_all(self, spark):
        from pandas_weights_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame([(self.SAMPLE,)], "text string")
        red = df.select(redact_pii(F.col("text")).alias("t"))
        r = red.select(
            *[v.alias(k) for k, v in pii_counts(F.col("t")).items()], "t"
        ).first()
        assert r["n_email"] == 0 and r["n_ssn"] == 0 and r["n_ipv4"] == 0
        assert "[PII]" in r["t"]
        assert "alice" not in r["t"] and "4567" not in r["t"]

    def test_redact_kind_subset(self, spark):
        from pandas_weights_spark.functions.text import redact_pii

        df = spark.createDataFrame([(self.SAMPLE,)], "text string")
        r = df.select(redact_pii(F.col("text"), kinds=["email"]).alias("t")).first()
        assert "@" not in r["t"]
        assert "123-45-6789" in r["t"]  # ssn untouched

    def test_urls_and_domains(self, spark):
        from pandas_weights_spark.functions.text import extract_urls, url_domain

        df = spark.createDataFrame([(self.SAMPLE,)], "text string")
        r = df.select(
            extract_urls(F.col("text")).alias("u"),
            F.transform(
                extract_urls(F.col("text")), lambda u: url_domain(u)
            ).alias("d"),
        ).first()
        assert r["u"] == [
            "https://docs.example.org/guide?x=1",
            "http://mirror.net/a",
        ]
        assert r["d"] == ["docs.example.org", "mirror.net"]

    def test_domain_stats(self, spark):
        from pandas_weights_spark.functions.text import domain_stats

        df = spark.createDataFrame(
            [
                (1, "see https://a.com/x and https://a.com/y", 2.0),
                (2, "https://a.com/z plus https://b.org/1", 3.0),
                (3, "no urls here", 1.0),
            ],
            "id long, text string, w double",
        )
        out = {
            r["domain"]: r
            for r in domain_stats(df, "text", F.col("w")).collect()
        }
        assert out["a.com"]["n_docs"] == 2
        assert out["a.com"]["weight_mass"] == 5.0
        # n_urls counts the urls OF THAT DOMAIN: doc 1 has two a.com
        # urls, doc 2 one — the multi-domain doc 2 contributes its
        # b.org url only to b.org (ADVICE r4 fix)
        assert out["a.com"]["n_urls"] == 3
        assert out["b.org"]["n_docs"] == 1
        assert out["b.org"]["n_urls"] == 1
        assert out["b.org"]["weight_mass"] == 3.0
        assert "no" not in out
        # corpus URL total == sum of per-domain counts (no overcount)
        assert sum(r["n_urls"] for r in out.values()) == 4

    def test_row_local_no_python(self, spark):
        from pandas_weights_spark.functions.text import pii_counts, redact_pii

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        c = pii_counts(F.col("text"))
        df = docs.select(
            redact_pii(F.col("text")).alias("t"),
            *[v.alias(k) for k, v in c.items()],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestNormalizeText:
    def test_canonicalizes_variants(self, spark):
        from pandas_weights_spark.functions.text import normalize_text

        df = spark.createDataFrame(
            [(1, "Hello,   World!"), (2, "hello world"),
             (3, "HELLO ... world?!")],
            "id long, text string",
        )
        out = {r["id"]: r["t"] for r in
               df.select("id", normalize_text(F.col("text")).alias("t")).collect()}
        assert out[1] == out[2] == out[3] == "hello world"

    def test_unicode_letters_kept(self, spark):
        from pandas_weights_spark.functions.text import normalize_text

        df = spark.createDataFrame([("Café Nr.5 — gut!",)], "text string")
        r = df.select(normalize_text(F.col("text")).alias("t")).first()
        assert r["t"] == "café nr 5 gut"

    def test_dedup_integration(self, spark):
        from pandas_weights_spark.functions.dedup import exact_dedup
        from pandas_weights_spark.functions.text import normalize_text

        df = spark.createDataFrame(
            [(1, "The cat."), (2, "the  CAT"), (3, "a dog")],
            "id long, text string",
        ).withColumn("norm", normalize_text(F.col("text")))
        out = exact_dedup(df, "norm", "id")
        assert sorted(r["id"] for r in out.collect()) == [1, 3]


class TestRemoveDuplicateLines:
    def test_keeps_first_occurrence(self, spark):
        from pandas_weights_spark.functions.text import remove_duplicate_lines

        doc = "header\nbody one\nheader\nbody two\nheader"
        df = spark.createDataFrame([(doc,)], "text string")
        out = df.select(
            remove_duplicate_lines(F.col("text")).alias("t")
        ).first()["t"]
        assert out == "header\nbody one\nbody two"

    def test_blank_lines_exempt(self, spark):
        from pandas_weights_spark.functions.text import remove_duplicate_lines

        doc = "a\n\nb\n\na"
        df = spark.createDataFrame([(doc,)], "text string")
        kept = df.select(
            remove_duplicate_lines(F.col("text")).alias("t")
        ).first()["t"]
        assert kept == "a\n\nb\n"  # both blanks survive, dup 'a' drops
        strict = df.select(
            remove_duplicate_lines(F.col("text"), keep_blank=False).alias("t")
        ).first()["t"]
        assert strict == "a\n\nb"

    def test_no_dups_identity(self, spark):
        from pandas_weights_spark.functions.text import remove_duplicate_lines

        doc = "x\ny\nz"
        df = spark.createDataFrame([(doc,)], "text string")
        assert df.select(
            remove_duplicate_lines(F.col("text")).alias("t")
        ).first()["t"] == doc

    def test_null_stays_null(self, spark):
        # ADVICE r5: concat_ws alone turned NULL docs into '' —
        # module convention is null-preserving
        from pandas_weights_spark.functions.text import remove_duplicate_lines

        df = spark.createDataFrame([(None,), ("a\na",)], "text string")
        out = [r["t"] for r in df.select(
            remove_duplicate_lines(F.col("text")).alias("t")
        ).collect()]
        assert sorted(out, key=lambda x: (x is not None, x)) == [None, "a"]


class TestUnigramLMScore:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, "the cat and the dog"),
            (3, "zq zzx qqy"),  # out-of-domain gibberish
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_python_reference(self, corpus):
        import math

        from pandas_weights_spark.functions.text import unigram_lm_score
        from pandas_weights_spark.functions.vocab import build_vocabulary

        vocab = build_vocabulary(corpus, "text", max_size=100)
        got = {
            r["doc_id"]: r
            for r in unigram_lm_score(
                corpus, "text", "doc_id", vocab, alpha=0.5
            ).collect()
        }
        # transparent reference
        texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
        mass = {}
        for t in texts.values():
            for w in t.lower().split():
                mass[w] = mass.get(w, 0) + 1
        W, V = sum(mass.values()), len(mass)
        denom = math.log(W + 0.5 * (V + 1))

        def lp(w):
            return math.log(mass.get(w, 0) + 0.5) - denom

        for d, t in texts.items():
            ws = t.lower().split()
            exp_mean = sum(lp(w) for w in ws) / len(ws)
            assert got[d]["n_tokens"] == len(ws)
            assert got[d]["logprob_mean"] == pytest.approx(exp_mean, rel=1e-12)
            assert got[d]["ppl"] == pytest.approx(
                math.exp(-exp_mean), rel=1e-12
            )

    def test_gibberish_scores_worse(self, corpus):
        from pandas_weights_spark.functions.text import unigram_lm_score
        from pandas_weights_spark.functions.vocab import build_vocabulary

        # train on the in-domain docs only, score everything
        vocab = build_vocabulary(
            corpus.where(F.col("doc_id") < 3), "text", max_size=100
        )
        ppl = {
            r["doc_id"]: r["ppl"]
            for r in unigram_lm_score(
                corpus, "text", "doc_id", vocab
            ).collect()
        }
        assert ppl[3] > max(ppl[0], ppl[1], ppl[2]) * 2

    def test_oov_uses_smoothed_bucket(self, spark, corpus):
        from pandas_weights_spark.functions.text import (
            unigram_logprobs,
        )
        from pandas_weights_spark.functions.vocab import build_vocabulary

        vocab = build_vocabulary(corpus, "text", max_size=100)
        lp, oov = unigram_logprobs(vocab, alpha=0.5)
        table_min = min(r["logp"] for r in lp.collect())
        assert oov < table_min  # OOV strictly less likely than any seen


class TestBigramLM:
    @pytest.fixture(scope="class")
    def model(self, spark):
        from pandas_weights_spark.functions.text import bigram_counts
        from pandas_weights_spark.functions.vocab import build_vocabulary

        corpus = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog")
             for i in range(20)]
            + [(100 + i, "the dog sleeps near the quick fox")
               for i in range(10)],
            "doc_id long, text string",
        )
        return (
            build_vocabulary(corpus, "text"),
            bigram_counts(corpus, "text"),
            corpus,
        )

    def test_matches_python_reference(self, model, spark):
        import math

        from pandas_weights_spark.functions.text import bigram_lm_score

        vocab, bg, corpus = model
        test = spark.createDataFrame(
            [(0, "the quick brown fox"), (1, "dog sleeps near the fox")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in bigram_lm_score(
                test, "text", "doc_id", vocab, bg,
                alpha=0.5, interp=0.7,
            ).collect()
        }
        # transparent reference: rebuild both models in Python
        uni = {r["term"]: r["mass"] for r in vocab.collect()}
        W, V = sum(uni.values()), len(uni)
        denom = W + 0.5 * (V + 1)
        p_uni = lambda w: (uni.get(w, 0) + 0.5) / denom  # noqa: E731
        bgm = {(r["w1"], r["w2"]): r["mass"] for r in bg.collect()}
        marg = {}
        for (w1, _), m in bgm.items():
            marg[w1] = marg.get(w1, 0) + m
        def p(w1, w2):
            pb = bgm.get((w1, w2), 0.0) / marg[w1] if w1 in marg else 0.0
            return 0.7 * pb + 0.3 * p_uni(w2)
        for did, text in [(0, "the quick brown fox"),
                          (1, "dog sleeps near the fox")]:
            ws = text.split()
            lps = [math.log(p(a, b)) for a, b in zip(ws, ws[1:])]
            exp = sum(lps) / len(lps)
            assert got[did]["logprob_mean"] == pytest.approx(exp, rel=1e-9)
            assert got[did]["ppl"] == pytest.approx(
                math.exp(-exp), rel=1e-9
            )
            assert got[did]["n_bigrams"] == len(lps)

    def test_word_order_discriminated(self, model, spark):
        # the whole point over the unigram model: scrambling tokens
        # keeps unigram ppl identical but must raise bigram ppl
        from pandas_weights_spark.functions.text import (
            bigram_lm_score,
            unigram_lm_score,
        )

        vocab, bg, _ = model
        test = spark.createDataFrame(
            [(0, "the quick brown fox jumps"),
             (1, "jumps brown the fox quick")],
            "doc_id long, text string",
        )
        b = {r["doc_id"]: r["ppl"] for r in bigram_lm_score(
            test, "text", "doc_id", vocab, bg).collect()}
        u = {r["doc_id"]: r["ppl"] for r in unigram_lm_score(
            test, "text", "doc_id", vocab).collect()}
        assert u[0] == pytest.approx(u[1], rel=1e-12)  # unigram blind
        assert b[0] < b[1] / 2  # bigram sees the scramble

    def test_single_token_doc_emits_no_row(self, model, spark):
        from pandas_weights_spark.functions.text import bigram_lm_score

        vocab, bg, _ = model
        test = spark.createDataFrame(
            [(0, "fox"), (1, ""), (2, "the fox")],
            "doc_id long, text string",
        )
        out = bigram_lm_score(test, "text", "doc_id", vocab, bg).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_interp_bounds(self, model, spark):
        from pandas_weights_spark.functions.text import bigram_lm_score

        vocab, bg, corpus = model
        with pytest.raises(ValueError, match="interp"):
            bigram_lm_score(
                corpus, "text", "doc_id", vocab, bg, interp=1.0
            )
        # interp=0 degenerates to the unigram model on transitions
        from pandas_weights_spark.functions.text import unigram_logprobs
        import math

        out = bigram_lm_score(
            corpus.limit(1), "text", "doc_id", vocab, bg, interp=0.0
        ).collect()[0]
        lp, oov = unigram_logprobs(vocab, 0.5)
        lpd = {r["term"]: r["logp"] for r in lp.collect()}
        ws = "the quick brown fox jumps over the lazy dog".split()
        exp = sum(lpd[w] for w in ws[1:]) / (len(ws) - 1)
        assert out["logprob_mean"] == pytest.approx(exp, rel=1e-9)


class TestTrigramLM:
    @pytest.fixture(scope="class")
    def model(self, spark):
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            trigram_counts,
        )
        from pandas_weights_spark.functions.vocab import build_vocabulary

        corpus = spark.createDataFrame(
            [(i, "u v w") for i in range(20)]
            + [(100 + i, "w v u") for i in range(20)]
            + [(200 + i, "the quick brown fox jumps over the lazy dog")
               for i in range(10)],
            "doc_id long, text string",
        )
        return (
            build_vocabulary(corpus, "text"),
            bigram_counts(corpus, "text"),
            trigram_counts(corpus, "text"),
            corpus,
        )

    def test_matches_python_reference(self, model, spark):
        import math

        from pandas_weights_spark.functions.text import trigram_lm_score

        vocab, bg, tg, _ = model
        test = spark.createDataFrame(
            [(0, "the quick brown fox"), (1, "u v w v u")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in trigram_lm_score(
                test, "text", "doc_id", vocab, bg, tg,
                alpha=0.5, lambda3=0.6, lambda2=0.3,
            ).collect()
        }
        uni = {r["term"]: r["mass"] for r in vocab.collect()}
        W, V = sum(uni.values()), len(uni)
        denom = W + 0.5 * (V + 1)
        p_uni = lambda w: (uni.get(w, 0) + 0.5) / denom  # noqa: E731
        bgm = {(r["w1"], r["w2"]): r["mass"] for r in bg.collect()}
        bmarg = {}
        for (w1, _), m in bgm.items():
            bmarg[w1] = bmarg.get(w1, 0) + m
        tgm = {(r["w1"], r["w2"], r["w3"]): r["mass"] for r in tg.collect()}
        tmarg = {}
        for (w1, w2, _), m in tgm.items():
            tmarg[(w1, w2)] = tmarg.get((w1, w2), 0) + m

        def p(a, b, c):
            pt = (
                tgm.get((a, b, c), 0.0) / tmarg[(a, b)]
                if (a, b) in tmarg else 0.0
            )
            pb = bgm.get((b, c), 0.0) / bmarg[b] if b in bmarg else 0.0
            return 0.6 * pt + 0.3 * pb + 0.1 * p_uni(c)

        for did, text in [(0, "the quick brown fox"), (1, "u v w v u")]:
            ws = text.split()
            lps = [
                math.log(p(a, b, c))
                for a, b, c in zip(ws, ws[1:], ws[2:])
            ]
            exp = sum(lps) / len(lps)
            assert got[did]["logprob_mean"] == pytest.approx(exp, rel=1e-9)
            assert got[did]["ppl"] == pytest.approx(math.exp(-exp),
                                                    rel=1e-9)
            assert got[did]["n_trigrams"] == len(lps)

    def test_discriminates_where_bigram_is_blind(self, model, spark):
        # STRONGER than the bigram order-discrimination test: both docs
        # have identical bigram-transition profiles ((u,v) then a
        # mass-20/mass-20 split out of v), so bigram ppl is EQUAL —
        # only the trigram context separates the corpus-attested
        # "u v w" from the never-seen triple "u v u"
        from pandas_weights_spark.functions.text import (
            bigram_lm_score,
            trigram_lm_score,
        )

        vocab, bg, tg, _ = model
        test = spark.createDataFrame(
            [(0, "u v w"), (1, "u v u")], "doc_id long, text string"
        )
        b = {r["doc_id"]: r["ppl"] for r in bigram_lm_score(
            test, "text", "doc_id", vocab, bg).collect()}
        t = {r["doc_id"]: r["ppl"] for r in trigram_lm_score(
            test, "text", "doc_id", vocab, bg, tg).collect()}
        # bigram blind: p(w|v) == p(u|v) == 0.5, p(v|u) shared
        assert b[0] == pytest.approx(b[1], rel=1e-9)
        # trigram separates by more than 1.5x
        assert t[0] < t[1] / 1.5

    def test_short_docs_emit_no_row(self, model, spark):
        from pandas_weights_spark.functions.text import trigram_lm_score

        vocab, bg, tg, _ = model
        test = spark.createDataFrame(
            [(0, "u v"), (1, ""), (2, "u v w")],
            "doc_id long, text string",
        )
        out = trigram_lm_score(
            test, "text", "doc_id", vocab, bg, tg
        ).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_lambda_guards_and_degenerate_unigram(self, model, spark):
        import math

        from pandas_weights_spark.functions.text import (
            trigram_lm_score,
            unigram_logprobs,
        )

        vocab, bg, tg, corpus = model
        for bad in [(-0.1, 0.3), (0.6, -0.1), (0.7, 0.3), (1.0, 0.0)]:
            with pytest.raises(ValueError, match="lambda"):
                trigram_lm_score(
                    corpus, "text", "doc_id", vocab, bg, tg,
                    lambda3=bad[0], lambda2=bad[1],
                )
        # lambda3 = lambda2 = 0 degenerates to the unigram model over
        # each triple's final token
        out = trigram_lm_score(
            corpus.where("doc_id = 200"), "text", "doc_id", vocab, bg,
            tg, lambda3=0.0, lambda2=0.0,
        ).collect()[0]
        lp, oov = unigram_logprobs(vocab, 0.5)
        lpd = {r["term"]: r["logp"] for r in lp.collect()}
        ws = "the quick brown fox jumps over the lazy dog".split()
        exp = sum(lpd[w] for w in ws[2:]) / (len(ws) - 2)
        assert out["logprob_mean"] == pytest.approx(exp, rel=1e-9)

    def test_mink_prob_matches_python_reference(self, model, spark):
        # r13: Min-K% Prob (Shi et al. 2023) — mean of the k% lowest
        # per-triple logprobs, per-triple values shared with
        # trigram_lm_score
        import math

        from pandas_weights_spark.functions.text import (
            mink_prob_score,
            trigram_lm_score,
        )

        vocab, bg, tg, _ = model
        # "u v w" is corpus-frequent; the alien tail triples are the
        # low-prob set Min-K% should isolate
        texts = [
            (0, "u v w u v w u v w zzz qqq xxx"),
            (1, "u v w u v w u v w u v w"),
        ]
        test = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in mink_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=0.25
            ).collect()
        }
        lm = {
            r["doc_id"]: r
            for r in trigram_lm_score(
                test, "text", "doc_id", vocab, bg, tg
            ).collect()
        }
        # python reference: recompute per-triple logprobs, sort, mean
        # the lowest ceil(0.25*n)
        uni = {r["term"]: r["mass"] for r in vocab.collect()}
        W, V = sum(uni.values()), len(uni)
        denom = W + 0.5 * (V + 1)
        bgm = {(r["w1"], r["w2"]): r["mass"] for r in bg.collect()}
        bmarg = {}
        for (w1, _), m in bgm.items():
            bmarg[w1] = bmarg.get(w1, 0) + m
        tgm = {
            (r["w1"], r["w2"], r["w3"]): r["mass"]
            for r in tg.collect()
        }
        tmarg = {}
        for (w1, w2, _), m in tgm.items():
            tmarg[(w1, w2)] = tmarg.get((w1, w2), 0) + m

        def p(a, b, c):
            pt = (
                tgm.get((a, b, c), 0.0) / tmarg[(a, b)]
                if (a, b) in tmarg else 0.0
            )
            pb = bgm.get((b, c), 0.0) / bmarg[b] if b in bmarg else 0.0
            pu = (uni.get(c, 0) + 0.5) / denom
            return 0.6 * pt + 0.3 * pb + 0.1 * pu

        for did, text in texts:
            ws = text.split()
            lps = sorted(
                math.log(p(a, b, c))
                for a, b, c in zip(ws, ws[1:], ws[2:])
            )
            kn = max(math.ceil(0.25 * len(lps)), 1)
            exp = sum(lps[:kn]) / kn
            assert got[did]["k_used"] == kn
            assert got[did]["n_trigrams"] == len(lps)
            assert got[did]["mink_logprob"] == pytest.approx(
                exp, rel=1e-9
            )
            assert got[did]["mink_ppl"] == pytest.approx(
                math.exp(-exp), rel=1e-9
            )
            # the defining inequality: the lowest-k mean never
            # exceeds the overall mean
            assert (
                got[did]["mink_logprob"]
                <= lm[did]["logprob_mean"] + 1e-12
            )
        # membership signal: the fully corpus-attested doc scores
        # far higher than the one with alien triples
        assert got[1]["mink_logprob"] > got[0]["mink_logprob"] + 1.0

    def test_mink_k_validation_and_k1(self, model, spark):
        from pandas_weights_spark.functions.text import (
            mink_prob_score,
            trigram_lm_score,
        )

        vocab, bg, tg, corpus = model
        for bad in (0.0, -0.2, 1.5):
            with pytest.raises(ValueError, match="k must be"):
                mink_prob_score(
                    corpus, "text", "doc_id", vocab, bg, tg, k=bad
                )
        # k=1.0 degenerates to the plain mean (bit-comparable at
        # rel tolerance; summation order differs sort vs stream)
        test = corpus.where("doc_id = 200")
        a = mink_prob_score(
            test, "text", "doc_id", vocab, bg, tg, k=1.0
        ).collect()[0]
        b = trigram_lm_score(
            test, "text", "doc_id", vocab, bg, tg
        ).collect()[0]
        assert a["k_used"] == a["n_trigrams"] == b["n_trigrams"]
        assert a["mink_logprob"] == pytest.approx(
            b["logprob_mean"], rel=1e-12
        )


class TestMinKPlusPlus:
    """r14: Min-K%++ (Zhang et al. 2024) — per-context z-normalized
    Min-K%. The planted fixture reproduces the paper's confound: raw
    Min-K% ranks a fully-attested member doc from a HIGH-ENTROPY
    context below an unseen-continuation doc from a deterministic
    context; the ++ normalization ranks them correctly."""

    @pytest.fixture(scope="class")
    def model(self, spark):
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            trigram_counts,
        )
        from pandas_weights_spark.functions.vocab import build_vocabulary

        # (h g) -> t0..t9 uniformly (entropy ~ln 10); (a b) -> c
        # deterministically; "q b e" gives the unseen continuation e
        # bigram support out of b
        corpus = spark.createDataFrame(
            [(10 * i + j, f"h g t{i}") for i in range(10)
             for j in range(2)]
            + [(200 + i, "a b c") for i in range(30)]
            + [(300 + i, "q b e") for i in range(20)],
            "doc_id long, text string",
        )
        return (
            build_vocabulary(corpus, "text"),
            bigram_counts(corpus, "text"),
            trigram_counts(corpus, "text"),
            corpus,
        )

    def _scores(self, spark, model, texts, k=1.0):
        from pandas_weights_spark.functions.text import (
            mink_prob_score,
            minkpp_prob_score,
        )

        vocab, bg, tg, _ = model
        test = spark.createDataFrame(texts, "doc_id long, text string")
        raw = {
            r["doc_id"]: r["mink_logprob"]
            for r in mink_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=k
            ).collect()
        }
        pp = {
            r["doc_id"]: r["mkpp_score"]
            for r in minkpp_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=k
            ).collect()
        }
        return raw, pp

    def test_fixes_the_entropy_confound(self, model, spark):
        # member: attested triple from the 10-way context (raw lp is
        # LOW because the context is high-entropy, not because the
        # doc is unseen). nonmember: unseen continuation of the
        # deterministic context, propped up by bigram support.
        raw, pp = self._scores(
            spark, model, [(0, "h g t3"), (1, "a b e")]
        )
        assert raw[0] < raw[1], raw     # raw MISRANKS (the confound)
        assert pp[0] > pp[1], pp        # ++ ranks member first

    def test_matches_python_reference(self, model, spark):
        # full-support recomputation of mu_c / sigma_c in python
        import math

        from pandas_weights_spark.functions.text import (
            minkpp_prob_score,
        )

        vocab, bg, tg, _ = model
        texts = [(0, "h g t3 a b c"), (1, "a b e q b e")]
        test = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in minkpp_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=0.5
            ).collect()
        }
        uni = {r["term"]: r["mass"] for r in vocab.collect()}
        W, V = sum(uni.values()), len(uni)
        denom = W + 0.5 * (V + 1)
        p_oov = 0.5 / denom
        bgm = {(r["w1"], r["w2"]): r["mass"] for r in bg.collect()}
        bmarg = {}
        for (w1, _), m in bgm.items():
            bmarg[w1] = bmarg.get(w1, 0) + m
        tgm = {
            (r["w1"], r["w2"], r["w3"]): r["mass"]
            for r in tg.collect()
        }
        tmarg = {}
        for (w1, w2, _), m in tgm.items():
            tmarg[(w1, w2)] = tmarg.get((w1, w2), 0) + m
        lu = 1.0 - 0.6 - 0.3

        def p(a, b, c):
            pt = (
                tgm.get((a, b, c), 0.0) / tmarg[(a, b)]
                if (a, b) in tmarg else 0.0
            )
            pb = bgm.get((b, c), 0.0) / bmarg[b] if b in bmarg else 0.0
            pu = (uni.get(c, 0) + 0.5) / denom
            return 0.6 * pt + 0.3 * pb + lu * pu

        def ctx_stats(a, b):
            # full support: every vocab term + the pooled OOV bucket
            qs = [p(a, b, z) for z in uni] + [lu * p_oov]
            m = sum(qs)
            s1 = sum(q * math.log(q) for q in qs)
            s2 = sum(q * math.log(q) ** 2 for q in qs)
            mu = s1 / m
            var = s2 / m - mu * mu
            return mu, max(math.sqrt(max(var, 0.0)), 1e-9)

        for did, text in texts:
            ws = text.split()
            ss = []
            for a, b, c in zip(ws, ws[1:], ws[2:]):
                mu, sd = ctx_stats(a, b)
                ss.append((math.log(p(a, b, c)) - mu) / sd)
            ss.sort()
            kn = max(math.ceil(0.5 * len(ss)), 1)
            exp = sum(ss[:kn]) / kn
            assert got[did]["k_used"] == kn
            assert got[did]["n_trigrams"] == len(ss)
            assert got[did]["mkpp_score"] == pytest.approx(
                exp, rel=1e-9
            ), (did, text)

    def test_include_mink_fusion_bit_identical(self, model, spark):
        # the fused single-scan path must reproduce BOTH standalone
        # statistics exactly (same per-triple lp expression tree)
        from pandas_weights_spark.functions.text import (
            mink_prob_score,
            minkpp_prob_score,
        )

        vocab, bg, tg, corpus = model
        test = corpus.where("doc_id IN (0, 10, 200, 205)")
        fused = {
            r["doc_id"]: r
            for r in minkpp_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=0.3,
                include_mink=True,
            ).collect()
        }
        raw = {
            r["doc_id"]: r
            for r in mink_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=0.3
            ).collect()
        }
        pp = {
            r["doc_id"]: r
            for r in minkpp_prob_score(
                test, "text", "doc_id", vocab, bg, tg, k=0.3
            ).collect()
        }
        assert set(fused) == set(raw) == set(pp) and fused
        for d in fused:
            assert fused[d]["mink_logprob"] == raw[d]["mink_logprob"]
            assert fused[d]["mink_ppl"] == raw[d]["mink_ppl"]
            assert fused[d]["mkpp_score"] == pp[d]["mkpp_score"]
            assert fused[d]["k_used"] == raw[d]["k_used"]

    def test_validation_and_short_docs(self, model, spark):
        from pandas_weights_spark.functions.text import (
            minkpp_prob_score,
        )

        vocab, bg, tg, corpus = model
        for bad in (0.0, -0.2, 1.5):
            with pytest.raises(ValueError, match="k must be"):
                minkpp_prob_score(
                    corpus, "text", "doc_id", vocab, bg, tg, k=bad
                )
        test = spark.createDataFrame(
            [(0, "h g"), (1, None), (2, "h g t1")],
            "doc_id long, text string",
        )
        out = minkpp_prob_score(
            test, "text", "doc_id", vocab, bg, tg
        ).collect()
        assert [r["doc_id"] for r in out] == [2]


class TestCorpusLineDedup:
    """remove_corpus_duplicate_lines — CCNet paragraph dedup +
    boilerplate removal (r7)."""

    @pytest.fixture(scope="class")
    def corpus_df(self, spark):
        nav = "Home | About | Contact"
        rows = [
            (1, f"{nav}\nunique one\n\nshared para\nfooter"),
            (2, f"{nav}\nunique two\nshared para\nfooter"),
            (3, f"{nav}\nunique three\nfooter"),
            (4, None),
            (5, "only here\nshared para"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_first_mode_keeps_global_first(self, spark, corpus_df):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        out = {
            r["doc_id"]: r
            for r in remove_corpus_duplicate_lines(
                corpus_df, "text", "doc_id", mode="first"
            ).collect()
        }
        # doc 1 (global first for nav/shared/footer) keeps everything,
        # INCLUDING its blank paragraph separator
        assert out[1]["text"] == (
            "Home | About | Contact\nunique one\n\nshared para\nfooter"
        )
        assert out[1]["n_removed"] == 0
        assert out[2]["text"] == "unique two" and out[2]["n_removed"] == 3
        assert out[3]["text"] == "unique three"
        assert out[4]["text"] == "" and out[4]["n_lines"] == 0
        assert out[5]["text"] == "only here"

    def test_boilerplate_mode_drops_everywhere(self, spark, corpus_df):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        out = {
            r["doc_id"]: r
            for r in remove_corpus_duplicate_lines(
                corpus_df, "text", "doc_id", mode="boilerplate",
                min_docs=3,
            ).collect()
        }
        # nav (3 docs), footer (3 docs), shared para (3 docs): gone
        # everywhere, including the first occurrence
        assert out[1]["text"] == "unique one\n"  # blank survives
        assert out[1]["n_removed"] == 3
        assert out[5]["text"] == "only here"
        # min_docs=4: only lines in >= 4 docs drop -> nothing does
        out4 = {
            r["doc_id"]: r
            for r in remove_corpus_duplicate_lines(
                corpus_df, "text", "doc_id", mode="boilerplate",
                min_docs=4,
            ).collect()
        }
        assert all(r["n_removed"] == 0 for r in out4.values())

    def test_scope_isolates_domains(self, spark):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        rows = [
            (1, "a.com", "footer\nx"),
            (2, "a.com", "footer\ny"),
            (3, "b.com", "footer\nz"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, dom string, text string"
        )
        out = {
            r["doc_id"]: r
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="boilerplate", min_docs=2,
                scope="dom",
            ).collect()
        }
        # footer repeats only within a.com; b.com's copy survives
        assert out[1]["text"] == "x" and out[2]["text"] == "y"
        assert out[3]["text"] == "footer\nz"

    def test_within_doc_repeat_first_mode(self, spark):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        df = spark.createDataFrame(
            [(1, "p\nq\np\np")], "doc_id long, text string"
        )
        out = remove_corpus_duplicate_lines(
            df, "text", "doc_id", mode="first"
        ).collect()[0]
        assert out["text"] == "p\nq" and out["n_removed"] == 2

    def test_numeric_doc_order(self, spark):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        df = spark.createDataFrame(
            [(20005, "dup"), (5, "dup")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="first"
            ).collect()
        }
        assert out[5]["text"] == "dup" and out[20005]["text"] == ""

    def test_guards_and_blank_handling(self, spark, corpus_df):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        with pytest.raises(ValueError, match="mode"):
            remove_corpus_duplicate_lines(
                corpus_df, "text", "doc_id", mode="nope"
            )
        with pytest.raises(ValueError, match="min_docs"):
            remove_corpus_duplicate_lines(
                corpus_df, "text", "doc_id", min_docs=1
            )
        # keep_blank=False: repeated blank lines dedup like any line
        df = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["text"]
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="first", keep_blank=False
            ).collect()
        }
        assert out[1] == "a\n\nb"      # first blank kept
        assert out[2] == "c\nd"        # second blank deduped


class TestCcnetNormalize:
    def _n(self, spark, vals):
        from pandas_weights_spark.functions.text import ccnet_normalize

        df = spark.createDataFrame([(v,) for v in vals], "t string")
        return [
            r["n"]
            for r in df.select(ccnet_normalize(F.col("t")).alias("n"))
            .collect()
        ]

    def test_folds_presentation_noise(self, spark):
        got = self._n(
            spark,
            [
                "Héllo,   Wörld! 42",
                "hello world 00",
                "  Crème brûlée — 2024!?  ",
                "...",
                "",
                None,
            ],
        )
        assert got[0] == "hello world 00"
        assert got[0] == got[1]  # digit + case + accent + punct folded
        assert got[2] == "creme brulee 0000"
        assert got[3] == ""  # pure punctuation -> empty key
        assert got[4] == ""
        assert got[5] is None

    def test_idempotent(self, spark):
        vals = ["MiXeD 123 çase!", "plain text"]
        once = self._n(spark, vals)
        twice = self._n(spark, once)
        assert once == twice

    def test_normalized_line_dedup(self, spark):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        rows = [
            (1, "Footer Text!\nunique a\n!!!"),
            (2, "FOOTER   TEXT\nunique b"),
            (3, "footer, text...\nunique c"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # exact keys: the three footer variants never match
        exact = {
            r["doc_id"]: r["n_removed"]
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="first"
            ).collect()
        }
        assert exact == {1: 0, 2: 0, 3: 0}
        # ccnet keys: variants fold; doc 1 keeps the ORIGINAL spelling
        out = {
            r["doc_id"]: r
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="first", normalize=True
            ).collect()
        }
        assert out[1]["text"] == "Footer Text!\nunique a\n!!!"
        assert out[1]["n_removed"] == 0  # punct-only line exempt
        assert out[2]["text"] == "unique b"
        assert out[3]["text"] == "unique c"

    def test_exact_dedup_ccnet_key(self, spark):
        from pandas_weights_spark.functions.dedup import exact_dedup

        rows = [
            (1, "The Quick: Brown Fox!"),
            (2, "the quick brown fox"),
            (3, "thé qüick brown fox ..."),
            (4, "a different document"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        default = exact_dedup(df, "text", "doc_id")
        assert sorted(r["doc_id"] for r in default.collect()) == [
            1, 2, 3, 4,
        ]  # lower+trim alone can't fold punctuation/accents
        ccnet = exact_dedup(df, "text", "doc_id", normalize="ccnet")
        assert sorted(r["doc_id"] for r in ccnet.collect()) == [1, 4]


class TestCorpusLineDedupCombined:
    def test_scope_plus_normalize(self, spark):
        # scope and ccnet normalization compose: folded variants dedup
        # WITHIN a domain, never across domains
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        rows = [
            (1, "a.com", "Footer, Text!\nxx one"),
            (2, "a.com", "FOOTER TEXT\nxx two"),
            (3, "b.com", "footer text...\nxx three"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, dom string, text string"
        )
        out = {
            r["doc_id"]: r["text"]
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="first", scope="dom",
                normalize=True,
            ).collect()
        }
        assert out[1] == "Footer, Text!\nxx one"   # first keeps original
        assert out[2] == "xx two"                  # folded dup dropped
        assert out[3] == "footer text...\nxx three"  # other domain intact

    def test_weighted_ngram_counts_with_cap(self, spark):
        # bigram/trigram caps with weight= flow through the salted
        # global cut identically to a plain orderBy().limit
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            trigram_counts,
        )

        docs = spark.createDataFrame(
            [(i, "u v w u v", float(i % 3 + 1)) for i in range(30)],
            "doc_id long, text string, w double",
        )
        from pyspark.sql import functions as FF

        bg = {(r["w1"], r["w2"]): r["mass"] for r in bigram_counts(
            docs, "text", max_bigrams=2, weight=FF.col("w")
        ).collect()}
        # Sum of weights = 30 docs with weights 1,2,3 repeating = 60;
        # 'u v' appears twice per doc, others once
        assert bg == {("u", "v"): 120.0, ("v", "w"): 60.0}
        tg = trigram_counts(docs, "text", max_trigrams=1,
                            weight=FF.col("w")).collect()
        assert len(tg) == 1 and tg[0]["mass"] == 60.0


class TestSplitSentences:
    """r8: rule-based sentence splitting (text.py split_sentences) —
    abbreviation/initial protection, decimal safety, sentinel restore,
    and the documented heuristic limits."""

    def _s(self, spark, t):
        from pandas_weights_spark.functions.text import split_sentences

        df = spark.createDataFrame([(t,)], ["t"])
        return df.select(split_sentences(F.col("t")).alias("s")).first()["s"]

    def test_basic_punctuation(self, spark):
        assert self._s(
            spark, "Hello world. This is fine! Is it? Yes."
        ) == ["Hello world.", "This is fine!", "Is it?", "Yes."]

    def test_abbreviations_protected(self, spark):
        assert self._s(
            spark, "Dr. Smith met Mr. Jones. They left."
        ) == ["Dr. Smith met Mr. Jones.", "They left."]

    def test_decimals_and_prices_intact(self, spark):
        assert self._s(
            spark, "Pi is 3.14 roughly. It costs $5.50 today."
        ) == ["Pi is 3.14 roughly.", "It costs $5.50 today."]

    def test_initials_protected(self, spark):
        assert self._s(
            spark, "U.S. economy grew. Second sentence."
        ) == ["U.S. economy grew.", "Second sentence."]

    def test_initial_protection_cost_documented(self, spark):
        # the single-capital rule cannot tell "met X." (sentence end)
        # from "X. Ray" (initial) — the classic rule-based trade-off:
        # a capital-initial period never splits
        assert self._s(
            spark, "He met Mr. X. Then he left."
        ) == ["He met Mr. X. Then he left."]

    def test_ellipsis_is_one_boundary(self, spark):
        assert self._s(spark, "Wait... Really? Yes.") == [
            "Wait...", "Really?", "Yes.",
        ]

    def test_trailing_fragment_kept(self, spark):
        assert self._s(spark, "Done. trailing fragment") == [
            "Done.", "trailing fragment",
        ]

    def test_newlines_split_and_empties_dropped(self, spark):
        assert self._s(spark, "One.\n\nTwo!  \n  ") == ["One.", "Two!"]

    def test_empty_and_null(self, spark):
        assert self._s(spark, "") == []
        from pandas_weights_spark.functions.text import split_sentences

        df = spark.createDataFrame([(None,)], "t string")
        assert (
            df.select(split_sentences(F.col("t")).alias("s")).first()["s"]
            is None
        )

    def test_sentinels_never_leak(self, spark):
        out = self._s(spark, "e.g. A. Mr. ok. Done? \x01literal\x02 x.")
        joined = "".join(out)
        # input control chars pass through only where the INPUT had
        # them; none are fabricated by the splitter on clean text
        clean = self._s(spark, "e.g. A. Mr. ok. Done?")
        assert all("\x02" not in s for s in clean)
        assert any(s for s in out)  # parses without error

    def test_duckdb_replay_identical(self, spark):
        import duckdb

        from pandas_weights_spark.functions.text import (
            split_sentences,
            split_sentences_sql,
        )

        texts = [
            "Hello world. This is fine! Is it? Yes.",
            "Dr. Smith met Mr. Jones at 3.14 pm. They left.",
            "e.g. keep. No. 5 is next. U.S. grew.",
            "no punctuation",
            "Line one.\nLine two? done...",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["i", "t"]
        )
        got = {
            r["i"]: r["s"]
            for r in df.select(
                "i", split_sentences(F.col("t")).alias("s")
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "c",
            __import__("pandas").DataFrame(
                {"i": range(len(texts)), "t": texts}
            ),
        )
        want = dict(
            con.execute(
                f"select i, {split_sentences_sql('t')} from c"
            ).fetchall()
        )
        assert got == want


class TestGeneralOrderNgramLM:
    """r8: ngram_counts / ngram_lm_score — the arbitrary-order
    Jelinek-Mercer generalization. Fixed-order parity with the
    bigram/trigram specializations is the main contract."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox leaps over the lazy cat"),
            (2, "a completely different sentence with novel words"),
            (3, "the quick brown fox jumps over the lazy dog again"),
            (4, "quick the fox brown dog lazy the over jumps"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _vocab(self, corpus):
        from pandas_weights_spark.functions.vocab import build_vocabulary

        return build_vocabulary(corpus, "text", max_size=1000)

    def test_order2_matches_bigram_lm_score(self, spark, corpus):
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            bigram_lm_score,
            ngram_counts,
            ngram_lm_score,
        )

        v = self._vocab(corpus)
        bg_old = bigram_counts(corpus, "text", max_bigrams=100)
        bg_new = ngram_counts(corpus, "text", 2, max_ngrams=100)
        # same capped table (as sets)
        a = {(r["w1"], r["w2"], r["mass"]) for r in bg_old.collect()}
        b = {(r["w1"], r["w2"], r["mass"]) for r in bg_new.collect()}
        assert a == b
        old = {
            r["doc_id"]: r["ppl"]
            for r in bigram_lm_score(
                corpus, "text", "doc_id", v, bg_old,
                alpha=0.5, interp=0.7,
            ).collect()
        }
        new = {
            r["doc_id"]: r["ppl"]
            for r in ngram_lm_score(
                corpus, "text", "doc_id", v, {2: bg_new}, {2: 0.7},
                alpha=0.5,
            ).collect()
        }
        assert set(old) == set(new)
        for k in old:
            assert new[k] == pytest.approx(old[k], rel=1e-9)

    def test_order32_matches_trigram_lm_score(self, spark, corpus):
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            ngram_counts,
            ngram_lm_score,
            trigram_counts,
            trigram_lm_score,
        )

        v = self._vocab(corpus)
        bg = bigram_counts(corpus, "text", max_bigrams=100)
        tg = trigram_counts(corpus, "text", max_trigrams=100)
        old = {
            r["doc_id"]: (r["n_trigrams"], r["ppl"])
            for r in trigram_lm_score(
                corpus, "text", "doc_id", v, bg, tg,
                alpha=0.5, lambda3=0.6, lambda2=0.3,
            ).collect()
        }
        new = {
            r["doc_id"]: (r["n_ngrams"], r["ppl"])
            for r in ngram_lm_score(
                corpus, "text", "doc_id", v,
                {3: ngram_counts(corpus, "text", 3, 100), 2: bg},
                {3: 0.6, 2: 0.3}, alpha=0.5,
            ).collect()
        }
        assert set(old) == set(new)
        for k in old:
            assert new[k][0] == old[k][0]
            assert new[k][1] == pytest.approx(old[k][1], rel=1e-9)

    def test_order5_discriminates_novel_quintuples(self, spark, corpus):
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )

        # train the tables on docs 0-3 ONLY; doc 4 is held out — it
        # reuses the training WORDS (unigram-blind) in a novel order,
        # so its quintuples and pairs are unseen and it must fall to
        # the unigram floor, while doc 0's quintuples are attested
        train = corpus.where(F.col("doc_id") < 4)
        v = self._vocab(train)
        t5 = ngram_counts(train, "text", 5, 1000)
        t2 = ngram_counts(train, "text", 2, 1000)
        ppl = {
            r["doc_id"]: r["ppl"]
            for r in ngram_lm_score(
                corpus, "text", "doc_id", v, {5: t5, 2: t2},
                {5: 0.5, 2: 0.3},
            ).collect()
        }
        assert ppl[4] > 2.0 * ppl[0]

    def test_short_docs_emit_no_row(self, spark):
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )
        from pandas_weights_spark.functions.vocab import build_vocabulary

        df = spark.createDataFrame(
            [(0, "only four words here"), (1, "a b c d e")],
            "doc_id long, text string",
        )
        v = build_vocabulary(df, "text", max_size=100)
        out = ngram_lm_score(
            df, "text", "doc_id", v,
            {5: ngram_counts(df, "text", 5, 100)}, {5: 0.5},
        )
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_guards(self, spark, corpus):
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )

        v = self._vocab(corpus)
        t2 = ngram_counts(corpus, "text", 2, 100)
        with pytest.raises(ValueError, match="n must be >= 2"):
            ngram_counts(corpus, "text", 1)
        with pytest.raises(ValueError, match="same orders"):
            ngram_lm_score(
                corpus, "text", "doc_id", v, {2: t2}, {3: 0.5}
            )
        with pytest.raises(ValueError, match="unigram floor"):
            ngram_lm_score(
                corpus, "text", "doc_id", v, {2: t2}, {2: 1.0}
            )


class TestKneserNey:
    """r10 (VERDICT r9 #2 carried item): smoothing='kn' — interpolated
    Kneser-Ney with continuation counts, checked bit-exact against an
    independent pure-Python reference, plus the held-out-perplexity
    claim (KN <= JM on the fixture) and the validation surface."""

    CORPUS = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "a cat and a dog sat here"),
        (3, "the cat ate the fish and the dog ate the bone"),
        (4, "cats and dogs sat on mats"),
    ]
    HELD = [
        (10, "the cat sat on the rug"),
        (11, "a dog ate the fish"),
    ]

    @staticmethod
    def _py_kn(corpus, held, D=0.75, alpha=0.5):
        """Independent interpolated-KN (Chen & Goodman 1999 shape),
        written from the formula — continuation counts for the lower
        order, alpha-pooled continuation-unigram base."""
        import collections
        import math

        bi = collections.Counter()
        tri = collections.Counter()
        for _, s in corpus:
            w = s.lower().split()
            for i in range(len(w) - 1):
                bi[(w[i], w[i + 1])] += 1
            for i in range(len(w) - 2):
                tri[(w[i], w[i + 1], w[i + 2])] += 1
        c1 = collections.Counter(b for _, b in bi)
        den0 = len(bi) + alpha * (len(c1) + 1)
        cc2 = collections.Counter((b, c) for _, b, c in tri)
        cm2, cnd2 = collections.Counter(), collections.Counter()
        for (b, _), n in cc2.items():
            cm2[b] += n
            cnd2[b] += 1
        m3, nd3 = collections.Counter(), collections.Counter()
        for (a, b, _), n in tri.items():
            m3[(a, b)] += n
            nd3[(a, b)] += 1

        def p_kn(a, b, c):
            p = (c1.get(c, 0) + alpha) / den0
            if b in cm2:
                p = (
                    max(cc2.get((b, c), 0) - D, 0) / cm2[b]
                    + D * cnd2[b] / cm2[b] * p
                )
            if (a, b) in m3:
                p = (
                    max(tri.get((a, b, c), 0) - D, 0) / m3[(a, b)]
                    + D * nd3[(a, b)] / m3[(a, b)] * p
                )
            return p

        out = {}
        for did, s in held:
            w = s.lower().split()
            lps = [
                math.log(p_kn(w[i], w[i + 1], w[i + 2]))
                for i in range(len(w) - 2)
            ]
            out[did] = (len(lps), sum(lps) / len(lps))
        return out

    def test_matches_python_reference_bit_exact(self, spark):
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )

        df = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        held = spark.createDataFrame(self.HELD, ["doc_id", "text"])
        t2 = ngram_counts(df, "text", 2, max_ngrams=100000)
        t3 = ngram_counts(df, "text", 3, max_ngrams=100000)
        got = {
            r["doc_id"]: (r["n_ngrams"], r["logprob_mean"])
            for r in ngram_lm_score(
                held, "text", "doc_id", None, {2: t2, 3: t3},
                None, alpha=0.5, smoothing="kn", discount=0.75,
            ).collect()
        }
        want = self._py_kn(self.CORPUS, self.HELD)
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == want[k][1], k  # bit-exact

    def test_kn_beats_jm_on_held_out(self, spark):
        # the Kneser-Ney motivation (the "san francisco" effect):
        # 'francisco' is token-frequent but appears after exactly one
        # context, so JM's raw-count unigram floor overrates it and
        # starves versatile words; KN's continuation counts give the
        # versatile words the mass instead — held-out perplexity on
        # unseen-but-plausible bigrams must come out lower for KN
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )
        from pandas_weights_spark.functions.vocab import (
            build_vocabulary,
        )

        train_rows = [(0, ("san francisco " * 12).strip())] + [
            (i + 1, s)
            for i, s in enumerate(
                [
                    "the cat sat on the mat",
                    "a cat ran to the door",
                    "the dog sat by a door",
                    "a dog ran in the park",
                    "the bird sat on a wall",
                    "one bird ran past the gate",
                ]
            )
        ]
        held_rows = [
            (10, "one dog sat past a mat"),
            (11, "the bird ran by a door"),
        ]
        df = spark.createDataFrame(train_rows, ["doc_id", "text"])
        held = spark.createDataFrame(held_rows, ["doc_id", "text"])
        t2 = ngram_counts(df, "text", 2, max_ngrams=100000)
        v = build_vocabulary(df, "text", max_size=1000)
        kn = {
            r["doc_id"]: r["ppl"]
            for r in ngram_lm_score(
                held, "text", "doc_id", None, {2: t2},
                None, alpha=0.5, smoothing="kn",
            ).collect()
        }
        jm = {
            r["doc_id"]: r["ppl"]
            for r in ngram_lm_score(
                held, "text", "doc_id", v, {2: t2}, {2: 0.7},
                alpha=0.5,
            ).collect()
        }
        # corpus-level claim (the standard one): mean held-out
        # perplexity — doc 10 is where the effect lives (its unseen
        # bigrams fall to the floor both models provide), doc 11 is
        # mostly-seen bigrams and nearly ties
        kn_mean = sum(kn.values()) / len(kn)
        jm_mean = sum(jm.values()) / len(jm)
        assert kn_mean < jm_mean, (kn_mean, jm_mean)
        assert kn[10] < jm[10], (kn[10], jm[10])

    def test_kn_bigram_only_order(self, spark):
        # N=2: top order raw counts + continuation-unigram base only
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )

        df = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        t2 = ngram_counts(df, "text", 2, max_ngrams=100000)
        out = ngram_lm_score(
            df, "text", "doc_id", None, {2: t2}, None,
            smoothing="kn",
        )
        rows = out.collect()
        assert len(rows) == len(self.CORPUS)
        assert all(r["ppl"] > 0 for r in rows)

    def test_validation_surface(self, spark):
        from pandas_weights_spark.functions.text import (
            ngram_counts,
            ngram_lm_score,
        )

        df = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        t2 = ngram_counts(df, "text", 2, max_ngrams=100)
        t4 = ngram_counts(df, "text", 4, max_ngrams=100)
        with pytest.raises(ValueError, match="consecutive"):
            ngram_lm_score(
                df, "text", "doc_id", None, {2: t2, 4: t4}, None,
                smoothing="kn",
            )
        with pytest.raises(ValueError, match="lambdas"):
            ngram_lm_score(
                df, "text", "doc_id", None, {2: t2}, {2: 0.5},
                smoothing="kn",
            )
        with pytest.raises(ValueError, match="discount"):
            ngram_lm_score(
                df, "text", "doc_id", None, {2: t2}, None,
                smoothing="kn", discount=1.5,
            )
        with pytest.raises(ValueError, match="smoothing"):
            ngram_lm_score(
                df, "text", "doc_id", None, {2: t2}, {2: 0.5},
                smoothing="wb",
            )


class TestNgramLangId:
    """r10 frontier slab: trainable char-n-gram language ID
    (Cavnar-Trenkle profile + add-one multinomial NB) and the U+FFFD
    replacement counter."""

    TRAIN = [
        ("en", "the quick brown fox jumps over the lazy dog and the cat"),
        ("en", "this is another english sentence with the usual words"),
        ("fr", "le renard brun saute par dessus le chien paresseux et le chat"),
        ("fr", "ceci est une autre phrase avec les mots habituels"),
        ("de", "der schnelle braune fuchs springt über den faulen hund"),
        ("de", "dies ist ein weiterer deutscher satz mit den üblichen wörtern"),
    ]

    def test_discriminates_real_languages(self, spark):
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
            ngram_lang_id,
        )

        df = spark.createDataFrame(self.TRAIN, ["lang", "text"])
        prof = char_ngram_lang_profile(df, "text", "lang", n=3,
                                       top_k=200)
        held = spark.createDataFrame(
            [
                (0, "the dog jumps over the fox"),
                (1, "le chat saute par dessus le chien"),
                (2, "der hund springt über den fuchs"),
            ],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: r["pred_lang"]
            for r in ngram_lang_id(
                held, "text", "doc_id", prof, n=3
            ).collect()
        }
        assert got == {0: "en", 1: "fr", 2: "de"}

    def test_und_when_no_gram_hits(self, spark):
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
            ngram_lang_id,
        )

        df = spark.createDataFrame(self.TRAIN, ["lang", "text"])
        prof = char_ngram_lang_profile(df, "text", "lang", n=3,
                                       top_k=10)
        held = spark.createDataFrame(
            [(9, "XXXXQQQQZZZZ")], ["doc_id", "text"]
        )
        row = ngram_lang_id(held, "text", "doc_id", prof).first()
        assert row["pred_lang"] == "und" and row["score"] is None

    def test_single_label_profile(self, spark):
        # r11 (ADVICE): F.greatest asserts >= 2 columns, so a
        # one-label profile (an is-this-English check) used to crash
        # with a bare AssertionError
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
            ngram_lang_id,
        )

        df = spark.createDataFrame(
            [t for t in self.TRAIN if t[0] == "en"], ["lang", "text"]
        )
        prof = char_ngram_lang_profile(df, "text", "lang", n=3,
                                       top_k=200)
        held = spark.createDataFrame(
            [(0, "the quick brown fox"), (1, "XXXXQQQQZZZZ")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: (r["pred_lang"], r["score"])
            for r in ngram_lang_id(
                held, "text", "doc_id", prof, n=3
            ).collect()
        }
        assert got[0][0] == "en" and got[0][1] is not None
        assert got[1] == ("und", None)

    def test_empty_profile_raises(self, spark):
        from pandas_weights_spark.functions.text import ngram_lang_id

        empty = spark.createDataFrame(
            [], "label string, gram string, mass double"
        )
        held = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="at least one label"):
            ngram_lang_id(held, "text", "doc_id", empty, n=3)

    def test_profile_capped_and_deterministic(self, spark):
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
        )

        df = spark.createDataFrame(self.TRAIN, ["lang", "text"])
        a = char_ngram_lang_profile(df, "text", "lang", n=3, top_k=5)
        rows = a.collect()
        per = {}
        for r in rows:
            per.setdefault(r["label"], []).append(
                (r["gram"], r["mass"])
            )
        assert all(len(v) <= 5 for v in per.values())
        b = {
            (r["label"], r["gram"], r["mass"])
            for r in char_ngram_lang_profile(
                df.repartition(7), "text", "lang", n=3, top_k=5
            ).collect()
        }
        assert {(r["label"], r["gram"], r["mass"]) for r in rows} == b

    def test_tie_break_lexicographic(self, spark):
        # two labels with IDENTICAL training text -> identical
        # profiles and scores; the lexicographically first label wins
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
            ngram_lang_id,
        )

        df = spark.createDataFrame(
            [("aa", "same text here"), ("bb", "same text here")],
            ["lang", "text"],
        )
        prof = char_ngram_lang_profile(df, "text", "lang", n=3,
                                       top_k=50)
        held = spark.createDataFrame(
            [(0, "same text here")], ["doc_id", "text"]
        )
        row = ngram_lang_id(held, "text", "doc_id", prof).first()
        assert row["pred_lang"] == "aa"

    def test_utf8_replacement_count(self, spark):
        from pandas_weights_spark.functions.text import (
            utf8_replacement_count,
        )

        df = spark.createDataFrame(
            [("clean text",), ("one � here",), ("��",), ("",)],
            ["t"],
        )
        got = [
            r["c"]
            for r in df.select(
                utf8_replacement_count(F.col("t")).alias("c")
            ).collect()
        ]
        assert got == [0, 1, 2, 0]


class TestModifiedKneserNey:
    """r10: smoothing='mkn' — KenLM's default: count-bucketed
    D1/D2/D3+ discounts with the 3-term backoff weight, estimated
    from count-of-counts of UNCAPPED tables or passed explicitly."""

    # Corpus engineered so BOTH estimation sources have a healthy
    # count-of-counts tail (n1 > n2 > n3 > n4 >= 1 keeps every
    # discount in its (0, k] band):
    #   * trigram counts  {1: 15, 2: 4, 3: 2, 4: 1}
    #   * order-2 continuation counts (distinct predecessors per
    #     (b, c) bigram) {1: 6, 2: 3, 3: 2, 4: 1}
    # built from 3-token sentences, each contributing exactly one
    # trigram type with a chosen multiplicity and predecessor set.
    @staticmethod
    def _gen_corpus():
        types = []
        for j in range(6):  # six (b, c) bigrams, one predecessor each
            types.append((f"p{j}", f"b{j}", f"c{j}"))
        for j in range(3):  # three bigrams with two predecessors
            for a in range(2):
                types.append((f"q{j}{a}", f"d{j}", f"e{j}"))
        for j in range(2):  # two bigrams with three predecessors
            for a in range(3):
                types.append((f"r{j}{a}", f"f{j}", f"g{j}"))
        for a in range(4):  # one bigram with four predecessors
            types.append((f"s{a}", "h", "i"))
        mult = [4, 3, 3, 2, 2, 2, 2] + [1] * 15  # n1..n4 = 15,4,2,1
        corpus, i = [], 0
        for (a, b, c), m in zip(types, mult):
            for _ in range(m):
                corpus.append((i, f"{a} {b} {c}"))
                i += 1
        return corpus

    HELD = [
        (100, "p0 b0 c0"),       # the count-4 trigram
        (101, "q00 d0 e0"),      # a count-2 trigram
        (102, "s0 h i"),         # count-1 trigram in the cc=4 bigram
        (103, "zz b0 c0"),       # OOV predecessor: order-2 hit only
        (104, "p0 b0 c0 zz"),    # 2nd tuple falls through to base
    ]

    @staticmethod
    def _py_mkn(corpus, held, alpha=0.5, explicit=None):
        import collections
        import math

        bi = collections.Counter()
        tri = collections.Counter()
        for _, s in corpus:
            w = s.lower().split()
            for i in range(len(w) - 1):
                bi[(w[i], w[i + 1])] += 1
            for i in range(len(w) - 2):
                tri[(w[i], w[i + 1], w[i + 2])] += 1
        cc2 = collections.Counter((b, c) for _, b, c in tri)

        def est(counts):
            n = collections.Counter(counts.values())
            n1, n2, n3, n4 = (float(n[j]) for j in (1, 2, 3, 4))
            y = n1 / (n1 + 2 * n2)
            return (
                1 - 2 * y * n2 / n1,
                2 - 3 * y * n3 / n2,
                3 - 4 * y * n4 / n3,
            )

        ds2 = explicit[2] if explicit else est(cc2)
        ds3 = explicit[3] if explicit else est(tri)

        def disc(c, ds):
            return ds[0] if c == 1 else (ds[1] if c == 2 else ds[2])

        c1 = collections.Counter(b for _, b in bi)
        den0 = len(bi) + alpha * (len(c1) + 1)
        cm2 = collections.Counter()
        k2 = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
        for (b, _), n in cc2.items():
            cm2[b] += n
            k2[b][0 if n == 1 else (1 if n == 2 else 2)] += 1
        m3 = collections.Counter()
        k3 = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
        for (a, b, _), n in tri.items():
            m3[(a, b)] += n
            k3[(a, b)][0 if n == 1 else (1 if n == 2 else 2)] += 1

        def p_mkn(a, b, c):
            p = (c1.get(c, 0) + alpha) / den0
            if b in cm2:
                n = cc2.get((b, c), 0)
                bw = (
                    ds2[0] * k2[b][0] + ds2[1] * k2[b][1]
                    + ds2[2] * k2[b][2]
                ) / cm2[b]
                num = max(n - disc(n, ds2), 0) / cm2[b] if n else 0.0
                p = num + bw * p
            if (a, b) in m3:
                n = tri.get((a, b, c), 0)
                bw = (
                    ds3[0] * k3[(a, b)][0] + ds3[1] * k3[(a, b)][1]
                    + ds3[2] * k3[(a, b)][2]
                ) / m3[(a, b)]
                num = max(n - disc(n, ds3), 0) / m3[(a, b)] if n else 0.0
                p = num + bw * p
            return p

        out = {}
        for did, s in held:
            w = s.lower().split()
            lps = [
                math.log(p_mkn(w[i], w[i + 1], w[i + 2]))
                for i in range(len(w) - 2)
            ]
            out[did] = (len(lps), sum(lps) / len(lps))
        return out

    def _frames(self, spark):
        from pandas_weights_spark.functions.text import ngram_counts

        df = spark.createDataFrame(self._gen_corpus(), ["doc_id", "text"])
        held = spark.createDataFrame(self.HELD, ["doc_id", "text"])
        t2 = ngram_counts(df, "text", 2, max_ngrams=1000000)
        t3 = ngram_counts(df, "text", 3, max_ngrams=1000000)
        return df, held, t2, t3

    def test_estimated_matches_python_reference(self, spark):
        from pandas_weights_spark.functions.text import ngram_lm_score

        _, held, t2, t3 = self._frames(spark)
        got = {
            r["doc_id"]: (r["n_ngrams"], r["logprob_mean"])
            for r in ngram_lm_score(
                held, "text", "doc_id", None, {2: t2, 3: t3},
                None, alpha=0.5, smoothing="mkn",
            ).collect()
        }
        want = self._py_mkn(self._gen_corpus(), self.HELD)
        assert got == want  # bit-exact

    def test_explicit_discounts_match_reference(self, spark):
        from pandas_weights_spark.functions.text import ngram_lm_score

        _, held, t2, t3 = self._frames(spark)
        ds = {2: (0.4, 1.1, 1.8), 3: (0.5, 1.2, 2.1)}
        got = {
            r["doc_id"]: (r["n_ngrams"], r["logprob_mean"])
            for r in ngram_lm_score(
                held, "text", "doc_id", None, {2: t2, 3: t3},
                None, alpha=0.5, smoothing="mkn", discounts=ds,
            ).collect()
        }
        want = self._py_mkn(self._gen_corpus(), self.HELD, explicit=ds)
        assert got == want

    def test_estimator_public_and_capped_raises(self, spark):
        from pandas_weights_spark.functions.text import (
            mkn_discounts,
            ngram_counts,
            ngram_lm_score,
        )

        df = spark.createDataFrame(self._gen_corpus(), ["doc_id", "text"])
        # max_ngrams=None: the UNCAPPED table — the at-scale estimator
        # input (no top-k stage at all); same rows as a cap above the
        # vocabulary size
        t3 = ngram_counts(df, "text", 3, max_ngrams=None)
        t3_capped = ngram_counts(df, "text", 3, max_ngrams=1000000)
        assert sorted(map(tuple, t3.collect())) == sorted(
            map(tuple, t3_capped.collect())
        )
        d1, d2, d3 = mkn_discounts(t3, "mass")
        assert 0 < d1 <= 1 and 0 < d2 <= 2 and 0 < d3 <= 3
        # a top-k cap cuts the count-1 tail: estimation must fail LOUD
        capped = ngram_counts(df, "text", 3, max_ngrams=5)
        held = spark.createDataFrame(self.HELD, ["doc_id", "text"])
        t2 = ngram_counts(df, "text", 2, max_ngrams=1000000)
        with pytest.raises(ValueError, match="count-of-counts"):
            ngram_lm_score(
                held, "text", "doc_id", None, {2: t2, 3: capped},
                None, smoothing="mkn",
            ).collect()

    def test_discounts_validation(self, spark):
        from pandas_weights_spark.functions.text import ngram_lm_score

        _, held, t2, t3 = self._frames(spark)
        with pytest.raises(ValueError, match="cover exactly"):
            ngram_lm_score(
                held, "text", "doc_id", None, {2: t2, 3: t3},
                None, smoothing="mkn", discounts={2: (0.4, 1.1, 1.8)},
            )
        with pytest.raises(ValueError, match="three positive"):
            ngram_lm_score(
                held, "text", "doc_id", None, {2: t2, 3: t3},
                None, smoothing="mkn",
                discounts={2: (0.4, 1.1, 1.8), 3: (0.5, -1.0, 2.0)},
            )


class TestCcnetPplBuckets:
    """r10: ccnet_ppl_buckets — CCNet's rank-based head/middle/tail
    perplexity cut per shard (Wenzek et al. 2019 §4.4)."""

    def test_assignment_uneven_groups_and_ties(self, spark):
        from pandas_weights_spark.functions.text import ccnet_ppl_buckets

        # group a: 7 rows -> ntile(3) = 3,2,2; two ppl ties broken by id
        rows = (
            [(i, "a", float(v)) for i, v in
             enumerate([5.0, 1.0, 3.0, 3.0, 9.0, 2.0, 7.0])]
            + [(10 + i, "b", float(v)) for i, v in enumerate([4.0, 4.0])]
        )
        df = spark.createDataFrame(rows, ["doc_id", "g", "ppl"])
        got = {
            r["doc_id"]: (r["bucket"], r["keep"])
            for r in ccnet_ppl_buckets(
                df, "ppl", "doc_id", by=["g"]
            ).collect()
        }
        # a sorted by (ppl, id): 1(1.0) 5(2.0) 2(3.0) 3(3.0) 0(5.0)
        #                        6(7.0) 4(9.0) -> head:3 middle:2 tail:2
        assert got[1] == ("head", True)
        assert got[5] == ("head", True)
        assert got[2] == ("head", True)
        assert got[3] == ("middle", True)
        assert got[0] == ("middle", True)
        assert got[6] == ("tail", False)
        assert got[4] == ("tail", False)
        # b: tie on ppl -> id order; 2 rows over 3 buckets -> head, middle
        assert got[10] == ("head", True)
        assert got[11] == ("middle", True)

    def test_custom_buckets_and_keep(self, spark):
        from pandas_weights_spark.functions.text import ccnet_ppl_buckets

        df = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(4)],
            ["doc_id", "g", "ppl"],
        )
        got = [
            (r["bucket"], r["keep"])
            for r in ccnet_ppl_buckets(
                df, "ppl", "doc_id", by=["g"], n_buckets=2,
                labels=("lo", "hi"), keep=("lo",),
            ).orderBy("doc_id").collect()
        ]
        assert got == [("lo", True), ("lo", True),
                       ("hi", False), ("hi", False)]

    def test_validation(self, spark):
        from pandas_weights_spark.functions.text import ccnet_ppl_buckets

        df = spark.createDataFrame([(0, "g", 1.0)], ["doc_id", "g", "ppl"])
        with pytest.raises(ValueError, match="n_buckets"):
            ccnet_ppl_buckets(df, "ppl", "doc_id", by=["g"], n_buckets=1)
        with pytest.raises(ValueError, match="distinct names"):
            ccnet_ppl_buckets(
                df, "ppl", "doc_id", by=["g"], labels=("a", "a", "b")
            )
        with pytest.raises(ValueError, match="keep labels"):
            ccnet_ppl_buckets(
                df, "ppl", "doc_id", by=["g"], keep=("nope",)
            )
        with pytest.raises(ValueError, match="grouping column"):
            ccnet_ppl_buckets(df, "ppl", "doc_id", by=[])


class TestSentenceLangMix:
    """r10: sentence_lang_mix — per-doc language mixture from
    per-sentence n-gram LID."""

    def _profile(self, spark):
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
        )

        train = spark.createDataFrame(
            [("aa", "aaa bab aab abba baab aa ab")] * 3
            + [("zz", "zzz yzy zzy zyyz yzzy zz zy")] * 3,
            ["lang", "text"],
        )
        return char_ngram_lang_profile(train, "text", "lang", n=3)

    def test_mixture_rollup(self, spark):
        from pandas_weights_spark.functions.text import sentence_lang_mix

        prof = self._profile(spark)
        docs = spark.createDataFrame(
            [
                (0, "aaa bab aab. zzz yzy zzy. aab abba baab."),
                (1, "zzz yzy. aaa bab."),   # 1-1 tie -> 'aa' (lex)
                (2, "aaa aab abba"),        # single sentence
                (3, ""),                    # no sentences -> no row
            ],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: (
                r["n_sentences"], r["majority_lang"],
                r["majority_frac"], r["n_langs"],
            )
            for r in sentence_lang_mix(
                docs, "text", "doc_id", prof, labels=["aa", "zz"]
            ).collect()
        }
        assert set(got) == {0, 1, 2}
        assert got[0] == (3, "aa", 2.0 / 3.0, 2)
        assert got[1] == (2, "aa", 0.5, 2)
        assert got[2] == (1, "aa", 1.0, 1)

    def test_matches_per_sentence_ngram_lang_id(self, spark):
        # the rollup must agree with classifying each sentence
        # separately through the public ngram_lang_id
        from pandas_weights_spark.functions.text import (
            ngram_lang_id,
            sentence_lang_mix,
        )

        prof = self._profile(spark)
        docs = spark.createDataFrame(
            [(0, "aaa bab aab. zzz yzy zzy. qqq qqq."),
             (1, "zyyz yzzy. zzy zyyz.")],
            ["doc_id", "text"],
        )
        sents = spark.createDataFrame(
            [(0, 0, "aaa bab aab."), (0, 1, "zzz yzy zzy."),
             (0, 2, "qqq qqq."),  # no profile gram hits -> 'und'
             (1, 0, "zyyz yzzy."), (1, 1, "zzy zyyz.")],
            ["doc_id", "sent_idx", "text"],
        )
        indiv = ngram_lang_id(
            sents.select(
                F.concat_ws("#", "doc_id", "sent_idx").alias("sid"),
                "text",
            ),
            "text", "sid", prof, labels=["aa", "zz"],
        ).collect()
        import collections

        want = collections.defaultdict(collections.Counter)
        for r in indiv:
            want[int(r["sid"].split("#")[0])][r["pred_lang"]] += 1
        got = {
            r["doc_id"]: (
                r["n_sentences"], r["majority_lang"], r["n_langs"]
            )
            for r in sentence_lang_mix(
                docs, "text", "doc_id", prof, labels=["aa", "zz"]
            ).collect()
        }
        for did, c in want.items():
            maj = min(c, key=lambda k: (-c[k], k))
            assert got[did] == (sum(c.values()), maj, len(c))


class TestUnicodeNormalize:
    """r11 (VERDICT r10 'What's missing' #3): NFC/NFKC normalization
    for dedup keys — fullwidth forms, ligatures, combining marks."""

    def _n(self, spark, vals, **kw):
        df = spark.createDataFrame(
            [(v,) for v in vals], "t string"
        )
        return [
            r["n"]
            for r in df.select(
                TX.unicode_normalize(F.col("t"), **kw).alias("n")
            ).collect()
        ]

    def test_forms(self, spark):
        fw = "Ｈｅｌｌｏ　Ｗｏｒｌｄ！４２"
        lig = "ﬁle"
        comb = "café"
        got = self._n(spark, [fw, lig, comb, "ascii", "", None])
        assert got[0] == "Hello World!42"
        assert got[1] == "file"
        assert got[2] == "café"  # NFKC composes e + U+0301
        assert got[3] == "ascii" and got[4] == "" and got[5] is None
        # NFC: canonical only — fullwidth/ligature stay
        nfc = self._n(spark, [fw, lig, comb], form="NFC")
        assert nfc[0] == fw and nfc[1] == lig and nfc[2] == "café"

    def test_invalid_form_raises(self, spark):
        with pytest.raises(ValueError, match="NFC/NFD/NFKC/NFKD"):
            TX.unicode_normalize(F.col("t"), "nfkc")

    def test_ccnet_key_folds_fullwidth_copies(self, spark):
        # noised CJK/fullwidth copies fold onto their originals
        pairs = [
            ("Ｈｅｌｌｏ　Ｗｏｒｌｄ！　４２", "Hello, World 42"),
            ("中文　文档　１２３。", "中文 文档 123."),
            ("Caﬀé ﬁne", "caffé fine"),
        ]
        df = spark.createDataFrame(pairs, "a string, b string")
        rows = df.select(
            TX.ccnet_normalize(
                F.col("a"), normalize_unicode="NFKC"
            ).alias("ka"),
            TX.ccnet_normalize(
                F.col("b"), normalize_unicode="NFKC"
            ).alias("kb"),
        ).collect()
        for r in rows:
            assert r["ka"] == r["kb"], (r["ka"], r["kb"])

    def test_ascii_is_fixed_point_of_option(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(50)
        rows = docs.select(
            TX.ccnet_normalize(F.col("text")).alias("plain"),
            TX.ccnet_normalize(
                F.col("text"), normalize_unicode="NFKC"
            ).alias("nfkc"),
        ).collect()
        assert all(r["plain"] == r["nfkc"] for r in rows)


class TestLuhnCreditCards:
    """r11: Luhn-gated credit-card PII — the checksum gate keeps
    order ids / ISBNs intact where pure patterns over-scrub."""

    CASES = [
        ("pay 4111 1111 1111 1111 now", ["4111 1111 1111 1111"]),
        ("bogus 4111-1111-1111-1112 here", []),           # bad check
        ("amex 378282246310005 visa 4012888888881881",
         ["378282246310005", "4012888888881881"]),
        ("order 1234567890123 ref", []),                  # 13d non-Luhn
        ("short 4111 1111 done", []),                     # too few
        ("", []),
    ]

    def test_detection_and_redaction(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(self.CASES)],
            "i int, t string",
        )
        rows = {
            r["i"]: r
            for r in df.select(
                "i",
                TX.credit_card_numbers(F.col("t")).alias("cc"),
                TX.redact_credit_cards(F.col("t")).alias("red"),
            ).collect()
        }
        for i, (t, expect) in enumerate(self.CASES):
            assert rows[i]["cc"] == expect, t
            red = t
            for m in sorted(set(expect)):
                red = red.replace(m, "[CC]")
            assert rows[i]["red"] == red, t

    def test_null_propagates(self, spark):
        df = spark.createDataFrame([(None,)], "t string")
        r = df.select(
            TX.credit_card_numbers(F.col("t")).alias("cc"),
            TX.redact_credit_cards(F.col("t")).alias("red"),
        ).first()
        assert r["cc"] is None and r["red"] is None

    def test_sql_differential(self, spark):
        import duckdb

        con = duckdb.connect()
        sql = TX.credit_card_numbers_sql("t")
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(self.CASES)],
            "i int, t string",
        )
        got = {
            r["i"]: r["cc"]
            for r in df.select(
                "i", TX.credit_card_numbers(F.col("t")).alias("cc")
            ).collect()
        }
        for i, (t, _) in enumerate(self.CASES):
            rep = con.execute(
                f"SELECT {sql} FROM (SELECT ? AS t)", [t]
            ).fetchone()[0]
            assert rep == got[i], t


class TestLidArrow:
    """arrow=True LID paths — exact model parity (integer counts) and
    scoring parity (round-6 scores, identical labels) vs the JVM
    oracle-reference path, on the real sf0.01 documents."""

    def test_profile_arrow_equals_jvm(self, spark):
        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        )
        jvm = sorted(
            map(
                tuple,
                char_ngram_lang_profile(
                    docs, "text", "lang", n=3, top_k=40
                ).collect(),
            )
        )
        arw = sorted(
            map(
                tuple,
                char_ngram_lang_profile(
                    docs, "text", "lang", n=3, top_k=40, arrow=True
                ).collect(),
            )
        )
        assert jvm == arw

    def test_classify_arrow_equals_jvm(self, spark):
        from pyspark.sql import functions as F

        from pandas_weights_spark.functions.text import (
            char_ngram_lang_profile,
            ngram_lang_id,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        )
        prof = char_ngram_lang_profile(
            docs.where(F.col("doc_id") % 5 != 0), "text", "lang",
            n=3, top_k=40,
        )
        labels = ["de", "en", "es", "fr", "zh"]
        held = docs.where(F.col("doc_id") % 5 == 0)
        jvm = {
            r["doc_id"]: r
            for r in ngram_lang_id(
                held, "text", "doc_id", prof, labels=labels
            ).collect()
        }
        arw = {
            r["doc_id"]: r
            for r in ngram_lang_id(
                held, "text", "doc_id", prof, labels=labels,
                arrow=True,
            ).collect()
        }
        assert set(jvm) == set(arw)
        for i in jvm:
            assert jvm[i]["pred_lang"] == arw[i]["pred_lang"], i
            a, b = jvm[i]["score"], arw[i]["score"]
            if a is None:
                assert b is None, i
            else:
                assert b == pytest.approx(a, abs=2e-6), i


class TestNgramCountsArrow:
    @pytest.mark.parametrize("n,cap", [(2, 5000), (3, 5000), (2, None)])
    def test_arrow_equals_jvm(self, spark, n, cap):
        from pandas_weights_spark.functions.text import ngram_counts

        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        )
        jvm = sorted(
            map(
                tuple,
                ngram_counts(
                    docs, "text", n, max_ngrams=cap
                ).collect(),
            )
        )
        arw = sorted(
            map(
                tuple,
                ngram_counts(
                    docs, "text", n, max_ngrams=cap, arrow=True
                ).collect(),
            )
        )
        assert jvm == arw

    def test_whitespace_edge_parity(self, spark):
        # tab-led token and trailing whitespace: F.trim strips only
        # ASCII spaces and F.split keeps the resulting empty edge
        # tokens — the Arrow kernel must reproduce both
        from pandas_weights_spark.functions.text import ngram_counts

        docs = spark.createDataFrame(
            [("\ta b",), ("x y \t",), ("p q r",), ("   ",)],
            "text string",
        )
        jvm = sorted(
            map(tuple, ngram_counts(docs, "text", 2).collect())
        )
        arw = sorted(
            map(
                tuple,
                ngram_counts(docs, "text", 2, arrow=True).collect(),
            )
        )
        assert jvm == arw

    def test_null_weight_parity(self, spark):
        # r12 ADVICE: NULL weights must be SKIPPED like the JVM
        # F.sum skips NULL __w__ contributions — not crash the
        # Counter with '+= None'
        from pandas_weights_spark.functions.text import ngram_counts

        docs = spark.createDataFrame(
            [
                ("a b c", 2.0),
                ("a b d", None),
                ("a b c", 1.5),
                ("e f", None),
            ],
            "text string, w double",
        )
        jvm = sorted(
            map(
                tuple,
                ngram_counts(
                    docs, "text", 2, weight=F.col("w")
                ).collect(),
            ),
            key=str,
        )
        arw = sorted(
            map(
                tuple,
                ngram_counts(
                    docs, "text", 2, weight=F.col("w"), arrow=True
                ).collect(),
            ),
            key=str,
        )
        assert jvm == arw
        # mixed-weight grams sum the non-NULL mass; grams seen ONLY
        # under NULL weights keep a NULL-mass row (JVM F.sum rule)
        d = {(a, b): m for a, b, m in jvm}
        assert d[("a", "b")] == 3.5
        assert d[("b", "d")] is None
        assert d[("e", "f")] is None


class TestCorpusLinesScoped:
    """remove_corpus_duplicate_lines(scope=) — per-host line identity:
    two sites sharing a footer must not dedup against each other."""

    def test_scope_bounds_boilerplate(self, spark):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        rows = [
            (0, "a", "alpha\nSHARED FOOTER"),
            (1, "a", "beta\nSHARED FOOTER"),
            (2, "b", "gamma\nSHARED FOOTER"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, host string, text string"
        )
        unscoped = {
            r["doc_id"]: r["text"]
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="boilerplate", min_docs=2
            ).collect()
        }
        scoped = {
            r["doc_id"]: r["text"]
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="boilerplate", min_docs=2,
                scope="host",
            ).collect()
        }
        # unscoped: the footer appears in 3 distinct docs -> gone
        assert unscoped == {0: "alpha", 1: "beta", 2: "gamma"}
        # scoped: host a has it twice (dropped), host b once (kept)
        assert scoped == {
            0: "alpha",
            1: "beta",
            2: "gamma\nSHARED FOOTER",
        }

    def test_scope_first_mode(self, spark):
        from pandas_weights_spark.functions.text import (
            remove_corpus_duplicate_lines,
        )

        rows = [
            (0, "a", "dup line\nx"),
            (1, "a", "dup line\ny"),
            (2, "b", "dup line\nz"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, host string, text string"
        )
        out = {
            r["doc_id"]: r["text"]
            for r in remove_corpus_duplicate_lines(
                df, "text", "doc_id", mode="first", scope="host"
            ).collect()
        }
        # per-scope first occurrence: doc 0 keeps it (first in a),
        # doc 1 loses it, doc 2 keeps it (first AND only in b)
        assert out == {0: "dup line\nx", 1: "y", 2: "dup line\nz"}


class TestPunktAbbreviations:
    """r12: train_sentence_abbreviations (Kiss & Strunk 2006 type
    score, NLTK formulation) + split_sentences_trained."""

    FILLER = " ".join(
        f"common word number {i} appears in running prose without"
        " stops" for i in range(6)
    )

    def _corpus(self, spark):
        rows = [
            (
                k,
                f"{self.FILLER}. The dept. budget and Dr. Lee met the"
                " dept. team near the dept. office with approx. forty"
                " approx. fifty and e.g. cases while the dog ran and"
                f" the dog slept and a dog. barked {self.FILLER}.",
            )
            for k in range(8)
        ]
        return spark.createDataFrame(rows, "i long, text string")

    def test_evidence_classes(self, spark):
        from pandas_weights_spark.functions.text import (
            train_sentence_abbreviations,
        )

        m = {
            r["abbrev"]: r
            for r in train_sentence_abbreviations(
                self._corpus(spark), "text", min_count=2
            ).collect()
        }
        # short type, internal-period type, mid-length type classify
        assert m["dr"]["is_abbrev"] is True
        assert m["e.g"]["is_abbrev"] is True
        assert m["dept"]["is_abbrev"] is True
        # the bare-occurrence penalty zeroes the ambiguous word
        assert m["dog"]["is_abbrev"] is False
        assert m["dog"]["n_bare"] > 0
        # long type needs far more evidence than 16 dotted uses
        assert m["approx"]["is_abbrev"] is False

    def test_negative_zero_normalized(self, spark):
        # r12 driver red: the ambiguous word ("dog") has large
        # NEGATIVE ll and f_penalty underflows to +0, so the raw
        # score is IEEE -0.0; the engine must emit BIT-positive 0.0
        # (sign-of-zero normalization, text.py score + 0.0) so the
        # driver's exact value hash matches a float-native oracle
        # that applies the same + 0.0.
        import math

        from pandas_weights_spark.functions.text import (
            train_sentence_abbreviations,
        )

        rows = {
            r["abbrev"]: r
            for r in train_sentence_abbreviations(
                self._corpus(spark), "text", min_count=2
            ).collect()
        }
        dog = rows["dog"]
        assert dog["score"] == 0.0
        # the actual bit check: copysign exposes -0.0
        assert math.copysign(1.0, dog["score"]) == 1.0
        # every emitted zero in the model is positive-zero
        for r in rows.values():
            if r["score"] == 0.0:
                assert math.copysign(1.0, r["score"]) == 1.0, r

    def test_pure_python_differential(self, spark):
        import math
        import re
        from collections import Counter

        from pandas_weights_spark.functions.text import (
            train_sentence_abbreviations,
        )

        rows = self._corpus(spark).collect()
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        cand = re.compile(r"^[A-Za-z][A-Za-z.]*\.$")
        toks = [
            w
            for r in rows
            for w in ws.split(r["text"].strip(" "))
            if w
        ]
        N = float(len(toks))
        nper = float(sum(1 for w in toks if w.endswith(".")))
        c_dot, c_bare = Counter(), Counter()
        for w in toks:
            if cand.match(w):
                c_dot[w[:-1].lower()] += 1
            else:
                c_bare[w.lower()] += 1
        expect = {}
        p0 = min(max(nper / N, 1e-9), 1.0 - 1e-9)
        for t, cd in c_dot.items():
            if cd < 2 or not re.match(r"^[a-z][a-z.]*$", t):
                continue
            cb = c_bare.get(t, 0)
            l0 = cd * math.log(p0) + cb * math.log(1.0 - p0)
            l1 = cd * math.log(0.99) + cb * math.log(1.0 - 0.99)
            ll = -2.0 * (l0 - l1)
            n_int = t.count(".")
            np_ = len(t) - n_int + 1
            score = (
                ll * math.exp(-np_) * (n_int + 1) * np_ ** (-cb)
            )
            expect[t] = (cd, cb, round(score, 6), score >= 0.3)
        got = {
            r["abbrev"]: (
                r["n_dot"], r["n_bare"], r["score"], r["is_abbrev"]
            )
            for r in train_sentence_abbreviations(
                self._corpus(spark), "text", min_count=2
            ).collect()
        }
        assert got == expect and expect

    def test_stage2_collocations_differential(self, spark):
        # pure-Python replay of train_sentence_collocations (Kiss &
        # Strunk token stage, Dunning dependence LLR) on a corpus
        # with a planted "No. 5" ordinal pattern
        import math
        import re
        from collections import Counter

        from pandas_weights_spark.functions.text import (
            train_sentence_collocations,
        )

        rows = self._corpus2(spark).collect()
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        typ = lambda w: re.sub(r"[.!?]+$", "", w).lower()
        docs = [
            [w for w in ws.split(r["text"].strip(" ")) if w]
            for r in rows
        ]
        toks = [w for d in docs for w in d]
        N = float(len(toks))
        tc = Counter(typ(w) for w in toks if typ(w))
        pairs = Counter()
        for d in docs:
            for a, b in zip(d, d[1:]):
                if a.endswith(".") and typ(a) and typ(b):
                    pairs[(typ(a), typ(b))] += 1

        def cl(x):
            return min(max(x, 1e-9), 1.0 - 1e-9)

        def llr(nab, na, nb, n):
            p = cl(nb / max(n, 1.0))
            p1 = cl(nab / max(na, 1.0))
            p2 = cl((nb - nab) / max(n - na, 1.0))
            s1 = nab * math.log(p) + (na - nab) * math.log(1.0 - p)
            s2 = nab * math.log(p1) + (na - nab) * math.log(1.0 - p1)
            s3 = (nb - nab) * math.log(p) + (
                n - na - nb + nab
            ) * math.log(1.0 - p)
            s4 = (nb - nab) * math.log(p2) + (
                n - na - nb + nab
            ) * math.log(1.0 - p2)
            return -2.0 * (s1 + s3 - s2 - s4)

        expect = {}
        for (w1, w2), nab in pairs.items():
            if nab < 2:
                continue
            s = llr(float(nab), float(tc[w1]), float(tc[w2]), N)
            expect[(w1, w2)] = (
                nab, tc[w1], tc[w2], round(s, 6) + 0.0, s >= 7.88
            )
        got = {
            (r["w1"], r["w2"]): (
                r["n_pair"], r["n_w1"], r["n_w2"], r["score"],
                r["is_collocation"],
            )
            for r in train_sentence_collocations(
                self._corpus2(spark), "text", max_pairs=1_000_000
            ).collect()
        }
        assert got == expect and expect
        assert got[("no", "5")][4] is True

    def test_stage2_starters_differential(self, spark):
        import math
        import re
        from collections import Counter

        from pandas_weights_spark.functions.text import (
            train_sentence_starters,
        )

        ab = ("dept",)
        rows = self._corpus2(spark).collect()
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        typ = lambda w: re.sub(r"[.!?]+$", "", w).lower()
        docs = [
            [w for w in ws.split(r["text"].strip(" ")) if w]
            for r in rows
        ]
        toks = [w for d in docs for w in d]
        N = float(len(toks))
        tc = Counter(typ(w) for w in toks if typ(w))
        st, cap, low = Counter(), Counter(), Counter()
        nb = 0
        for d in docs:
            for a, b in zip(d, d[1:]):
                if not typ(b):
                    continue
                bnd = bool(re.search(r"[.!?]$", a)) and not (
                    a.endswith(".") and typ(a) in ab
                )
                if bnd:
                    nb += 1
                    st[typ(b)] += 1
                else:
                    if re.match(r"^[A-Z]", b):
                        cap[typ(b)] += 1
                    if re.match(r"^[a-z]", b):
                        low[typ(b)] += 1

        def cl(x):
            return min(max(x, 1e-9), 1.0 - 1e-9)

        def llr(nab, na, nb_, n):
            p = cl(nb_ / max(n, 1.0))
            p1 = cl(nab / max(na, 1.0))
            p2 = cl((nb_ - nab) / max(n - na, 1.0))
            s1 = nab * math.log(p) + (na - nab) * math.log(1.0 - p)
            s2 = nab * math.log(p1) + (na - nab) * math.log(1.0 - p1)
            s3 = (nb_ - nab) * math.log(p) + (
                n - na - nb_ + nab
            ) * math.log(1.0 - p)
            s4 = (nb_ - nab) * math.log(p2) + (
                n - na - nb_ + nab
            ) * math.log(1.0 - p2)
            return -2.0 * (s1 + s3 - s2 - s4)

        expect = {}
        for w, ns in st.items():
            if ns < 2:
                continue
            s = llr(float(ns), float(nb), float(tc[w]), N)
            expect[w] = (
                ns, tc[w], cap[w], low[w],
                round(s, 6) + 0.0, s >= 30.0,
            )
        got = {
            r["starter"]: (
                r["n_start"], r["n_total"], r["n_cap_internal"],
                r["n_low_internal"], r["score"], r["is_starter"],
            )
            for r in train_sentence_starters(
                self._corpus2(spark), "text", abbrevs=ab,
                max_starters=1_000_000,
            ).collect()
        }
        assert got == expect and expect
        # "then" opens sentences constantly and is lowercase
        # internally — flagged, with the ortho counts to prove it
        assert got["then"][5] is True
        assert got["then"][3] > 0

    def _corpus2(self, spark):
        # stage-2 fixture: "No. 5" ordinals (collocation), "Then"
        # sentence openers (starter; also appears lowercase
        # internally for the ortho tallies), a dept. abbreviation
        # (boundary exclusion via abbrevs), plus the stage-1 filler
        rows = [
            (
                k,
                f"{self.FILLER}. We filed No. 5 and No. 7 again"
                " and then rested. Then we began anew. The dept."
                " budget held. Then we slept. He said no to the"
                f" plan. Then came rain. {self.FILLER}.",
            )
            for k in range(8)
        ]
        return spark.createDataFrame(rows, "i long, text string")

    def test_punkt_splitter_token_stage(self, spark):
        from pandas_weights_spark.functions.text import (
            split_sentences_punkt,
            split_sentences_trained,
        )

        t = spark.createDataFrame(
            [(
                "He saw No. 5 today. Ask the dept. Then we left."
                " The dept. budget rose. the dept. then it broke.",
            )],
            ["text"],
        )
        kw = dict(
            abbrevs=["dept"],
            collocations=[("no", "5")],
            starters=["then"],
        )
        got = t.select(
            split_sentences_punkt(F.col("text"), **kw).alias("s")
        ).first()["s"]
        assert got == [
            # collocation: "No. 5" never splits
            "He saw No. 5 today.",
            # starter override: capitalized "Then" after the trained
            # abbreviation IS a boundary
            "Ask the dept.",
            "Then we left.",
            # no starter after "dept." -> abbreviation protects
            "The dept. budget rose.",
            # lowercase "then" fails the orthographic gate
            "the dept. then it broke.",
        ]
        # stage 1 alone gets the middle case wrong (one sentence)
        base = t.select(
            split_sentences_trained(
                F.col("text"), ["dept"]
            ).alias("s")
        ).first()["s"]
        assert "Ask the dept. Then we left." in base
        # and splits the ordinal
        assert "He saw No." in base

    def test_train_punkt_end_to_end(self, spark):
        # one call trains both stages and the dict feeds the splitter
        from pandas_weights_spark.functions.text import (
            split_sentences_punkt,
            train_punkt,
        )

        # union of the stage-1 corpus (dense abbreviation evidence)
        # and the stage-2 corpus (ordinals + starters)
        both = self._corpus(spark).unionByName(self._corpus2(spark))
        model = train_punkt(both, "text")
        assert "dept" in model["abbrevs"]
        assert ("no", "5") in model["collocations"]
        assert "then" in model["starters"]
        # require_ortho: "then" is seen lowercase internally, kept;
        # with the gate off the list can only grow
        loose = train_punkt(both, "text", require_ortho=False)
        assert set(model["starters"]) <= set(loose["starters"])
        t = spark.createDataFrame(
            [("We filed No. 5 today. Ask the dept. Then we left.",)],
            ["text"],
        )
        got = t.select(
            split_sentences_punkt(F.col("text"), **model).alias("s")
        ).first()["s"]
        assert got == [
            "We filed No. 5 today.",
            "Ask the dept.",
            "Then we left.",
        ]

    def test_punkt_splitter_degenerate_models(self, spark):
        # empty collocations/starters degrade EXACTLY to the trained
        # splitter; empty abbrevs disable the override path
        from pandas_weights_spark.functions.text import (
            split_sentences_punkt,
            split_sentences_trained,
        )

        t = spark.createDataFrame(
            [("Dr. X left. The dept. budget rose. No. 5 ran.",)],
            ["text"],
        )
        a = t.select(
            split_sentences_punkt(F.col("text"), ["dept"]).alias("s")
        ).first()["s"]
        b = t.select(
            split_sentences_trained(F.col("text"), ["dept"]).alias("s")
        ).first()["s"]
        assert a == b
        c = t.select(
            split_sentences_punkt(
                F.col("text"), [], starters=["the"]
            ).alias("s")
        ).first()["s"]
        assert "The dept." in " ".join(c)

    def test_trained_splitter_protects_learned_types(self, spark):
        from pandas_weights_spark.functions.text import (
            split_sentences,
            split_sentences_trained,
            train_sentence_abbreviations,
        )

        ab = [
            r["abbrev"]
            for r in train_sentence_abbreviations(
                self._corpus(spark), "text", min_count=2
            ).collect()
            if r["is_abbrev"]
        ]
        assert "dept" in ab
        t = spark.createDataFrame(
            [("The dept. budget rose fast. Dr. Lee left e.g. early.",)],
            ["text"],
        )
        fixed = t.select(
            split_sentences(F.col("text")).alias("s")
        ).first()["s"]
        trained = t.select(
            split_sentences_trained(F.col("text"), ab).alias("s")
        ).first()["s"]
        # the fixed table already knows Dr. and e.g.; only the
        # trained model knows dept.
        assert fixed == [
            "The dept.", "budget rose fast.",
            "Dr. Lee left e.g. early.",
        ]
        assert trained == [
            "The dept. budget rose fast.",
            "Dr. Lee left e.g. early.",
        ]

    def test_trained_splitter_empty_list_and_decimals(self, spark):
        from pandas_weights_spark.functions.text import (
            split_sentences,
            split_sentences_trained,
        )

        t = spark.createDataFrame(
            [("Pi is 3.14 here. Another sentence! Done?",)], ["text"]
        )
        a = t.select(
            split_sentences_trained(F.col("text"), []).alias("s")
        ).first()["s"]
        b = t.select(
            split_sentences(F.col("text")).alias("s")
        ).first()["s"]
        assert a == b == [
            "Pi is 3.14 here.", "Another sentence!", "Done?",
        ]

    def test_trained_splitter_case_insensitive_boundary(self, spark):
        from pandas_weights_spark.functions.text import (
            split_sentences_trained,
        )

        t = spark.createDataFrame(
            [("See FIG. 3 now. The gherkin fig. is odd. Profig. no.",)],
            ["text"],
        )
        s = t.select(
            split_sentences_trained(F.col("text"), ["fig"]).alias("s")
        ).first()["s"]
        # FIG./fig. protected case-insensitively (no split after
        # them); 'Profig.' is NOT a word-boundary match so it still
        # ends a sentence
        assert s == [
            "See FIG. 3 now.",
            "The gherkin fig. is odd.",
            "Profig.",
            "no.",
        ]


class TestPhraseHits:
    """r12: phrase_hits — multi-phrase blocklist matching; the JVM
    fold, the Arrow compiled-loop twin, and the DuckDB replay must
    agree byte-for-byte in both modes."""

    ROWS = [
        (1, "The Scunthorpe man saw bad badge bad things"),
        (2, "nothing here"),
        (3, None),
        (4, "BAD bad Bad thorpe"),
        (5, ""),
        (6, "overlap overlap overlap"),
    ]
    PH = ["bad", "thorpe", "bad badge", "overlap"]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "i long, t string")

    @pytest.mark.parametrize("wb", [False, True])
    def test_arrow_equals_jvm(self, spark, wb):
        from pandas_weights_spark.functions.text import phrase_hits

        a = sorted(
            map(
                tuple,
                phrase_hits(
                    self._df(spark), "t", "i", self.PH,
                    word_boundary=wb,
                ).collect(),
            ),
            key=str,
        )
        b = sorted(
            map(
                tuple,
                phrase_hits(
                    self._df(spark), "t", "i", self.PH,
                    word_boundary=wb, arrow=True,
                ).collect(),
            ),
            key=str,
        )
        assert a == b

    def test_substring_vs_word_boundary(self, spark):
        from pandas_weights_spark.functions.text import phrase_hits

        sub = {
            r["i"]: r
            for r in phrase_hits(
                self._df(spark), "t", "i", ["thorpe"]
            ).collect()
        }
        wb = {
            r["i"]: r
            for r in phrase_hits(
                self._df(spark), "t", "i", ["thorpe"],
                word_boundary=True,
            ).collect()
        }
        # Scunthorpe: substring hits, word-boundary does not
        assert sub[1]["n_hits"] == 1 and wb[1]["n_hits"] == 0
        # standalone 'thorpe' hits in both
        assert sub[4]["n_hits"] == 1 and wb[4]["n_hits"] == 1

    def test_counts_and_case_fold(self, spark):
        from pandas_weights_spark.functions.text import phrase_hits

        r = {
            x["i"]: x
            for x in phrase_hits(
                self._df(spark), "t", "i", self.PH
            ).collect()
        }
        # 'BAD bad Bad' folds to 3 bads + thorpe
        assert r[4]["n_hits"] == 4 and r[4]["n_matched"] == 2
        assert r[4]["hits"] == ["bad", "thorpe"]
        assert r[6]["n_hits"] == 3  # non-overlapping count
        # NULL text: NULL total, empty hit set (the JVM filter rule)
        assert r[3]["n_hits"] is None
        assert r[3]["n_matched"] == 0 and r[3]["hits"] == []

    def test_duckdb_replay_parity(self, spark):
        import duckdb

        from pandas_weights_spark.functions.text import (
            phrase_hits,
            phrase_hits_sql,
        )

        got = sorted(
            (r["i"], r["n_hits"], r["n_matched"], tuple(r["hits"]))
            for r in phrase_hits(
                self._df(spark), "t", "i", self.PH
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE d(i BIGINT, t VARCHAR)")
        for i, t in self.ROWS:
            con.execute("INSERT INTO d VALUES (?, ?)", [i, t])
        c = phrase_hits_sql("t", self.PH)
        want = sorted(
            (i, n, m, tuple(h))
            for i, n, m, h in con.execute(
                f"SELECT i, {c['n_hits']}, {c['n_matched']}, "
                f"{c['hits']} FROM d"
            ).fetchall()
        )
        assert got == want

    def test_empty_phrase_list_raises(self, spark):
        from pandas_weights_spark.functions.text import phrase_hits

        with pytest.raises(ValueError, match="phrase"):
            phrase_hits(self._df(spark), "t", "i", ["", None])


class TestPunktCappedCutScaleGuard:
    """r15: the punkt trainers' model-table caps route through the
    threshold-guarded _capped_cut (the vocab/dsir discipline) — above
    the window group-limit threshold the cut salts executor-side
    instead of compiling to TakeOrdered's partitions x cap driver
    merge, with EXACTLY the same row set."""

    THRESH = "spark.sql.optimizer.windowGroupLimitThreshold"

    def _roundtrip(self, spark, build, key):
        ref = {tuple(r[k] for k in key) for r in build().collect()}
        old = spark.conf.get(self.THRESH)
        spark.conf.set(self.THRESH, "2")
        try:
            salted = build()
            plan = salted._jdf.queryExecution().executedPlan().toString()
            assert "TakeOrdered" not in plan, plan
            assert "pmod" in plan, plan
            got = {tuple(r[k] for k in key) for r in salted.collect()}
        finally:
            spark.conf.set(self.THRESH, old)
        assert got == ref and len(got) > 0

    @pytest.fixture(scope="class")
    def prose(self, spark):
        rows = [
            (i, "The dept. meeting ended. Then No. %d came up. "
                "Then it rained. We left dept. early." % (i % 7))
            for i in range(30)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_collocations_salted_same_rows(self, spark, prose):
        from pandas_weights_spark.functions.text import (
            train_sentence_collocations,
        )

        self._roundtrip(
            spark,
            lambda: train_sentence_collocations(
                prose, "text", max_pairs=5
            ),
            ("w1", "w2", "n_pair", "score"),
        )

    def test_starters_salted_same_rows(self, spark, prose):
        from pandas_weights_spark.functions.text import (
            train_sentence_starters,
        )

        self._roundtrip(
            spark,
            lambda: train_sentence_starters(
                prose, "text", abbrevs=("dept",), max_starters=4
            ),
            ("starter", "n_start", "score"),
        )

    def test_abbreviations_salted_same_rows(self, spark, prose):
        from pandas_weights_spark.functions.text import (
            train_sentence_abbreviations,
        )

        self._roundtrip(
            spark,
            lambda: train_sentence_abbreviations(
                prose, "text", max_abbrevs=3
            ),
            ("abbrev", "n_dot", "score"),
        )


class TestNgramModelTablesFused:
    """r16: ngram_model_tables fuses the per-order model-table
    builders (build_vocabulary / bigram_counts / trigram_counts /
    ngram_counts) into ONE corpus pass. Each per-order table must be
    ROW-IDENTICAL to its standalone builder in BOTH top-k regimes
    (plain window-group-limit under the threshold, salted two-stage
    above it), and the fused construction must contain exactly one
    gram fan-out (Generate) where the standalone builders pay one per
    order."""

    THRESH = "spark.sql.optimizer.windowGroupLimitThreshold"

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = []
        for i in range(80):
            rows.append((
                i,
                f"w{i % 23} common w{i % 7} filler w{(i * 3) % 11} "
                f"common w{i % 23}",
            ))
        rows += [(80, ""), (81, "solo"), (82, "two words"), (83, None)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _rows(self, df):
        return sorted(tuple(r) for r in df.collect())

    def _standalone(self, corpus, caps):
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            trigram_counts,
        )
        from pandas_weights_spark.functions.vocab import build_vocabulary

        out = {}
        if 1 in caps:
            out[1] = build_vocabulary(corpus, "text", max_size=caps[1])
        if 2 in caps:
            out[2] = bigram_counts(corpus, "text", max_bigrams=caps[2])
        if 3 in caps:
            out[3] = trigram_counts(corpus, "text", max_trigrams=caps[3])
        return out

    def _assert_equal(self, corpus, caps, **kw):
        fused = TX.ngram_model_tables(corpus, "text", caps, **kw)
        ref = self._standalone(corpus, caps)
        for n in caps:
            assert fused[n].columns == ref[n].columns, n
            assert self._rows(fused[n]) == self._rows(ref[n]), n
            assert fused[n].count() > 0, n

    def test_small_cap_regime(self, corpus):
        # caps under the default 1000 threshold: plain grouped
        # window-group-limit path
        self._assert_equal(corpus, {1: 9, 2: 11, 3: 13})

    def test_salted_regime(self, spark, corpus):
        old = spark.conf.get(self.THRESH)
        spark.conf.set(self.THRESH, "5")
        try:
            fused = TX.ngram_model_tables(
                corpus, "text", {1: 9, 2: 11, 3: 13}, checkpoint=False
            )
            plan = fused[3]._jdf.queryExecution().executedPlan().toString()
            assert "TakeOrdered" not in plan, plan
            assert "pmod" in plan, plan
            self._assert_equal(corpus, {1: 9, 2: 11, 3: 13})
        finally:
            spark.conf.set(self.THRESH, old)

    def test_uncapped_equivalent_full_tables(self, corpus):
        # caps >= distinct grams: every gram survives, so the fused
        # tables equal the standalone ones with no cut in play
        self._assert_equal(corpus, {1: 5000, 2: 5000, 3: 5000})

    def test_arrow_matches_jvm(self, corpus):
        fused_a = TX.ngram_model_tables(
            corpus, "text", {2: 11, 3: 13}, arrow=True
        )
        ref = self._standalone(corpus, {2: 11, 3: 13})
        for n in (2, 3):
            assert self._rows(fused_a[n]) == self._rows(ref[n]), n

    def test_weighted_with_null_weights(self, spark):
        # NULL-weight rows: the gram still appears, with NULL mass
        # when no weighted occurrence exists (the ngram_counts r12
        # contract) — pinned against the standalone builders
        rows = [
            (0, "a b c a b", 2.0),
            (1, "a b c", None),
            (2, "zz yy zz yy", 0.5),
        ]
        corpus = spark.createDataFrame(
            rows, "doc_id long, text string, w double"
        )
        from pandas_weights_spark.functions.text import (
            bigram_counts,
            trigram_counts,
        )

        fused = TX.ngram_model_tables(
            corpus, "text", {2: 100, 3: 100}, weight=F.col("w")
        )
        assert self._rows(fused[2]) == self._rows(
            bigram_counts(corpus, "text", max_bigrams=100,
                          weight=F.col("w"))
        )
        assert self._rows(fused[3]) == self._rows(
            trigram_counts(corpus, "text", max_trigrams=100,
                           weight=F.col("w"))
        )

    def test_min_mass_drops_order1_tail_only(self, spark):
        corpus = spark.createDataFrame(
            [(0, "a a a b"), (1, "c c")], "doc_id long, text string"
        )
        fused = TX.ngram_model_tables(
            corpus, "text", {1: 100, 2: 100}, min_mass=2.0
        )
        terms = {r["term"] for r in fused[1].collect()}
        assert terms == {"a", "c"}  # b has mass 1 < 2
        # bigrams keep their full set regardless of min_mass
        assert fused[2].count() == 3  # 'a a' x2... ('a a','a b','c c')

    def test_one_generate_in_fused_construction(self, corpus):
        fused = TX.ngram_model_tables(
            corpus, "text", {1: 9, 2: 11, 3: 13}, checkpoint=False
        )
        plan = fused[3]._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") == 1, plan
