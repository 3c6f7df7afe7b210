"""URL canonicalization + blocked-domain filtering
(functions/text.py web-pipeline hygiene, r6)."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.text import (
    canonicalize_url,
    domain_suffixes,
    filter_blocked_domains,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c"))
        .collect()
    ]


class TestCanonicalizeUrl:
    def test_case_port_fragment(self, spark):
        got = _canon(
            spark,
            [
                "HTTP://Example.COM:80/Path/X#frag",
                "https://example.com:443/a",
                "https://example.com:8443/a",
                "http://example.com",
            ],
        )
        assert got == [
            "http://example.com/Path/X",  # path case preserved
            "https://example.com/a",
            "https://example.com:8443/a",  # non-default port kept
            "http://example.com/",
        ]

    def test_tracking_params(self, spark):
        got = _canon(
            spark,
            [
                "https://e.com/p?utm_source=x&id=3&utm_medium=y",
                "https://e.com/p?fbclid=abc",
                "https://e.com/p?b=2&a=1",  # order preserved
                "https://e.com/p?gclid=1&ref_src=t",
            ],
        )
        assert got == [
            "https://e.com/p?id=3",
            "https://e.com/p",
            "https://e.com/p?b=2&a=1",
            "https://e.com/p",
        ]

    def test_fragment_embedded_query_not_fabricated(self, spark):
        # r6 verdict bug: a '?' INSIDE the fragment (SPA hash routing)
        # must not be mistaken for a query string — the fragment is
        # dropped wholesale, and the output must NOT collide with the
        # genuinely distinct URL that really has that query
        got = _canon(
            spark,
            [
                "https://h.com/p#/route?sessionid=abc",
                "https://h.com/p?sessionid=abc",   # the real-query twin
                "https://h.com/p#a?x=1",
                "https://x.com/p#/route?b=1",
                "https://e.com/p?id=3#frag?utm_source=z",  # real query AND fragment-?
                "HTTPS://E.com:443#/r?gclid=9",   # empty path + frag-?
            ],
        )
        assert got == [
            "https://h.com/p",
            "https://h.com/p?sessionid=abc",
            "https://h.com/p",
            "https://x.com/p",
            "https://e.com/p?id=3",
            "https://e.com/",
        ]
        assert got[0] != got[1]

    def test_null_and_foreign_schemes_pass_through(self, spark):
        got = _canon(
            spark, [None, "ftp://Files.Example.COM/A", "mailto:a@b.c", "not a url"]
        )
        assert got == [None, "ftp://Files.Example.COM/A", "mailto:a@b.c", "not a url"]

    def test_idempotent(self, spark):
        urls = [
            "HTTP://Example.COM:80/Path/X?utm_a=1&q=2#f",
            "https://sub.example.org:9999/x?a=1",
        ]
        once = _canon(spark, urls)
        twice = _canon(spark, once)
        assert once == twice


class TestDomainSuffixes:
    def test_suffix_chain(self, spark):
        df = spark.createDataFrame([("a.B.example.com",)], "h string")
        got = df.select(
            domain_suffixes(F.col("h")).alias("s")
        ).collect()[0]["s"]
        assert got == ["a.b.example.com", "b.example.com", "example.com"]

    def test_max_labels_bound(self, spark):
        host = ".".join(f"l{i}" for i in range(12)) + ".example.com"
        df = spark.createDataFrame([(host,)], "h string")
        got = df.select(
            domain_suffixes(F.col("h"), max_labels=4).alias("s")
        ).collect()[0]["s"]
        # only the 4 most-general suffixes survive the bound
        assert got == [
            "l10.l11.example.com",
            "l11.example.com",
            "example.com",
        ]
        assert all(len(s.split(".")) <= 4 for s in got)

    def test_single_label_and_two_labels(self, spark):
        df = spark.createDataFrame(
            [("localhost",), ("example.com",)], "h string"
        )
        got = [
            r["s"]
            for r in df.select(
                domain_suffixes(F.col("h")).alias("s")
            ).collect()
        ]
        assert got[0] == ["localhost"]
        assert got[1] == ["example.com"]


class TestFilterBlockedDomains:
    @pytest.fixture()
    def frames(self, spark):
        rows = [
            (0, "good.example.org"),
            (1, "spam.bad.com"),          # subdomain of blocked
            (2, "bad.com"),               # exactly blocked
            (3, "notbad.com"),            # must NOT match bad.com
            (4, None),                    # NULL host never blocked
            (5, "deep.a.b.tracker.net"),  # deep subdomain of blocked
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string")
        bl = spark.createDataFrame(
            [("bad.com",), ("Tracker.NET",)], "domain string"
        )
        return df, bl

    def test_filter(self, spark, frames):
        df, bl = frames
        out = filter_blocked_domains(df, F.col("host"), bl)
        assert sorted(r["doc_id"] for r in out.collect()) == [0, 3, 4]
        assert out.columns == df.columns

    def test_flag(self, spark, frames):
        df, bl = frames
        out = filter_blocked_domains(df, F.col("host"), bl, how="flag")
        got = {r["doc_id"]: r["is_blocked"] for r in out.collect()}
        assert got == {0: False, 1: True, 2: True, 3: False, 4: False,
                       5: True}

    def test_exact_only(self, spark, frames):
        df, bl = frames
        out = filter_blocked_domains(
            df, F.col("host"), bl, how="flag", match_subdomains=False
        )
        got = {r["doc_id"]: r["is_blocked"] for r in out.collect()}
        assert got[1] is False and got[2] is True and got[5] is False

    def test_how_guard(self, spark, frames):
        df, bl = frames
        with pytest.raises(ValueError, match="how"):
            filter_blocked_domains(df, F.col("host"), bl, how="nope")

    def test_broadcast_in_plan(self, spark, frames):
        df, bl = frames
        plan = filter_blocked_domains(
            df, F.col("host"), bl
        )._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, plan

    def test_no_synthetic_id_and_repartition_stable(self, spark, frames):
        # r6 advice: the hit branch must not self-join on a
        # nondeterministic monotonically_increasing_id — the join key
        # is lower(host), a pure function of row data, so the result
        # is identical under any input partitioning
        df, bl = frames
        out = filter_blocked_domains(
            df.repartition(7, "doc_id"), F.col("host"), bl, how="flag"
        )
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "monotonically_increasing_id" not in plan, plan
        got = {r["doc_id"]: r["is_blocked"] for r in out.collect()}
        assert got == {0: False, 1: True, 2: True, 3: False, 4: False,
                       5: True}

    def test_duplicate_hosts_preserved(self, spark):
        # the distinct-hosts rewrite must not deduplicate df rows
        rows = [(i, "bad.com") for i in range(4)] + [(9, "ok.org")]
        df = spark.createDataFrame(rows, "doc_id long, host string")
        bl = spark.createDataFrame([("bad.com",)], "domain string")
        out = filter_blocked_domains(df, F.col("host"), bl, how="flag")
        assert out.count() == 5
        assert sum(r["is_blocked"] for r in out.collect()) == 4
