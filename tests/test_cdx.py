"""Web-archive index surface (functions/cdx.py): SURT keys, CDXJ
line parsing, fetch-plan rollup, DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.cdx import (
    cdx_fetch_plan,
    cdxj_entries,
    surt_key,
    surt_key_sql,
)


class TestSurtKey:
    CASES = [
        # (url, expected key)
        ("https://www.Example.COM/Path/Item", "com,example)/path/item"),
        ("http://example.com", "com,example)/"),
        ("https://example.com:443/a", "com,example)/a"),
        ("http://example.com:80/a", "com,example)/a"),
        ("http://example.com:8080/a", "com,example:8080)/a"),
        ("https://news.bbc.co.uk/x?b=2&a=1", "uk,co,bbc,news)/x?a=1&b=2"),
        # ONE leading www. strips; www2 is a distinct host
        ("http://www.www.e.org/", "org,e,www)/"),
        ("http://www2.e.org/", "org,e,www2)/"),
        # userinfo and fragment drop; empty query params drop
        ("http://u:p@e.org/p?x=1&&y=2#frag", "org,e)/p?x=1&y=2"),
        # query-only sort is lexicographic on the whole k=v token
        ("http://e.org/p?a=10&a=2", "org,e)/p?a=10&a=2"),
        ("http://e.org/p?", "org,e)/p"),
        # whole-url lowercase (the CC index convention)
        ("HTTP://E.ORG/P?Q=V", "org,e)/p?q=v"),
    ]

    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(self.CASES)],
            "i long, url string",
        )
        got = {
            r["i"]: r["k"]
            for r in df.select("i", surt_key(F.col("url")).alias("k"))
            .collect()
        }
        for i, (u, want) in enumerate(self.CASES):
            assert got[i] == want, (u, got[i], want)

    def test_null(self, spark):
        df = spark.createDataFrame([(None,)], "url string")
        assert df.select(surt_key(F.col("url")).alias("k")).first()["k"] is None

    def test_duckdb_twin_bit_exact(self, spark):
        urls = [u for u, _ in self.CASES] + [
            "not a url at all",
            "ftp://A.B/c",
            "//protocol-relative.e.org/x",
            "http://e.org/a?b=%41&a=Z",
        ]
        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                                   "i long, url string")
        got = [
            r["k"]
            for r in df.select(surt_key(F.col("url")).alias("k"))
            .orderBy("i")
            .collect()
        ]
        con = duckdb.connect()
        exp = [
            con.sql(
                "SELECT "
                + surt_key_sql("'" + u.replace("'", "''") + "'")
                + " AS k"
            ).fetchone()[0]
            for u in urls
        ]
        assert got == exp

    def test_sorts_by_registrable_domain(self, spark):
        # the point of SURT: one domain's pages are one contiguous
        # key range regardless of subdomain order
        urls = [
            "http://a.example.com/1",
            "http://z.example.com/2",
            "http://example.com/3",
            "http://examplf.com/x",
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        keys = sorted(
            r["k"] for r in df.select(surt_key(F.col("url")).alias("k"))
            .collect()
        )
        in_domain = [k for k in keys if k.startswith("com,example")]
        lo, hi = keys.index(in_domain[0]), keys.index(in_domain[-1])
        assert hi - lo + 1 == len(in_domain) == 3


class TestCdxj:
    LINES = [
        (
            'com,example)/a 20240305100000 {"url": "https://example.com/a", '
            '"mime": "text/html", "status": "200", '
            '"digest": "sha1:ABC", "length": "1234", "offset": "0", '
            '"filename": "crawl-00.warc.gz"}'
        ),
        # missing optional members -> NULL fields
        'org,e)/b 20240101000000 {"url": "http://e.org/b"}',
        # invalid timestamp digits -> NULL ts, fields still parse
        'org,e)/c 20249999999999 {"url": "http://e.org/c", "status": "404"}',
        # corrupt lines -> NULL struct, never an error
        "garbage without the shape",
        "key 2024 {}",
        None,
    ]

    def _parse(self, spark):
        df = spark.createDataFrame(
            [(i, l) for i, l in enumerate(self.LINES)],
            "i long, line string",
        )
        return {
            r["i"]: r["e"]
            for r in df.select(
                "i", cdxj_entries(F.col("line")).alias("e")
            ).collect()
        }

    def test_full_line(self, spark):
        import datetime

        e = self._parse(spark)[0]
        assert e["key"] == "com,example)/a"
        assert e["ts_raw"] == "20240305100000"
        assert e["ts"] == datetime.datetime(2024, 3, 5, 10, 0, 0)
        assert e["url"] == "https://example.com/a"
        assert e["mime"] == "text/html"
        assert e["status"] == 200
        assert e["digest"] == "sha1:ABC"
        assert e["length"] == 1234 and e["offset"] == 0
        assert e["filename"] == "crawl-00.warc.gz"

    def test_partial_invalid_and_corrupt(self, spark):
        parsed = self._parse(spark)
        assert parsed[1]["mime"] is None and parsed[1]["status"] is None
        assert parsed[2]["ts"] is None          # gated try-parse
        assert parsed[2]["status"] == 404
        assert parsed[3] is None and parsed[4] is None
        assert parsed[5] is None

    def test_key_matches_surt_of_url(self, spark):
        # a well-formed index line's key IS the SURT of its url
        df = spark.createDataFrame([(self.LINES[0],)], ["line"])
        row = df.select(
            cdxj_entries(F.col("line")).alias("e")
        ).select(
            F.col("e.key").alias("k"),
            surt_key(F.col("e.url")).alias("s"),
        ).first()
        assert row["k"] == row["s"]


class TestFetchPlan:
    def test_rollup(self, spark):
        lines = [
            'k)/1 20240101000000 {"url": "u1", "status": "200", '
            '"mime": "text/html", "length": "10", "offset": "100", '
            '"filename": "a.warc.gz"}',
            'k)/2 20240101000000 {"url": "u2", "status": "200", '
            '"mime": "text/html", "length": "20", "offset": "50", '
            '"filename": "a.warc.gz"}',
            'k)/3 20240101000000 {"url": "u3", "status": "404", '
            '"mime": "text/html", "length": "30", "offset": "0", '
            '"filename": "a.warc.gz"}',
            'k)/4 20240101000000 {"url": "u4", "status": "200", '
            '"mime": "application/pdf", "length": "40", "offset": "7", '
            '"filename": "b.warc.gz"}',
            "corrupt",
        ]
        df = spark.createDataFrame([(l,) for l in lines], ["line"])
        entries = df.select(cdxj_entries(F.col("line")).alias("e"))
        plan = {
            r["filename"]: r
            for r in cdx_fetch_plan(
                entries, statuses=(200,), mimes=("text/html",)
            ).collect()
        }
        assert set(plan) == {"a.warc.gz"}
        a = plan["a.warc.gz"]
        assert a["n_records"] == 2
        assert a["total_bytes"] == 30
        assert list(a["offsets"]) == [50, 100]  # forward-seek order
        # without the mime filter, b.warc.gz joins the plan
        plan2 = {
            r["filename"]
            for r in cdx_fetch_plan(entries, statuses=(200,)).collect()
        }
        assert plan2 == {"a.warc.gz", "b.warc.gz"}
