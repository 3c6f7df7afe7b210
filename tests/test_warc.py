"""WARC source/sink (sources/warc.py): record construction is checked
against an INDEPENDENT minimal parser written here, shard assembly is
byte-deterministic under repartitioning, and the gzip framing is
one-member-per-record (verified with stdlib zlib, not the module's own
reader)."""

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.sources.warc import (
    from_warc_shards,
    parse_warc_bytes,
    read_warc,
    to_warc_shards,
    warc_record,
)

DATE = "2026-01-01T00:00:00Z"


def _build(spark, rows, warc_type="response", **kw):
    df = spark.createDataFrame(rows, ["uri", "text"])
    rec = warc_record(
        F.col("uri"), F.lit(DATE),
        F.encode(F.col("text"), "UTF-8"), warc_type, **kw
    )
    return df.select(F.col("uri"), rec.alias("rec"))


def _independent_parse_one(data: bytes):
    """Minimal spec-reader: version line, header map, Content-Length
    block, CRLF CRLF trailer — written without looking at the module."""
    assert data.startswith(b"WARC/1.0\r\n")
    head, _, rest = data.partition(b"\r\n\r\n")
    headers = {}
    for ln in head.split(b"\r\n")[1:]:
        k, _, v = ln.partition(b": ")
        headers[k.decode()] = v.decode()
    clen = int(headers["Content-Length"])
    block = rest[:clen]
    assert rest[clen : clen + 4] == b"\r\n\r\n"  # record trailer
    return headers, block


class TestRecordConstruction:
    def test_response_record_spec_shape(self, spark):
        built = _build(spark, [("https://e.org/1", "hello wörld")])
        data = bytes(built.first()["rec"])
        headers, block = _independent_parse_one(data)
        assert headers["WARC-Type"] == "response"
        assert headers["WARC-Target-URI"] == "https://e.org/1"
        assert headers["WARC-Date"] == DATE
        assert headers["Content-Type"].startswith("application/http")
        assert headers["WARC-Record-ID"].startswith("<urn:uuid:")
        http_head, _, body = block.partition(b"\r\n\r\n")
        assert http_head.startswith(b"HTTP/1.1 200 OK")
        assert body.decode("utf-8") == "hello wörld"
        # HTTP Content-Length is the BODY's byte length
        assert f"Content-Length: {len(body)}".encode() in http_head

    def test_resource_record_payload_verbatim(self, spark):
        built = _build(
            spark, [("https://e.org/2", "plain text")],
            warc_type="resource", content_type="text/plain",
        )
        headers, block = _independent_parse_one(
            bytes(built.first()["rec"])
        )
        assert headers["WARC-Type"] == "resource"
        assert headers["Content-Type"] == "text/plain"
        assert block == b"plain text"

    def test_record_id_deterministic_and_distinct(self, spark):
        rows = [("https://e.org/a", "x"), ("https://e.org/b", "x")]
        ids = [
            _independent_parse_one(bytes(r["rec"]))[0]["WARC-Record-ID"]
            for r in _build(spark, rows).orderBy("uri").collect()
        ]
        ids2 = [
            _independent_parse_one(bytes(r["rec"]))[0]["WARC-Record-ID"]
            for r in _build(spark, rows).orderBy("uri").collect()
        ]
        assert ids == ids2 and ids[0] != ids[1]

    def test_bad_warc_type_raises(self, spark):
        with pytest.raises(ValueError, match="warc_type"):
            warc_record(
                F.lit("u"), F.lit(DATE), F.lit(b"x"), "request"
            )

    def test_conversion_record_wet_shape(self, spark):
        # r13: WET = WARC conversion records — text/plain payload
        # verbatim + WARC-Refers-To naming the source record
        df = spark.createDataFrame(
            [("https://e.org/3", "extracted text")], ["uri", "text"]
        )
        rec = warc_record(
            F.col("uri"),
            F.lit(DATE),
            F.encode(F.col("text"), "UTF-8"),
            "conversion",
            "text/plain",
            refers_to=F.lit("<urn:uuid:aaaa-bbbb>"),
        )
        headers, block = _independent_parse_one(
            bytes(df.select(rec.alias("rec")).first()["rec"])
        )
        assert headers["WARC-Type"] == "conversion"
        assert headers["Content-Type"] == "text/plain"
        assert headers["WARC-Refers-To"] == "<urn:uuid:aaaa-bbbb>"
        assert block == b"extracted text"

    def test_conversion_roundtrip_through_shards(self, spark):
        from pandas_weights_spark.sources.warc import (
            from_warc_shards,
            to_warc_shards,
        )

        df = spark.createDataFrame(
            [("https://e.org/4", "wet body")], ["uri", "text"]
        )
        rec = warc_record(
            F.col("uri"),
            F.lit(DATE),
            F.encode(F.col("text"), "UTF-8"),
            "conversion",
            "text/plain",
            refers_to=F.lit("<urn:uuid:src-1>"),
        )
        shards = to_warc_shards(
            df.select(rec.alias("rec")), "rec", n_shards=2,
            gzip_records=True,
        )
        row = from_warc_shards(shards).first()
        assert row["warc_type"] == "conversion"
        assert row["refers_to"] == "<urn:uuid:src-1>"
        assert row["content_type"] == "text/plain"
        assert bytes(row["block"]) == b"wet body"
        assert row["http_body"] is None  # not a response record
        # response records come back with refers_to = '' (absent)
        r2 = _build(spark, [("https://e.org/5", "x")])
        shards2 = to_warc_shards(r2, "rec", n_shards=1)
        assert from_warc_shards(shards2).first()["refers_to"] == ""

    def test_refers_to_on_non_conversion_raises(self, spark):
        with pytest.raises(ValueError, match="conversion"):
            warc_record(
                F.lit("u"), F.lit(DATE), F.lit(b"x"), "response",
                refers_to=F.lit("<urn:uuid:z>"),
            )


class TestShardsRoundTrip:
    @pytest.fixture(scope="class")
    def built(self, spark):
        rows = [
            (f"https://e.org/d/{i}", f"document body {i} " + "y" * i)
            for i in range(40)
        ]
        return _build(spark, rows), dict(rows)

    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, spark, built, gz):
        df, orig = built
        shards = to_warc_shards(df, "rec", n_shards=4, gzip_records=gz)
        back = from_warc_shards(shards).select(
            "target_uri", F.decode("http_body", "UTF-8").alias("t")
        )
        got = {r["target_uri"]: r["t"] for r in back.collect()}
        assert got == orig

    def test_byte_identical_under_repartition(self, spark, built):
        df, _ = built
        a = {
            r["shard"]: bytes(r["warc"])
            for r in to_warc_shards(df, "rec", n_shards=4).collect()
        }
        b = {
            r["shard"]: bytes(r["warc"])
            for r in to_warc_shards(
                df.repartition(7), "rec", n_shards=4
            ).collect()
        }
        assert a == b and len(a) >= 2

    def test_gzip_one_member_per_record(self, spark, built):
        df, _ = built
        row = to_warc_shards(
            df, "rec", n_shards=1, gzip_records=True
        ).first()
        data, n = bytes(row["warc"]), row["n_records"]
        # walk the members with stdlib zlib only
        members, pos = 0, 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            out = d.decompress(data[pos:])
            assert out.startswith(b"WARC/1.0\r\n")
            members += 1
            pos = len(data) - len(d.unused_data)
        assert members == n == 40

    def test_rec_idx_orders_within_shard(self, spark, built):
        df, _ = built
        back = from_warc_shards(
            to_warc_shards(df, "rec", n_shards=2)
        )
        for (shard,), grp in (
            back.select("shard", "rec_idx").toPandas().groupby(["shard"])
        ):
            assert sorted(grp["rec_idx"]) == list(range(len(grp)))


class TestParseTolerance:
    def test_trailing_garbage_ignored(self, spark):
        data = bytes(
            _build(spark, [("u", "body")]).first()["rec"]
        ) + b"\x00garbage tail"
        recs = parse_warc_bytes(data)
        assert len(recs) == 1 and recs[0]["http_body"] == b"body"

    def test_no_record_raises(self):
        with pytest.raises(ValueError, match="no WARC"):
            parse_warc_bytes(b"not a warc file at all")

    def test_empty_is_empty(self):
        assert parse_warc_bytes(b"") == []

    def test_bad_content_length_skips_record(self, spark):
        good = bytes(_build(spark, [("u2", "kept")]).first()["rec"])
        bad = (
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"Content-Length: notanumber\r\n\r\nxx\r\n\r\n"
        )
        recs = parse_warc_bytes(bad + good)
        assert [r["target_uri"] for r in recs] == ["u2"]

    def test_resource_http_body_is_null(self, spark):
        built = _build(spark, [("u3", "raw")], warc_type="resource")
        rec = parse_warc_bytes(bytes(built.first()["rec"]))[0]
        assert rec["http_body"] is None and rec["block"] == b"raw"


class TestReadWarc:
    def test_read_plain_and_gz_files(self, spark, tmp_path):
        df = _build(
            spark,
            [(f"https://e.org/f/{i}", f"text {i}") for i in range(10)],
        )
        shards = to_warc_shards(df, "rec", n_shards=2).collect()
        (tmp_path / "a.warc").write_bytes(bytes(shards[0]["warc"]))
        (tmp_path / "b.warc.gz").write_bytes(
            gzip.compress(bytes(shards[1]["warc"]), mtime=0)
        )
        back = read_warc(spark, str(tmp_path))
        got = {
            r["target_uri"]: r["http_body"].decode()
            for r in back.collect()
        }
        assert len(got) == 10
        assert got["https://e.org/f/3"] == "text 3"


class TestCharsetDecode:
    """r10 (VERDICT r9 #1 carried item): charset-aware body decode —
    BOM > Content-Type charset= > <meta> prescan > UTF-8/replace."""

    def test_sniff_priority_and_remaps(self):
        from pandas_weights_spark.sources.warc import sniff_charset

        hdr = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=Shift_JIS"
        assert sniff_charset(b"<html>", hdr) == ("shift_jis", "header")
        # BOM beats a (wrong) header declaration
        assert sniff_charset(
            b"\xef\xbb\xbfx", hdr.replace("Shift_JIS", "windows-1252")
        ) == ("utf-8", "bom")
        assert sniff_charset(b"\xff\xfex\x00", None) == ("utf-16-le", "bom")
        assert sniff_charset(b"\xfe\xff\x00x", None) == ("utf-16-be", "bom")
        # meta prescan fills in when the header has no charset param
        body = b'<html><head><meta charset="EUC-JP"></head>'
        assert sniff_charset(body, "Content-Type: text/html") == (
            "euc_jp", "meta",
        )
        equiv = (
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1251">'
        )
        assert sniff_charset(equiv, None) == ("cp1251", "meta")
        # WHATWG superset remaps
        assert sniff_charset(b"", "charset=ISO-8859-1")[0] == "cp1252"
        assert sniff_charset(b"", "charset=GBK")[0] == "gb18030"
        # unknown label falls through to the next source
        assert sniff_charset(b"x", "charset=no-such-enc") == (
            "utf-8", "default",
        )
        # meta beyond the 1024-byte prescan window is ignored
        far = b"<p>" + b"x" * 1100 + b'<meta charset="shift_jis">'
        assert sniff_charset(far, None) == ("utf-8", "default")

    def test_meta_prescan_whatwg_conformance(self):
        # r11 (ADVICE): only a charset ATTRIBUTE or an http-equiv
        # Content-Type content param counts; charset= inside an
        # unrelated attribute value / commented-out markup is ignored
        from pandas_weights_spark.sources.warc import sniff_charset

        decoy = (
            b'<meta name="description" '
            b'content="how to set charset=x-sjis in PHP">'
        )
        assert sniff_charset(decoy, None) == ("utf-8", "default")
        # a decoy must not mask a later REAL declaration
        assert sniff_charset(
            decoy + b'<meta charset="koi8-r">', None
        ) == ("koi8-r", "meta")
        # http-equiv of a different kind never donates its content
        refresh = (
            b'<meta http-equiv="refresh" '
            b'content="0; url=/?charset=shift_jis">'
        )
        assert sniff_charset(refresh, None) == ("utf-8", "default")
        # commented-out declarations are skipped (closed comment)
        assert sniff_charset(
            b'<!-- <meta charset="shift_jis"> --><meta charset=greek>',
            None,
        ) == ("iso8859-7", "meta")
        # an unclosed comment hides the rest of the prescan window
        assert sniff_charset(
            b'<!-- <meta charset="shift_jis">', None
        ) == ("utf-8", "default")
        # unquoted content value still parses its charset param
        assert sniff_charset(
            b"<meta http-equiv=Content-Type "
            b"content=text/html;charset=windows-1251>",
            None,
        ) == ("cp1251", "meta")

    def test_encode_text_null_propagates(self, spark):
        # r11 (ADVICE): NULL text -> NULL binary (like F.encode), not
        # an empty string
        from pandas_weights_spark.sources.warc import encode_text

        df = spark.createDataFrame(
            [(0, None), (1, ""), (2, "x")], ["i", "t"]
        )
        got = {
            r["i"]: r["b"]
            for r in df.select(
                "i", encode_text(F.col("t"), "utf-8").alias("b")
            ).collect()
        }
        assert got[0] is None
        assert bytes(got[1]) == b""
        assert bytes(got[2]) == b"x"

    @pytest.fixture(scope="class")
    def pages(self):
        # (uri, original text, charset label in the header, encoding)
        return [
            ("https://e.org/w1252", "café naïve £ deal",
             "windows-1252", "cp1252"),
            ("https://e.org/sjis", "日本語のテキ"
             "ストです", "Shift_JIS", "shift_jis"),
            ("https://e.org/utf8", "plain ascii and ümläuts",
             "utf-8", "utf-8"),
        ]

    def test_warc_roundtrip_transcodes(self, spark, pages):
        from pandas_weights_spark.sources.warc import decode_http_body

        rows = [
            (uri, bytearray(text.encode(codec)),
             f"text/html; charset={label}")
            for uri, text, label, codec in pages
        ]
        df = spark.createDataFrame(rows, ["uri", "payload", "ct"])
        rec = warc_record(
            F.col("uri"), F.lit(DATE), F.col("payload"),
            "response", content_type=F.col("ct"),
        )
        back = from_warc_shards(
            to_warc_shards(df.select("uri", rec.alias("rec")), "rec",
                           n_shards=1)
        )
        out = back.select(
            "target_uri",
            decode_http_body(
                F.col("http_body"), F.col("http_headers")
            ).alias("d"),
        ).select("target_uri", "d.charset", "d.charset_source", "d.text")
        got = {r["target_uri"]: r for r in out.collect()}
        for uri, text, _, codec in pages:
            assert got[uri]["text"] == text, uri
            assert got[uri]["charset"] == codec, uri
            assert got[uri]["charset_source"] == "header", uri
        # blind UTF-8 decode WOULD have produced mojibake (the bug
        # this replaces): the shift_jis body is not valid UTF-8
        sjis = [r for r in pages if r[3] == "shift_jis"][0]
        assert sjis[1].encode("shift_jis").decode("utf-8", "replace") != sjis[1]

    def test_meta_sniff_when_header_silent(self, spark):
        from pandas_weights_spark.sources.warc import decode_http_body

        text = "précis — résumé"
        html = f'<html><head><meta charset="windows-1252"></head>{text}'
        df = spark.createDataFrame(
            [("u", bytearray(html.encode("cp1252")), "text/html")],
            ["uri", "payload", "ct"],
        )
        rec = warc_record(
            F.col("uri"), F.lit(DATE), F.col("payload"),
            "response", content_type=F.col("ct"),
        )
        back = from_warc_shards(
            to_warc_shards(df.select("uri", rec.alias("rec")), "rec",
                           n_shards=1)
        )
        row = back.select(
            decode_http_body(
                F.col("http_body"), F.col("http_headers")
            ).alias("d")
        ).first()["d"]
        assert row["charset"] == "cp1252"
        assert row["charset_source"] == "meta"
        assert text in row["text"]

    def test_bom_strip_and_replacement_fallback(self, spark):
        from pandas_weights_spark.sources.warc import decode_http_body

        rows = [
            ("bom", bytearray(b"\xef\xbb\xbf" + "héllo".encode())),
            ("junk", bytearray(b"ok \xff\xfe\x9d then")),
        ]
        df = spark.createDataFrame(rows, ["uri", "body"])
        out = {
            r["uri"]: r["d"]
            for r in df.select(
                "uri",
                decode_http_body(F.col("body"), F.lit(None)).alias("d"),
            ).collect()
        }
        assert out["bom"]["text"] == "héllo"  # BOM stripped
        assert out["bom"]["charset_source"] == "bom"
        assert "�" in out["junk"]["text"]  # never raises
        assert out["junk"]["text"].startswith("ok ")

    def test_resource_records_have_null_headers(self, spark):
        built = _build(spark, [("u4", "raw")], warc_type="resource")
        rec = parse_warc_bytes(bytes(built.first()["rec"]))[0]
        assert rec["http_headers"] is None

    def test_response_headers_kept(self, spark):
        built = _build(spark, [("u5", "b")])
        rec = parse_warc_bytes(bytes(built.first()["rec"]))[0]
        assert rec["http_headers"].startswith("HTTP/1.1 200 OK")
        assert "Content-Type: text/html" in rec["http_headers"]


class TestWatRecords:
    """r14 (VERDICT r13 missing #1): WAT metadata records — the third
    Common Crawl format. Envelope JSON (title + outlink table) over
    the warc_record/to_warc_shards machinery; link-graph pipelines
    read WAT instead of re-parsing response HTML."""

    HTML = (
        '<html><head><title>A &amp; B</title></head><body>'
        '<a href="https://other.ex/x">go  there</a>'
        '<a href="/relative">rel</a>'
        '<a name="noanchor">no href keeps no pair? has no href</a>'
        "</body></html>"
    )

    def _roundtrip(self, spark, rows, gz=True):
        from pandas_weights_spark.sources.warc import (
            from_warc_shards,
            parse_wat_records,
            to_warc_shards,
            wat_record,
        )

        df = spark.createDataFrame(rows, "uri string, html string")
        rec = wat_record(
            F.col("uri"),
            F.lit("2026-01-02T00:00:00Z"),
            F.col("html"),
            refers_to=F.lit("<urn:uuid:src>"),
        )
        shards = to_warc_shards(
            df.select(rec.alias("r")), "r", n_shards=2,
            gzip_records=gz,
        )
        return parse_wat_records(from_warc_shards(shards))

    def test_envelope_roundtrip(self, spark):
        out = {
            r["target_uri"]: r
            for r in self._roundtrip(
                spark,
                [("https://a.ex/p", self.HTML), ("https://b.ex/q", "<p>x</p>")],
            ).collect()
        }
        a = out["https://a.ex/p"]
        assert a["title"] == "A & B"          # entity-decoded
        assert a["env_uri"] == "https://a.ex/p"
        assert a["refers_to"] == "<urn:uuid:src>"
        assert [(l["path"], l["url"], l["text"]) for l in a["links"]] == [
            ("A@/href", "https://other.ex/x", "go there"),
            ("A@/href", "/relative", "rel"),
        ]
        b = out["https://b.ex/q"]
        assert b["title"] == "" and list(b["links"]) == []

    def test_record_is_warc_metadata_json(self, spark):
        from pandas_weights_spark.sources.warc import (
            parse_warc_bytes,
            wat_record,
        )

        df = spark.createDataFrame(
            [("https://a.ex/p", self.HTML)], "uri string, html string"
        )
        rec = df.select(
            wat_record(
                F.col("uri"), F.lit("2026-01-02T00:00:00Z"),
                F.col("html"),
            ).alias("r")
        ).first()["r"]
        parsed = parse_warc_bytes(bytes(rec))[0]
        assert parsed["warc_type"] == "metadata"
        assert parsed["content_type"] == "application/json"
        import json

        env = json.loads(parsed["block"].decode())["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Type"] == "response"
        md = env["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]
        assert md["Head"]["Title"] == "A & B"
        assert md["Links"][0]["path"] == "A@/href"

    def test_composes_into_link_graph(self, spark):
        # WAT links -> link_graph edges must equal link_graph straight
        # off the response HTML (the WAT promise: same graph, no HTML)
        from pandas_weights_spark.functions.html import link_graph
        from pandas_weights_spark.functions.text import url_domain

        rows = [
            ("https://a.ex/p",
             '<a href="https://b.ex/1">x</a><a href="https://b.ex/2">y</a>'
             '<a href="/self">s</a>'),
            ("https://b.ex/q", '<a href="https://a.ex/z">back</a>'),
        ]
        df = spark.createDataFrame(rows, "uri string, html string")
        direct = {
            (r["src"], r["dst"]): r["weight"]
            for r in link_graph(
                df.withColumn("host", url_domain(F.col("uri"))),
                "html", "host",
            ).collect()
        }
        wat = self._roundtrip(spark, rows)
        src = F.lower(url_domain(F.col("target_uri")))
        edges = wat.select(
            src.alias("src"), F.explode("links").alias("l")
        )
        dst = url_domain(F.col("l.url"))
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in edges.select(
                "src",
                F.when(F.length(dst) > 0, dst)
                .otherwise(F.col("src"))
                .alias("dst"),
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("weight"))
            .collect()
        }
        assert got == direct and got


class TestRecordSpansContentLengthWalk:
    """r15 (ADVICE r14, high): the raw-framing span walk must step by
    Content-Length like parse_warc_bytes, not scan for the next
    'WARC/1.0\\r\\n' magic — a record whose PAYLOAD contains that byte
    sequence (crawled text about WARC, nested WARC) got a silently
    truncated span whose slice then failed to re-parse."""

    @staticmethod
    def _raw_rec(uri: bytes, payload: bytes) -> bytes:
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: resource\r\n"
            b"WARC-Target-URI: " + uri + b"\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"WARC-Record-ID: <urn:uuid:t>\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        )
        return hdr + payload + b"\r\n\r\n"

    def test_magic_inside_block_does_not_split_span(self):
        from pandas_weights_spark.sources.warc import _record_spans

        p1 = b"quoting a header: WARC/1.0\r\nWARC-Type: fake\r\n rest"
        p2 = b"second record"
        r1 = self._raw_rec(b"http://a.example/", p1)
        r2 = self._raw_rec(b"http://b.example/", p2)
        shard = r1 + r2
        spans = _record_spans(shard)
        assert [(off, ln) for off, ln, _ in spans] == [
            (0, len(r1)), (len(r1), len(r2)),
        ]
        # every span slice re-parses standalone to the right record
        from pandas_weights_spark.sources.warc import parse_warc_bytes

        for (off, ln, rec), uri, payload in zip(
            spans, ["http://a.example/", "http://b.example/"], [p1, p2]
        ):
            got = parse_warc_bytes(shard[off : off + ln])
            assert len(got) == 1
            assert got[0]["target_uri"] == uri == rec["target_uri"]
            assert bytes(got[0]["block"]) == payload

    def test_unparseable_header_is_skipped_not_fatal(self):
        from pandas_weights_spark.sources.warc import _record_spans

        bogus = (
            b"WARC/1.0\r\nWARC-Type: junk\r\n"
            b"Content-Length: NaN\r\n\r\n"
        )
        real = self._raw_rec(b"http://c.example/", b"payload")
        spans = _record_spans(bogus + real)
        assert len(spans) == 1
        assert spans[0][0] == len(bogus)
        assert spans[0][2]["target_uri"] == "http://c.example/"

    def test_spans_stay_tight_around_each_record(self):
        # r16 (ADVICE r15): bytes of a skipped unparseable-header
        # record between two real records must NOT be absorbed into
        # the previous record's span — (offset, length) stays tight
        # at header + block + CRLFCRLF so total_bytes/ranges never
        # over-report on corrupt shards
        from pandas_weights_spark.sources.warc import (
            _record_spans,
            parse_warc_bytes,
        )

        r1 = self._raw_rec(b"http://a.example/", b"first")
        bogus = (
            b"WARC/1.0\r\nWARC-Type: junk\r\n"
            b"Content-Length: NaN\r\n\r\njunk-bytes"
        )
        r2 = self._raw_rec(b"http://b.example/", b"second")
        shard = r1 + bogus + r2
        spans = _record_spans(shard)
        assert [(off, ln) for off, ln, _ in spans] == [
            (0, len(r1)), (len(r1) + len(bogus), len(r2)),
        ]
        for off, ln, rec in spans:
            got = parse_warc_bytes(shard[off:off + ln])
            assert len(got) == 1
            assert got[0]["target_uri"] == rec["target_uri"]
