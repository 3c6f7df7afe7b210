"""HTML → text extraction (functions/html.py): visible-text chain,
title/link extraction, and the jusText-lite block/link-density
boilerplate filter. All expected values are hand-derived."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.html import (
    extract_links,
    extract_title,
    html_extract,
    html_to_text,
    main_content,
)

PAGE = """<!DOCTYPE html><html><head><title>My &amp; Page</title>
<meta charset="utf-8"><style>body { color: red; }</style>
<script>var x = "<p>not text</p>";</script></head>
<body><nav><a href="/a">Home</a> <a href="/b">About</a></nav>
<h1>Heading &quot;One&quot;</h1>
<p>First real paragraph with enough words to survive the filter
easily.</p>
<div>Short.</div>
<p>Second paragraph with <b>bold</b> text and <a href="http://x.com/d">a
link</a> inside a longer run of plain prose.</p>
<!-- comment <p>ghost</p> -->
<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>
</body></html>"""


def _one(spark, col, html=PAGE):
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(col.alias("v")).first()["v"]


class TestHtmlToText:
    def test_page(self, spark):
        txt = _one(spark, html_to_text(F.col("h")))
        assert txt.startswith("Home About\n\nHeading \"One\"")
        assert "not text" not in txt  # script body gone
        assert "color: red" not in txt  # style body gone
        assert "ghost" not in txt  # comment gone
        assert "My & Page" not in txt  # head/title not body text
        assert "First real paragraph" in txt
        assert "bold" in txt and "<b>" not in txt

    def test_block_tags_become_newlines(self, spark):
        # adjacent boundaries (</p><p>) collapse to a paragraph break;
        # a lone <br> is a single newline
        txt = _one(
            spark, html_to_text(F.col("h")),
            "<p>one</p><p>two</p><br>three",
        )
        assert txt == "one\n\ntwo\n\nthree"
        assert _one(
            spark, html_to_text(F.col("h")), "a<br>b"
        ) == "a\nb"

    def test_entities_amp_decoded_last(self, spark):
        # double-encoded &amp;lt; must become "&lt;", not "<"
        txt = _one(spark, html_to_text(F.col("h")), "a &amp;lt; b")
        assert txt == "a &lt; b"

    def test_unknown_entity_passthrough(self, spark):
        assert _one(
            spark, html_to_text(F.col("h")), "x &bogus; y"
        ) == "x &bogus; y"

    def test_unclosed_script_degrades_to_tag_strip(self, spark):
        txt = _one(
            spark, html_to_text(F.col("h")),
            "<p>keep</p><script>var a = 1;",
        )
        assert txt.startswith("keep")  # no over-deletion

    def test_null_and_plain(self, spark):
        df = spark.createDataFrame([(None,), ("no tags here",)], ["h"])
        vals = [
            r["v"]
            for r in df.select(
                html_to_text(F.col("h")).alias("v")
            ).collect()
        ]
        assert vals == [None, "no tags here"]

    def test_header_tag_not_eaten_by_head(self, spark):
        # <head...> container removal must not match <header>
        txt = _one(
            spark, html_to_text(F.col("h")),
            "<header>site chrome</header><p>body text</p>",
        )
        assert "site chrome" in txt and "body text" in txt

    def test_whitespace_collapse(self, spark):
        txt = _one(
            spark, html_to_text(F.col("h")),
            "<p>a   b\t c</p>\n\n\n\n<p>d</p>",
        )
        assert txt == "a b c\n\nd"


class TestTitleAndLinks:
    def test_title(self, spark):
        assert _one(spark, extract_title(F.col("h"))) == "My & Page"

    def test_title_missing(self, spark):
        assert _one(spark, extract_title(F.col("h")), "<p>x</p>") == ""

    def test_title_with_attrs(self, spark):
        assert (
            _one(
                spark, extract_title(F.col("h")),
                '<title data-x="1"> Spaced  Title </title>',
            )
            == "Spaced Title"
        )

    def test_links_in_order_with_duplicates(self, spark):
        links = _one(spark, extract_links(F.col("h")))
        assert links == ["/a", "/b", "http://x.com/d", "/t", "/p"]

    def test_links_quote_styles(self, spark):
        links = _one(
            spark, extract_links(F.col("h")),
            "<a href='/sq'>s</a><a HREF=\"/dq\">d</a><a href='/sq'>s</a>",
        )
        assert links == ["/sq", "/dq", "/sq"]

    def test_no_links(self, spark):
        assert _one(spark, extract_links(F.col("h")), "<p>x</p>") == []


class TestMainContent:
    def test_boilerplate_dropped(self, spark):
        c = _one(spark, main_content(F.col("h")))
        assert "First real paragraph" in c
        assert "Second paragraph" in c
        assert "Home About" not in c  # nav: link density 1.0
        assert "Terms" not in c  # footer link farm
        assert "Short." not in c  # < min_words
        assert "My & Page" not in c  # head stripped

    def test_min_words_parameter(self, spark):
        c = _one(spark, main_content(F.col("h"), min_words=1))
        assert "Short." in c

    def test_link_density_parameter(self, spark):
        html = (
            "<p>five words with <a href='/x'>a link here now</a></p>"
        )
        # 4/8 words are anchor text → density ~0.47 by characters
        keep = _one(
            spark, main_content(F.col("h"), 3, 0.9), html
        )
        drop = _one(
            spark, main_content(F.col("h"), 3, 0.2), html
        )
        assert "five words" in keep and drop == ""

    def test_all_boilerplate_is_empty(self, spark):
        assert (
            _one(
                spark, main_content(F.col("h")),
                "<nav><a href='/'>x</a></nav>",
            )
            == ""
        )


class TestHtmlExtractFrame:
    def test_columns_and_null_row(self, spark):
        df = spark.createDataFrame(
            [(1, PAGE), (2, None)], ["id", "html"]
        )
        out = html_extract(df, "html").orderBy("id").collect()
        assert out[0]["title"] == "My & Page"
        assert out[0]["n_links"] == 5
        assert "First real paragraph" in out[0]["content"]
        assert out[1]["text"] is None and out[1]["n_links"] is None

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame([(1, PAGE)], ["id", "html"])
        plan = html_extract(df, "html")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_matches_standalone_functions(self, spark):
        # r12 shared html_parts path: text/content byte-identical to
        # the standalone html_to_text / main_content on ordinary
        # pages (the one documented divergence needs a tag whose
        # attribute text spans a block-tag match)
        pages = [
            PAGE,
            "<p>one</p><p>two</p><br>three",
            "a &amp;lt; b &#38;lt; c &#8212; caf&#233; &#x4E2D;",
            "plain, no tags or entities",
            "",
            "<div>x<script>hidden()</script>y</div>",
        ]
        df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], ["id", "html"])
        new = html_extract(df, "html").orderBy("id").collect()
        old = df.select(
            "id",
            html_to_text(F.col("html")).alias("text"),
            main_content(F.col("html"), 5, 0.5).alias("content"),
        ).orderBy("id").collect()
        for a, b in zip(new, old):
            assert a["text"] == b["text"], a["id"]
            assert a["content"] == b["content"], a["id"]

    def test_documented_blockwise_divergence(self, spark):
        # a block-tag match INSIDE another tag's attribute: the
        # whole-document form eats the unclosed fragment; the
        # block-wise frame keeps it as text (html_parts docstring)
        html = '<p>before</p><img alt="<div>junk"><p>after words</p>'
        df = spark.createDataFrame([(1, html)], ["id", "html"])
        r = html_extract(df, "html").first()
        whole = df.select(
            html_to_text(F.col("html")).alias("t")
        ).first()["t"]
        assert "before" in r["text"] and "after words" in r["text"]
        # frame keeps the orphaned '<img alt="' fragment as text
        assert '<img alt="' in r["text"]
        assert '<img alt="' not in whole

    def test_projection_barrier_single_parts_eval(self, spark):
        # the __parts__ producer must stay its OWN Project node
        # (CollapseProject keeps non-cheap producers referenced
        # twice), so the per-block strip+decode runs once per row —
        # the numeric-ref split tree appears exactly twice in the
        # plan: once in html_parts, once in the tiny title decode
        df = spark.createDataFrame([(1, PAGE)], ["id", "html"])
        plan = (
            html_extract(df, "html")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("__parts__") >= 2  # producer + consumers
        assert plan.count("&#, -1") == 2

    def test_construction_memoized(self, spark):
        from pandas_weights_spark.functions.html import _EXTRACT_COLS

        df = spark.createDataFrame([(1, PAGE)], ["id", "html"])
        html_extract(df, "html")
        c1 = _EXTRACT_COLS[("html", 5, 0.5)]["text"]
        html_extract(df, "html")
        assert _EXTRACT_COLS[("html", 5, 0.5)]["text"] is c1


class TestLinkGraph:
    def test_edges_and_weights(self, spark):
        from pandas_weights_spark.functions.html import link_graph

        rows = [
            (
                "A.com",
                '<a href="https://B.com/x">1</a>'
                '<a href="https://b.com:8080/y">2</a>'
                '<a href="/rel">3</a>'
                '<a href="#frag">4</a>'
                '<a href="mailto:z@q.org">5</a>',
            ),
            ("a.com", '<a href="https://c.org/">6</a>'),
            ("d.net", "<p>no links at all</p>"),
        ]
        df = spark.createDataFrame(rows, ["host", "html"])
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in link_graph(df, "html", "host").collect()
        }
        assert got == {
            ("a.com", "b.com"): 2,  # host lowercased, port stripped
            ("a.com", "a.com"): 3,  # rel + fragment + mailto → self
            ("a.com", "c.org"): 1,
        }  # d.net: zero links → zero rows

    def test_composes_with_pagerank(self, spark):
        from pandas_weights_spark.functions.graph import pagerank
        from pandas_weights_spark.functions.html import link_graph

        rows = [
            ("hub.io", '<a href="https://a.io/">x</a><a href="https://b.io/">y</a>'),
            ("a.io", '<a href="https://b.io/">z</a>'),
            ("b.io", '<a href="/self">w</a>'),
        ]
        df = spark.createDataFrame(rows, ["host", "html"])
        edges = link_graph(df, "html", "host")
        pr = pagerank(
            edges, "src", "dst", weight=F.col("weight"), iters=5
        )
        ranks = {r[0]: r[1] for r in pr.collect()}
        assert ranks["b.io"] == max(ranks.values())
        assert abs(sum(ranks.values()) - 1.0) < 1e-9


class TestNumericCharRefs:
    """r10 (VERDICT r9 #3 carried item): generic &#NNN;/&#xHH; decode —
    C1 range through the WHATWG windows-1252 remap, NUL/surrogate/
    out-of-range to U+FFFD, escaped refs stay literal, and the DuckDB
    SQL emitter replays every case bit-exact."""

    CASES = [
        ("plain &#72;&#101;llo", "plain Hello"),
        ("hex &#x48;&#X65;x", "hex Hex"),
        ("dash &#8212; caf&#233; &#x4e2d;&#x6587;",
         "dash — café 中文"),
        # C1 range = windows-1252 glyphs per the WHATWG remap
        ("c1 &#147;quoted&#148; &#146;", "c1 “quoted” ’"),
        # decoded '&' is inert: &#38;lt; renders "&lt;" literally
        ("amp &#38;lt; stays literal", "amp &lt; stays literal"),
        # and &amp;#65; must NOT double-decode into 'A'
        ("double &amp;#65; stays ref", "double &#65; stays ref"),
        ("bad &#0; &#55296; &#1114112; end", "bad � � � end"),
        ("nonref &# x &#x; &#12345678; &#xyz;",
         "nonref &# x &#x; &#12345678; &#xyz;"),
        ("emoji &#128512;!", "emoji 😀!"),
        ("edge &#65", "edge &#65"),  # semicolon required
    ]

    def test_spark_decodes(self, spark):
        from pandas_weights_spark.functions.html import html_to_text

        df = spark.createDataFrame(
            [(c,) for c, _ in self.CASES], ["h"]
        )
        got = [
            r["t"]
            for r in df.select(
                html_to_text(F.col("h")).alias("t")
            ).collect()
        ]
        for (src, want), g in zip(self.CASES, got):
            assert g == want, src

    def test_duckdb_replay_bit_exact(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            html_to_text,
            html_to_text_sql,
        )

        df = spark.createDataFrame(
            [(c,) for c, _ in self.CASES], ["h"]
        )
        got = [
            r["t"]
            for r in df.select(
                html_to_text(F.col("h")).alias("t")
            ).collect()
        ]
        con = duckdb.connect()
        sql = html_to_text_sql("h")
        for (src, _), g in zip(self.CASES, got):
            w = con.sql(
                f"SELECT {sql} AS t FROM (SELECT ? AS h)", params=[src]
            ).fetchone()[0]
            assert g == w, src

    def test_title_and_main_content_decode_refs(self, spark):
        from pandas_weights_spark.functions.html import (
            extract_title,
            main_content,
        )

        html = (
            "<html><head><title>caf&#233; &#8212; news</title></head>"
            "<body><p>A sufficiently long paragraph mentions the "
            "caf&#233; &#147;menu&#148; in passing here.</p>"
            "</body></html>"
        )
        df = spark.createDataFrame([(html,)], ["h"])
        row = df.select(
            extract_title(F.col("h")).alias("t"),
            main_content(F.col("h")).alias("c"),
        ).first()
        assert row["t"] == "café — news"
        assert "café “menu”" in row["c"]


class TestExtractAnchors:
    """r10: extract_anchors / anchor_stats — (href, anchor text)
    pairs and the per-target inbound anchor-text profile."""

    CASES = [
        # entities + inner tags in the anchor text
        ('<a href="https://x.com/a"><b>Read &amp; more</b></a>',
         [("https://x.com/a", "Read & more")]),
        # attribute order, single quotes, numeric reference, newline
        ("<p><a class='z' href='/rel'>caf&#233;\n now</a></p>",
         [("/rel", "café now")]),
        # two anchors in order; empty anchor text kept as ''
        ('<a href="https://y.org/1">one</a> mid '
         '<a href="https://y.org/2"></a>',
         [("https://y.org/1", "one"), ("https://y.org/2", "")]),
        # UNCLOSED anchor: no pair; href-less anchor: no pair
        ('<a href="https://z.net/p">dangling <a name="k">text</a>',
         [("https://z.net/p", "dangling text")]),
        ("<a name='frag'>no href</a>", []),
        ("plain text, no anchors", []),
    ]

    def test_pairs(self, spark):
        from pandas_weights_spark.functions.html import extract_anchors

        df = spark.createDataFrame([(c,) for c, _ in self.CASES], ["h"])
        got = [
            [(p["href"], p["anchor"]) for p in r["a"]]
            for r in df.select(
                extract_anchors(F.col("h")).alias("a")
            ).collect()
        ]
        for (src, want), g in zip(self.CASES, got):
            assert g == want, src

    def test_duckdb_replay_bit_exact(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            extract_anchors,
            extract_anchors_sql,
        )

        df = spark.createDataFrame([(c,) for c, _ in self.CASES], ["h"])
        got = [
            [(p["href"], p["anchor"]) for p in r["a"]]
            for r in df.select(
                extract_anchors(F.col("h")).alias("a")
            ).collect()
        ]
        con = duckdb.connect()
        sql = extract_anchors_sql("h")
        for (src, _), g in zip(self.CASES, got):
            w = con.sql(
                f"SELECT {sql} AS a FROM (SELECT ? AS h)", params=[src]
            ).fetchone()[0]
            assert [(p["href"], p["anchor"]) for p in w] == g, src

    def test_anchor_stats_rollup(self, spark):
        from pandas_weights_spark.functions.html import anchor_stats

        pages = spark.createDataFrame(
            [
                # two pages on a.com both describe b.com as "B site";
                # one calls it "beta" -> top_anchor 'B site' (2 > 1)
                ("a.com", '<a href="https://b.com/1">B site</a>'
                          '<a href="https://b.com/2">beta</a>'),
                ("a.com", '<a href="https://b.com/3">B site</a>'
                          '<a href="/home">self link</a>'),
                # tie on c.com: 'x' vs 'y' 1-1 -> lexicographic 'x'
                ("d.com", '<a href="https://c.com/1">y</a>'
                          '<a href="https://c.com/2">x</a>'),
                # only empty anchors -> NULL top
                ("e.com", '<a href="https://f.com/1"></a>'),
            ],
            ["host", "html"],
        )
        got = {
            r["dst"]: (
                r["n_links"], r["n_texts"], r["top_anchor"], r["top_n"]
            )
            for r in anchor_stats(pages, "html", "host").collect()
        }
        assert got["b.com"] == (3, 2, "B site", 2)
        assert got["a.com"] == (1, 1, "self link", 1)  # relative self
        assert got["c.com"] == (2, 2, "x", 1)
        assert got["f.com"] == (1, 0, None, None)


class TestExtractTables:
    """r11: structured table recovery — tables -> rows -> decoded
    cell texts, tolerant of the omitted closing tags real pages
    ship."""

    def _t(self, spark, html):
        from pandas_weights_spark.functions.html import extract_tables

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(
            extract_tables(F.col("h")).alias("t")
        ).first()["t"]

    def test_basic_grid_with_header(self, spark):
        got = self._t(
            spark,
            "<table><tr><th>Name</th><th>Qty</th></tr>"
            "<tr><td>tea</td><td>4</td></tr></table>",
        )
        assert got == [[["Name", "Qty"], ["tea", "4"]]]

    def test_omitted_closing_tags(self, spark):
        got = self._t(
            spark, "<table><tr><td>a<td>b<tr><td>c</table>"
        )
        assert got == [[["a", "b"], ["c"]]]

    def test_entities_nested_tags_and_empty_cells(self, spark):
        got = self._t(
            spark,
            "<table><tr><td>caf&#233; &amp; tea</td>"
            "<td><b>bold</b> cell</td><td></td></tr></table>",
        )
        assert got == [[["café & tea", "bold cell", ""]]]

    def test_caption_and_script_do_not_leak(self, spark):
        got = self._t(
            spark,
            "<table><caption>Cap</caption><tr><td>x"
            '<script>var t="<tr><td>evil";</script></td></tr></table>',
        )
        assert got == [[["x"]]]

    def test_multiple_tables_no_tables_and_null(self, spark):
        from pandas_weights_spark.functions.html import extract_tables

        df = spark.createDataFrame(
            [
                (0, "<table><tr><td>1</td></tr></table>"
                    "<p>x</p><table><tr><td>2</td></tr></table>"),
                (1, "no tables"),
                (2, None),
            ],
            "i int, h string",
        )
        got = {
            r["i"]: r["t"]
            for r in df.select(
                "i", extract_tables(F.col("h")).alias("t")
            ).collect()
        }
        assert got[0] == [[["1"]], [["2"]]]
        assert got[1] == [] and got[2] is None

    def test_nested_table_degrades_documented(self, spark):
        # no DOM: the inner </table> ends the outer body early — the
        # outer table keeps the rows seen so far plus the inner rows
        got = self._t(
            spark,
            "<table><tr><td>outer</td></tr>"
            "<table><tr><td>inner</td></tr></table></table>",
        )
        assert got == [[["outer"], ["inner"]]]

    def test_sql_replay_matches(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            extract_tables,
            extract_tables_sql,
        )

        docs = [
            "<table><tr><th> K </th></tr><tr><td>v<td>w</table>",
            "<p>none</p>",
            "<table><tr><td>&#38;lt; kept</td></tr></table>",
        ]
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "i int, h string"
        )
        got = {
            r["i"]: r["t"]
            for r in df.select(
                "i", extract_tables(F.col("h")).alias("t")
            ).collect()
        }
        con = duckdb.connect()
        sql = extract_tables_sql("h")
        for i, d in enumerate(docs):
            rep = con.execute(
                f"SELECT {sql} FROM (SELECT ? AS h)", [d]
            ).fetchone()[0]
            assert rep == got[i], d


class TestExtractMeta:
    META_PAGE = (
        "<html><head><title>t</title>"
        '<meta name="description" content="Caf&#233; &amp; more">'
        '<meta content="OGT" property="og:title">'
        '<meta property="og:description" content="OGD">'
        '<link rel="canonical" href="https://ex.org/a">'
        '<meta property="article:published_time" '
        'content="2023-05-17T08:30:00Z">'
        "</head><body>"
        '<time datetime="2001-01-01">decoy</time>'
        "x</body></html>"
    )

    def _meta(self, spark, html):
        from pandas_weights_spark.functions.html import extract_meta

        df = spark.createDataFrame([(html,)], "h string")
        m = extract_meta(F.col("h"))
        return df.select(
            *[v.alias(k) for k, v in m.items()]
        ).first()

    def test_full_page(self, spark):
        r = self._meta(spark, self.META_PAGE)
        assert r["meta_description"] == "Café & more"
        assert r["og_title"] == "OGT"  # reversed attribute order
        assert r["og_description"] == "OGD"
        assert r["canonical_url"] == "https://ex.org/a"
        # meta article:published_time wins over the body <time>
        assert r["published_raw"] == "2023-05-17T08:30:00Z"
        assert str(r["published_date"]) == "2023-05-17"

    def test_absent_fields_empty(self, spark):
        r = self._meta(spark, "<html><body>plain</body></html>")
        assert r["meta_description"] == ""
        assert r["og_title"] == ""
        assert r["canonical_url"] == ""
        assert r["published_raw"] == ""
        assert r["published_date"] is None

    def test_time_beats_ldjson(self, spark):
        html = (
            '<script type="application/ld+json">'
            '{"datePublished": "2020-02-02"}</script>'
            '<time datetime="2021-03-03T00:00:00">x</time>'
        )
        r = self._meta(spark, html)
        assert r["published_raw"] == "2021-03-03T00:00:00"
        assert str(r["published_date"]) == "2021-03-03"

    def test_ldjson_fallback_and_reversed_canonical(self, spark):
        html = (
            '<link href="https://c.example/x" rel="canonical">'
            '<script type="application/ld+json">'
            '{"datePublished": "2019-12-31T23:59:59+01:00"}</script>'
        )
        r = self._meta(spark, html)
        assert r["canonical_url"] == "https://c.example/x"
        assert str(r["published_date"]) == "2019-12-31"

    def test_unparseable_date_null(self, spark):
        r = self._meta(spark, '<time datetime="last tuesday">x</time>')
        assert r["published_raw"] == "last tuesday"
        assert r["published_date"] is None

    def test_duckdb_replay_agrees(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            extract_meta_sql,
        )

        pages = [
            self.META_PAGE,
            "<html><body>plain</body></html>",
            '<time datetime="2021-03-03">x</time>',
            '<meta content="rev &lt;d&gt;" name="description">',
        ]
        m = extract_meta_sql("h")
        cols = ", ".join(f"{v} AS {k}" for k, v in m.items())
        for p in pages:
            got = self._meta(spark, p).asDict()
            lit = p.replace("'", "''")
            exp = (
                duckdb.sql(f"SELECT {cols} FROM (SELECT '{lit}' AS h)")
                .df()
                .iloc[0]
                .to_dict()
            )
            for k in got:
                g, e = got[k], exp[k]
                if k == "published_date":
                    g = None if g is None else str(g)
                    import pandas as pd

                    e = None if pd.isna(e) else str(pd.Timestamp(e).date())
                assert g == e, (k, p, g, e)

    def test_row_local_plan(self, spark):
        from pandas_weights_spark.functions.html import extract_meta

        df = spark.createDataFrame([("<p>x</p>",)], "h string")
        m = extract_meta(F.col("h"))
        plan = (
            df.select(*[v.alias(k) for k, v in m.items()])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestHtmlToMarkdown:
    def _md(self, spark, html):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
        )

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(
            html_to_markdown(F.col("h")).alias("v")
        ).first()["v"]

    def test_full_page(self, spark):
        html = (
            "<html><head><title>x</title><style>p{}</style></head>"
            "<body><h1>Big &amp; Bold</h1>"
            "<p>Hello <strong>world</strong> and <em>more</em>.</p>"
            "<ul><li>one</li><li>two</li></ul>"
            '<a href="/x">a <b>link</b></a><hr>'
            "<blockquote>quoted text</blockquote>"
            "<p>inline <code>x=1</code> here</p>"
            '<img src="/i.png"></body></html>'
        )
        assert self._md(spark, html) == (
            "# Big & Bold\n\n"
            "Hello **world** and *more*.\n\n"
            "- one\n- two\n\n"
            "[a **link**](/x)\n\n"
            "---\n\n"
            "> quoted text\n\n"
            "inline `x=1` here\n\n"
            "![](/i.png)"
        )

    def test_heading_levels(self, spark):
        html = "".join(f"<h{n}>t{n}</h{n}>" for n in range(1, 7))
        assert self._md(spark, html) == "\n\n".join(
            f"{'#' * n} t{n}" for n in range(1, 7)
        )

    def test_fenced_pre_code(self, spark):
        md = self._md(
            spark, "<pre><code>a = 1\nreturn a</code></pre>"
        )
        # whitespace collapse inside fences is the documented no-DOM
        # approximation: lines survive, indentation does not
        assert md == "```\na = 1\nreturn a\n```"

    def test_unclosed_list_items(self, spark):
        assert (
            self._md(spark, "<ol><li>first<li>second</ol>")
            == "- first\n- second"
        )

    def test_bold_inside_anchor_rule_order(self, spark):
        assert (
            self._md(spark, '<a href="/y"><b>hot</b> take</a>')
            == "[**hot** take](/y)"
        )

    def test_invisible_and_entities(self, spark):
        md = self._md(
            spark,
            "<script>var a=1;</script><p>caf&#233; &amp; co</p>",
        )
        assert md == "café & co"

    def test_null_html(self, spark):
        assert self._md(spark, None) is None

    def test_duckdb_replay_agrees(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            html_to_markdown_sql,
        )

        pages = [
            "<h2>T</h2><p>a <em>b</em> <a href='/u'>c</a></p>"
            "<ul><li>i<li>j</ul><pre>code  here</pre>",
            "<blockquote>q &#x4E2D;</blockquote><hr><img src='/s'>",
        ]
        sql = html_to_markdown_sql("h")
        for p in pages:
            got = self._md(spark, p)
            lit = p.replace("'", "''")
            exp = duckdb.sql(
                f"SELECT {sql} AS v FROM (SELECT '{lit}' AS h)"
            ).fetchone()[0]
            assert got == exp, p

    def test_row_local_plan(self, spark):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
        )

        df = spark.createDataFrame([("<p>x</p>",)], "h string")
        plan = (
            df.select(html_to_markdown(F.col("h")).alias("v"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestExtractMetaInvalidDate:
    def test_regex_passing_invalid_date_is_null_not_error(self, spark):
        # ANSI mode is on: a plain to_date would throw on 2024-99-99;
        # the gate must yield NULL instead (a bad date on one page
        # must never kill a corpus-wide scan)
        from pandas_weights_spark.functions.html import extract_meta

        df = spark.createDataFrame(
            [('<time datetime="2024-99-99T00:00:00">x</time>',)],
            "h string",
        )
        m = extract_meta(F.col("h"))
        r = df.select(
            m["published_raw"].alias("raw"),
            m["published_date"].alias("d"),
        ).first()
        assert r["raw"] == "2024-99-99T00:00:00"
        assert r["d"] is None

    def test_duckdb_agrees_on_invalid_date(self):
        import duckdb

        from pandas_weights_spark.functions.html import (
            extract_meta_sql,
        )

        sql = extract_meta_sql("h")["published_date"]
        v = duckdb.sql(
            "SELECT " + sql + " AS d FROM (SELECT "
            "'<time datetime=\"2024-99-99\">x</time>' AS h)"
        ).fetchone()[0]
        assert v is None


class TestExtractTablesSpans:
    """r12: expand_spans=True — rectangular grid expansion of
    colspan/rowspan (pandas.read_html semantics), identity on
    span-free tables."""

    def _tables(self, spark, html, **kw):
        from pandas_weights_spark.functions.html import extract_tables

        df = spark.createDataFrame([(html,)], ["h"])
        return df.select(
            extract_tables(F.col("h"), **kw).alias("t")
        ).first()["t"]

    def test_colspan_repeats_across_columns(self, spark):
        t = self._tables(
            spark,
            '<table><tr><td colspan="3">wide</td><td>x</td></tr>'
            "<tr><td>a<td>b<td>c<td>d</tr></table>",
            expand_spans=True,
        )
        assert t == [[["wide", "wide", "wide", "x"],
                      ["a", "b", "c", "d"]]]

    def test_rowspan_hangs_down_rows(self, spark):
        t = self._tables(
            spark,
            '<table><tr><td rowspan="3">tall</td><td>r0</td></tr>'
            "<tr><td>r1</td></tr><tr><td>r2</td></tr></table>",
            expand_spans=True,
        )
        assert t == [[["tall", "r0"], ["tall", "r1"], ["tall", "r2"]]]

    def test_block_span_fills_rectangle(self, spark):
        t = self._tables(
            spark,
            '<table><tr><td colspan="2" rowspan="2">X</td><td>r0'
            "</td></tr><tr><td>r1</td></tr>"
            "<tr><td>p<td>q<td>r</tr></table>",
            expand_spans=True,
        )
        assert t == [[["X", "X", "r0"], ["X", "X", "r1"],
                      ["p", "q", "r"]]]

    def test_mid_row_rowspan_interleaves(self, spark):
        # the hanging span sits BETWEEN later-row cells
        t = self._tables(
            spark,
            '<table><tr><td>a</td><td rowspan="2">m</td><td>b</td>'
            "</tr><tr><td>c<td>d</tr></table>",
            expand_spans=True,
        )
        assert t == [[["a", "m", "b"], ["c", "m", "d"]]]

    def test_span_free_identity(self, spark):
        html = (
            "<table><tr><th>K</th><th>V&#233;</th></tr>"
            "<tr><td>doc<td>7</tr>"
            "<tr><td> padded </td><td><b>src</b></td><td></td></tr>"
            "</table><table><caption>c</caption>"
            "<tr><td>one &amp; two</td></tr></table>"
        )
        assert self._tables(spark, html, expand_spans=True) == \
            self._tables(spark, html)

    def test_overhanging_rowspan_truncates(self, spark):
        t = self._tables(
            spark,
            '<table><tr><td rowspan="9">h</td><td>x</td></tr>'
            "<tr><td>y</td></tr></table>",
            expand_spans=True,
        )
        assert t == [[["h", "x"], ["h", "y"]]]

    def test_zero_and_clamped_spans(self, spark):
        # rowspan=0 / colspan=0 count 1 (documented); spec clamps
        t = self._tables(
            spark,
            '<table><tr><td rowspan="0">z</td>'
            "<td colspan=0>w</td></tr></table>",
            expand_spans=True,
        )
        assert t == [[["z", "w"]]]

    def test_quote_styles_and_case(self, spark):
        t = self._tables(
            spark,
            "<table><tr><td COLSPAN='2'>a</td><td ROWSPAN=2>b</td>"
            "</tr><tr><td>c<td>d</tr></table>",
            expand_spans=True,
        )
        assert t == [[["a", "a", "b"], ["c", "d", "b"]]]

    def test_null_html(self, spark):
        from pandas_weights_spark.functions.html import extract_tables

        df = spark.createDataFrame([(None,)], "h string")
        assert df.select(
            extract_tables(F.col("h"), expand_spans=True).alias("t")
        ).first()["t"] is None

    def test_no_shuffle_plan(self, spark):
        from pandas_weights_spark.functions.html import extract_tables

        df = spark.createDataFrame(
            [("<table><tr><td>a</td></tr></table>",)], ["h"]
        )
        plan = (
            df.select(extract_tables(F.col("h"), expand_spans=True))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestMarkdownEscape:
    """r12: html_to_markdown(escape=True) — source metachars
    backslash-escape, generated structure and code interiors stay
    verbatim (CommonMark code semantics)."""

    def _md(self, spark, html, **kw):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
        )

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(
            html_to_markdown(F.col("h"), **kw).alias("m")
        ).first()["m"]

    def test_source_metachars_escaped(self, spark):
        m = self._md(
            spark,
            "<p>star *a* under_score #tag [br] back\\slash `t`</p>",
            escape=True,
        )
        assert m == (
            "star \\*a\\* under\\_score \\#tag \\[br\\] "
            "back\\\\slash \\`t\\`"
        )

    def test_generated_marks_not_escaped(self, spark):
        m = self._md(
            spark,
            '<h2>T</h2><p><b>bold</b> <i>it</i> <a href="/x">l</a>'
            '<img src="/i.png"></p>',
            escape=True,
        )
        assert "## T" in m
        assert "**bold**" in m and "*it*" in m
        assert "[l](/x)" in m and "![](/i.png)" in m
        assert "\\" not in m

    def test_code_interiors_stay_verbatim(self, spark):
        m = self._md(
            spark,
            "<pre><code>fence * _k_ #v [r]</code></pre>"
            "<p>out *esc* and <code>in * raw_</code> done</p>",
            escape=True,
        )
        assert "```\nfence * _k_ #v [r]\n```" in m
        assert "`in * raw_`" in m
        assert "\\*esc\\*" in m

    def test_entity_materialized_metachars_escape(self, spark):
        # &#42; decodes to '*' AFTER the rules run — still escaped
        m = self._md(
            spark, "<p>&#42;x&#42; and &#95;y&#95;</p>", escape=True
        )
        assert m == "\\*x\\* and \\_y\\_"

    def test_escaped_anchor_text_brackets(self, spark):
        m = self._md(
            spark, '<p><a href="/x">l[i]nk</a></p>', escape=True
        )
        assert m == "[l\\[i\\]nk](/x)"

    def test_default_unescaped_unchanged(self, spark):
        html = "<p>star *a* `t` <b>bb</b></p>"
        assert self._md(spark, html) == "star *a* `t` **bb**"

    def test_null_html(self, spark):
        assert self._md(spark, None, escape=True) is None

    def test_sql_replay_parity(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            html_to_markdown_sql,
        )

        pages = [
            "<h1>T *l*</h1><p>a_b #c [d] \\e `f`</p>",
            "<pre><code>k * _x_</code></pre><p>out *y* &#42;z&#42;</p>",
            '<p><b>B</b> <code>c_*</code> <a href="/u">t[0]</a></p>',
        ]
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(pages)], ["i", "h"]
        )
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i",
                html_to_markdown(F.col("h"), escape=True).alias("m"),
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{p.replace(chr(39), chr(39)*2)}')"
                for i, p in enumerate(pages)
            )
            + ") t(i, h)"
        )
        sql = html_to_markdown_sql("h", escape=True)
        want = dict(con.execute(f"SELECT i, {sql} FROM d").fetchall())
        assert got == want


class TestMarkdownSharedRender:
    """r12: the sentinel render shared by both markdown outputs —
    plain derivation must be byte-identical to html_to_markdown."""

    PAGES = [
        "<h1>T *l*</h1><p>a_b #c [d] \\e `f`</p>",
        "<pre><code>k * _x_</code></pre><p>out *y* &#42;z&#42;</p>",
        '<p><b>B</b> <em>i</em> <code>c_*</code>'
        ' <a href="/u">t[0]</a> <img src="/i.png"><hr></p>',
        "<ul><li>a<li>b</li></ul><blockquote>q</blockquote>",
        "plain text, no tags",
        "",
    ]

    def test_plain_from_sentinels_equals_direct(self, spark):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            md_from_sentinels,
            md_render_sentinels,
        )

        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(self.PAGES)], ["i", "h"]
        )
        a = df.select(
            "i", html_to_markdown(F.col("h")).alias("m")
        ).orderBy("i").collect()
        b = df.select(
            "i",
            md_from_sentinels(
                md_render_sentinels(F.col("h"))
            ).alias("m"),
        ).orderBy("i").collect()
        assert [r["m"] for r in a] == [r["m"] for r in b]

    def test_escaped_from_sentinels_equals_direct(self, spark):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            md_escaped_from_sentinels,
            md_render_sentinels,
        )

        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(self.PAGES)], ["i", "h"]
        )
        a = df.select(
            "i", html_to_markdown(F.col("h"), escape=True).alias("m")
        ).orderBy("i").collect()
        b = df.select(
            "i",
            md_escaped_from_sentinels(
                md_render_sentinels(F.col("h"))
            ).alias("m"),
        ).orderBy("i").collect()
        assert [r["m"] for r in a] == [r["m"] for r in b]


class TestMarkdownFenceWhitespace:
    """r12: escape-mode fenced code keeps whitespace VERBATIM
    (indentation is semantic in code) while prose still collapses."""

    def _md(self, spark, html):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
        )

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(
            html_to_markdown(F.col("h"), escape=True).alias("m")
        ).first()["m"]

    def test_indentation_and_blank_lines_preserved(self, spark):
        body = "def f(x):\n    if x:\n        return  x*2\n\n\n\n    return 0"
        m = self._md(
            spark, f"<pre><code>{body}</code></pre><p>t   t *x*</p>"
        )
        assert m == f"```\n{body}\n```\n\nt t \\*x\\*"

    def test_tabs_and_runs_inside_fence(self, spark):
        m = self._md(spark, "<p>x</p><pre>raw   spaces\n\ttab</pre>")
        assert m == "x\n\n```\nraw   spaces\n\ttab\n```"

    def test_consecutive_fences_clean_seam(self, spark):
        m = self._md(spark, "<pre>a</pre><pre>b</pre>")
        assert m == "```\na\n```\n\n```\nb\n```"

    def test_plain_mode_still_collapses(self, spark):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
        )

        df = spark.createDataFrame(
            [("<pre>a    b</pre>",)], "h string"
        )
        m = df.select(
            html_to_markdown(F.col("h")).alias("m")
        ).first()["m"]
        assert m == "```\na b\n```"


class TestMarkdownPipeTables:
    """r13 (VERDICT r12 missing #2): html_to_markdown(pipe_tables=
    True) renders tables as GFM pipe rows — header from row 0,
    ``---`` separator, cell-internal inline tags still render,
    source pipes escape, spans compose."""

    PAGES = [
        # header via <th> + thead/tbody/caption junk, inline tags in
        # cells, a literal pipe, an EMPTY cell, prose around
        '<p>before</p><table><caption>cap</caption><thead>'
        "<tr><th>Name</th><th>Qty &amp; unit</th></tr></thead>"
        "<tbody><tr><td><b>ab</b> x</td><td>1|2</td></tr>"
        '<tr><td></td><td><a href="/u">link</a></td></tr>'
        "</tbody></table><p>after *star*</p>",
        # omitted closing tags, single row (header-only table)
        "<table><tr><td>only<td>row</table>",
        "<p>no tables here</p>",
        # rowless table degrades to a block break
        "<table></table><p>tail</p>",
        # two tables + block tags INSIDE a cell flatten to spaces
        "<table><tr><th>h</th></tr><tr><td><p>a</p><br>b</td></tr>"
        "</table>mid<table><tr><td>z</td></tr></table>",
    ]

    def _md(self, spark, html, **kw):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
        )

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(
            html_to_markdown(F.col("h"), **kw).alias("m")
        ).first()["m"]

    def test_render_pinned(self, spark):
        m = self._md(spark, self.PAGES[0], pipe_tables=True)
        assert m == (
            "before\n\n| Name | Qty & unit |\n| --- | --- |\n"
            "| **ab** x | 1\\|2 |\n| | [link](/u) |\n\nafter *star*"
        )
        esc = self._md(
            spark, self.PAGES[0], pipe_tables=True, escape=True
        )
        assert esc == (
            "before\n\n| Name | Qty & unit |\n| --- | --- |\n"
            "| **ab** x | 1\\|2 |\n| | [link](/u) |\n\n"
            "after \\*star\\*"
        )

    def test_edge_shapes(self, spark):
        assert self._md(spark, self.PAGES[1], pipe_tables=True) == (
            "| only | row |\n| --- | --- |"
        )
        assert (
            self._md(spark, self.PAGES[3], pipe_tables=True) == "tail"
        )
        assert self._md(spark, self.PAGES[4], pipe_tables=True) == (
            "| h |\n| --- |\n| a b |\n\nmid\n\n| z |\n| --- |"
        )

    def test_default_off_unchanged(self, spark):
        # without the flag, table tags stay mere block breaks (the
        # r12 render)
        m = self._md(spark, self.PAGES[1])
        assert m == "only\n\nrow" and "|" not in m

    def test_expand_spans_composes(self, spark):
        page = (
            '<table><tr><th colspan="2">W</th></tr>'
            "<tr><td>a</td><td>b</td></tr></table>"
        )
        m = self._md(
            spark, page, pipe_tables=True, expand_spans=True
        )
        assert m == "| W | W |\n| --- | --- |\n| a | b |"
        plain = self._md(spark, page, pipe_tables=True)
        assert plain == "| W |\n| --- |\n| a | b |"

    def test_shared_render_parity_with_pipes(self, spark):
        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            md_escaped_from_sentinels,
            md_from_sentinels,
            md_render_sentinels,
        )

        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(self.PAGES)], ["i", "h"]
        )
        sent = md_render_sentinels(F.col("h"), pipe_tables=True)
        got = df.select(
            "i",
            html_to_markdown(F.col("h"), pipe_tables=True).alias("p"),
            html_to_markdown(
                F.col("h"), escape=True, pipe_tables=True
            ).alias("e"),
            md_from_sentinels(sent).alias("sp"),
            md_escaped_from_sentinels(sent).alias("se"),
        ).collect()
        for r in got:
            assert r["p"] == r["sp"], r
            assert r["e"] == r["se"], r

    def test_duckdb_replay_bit_exact(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            html_to_markdown,
            html_to_markdown_sql,
        )

        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(self.PAGES)], ["i", "h"]
        )
        got = df.select(
            "i",
            html_to_markdown(F.col("h"), pipe_tables=True).alias("p"),
            html_to_markdown(
                F.col("h"), escape=True, pipe_tables=True
            ).alias("e"),
        ).orderBy("i").collect()
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i INT, h VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            list(enumerate(self.PAGES)),
        )
        want = con.sql(
            f"SELECT {html_to_markdown_sql('h', pipe_tables=True)} "
            f"AS p, "
            f"{html_to_markdown_sql('h', escape=True, pipe_tables=True)}"
            f" AS e FROM t ORDER BY i"
        ).fetchall()
        assert [(r["p"], r["e"]) for r in got] == want


class TestMetaRobots:
    """r14: page-level robots directives (meta_robots) — the per-page
    politeness gate next to robots.txt; noindex pages drop at
    hygiene time."""

    PAGES = [
        (0, '<meta name="robots" content="noindex, nofollow">', None),
        (1, '<meta content="NOINDEX" name="robots">', None),  # rev+case
        (2, '<meta name="robots" content="none">', None),     # none=both
        (3, '<meta name="robots" content="noarchive">'
            '<meta name="robots" content="nosnippet">', None),  # multiple
        (4, "<p>no directives</p>", None),
        (5, "<p>header only</p>",
            "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n"),
        (6, '<meta name="googlebot" content="noindex">', None),  # scoped: ignored
        (7, "<p>scoped header</p>",
            "HTTP/1.1 200 OK\r\nX-Robots-Tag: somebot: noindex\r\n"),
    ]

    def _run(self, spark):
        from pandas_weights_spark.functions.html import meta_robots

        df = spark.createDataFrame(
            self.PAGES, "i long, html string, hdrs string"
        )
        cols = meta_robots(F.col("html"), F.col("hdrs"))
        return {
            r["i"]: r
            for r in df.select(
                "i", *[c.alias(k) for k, c in cols.items()]
            ).collect()
        }

    def test_directives(self, spark):
        got = self._run(spark)
        assert got[0]["noindex"] and got[0]["nofollow"]
        assert not got[0]["noarchive"]
        assert got[1]["noindex"] and not got[1]["nofollow"]
        assert got[2]["noindex"] and got[2]["nofollow"]  # none -> both
        assert got[3]["noarchive"] and got[3]["nosnippet"]
        assert not got[3]["noindex"]
        assert not any(
            got[4][k] for k in ("noindex", "nofollow", "noarchive")
        )
        assert got[5]["noindex"]          # X-Robots-Tag header
        assert not got[6]["noindex"]      # bot-scoped meta ignored
        assert not got[7]["noindex"]      # bot-scoped header token

    def test_duckdb_twin(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            meta_robots,
            meta_robots_sql,
        )

        df = spark.createDataFrame(
            self.PAGES, "i long, html string, hdrs string"
        )
        cols = meta_robots(F.col("html"), F.col("hdrs"))
        got = [
            tuple(r)
            for r in df.select(
                "i", *[c.alias(k) for k, c in cols.items()]
            ).orderBy("i").collect()
        ]
        con = duckdb.connect()
        sqls = meta_robots_sql("html", "hdrs")
        sel = ", ".join(f"{v} AS {k}" for k, v in sqls.items())
        vals = ", ".join(
            "({}, {}, {})".format(
                i,
                "'" + h.replace("'", "''") + "'",
                "NULL" if hd is None
                else "'" + hd.replace("'", "''") + "'",
            )
            for i, h, hd in self.PAGES
        )
        exp = con.sql(
            f"SELECT i, {sel} FROM (VALUES {vals}) AS t(i, html, hdrs) "
            f"ORDER BY i"
        ).fetchall()
        assert got == [tuple(r) for r in exp]

    def test_html_only_signature(self, spark):
        from pandas_weights_spark.functions.html import meta_robots

        df = spark.createDataFrame(
            [('<meta name="robots" content=" NoIndex ">',)], ["html"]
        )
        cols = meta_robots(F.col("html"))
        r = df.select(
            *[c.alias(k) for k, c in cols.items()]
        ).first()
        assert r["noindex"] and not r["nofollow"]  # trim + casefold


class TestMetaRobotsNullParity:
    """r15 (ADVICE r14): NULL html must yield NULL robots_raw/flags in
    BOTH engines in the no-headers signature — the DuckDB twin's ''
    floor (needed only because list_aggr of an empty list is NULL)
    must not swallow NULL inputs."""

    def test_null_html_is_null_in_both_engines(self, spark):
        import duckdb

        from pandas_weights_spark.functions.html import (
            meta_robots,
            meta_robots_sql,
        )

        df = spark.createDataFrame(
            [(0, None), (1, '<meta name="robots" content="noindex">'),
             (2, "<p>plain</p>")],
            "i long, html string",
        )
        cols = meta_robots(F.col("html"))
        got = [
            tuple(r)
            for r in df.select(
                "i", *[c.alias(k) for k, c in cols.items()]
            ).orderBy("i").collect()
        ]
        assert got[0][1:] == (None, None, None, None, None)
        assert got[2][1] == "" and got[2][2] is False  # empty page: ''
        con = duckdb.connect()
        sqls = meta_robots_sql("html")
        sel = ", ".join(f"{v} AS {k}" for k, v in sqls.items())
        exp = con.sql(
            "SELECT i, " + sel + " FROM (VALUES (0, CAST(NULL AS "
            "VARCHAR)), (1, '<meta name=\"robots\" "
            "content=\"noindex\">'), (2, '<p>plain</p>')) AS t(i, html) "
            "ORDER BY i"
        ).fetchall()
        assert got == [tuple(r) for r in exp]
