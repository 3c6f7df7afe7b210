"""robots.txt parsing + URL permission (functions/robots.py, RFC
9309): group recovery via windows, exact-vs-* group precedence,
wildcard/anchor patterns via LIKE translation, longest-match/Allow-tie
decisions, percent-encoding normalization. Expected values
hand-derived from the RFC rules; the randomized differential's
reference implements RFC 9309 §2.2.2 independently (canonical
percent-encoding + longest-canonical-pattern-wins, anchor counted)
rather than mirroring the engine's translation."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.robots import (
    canonical_path,
    robots_allowed,
    robots_rules,
    url_path,
)

TXT = """# crawl policy
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$

User-agent: specialbot
User-agent: otherbot
Disallow: /
Allow: /public/

User-agent: emptybot
Disallow:
"""


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(
        [
            ("a.com", TXT),
            ("b.com", "User-agent: *\r\nDisallow: /x # inline\r\n"),
            ("loner.com", "Disallow: /orphan\nUser-agent: *\nAllow: /"),
        ],
        ["host", "txt"],
    )


def _decide(spark, robots, agent, urls):
    rules = robots_rules(robots, "host", "txt", agent=agent)
    df = spark.createDataFrame(
        [(u,) for u in urls], ["url"]
    ).withColumn("host", F.regexp_extract("url", r"://([^/]*)", 1))
    return {
        r["url"]: r["allowed"]
        for r in robots_allowed(df, rules, "url", "host").collect()
    }


class TestRules:
    def test_star_group_selected_for_unknown_agent(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        got = {
            (r["host"], r["path"], r["allow"])
            for r in rules.collect()
        }
        assert ("a.com", "/private/", False) in got
        assert ("a.com", "/private/ok/", True) in got
        assert ("a.com", "/*.pdf$", False) in got
        # specialbot group rules must NOT apply to anybot
        assert ("a.com", "/", False) not in got

    def test_exact_group_overrides_star(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="SpecialBot")
        a = {
            (r["path"], r["allow"])
            for r in rules.where(F.col("host") == "a.com").collect()
        }
        assert a == {("/", False), ("/public/", True)}

    def test_multi_ua_lines_one_group(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="otherbot")
        a = {
            (r["path"], r["allow"])
            for r in rules.where(F.col("host") == "a.com").collect()
        }
        assert a == {("/", False), ("/public/", True)}

    def test_empty_disallow_drops_rule(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="emptybot")
        assert (
            rules.where(F.col("host") == "a.com").count() == 0
        )

    def test_rules_before_any_group_ignored(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        got = {
            r["path"]
            for r in rules.where(F.col("host") == "loner.com").collect()
        }
        assert got == {"/"}  # the orphan /orphan line never applies

    def test_comments_and_crlf(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        b = rules.where(F.col("host") == "b.com").collect()
        assert len(b) == 1 and b[0]["path"] == "/x"


class TestDecisions:
    CASES = [
        ("https://a.com/", True),
        ("https://a.com/private/doc", False),
        ("https://a.com/private/ok/x", True),  # longest match: Allow
        ("https://a.com/files/doc.pdf", False),  # * and $ pattern
        ("https://a.com/files/doc.pdfx", True),  # $ anchors the end
        ("https://a.com/doc.pdf?x=1", True),  # query breaks the anchor
        ("https://b.com/x/1", False),
        ("https://b.com/y", True),  # rules exist, none match
        ("https://c.com/z", True),  # host without robots.txt
    ]

    def test_star_agent_matrix(self, spark, robots):
        got = _decide(
            spark, robots, "anybot", [u for u, _ in self.CASES]
        )
        for u, want in self.CASES:
            assert got[u] is want, u

    def test_exact_agent_case_insensitive(self, spark, robots):
        got = _decide(
            spark, robots, "SPECIALBOT",
            ["https://a.com/", "https://a.com/public/p"],
        )
        assert got == {
            "https://a.com/": False,
            "https://a.com/public/p": True,
        }

    def test_duplicate_url_rows_survive(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        df = spark.createDataFrame(
            [("https://a.com/private/doc", "a.com")] * 3,
            ["url", "host"],
        )
        out = robots_allowed(df, rules, "url", "host").collect()
        assert len(out) == 3 and all(r["allowed"] is False for r in out)

    def test_url_path_extraction(self, spark):
        df = spark.createDataFrame(
            [
                ("https://h.io/a/b?q=1#frag",),
                ("http://h.io",),
                ("https://h.io/",),
            ],
            ["u"],
        )
        got = [
            r["p"]
            for r in df.select(url_path(F.col("u")).alias("p")).collect()
        ]
        assert got == ["/a/b?q=1", "/", "/"]

    def test_rules_side_broadcast_in_plan(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        df = spark.createDataFrame(
            [("https://a.com/x", "a.com")], ["url", "host"]
        )
        plan = (
            robots_allowed(df, rules, "url", "host", strategy="broadcast")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan

    def test_url_side_never_shuffles(self, spark):
        # r9 (VERDICT r8 #7): under strategy='broadcast' the URL corpus
        # must reach the decision without any exchange of its own —
        # rules pre-materialized so the only hash exchange in the whole
        # plan is the tiny per-host rule packing on the broadcast side.
        rules = spark.createDataFrame(
            [("a.com", False, "/x%", 2)],
            ["host", "allow", "pattern", "spec"],
        )
        df = spark.createDataFrame(
            [("https://a.com/x/1", "a.com")], ["url", "host"]
        )
        plan = (
            robots_allowed(df, rules, "url", "host", strategy="broadcast")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "row_number" not in plan
        assert "monotonically_increasing_id" not in plan
        # every hash exchange belongs to the rules side (keyed host)
        import re

        for m in re.findall(r"Exchange hashpartitioning\(([^,]*)", plan):
            assert "host" in m, plan

    def test_shuffle_strategy_plan_has_no_broadcast(self, spark):
        # r10 (VERDICT r9 #1): the broadcast-cap guard — 'shuffle'
        # must not broadcast the rules side at all (the web-scale
        # fallback when the packed host table exceeds the 8 GB cap),
        # and 'auto' must carry no unconditional broadcast hint (AQE
        # decides from the runtime size).
        rules = spark.createDataFrame(
            [("a.com", False, "/x%", 2)],
            ["host", "allow", "pattern", "spec"],
        )
        df = spark.createDataFrame(
            [("https://a.com/x/1", "a.com")], ["url", "host"]
        )
        plan = (
            robots_allowed(df, rules, "url", "host", strategy="shuffle")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastExchange" not in plan
        auto_logical = (
            robots_allowed(df, rules, "url", "host", strategy="auto")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "ResolvedHint" not in auto_logical
        with pytest.raises(ValueError, match="strategy"):
            robots_allowed(df, rules, "url", "host", strategy="bogus")

    def test_strategies_agree_on_decisions(self, spark, robots):
        # decisions must be byte-identical under all three strategies
        urls = [u for u, _ in TestDecisions.CASES]
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        df = spark.createDataFrame(
            [(u,) for u in urls], ["url"]
        ).withColumn("host", F.regexp_extract("url", r"://([^/]*)", 1))
        got = {}
        for s in ("auto", "broadcast", "shuffle"):
            got[s] = {
                r["url"]: r["allowed"]
                for r in robots_allowed(
                    df, rules, "url", "host", strategy=s
                ).collect()
            }
        assert got["auto"] == got["broadcast"] == got["shuffle"]

    def test_mid_pattern_dollar_is_literal(self, spark):
        # r10 (ADVICE r9): a non-trailing '$' is a literal octet, as in
        # Google's parser — previously the Disallow failed OPEN because
        # the pattern side kept '$' raw while the path side escaped it
        robots = spark.createDataFrame(
            [(
                "dollar.com",
                "User-agent: *\n"
                "Disallow: /a$b\n"     # literal mid-$
                "Disallow: /p$$\n",    # literal '$' then the anchor
            )],
            ["host", "txt"],
        )
        got = _decide(
            spark, robots, "anybot",
            [
                "https://dollar.com/a$b",    # blocked: literal match
                "https://dollar.com/a",      # not matched by /a$b
                "https://dollar.com/p$",     # blocked: anchored /p$
                "https://dollar.com/p$x",    # anchor: no match
                "https://dollar.com/p",      # no rule matches bare /p
            ],
        )
        assert got["https://dollar.com/a$b"] is False
        assert got["https://dollar.com/a"] is True
        assert got["https://dollar.com/p$"] is False
        assert got["https://dollar.com/p$x"] is True
        assert got["https://dollar.com/p"] is True

    def test_over_escaped_spec_tie_pinned(self, spark):
        # r10 (ADVICE r9): documented deviation pinned — over-escaped
        # printable ASCII decodes, so Allow /%41%41 canonicalizes to
        # /AA (spec 3), TIES Disallow /AA (spec 3), and Allow wins the
        # tie.  Under Google's no-decode convention the Allow would
        # score 6 and win by length instead — same decision, but the
        # spec accounting differs; this test pins ours.
        robots = spark.createDataFrame(
            [(
                "tie2.com",
                "User-agent: *\nAllow: /%41%41\nDisallow: /AA\n",
            )],
            ["host", "txt"],
        )
        got = _decide(
            spark, robots, "anybot",
            ["https://tie2.com/AA", "https://tie2.com/AAx"],
        )
        assert got["https://tie2.com/AA"] is True
        assert got["https://tie2.com/AAx"] is True

    def test_anchored_beats_shorter_plain_on_tie_path(self, spark):
        # the r8 verdict counterexample: RFC 9309 longest-match counts
        # the ORIGINAL pattern octets (anchor included): Allow /p$ (3)
        # beats Disallow /p (2) on path /p -> allowed; /pq only
        # matches the plain rule -> blocked
        robots = spark.createDataFrame(
            [("tie.com", "User-agent: *\nAllow: /p$\nDisallow: /p\n")],
            ["host", "txt"],
        )
        got = _decide(
            spark, robots, "anybot",
            ["https://tie.com/p", "https://tie.com/pq"],
        )
        assert got["https://tie.com/p"] is True
        assert got["https://tie.com/pq"] is False

    def test_percent_encoding_normalization(self, spark):
        # RFC 9309 §2.2.2: %XX escapes normalize before matching —
        # an escaped pattern matches the raw path and vice versa —
        # but %2F stays distinct from a literal slash
        robots = spark.createDataFrame(
            [(
                "pct.com",
                "User-agent: *\n"
                "Disallow: /caf%C3%A9/\n"     # escaped é vs raw é
                "Disallow: /a%2Fb\n"          # encoded slash
                "Disallow: /%7Etilde\n"       # over-escaped ~ decodes
                "Disallow: /wild%2Acard\n",   # %2A is literal *, not wildcard
            )],
            ["host", "txt"],
        )
        got = _decide(
            spark, robots, "anybot",
            [
                "https://pct.com/café/x",       # raw é ~ escaped rule
                "https://pct.com/caf%c3%a9/y",  # lowercase hex normalizes
                "https://pct.com/cafe/z",       # plain ascii: no match
                "https://pct.com/a/b",          # literal / != %2F
                "https://pct.com/a%2Fb",        # %2F matches %2F
                "https://pct.com/~tilde",       # raw ~ ~ over-escaped rule
                "https://pct.com/wild*card",    # literal * ~ %2A rule
                "https://pct.com/wildXcard",    # %2A is NOT a wildcard
            ],
        )
        assert got["https://pct.com/café/x"] is False
        assert got["https://pct.com/caf%c3%a9/y"] is False
        assert got["https://pct.com/cafe/z"] is True
        assert got["https://pct.com/a/b"] is True
        assert got["https://pct.com/a%2Fb"] is False
        assert got["https://pct.com/~tilde"] is False
        assert got["https://pct.com/wild*card"] is False
        assert got["https://pct.com/wildXcard"] is True

    def test_canonical_path_column(self, spark):
        df = spark.createDataFrame(
            [("/café/a",), ("/a%2fb",), ("/%41x",), ("/p*q$",)], ["p"]
        )
        got = [
            r["c"]
            for r in df.select(
                canonical_path(F.col("p")).alias("c")
            ).collect()
        ]
        # raw é -> %C3%A9; lowercase %2f -> %2F kept; %41 -> 'A';
        # literal * and $ escape on the PATH side
        assert got == ["/caf%C3%A9/a", "/a%2Fb", "/Ax", "/p%2Aq%24"]


def _py_canon(s: str, pattern: bool) -> str:
    """Independent RFC 9309 §2.2.2 canonicalizer (pure Python, written
    from the RFC + Google's reference-parser convention, NOT from the
    engine): work on UTF-8 octets; decode-then-reencode %XX escapes so
    both sides land on one spelling; printable ASCII stays literal
    except the reserved set (/ % * $ stay escaped); pattern side keeps
    raw * functional, path side escapes it.  A raw $ escapes on BOTH
    sides — the anchor is stripped before canonicalization, so a
    non-trailing $ is a literal octet (Google's parser convention)."""
    reserved = {0x2F, 0x25, 0x2A, 0x24}
    hexd = "0123456789abcdefABCDEF"
    data = s.encode("utf-8")
    out = []
    i = 0
    while i < len(data):
        c = data[i]
        if (
            c == 0x25
            and i + 2 < len(data)
            and chr(data[i + 1]) in hexd
            and chr(data[i + 2]) in hexd
        ):
            b = int(data[i + 1 : i + 3].decode("ascii"), 16)
            i += 3
            if 0x20 <= b <= 0x7E and b not in reserved:
                out.append(chr(b))
            else:
                out.append("%%%02X" % b)
            continue
        i += 1
        if 0x20 <= c <= 0x7E and c != 0x24 and (
            pattern or c != 0x2A
        ):
            out.append(chr(c))
        else:
            out.append("%%%02X" % c)
    return "".join(out)


@pytest.mark.slow
class TestRandomizedDifferential:
    """r8 (de-circularized r9): randomized rule sets vs a transparent
    Python reference of the RFC 9309 decision — canonical
    percent-encoding on both sides, longest canonical pattern wins
    (anchor octet counted, per the Google reference parser), Allow
    wins ties. The reference ranks by len() of its OWN canonical
    form, independent of the engine's LIKE translation."""

    @staticmethod
    def _py_decide(rules, path):
        # rules: list of (allow: bool, pattern_path: str)
        import re as _re

        cpath = _py_canon(path, pattern=False)
        best = None  # (spec, allow)
        for allow, rp in rules:
            anchored = rp.endswith("$")
            body = _py_canon(
                rp[:-1] if anchored else rp, pattern=True
            )
            regex = "^" + ".*".join(
                _re.escape(seg) for seg in body.split("*")
            ) + ("$" if anchored else "")
            # RFC longest-match: octets of the canonical pattern,
            # anchor included (canonical form is pure ASCII)
            spec = len(body) + (1 if anchored else 0)
            if _re.search(regex, cpath):
                key = (spec, allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]

    def test_random_rule_sets_match_reference(self, spark):
        import random

        rng = random.Random(81)
        segs = ["/a", "/bb", "/ccc", "/a/b", "/x", "/*.pdf$", "/a*",
                "/a/*/c", "/priv$", "/p$", "/p", "/pi",
                "/caf%C3%A9", "/%7Ea", "/a%2Fb",
                # r10 (ADVICE r9): non-trailing literal '$' patterns and
                # an over-escaped-vs-plain spec-tie pair
                "/a$b", "/p$$", "/%41%41", "/AA"]
        paths = ["/", "/a", "/a/b", "/a/b/c", "/bb", "/bbq", "/x/doc.pdf",
                 "/doc.pdf", "/doc.pdfx", "/priv", "/priv/1", "/a/z/c",
                 "/p", "/pq", "/pi", "/café/x", "/~a", "/a%2Fb", "/a/b/",
                 "/a$b", "/p$", "/AA", "/AAx"]
        for trial in range(10):
            n_rules = rng.randint(1, 6)
            rules = [
                (rng.random() < 0.5, rng.choice(segs))
                for _ in range(n_rules)
            ]
            txt = "User-agent: *\n" + "\n".join(
                ("Allow: " if a else "Disallow: ") + p
                for a, p in rules
            )
            robots = spark.createDataFrame([("h.io", txt)], ["host", "txt"])
            urls = spark.createDataFrame(
                [(f"https://h.io{p}", "h.io") for p in paths],
                ["url", "host"],
            )
            got = {
                r["url"]: r["allowed"]
                for r in robots_allowed(
                    urls, robots_rules(robots, "host", "txt", "bot"),
                    "url", "host",
                ).collect()
            }
            for p in paths:
                want = self._py_decide(rules, p)
                assert got[f"https://h.io{p}"] is want, (
                    trial, rules, p, got[f"https://h.io{p}"], want
                )


class TestDirectives:
    """r10: crawl-delay/sitemap directives (robots_directives) —
    group-scoped delay selection, host-scoped sitemaps, invalid
    values ignored."""

    TXT = (
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
        "Sitemap: https://a.com/sm2.xml\n\n"
        "User-agent: databot\nDisallow: /beta/\n"
        "Crawl-delay: 7.5\nCrawl-delay: 3.25\n\n"
        "Sitemap: https://a.com/sm1.xml\n"
    )

    @pytest.fixture(scope="class")
    def frame(self, spark):
        from pandas_weights_spark.functions.robots import (
            robots_directives,
        )

        robots = spark.createDataFrame(
            [
                ("a.com", self.TXT),
                ("b.com",
                 "User-agent: *\nDisallow: /x\n"
                 "Crawl-delay: bogus\nCrawl-delay: -1\n"),
                ("c.com", "User-agent: *\nAllow: /\n"),
            ],
            ["host", "txt"],
        )
        return robots, robots_directives

    def test_group_scoped_delay(self, frame):
        robots, robots_directives = frame
        for agent, want in (("anybot", 2.0), ("databot", 3.25)):
            got = {
                r["host"]: r["crawl_delay"]
                for r in robots_directives(
                    robots, "host", "txt", agent=agent
                ).collect()
            }
            assert got["a.com"] == want  # min of the selected group
            assert got["b.com"] is None  # bogus/negative ignored
            assert got["c.com"] is None  # absent

    def test_sitemaps_host_scoped_sorted(self, frame):
        robots, robots_directives = frame
        got = {
            r["host"]: r["sitemaps"]
            for r in robots_directives(
                robots, "host", "txt", agent="databot"
            ).collect()
        }
        # both sitemap lines, regardless of which group selected
        assert got["a.com"] == [
            "https://a.com/sm1.xml", "https://a.com/sm2.xml"
        ]
        assert got["b.com"] == [] and got["c.com"] == []

    def test_every_input_host_appears(self, frame):
        robots, robots_directives = frame
        out = robots_directives(robots, "host", "txt")
        assert {r["host"] for r in out.collect()} == {
            "a.com", "b.com", "c.com"
        }


class TestFetchStatus:
    """r10: RFC 9309 §2.3.1 unreachability — 4xx robots.txt means no
    restrictions (allow all), 5xx means assume complete disallow;
    other statuses / absent hosts decide by rules."""

    def test_status_semantics(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        statuses = spark.createDataFrame(
            [("a.com", 404), ("b.com", 503), ("loner.com", 200)],
            ["host", "status"],
        )
        urls = [
            "https://a.com/private/doc",   # rules say NO, 404 says yes
            "https://b.com/y",             # rules say yes, 503 says NO
            "https://loner.com/anything",  # 200: rules decide (allow)
            "https://c.com/z",             # no status, no rules: allow
        ]
        df = spark.createDataFrame(
            [(u,) for u in urls], ["url"]
        ).withColumn("host", F.regexp_extract("url", r"://([^/]*)", 1))
        got = {
            r["url"]: r["allowed"]
            for r in robots_allowed(
                df, rules, "url", "host", statuses=statuses
            ).collect()
        }
        assert got["https://a.com/private/doc"] is True
        assert got["https://b.com/y"] is False
        assert got["https://loner.com/anything"] is True
        assert got["https://c.com/z"] is True

    def test_no_statuses_identical_decisions(self, spark, robots):
        rules = robots_rules(robots, "host", "txt", agent="anybot")
        urls = [u for u, _ in TestDecisions.CASES]
        df = spark.createDataFrame(
            [(u,) for u in urls], ["url"]
        ).withColumn("host", F.regexp_extract("url", r"://([^/]*)", 1))
        empty = spark.createDataFrame([], "host string, status int")
        a = {
            r["url"]: r["allowed"]
            for r in robots_allowed(df, rules, "url", "host").collect()
        }
        b = {
            r["url"]: r["allowed"]
            for r in robots_allowed(
                df, rules, "url", "host", statuses=empty
            ).collect()
        }
        assert a == b

    def test_status_only_host_without_rules(self, spark):
        # a 5xx host that never yielded parseable rules still blocks
        rules = spark.createDataFrame(
            [], "host string, allow boolean, pattern string, spec long"
        )
        statuses = spark.createDataFrame(
            [("down.io", 500)], ["host", "status"]
        )
        df = spark.createDataFrame(
            [("https://down.io/x", "down.io"),
             ("https://up.io/x", "up.io")],
            ["url", "host"],
        )
        got = {
            r["url"]: r["allowed"]
            for r in robots_allowed(
                df, rules, "url", "host", statuses=statuses
            ).collect()
        }
        assert got["https://down.io/x"] is False
        assert got["https://up.io/x"] is True


class TestSitemapEntries:
    """r13: sitemaps.org XML parsing (sitemap_entries) — urlset and
    sitemapindex entries, field gates, DuckDB twin parity."""

    PAGES = [
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://ex.com/a?x=1&amp;y=2</loc>"
        "<lastmod>2024-03-05T10:00:00+00:00</lastmod>"
        "<changefreq>DAILY</changefreq><priority>0.8</priority></url>"
        "<url><loc> https://ex.com/b </loc></url>"
        "<url><loc></loc><priority>1.0</priority></url>"
        "<url><lastmod>2024-99-99</lastmod><loc>https://ex.com/c</loc>"
        "<priority>high</priority></url></urlset>",
        "<sitemapindex><sitemap><loc>https://ex.com/s1.xml.gz</loc>"
        "<lastmod>2024-01-02</lastmod></sitemap>"
        "<sitemap><loc>https://ex.com/s2.xml.gz</loc></sitemap>"
        "</sitemapindex>",
        "no xml at all",
        None,
        # r14: Google-News-style CDATA wrappers — content verbatim
        # (&amp; inside CDATA is LITERAL, never decoded), bracket
        # whitespace trimmed, empty CDATA drops like an empty loc
        "<urlset>"
        "<url><loc><![CDATA[https://news.ex/a?x=1&amp;y=2]]></loc>"
        "<lastmod><![CDATA[2024-05-06]]></lastmod></url>"
        "<url><loc> <![CDATA[ https://news.ex/b ]]> </loc></url>"
        "<url><loc><![CDATA[]]></loc></url>"
        "</urlset>",
    ]

    def _parse(self, spark):
        from pandas_weights_spark.functions.robots import (
            sitemap_entries,
        )

        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(self.PAGES)],
            "i long, x string",
        )
        return {
            r["i"]: r["e"]
            for r in df.select(
                "i", sitemap_entries(F.col("x")).alias("e")
            ).collect()
        }

    def test_urlset_fields(self, spark):
        import datetime

        e = self._parse(spark)[0]
        # empty-loc entry dropped; three survive in document order
        assert [x["loc"] for x in e] == [
            "https://ex.com/a?x=1&y=2",   # &amp; decoded
            "https://ex.com/b",           # whitespace trimmed
            "https://ex.com/c",           # loc after lastmod (order-free)
        ]
        a = e[0]
        assert a["kind"] == "url"
        assert a["lastmod_date"] == datetime.date(2024, 3, 5)
        assert a["changefreq"] == "daily"  # case-folded
        assert a["priority"] == 0.8
        c = e[2]
        # regex-passing but INVALID date -> NULL, never an ANSI error
        assert c["lastmod_raw"] == "2024-99-99"
        assert c["lastmod_date"] is None
        assert c["priority"] is None  # junk priority gated

    def test_sitemapindex_and_degenerate(self, spark):
        import datetime

        parsed = self._parse(spark)
        idx = parsed[1]
        assert [x["kind"] for x in idx] == ["sitemap", "sitemap"]
        assert idx[0]["lastmod_date"] == datetime.date(2024, 1, 2)
        assert idx[1]["lastmod_raw"] == ""
        assert parsed[2] == []      # non-XML -> empty
        assert parsed[3] is None    # NULL -> NULL

    def test_cdata_unwrapped_verbatim(self, spark):
        import datetime

        e = self._parse(spark)[4]
        assert [x["loc"] for x in e] == [
            # CDATA content is literal text: &amp; stays &amp;
            "https://news.ex/a?x=1&amp;y=2",
            "https://news.ex/b",  # bracket whitespace trimmed
        ]
        assert e[0]["lastmod_raw"] == "2024-05-06"
        assert e[0]["lastmod_date"] == datetime.date(2024, 5, 6)

    def test_url_tag_never_matches_urlset(self, spark):
        # <url\b must not treat the <urlset> wrapper as an entry
        from pandas_weights_spark.functions.robots import (
            sitemap_entries,
        )

        df = spark.createDataFrame(
            [("<urlset><url><loc>https://e/a</loc></url></urlset>",)],
            ["x"],
        )
        e = df.select(sitemap_entries(F.col("x")).alias("e")).first()[
            "e"
        ]
        assert len(e) == 1 and e[0]["loc"] == "https://e/a"

    def test_duckdb_twin_bit_exact(self, spark):
        import duckdb

        from pandas_weights_spark.functions.robots import (
            sitemap_entries,
            sitemap_entries_sql,
        )

        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(self.PAGES)],
            "i long, x string",
        )
        got = [
            tuple(tuple(e) for e in r["e"]) if r["e"] is not None
            else None
            for r in df.select(
                "i", sitemap_entries(F.col("x")).alias("e")
            ).orderBy("i").collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i INT, x VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            list(enumerate(self.PAGES)),
        )
        want = [
            tuple(tuple(e.values()) for e in row[0])
            if row[0] is not None else None
            for row in con.sql(
                f"SELECT {sitemap_entries_sql('x')} AS e "
                f"FROM t ORDER BY i"
            ).fetchall()
        ]
        assert got == want
