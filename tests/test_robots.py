"""robots.txt parsing + URL permission (functions/robots.py, RFC
9309): group recovery via windows, exact-vs-* group precedence,
wildcard/anchor patterns via LIKE translation, longest-match/Allow-tie
decisions. Expected values hand-derived from the RFC rules."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.robots import (
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
            robots_allowed(df, rules, "url", "host")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestRandomizedDifferential:
    """r8: randomized rule sets vs a transparent Python reference of
    the RFC 9309 decision (longest pattern wins, Allow wins ties,
    exact-token groups override *) — covers a far wider space than
    the hand matrix."""

    @staticmethod
    def _py_decide(rules, path):
        # rules: list of (allow: bool, pattern_path: str)
        import re as _re

        best = None  # (spec, allow)
        for allow, rp in rules:
            # translate the RFC pattern exactly like _like_pattern:
            # '*' any-sequence, trailing '$' anchors; spec = LIKE
            # pattern length
            body = rp[:-1] if rp.endswith("$") else rp
            regex = "^" + ".*".join(
                _re.escape(seg) for seg in body.split("*")
            ) + ("$" if rp.endswith("$") else "")
            # spec = length of the LIKE translation (the engine's
            # documented tiebreak): '$' drops, a trailing '%' appends
            like_len = len(rp) - 1 if rp.endswith("$") else len(rp) + 1
            if _re.search(regex, path):
                key = (like_len, allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]

    def test_random_rule_sets_match_reference(self, spark):
        import random

        rng = random.Random(81)
        segs = ["/a", "/bb", "/ccc", "/a/b", "/x", "/*.pdf$", "/a*",
                "/a/*/c", "/priv$"]
        paths = ["/", "/a", "/a/b", "/a/b/c", "/bb", "/bbq", "/x/doc.pdf",
                 "/doc.pdf", "/doc.pdfx", "/priv", "/priv/1", "/a/z/c"]
        for trial in range(6):
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
