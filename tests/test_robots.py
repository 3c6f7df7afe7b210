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
