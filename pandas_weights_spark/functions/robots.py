"""robots.txt parsing and URL permission checks — the crawl-politeness
gate of a web pipeline (RFC 9309, the public Robots Exclusion
Protocol).

Spark-idiomatic design: instead of a per-row parser fold, the corpus
of robots.txt files EXPLODES into lines and the group structure is
recovered with window functions (a ``user-agent`` line that follows a
non-``user-agent`` line starts a new group — RFC 9309 §2.2.1), so the
whole parse is joins + windows the optimizer can schedule, and the
DuckDB oracle replays it with the same windows.

Rule semantics implemented (RFC 9309 §2.2.2–2.2.3):

* group selection: if ANY group of the host names the crawler's
  product token exactly (case-insensitive), only those groups apply;
  otherwise the ``*`` groups apply; otherwise everything is allowed;
* ``Allow``/``Disallow`` values are path patterns with ``*``
  (any-sequence) and a trailing ``$`` (end anchor) — translated to a
  SQL ``LIKE`` pattern (``%``/``_`` escaped), which both engines
  evaluate with column patterns;
* the most specific match wins (longest pattern), ``Allow`` wins
  ties; an empty ``Disallow:`` value means unrestricted (the rule is
  dropped); a URL with no matching rule — or a host with no
  robots.txt — is allowed.

Not implemented (documented): percent-decoding normalization and the
``crawl-delay``/``sitemap`` extensions (non-normative in RFC 9309).

Scale shape: robots tables are per-HOST (tiny next to a URL corpus) —
the rules side of :func:`robots_allowed` broadcasts; the URL side is
one row-local path extraction + one broadcast join + one per-URL
arg-max window over its matching rules (bounded by rules-per-host).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robots_rules", "robots_allowed", "url_path"]


def _like_pattern(path: Column) -> Column:
    """RFC 9309 path pattern → SQL LIKE pattern: escape ``\\ % _``,
    ``*`` → ``%``, trailing ``$`` anchors (no trailing ``%``)."""
    p = F.replace(path, F.lit("\\"), F.lit("\\\\"))
    p = F.replace(p, F.lit("%"), F.lit("\\%"))
    p = F.replace(p, F.lit("_"), F.lit("\\_"))
    p = F.replace(p, F.lit("*"), F.lit("%"))
    anchored = p.endswith("$")
    body = F.when(
        anchored, F.substring(p, 1, F.length(p) - 1)
    ).otherwise(F.concat(p, F.lit("%")))
    return body


def robots_rules(
    robots: DataFrame,
    host_col: str,
    txt_col: str,
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into the effective rule table for
    ``agent``: ``(host, allow boolean, path, pattern, spec)`` where
    ``pattern`` is the LIKE translation and ``spec`` the specificity
    (pattern character length — RFC longest-match). Only the groups
    selected for ``agent`` survive (exact token groups if any exist
    on that host, else the ``*`` groups)."""
    a = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\r?\n")).alias(
            "pos", "line"
        ),
    )
    # strip comments, split "key: value"
    staged = lines.select(
        "host", "pos",
        F.trim(
            F.regexp_replace(F.col("line"), r"#[^\x00]*", "")
        ).alias("l"),
    )
    key = F.lower(F.trim(F.substring_index(F.col("l"), ":", 1)))
    val = F.trim(
        F.expr("substring(l, instr(l, ':') + 1, length(l))")
    )
    classified = staged.select(
        "host", "pos",
        key.alias("k"),
        F.when(F.instr("l", ":") > 0, val)
        .otherwise(F.lit(""))
        .alias("v"),
    )
    is_ua = F.col("k") == "user-agent"
    w = Window.partitionBy("host").orderBy("pos")
    grouped = classified.withColumn(
        "gid",
        F.sum(
            (
                is_ua
                & ~F.coalesce(
                    F.lag(is_ua).over(w), F.lit(False)
                )
            ).cast("int")
        ).over(w),
    )
    # per-group agent set; per-host "has an exact group" flag
    wg = Window.partitionBy("host", "gid")
    wh = Window.partitionBy("host")
    flagged = grouped.withColumn(
        "g_exact",
        F.max(
            (is_ua & (F.lower("v") == F.lit(a))).cast("int")
        ).over(wg),
    ).withColumn(
        "g_star",
        F.max(
            (is_ua & (F.col("v") == "*")).cast("int")
        ).over(wg),
    ).withColumn(
        "h_exact", F.max(F.col("g_exact")).over(wh)
    )
    rules = flagged.where(
        F.col("k").isin("allow", "disallow")
        & (F.length("v") > 0)
        & (
            (F.col("g_exact") == 1)
            | ((F.col("h_exact") == 0) & (F.col("g_star") == 1))
        )
    )
    pat = _like_pattern(F.col("v"))
    return rules.select(
        "host",
        (F.col("k") == "allow").alias("allow"),
        F.col("v").alias("path"),
        pat.alias("pattern"),
        F.length(pat).cast("long").alias("spec"),
    )


def url_path(url: Column) -> Column:
    """Path component of an absolute URL ('/' when absent); the query
    string rides along (RFC 9309 matches on path + query)."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/]*(/[^#]*)", 1)
    return F.when(F.length(p) > 0, p).otherwise(F.lit("/"))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str,
    host_col: str,
) -> DataFrame:
    """Adds ``allowed`` (boolean) per URL row: the most specific
    matching rule of the url's host decides (longest pattern; Allow
    wins ties); no matching rule or no rules for the host → allowed.
    ``rules`` is the output of :func:`robots_rules` — broadcast (the
    per-host rule table is tiny next to a URL corpus)."""
    path = url_path(F.col(url_col))
    # one window per URL ROW: the id is assigned once in this single
    # lineage (no self-join of independently re-evaluated branches —
    # the pattern that IS unsafe), and never escapes the operator
    base = urls.withColumn("__path__", path).withColumn(
        "__uid__", F.monotonically_increasing_id()
    )
    # the LIKE lives in the JOIN condition: a URL whose host has rules
    # but none matching keeps its row (NULL rule side → allowed)
    joined = base.join(
        F.broadcast(rules.withColumnRenamed("host", "__rh__")),
        (F.col(host_col) == F.col("__rh__"))
        & F.like(F.col("__path__"), F.col("pattern"), F.lit("\\")),
        "left",
    )
    w = Window.partitionBy("__uid__").orderBy(
        F.col("spec").desc_nulls_last(),
        F.col("allow").desc_nulls_last(),
    )
    best = (
        joined.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .withColumn(
            "allowed", F.coalesce(F.col("allow"), F.lit(True))
        )
    )
    return best.select(*urls.columns, "allowed")
