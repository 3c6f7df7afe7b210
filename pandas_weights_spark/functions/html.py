"""HTML → text extraction — the first step of every web-crawl
training-data pipeline (the niche trafilatura / jusText / resiliparse
fill, public designs: Pomikálek 2011 "Removing boilerplate and
duplicate content from web corpora" is the block/link-density model
this module's :func:`main_content` implements).

Everything here is a pure Column-expression chain (regexp + HOFs) —
JVM-side, whole-stage-codegen, zero shuffle, row-local — so it runs at
scan speed on a 100 TB crawl and is replayable verbatim by the DuckDB
oracle. Regex dialect notes (Spark = java.util.regex, DuckDB = RE2):

* no backreferences, no lookaround (RE2 has neither) — script/style
  stripping enumerates the tags instead of using ``</\\1>``;
* explicit whitespace classes ``[ \\t\\n\\r\\f]`` everywhere (Java
  ``\\s`` includes vertical tab, RE2's does not);
* replacement strings differ (``$1`` vs ``\\1``) but that is
  engine-local syntax, not semantics.

This is a HEURISTIC extractor (like every regex-based one): it does
not build a DOM, so pathological markup (unclosed ``<script>``,
attributes containing ``>``) degrades gracefully rather than exactly.
The fixed entity set below is decoded; other entities pass through
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_to_text",
    "extract_title",
    "extract_links",
    "main_content",
    "html_extract",
    "link_graph",
]

#: Tags whose CONTENT is invisible — stripped with their bodies.
#: ``head`` covers ``<title>``/``<meta>`` (use :func:`extract_title`
#: for the title); an unclosed container simply fails to match and
#: degrades to tag-stripping instead of over-deleting.
_CONTAINER_TAGS = (
    "script", "style", "noscript", "template", "svg", "head",
    "title", "iframe",
)

#: Tags that end a text block — their boundaries become newlines.
_BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|td|th|table|"
    "blockquote|pre|section|article|aside|header|footer|nav|main|"
    "figure|figcaption|form|fieldset|address"
)

#: Decoded entities (fixed, documented set — decode ``&amp;`` LAST so
#: double-encoded text is not double-decoded).
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&hellip;", "..."),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&copy;", "©"),
    ("&amp;", "&"),
)

_WS = r"[ \t\n\r\f]"

#: comments + invisible containers, one alternation (non-greedy bodies)
_INVISIBLE_RE = "(?is)" + "|".join(
    [r"<!--[^\x00]*?-->"]
    + [
        rf"<{t}\b[^>]*>[^\x00]*?</{t}{_WS}*>"
        for t in _CONTAINER_TAGS
    ]
)
_BLOCK_RE = f"(?i)</?({_BLOCK_TAGS})\\b[^>]*/?>"
_ANY_TAG_RE = r"(?s)<[^>]*>"
_TITLE_RE = r"(?is)<title[^>]*>([^\x00]*?)</title"
_HREF_RE = "(?is)<a\\b[^>]*?href" + _WS + "*=" + _WS + "*[\"']([^\"']*)[\"']"
_ANCHOR_BODY_RE = r"(?is)<a\b[^>]*>([^\x00]*?)</a"


def _decode_entities(col: Column) -> Column:
    for src, dst in _ENTITIES:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def _collapse_ws(col: Column) -> Column:
    """Horizontal runs → one space, newline runs trimmed, ≥3 newlines
    → a paragraph break, leading/trailing whitespace dropped."""
    col = F.regexp_replace(col, r"[ \t\r\f]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{3,}", "\n\n")
    return F.regexp_replace(col, r"^[ \n]+|[ \n]+$", "")


def _strip_invisible(col: Column) -> Column:
    return F.regexp_replace(col, _INVISIBLE_RE, " ")


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document: comments and
    script/style/noscript/template/svg bodies removed, block-tag
    boundaries become newlines, inline tags vanish, the fixed entity
    set decodes, whitespace collapses (paragraph breaks preserved as
    ``\\n\\n``). NULL html → NULL."""
    col = _strip_invisible(html)
    col = F.regexp_replace(col, _BLOCK_RE, "\n")
    col = F.regexp_replace(col, _ANY_TAG_RE, "")
    col = _decode_entities(col)
    return _collapse_ws(col)


def extract_title(html: Column) -> Column:
    """``<title>`` text (entity-decoded, whitespace-collapsed); empty
    string when there is no title element."""
    return _collapse_ws(
        _decode_entities(F.regexp_extract(html, _TITLE_RE, 1))
    )


def extract_links(html: Column) -> Column:
    """All ``<a href="...">`` targets, in document order, duplicates
    kept (``array<string>``; empty array when no links)."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1))


def main_content(
    html: Column,
    min_words: int = 5,
    max_link_density: float = 0.5,
) -> Column:
    """Boilerplate-filtered text (jusText-lite, Pomikálek 2011): the
    document splits into blocks at block-tag boundaries; a block
    survives when it has ≥ ``min_words`` words AND its link density
    (anchor-text characters / text characters) is ≤
    ``max_link_density``. Navigation bars, footers, and link farms are
    exactly the high-density short blocks this drops. Surviving blocks
    join with ``\\n\\n``.

    Pure HOF pipeline (split → transform → filter → array_join): no
    shuffle, no UDF, no per-row Python.
    """
    clean = _strip_invisible(html)
    blocks = F.split(clean, _BLOCK_RE)

    def block_text(b: Column) -> Column:
        return _collapse_ws(
            _decode_entities(F.regexp_replace(b, _ANY_TAG_RE, ""))
        )

    def anchor_chars(b: Column) -> Column:
        # total VISIBLE characters inside <a>…</a> bodies of the block
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_BODY_RE), F.lit(1)),
            F.lit(0),
            lambda acc, a: acc + F.length(block_text(a)),
        )

    scored = F.transform(
        blocks,
        lambda b: F.struct(
            block_text(b).alias("t"),
            anchor_chars(b).alias("a"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (
            F.size(F.split(s["t"], "[ \n]")) >= F.lit(int(min_words))
        )
        & (F.length(s["t"]) > 0)
        & (
            s["a"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["t"])
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), "\n\n")


def html_extract(
    df: DataFrame,
    html_col: str,
    min_words: int = 5,
    max_link_density: float = 0.5,
) -> DataFrame:
    """One-pass extraction frame: adds ``title``, ``text`` (full
    visible text), ``content`` (boilerplate-filtered), ``n_links``.
    Row-local — composes with any downstream filter/dedup without a
    shuffle."""
    h = F.col(html_col)
    return df.withColumns(
        {
            "title": extract_title(h),
            "text": html_to_text(h),
            "content": main_content(h, min_words, max_link_density),
            "n_links": F.size(extract_links(h)),
        }
    )


# --- DuckDB oracle replay (same constants, RE2 dialect) --------------

def _sq(s: str) -> str:
    """Single-quote-escape for embedding in a SQL literal."""
    return s.replace("'", "''")


def _collapse_ws_sql(e: str) -> str:
    e = f"regexp_replace({e}, '[ \\t\\r\\f]+', ' ', 'g')"
    e = f"regexp_replace({e}, ' ?\\n ?', chr(10), 'g')"
    e = f"regexp_replace({e}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    return f"regexp_replace({e}, '^[ \\n]+|[ \\n]+$', '', 'g')"


def _decode_entities_sql(e: str) -> str:
    for src, dst in _ENTITIES:
        e = f"replace({e}, '{_sq(src)}', '{_sq(dst)}')"
    return e


def html_to_text_sql(expr: str) -> str:
    """DuckDB SQL replaying :func:`html_to_text` on ``expr`` — built
    from the SAME pattern constants (RE2 parses the textual escapes
    identically to java.util.regex for these patterns)."""
    e = f"regexp_replace({expr}, '{_sq(_INVISIBLE_RE)}', ' ', 'g')"
    e = f"regexp_replace({e}, '{_sq(_BLOCK_RE)}', chr(10), 'g')"
    e = f"regexp_replace({e}, '{_sq(_ANY_TAG_RE)}', '', 'g')"
    return _collapse_ws_sql(_decode_entities_sql(e))


def extract_title_sql(expr: str) -> str:
    e = f"regexp_extract({expr}, '{_sq(_TITLE_RE)}', 1)"
    return _collapse_ws_sql(_decode_entities_sql(e))


def extract_links_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{_sq(_HREF_RE)}', 1)"


def main_content_sql(
    expr: str, min_words: int = 5, max_link_density: float = 0.5
) -> str:
    def block_text(b: str) -> str:
        return _collapse_ws_sql(
            _decode_entities_sql(
                f"regexp_replace({b}, '{_sq(_ANY_TAG_RE)}', '', 'g')"
            )
        )

    clean = f"regexp_replace({expr}, '{_sq(_INVISIBLE_RE)}', ' ', 'g')"
    blocks = f"str_split_regex({clean}, '{_sq(_BLOCK_RE)}')"
    anchor = (
        f"coalesce(list_sum(list_transform("
        f"regexp_extract_all(b, '{_sq(_ANCHOR_BODY_RE)}', 1), "
        f"a2 -> length({block_text('a2')}))), 0)"
    )
    scored = (
        f"list_transform({blocks}, "
        f"b -> struct_pack(t := {block_text('b')}, a := {anchor}))"
    )
    kept = (
        f"list_filter({scored}, s -> "
        f"len(str_split_regex(s.t, '[ \\n]')) >= {int(min_words)} "
        f"and length(s.t) > 0 "
        f"and cast(s.a as double) <= "
        f"{float(max_link_density)!r} * length(s.t))"
    )
    return (
        f"array_to_string(list_transform({kept}, s -> s.t), "
        f"chr(10)||chr(10))"
    )


def link_graph(
    df: DataFrame,
    html_col: str,
    src_host_col: str,
) -> DataFrame:
    """Host-level link graph from crawled HTML — the edge table
    :func:`pandas_weights_spark.functions.graph.pagerank` consumes for
    domain-authority scoring: one row per ``(src, dst)`` host pair
    with ``weight`` = number of links. Absolute ``http(s)`` hrefs
    resolve to their own host (lowercased, port stripped — the
    ``url_domain`` convention); every other href (relative, fragment,
    mailto, protocol-relative) counts as a SELF edge to the source
    host, so total outdegree mass equals the page's link count.

    Row-local explode + one (src, dst) aggregate — the same scan/agg
    shape as every corpus statistic."""
    from pandas_weights_spark.functions.text import url_domain

    src = F.lower(F.col(src_host_col))
    links = df.select(
        src.alias("src"),
        F.explode(extract_links(F.col(html_col))).alias("__l__"),
    )
    dst_host = url_domain(F.col("__l__"))
    return (
        links.select(
            "src",
            F.when(F.length(dst_host) > 0, dst_host)
            .otherwise(F.col("src"))
            .alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
