"""HTML → text extraction — the first step of every web-crawl
training-data pipeline (the niche trafilatura / jusText / resiliparse
fill, public designs: Pomikálek 2011 "Removing boilerplate and
duplicate content from web corpora" is the block/link-density model
this module's :func:`main_content` implements).

Everything here is a pure Column-expression chain (regexp + HOFs) —
JVM-side, zero shuffle, row-local — so it runs at scan speed on a
100 TB crawl and is replayable verbatim by the DuckDB oracle. Cost
caveat (measured, r10→r11): higher-order functions run INTERPRETED
(outside whole-stage codegen) with no common-subexpression
elimination, so every derived value a lambda references twice is
computed twice — the LET discipline in ``_decode_numeric_refs`` /
``c4_filter``-style staged columns is load-bearing, not style.
Regex dialect notes (Spark = java.util.regex, DuckDB = RE2):

* no backreferences, no lookaround (RE2 has neither) — script/style
  stripping enumerates the tags instead of using ``</\\1>``;
* explicit whitespace classes ``[ \\t\\n\\r\\f]`` everywhere (Java
  ``\\s`` includes vertical tab, RE2's does not);
* replacement strings differ (``$1`` vs ``\\1``) but that is
  engine-local syntax, not semantics.

This is a HEURISTIC extractor (like every regex-based one): it does
not build a DOM, so pathological markup (unclosed ``<script>``,
attributes containing ``>``) degrades gracefully rather than exactly.
Entity handling (r10): generic numeric character references
(``&#NNN;`` / ``&#xHH;`` — C1 range remapped through windows-1252 per
the WHATWG spec, NUL/surrogates/out-of-range → U+FFFD, semicolon
required) decode first, then the fixed NAMED set below (``&amp;``
last, so refs produced by escaping stay literal); other named
entities pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_to_text",
    "extract_title",
    "extract_links",
    "extract_anchors",
    "anchor_stats",
    "main_content",
    "html_extract",
    "extract_tables",
    "extract_meta",
    "extract_meta_sql",
    "meta_robots",
    "meta_robots_sql",
    "html_to_markdown",
    "html_to_markdown_sql",
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

#: WHATWG "numeric character reference end state" remaps: the C1
#: control range 0x80–0x9F means the windows-1252 glyphs in real
#: pages (``&#147;`` is a curly quote, not a control char); the five
#: unmapped slots (0x81 0x8D 0x8F 0x90 0x9D) pass through unchanged,
#: exactly as browsers emit them.
_C1_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6,
    0x89: 0x2030, 0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152,
    0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019, 0x93: 0x201C,
    0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}

#: ref bodies AFTER a ``&#`` split: decimal / hex forms (semicolon
#: required — HTML's legacy semicolon-less refs are not decoded; 7
#: decimal / 6 hex digits cover every valid codepoint, longer runs
#: stay literal text)
_DEC_REF = r"^([0-9]{1,7});"
_HEX_REF = r"^[xX]([0-9A-Fa-f]{1,6});"

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
#: A whole href-carrying anchor ELEMENT (open tag through its first
#: ``</a``) — the unit :func:`extract_anchors` pairs href with text
#: over; an unclosed ``<a>`` never matches (documented: no pair).
_A_ELEM_RE = (
    "(?is)<a\\b[^>]*?href" + _WS + "*=" + _WS
    + "*[\"'][^\"']*[\"'][^>]*>[^\\x00]*?</a" + _WS + "*>"
)


#: C1 remap as a FOLDABLE array literal indexed by ``cp - 0x7F``
#: (1-based ``element_at``): Catalyst constant-folds it into one
#: ``Literal``, unlike ``create_map(...)``, whose 54-literal tree was
#: rebuilt on every interpreted evaluation (r11 — the r10 shape made
#: ``html_extract`` the slowest bench entry).
_C1_ARR = [_C1_REMAP.get(c, c) for c in range(0x80, 0xA0)]


def _cp_char(cp: Column) -> Column:
    """Codepoint (int Column) → one-character string, HTML-spec
    normalized: C1 range remapped through windows-1252 (WHATWG),
    NUL / surrogates / >U+10FFFF become U+FFFD.

    ``format_string('%c', cp)`` is java.util.Formatter's codepoint
    conversion — it emits the surrogate pair for supplementary-plane
    codepoints, bit-identical to manual UTF-8 assembly (pinned by
    tests); the pre-guards make the invalid-codepoint path (which
    ``%c`` would throw on) unreachable. The C1 remap and the
    invalid range are disjoint, so one flat ``CASE`` suffices — but
    ``cp`` is still referenced several times, so callers must pass a
    CHEAP expression (a lambda-struct field, never a regexp chain):
    interpreted mode has no common-subexpression elimination and
    re-evaluates ``cp`` at every reference. The DuckDB replay just
    calls ``chr``."""
    return (
        F.when(
            (cp >= 0x80) & (cp <= 0x9F),
            F.format_string(
                "%c", F.element_at(F.lit(_C1_ARR), cp - 0x7F)
            ),
        )
        .when(
            (cp <= 0)
            | (cp > 0x10FFFF)
            | ((cp >= 0xD800) & (cp <= 0xDFFF)),
            F.lit("\N{REPLACEMENT CHARACTER}"),
        )
        .otherwise(F.format_string("%c", cp))
    )


def _decode_numeric_refs(col: Column) -> Column:
    """Decode ``&#NNN;`` / ``&#xHH;`` character references (r10 —
    previously only the fixed named set decoded, so non-English pages
    kept refs as literal text). Split on ``&#`` with a \\x01 sentinel
    prefix so the first piece needs no restoration (an input
    containing the illegal sequence ``&#\\x01`` loses its ``&#`` —
    \\x01 is not HTML text). ``&#38;``/``&#x26;`` emit ``&amp;`` so
    the named chain's LAST replace turns them into ``&``, keeping
    refs produced by decoding inert — ``&#38;lt;`` renders ``&lt;``
    literally, per the spec. Runs BEFORE the named chain for the same
    reason (``&amp;#65;`` must stay ``&#65;``).

    Cost shape (r11): interpreted HOF lambdas have no common-
    subexpression elimination, so any derived value referenced twice
    re-runs its whole subtree per piece — the r10 single-transform
    form re-evaluated each ``regexp_extract`` (and a ``create_map``)
    up to 15× per piece and made ``html_extract`` the slowest bench
    entry (1.6 → 5.8 s at sf0.1). The staged ``transform`` chain
    below is a LET cascade: each level binds what the next needs as
    struct fields, so every regexp runs exactly once per piece and
    every later reference is a cheap field access (byte-identical on
    crafted edge cases incl. supplementary plane / surrogate / C1 /
    escaped refs). r12: the html_extract bench entry reaches ~1.8 s
    steady-state at sf0.1 via the shared html_parts producer + the
    memoized construction — see html_extract; this function alone
    accounts for ~0.2 s of that."""
    pieces = F.split(F.concat(F.lit("\x01"), col), "&#", -1)

    # LET 1: run each ref regexp ONCE per piece
    lets = F.transform(
        pieces,
        lambda p: F.struct(
            F.regexp_extract(p, _DEC_REF, 1).alias("d"),
            F.regexp_extract(p, _HEX_REF, 1).alias("x"),
            p.alias("p"),
        ),
    )
    # LET 2: codepoint (NULL = no ref) + remainder offset
    lets2 = F.transform(
        lets,
        lambda s: F.struct(
            F.when(s["d"] != "", s["d"].cast("int"))
            .when(s["x"] != "", F.conv(s["x"], 16, 10).cast("int"))
            .alias("cp"),
            F.when(s["d"] != "", F.length(s["d"]) + 2)
            .when(s["x"] != "", F.length(s["x"]) + 3)
            .alias("cut"),
            s["p"].alias("p"),
        ),
    )
    # emit: decoded char + rest of the piece; non-refs restored
    fixed = F.transform(
        lets2,
        lambda s: F.when(
            s["cp"].isNotNull(),
            F.concat(
                F.when(s["cp"] == 38, F.lit("&amp;")).otherwise(
                    _cp_char(s["cp"])
                ),
                F.substr(s["p"], s["cut"]),
            ),
        )
        .when(s["p"].startswith("\x01"), s["p"])
        .otherwise(F.concat(F.lit("&#"), s["p"])),
    )
    return F.substr(F.array_join(fixed, ""), F.lit(2))


def _decode_entities(col: Column) -> Column:
    # The numeric pass runs UNGATED: on a ref-free string the split
    # yields one piece that round-trips untouched, which measures
    # CHEAPER than any gate — a `when(contains(col,'&#'), ...)`
    # gate re-evaluates the upstream regexp chain (interpreted mode
    # has no CSE), and the r10 single-element-array LET binding cost
    # more than the work it saved (~0.5 s/projection at sf0.1).
    col = _decode_numeric_refs(col)
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

    Cost discipline (r11): the entity decode — the most expensive
    fragment pass (numeric-charref split + the entity replace chain)
    — runs ONLY on blocks that survive the filter. The keep decision
    (word count, length, link density) is measured on tag-stripped,
    whitespace-collapsed, UNDECODED text, and anchor characters
    likewise count raw entity text (``&amp;`` is 5 density chars, not
    1) — a documented approximation that only shifts blocks sitting
    exactly on a threshold with entity-laden text. Surviving blocks
    then emit the exact ``collapse(decode(strip(block)))`` string as
    before.
    """
    clean = _strip_invisible(html)
    blocks = F.split(clean, _BLOCK_RE)

    def raw_text(b: Column) -> Column:
        # tag-stripped + collapsed, NO entity decode (filter metrics)
        return _collapse_ws(F.regexp_replace(b, _ANY_TAG_RE, ""))

    def anchor_chars(b: Column) -> Column:
        # total characters inside <a>…</a> bodies of the block
        # (collapsed, undecoded)
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_BODY_RE), F.lit(1)),
            F.lit(0),
            lambda acc, a: acc + F.length(raw_text(a)),
        )

    scored = F.transform(
        blocks,
        lambda b: F.struct(
            raw_text(b).alias("u"),
            F.regexp_replace(b, _ANY_TAG_RE, "").alias("x"),
            anchor_chars(b).alias("a"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (
            F.size(F.split(s["u"], "[ \n]")) >= F.lit(int(min_words))
        )
        & (F.length(s["u"]) > 0)
        & (
            s["a"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["u"])
        ),
    )
    return F.array_join(
        F.transform(
            kept, lambda s: _collapse_ws(_decode_entities(s["x"]))
        ),
        "\n\n",
    )


def html_parts(html: Column) -> Column:
    """Shared decoded-block producer (r12): ONE invisible-strip, ONE
    block split, then per block ONE tag-strip and ONE entity decode,
    bound as struct fields through a LET cascade — the array both
    :func:`html_visible_text` and :func:`html_main_content` derive
    from, so the body is never stripped or decoded twice (the r10/r11
    ``html_extract`` cost: title, text, and per-kept-block content
    each re-ran the chain).

    Fields per block: ``d`` — tag-stripped, entity-DECODED,
    uncollapsed text (the shared expensive value); ``u`` —
    tag-stripped, collapsed, UNdecoded text (the jusText filter
    metric, same stance as :func:`main_content`); ``a`` — anchor-text
    characters (collapsed, undecoded).

    Block-wise text semantics: joining the per-block strips equals
    stripping the whole block-delimited document except when a tag's
    attribute text spans a block-tag match (``<img alt="<div>">``) —
    there the unclosed fragment stays as text instead of being eaten.
    :func:`html_to_text` (the standalone whole-document form) keeps
    the old behavior; the frame documents this block-consistent
    variant, which is also exactly what the content filter has always
    seen. NULL html → NULL."""
    clean = _strip_invisible(html)
    blocks = F.split(clean, _BLOCK_RE)
    lets = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_replace(b, _ANY_TAG_RE, "").alias("x"),
            F.regexp_extract_all(
                b, F.lit(_ANCHOR_BODY_RE), F.lit(1)
            ).alias("ab"),
        ),
    )
    def decode_gated(x: Column) -> Column:
        # x is a BOUND struct field (cheap to reference twice), so
        # contains-gates are pure profit here — unlike the ungated
        # whole-document form, where a gate re-evaluated the upstream
        # regexp chain (r10 note in _decode_entities). An '&'-free
        # block (most prose blocks) skips the ENTIRE decode — numeric
        # split AND the named-entity replace chain; an '&'-but-no-'&#'
        # block skips just the numeric three-transform cascade. Both
        # branches are value-identical to _decode_entities (a string
        # without '&' contains no entity or reference by definition).
        inner = F.when(
            x.contains("&#"), _decode_numeric_refs(x)
        ).otherwise(x)
        for src, dst in _ENTITIES:
            inner = F.replace(inner, F.lit(src), F.lit(dst))
        return F.when(x.contains("&"), inner).otherwise(x)

    return F.transform(
        lets,
        lambda s: F.struct(
            decode_gated(s["x"]).alias("d"),
            _collapse_ws(s["x"]).alias("u"),
            F.aggregate(
                s["ab"],
                F.lit(0),
                lambda acc, a: acc
                + F.length(
                    _collapse_ws(F.regexp_replace(a, _ANY_TAG_RE, ""))
                ),
            ).alias("a"),
        ),
    )


def html_visible_text(parts: Column) -> Column:
    """Visible text from a :func:`html_parts` array — decoded blocks
    joined on newlines, collapsed once. Value-identical to
    :func:`html_to_text` except the documented tag-spanning edge (the
    entity decode commutes with the block join: no entity contains a
    newline or spans a block-tag match)."""
    return _collapse_ws(
        F.array_join(F.transform(parts, lambda s: s["d"]), "\n")
    )


def _keep_block(s: Column, min_words: int, max_link_density: float):
    return (
        (F.size(F.split(s["u"], "[ \n]")) >= F.lit(int(min_words)))
        & (F.length(s["u"]) > 0)
        & (
            s["a"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["u"])
        )
    )


def html_main_content(
    parts: Column,
    min_words: int = 5,
    max_link_density: float = 0.5,
) -> Column:
    """Boilerplate-filtered content from a :func:`html_parts` array —
    byte-identical to :func:`main_content` (same keep predicate over
    the same undecoded metrics; kept blocks reuse the already-decoded
    ``d`` instead of decoding again)."""
    return F.array_join(
        F.transform(
            F.filter(
                parts,
                lambda s: _keep_block(s, min_words, max_link_density),
            ),
            lambda s: _collapse_ws(s["d"]),
        ),
        "\n\n",
    )


def html_extract(
    df: DataFrame,
    html_col: str,
    min_words: int = 5,
    max_link_density: float = 0.5,
) -> DataFrame:
    """One-pass extraction frame: adds ``title``, ``text`` (full
    visible text), ``content`` (boilerplate-filtered), ``n_links``.
    Row-local — composes with any downstream filter/dedup without a
    shuffle.

    r12 cost shape: ``text`` and ``content`` both derive from ONE
    :func:`html_parts` array bound as a real projection barrier —
    Spark's ``CollapseProject`` keeps a non-cheap producer referenced
    twice in its own ``Project``, so the per-block strip+decode runs
    once per row, not once per output column (pinned by the
    two-Project plan test). ``text`` is therefore the block-wise
    visible text (see :func:`html_parts` for the one documented edge
    vs :func:`html_to_text`)."""
    h = F.col(html_col)
    parts = F.col("__parts__")
    # memoized construction: these Column trees are immutable and
    # name-resolved, so rebuilding the ~400-operator decode/strip
    # cascade per call is pure py4j overhead (~0.5 s); one tree per
    # (column, params) serves every frame
    key = (html_col, int(min_words), float(max_link_density))
    cached = _EXTRACT_COLS.get(key)
    if cached is None:
        cached = {
            "__parts__": html_parts(h),
            "title": extract_title(h),
            "text": html_visible_text(parts),
            "content": html_main_content(
                parts, min_words, max_link_density
            ),
            "n_links": F.size(extract_links(h)),
        }
        _EXTRACT_COLS[key] = cached
    return (
        df.withColumn("__parts__", cached["__parts__"])
        .withColumns({k: v for k, v in cached.items() if k != "__parts__"})
        .drop("__parts__")
    )


#: html_extract's memoized output Columns, keyed by
#: (html_col, min_words, max_link_density) — see html_extract.
_EXTRACT_COLS: dict = {}


# --- DuckDB oracle replay (same constants, RE2 dialect) --------------

def _sq(s: str) -> str:
    """Single-quote-escape for embedding in a SQL literal."""
    return s.replace("'", "''")


def _collapse_ws_sql(e: str) -> str:
    e = f"regexp_replace({e}, '[ \\t\\r\\f]+', ' ', 'g')"
    e = f"regexp_replace({e}, ' ?\\n ?', chr(10), 'g')"
    e = f"regexp_replace({e}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    return f"regexp_replace({e}, '^[ \\n]+|[ \\n]+$', '', 'g')"


def _decode_numeric_refs_sql(e: str) -> str:
    """DuckDB replay of :func:`_decode_numeric_refs` — same split/
    sentinel/emit shape; DuckDB's ``chr`` is a real codepoint
    renderer so no byte assembly is needed."""
    c1 = " ".join(
        f"WHEN {k} THEN {v}" for k, v in _C1_REMAP.items()
    )

    def emit(cp: str) -> str:
        norm = f"(CASE {cp} {c1} ELSE {cp} END)"
        safe = (
            f"(CASE WHEN {norm} <= 0 OR {norm} > 1114111 OR "
            f"({norm} BETWEEN 55296 AND 57343) THEN 65533 "
            f"ELSE {norm} END)"
        )
        return f"(CASE WHEN {cp} = 38 THEN '&amp;' ELSE chr({safe}) END)"

    dec = f"regexp_extract(p, '{_sq(_DEC_REF)}', 1)"
    hx = f"regexp_extract(p, '{_sq(_HEX_REF)}', 1)"

    def fexpr_hex(h: str) -> str:  # hex digits -> int (0x literal cast)
        return f"CAST('0x' || {h} AS INT)"
    fix = (
        "CASE "
        f"WHEN {dec} != '' THEN {emit(f'CAST({dec} AS INT)')} || "
        f"substr(p, length({dec}) + 2) "
        f"WHEN {hx} != '' THEN "
        f"{emit(fexpr_hex(hx))} || "
        f"substr(p, length({hx}) + 3) "
        "WHEN starts_with(p, chr(1)) THEN p "
        "ELSE '&#' || p END"
    )
    return (
        f"substr(array_to_string(list_transform("
        f"str_split(chr(1) || ({e}), '&#'), p -> {fix}), ''), 2)"
    )


def _decode_entities_sql(e: str) -> str:
    # same LET binding as the Column side: bind e once, gate, decode
    e = (
        f"(list_transform([{e}], __nc -> "
        f"CASE WHEN contains(__nc, '&#') "
        f"THEN {_decode_numeric_refs_sql('__nc')} "
        f"ELSE __nc END)[1])"
    )
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


def html_visible_text_sql(expr: str) -> str:
    """DuckDB replay of the BLOCK-WISE visible text
    (:func:`html_visible_text` over :func:`html_parts`) — per-block
    strip+decode joined on newlines, collapsed once. The frame's
    ``text`` column oracle; :func:`html_to_text_sql` stays the replay
    of the standalone whole-document form."""
    clean = f"regexp_replace({expr}, '{_sq(_INVISIBLE_RE)}', ' ', 'g')"
    blocks = f"str_split_regex({clean}, '{_sq(_BLOCK_RE)}')"
    d = _decode_entities_sql(
        f"regexp_replace(b, '{_sq(_ANY_TAG_RE)}', '', 'g')"
    )
    return _collapse_ws_sql(
        f"array_to_string(list_transform({blocks}, b -> {d}), chr(10))"
    )


def extract_title_sql(expr: str) -> str:
    e = f"regexp_extract({expr}, '{_sq(_TITLE_RE)}', 1)"
    return _collapse_ws_sql(_decode_entities_sql(e))


def extract_links_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{_sq(_HREF_RE)}', 1)"


def extract_anchors_sql(expr: str) -> str:
    anchor = _decode_entities_sql(
        f"regexp_replace(e, '{_sq(_ANY_TAG_RE)}', '', 'g')"
    )
    anchor = (
        f"trim(regexp_replace({anchor}, '[ \\t\\r\\n\\f]+', ' ', 'g'))"
    )
    return (
        f"list_transform("
        f"regexp_extract_all({expr}, '{_sq(_A_ELEM_RE)}', 0), "
        f"e -> struct_pack("
        f"href := regexp_extract(e, '{_sq(_HREF_RE)}', 1), "
        f"anchor := {anchor}))"
    )


#: table BODY (capture group 1) — a nested table's inner ``</table>``
#: ends the outer match early (documented heuristic degradation; this
#: module never builds a DOM)
_TABLE_RE = "(?is)<table\\b[^>]*>([^\\x00]*?)</table" + _WS + "*>"
_TR_SPLIT_RE = r"(?i)<tr\b[^>]*>"
_CELL_SPLIT_RE = r"(?i)<t[dh]\b[^>]*>"


def _tail(pieces: Column) -> Column:
    """Everything after the first split piece (the pre-first-tag
    junk): ``pieces[2:]`` 1-based, empty when there is no tag."""
    return F.when(
        F.size(pieces) > 1, F.slice(pieces, 2, F.size(pieces) - 1)
    ).otherwise(F.array().cast("array<string>"))


def _let(col: Column, body) -> Column:
    """LET-bind ``col`` so ``body`` (a Column→Column function) sees it
    as a lambda variable evaluated ONCE — the 1-element ``transform``
    binding this module's renderers use inline (r15); named helper
    shared with quality.py/rolling.py since r16. Interpreted HOF
    expressions get no common-subexpression elimination, so an
    expression referenced twice is otherwise computed twice."""
    return F.get(F.transform(F.array(col), body), 0)


#: colspan/rowspan attribute capture (digits bounded so the int cast
#: can't overflow; HTML spec clamps are applied after the parse)
_COLSPAN_RE = "(?i)colspan" + _WS + "*=" + _WS + "*[\"']?([0-9]{1,4})"
_ROWSPAN_RE = "(?i)rowspan" + _WS + "*=" + _WS + "*[\"']?([0-9]{1,5})"


def _span_attr(tag: Column, pat: str, clamp: int) -> Column:
    """Span attribute of one cell tag: missing/0 → 1, clamped to the
    HTML-spec maximum (colspan 1000, rowspan 65534)."""
    e = F.regexp_extract(tag, pat, 1)
    v = F.when(e != "", e.cast("int")).otherwise(F.lit(1))
    return F.least(F.greatest(v, F.lit(1)), F.lit(int(clamp)))


def extract_tables(html: Column, expand_spans: bool = False) -> Column:
    """Structured table recovery (r11):
    ``array<array<array<string>>>`` — tables → rows → cell texts, in
    document order. The recipe web-corpus structured-data extraction
    uses: table bodies by regex, rows split on ``<tr>`` OPENING tags
    and cells on ``<td>/<th>`` opening tags (so the omitted closing
    tags real pages ship — ``<tr><td>a<td>b`` — parse correctly);
    each cell is tag-stripped, entity-decoded, and whitespace-
    collapsed exactly like :func:`html_to_text`. Header cells
    (``<th>``) are ordinary cells — row 0 is the header by HTML
    convention. Rows with no cells (caption/colgroup junk before the
    first ``<td>``) drop; empty cells survive as ``""``. Invisible
    containers (script/style/comments) strip FIRST, so a script
    inside a table never leaks into cell text. NULL html → NULL.

    ``expand_spans=False`` (default, the r11 behavior): colspan/
    rowspan are ignored — the cell GRID is returned, not the rendered
    geometry. ``expand_spans=True`` (r12) expands both into the
    rectangular grid the way ``pandas.read_html`` does — a
    ``colspan=c`` cell repeats its text across ``c`` columns, a
    ``rowspan=r`` cell repeats down ``r`` rows, a ``c×r`` block fills
    all its positions; later rows place their cells into the free
    columns left of/between the hanging spans (wiki/finance tables
    misalign without this). Missing/0 spans count 1; spec clamps
    (1000 / 65534) apply; a rowspan overhanging the last ``<tr>``
    truncates at the table end. On a span-free table the expansion is
    the identity — byte-identical to the default path (pinned).

    Pure HOF pipeline either way — row-local, zero shuffle; the
    expansion is one ``aggregate`` over the row array whose
    accumulator carries (emitted grid, hanging spans). Nested tables
    degrade to a truncated outer body (no DOM — same stance as the
    rest of this module)."""
    clean = _strip_invisible(html)
    bodies = F.regexp_extract_all(clean, F.lit(_TABLE_RE), F.lit(1))
    return F.transform(
        bodies,
        lambda b: _table_rows(b, _table_cell_text, expand_spans),
    )


def _table_cell_text(c: Column) -> Column:
    """Fully rendered cell text (tag-stripped, entity-decoded,
    whitespace-collapsed) — :func:`extract_tables`'s cell transform."""
    return _collapse_ws(
        _decode_entities(F.regexp_replace(c, _ANY_TAG_RE, ""))
    )


def _table_rows(body: Column, cellf, expand: bool) -> Column:
    """Rows-of-cells grid of ONE table body under cell transform
    ``cellf`` — the shared parse behind :func:`extract_tables` (cells
    via :func:`_table_cell_text`) and the markdown pipe render (cells
    via :func:`_md_cell_prep`, which keeps inline tags for the rule
    table downstream). Same expression tree :func:`extract_tables`
    built inline through r12 — the refactor is parameterization, not
    behavior (pinned by the html_tables oracle)."""

    def cells_of(row: Column) -> Column:
        return F.transform(
            _tail(F.split(row, _CELL_SPLIT_RE, -1)), cellf
        )

    if not expand:
        rows = F.transform(
            _tail(F.split(body, _TR_SPLIT_RE, -1)), cells_of
        )
        return F.filter(rows, lambda r: F.size(r) > 0)

    def spanned_cells_of(row: Column) -> Column:
        # the split DELIMITERS carry the span attributes — extract
        # the opening tags with the same pattern so tag i pairs with
        # split-tail piece i, then expand colspan into repeated
        # (text, rowspan) units (a c×r cell becomes c column units
        # each hanging r rows)
        tags = F.regexp_extract_all(
            row, F.lit(_CELL_SPLIT_RE), F.lit(0)
        )
        units = F.zip_with(
            tags,
            _tail(F.split(row, _CELL_SPLIT_RE, -1)),
            lambda tag, c: F.struct(
                cellf(c).alias("text"),
                _span_attr(tag, _ROWSPAN_RE, 65534).alias("rs"),
                _span_attr(tag, _COLSPAN_RE, 1000).alias("cs"),
            ),
        )
        return F.flatten(
            F.transform(
                units,
                lambda u: F.array_repeat(
                    F.struct(u["text"].alias("text"), u["rs"].alias("rs")),
                    u["cs"],
                ),
            )
        )

    def expand_body(body: Column) -> Column:
        rows = F.filter(
            F.transform(
                _tail(F.split(body, _TR_SPLIT_RE, -1)),
                spanned_cells_of,
            ),
            lambda r: F.size(r) > 0,
        )
        init = F.struct(
            F.array().cast("array<array<string>>").alias("out"),
            F.array()
            .cast("array<struct<col:int,rem:int,text:string>>")
            .alias("pend"),
        )

        def merge(st: Column, units: Column) -> Column:
            occ = st["pend"]

            # r16 LET discipline: occ_cols was referenced from inside
            # the free-position filter's PER-ELEMENT lambda (so the
            # hanging-span transform re-ran once per candidate
            # position — O(cap·|pend|) per row) and allc (the sort)
            # was evaluated twice (row_out + new_pend). Bind each
            # once; identical values, same fold semantics.
            def with_occ_cols(occ_cols: Column) -> Column:
                n = F.size(units)
                # enough candidate positions for every hanging span
                # plus this row's units: 0 .. max(occ)+n always works
                cap = F.coalesce(
                    F.array_max(occ_cols), F.lit(-1)
                ) + n
                free = F.slice(
                    F.filter(
                        F.sequence(F.lit(0), cap),
                        lambda pos: ~F.array_contains(occ_cols, pos),
                    ),
                    1,
                    n,
                )
                placed = F.zip_with(
                    free,
                    units,
                    lambda pos, u: F.struct(
                        pos.alias("col"),
                        u["rs"].alias("rem"),
                        u["text"].alias("text"),
                    ),
                )

                def with_allc(allc: Column) -> Column:
                    row_out = F.transform(allc, lambda x: x["text"])
                    new_pend = F.filter(
                        F.transform(
                            allc,
                            lambda x: F.struct(
                                x["col"].alias("col"),
                                (x["rem"] - F.lit(1)).alias("rem"),
                                x["text"].alias("text"),
                            ),
                        ),
                        lambda x: x["rem"] > 0,
                    )
                    return F.struct(
                        F.concat(
                            st["out"], F.array(row_out)
                        ).alias("out"),
                        new_pend.alias("pend"),
                    )

                return _let(
                    F.array_sort(F.concat(occ, placed)), with_allc
                )

            return _let(
                F.transform(occ, lambda p: p["col"]), with_occ_cols
            )

        return F.aggregate(rows, init, merge, lambda st: st["out"])

    return expand_body(body)


def extract_tables_sql(expr: str) -> str:
    """DuckDB replay of :func:`extract_tables` — same constants, RE2
    dialect; ``list_slice(x, 2, len(x))`` is the 1-based ``[2:]``."""
    cell = _collapse_ws_sql(
        _decode_entities_sql(
            f"regexp_replace(c, '{_sq(_ANY_TAG_RE)}', '', 'g')"
        )
    )

    def tail(pieces: str) -> str:
        return f"list_slice({pieces}, 2, len({pieces}))"

    cell_pieces = f"str_split_regex(r, '{_sq(_CELL_SPLIT_RE)}')"
    row_pieces = f"str_split_regex(b, '{_sq(_TR_SPLIT_RE)}')"
    cells = (
        f"list_transform({tail(cell_pieces)}, c -> {cell})"
    )
    rows = (
        f"list_filter(list_transform({tail(row_pieces)}, "
        f"r -> {cells}), r -> len(r) > 0)"
    )
    clean = f"regexp_replace({expr}, '{_sq(_INVISIBLE_RE)}', ' ', 'g')"
    return (
        f"list_transform(regexp_extract_all("
        f"{clean}, '{_sq(_TABLE_RE)}', 1), b -> {rows})"
    )


def main_content_sql(
    expr: str, min_words: int = 5, max_link_density: float = 0.5
) -> str:
    def strip(b: str) -> str:
        return f"regexp_replace({b}, '{_sq(_ANY_TAG_RE)}', '', 'g')"

    def raw_text(b: str) -> str:
        # mirror of the Column-side raw_text: collapsed, UNDECODED
        return _collapse_ws_sql(strip(b))

    clean = f"regexp_replace({expr}, '{_sq(_INVISIBLE_RE)}', ' ', 'g')"
    blocks = f"str_split_regex({clean}, '{_sq(_BLOCK_RE)}')"
    anchor = (
        f"coalesce(list_sum(list_transform("
        f"regexp_extract_all(b, '{_sq(_ANCHOR_BODY_RE)}', 1), "
        f"a2 -> length({raw_text('a2')}))), 0)"
    )
    scored = (
        f"list_transform({blocks}, "
        f"b -> struct_pack(u := {raw_text('b')}, "
        f"x := {strip('b')}, a := {anchor}))"
    )
    kept = (
        f"list_filter({scored}, s -> "
        f"len(str_split_regex(s.u, '[ \\n]')) >= {int(min_words)} "
        f"and length(s.u) > 0 "
        f"and cast(s.a as double) <= "
        f"{float(max_link_density)!r} * length(s.u))"
    )
    out_t = _collapse_ws_sql(_decode_entities_sql("s.x"))
    return (
        f"array_to_string(list_transform({kept}, s -> {out_t}), "
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


def extract_anchors(html: Column) -> Column:
    """``(href, anchor)`` pairs for every href-carrying ``<a>``
    element, in document order (``array<struct<href,anchor>>``): the
    anchor text is the element's tag-stripped, entity-decoded,
    whitespace-collapsed inner text — the classic inbound-link
    relevance signal :func:`extract_links` drops.  An element with no
    closing ``</a`` yields no pair.  Row-local HOF chain, same
    java-regex ∩ RE2 dialect as the rest of the module
    (:func:`extract_anchors_sql` is the DuckDB twin)."""
    elems = F.regexp_extract_all(html, F.lit(_A_ELEM_RE), F.lit(0))

    def flat(c: Column) -> Column:
        # anchor text is a LABEL: every whitespace run (incl.
        # newlines) -> one space, trimmed — unlike _collapse_ws,
        # which preserves document line structure
        return F.trim(F.regexp_replace(c, r"[ \t\r\n\f]+", " "))

    return F.transform(
        elems,
        lambda e: F.struct(
            F.regexp_extract(e, _HREF_RE, 1).alias("href"),
            flat(
                _decode_entities(F.regexp_replace(e, _ANY_TAG_RE, ""))
            ).alias("anchor"),
        ),
    )


def anchor_stats(
    df: DataFrame,
    html_col: str,
    src_host_col: str,
) -> DataFrame:
    """Per-target-host INBOUND anchor-text profile — what the web
    calls a page's "anchor text corpus" (a strong relevance/quality
    signal: how other pages describe a host).  Target resolution is
    the :func:`link_graph` convention: absolute ``http(s)`` hrefs go
    to their own host (``url_domain``), everything else is a self
    edge.  Output per ``dst`` host: ``n_links`` (total inbound
    anchors), ``n_texts`` (distinct non-empty anchor texts),
    ``top_anchor`` / ``top_n`` (the most frequent non-empty text —
    count desc, text asc on ties; NULL when every anchor is empty).

    Scale: row-local explode + one (dst, anchor) aggregate + one dst
    aggregate whose argmax is a struct-min — no window, no self-join,
    the link_graph scan/agg shape."""
    from pandas_weights_spark.functions.text import url_domain

    src = F.lower(F.col(src_host_col))
    pairs = df.select(
        src.alias("src"),
        F.explode(extract_anchors(F.col(html_col))).alias("a"),
    )
    dst_host = url_domain(F.col("a.href"))
    base = pairs.select(
        F.when(F.length(dst_host) > 0, dst_host)
        .otherwise(F.col("src"))
        .alias("dst"),
        F.col("a.anchor").alias("anchor"),
    )
    cnt = base.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("__n__")
    )
    nonempty = F.length("anchor") > 0
    arg = F.min(
        F.when(
            nonempty,
            F.struct(
                (-F.col("__n__")).alias("a"),
                F.col("anchor").alias("t"),
            ),
        )
    )
    out = cnt.groupBy("dst").agg(
        F.sum("__n__").alias("n_links"),
        F.sum(F.when(nonempty, 1).otherwise(0))
        .cast("long")
        .alias("n_texts"),
        arg.alias("__arg__"),
    )
    return out.select(
        "dst",
        "n_links",
        "n_texts",
        F.col("__arg__.t").alias("top_anchor"),
        (-F.col("__arg__.a")).cast("long").alias("top_n"),
    )


# ---------------------------------------------------------------------
# Page metadata: description / OpenGraph / canonical / published date
# ---------------------------------------------------------------------

def _meta_content_re(key: str) -> "tuple[str, str]":
    """Regex pair (attribute-order-tolerant) for the ``content`` of a
    ``<meta>`` whose ``name``/``property`` equals ``key`` — real pages
    emit both ``<meta name=.. content=..>`` and the reversed order."""
    attr = f"(?:name|property){_WS}*={_WS}*[\"']{key}[\"']"
    val = f"content{_WS}*={_WS}*[\"']([^\"']*)[\"']"
    fwd = f"(?is)<meta\\b[^>]*{attr}[^>]*{val}"
    rev = f"(?is)<meta\\b[^>]*{val}[^>]*{attr}"
    return fwd, rev


_CANON_HREF = "href" + _WS + "*=" + _WS + "*[\"']([^\"']*)[\"']"
_CANON_REL = "rel" + _WS + "*=" + _WS + "*[\"']canonical[\"']"
_CANON_FWD = f"(?is)<link\\b[^>]*{_CANON_REL}[^>]*{_CANON_HREF}"
_CANON_REV = f"(?is)<link\\b[^>]*{_CANON_HREF}[^>]*{_CANON_REL}"
_TIME_RE = (
    "(?is)<time\\b[^>]*datetime" + _WS + "*=" + _WS
    + "*[\"']([^\"']*)[\"']"
)
#: JSON-LD ``datePublished`` — matched anywhere in the document
#: (documented heuristic: this module never parses JSON or builds a
#: DOM; a datePublished key outside an ld+json block also matches)
_LDJSON_DATE_RE = r'(?is)"datePublished"\s*:\s*"([^"]*)"'
_ISO_DATE_RE = r"^\d{4}-\d{2}-\d{2}"


def _first_nonempty(*cols: Column) -> Column:
    return F.coalesce(
        *[F.nullif(c, F.lit("")) for c in cols], F.lit("")
    )


def _meta_field(html: Column, key: str) -> Column:
    fwd, rev = _meta_content_re(key)
    return _first_nonempty(
        F.regexp_extract(html, fwd, 1), F.regexp_extract(html, rev, 1)
    )


def extract_meta(html: Column) -> "Dict[str, Column]":
    """Page-level metadata a crawl pipeline filters and joins on —
    meta description, OpenGraph title/description, the canonical URL,
    and the publication date (provenance for temporal slicing of a
    crawl). All single-pass ``regexp_extract`` Column algebra: zero
    shuffle, attribute-order tolerant, entity-decoded text fields.

    Returned columns (empty string when absent; NULL html → NULL):

    - ``meta_description`` — ``<meta name="description">``
    - ``og_title`` / ``og_description`` — OpenGraph properties
    - ``canonical_url`` — ``<link rel="canonical" href>``
    - ``published_raw`` — first of ``article:published_time`` meta,
      ``<time datetime>``, JSON-LD ``"datePublished"`` (that priority)
    - ``published_date`` — ``published_raw``'s leading ISO
      ``yyyy-MM-dd`` as a DATE, NULL when unparseable

    The date never goes through a locale parser: a regex gate + a
    10-char slice keeps semantics identical in Spark and the DuckDB
    oracle replay (:func:`extract_meta_sql`).
    """
    desc = _collapse_ws(
        _decode_entities(_meta_field(html, "description"))
    )
    og_title = _collapse_ws(
        _decode_entities(_meta_field(html, "og:title"))
    )
    og_desc = _collapse_ws(
        _decode_entities(_meta_field(html, "og:description"))
    )
    canon = _first_nonempty(
        F.regexp_extract(html, _CANON_FWD, 1),
        F.regexp_extract(html, _CANON_REV, 1),
    )
    raw = _first_nonempty(
        _meta_field(html, "article:published_time"),
        F.regexp_extract(html, _TIME_RE, 1),
        F.regexp_extract(html, _LDJSON_DATE_RE, 1),
    )
    # try_to_timestamp: a regex-passing but invalid date (2024-99-99)
    # must yield NULL, never an ANSI cast error killing a 100 TB scan
    date = F.when(
        raw.rlike(_ISO_DATE_RE),
        F.try_to_timestamp(
            F.substring(raw, 1, 10), F.lit("yyyy-MM-dd")
        ).cast("date"),
    )
    return {
        "meta_description": desc,
        "og_title": og_title,
        "og_description": og_desc,
        "canonical_url": canon,
        "published_raw": raw,
        "published_date": date,
    }


#: directive names of the robots meta standard (Google/Bing public
#: docs; REP meta extension). "none" == noindex + nofollow.
_ROBOTS_FWD, _ROBOTS_REV = _meta_content_re("robots")
_XROBOTS_RE = r"(?im)^x-robots-tag[ \t]*:[ \t]*([^\r\n]*)"


def meta_robots(
    html: Column, http_headers: "Column | None" = None
) -> "Dict[str, Column]":
    """Page-level robots directives — the per-PAGE politeness gate
    that complements the per-SITE robots.txt
    (:func:`~pandas_weights_spark.functions.robots.robots_allowed`):
    ``<meta name="robots" content="...">`` tags (ALL of them, both
    attribute orders) unioned with the HTTP ``X-Robots-Tag`` header
    when the WARC header block is passed (the
    :func:`~pandas_weights_spark.sources.warc.from_warc_shards`
    ``http_headers`` column). Common Crawl and every compliant
    training-data pipeline drop noindex pages at hygiene time.

    Returned columns (the :func:`extract_meta` convention):

    - ``robots_raw`` — the comma-joined directive sources, verbatim
    - ``noindex`` / ``nofollow`` — booleans; ``none`` implies BOTH
      (the public REP-meta convention); directives match
      case-insensitively with surrounding whitespace trimmed
    - ``noarchive`` / ``nosnippet`` — booleans

    Documented conservatisms (the module's no-DOM stance): only the
    generic ``robots`` meta name is read (bot-scoped names like
    ``googlebot`` are product-specific); a bot-scoped
    ``X-Robots-Tag: somebot: noindex`` token does NOT flag (the
    token is ``somebot: noindex``, not a directive — unscoped
    headers, the common form, parse fully). Row-local regex + HOF
    algebra, zero shuffle; :func:`meta_robots_sql` is the DuckDB
    twin. NULL html → NULL flags.
    """
    metas = F.concat(
        F.regexp_extract_all(html, F.lit(_ROBOTS_FWD), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_ROBOTS_REV), F.lit(1)),
    )
    sources = F.array_join(metas, ",")
    if http_headers is not None:
        hdr = F.regexp_extract(
            F.coalesce(http_headers, F.lit("")), _XROBOTS_RE, 1
        )
        raw = F.concat_ws(",", F.nullif(sources, F.lit("")),
                          F.nullif(hdr, F.lit("")))
    else:
        raw = sources
    toks = F.transform(
        F.split(raw, ","), lambda x: F.lower(F.trim(x))
    )

    def has(*names: str) -> Column:
        out = F.array_contains(toks, names[0])
        for nm in names[1:]:
            out = out | F.array_contains(toks, nm)
        return out

    return {
        "robots_raw": raw,
        "noindex": has("noindex", "none"),
        "nofollow": has("nofollow", "none"),
        "noarchive": has("noarchive"),
        "nosnippet": has("nosnippet"),
    }


def meta_robots_sql(
    html_expr: str, headers_expr: "str | None" = None
) -> "Dict[str, str]":
    """DuckDB replay of :func:`meta_robots` — same emitted patterns,
    RE2 dialect, same token algebra."""
    fwd = f"regexp_extract_all({html_expr}, '{_sq(_ROBOTS_FWD)}', 1)"
    rev = f"regexp_extract_all({html_expr}, '{_sq(_ROBOTS_REV)}', 1)"
    sources = f"list_aggr(list_concat({fwd}, {rev}), 'string_agg', ',')"
    if headers_expr is not None:
        hdr = (
            f"regexp_extract(coalesce({headers_expr}, ''), "
            f"'{_sq(_XROBOTS_RE)}', 1)"
        )
        raw = (
            f"concat_ws(',', nullif({sources}, ''), "
            f"nullif({hdr}, ''))"
        )
    else:
        # gate on the INPUT, not the extract (r15, ADVICE r14): the
        # coalesce only exists because DuckDB's list_aggr over an
        # empty list yields NULL where Spark's array_join yields ''
        # — but for NULL html the Spark twin (and the documented
        # contract) propagates NULL flags, so the '' floor must not
        # swallow that case
        raw = (
            f"CASE WHEN {html_expr} IS NULL THEN NULL "
            f"ELSE coalesce({sources}, '') END"
        )
    toks = (
        f"list_transform(string_split({raw}, ','), "
        f"x -> lower(trim(x)))"
    )

    def has(*names: str) -> str:
        return " OR ".join(
            f"list_contains({toks}, '{nm}')" for nm in names
        )

    return {
        "robots_raw": raw,
        "noindex": f"({has('noindex', 'none')})",
        "nofollow": f"({has('nofollow', 'none')})",
        "noarchive": f"({has('noarchive')})",
        "nosnippet": f"({has('nosnippet')})",
    }


def _first_nonempty_sql(*exprs: str) -> str:
    inner = ", ".join(f"nullif({e}, '')" for e in exprs)
    return f"coalesce({inner}, '')"


def _meta_field_sql(expr: str, key: str) -> str:
    fwd, rev = _meta_content_re(key)
    return _first_nonempty_sql(
        f"regexp_extract({expr}, '{_sq(fwd)}', 1)",
        f"regexp_extract({expr}, '{_sq(rev)}', 1)",
    )


def extract_meta_sql(expr: str) -> "dict[str, str]":
    """DuckDB replay of :func:`extract_meta` — same pattern constants
    (emitted, not copied), same priority order, same regex-gated ISO
    date slice."""
    desc = _collapse_ws_sql(
        _decode_entities_sql(_meta_field_sql(expr, "description"))
    )
    og_title = _collapse_ws_sql(
        _decode_entities_sql(_meta_field_sql(expr, "og:title"))
    )
    og_desc = _collapse_ws_sql(
        _decode_entities_sql(_meta_field_sql(expr, "og:description"))
    )
    canon = _first_nonempty_sql(
        f"regexp_extract({expr}, '{_sq(_CANON_FWD)}', 1)",
        f"regexp_extract({expr}, '{_sq(_CANON_REV)}', 1)",
    )
    raw = _first_nonempty_sql(
        _meta_field_sql(expr, "article:published_time"),
        f"regexp_extract({expr}, '{_sq(_TIME_RE)}', 1)",
        f"regexp_extract({expr}, '{_sq(_LDJSON_DATE_RE)}', 1)",
    )
    date = (
        f"CASE WHEN regexp_matches({raw}, '{_sq(_ISO_DATE_RE)}') "
        f"THEN TRY_CAST(substr({raw}, 1, 10) AS DATE) END"
    )
    return {
        "meta_description": desc,
        "og_title": og_title,
        "og_description": og_desc,
        "canonical_url": canon,
        "published_raw": raw,
        "published_date": date,
    }


# ---------------------------------------------------------------------
# HTML -> Markdown (the LLM-corpus text representation)
# ---------------------------------------------------------------------

def _md_heading_rules() -> "list[tuple[str, str]]":
    out = []
    for n in range(1, 7):
        out.append(
            (
                f"(?is)<h{n}\\b[^>]*>([^\\x00]*?)</h{n}{_WS}*>",
                "\n\n" + "#" * n + " $1\n\n",
            )
        )
    return out


#: ordered (pattern, replacement) rewrite table shared by the Column
#: chain and the SQL replay — replacements use Java's ``$N`` group
#: syntax; the SQL emitter converts to RE2's ``\N``. ORDER MATTERS:
#: fences before inline code, inline marks before links (bold inside
#: anchor text must already carry its ``**`` when the link wraps it).
_MD_RULES: "list[tuple[str, str]]" = (
    [
        # <pre><code>..</code></pre> and bare <pre> -> fenced block
        (
            "(?is)<pre\\b[^>]*>" + _WS + "*<code\\b[^>]*>"
            "([^\\x00]*?)</code>" + _WS + "*</pre" + _WS + "*>",
            "\n\n```\n$1\n```\n\n",
        ),
        (
            "(?is)<pre\\b[^>]*>([^\\x00]*?)</pre" + _WS + "*>",
            "\n\n```\n$1\n```\n\n",
        ),
        ("(?is)<code\\b[^>]*>([^\\x00]*?)</code" + _WS + "*>",
         "`$1`"),
    ]
    + _md_heading_rules()
    + [
        ("(?is)<strong\\b[^>]*>([^\\x00]*?)</strong" + _WS + "*>",
         "**$1**"),
        ("(?is)<b\\b[^>]*>([^\\x00]*?)</b" + _WS + "*>", "**$1**"),
        ("(?is)<em\\b[^>]*>([^\\x00]*?)</em" + _WS + "*>", "*$1*"),
        ("(?is)<i\\b[^>]*>([^\\x00]*?)</i" + _WS + "*>", "*$1*"),
        (
            "(?is)<a\\b[^>]*?href" + _WS + "*=" + _WS
            + "*[\"']([^\"']*)[\"'][^>]*>([^\\x00]*?)</a" + _WS + "*>",
            "[$2]($1)",
        ),
        (
            "(?is)<img\\b[^>]*?src" + _WS + "*=" + _WS
            + "*[\"']([^\"']*)[\"'][^>]*/?>",
            "![]($1)",
        ),
        ("(?i)<hr\\b[^>]*/?>", "\n\n---\n\n"),
        ("(?i)<li\\b[^>]*>", "\n- "),
        # </li> vanishes (the next <li> or the list close supplies the
        # break) so closed and unclosed lists render identically tight
        ("(?i)</li" + _WS + "*>", ""),
        ("(?i)<blockquote\\b[^>]*>", "\n\n> "),
        ("(?i)</blockquote" + _WS + "*>", "\n\n"),
        ("(?i)<br\\b[^>]*/?>", "\n"),
        (
            "(?i)</?(p|div|ul|ol|dl|dt|dd|tr|td|th|table|section|"
            "article|aside|header|footer|nav|main|figure|figcaption|"
            "form|fieldset|address)\\b[^>]*/?>",
            "\n\n",
        ),
    ]
)


#: sentinel marks for the ESCAPED render (\x02 + one char): generated
#: structure must survive the metachar-escape pass that source text
#: goes through, so rules emit sentinels and the escape step restores
#: them afterwards. \x02 is not HTML text (same caveat as the \x01
#: decode sentinel).
_MD_SENT_FENCE = "\x02F"
_MD_SENT_CODE = "\x02C"
#: a SOURCE ``|`` inside a table cell (r13 pipe tables) — restored as
#: the GFM escape ``\\|`` so literal pipes never break generated rows;
#: rides the same swap tables as the other generated marks
_MD_SENT_PIPE = "\x02P"
_MD_SENT_SWAPS: "list[tuple[str, str]]" = [
    ("\x02B", "**"),
    ("\x02I", "*"),
    ("\x02L", "["),
    ("\x02M", "]"),
    (_MD_SENT_PIPE, "\\|"),
] + [("\x02" + str(n), "#" * n) for n in range(1, 7)]

#: markdown metacharacters escaped in source text (escape=True):
#: backslash itself, backtick, emphasis, heading, link brackets
_MD_ESCAPE_RE = r"([\\`*_#\[\]])"


def _md_rules_escaped() -> "list[tuple[str, str]]":
    """The rewrite table with sentinel replacements — same patterns
    and ORDER as ``_MD_RULES``, metachar output swapped for the
    ``_MD_SENT_*`` codes (asserted 1:1 against the plain table)."""
    swap = {
        "```": _MD_SENT_FENCE,
        "`": _MD_SENT_CODE,
        "**": "\x02B",
        "*": "\x02I",
        "[": "\x02L",
        "]": "\x02M",
    }
    out = []
    for pat, repl in _MD_RULES:
        r = repl
        for n in range(6, 0, -1):
            r = r.replace("#" * n, "\x02" + str(n))
        r = r.replace("```", _MD_SENT_FENCE)
        # longest-first so ** never splits into two italic marks
        r = r.replace("**", "\x02B")
        r = r.replace("`", _MD_SENT_CODE)
        r = r.replace("*", "\x02I")
        r = r.replace("[", "\x02L").replace("]", "\x02M")
        out.append((pat, r))
    assert len(out) == len(_MD_RULES), swap  # table stays 1:1
    return out


def _md_cell_prep(c: Column) -> Column:
    """Structural prep of ONE table-cell body for the pipe render:
    block-level tags inside the cell flatten to a space (a GFM cell
    is one line), source ``|`` swaps to the :data:`_MD_SENT_PIPE`
    sentinel (restored as ``\\|`` after the escape pass — structural
    pipes stay raw), whitespace collapses to single spaces, ends
    trim. INLINE tags (b/em/a/code/img) survive untouched so the
    rewrite table downstream renders them inside the cell — the
    markdown analog of :func:`_table_cell_text`."""
    c = F.regexp_replace(c, _BLOCK_RE, " ")
    c = F.replace(c, F.lit("|"), F.lit(_MD_SENT_PIPE))
    c = F.regexp_replace(c, _WS + "+", " ")
    return F.trim(c)


def _md_pipe_row(r: Column) -> Column:
    return F.concat(F.lit("| "), F.array_join(r, " | "), F.lit(" |"))


def _md_render_table(body: Column, expand: bool) -> Column:
    """GFM pipe render of ONE table body: row 0 is the header (HTML
    convention, same stance as :func:`extract_tables`), then the
    ``---`` separator sized to the header, then the data rows —
    joined on single newlines (which :func:`_collapse_ws` preserves)
    inside a paragraph break. A rowless table degrades to the plain
    block break the r12 renderer emitted. The row grid is LET-bound
    (single-element transform) so the full row parse evaluates once
    per table — the raw expression is referenced four times (header
    get, slice, size twice) and interpreted HOFs get no CSE."""

    def render(rows: Column) -> Column:
        r0 = F.get(rows, 0)
        lines = F.concat(
            F.array(
                _md_pipe_row(r0),
                _md_pipe_row(F.transform(r0, lambda c: F.lit("---"))),
            ),
            F.transform(
                F.slice(rows, 2, F.greatest(F.size(rows), F.lit(1))),
                _md_pipe_row,
            ),
        )
        return F.when(
            F.size(rows) > 0,
            F.concat(
                F.lit("\n\n"), F.array_join(lines, "\n"), F.lit("\n\n")
            ),
        ).otherwise(F.lit("\n\n"))

    return F.get(
        F.transform(
            F.array(_table_rows(body, _md_cell_prep, expand)), render
        ),
        0,
    )


def _md_pipe_pre(col: Column, expand: bool) -> Column:
    """The pipe-table PRE-pass: replace every ``<table>`` element of
    the (invisible-stripped) document with its GFM pipe render, prose
    between tables untouched — split on the table pattern interleaves
    with the per-body renders (split piece i + render i, one trailing
    prose piece). Runs BEFORE the rewrite table so the block rule
    never flattens ``<tr>/<td>`` structure; the render's cells still
    carry their inline tags for the rules downstream. LET-bound
    single-element transform so the upstream chain evaluates once
    (the module's interpreted-HOF discipline). NULL html → NULL."""

    def pre(c: Column) -> Column:
        pieces = F.split(c, _TABLE_RE, -1)
        renders = F.transform(
            F.regexp_extract_all(c, F.lit(_TABLE_RE), F.lit(1)),
            lambda b: _md_render_table(b, expand),
        )
        return F.array_join(
            F.zip_with(
                pieces,
                F.concat(renders, F.array(F.lit(""))),
                lambda p, r: F.concat(p, r),
            ),
            "",
        )

    return F.get(F.transform(F.array(col), pre), 0)


def html_to_markdown(
    html: Column,
    escape: bool = False,
    pipe_tables: bool = False,
    expand_spans: bool = False,
) -> Column:
    """Markdown rendering of an HTML document — the representation
    modern pretraining corpora keep when structure matters (headings,
    lists, links, emphasis, code fences survive as text instead of
    vanishing like in :func:`html_to_text`).

    A fixed, ordered regex rewrite table (``_MD_RULES``) shared with
    the DuckDB replay: pre/code → fenced/inline code, h1–h6 → ``#``
    runs, strong/b/em/i → ``**``/``*`` marks, anchors → ``[text]
    (href)``, images → ``![](src)``, hr → ``---``, list items →
    ``- `` bullets (ordered lists too — no DOM, no counter),
    blockquote opens → one ``> `` (not per-line), other block tags →
    paragraph breaks; leftover tags strip, entities decode, whitespace
    collapses with paragraph breaks preserved.

    ``escape=True`` (r12): markdown metacharacters in the SOURCE text
    (``\\`` `` ` `` ``*`` ``_`` ``#`` ``[`` ``]`` — including ones
    materialized by entity decoding, ``&#42;`` → ``\\*``) are
    backslash-escaped so literal text can never corrupt the rendered
    structure, while generated marks ride ``\\x02`` sentinels through
    the escape pass and restore afterwards. CommonMark semantics keep
    code VERBATIM, so the escape pass skips fenced and inline code
    interiors (an index-aware split on the code sentinels — code
    bodies alternate with prose). Default off — the r11 render is
    unchanged.

    ``pipe_tables=True`` (r13): each ``<table>`` renders as GFM pipe
    rows (``| a | b |`` — header from row 0, ``---`` separator) via
    the :func:`extract_tables` grid machinery instead of flattening
    to paragraph text; cell-internal inline tags still render
    (``**bold**`` inside a cell), source pipes escape as ``\\|``,
    ``expand_spans`` composes (the colspan/rowspan grid feeds the
    render). Default off — table tags stay mere block breaks, the
    r12 render byte-identical.

    Documented no-DOM approximations: whitespace inside code fences
    collapses like any text (indentation is not preserved); nested
    same-name elements degrade at the first closing tag; with
    ``escape=False`` source metachars pass through unescaped. NULL
    html → NULL. Row-local, zero shuffle, scan-pipelined like every
    function in this module.
    """
    if not escape:
        col = _strip_invisible(html)
        if pipe_tables:
            col = _md_pipe_pre(col, expand_spans)
        for pat, repl in _MD_RULES:
            col = F.regexp_replace(col, pat, repl)
        col = F.regexp_replace(col, _ANY_TAG_RE, "")
        col = _decode_entities(col)
        col = _collapse_ws(col)
        if pipe_tables:
            col = F.replace(
                col, F.lit(_MD_SENT_PIPE), F.lit("\\|")
            )
        return col
    return md_escaped_from_sentinels(
        md_render_sentinels(
            html, pipe_tables=pipe_tables, expand_spans=expand_spans
        )
    )


def md_render_sentinels(
    html: Column,
    pipe_tables: bool = False,
    expand_spans: bool = False,
) -> Column:
    """The shared sentinel-marked render: invisible-strip → (r13,
    ``pipe_tables``) the pipe-table pre-pass → the escaped rewrite
    table → tag strip → entity decode, UNcollapsed and with generated
    marks still as ``\\x02`` sentinels. Both :func:`md_from_sentinels`
    (plain) and :func:`md_escaped_from_sentinels` derive from this
    one value — bind it behind a projection barrier when computing
    both renders (the ``html_parts`` discipline) so the ~30-regex
    chain runs once per document, not once per output column."""
    col = _strip_invisible(html)
    if pipe_tables:
        col = _md_pipe_pre(col, expand_spans)
    for pat, repl in _md_rules_escaped():
        col = F.regexp_replace(col, pat, repl)
    col = F.regexp_replace(col, _ANY_TAG_RE, "")
    return _decode_entities(col)


def md_from_sentinels(col: Column) -> Column:
    """Plain markdown from a :func:`md_render_sentinels` value —
    sentinel swap + collapse. Byte-identical to
    ``html_to_markdown(escape=False)`` (the emitted marks are inert
    to every later stage; pinned), modulo the module-wide ``\\x02``
    source-byte caveat."""
    for sent, mark in _MD_SENT_SWAPS + [
        (_MD_SENT_FENCE, "```"),
        (_MD_SENT_CODE, "`"),
    ]:
        col = F.replace(col, F.lit(sent), F.lit(mark))
    return _collapse_ws(col)


def md_escaped_from_sentinels(col: Column) -> Column:
    """Escaped markdown from a :func:`md_render_sentinels` value.

    Fence pieces alternate prose/code (one rule emits both fences of
    a block), so the render assembles PIECE-WISE: prose pieces get
    the metachar escape (inline-code sub-pieces verbatim via the same
    index-aware split), the sentinel swap, and the whitespace
    collapse; fenced CODE pieces keep their whitespace VERBATIM —
    indentation is semantic in code (CommonMark keeps fenced content
    untouched; the plain render's whole-document collapse flattens
    it, a documented r11 approximation this mode removes). Pieces
    join on paragraph breaks with empties dropped; inline code still
    collapses with its prose (spacing-accurate inline preservation
    would need boundary bookkeeping the signal doesn't warrant —
    documented)."""

    def esc(x: Column) -> Column:
        return F.regexp_replace(x, _MD_ESCAPE_RE, "\\\\$1")

    def esc_prose(piece: Column) -> Column:
        return F.array_join(
            F.transform(
                F.split(piece, _MD_SENT_CODE, -1),
                lambda x, i: F.when(i % 2 == 0, esc(x)).otherwise(x),
            ),
            "`",
        )

    def swaps(x: Column, with_code: bool) -> Column:
        pairs = list(_MD_SENT_SWAPS)
        if with_code:
            pairs.append((_MD_SENT_CODE, "`"))
        for sent, mark in pairs:
            x = F.replace(x, F.lit(sent), F.lit(mark))
        return x

    def prose(x: Column) -> Column:
        return _collapse_ws(swaps(esc_prose(x), False))

    def code(x: Column) -> Column:
        # the piece is "\nBODY\n" by construction (the fence rule's
        # replacement); a later rule may have planted sentinels
        # INSIDE the body (no-DOM degradation) — swap them, never
        # escape or collapse
        return F.concat(F.lit("```"), swaps(x, True), F.lit("```"))

    out = F.transform(
        F.split(col, _MD_SENT_FENCE, -1),
        lambda x, i: F.when(i % 2 == 0, prose(x)).otherwise(code(x)),
    )
    return F.array_join(
        F.filter(out, lambda x: F.length(x) > 0), "\n\n"
    )


def _md_pipe_pre_sql(e: str) -> str:
    """DuckDB replay of :func:`_md_pipe_pre` (``expand_spans=False``
    grids — the span expansion is engine-side only, like
    :func:`extract_tables_sql`): same split/interleave, same cell
    prep, same header/separator/row assembly, LET-bound through
    single-element ``list_transform``."""
    prep = (
        f"trim(regexp_replace(replace(regexp_replace(c, "
        f"'{_sq(_BLOCK_RE)}', ' ', 'g'), '|', chr(2)||'P'), "
        f"'{_sq(_WS)}+', ' ', 'g'))"
    )

    def tail(pieces: str) -> str:
        return f"list_slice({pieces}, 2, len({pieces}))"

    cell_pieces = f"str_split_regex(r, '{_sq(_CELL_SPLIT_RE)}')"
    row_pieces = f"str_split_regex(b, '{_sq(_TR_SPLIT_RE)}')"
    cells = f"list_transform({tail(cell_pieces)}, c -> {prep})"
    rows = (
        f"list_filter(list_transform({tail(row_pieces)}, "
        f"r -> {cells}), r -> len(r) > 0)"
    )
    hdr = "'| ' || array_to_string(rw[1], ' | ') || ' |'"
    sep = (
        "'| ' || array_to_string("
        "list_transform(rw[1], x -> '---'), ' | ') || ' |'"
    )
    tails = (
        "list_transform(list_slice(rw, 2, len(rw)), "
        "r2 -> '| ' || array_to_string(r2, ' | ') || ' |')"
    )
    table_txt = (
        f"CASE WHEN len(rw) > 0 THEN chr(10)||chr(10) || "
        f"array_to_string(list_concat([{hdr}, {sep}], {tails}), "
        f"chr(10)) || chr(10)||chr(10) "
        f"ELSE chr(10)||chr(10) END"
    )
    render = f"(list_transform([{rows}], rw -> {table_txt})[1])"
    pieces = f"str_split_regex(d, '{_sq(_TABLE_RE)}')"
    renders = (
        f"list_transform(regexp_extract_all(d, "
        f"'{_sq(_TABLE_RE)}', 1), b -> {render})"
    )
    merged = (
        f"array_to_string([ {pieces}[i] || "
        f"list_concat({renders}, [''])[i] "
        f"for i in range(1, len({pieces})+1) ], '')"
    )
    return f"(list_transform([{e}], d -> {merged})[1])"


def html_to_markdown_sql(
    expr: str, escape: bool = False, pipe_tables: bool = False
) -> str:
    """DuckDB replay of :func:`html_to_markdown` — same rewrite table
    (emitted, not copied), RE2 ``\\N`` group syntax; ``escape=True``
    mirrors the sentinel render + prose-only escape pass;
    ``pipe_tables=True`` prepends the pipe-table pre-pass
    (``expand_spans`` stays engine-side, as for
    :func:`extract_tables_sql`)."""
    e = f"regexp_replace({expr}, '{_sq(_INVISIBLE_RE)}', ' ', 'g')"
    if pipe_tables:
        e = _md_pipe_pre_sql(e)
    rules = _md_rules_escaped() if escape else _MD_RULES
    for pat, repl in rules:
        r = repl.replace("$", "\\")
        e = f"regexp_replace({e}, '{_sq(pat)}', '{_sq(r)}', 'g')"
    e = f"regexp_replace({e}, '{_sq(_ANY_TAG_RE)}', '', 'g')"
    e = _decode_entities_sql(e)
    if not escape:
        plain = _collapse_ws_sql(e)
        if pipe_tables:
            plain = f"replace({plain}, chr(2)||'P', '\\|')"
        return plain

    # escape mode: mirror the piece-wise assembly of
    # md_escaped_from_sentinels — prose pieces escape+swap+collapse,
    # fenced code pieces stay VERBATIM (swap only), empties drop,
    # paragraph-break join. LET-bind each split once; 1-based pieces:
    # odd = prose, even = code.
    def esc_sql(x: str) -> str:
        return (
            f"regexp_replace({x}, '{_sq(_MD_ESCAPE_RE)}', "
            f"'\\\\\\1', 'g')"
        )

    def swaps_sql(x: str, with_code: bool) -> str:
        pairs = list(_MD_SENT_SWAPS)
        if with_code:
            pairs.append((_MD_SENT_CODE, "`"))
        for sent, mark in pairs:
            x = f"replace({x}, chr(2)||'{sent[1]}', '{_sq(mark)}')"
        return x

    inner = (
        "array_to_string(list_transform("
        "generate_series(1, len(__ip__)), j -> "
        f"CASE WHEN j % 2 = 1 THEN {esc_sql('__ip__[j]')} "
        "ELSE __ip__[j] END), '`')"
    )
    esc_prose = (
        f"(list_transform([str_split(__fps__[i], chr(2)||'C')], "
        f"__ip__ -> {inner})[1])"
    )
    prose = _collapse_ws_sql(swaps_sql(esc_prose, False))
    code = f"'```' || {swaps_sql('__fps__[i]', True)} || '```'"
    assembled = (
        "coalesce(array_to_string(list_filter(list_transform("
        "generate_series(1, len(__fps__)), i -> "
        f"CASE WHEN i % 2 = 1 THEN {prose} ELSE {code} END), "
        "x -> length(x) > 0), chr(10)||chr(10)), '')"
    )
    # NULL html must stay NULL (DuckDB's array_to_string NULL quirks
    # cut both ways: empty list -> NULL needs the coalesce, NULL
    # input must bypass it)
    return (
        f"(list_transform([str_split({e}, chr(2)||'F')], __fps__ -> "
        f"CASE WHEN __fps__ IS NULL THEN NULL "
        f"ELSE {assembled} END)[1])"
    )
