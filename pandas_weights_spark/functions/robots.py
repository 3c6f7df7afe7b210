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
  evaluate with column patterns. A NON-trailing ``$`` is a literal
  octet (canonicalized to ``%24`` on both sides, matching Google's
  reference parser), so ``Disallow: /a$b`` blocks ``/a$b`` and
  ``Disallow: /p$$`` anchors on the literal path ``/p$``;
* **percent-encoding normalization** (RFC 9309 §2.2.2): both rule
  patterns and URL paths are rewritten to one canonical form before
  matching — every octet outside printable ASCII is ``%XX``-escaped
  (uppercase hex), pre-existing escapes are uppercased, and
  over-escaped printable ASCII is decoded — EXCEPT the reserved
  escapes ``%2F`` (an encoded ``/`` is distinct from a path slash,
  per the RFC), ``%25`` (would forge new escapes), and ``%2A``/
  ``%24`` (would inject ``*``/``$`` metacharacters into patterns).
  So ``Disallow: /caf%C3%A9`` matches the raw path ``/café`` and
  vice versa. Deviation, documented: a pattern ``%2A`` therefore
  matches a literal ``*`` in the path (both canonicalize to
  ``%2A``) but a pattern ``%41`` DOES match a literal ``A``;
* the most specific match wins: specificity is the OCTET length of
  the canonical pattern including its ``$`` anchor (the canonical
  form is pure ASCII, so octets == characters). This is the
  measured-on-the-escaped-pattern convention of Google's reference
  parser (github.com/google/robotstxt, robots.cc ``Matches``): an
  anchored ``Allow: /p$`` (3 octets) beats ``Disallow: /p`` (2) on
  path ``/p`` → allowed. ``Allow`` wins exact ties. An empty
  ``Disallow:`` value means unrestricted (the rule is dropped); a
  URL with no matching rule — or a host with no robots.txt — is
  allowed.

Non-rule directives: :func:`robots_directives` parses the
``crawl-delay`` (group-scoped, Bing/Yandex extension) and ``sitemap``
(host-scoped, sitemaps.org extension) lines (r10 — previously a
documented gap). Not implemented: a bare unescaped ``%`` that
is not followed by two hex digits passes through literally (Google's
parser does the same; RFC-invalid input).

Scale shape: robots tables are per-HOST (small next to a URL corpus,
but their cardinality grows with the crawl — tens of millions of
robots-bearing hosts at Common-Crawl scale). :func:`robots_allowed`
packs each host's rules into ONE array row (``collect_list`` over the
rules table only), joins that to the URL corpus on host, and resolves
the winning rule with a row-local ``filter``/``array_max`` HOF
arg-max. The join strategy defaults to ``'auto'`` (AQE broadcasts the
packed side when it actually fits, shuffled join above that — r10,
replacing r9's unconditional broadcast that would FAIL past Spark's
8 GB broadcast cap); ``strategy='broadcast'`` restores the zero-
URL-shuffle hint for rule tables known to be executor-small (r8 used
a per-URL ``row_number`` window keyed on
``monotonically_increasing_id``: correct and skew-free, but one full
exchange of the corpus this design deletes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "robots_rules",
    "robots_directives",
    "robots_allowed",
    "url_path",
    "canonical_path",
    "sitemap_entries",
    "sitemap_entries_sql",
]

# octets kept literal in the canonical form: printable ASCII…
_LO, _HI = 0x20, 0x7E
# …except these, which always stay %XX-escaped (RFC 9309 reserves
# %2F; %25 would forge escapes; %2A/%24 would inject metacharacters)
_KEEP_ESCAPED = (0x2F, 0x25, 0x2A, 0x24)


def _canon(col: Column, keep_star: bool) -> Column:
    """Canonical percent-encoding of ``col`` (RFC 9309 §2.2.2
    normalization): UTF-8 octets outside printable ASCII become
    uppercase ``%XX``; existing ``%XX`` escapes are uppercased;
    over-escaped printable ASCII is decoded back to the literal char
    except the reserved set. With ``keep_star`` (pattern side) the
    raw ``*`` metacharacter stays functional; on the path side it is
    escaped so a pattern's ``%2A`` matches a path's literal ``*``.
    A raw ``$`` is escaped on BOTH sides — the only functional ``$``
    is the trailing anchor, which :func:`robots_rules` strips BEFORE
    canonicalizing, so a mid-pattern ``$`` (``Disallow: /a$b``) is a
    literal octet exactly as in Google's reference parser (r10 fix:
    previously the pattern side kept ``$`` raw and the rule failed
    OPEN). Pure Column algebra — hex the UTF-8 bytes, re-emit octet
    by octet, then normalize escape triples with one split+transform.
    """
    # pass 1 — byte-level escape: hex() is uppercase, 2 chars/octet
    pairs = F.regexp_extract_all(
        F.hex(F.encode(col, "UTF-8")), F.lit("(..)"), 1
    )

    def emit(p: Column) -> Column:
        b = F.conv(p, 16, 10).cast("int")
        literal = (b >= _LO) & (b <= _HI) & (b != 0x24)
        if keep_star:  # pattern side: * stays functional
            keep = literal
        else:  # path side: literal * gets escaped too
            keep = literal & (b != 0x2A)
        return F.when(keep, F.char(b)).otherwise(
            F.concat(F.lit("%"), p)
        )

    enc = F.array_join(F.transform(pairs, emit), "")

    # pass 2 — normalize pre-existing %XX escape triples: uppercase
    # the hex; decode over-escaped printable ASCII except reserved
    pieces = F.split(enc, r"(?=%)")

    def fix(piece: Column) -> Column:
        is_esc = piece.rlike("^%[0-9A-Fa-f]{2}")
        hx = F.upper(F.substring(piece, 2, 2))
        b = F.conv(hx, 16, 10).cast("int")
        rest = F.substr(piece, F.lit(4))
        decodable = (b >= _LO) & (b <= _HI)
        for k in _KEEP_ESCAPED:
            decodable = decodable & (b != k)
        return (
            F.when(~is_esc, piece)
            .when(decodable, F.concat(F.char(b), rest))
            .otherwise(F.concat(F.lit("%"), hx, rest))
        )

    return F.array_join(F.transform(pieces, fix), "")


def canonical_path(path: Column) -> Column:
    """Public alias: canonical percent-encoded form of a URL path
    (the form :func:`robots_allowed` matches on)."""
    return _canon(path, keep_star=False)


def _like_pattern(canon_body: Column, anchored: Column) -> Column:
    """Canonical RFC 9309 pattern body (``$`` already stripped) →
    SQL LIKE pattern: escape ``\\ % _``, ``*`` → ``%``, and append a
    trailing ``%`` unless anchored."""
    p = F.replace(canon_body, F.lit("\\"), F.lit("\\\\"))
    p = F.replace(p, F.lit("%"), F.lit("\\%"))
    p = F.replace(p, F.lit("_"), F.lit("\\_"))
    p = F.replace(p, F.lit("*"), F.lit("%"))
    return F.when(anchored, p).otherwise(F.concat(p, F.lit("%")))


def _classified_lines(
    robots: DataFrame, host_col: str, txt_col: str, agent: str
) -> DataFrame:
    """Shared parse stage: robots.txt bodies → one row per line with
    ``(host, pos, k, v)`` plus the RFC 9309 §2.2.1 group flags
    (``g_exact``/``g_star``/``h_exact`` — the group-selection inputs
    for ``agent``). Used by :func:`robots_rules` (allow/disallow) and
    :func:`robots_directives` (crawl-delay/sitemap)."""
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
    return grouped.withColumn(
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


def _group_selected() -> Column:
    """RFC 9309 group selection predicate over the flagged line frame:
    exact-token groups when the host has any, else the ``*`` groups."""
    return (F.col("g_exact") == 1) | (
        (F.col("h_exact") == 0) & (F.col("g_star") == 1)
    )


def robots_rules(
    robots: DataFrame,
    host_col: str,
    txt_col: str,
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into the effective rule table for
    ``agent``: ``(host, allow boolean, path, pattern, spec)`` where
    ``pattern`` is the LIKE translation of the canonical
    percent-normalized pattern and ``spec`` the specificity — the
    octet length of the canonical pattern INCLUDING its ``$`` anchor
    (RFC 9309 longest-match, measured on the normalized-escaped
    pattern as Google's reference parser does). Only the groups
    selected for ``agent`` survive (exact token groups if any exist
    on that host, else the ``*`` groups)."""
    flagged = _classified_lines(robots, host_col, txt_col, agent)
    rules = flagged.where(
        F.col("k").isin("allow", "disallow")
        & (F.length("v") > 0)
        & _group_selected()
    )
    anchored = F.col("v").endswith("$")
    body = F.when(
        anchored, F.expr("substring(v, 1, length(v) - 1)")
    ).otherwise(F.col("v"))
    canon = _canon(body, keep_star=True)
    # spec: canonical pattern octets, counting the stripped anchor —
    # canonical form is pure ASCII so octet_length == length
    spec = (
        F.octet_length(canon) + anchored.cast("int")
    ).cast("long")
    return rules.select(
        "host",
        (F.col("k") == "allow").alias("allow"),
        F.col("v").alias("path"),
        _like_pattern(canon, anchored).alias("pattern"),
        spec.alias("spec"),
    )


def robots_directives(
    robots: DataFrame,
    host_col: str,
    txt_col: str,
    agent: str = "*",
) -> DataFrame:
    """The non-rule directives of robots.txt (r10 — previously a
    documented gap): returns one row per input host with

    * ``crawl_delay`` — the minimum valid ``Crawl-delay:`` seconds of
      the groups SELECTED for ``agent`` (same RFC 9309 §2.2.1 group
      selection as :func:`robots_rules`; the directive is the Bing/
      Yandex extension — Google ignores it — and min-across-groups is
      the conservative politeness choice); non-numeric or negative
      values are ignored; NULL when absent;
    * ``sitemaps`` — ALL ``Sitemap:`` URLs of the host, sorted (the
      sitemaps.org extension is independent of user-agent groups per
      its spec, so no group filter applies).

    Same scale shape as the rule parse: explode → windows → one
    host-keyed aggregate of the tiny per-host line set."""
    flagged = _classified_lines(robots, host_col, txt_col, agent)
    dval = F.col("v").try_cast("double")
    delay = F.when(
        (F.col("k") == "crawl-delay")
        & _group_selected()
        & (dval >= 0),
        dval,
    )
    sitemap = F.when(
        (F.col("k") == "sitemap") & (F.length("v") > 0), F.col("v")
    )
    return flagged.groupBy("host").agg(
        F.min(delay).alias("crawl_delay"),
        F.array_sort(
            F.collect_list(sitemap)
        ).alias("sitemaps"),
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
    strategy: str = "auto",
    statuses: "DataFrame | None" = None,
) -> DataFrame:
    """Adds ``allowed`` (boolean) per URL row: the most specific
    matching rule of the url's host decides (longest canonical
    pattern; Allow wins ties); no matching rule or no rules for the
    host → allowed. ``rules`` is the output of :func:`robots_rules`.

    ``statuses`` (r10, optional) — a per-host ``(host, status)``
    frame carrying the HTTP status of the robots.txt FETCH, applying
    RFC 9309 §2.3.1 unreachability semantics: a 4xx status means "no
    robots.txt" → the whole host is ALLOWED regardless of any (stale)
    rules; 5xx means "temporarily unreachable" → the whole host is
    DISALLOWED (the MUST-assume-complete-disallow rule); any other
    status, or a host absent from ``statuses``, decides by rules as
    usual. The status frame is host-cardinality like the rule table
    and joins under the same ``strategy``.

    Scale shape: the per-host rule table packs to one array row per
    host (``collect_list`` over the tiny rules side only) and joins
    to the URL corpus on host; the winner is a row-local ``filter``
    + ``array_max`` over structs ordered ``(spec, allow)`` — Spark's
    struct ordering is lexicographic and ``true > false``, which IS
    the RFC tiebreak.  ``strategy`` picks the join physical shape
    (decisions are identical under all three):

    * ``'auto'`` (default) — no hint; AQE measures the packed rules
      side at runtime and broadcasts it when it fits (the common
      case: ≲ a few million hosts), else falls back to a shuffled
      join.  This is the only strategy that SURVIVES web-crawl host
      cardinality: at tens of millions of robots-bearing hosts ×
      ~0.5–2 KB of packed rule structs the table is tens of GB —
      over Spark's 8 GB broadcast hard cap and every executor's
      memory, so a forced broadcast FAILS rather than slows.
    * ``'broadcast'`` — force the broadcast hint: zero shuffle of
      the URL corpus, for rule tables known to be executor-small.
    * ``'shuffle'`` — force a shuffled hash join (both sides
      exchange on host), for rule tables known to be broadcast-
      infeasible."""
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            "strategy must be 'auto', 'broadcast' or 'shuffle', got "
            f"{strategy!r}"
        )
    packed = rules.groupBy("host").agg(
        F.collect_list(
            F.struct("spec", "allow", "pattern")
        ).alias("__rules__")
    )
    if statuses is not None:
        st = statuses.select(
            F.col("host"), F.col("status").alias("__st__")
        )
        # host-keyed outer merge of the two tiny per-host frames, so
        # the URL corpus still sees ONE probe-side join
        packed = packed.join(st, "host", "full_outer")
    packed = packed.withColumnRenamed("host", "__rh__")
    if strategy == "broadcast":
        packed = F.broadcast(packed)
    elif strategy == "shuffle":
        packed = packed.hint("shuffle_hash")
    base = urls.withColumn(
        "__path__", _canon(url_path(F.col(url_col)), keep_star=False)
    )
    joined = base.join(
        packed,
        F.col(host_col) == F.col("__rh__"),
        "left",
    )
    matching = F.filter(
        F.col("__rules__"),
        lambda r: F.like(
            F.col("__path__"), r["pattern"], F.lit("\\")
        ),
    )
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                r["spec"].alias("spec"), r["allow"].alias("allow")
            ),
        )
    )
    by_rules = F.coalesce(best["allow"], F.lit(True))
    if statuses is not None:
        st = F.col("__st__")
        decision = (
            F.when((st >= 500) & (st <= 599), F.lit(False))
            .when((st >= 400) & (st <= 499), F.lit(True))
            .otherwise(by_rules)
        )
    else:
        decision = by_rules
    out = joined.withColumn("allowed", decision)
    return out.select(*urls.columns, "allowed")


# ---------------------------------------------------------------------
# sitemaps.org XML parsing (the discovery side of the politeness gate)
# ---------------------------------------------------------------------

_SM_WS = r"[ \t\n\r\f]"
#: a <url>/<sitemap> entry block (word boundary keeps <url> from
#: matching <urlset>); group 1 = inner body
_SM_URL_RE = "(?is)<url\\b[^>]*>([^\\x00]*?)</url" + _SM_WS + "*>"
_SM_SMAP_RE = (
    "(?is)<sitemap\\b[^>]*>([^\\x00]*?)</sitemap" + _SM_WS + "*>"
)
#: leading W3C datetime date (sitemaps.org allows date-only lastmod)
_SM_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}"
#: XML's five predefined entities — decode &amp; LAST so escaped
#: refs in a loc (&amp;lt;) stay literal, the html-module convention
_SM_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _sm_plain_pat(tag: str) -> str:
    return f"(?is)<{tag}{_SM_WS}*>{_SM_WS}*([^<]*?){_SM_WS}*</{tag}"


def _sm_cdata_pat(tag: str) -> str:
    # a value that is a single CDATA section: real-world sitemaps
    # (notably Google News) wrap <loc> in <![CDATA[...]]>; content is
    # verbatim per XML (entity refs inside CDATA are LITERAL text),
    # whitespace-trimmed at the brackets like the plain form
    return (
        f"(?is)<{tag}{_SM_WS}*>{_SM_WS}*<!\\[CDATA\\[{_SM_WS}*"
        f"([^\\x00]*?){_SM_WS}*\\]\\]>{_SM_WS}*</{tag}"
    )


def _sm_field(body: Column, tag: str, decode: bool = False) -> Column:
    """Extract ``<tag>``'s value from an entry body. A value wrapped
    in one ``<![CDATA[...]]>`` section is unwrapped VERBATIM (XML:
    CDATA content is never entity-decoded); a plain value is
    entity-decoded only when ``decode=True`` (the loc field)."""
    cdata = F.regexp_extract(body, _sm_cdata_pat(tag), 1)
    plain = F.regexp_extract(body, _sm_plain_pat(tag), 1)
    if decode:
        plain = _sm_decode(plain)
    return F.when(cdata != F.lit(""), cdata).otherwise(plain)


def _sm_decode(col: Column) -> Column:
    for src, dst in _SM_ENTITIES:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def sitemap_entries(xml: Column) -> Column:
    """Parse a sitemaps.org document (public protocol,
    sitemaps.org/protocol.html) — the crawl-frontier discovery step
    that pairs with :func:`robots_directives`'s ``Sitemap:`` URLs:
    ``array<struct<kind, loc, lastmod_raw, lastmod_date, changefreq,
    priority>>``, one element per ``<url>`` entry (``kind='url'``,
    a ``<urlset>`` leaf) or ``<sitemap>`` entry (``kind='sitemap'``,
    a ``<sitemapindex>`` pointer to fetch next), in document order
    WITHIN each kind (all url entries first, then all sitemap
    entries — a document mixing both kinds concatenates the two
    runs, not the interleaving).

    Per entry: ``loc`` (required — entries with an empty loc drop)
    with XML's five predefined entities decoded (``&amp;`` last, so
    escaped refs stay literal); a field value wrapped in a single
    ``<![CDATA[...]]>`` section (the Google-News-style loc wrapper)
    is unwrapped VERBATIM — CDATA content is never entity-decoded,
    per XML; ``lastmod_raw`` verbatim and
    ``lastmod_date`` as a DATE from the leading W3C-datetime date
    (regex gate + 10-char slice + try-parse — the
    ``extract_meta`` discipline: an invalid gated date yields NULL,
    never an ANSI error killing a 100 TB scan); ``changefreq``
    lowercased; ``priority`` as a DOUBLE when it parses as a plain
    decimal, NULL otherwise. Missing optional fields are empty
    string / NULL.

    Row-local regex + HOF Column algebra — zero shuffle, scan
    pipelined, RE2-safe (``sitemap_entries_sql`` is the DuckDB
    twin). No-DOM caveats (the html-module stance): only a value
    that IS one whole CDATA section unwraps (mixed text+CDATA
    values don't), and a ``<url>`` entry inside a comment still
    parses. NULL xml → NULL.
    """

    def entry(kind: str):
        def mk(b: Column) -> Column:
            lastmod = _sm_field(b, "lastmod")
            prio = _sm_field(b, "priority")
            return F.struct(
                F.lit(kind).alias("kind"),
                _sm_field(b, "loc", decode=True).alias("loc"),
                lastmod.alias("lastmod_raw"),
                F.when(
                    lastmod.rlike(_SM_DATE_RE),
                    F.try_to_timestamp(
                        F.substring(lastmod, 1, 10),
                        F.lit("yyyy-MM-dd"),
                    ).cast("date"),
                ).alias("lastmod_date"),
                F.lower(_sm_field(b, "changefreq")).alias(
                    "changefreq"
                ),
                F.when(
                    prio.rlike(r"^[0-9]+(\.[0-9]+)?$"),
                    prio.cast("double"),
                ).alias("priority"),
            )

        return mk

    urls = F.transform(
        F.regexp_extract_all(xml, F.lit(_SM_URL_RE), F.lit(1)),
        entry("url"),
    )
    smaps = F.transform(
        F.regexp_extract_all(xml, F.lit(_SM_SMAP_RE), F.lit(1)),
        entry("sitemap"),
    )
    return F.filter(
        F.concat(urls, smaps), lambda e: F.length(e["loc"]) > 0
    )


def sitemap_entries_sql(expr: str) -> str:
    """DuckDB replay of :func:`sitemap_entries` — same pattern
    constants (emitted, not copied), RE2 dialect, same field order
    and gates."""

    def sq(s: str) -> str:
        return s.replace("'", "''")

    def field(tag: str, decode: bool = False) -> str:
        cdata = f"regexp_extract(b, '{sq(_sm_cdata_pat(tag))}', 1)"
        plain = f"regexp_extract(b, '{sq(_sm_plain_pat(tag))}', 1)"
        if decode:
            for src, dst in _SM_ENTITIES:
                plain = f"replace({plain}, '{sq(src)}', '{sq(dst)}')"
        # LET-bind the cdata extract so it runs once (the engine-side
        # when/otherwise twin)
        return (
            f"(list_transform([{cdata}], c -> "
            f"CASE WHEN c <> '' THEN c ELSE {plain} END)[1])"
        )

    loc = field("loc", decode=True)
    lastmod = field("lastmod")
    prio = field("priority")
    def entry(kind: str) -> str:
        return (
            "struct_pack("
            f"kind := '{kind}', "
            f"loc := {loc}, "
            f"lastmod_raw := {lastmod}, "
            f"lastmod_date := CASE WHEN regexp_matches({lastmod}, "
            f"'{sq(_SM_DATE_RE)}') THEN TRY_CAST(substr({lastmod}, 1, 10)"
            f" AS DATE) END, "
            f"changefreq := lower({field('changefreq')}), "
            f"priority := CASE WHEN regexp_matches({prio}, "
            f"'^[0-9]+(\\.[0-9]+)?$') THEN CAST({prio} AS DOUBLE) END"
            ")"
        )

    urls = (
        f"list_transform(regexp_extract_all({expr}, "
        f"'{sq(_SM_URL_RE)}', 1), b -> {entry('url')})"
    )
    smaps = (
        f"list_transform(regexp_extract_all({expr}, "
        f"'{sq(_SM_SMAP_RE)}', 1), "
        f"b -> {entry('sitemap')})"
    )
    return (
        f"list_filter(list_concat({urls}, {smaps}), "
        f"e -> length(e.loc) > 0)"
    )
