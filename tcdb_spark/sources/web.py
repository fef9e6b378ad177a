r"""Web-corpus ingestion: HTML -> text extraction and link harvesting.

The first stage of every Common-Crawl-style pretraining pipeline
(C4, RefinedWeb, Gopher's MassiveWeb) is turning raw HTML into clean
text plus a link graph.  The container has no bs4/lxml/trafilatura, and
none is needed for the structural part: ``html.parser`` (stdlib) is a
real, spec-compliant tokenizer — rawtext elements (``<script>``,
``<style>``) are handled via its CDATA mode, character/entity
references are decoded by ``convert_charrefs``, and attribute quoting
is parsed for us.  What this module adds is the EXTRACTION CONTRACT:
which elements are dropped, where block boundaries fall, and how
whitespace collapses — pinned precisely so a DuckDB oracle can compute
the expected output of a round-trip (compose HTML from known text in
SQL, extract here, compare bit-exact; see plans/queries_web.py).

Reference-anchor: extends SURVEY.md §2.12 (LLM-pipeline text ops); the
reference engine has no web surface, so this is a from-scratch design.

Scale shape: extraction is embarrassingly parallel — one Arrow-batched
``mapInPandas`` over (id, html) with ZERO shuffles; at 100 TB the cost
is pure per-row CPU and the operator chain keeps filters/pruning ahead
of it (select only the two columns in).  Parsing is bounded per
document; a malformed document degrades to text-ish output, never to
an exception (the parser is non-raising by design, and we additionally
hard-cap via ``max_html_bytes`` so a pathological multi-GB row cannot
stall a task).

Extraction contract (the part tests and oracles pin):

- content inside ``script``, ``style``, ``noscript``, ``template``,
  ``iframe``, ``svg`` contributes nothing;
- HTML comments and processing instructions contribute nothing;
- ``<title>`` text is captured separately and excluded from the body;
- a BLOCK boundary falls at the start and end tags of the usual
  block-level elements (``p div h1-h6 li ul ol nav header footer
  section article aside main table thead tbody tr td th blockquote
  pre figure figcaption dl dt dd form fieldset hr br``); inline
  elements (``a b i em strong span code small sub sup u s``) do NOT
  break blocks;
- within a block, text-node content is concatenated, runs of ASCII
  whitespace collapse to one space, and the block is trimmed; empty
  blocks are dropped;
- the body is the non-empty blocks joined by ``\n``;
- links are every ``<a href=...>`` in document order with the
  whitespace-collapsed anchor text (anchor text still appears in the
  body — link capture does not consume it).

ASCII-whitespace note: collapsing uses ``[ \t\r\n\x0b\x0c]+`` — NOT
``\s`` — because Python's ``\s`` is Unicode-aware (it would eat U+00A0
from ``&nbsp;``) while RE2 (DuckDB) ``\s`` is ASCII-only; pinning the
explicit ASCII class keeps both engines' mirror expressions equivalent.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = re.compile(r"[ \t\r\n\x0b\x0c]+")

# content-free elements: everything between the start and end tag is dropped
_SKIP = {"script", "style", "noscript", "template", "iframe", "svg"}

# boilerplate containers: content inside them is still extracted (it IS
# page text) but every block carries an in-container flag so a
# boilerplate filter can drop chrome without a second parse
_BOILER = {"nav", "header", "footer", "aside"}

_BLOCK = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "nav", "header", "footer", "section", "article", "aside", "main",
    "table", "thead", "tbody", "tr", "td", "th", "blockquote", "pre",
    "figure", "figcaption", "dl", "dt", "dd", "form", "fieldset",
    "hr", "br", "html", "body",
}


class HtmlTextExtractor(HTMLParser):
    """Streaming extractor implementing the module-level contract.

    One instance per document (the parser keeps rawtext/CDATA state).
    ``convert_charrefs=True`` (the default) folds ``&amp;`` /
    ``&#8212;`` / ``&#x2014;`` into the data callbacks, so entity
    decoding needs no code here.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._in_title = False
        self._buf: list[str] = []
        self._title_buf: list[str] = []
        self._anchor_buf: list[str] | None = None
        self._anchor_href: str | None = None
        self._tag_stack: list[str] = []
        self._boiler_depth = 0
        self._buf_links = 0
        self._buf_link_chars = 0
        self.blocks: list[str] = []
        self.links: list[tuple[str, str]] = []  # (href, anchor_text)
        # (tag, text, n_links, link_chars, in_boiler_container) — the
        # block-classification view (boilerplate filtering); text here
        # is the same collapsed text that joins into the body
        self.blocks_meta: list[tuple[str, str, int, int, bool]] = []

    # -- block plumbing ------------------------------------------------
    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._buf)).strip()
        self._buf = []
        n_links, link_chars = self._buf_links, self._buf_link_chars
        self._buf_links = 0
        self._buf_link_chars = 0
        if text:
            self.blocks.append(text)
            self.blocks_meta.append(
                (
                    self._tag_stack[-1] if self._tag_stack else "",
                    text,
                    n_links,
                    link_chars,
                    self._boiler_depth > 0,
                )
            )

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            href = next((v for k, v in attrs if k == "href"), None)
            if href is not None:
                # a nested/unclosed <a> just restarts capture
                self._anchor_href = href
                self._anchor_buf = []
        if tag in _BLOCK:
            self._flush()
            if tag not in ("br", "hr"):
                self._tag_stack.append(tag)
            if tag in _BOILER:
                self._boiler_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/>, <hr/> — void block boundaries; <img/> etc: no-op
        if self._skip_depth:
            return
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            # tolerate stray closers: never go negative
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a" and self._anchor_buf is not None:
            anchor = _WS.sub(" ", "".join(self._anchor_buf)).strip()
            self.links.append((self._anchor_href or "", anchor))
            self._buf_links += 1
            self._buf_link_chars += len(anchor)
            self._anchor_buf = None
            self._anchor_href = None
        if tag in _BLOCK:
            self._flush()
            if self._tag_stack and self._tag_stack[-1] == tag:
                self._tag_stack.pop()
            if tag in _BOILER:
                self._boiler_depth = max(0, self._boiler_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self._title_buf.append(data)
            return
        self._buf.append(data)
        if self._anchor_buf is not None:
            self._anchor_buf.append(data)

    # comments / PIs / declarations: contribute nothing (default no-ops
    # would also ignore them; explicit for the contract's sake)
    def handle_comment(self, data: str) -> None:  # pragma: no cover
        pass

    # -- results ---------------------------------------------------------
    def result(self) -> tuple[str, str, list[tuple[str, str]]]:
        self._flush()
        title = _WS.sub(" ", "".join(self._title_buf)).strip()
        return title, "\n".join(self.blocks), self.links


def extract_text(html: str) -> tuple[str, str, list[tuple[str, str]]]:
    """Parse one HTML document -> (title, body, links).

    Never raises on malformed input: html.parser recovers from bad
    nesting, unquoted attributes, and stray ``<``; a hard parser error
    (CPython raises only on some truncated-charref edge cases) degrades
    to whatever was extracted before the error point.
    """
    p = HtmlTextExtractor()
    try:
        p.feed(html)
        if p.rawdata.startswith("<"):
            # an UNTERMINATED trailing tag is still buffered (truncated
            # document); close() would flush its source text as data —
            # markup junk, not content.  Dropping the buffer loses only
            # that tag; a pending '&...' or plain-text tail is kept for
            # close() to emit normally.
            p.rawdata = ""
        p.close()
    except Exception:
        pass
    return p.result()


HTML_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_links", T.IntegerType()),
        T.StructField("html_chars", T.IntegerType()),
        T.StructField("text_chars", T.IntegerType()),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("href", T.StringType()),
        T.StructField("anchor", T.StringType()),
        T.StructField("pos", T.IntegerType()),
    ]
)


def html_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_html_bytes: int = 16 << 20,
) -> DataFrame:
    """(id, html) -> one row per document with title/body/structure stats.

    One Arrow stage, zero shuffles; oversized documents are truncated at
    ``max_html_bytes`` CHARACTERS (code points — the string is already
    decoded by the time it reaches the operator, so this is a char cap;
    for ASCII-dominated HTML chars ~ bytes).  Truncation can only lose
    trailing content — the parser tolerates the cut mid-tag — so a
    single pathological row cannot stall a task at scale.
    """

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                h = h or ""
                if len(h) > max_html_bytes:
                    h = h[:max_html_bytes]
                title, body, links = extract_text(h)
                rows.append(
                    (
                        did,
                        title,
                        body,
                        body.count("\n") + 1 if body else 0,
                        len(links),
                        len(h),
                        len(body),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in HTML_EXTRACT_SCHEMA])

    return df.select(id_col, html_col).mapInPandas(_op, schema=HTML_EXTRACT_SCHEMA)


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_links", T.IntegerType()),
        T.StructField("link_chars", T.IntegerType()),
        T.StructField("in_boiler", T.BooleanType()),
    ]
)


def html_blocks(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, html) -> one row per non-empty text block with the
    classification signals a boilerplate filter needs: the opening
    block tag, document-order position, link count, anchor-text chars
    (link density = link_chars/length(text)), and whether the block
    sits inside a nav/header/footer/aside container.  Same zero-shuffle
    Arrow shape as :func:`html_extract`; the body equals the kept
    blocks joined by newline, so filters stay consistent with it."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                p = HtmlTextExtractor()
                try:
                    p.feed(h or "")
                    if p.rawdata.startswith("<"):
                        p.rawdata = ""
                    p.close()
                except Exception:
                    pass
                p._flush()
                rows.extend(
                    (did, i, tag, text, nl, lc, boiler)
                    for i, (tag, text, nl, lc, boiler) in enumerate(p.blocks_meta)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA])

    return df.select(id_col, html_col).mapInPandas(_op, schema=BLOCKS_SCHEMA)


def html_links(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, html) -> one row per ``<a href>`` in document order.

    ``pos`` is the 0-based position within the document, so downstream
    consumers have a deterministic ordering without re-parsing.
    Same zero-shuffle Arrow shape as :func:`html_extract`.
    """

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                _, _, links = extract_text(h or "")
                rows.extend(
                    (did, href, anchor, i) for i, (href, anchor) in enumerate(links)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in LINKS_SCHEMA])

    return df.select(id_col, html_col).mapInPandas(_op, schema=LINKS_SCHEMA)


# ---------------------------------------------------------------------------
# URL canonicalization — fully JVM-native (whole-stage codegen), no Python.
# ---------------------------------------------------------------------------

# tracking params dropped by canonicalization (exact keys; utm_* by prefix)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "sessionid")

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_normalize(url) -> "F.Column":
    """Canonicalize a URL column with native expressions only.

    Rules (each mirrored 1:1 in SQL by :func:`url_normalize_sql`):
      scheme and host lowercased; a leading ``www.`` stripped from the
      host; default ports dropped (``:80`` for http, ``:443`` for
      https); the fragment dropped; query params with tracking keys
      (``utm_*`` prefix + TRACKING_PARAMS) dropped; surviving params
      sorted bytewise; an empty path rendered as ``/``.

    Built from regexp groups rather than ``parse_url`` deliberately:
    ``parse_url`` rides java.net.URI, whose failure modes (nulls on
    chars URI dislikes) have no DuckDB twin, and the oracle must
    compute the IDENTICAL algebra.  Everything here is regexp_extract /
    split / filter / array_sort — whole-stage-codegen territory, and
    the same regex runs verbatim under RE2 on the DuckDB side.
    """
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    authority = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host_p = F.regexp_replace(authority, r"^www\.", "")
    host = F.when(
        ((scheme == "http") & host_p.endswith(":80"))
        | ((scheme == "https") & host_p.endswith(":443")),
        F.regexp_replace(host_p, r":(80|443)$", ""),
    ).otherwise(host_p)
    path = F.regexp_extract(url, _URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _URL_RE, 4)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.split(p, "=")[0].startswith("utm_")
            & ~F.split(p, "=")[0].isin(*TRACKING_PARAMS),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_normalize_sql(expr: str) -> str:
    """The DuckDB mirror of :func:`url_normalize` over SQL expression
    ``expr`` — same regex, same param algebra, same rendering."""
    tracking = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    u = f"({expr})"
    scheme = f"lower(regexp_extract({u}, '{_URL_RE}', 1))"
    auth = f"lower(regexp_extract({u}, '{_URL_RE}', 2))"
    host_p = f"regexp_replace({auth}, '^www\\.', '')"
    host = (
        f"CASE WHEN ({scheme} = 'http' AND {host_p} LIKE '%:80')"
        f"       OR ({scheme} = 'https' AND {host_p} LIKE '%:443')"
        f"     THEN regexp_replace({host_p}, ':(80|443)$', '')"
        f"     ELSE {host_p} END"
    )
    path = f"CASE WHEN regexp_extract({u}, '{_URL_RE}', 3) = '' THEN '/' ELSE regexp_extract({u}, '{_URL_RE}', 3) END"
    query = f"regexp_extract({u}, '{_URL_RE}', 4)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(string_split(p, '=')[1], 'utm_') "
        f"AND NOT list_contains([{tracking}], string_split(p, '=')[1])))"
    )
    # DuckDB's array_to_string([]) is NULL (Spark's array_join is '');
    # coalesce keeps the concat from going NULL on param-free URLs
    qs = f"coalesce(array_to_string({kept}, '&'), '')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END"
    )


def registrable_host(host) -> "F.Column":
    """Registrable-domain heuristic: last two labels, or last three when
    the second-to-last is a common ccSLD (``co|com|org|net|ac|gov``
    under a 2-letter cc-TLD) — ``a.b.example.co.uk`` -> ``example.co.uk``.
    Native split/slice only; SQL twin in :func:`registrable_host_sql`."""
    host = F.col(host) if isinstance(host, str) else host
    parts = F.split(host, r"\.")
    n = F.size(parts)
    cc_sld = (
        F.element_at(parts, -2).isin("co", "com", "org", "net", "ac", "gov")
        & (F.length(F.element_at(parts, -1)) == 2)
        & (n >= 3)
    )
    return F.when(n <= 2, host).otherwise(
        F.array_join(F.slice(parts, n - F.when(cc_sld, 2).otherwise(1), 3), ".")
    )


def registrable_host_sql(expr: str) -> str:
    h = f"({expr})"
    parts = f"string_split({h}, '.')"
    n = f"len({parts})"
    cc = (
        f"(list_contains(['co','com','org','net','ac','gov'], {parts}[-2]) "
        f"AND length({parts}[-1]) = 2 AND {n} >= 3)"
    )
    return (
        f"CASE WHEN {n} <= 2 THEN {h} "
        f"WHEN {cc} THEN array_to_string({parts}[-3:], '.') "
        f"ELSE array_to_string({parts}[-2:], '.') END"
    )


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) and sitemap XML — the crawl-policy inputs.
# ---------------------------------------------------------------------------


def parse_robots(content: str, user_agent: str = "*") -> list[tuple[str, bool]]:
    """Parse robots.txt into [(path_prefix, allowed)] rules for the
    given user-agent group (falling back to the ``*`` group), RFC 9309
    subset: literal path prefixes, case-sensitive, blank Disallow means
    allow-all.  Wildcards are NOT interpreted (a ``*``/``$`` rule is
    kept as a literal and therefore matches nothing — documented
    conservative behavior; extend at the marked seam if needed).

    Python's stdlib ``urllib.robotparser`` is deliberately NOT used:
    its first-match-in-file-order semantics predate RFC 9309's
    longest-match rule and cannot be mirrored in a SQL oracle."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    seen_rule = True
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule:
                current = []
                seen_rule = False
            current.append(val.lower())
            for ua in current:
                groups.setdefault(ua, [])
        elif key in ("allow", "disallow"):
            seen_rule = True
            if not val and key == "disallow":
                continue  # blank Disallow: allow all (no rule)
            for ua in current:
                groups.setdefault(ua, []).append((val, key == "allow"))
    return groups.get(user_agent.lower(), groups.get("*", []))


def robots_decision(rules: list[tuple[str, bool]], path: str) -> bool:
    """RFC 9309 longest-match: the matching rule with the longest
    prefix wins; ties prefer Allow; no match -> allowed."""
    best_len, allowed = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix) and len(prefix) >= best_len:
            if len(prefix) > best_len:
                best_len, allowed = len(prefix), allow
            elif allow:  # tie: Allow wins
                allowed = True
    return allowed


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "canonical_url",
    host_col_robots: str = "host",
    content_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Append ``allowed`` to a URL frame by that host's robots.txt.

    The robots side is one small row per host — parsed once per host
    (not per URL) inside an Arrow stage, then BROADCAST and equi-joined
    on host; hosts with no robots row are allowed (RFC 9309 absence
    semantics).  The per-URL work is pure prefix matching."""

    def _parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, content in zip(pdf[host_col_robots], pdf[content_col]):
                rules = parse_robots(content or "", user_agent)
                rows.append((host, [list((p, a)) for p, a in rules]))
            yield pd.DataFrame(rows, columns=["_robots_host", "_rules"])

    # underscore-prefixed internals so a caller's own 'host'/'rules'
    # columns survive the join untouched
    rules_schema = "_robots_host string, _rules array<struct<prefix string, allow boolean>>"
    parsed = robots.select(host_col_robots, content_col).mapInPandas(
        _parse, schema=rules_schema
    )
    u = urls.withColumn(
        "_host", F.regexp_extract(url_col, "://([^/]*)", 1)
    ).withColumn("_path", F.regexp_extract(url_col, "://[^/]*(/.*)?$", 1))
    j = u.join(F.broadcast(parsed), u["_host"] == parsed["_robots_host"], "left")
    # longest-match fold, natively: keep matching rules, take max by
    # (prefix length, allow) — Allow wins ties; empty/missing -> allowed
    matching = F.filter(
        F.col("_rules"), lambda r: F.col("_path").startswith(r["prefix"])
    )
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    allowed = F.when(
        F.col("_rules").isNull() | (F.size(matching) == 0), F.lit(True)
    ).otherwise(best["a"] == 1)
    return j.withColumn("allowed", allowed).drop(
        "_host", "_path", "_robots_host", "_rules"
    )


SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_host", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("kind", T.StringType()),  # 'url' | 'sitemap'
    ]
)


def parse_sitemap(content: str) -> list[tuple[str, str | None, str]]:
    """Parse sitemap XML -> [(loc, lastmod, kind)] where kind is 'url'
    for <urlset> entries and 'sitemap' for <sitemapindex> children
    (crawl seeds that need another fetch).  Namespace-agnostic
    (matches on local names); malformed XML yields []."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return []
    out = []
    kind = "sitemap" if root.tag.split("}")[-1] == "sitemapindex" else "url"
    for child in root:
        if child.tag.split("}")[-1] not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for f in child:
            name = f.tag.split("}")[-1]
            if name == "loc":
                loc = (f.text or "").strip()
            elif name == "lastmod":
                lastmod = (f.text or "").strip()
        if loc:
            out.append((loc, lastmod, kind))
    return out


def sitemap_entries(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap_xml) -> one row per <loc> entry; zero shuffles."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, xml in zip(pdf[host_col], pdf[xml_col]):
                rows.extend(
                    (host, loc, lastmod, kind)
                    for loc, lastmod, kind in parse_sitemap(xml or "")
                )
            yield pd.DataFrame(rows, columns=[f.name for f in SITEMAP_SCHEMA])

    return df.select(host_col, xml_col).mapInPandas(_op, schema=SITEMAP_SCHEMA)


def surt(url: str) -> str:
    """SURT form of a URL (the CDX sort key): host labels reversed and
    comma-joined, then ')/' + path — ``https://www.example.org/a`` ->
    ``org,example)/a`` (www dropped, scheme/port dropped, lowercase).
    Python twin of :func:`surt_col`."""
    import re as _re

    m = _re.match(_URL_RE, url)
    if not m:
        return url.lower()
    host = (m.group(2) or "").lower()
    host = _re.sub(r"^www\.", "", _re.sub(r":\d+$", "", host))
    path = m.group(3) or ""
    return ",".join(reversed(host.split("."))) + ")" + (path or "/")


def surt_col(url) -> "F.Column":
    """Native-column SURT key; SQL mirror in :func:`surt_sql`."""
    url = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host = F.regexp_replace(F.regexp_replace(host, r":\d+$", ""), r"^www\.", "")
    path = F.regexp_extract(url, _URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), path
    )


def surt_sql(expr: str) -> str:
    u = f"({expr})"
    host = f"regexp_replace(regexp_replace(lower(regexp_extract({u}, '{_URL_RE}', 2)), ':[0-9]+$', ''), '^www\\.', '')"
    path = f"CASE WHEN regexp_extract({u}, '{_URL_RE}', 3) = '' THEN '/' ELSE regexp_extract({u}, '{_URL_RE}', 3) END"
    return f"array_to_string(list_reverse(string_split({host}, '.')), ',') || ')' || {path}"
