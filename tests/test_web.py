"""Web-corpus surface: HTML extraction contract goldens (hand-computed
expected text over adversarial markup), URL canonicalization algebra,
and the distributed lanes' structural invariants.

The lane-level round-trip oracle (plans/queries_web.py) attests the
contract over WELL-FORMED composed pages; these goldens pin behavior on
the malformed/hostile HTML a real crawl serves — the cases an oracle
built from compose-then-extract can never reach.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tcdb_spark.sources.web import (
    extract_text,
    html_extract,
    html_links,
    registrable_host,
    url_normalize,
)

# ---------------------------------------------------------------------------
# extraction goldens — each pair is (html, (title, body, links))
# ---------------------------------------------------------------------------

GOLDENS = [
    # script body containing markup must be dropped whole (CDATA mode)
    (
        '<script>document.write("<p>fake</p>");</script><p>real</p>',
        ("", "real", []),
    ),
    # style + noscript + template are content-free
    (
        "<style>p::before{content:'x'}</style><noscript>no js</noscript>"
        "<template><li>tpl</li></template><div>kept</div>",
        ("", "kept", []),
    ),
    # comments and processing instructions vanish; entities decode
    (
        "<!-- hidden --><p>a &amp;&lt;tag&gt; &#65; &#x42;</p><?php echo 1 ?>",
        ("", "a &<tag> A B", []),
    ),
    # double-encoded entity decodes ONE level
    ("<p>&amp;lt;b&amp;gt;</p>", ("", "&lt;b&gt;", [])),
    # inline tags do not break blocks; block tags do
    (
        "<p>one <b>two</b> three</p><div>four</div>",
        ("", "one two three\nfour", []),
    ),
    # <br> is a block boundary even self-closed / unclosed
    ("<p>a<br>b<br/>c</p>", ("", "a\nb\nc", [])),
    # whitespace runs collapse; blank blocks are dropped
    (
        "<div>  a \t b </div><div>   </div><div>\nc\n</div>",
        ("", "a b\nc", []),
    ),
    # unclosed tags recover; stray closers are ignored
    ("<p>open<div>nested</b></span> tail", ("", "open\nnested tail", [])),
    # uppercase tags are case-folded by the parser
    ("<P>UP</P><SCRIPT>drop()</SCRIPT><DIV>down</DIV>", ("", "UP\ndown", [])),
    # title captured separately, excluded from body
    (
        "<head><title> T  1 </title></head><body><p>b</p></body>",
        ("T 1", "b", []),
    ),
    # links: href + collapsed anchor text, document order, text stays in body
    (
        '<p><a href="/a">first  link</a> mid <a href=/b>second</a> '
        "<a name=anchor>no href</a></p>",
        ("", "first link mid second no href", [("/a", "first link"), ("/b", "second")]),
    ),
    # nested markup inside an anchor keeps contributing to its text
    (
        '<p><a href="x"><b>bold</b> tail</a></p>',
        ("", "bold tail", [("x", "bold tail")]),
    ),
    # stray '<' that is not a tag survives as text (parser recovery)
    ("<p>1 < 2 and 3 > 2</p>", ("", "1 < 2 and 3 > 2", [])),
    # empty document
    ("", ("", "", [])),
]


@pytest.mark.parametrize("html,expected", GOLDENS)
def test_extract_text_goldens(html, expected):
    assert extract_text(html) == expected


def test_truncated_mid_tag_does_not_raise():
    html = '<p>keep</p><a href="https://x.example/ver'
    title, body, links = extract_text(html)
    assert body == "keep"


@given(st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_extractor_never_raises(s):
    # arbitrary text (including < > & fragments) must never raise and
    # must never leak markup structure into links as None
    title, body, links = extract_text(s)
    assert isinstance(body, str)
    assert all(h is not None for h, _ in links)


# ---------------------------------------------------------------------------
# URL normalization algebra (Spark-side; cross-engine equality is the
# lane oracle's job)
# ---------------------------------------------------------------------------

URL_CASES = [
    ("HTTPS://WWW.Ex.COM:443/a?utm_x=1&b=2&a=1#f", "https://ex.com/a?a=1&b=2"),
    ("http://ex.com:80/", "http://ex.com/"),
    ("http://ex.com:8080/p", "http://ex.com:8080/p"),  # non-default port kept
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com/p?fbclid=x&gclid=y&ref=z", "https://ex.com/p"),
    ("https://ex.com/p?x=1&x=0", "https://ex.com/p?x=0&x=1"),  # repeat keys sort
    ("https://www.ex.com:443/p?", "https://ex.com/p"),  # empty query
    ("ftp://Host/Path", "ftp://host/Path"),  # path case preserved
]


def test_url_normalize_spark(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], "u string")
    got = [r.c for r in df.select(url_normalize("u").alias("c")).collect()]
    assert got == [want for _, want in URL_CASES]


HOST_CASES = [
    ("a.b.example.co.uk", "example.co.uk"),
    ("www.api.x.ac.jp", "x.ac.jp"),
    ("cdn.img.example.com", "example.com"),
    ("example.org", "example.org"),
    ("localhost", "localhost"),
    ("deep.shop.example.net", "example.net"),
    # 'co' as the SLD of a gTLD-length TLD is NOT a ccSLD form
    ("x.y.co.com", "co.com"),
]


def test_registrable_host_spark(spark):
    df = spark.createDataFrame([(h,) for h, _ in HOST_CASES], "h string")
    got = [r.d for r in df.select(registrable_host("h").alias("d")).collect()]
    assert got == [want for _, want in HOST_CASES]


# ---------------------------------------------------------------------------
# distributed operators
# ---------------------------------------------------------------------------


def test_html_extract_distributed(spark):
    rows = [
        (1, "<title>t1</title><p>a  b</p><p>c</p>"),
        (2, '<a href="https://x/">x</a>'),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r.doc_id: r for r in html_extract(df).collect()}
    assert out[1].body == "a b\nc" and out[1].n_blocks == 2 and out[1].title == "t1"
    assert out[2].n_links == 1 and out[2].text_chars == 1
    assert out[3].body == "" and out[3].html_chars == 0


def test_html_extract_truncation_cap(spark):
    big = "<p>" + "x" * 5000 + "</p><p>tail</p>"
    df = spark.createDataFrame([(1, big)], "doc_id long, html string")
    row = html_extract(df, max_html_bytes=100).collect()[0]
    assert row.html_chars == 100
    assert row.body == "x" * 97  # cut mid-run, no exception, no tail


def test_html_links_positions(spark):
    html = '<a href="u0">a</a><a href="u1">b</a><a href="u2">c</a>'
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    got = sorted(
        (r.pos, r.href, r.anchor) for r in html_links(df).collect()
    )
    assert got == [(0, "u0", "a"), (1, "u1", "b"), (2, "u2", "c")]


def test_extract_plan_is_one_arrow_stage(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


# ---------------------------------------------------------------------------
# block-level classification (boilerplate filtering)
# ---------------------------------------------------------------------------


def _meta(html):
    from tcdb_spark.sources.web import HtmlTextExtractor

    p = HtmlTextExtractor()
    p.feed(html)
    p.close()
    p._flush()
    return p.blocks_meta


def test_blocks_meta_tags_links_and_boiler():
    html = (
        '<nav><li>Home</li><li><a href="/a">About</a></li></nav>'
        '<h1>Title</h1><p>body <a href="/x">ref</a> tail</p>'
        "<footer>legal</footer>"
    )
    assert _meta(html) == [
        ("li", "Home", 0, 0, True),
        ("li", "About", 1, 5, True),
        ("h1", "Title", 0, 0, False),
        ("p", "body ref tail", 1, 3, False),
        ("footer", "legal", 0, 0, True),
    ]


def test_blocks_meta_stray_closer_and_br():
    # </nav> without opener must not underflow; br flushes but never
    # becomes the enclosing tag
    assert _meta("</nav><p>a<br>b</p>") == [
        ("p", "a", 0, 0, False),
        ("p", "b", 0, 0, False),
    ]


def test_blocks_meta_body_consistency():
    # body == '\n'.join(block texts) — filters stay consistent with it
    from tcdb_spark.sources.web import extract_text

    html = "<nav><p>x</p></nav><div>y <b>z</b></div>"
    _, body, _ = extract_text(html)
    assert body == "\n".join(t for _, t, *_ in _meta(html))


def test_html_blocks_distributed(spark):
    from tcdb_spark.sources.web import html_blocks

    df = spark.createDataFrame(
        [(1, '<nav><a href="/m">menu</a></nav><p>content here</p>')],
        "doc_id long, html string",
    )
    rows = sorted(html_blocks(df).collect(), key=lambda r: r.pos)
    assert [(r.tag, r.text, r.n_links, r.link_chars, r.in_boiler) for r in rows] == [
        ("nav", "menu", 1, 4, True),
        ("p", "content here", 0, 0, False),
    ]


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309 longest-match) and sitemap XML
# ---------------------------------------------------------------------------


def test_parse_robots_groups_and_fallback():
    from tcdb_spark.sources.web import parse_robots

    txt = (
        "# policy\n"
        "User-agent: evilbot\nDisallow: /\n\n"
        "User-agent: a\nUser-agent: b\nDisallow: /shared\n\n"
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\nDisallow:\n"
    )
    assert parse_robots(txt, "EvilBot") == [("/", False)]
    assert parse_robots(txt, "a") == parse_robots(txt, "B") == [("/shared", False)]
    # unknown agent falls back to *; blank Disallow adds no rule
    assert parse_robots(txt, "crawler9") == [("/private", False), ("/private/ok", True)]
    assert parse_robots("", "*") == []


def test_robots_longest_match_and_ties():
    from tcdb_spark.sources.web import robots_decision

    rules = [("/private", False), ("/private/ok", True)]
    assert robots_decision(rules, "/") is True
    assert robots_decision(rules, "/private/x") is False
    assert robots_decision(rules, "/private/ok/x") is True
    assert robots_decision(rules, "/private/okno") is True  # prefix, not segment
    # equal-length tie prefers Allow, in either file order
    assert robots_decision([("/a", False), ("/a", True)], "/a/x") is True
    assert robots_decision([("/a", True), ("/a", False)], "/a/x") is True


def test_robots_filter_distributed_matches_python(spark):
    from tcdb_spark.sources.web import parse_robots, robots_decision, robots_filter

    txt = "User-agent: *\nDisallow: /p\nAllow: /pq\nDisallow: /pq/deep\n"
    rules = parse_robots(txt)
    paths = ["/", "/p", "/pq", "/pq/deep/x", "/pqr", "/z"]
    urls = spark.createDataFrame(
        [(f"https://h.example{p}",) for p in paths], "canonical_url string"
    )
    robots = spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    got = {
        r.canonical_url: r.allowed
        for r in robots_filter(urls, robots).collect()
    }
    for p in paths:
        assert got[f"https://h.example{p}"] == robots_decision(rules, p), p


def test_robots_filter_missing_host_allowed(spark):
    from tcdb_spark.sources.web import robots_filter

    urls = spark.createDataFrame([("https://nohost.example/x",)], "canonical_url string")
    robots = spark.createDataFrame([("other.example", "User-agent: *\nDisallow: /")],
                                   "host string, robots_txt string")
    assert robots_filter(urls, robots).collect()[0].allowed is True


def test_parse_sitemap_edge_cases():
    from tcdb_spark.sources.web import parse_sitemap

    assert parse_sitemap("<urlset><url><lastmod>x</lastmod></url></urlset>") == []
    assert parse_sitemap("<urlset><url><loc> https://a/1 </loc></url>"
                         "<other/></urlset>") == [("https://a/1", None, "url")]
    assert parse_sitemap("<broken") == []
    got = parse_sitemap(
        '<sitemapindex xmlns="http://x"><sitemap><loc>https://a/s.xml</loc>'
        "<lastmod>2026-02-02</lastmod></sitemap></sitemapindex>"
    )
    assert got == [("https://a/s.xml", "2026-02-02", "sitemap")]


def test_robots_filter_preserves_caller_host_column(spark):
    from tcdb_spark.sources.web import robots_filter

    urls = spark.createDataFrame(
        [("https://h.example/x", "callers-host")], "canonical_url string, host string"
    )
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /x")], "host string, robots_txt string"
    )
    row = robots_filter(urls, robots).collect()[0]
    assert row.host == "callers-host" and row.allowed is False
