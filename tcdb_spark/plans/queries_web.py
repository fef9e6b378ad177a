"""Web-corpus lanes: HTML -> text round-trip, block-level boilerplate
filtering, URL canonicalization + URL-level dedup, link-graph harvest,
registrable-domain rollup, WARC archive round-trip, CDX index parsing,
robots.txt longest-match filtering, sitemap seeds, and KMV
source-overlap sketches.

The input stage of a Common-Crawl-scale pretraining pipeline (C4 /
RefinedWeb / MassiveWeb) — absent from the reference (its sources are
ATCF decks), so the whole family is a §2.12 extension.  The end-to-end
composition lives in jobs/webcorpus.py; the streaming discovery loop in
streaming/pipeline.stream_link_frontier.

Oracle discipline for a PARSER lane: the driver testdata has no HTML
column, so each lane COMPOSES deterministic HTML from ``documents``
with native concat expressions that the DuckDB oracle reproduces
verbatim (shared literal template below — one constant, zero drift),
then runs the real extractor (``sources/web.py``, stdlib html.parser in
one Arrow stage).  The oracle computes the EXPECTED extraction output
algebraically (entity decode, whitespace collapse, block boundaries),
so a hash match attests the parser's contract end-to-end: tag
stripping, script/CDATA exclusion, comment removal, named + numeric
entity decoding, block segmentation, href capture and ordering.

URL lanes are pure native expressions on BOTH sides (the same regex
algebra runs under Catalyst codegen and under RE2 — see
``sources/web.url_normalize``); zero Python anywhere in them.

Scale: extraction lanes are one zero-shuffle Arrow stage; the dedup /
graph / domain lanes do exactly one hash-aggregate shuffle each on
their natural key.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tcdb_spark.plans.catalog import fan_out_scan, load_tables, register
from tcdb_spark.sources import web


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, "documents")["documents"].where(
        F.length(F.trim("text")) > 0
    )


_DOCS_SQL = "SELECT * FROM documents WHERE length(trim(text)) > 0"


# --------------------------------------------------------------------------
# Shared HTML template: ('lit', s) pieces are literals; field pieces pull a
# column. ONE constant renders both the Spark composition and the SQL
# mirror, so the two engines compose byte-identical HTML by construction.
# --------------------------------------------------------------------------
_HTML_TMPL: list[tuple] = [
    ("lit", "<html><head><title>"),
    ("source",),
    ("lit", " "),
    ("docid",),
    (
        "lit",
        '</title><script type="text/javascript">var t = "<p>not text</p>";'
        '</script></head><body><nav><ul><li>Home</li>'
        '<li><a href="/about?ref=nav">About</a></li></ul></nav><h1>Doc ',
    ),
    ("docid",),
    ("lit", "</h1><p>R&amp;D &lt;spec&gt; &#8212;  "),
    ("text",),
    ("lit", "</p><!-- tracker --><footer>&copy; 2026 "),
    ("source",),
    ("lit", "</footer></body></html>"),
]


def _compose_spark(tmpl: list[tuple]) -> Column:
    parts = []
    for p in tmpl:
        if p[0] == "lit":
            parts.append(F.lit(p[1]))
        elif p[0] == "docid":
            parts.append(F.col("doc_id").cast("string"))
        else:
            parts.append(F.col(p[0]))
    return F.concat(*parts)


def _compose_sql(tmpl: list[tuple]) -> str:
    parts = []
    for p in tmpl:
        if p[0] == "lit":
            parts.append("'" + p[1].replace("'", "''") + "'")
        elif p[0] == "docid":
            parts.append("doc_id::VARCHAR")
        else:
            parts.append(p[0])
    return " || ".join(parts)


# expected body blocks, as the oracle computes them (entity decode +
# ASCII-whitespace collapse are the contract in sources/web.py)
_EXPECTED_BODY_SQL = (
    "'Home' || chr(10) || 'About' || chr(10) || 'Doc ' || doc_id::VARCHAR "
    "|| chr(10) || 'R&D <spec> ' || chr(8212) || ' ' "
    "|| regexp_replace(trim(text), '[ \t\r\n]+', ' ', 'g') "
    "|| chr(10) || chr(169) || ' 2026 ' || source"
)


@register(
    "html_extract_text",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    h AS (SELECT doc_id, source, text, {_compose_sql(_HTML_TMPL)} AS html FROM d)
    SELECT doc_id,
           source || ' ' || doc_id::VARCHAR AS title,
           {_EXPECTED_BODY_SQL} AS body,
           5 AS n_blocks,
           1 AS n_links,
           CAST(length(html) AS INTEGER) AS html_chars,
           CAST(length({_EXPECTED_BODY_SQL}) AS INTEGER) AS text_chars
    FROM h
    """,
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> clean text through the real stdlib parser, attested by an
    algebraic round-trip oracle (module docstring).  The composed page
    carries every extraction hazard: a <script> whose BODY contains
    markup (CDATA mode), an HTML comment, named (&amp; &lt; &copy;) and
    numeric (&#8212;) entities, nested inline-in-block anchors, and
    planted double spaces that must collapse.  ONE Arrow stage, zero
    shuffles — at 100 TB this is pure per-row CPU after pruning to
    (doc_id, html)."""
    d = fan_out_scan(_docs(spark, sf_dir)).select(
        "doc_id", "source", "text", _compose_spark(_HTML_TMPL).alias("html")
    )
    out = web.html_extract(d)
    return out.select(
        "doc_id", "title", "body", "n_blocks", "n_links", "html_chars", "text_chars"
    )


# ---------------------------------------------------------------------------
# URL canonicalization: 7 messy variants per document must collapse to
# exactly 3 canonical forms (https bare, https?a=1&b=2, http).
# ---------------------------------------------------------------------------


def _variants_spark() -> Column:
    host = F.concat(F.col("source"), F.lit(".example.com"))
    base = F.concat(F.lit("https://"), host, F.lit("/d/"), F.col("doc_id").cast("string"))
    return F.array(
        base,
        F.concat(
            F.lit("HTTPS://WWW."),
            F.upper(host),
            F.lit(":443/d/"),
            F.col("doc_id").cast("string"),
        ),
        F.concat(base, F.lit("?utm_source=rss&utm_medium=feed")),
        F.concat(base, F.lit("#sec-2")),
        F.concat(base, F.lit("?b=2&a=1")),
        F.concat(base, F.lit("?a=1&b=2&gclid=x")),
        F.concat(
            F.lit("http://"), host, F.lit(":80/d/"), F.col("doc_id").cast("string")
        ),
    )


_VARIANTS_SQL = """[
    'https://' || source || '.example.com/d/' || doc_id::VARCHAR,
    'HTTPS://WWW.' || upper(source || '.example.com') || ':443/d/' || doc_id::VARCHAR,
    'https://' || source || '.example.com/d/' || doc_id::VARCHAR || '?utm_source=rss&utm_medium=feed',
    'https://' || source || '.example.com/d/' || doc_id::VARCHAR || '#sec-2',
    'https://' || source || '.example.com/d/' || doc_id::VARCHAR || '?b=2&a=1',
    'https://' || source || '.example.com/d/' || doc_id::VARCHAR || '?a=1&b=2&gclid=x',
    'http://' || source || '.example.com:80/d/' || doc_id::VARCHAR
]"""


@register(
    "url_normalize_canonical",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    u AS (SELECT doc_id, unnest({_VARIANTS_SQL}) AS url FROM d),
    c AS (SELECT doc_id, {web.url_normalize_sql('url')} AS canon FROM u)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
           array_to_string(list_sort(list_distinct(list(canon))), '|') AS canonicals
    FROM c GROUP BY doc_id
    """,
)
def url_normalize_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization attested string-for-string: seven messy
    variants per document (case, www, default ports, fragments,
    tracking params, unsorted params) must collapse to exactly three
    canonical URLs, and the sorted canonical strings themselves ride in
    the hash.  All native expressions (regexp/split/filter/array_sort
    under codegen — see sources/web.url_normalize); one aggregate
    shuffle on doc_id."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.explode(_variants_spark()).alias("url")
    )
    c = d.select("doc_id", web.url_normalize("url").alias("canon"))
    return c.groupBy("doc_id").agg(
        F.count("*").alias("n_variants"),
        F.countDistinct("canon").alias("n_canonical"),
        F.array_join(F.array_sort(F.collect_set("canon")), "|").alias("canonicals"),
    )


@register(
    "url_dedup_canonical",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    u AS (SELECT doc_id, n_chars,
                 'https://www.' || source || '.example.com:443/page/' || (doc_id % 97)::VARCHAR
                 || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x'
                         WHEN doc_id % 3 = 1 THEN '#top' ELSE '' END AS url
          FROM d),
    c AS (SELECT doc_id, n_chars, {web.url_normalize_sql('url')} AS canonical_url FROM u),
    r AS (SELECT canonical_url, doc_id, n_chars,
                 count(*) OVER (PARTITION BY canonical_url) AS n_dups,
                 row_number() OVER (PARTITION BY canonical_url
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM c)
    SELECT canonical_url, CAST(n_dups AS BIGINT) AS n_dups,
           doc_id AS kept_doc_id, n_chars AS kept_chars
    FROM r WHERE rn = 1
    """,
)
def url_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the cheapest and first dedup pass a crawl
    pipeline runs: canonicalize, then keep the best document per
    canonical URL (longest text, ties to the smallest doc_id —
    deterministic under task retries).  Planted collisions via
    ``doc_id % 97`` paths give real dup groups whose members carry
    DIFFERENT messy decorations (tracking params / fragments / none) —
    the dedup only works if canonicalization removed them.  One window
    shuffle on the canonical key; the count rides the same partition."""
    d = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com:443/page/"),
        (F.col("doc_id") % 97).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=x"))
        .when(F.col("doc_id") % 3 == 1, F.lit("#top"))
        .otherwise(F.lit("")),
    )
    c = d.select(
        "doc_id", "n_chars", web.url_normalize(url).alias("canonical_url")
    )
    w = W.partitionBy("canonical_url")
    r = c.select(
        "canonical_url",
        F.count("*").over(w).alias("n_dups"),
        F.col("doc_id"),
        F.col("n_chars"),
        F.row_number()
        .over(w.orderBy(F.col("n_chars").desc(), F.col("doc_id")))
        .alias("rn"),
    )
    return r.where(F.col("rn") == 1).select(
        "canonical_url",
        "n_dups",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_chars").alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# Link graph: planted absolute links extracted by the real parser.
# ---------------------------------------------------------------------------

_LINK_TMPL: list[tuple] = [
    ("lit", '<html><body><p>See <a href="'),
    ("url0",),
    ("lit", '">link 0</a> and <a href="'),
    ("url1",),
    ("lit", '">link 1</a>.</p><div><a href="'),
    ("url2",),
    ("lit", '">link 2</a><a href="/rel">rel</a></div></body></html>'),
]


def _link_url_spark(j: int) -> Column:
    return F.concat(
        F.lit("https://h"),
        ((F.col("doc_id") * 7 + j * 13) % 40).cast("string"),
        F.lit(f".example.org/p/{j}"),
    )


@register(
    "link_graph_hosts",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    l AS (SELECT doc_id, 'h' || ((doc_id * 7 + j * 13) % 40)::VARCHAR || '.example.org' AS host,
                 'link ' || j::VARCHAR AS anchor
          FROM d, unnest([0, 1, 2]) AS t(j))
    SELECT host, CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(anchor) AS min_anchor
    FROM l GROUP BY host
    """,
)
def link_graph_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink harvest -> host in-link rollup, the crawl-frontier /
    PageRank feeder.  Each document's composed page plants three
    absolute anchors (arithmetically determined hosts) plus one
    RELATIVE link that must be excluded; the real parser extracts
    hrefs + anchor text in document order and the oracle recomputes the
    plant arithmetic.  A hash match attests attribute parsing, link
    ordering and the absolute/relative split.  One Arrow stage + one
    aggregate shuffle on host."""
    tmpl_parts = []
    for p in _LINK_TMPL:
        if p[0] == "lit":
            tmpl_parts.append(F.lit(p[1]))
        else:
            tmpl_parts.append(_link_url_spark(int(p[0][3])))
    d = _docs(spark, sf_dir).select(
        "doc_id", F.concat(*tmpl_parts).alias("html")
    )
    links = web.html_links(d)
    abs_links = links.where(F.col("href").contains("://")).select(
        "doc_id",
        F.regexp_extract("href", "://([^/]*)", 1).alias("host"),
        "anchor",
    )
    return abs_links.groupBy("host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("anchor").alias("min_anchor"),
    )


@register(
    "registrable_domain_stats",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    h AS (SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0 THEN 'cdn.' || source || '.com'
                      WHEN doc_id % 4 = 1 THEN 'a.b.' || source || '.co.uk'
                      WHEN doc_id % 4 = 2 THEN source || '.org'
                      ELSE 'www.api.' || source || '.ac.jp' END AS host
          FROM d),
    r AS (SELECT doc_id, host, {web.registrable_host_sql('host')} AS domain FROM h)
    SELECT domain, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM r GROUP BY domain
    """,
)
def registrable_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain rollup (the unit crawl pipelines cap and
    budget by — domain_cap's natural key): subdomain-heavy hosts
    including ccSLD forms (``.co.uk``, ``.ac.jp``) reduce to their
    registrable domain with native split/slice expressions, mirrored
    exactly in SQL.  One aggregate shuffle."""
    d = _docs(spark, sf_dir)
    host = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("cdn."), F.col("source"), F.lit(".com")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("a.b."), F.col("source"), F.lit(".co.uk")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.col("source"), F.lit(".org")))
        .otherwise(F.concat(F.lit("www.api."), F.col("source"), F.lit(".ac.jp")))
    )
    r = d.select(
        "doc_id", host.alias("host"), web.registrable_host(host).alias("domain")
    )
    return r.groupBy("domain").agg(
        F.countDistinct("host").alias("n_hosts"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# WARC round-trip: compose spec-shaped (gzipped) WARC archives from the
# documents table, parse them back with the real reader, attest fields
# and byte-exact payloads algebraically.
# ---------------------------------------------------------------------------

_WARC_HTML_SQL = "'<html><body><p>' || text || '</p></body></html>'"


@register(
    "warc_roundtrip_extract",
    oracle=f"""
    WITH d AS ({_DOCS_SQL})
    SELECT doc_id,
           'https://crawl.example.com/doc/' || doc_id::VARCHAR AS target_uri,
           CAST(200 AS INTEGER) AS http_status,
           'text/html; charset=utf-8' AS content_type,
           CAST(octet_length(encode({_WARC_HTML_SQL})) AS INTEGER) AS n_body_bytes,
           md5({_WARC_HTML_SQL}) AS body_md5
    FROM d
    """,
)
def warc_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500) archive round-trip through the real reader
    (sources/warc.py): documents become HTTP-response records grouped
    25-to-a-file, HALF the files written as per-record gzip members
    (the Common Crawl ``.warc.gz`` layout) and half plain, each file
    fronted by a ``warcinfo`` record that the response filter must
    type correctly.  The parse side recovers doc_id from the
    WARC-Target-URI and the oracle recomputes every field plus the
    payload md5 algebraically — a hash match attests Content-Length
    octet framing, gzip member walking, HTTP payload splitting, and
    byte-exact body fidelity.  Plan: one groupBy shuffle to assemble
    files, then zero-shuffle Arrow parse — at 100 TB the compose side
    disappears (real archives arrive as files via read_warc) and only
    the parse shape remains."""
    from tcdb_spark.sources import warc as W_

    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 25).alias("file_id"),
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        ).alias("html"),
    )

    def _compose(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        records = [
            {
                "warc_type": "warcinfo",
                "record_id": f"<urn:info:{fid}>",
                "date": "2026-01-01T00:00:00Z",
                "payload": b"software: tcdb-spark\r\n",
            }
        ]
        for did, html in zip(pdf["doc_id"], pdf["html"]):
            records.append(
                {
                    "warc_type": "response",
                    "record_id": f"<urn:doc:{did}>",
                    "date": "2026-01-01T00:00:00Z",
                    "target_uri": f"https://crawl.example.com/doc/{did}",
                    "payload": W_.build_http_response(html.encode("utf-8")),
                }
            )
        blob = W_.build_warc(records, gzip_members=(fid % 2 == 0))
        return pd.DataFrame({"fname": [f"part-{fid}.warc"], "data": [blob]})

    files = d.groupBy("file_id").applyInPandas(
        _compose, schema="fname string, data binary"
    )
    recs = W_.records_frame(files, "fname", "data")
    return recs.where(F.col("warc_type") == "response").select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "target_uri",
        "http_status",
        "content_type",
        F.octet_length("body").alias("n_body_bytes"),
        F.md5("body").alias("body_md5"),
    )


# ---------------------------------------------------------------------------
# Cross-source vocabulary overlap via KMV (bottom-k theta) sketches —
# exact-mode degeneracy oracle (k >= per-source vocabulary).
# ---------------------------------------------------------------------------


@register(
    "sketch_source_overlap",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    t AS (SELECT DISTINCT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM d),
    c AS (SELECT source, count(*) AS n FROM t GROUP BY source),
    p AS (SELECT a.source AS sa, b.source AS sb, count(*) AS ni
          FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
          GROUP BY 1, 2)
    SELECT sa AS group_a, sb AS group_b,
           CAST(ca.n AS BIGINT) AS est_a, CAST(cb.n AS BIGINT) AS est_b,
           CAST(ni AS BIGINT) AS est_intersection,
           CAST(ca.n + cb.n - ni AS BIGINT) AS est_union,
           CAST((10000 * ni) // (ca.n + cb.n - ni) AS BIGINT) AS jaccard_bp
    FROM p JOIN c ca ON ca.source = sa JOIN c cb ON cb.source = sb
    """,
)
def sketch_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap through KMV bottom-k sketches
    (operators/sketch.py): the set-INTERSECTION question HLL cannot
    answer ("how much do crawl snapshots share").  Exact-mode
    degeneracy oracle: k=2^20 exceeds every per-source vocabulary, so
    the sketch provably retains all hashes (theta = 1) and the
    build->explode->equi-join->threshold->estimate machinery must
    reproduce exact distinct/intersection/union counts and floor-bp
    Jaccard, hash-matched against DuckDB's exact self-join.  Pruned-k
    accuracy and merge laws are pytest-gated (test_kmv.py).  Scale:
    sketch rows are <= k longs per group no matter the input; the pair
    stage equi-joins the BOUNDED sketches on hash value — never a
    cartesian, never the raw corpus."""
    from tcdb_spark.operators.sketch import kmv_overlap, kmv_sketch

    d = _docs(spark, sf_dir)
    tok = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    sk = kmv_sketch(tok, "source", "tok", k=1 << 20)
    return kmv_overlap(sk, "source")


@register(
    "html_boilerplate_filter",
    oracle=f"""
    WITH d AS ({_DOCS_SQL})
    SELECT doc_id,
           'Doc ' || doc_id::VARCHAR || chr(10) || 'R&D <spec> ' || chr(8212)
             || ' ' || regexp_replace(trim(text), '[ \t\r\n]+', ' ', 'g') AS clean_body,
           CAST(2 AS BIGINT) AS n_kept,
           CAST(3 AS BIGINT) AS n_dropped,
           CAST(16 + length(source) AS BIGINT) AS n_dropped_chars
    FROM d
    """,
)
def html_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level boilerplate removal (the trafilatura/readability
    move): the extractor emits per-block classification signals
    (opening tag, link count, anchor-text chars, nav/header/footer/
    aside container flag — sources/web.html_blocks) and the filter
    keeps blocks outside boilerplate containers whose link density is
    <= 0.5 (integer algebra: link_chars*2 <= length(text)).  On the
    composed template that provably keeps exactly the heading and the
    paragraph while dropping both nav items and the footer, and the
    reassembled clean body must equal the oracle's algebraic
    expectation character-for-character.  One Arrow stage + one
    groupBy(doc_id) shuffle for reassembly."""
    d = fan_out_scan(_docs(spark, sf_dir)).select(
        "doc_id", "source", "text", _compose_spark(_HTML_TMPL).alias("html")
    )
    blocks = web.html_blocks(d)
    kept = (~F.col("in_boiler")) & (
        F.col("link_chars") * 2 <= F.length("text")
    )
    return (
        blocks.withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("pos", "text"))
                        )
                    ),
                    lambda x: x["text"],
                ),
                "\n",
            ).alias("clean_body"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.sum((~F.col("kept")).cast("int")).alias("n_dropped"),
            F.sum(
                F.when(~F.col("kept"), F.length("text")).otherwise(F.lit(0))
            ).alias("n_dropped_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Crawl policy: robots.txt longest-match filtering and sitemap seeds.
# ---------------------------------------------------------------------------

_ROBOTS_TXT = (
    "User-agent: evilbot\\nDisallow: /\\n\\n"
    "User-agent: *\\nDisallow: /private\\nAllow: /private/ok\\n"
)


@register(
    "robots_allow_filter",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    u AS (SELECT doc_id, source || '.example.com' AS host,
                 CASE doc_id % 4
                      WHEN 0 THEN '/pub/' || doc_id::VARCHAR
                      WHEN 1 THEN '/private/' || doc_id::VARCHAR
                      WHEN 2 THEN '/private/ok/' || doc_id::VARCHAR
                      ELSE '/private/okno' END AS path
          FROM d)
    SELECT doc_id, 'https://' || host || path AS canonical_url,
           CASE WHEN host LIKE 'src1%' THEN TRUE  -- no robots.txt row
                WHEN path LIKE '/private/ok%' THEN TRUE
                WHEN path LIKE '/private%' THEN FALSE
                ELSE TRUE END AS allowed
    FROM u
    """,
)
def robots_allow_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt enforcement with RFC 9309 LONGEST-MATCH semantics
    (sources/web.parse_robots / robots_filter — the stdlib
    urllib.robotparser's pre-RFC first-match order is deliberately not
    used; docstring there).  Planted rules per host (Disallow /private,
    Allow /private/ok, plus an evilbot group that must NOT leak into
    the * group) against four path shapes including the prefix trap
    '/private/okno' (longest match ALLOWS it — prefix, not segment,
    semantics); hosts starting 'src1' carry no robots row and default
    to allowed.  Robots parse once per HOST, broadcast to the URL side;
    per-URL work is native prefix matching over the rule array."""
    d = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit(".example.com"))
    path = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/pub/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/private/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/private/ok/"), F.col("doc_id").cast("string")))
        .otherwise(F.lit("/private/okno"))
    )
    urls = d.select(
        "doc_id",
        F.concat(F.lit("https://"), host, path).alias("canonical_url"),
    )
    robots = (
        d.select(host.alias("host"))
        .distinct()
        .where(~F.col("host").startswith("src1"))
        .withColumn("robots_txt", F.lit(_ROBOTS_TXT.replace("\\n", "\n")))
    )
    out = web.robots_filter(urls, robots, url_col="canonical_url")
    return out.select("doc_id", "canonical_url", "allowed")


@register(
    "sitemap_frontier_seed",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    e AS (
        SELECT source || '.example.com' AS sitemap_host,
               'https://' || source || '.example.com/d/' || doc_id::VARCHAR AS loc,
               '2026-01-0' || ((doc_id % 9) + 1)::VARCHAR AS lastmod,
               'url' AS kind
        FROM d WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT source || '.example.com',
               'https://' || source || '.example.com/alt/' || doc_id::VARCHAR,
               NULL, 'url'
        FROM d WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT source || '.example.com',
               'https://' || source || '.example.com/sitemap-child-' || doc_id::VARCHAR || '.xml',
               NULL, 'sitemap'
        FROM d WHERE doc_id % 5 = 0
    )
    SELECT * FROM e
    """,
)
def sitemap_frontier_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (the crawl's seed source): per-doc composed
    sitemap XML — a two-entry <urlset> with namespace declarations and
    a lastmod on the first entry, or (every 5th doc) a <sitemapindex>
    whose child must come back kind='sitemap' for a second fetch —
    parsed by the real namespace-agnostic ElementTree walker
    (sources/web.parse_sitemap).  Oracle recomputes the planted
    entries; zero shuffles (one Arrow stage)."""
    d = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit(".example.com"))
    base = F.concat(F.lit("https://"), host)
    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>'),
        base, F.lit("/d/"), F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2026-01-0"),
        ((F.col("doc_id") % 9) + 1).cast("string"),
        F.lit("</lastmod></url><url><loc>"),
        base, F.lit("/alt/"), F.col("doc_id").cast("string"),
        F.lit("</loc></url></urlset>"),
    )
    index = F.concat(
        F.lit('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><sitemap><loc>'),
        base, F.lit("/sitemap-child-"), F.col("doc_id").cast("string"),
        F.lit(".xml</loc></sitemap></sitemapindex>"),
    )
    xml = F.when(F.col("doc_id") % 5 == 0, index).otherwise(urlset)
    src = d.select(host.alias("host"), xml.alias("sitemap_xml"))
    return web.sitemap_entries(src, "host", "sitemap_xml")


# ---------------------------------------------------------------------------
# CDX index parsing — the side index that makes WARC archives seekable
# (sources/warc.py: read_warc_ranged consumes exactly these columns).
# ---------------------------------------------------------------------------


@register(
    "cdx_parse_index",
    oracle=f"""
    WITH d AS ({_DOCS_SQL}),
    u AS (SELECT doc_id,
                 'https://www.' || source || '.example.com/d/' || doc_id::VARCHAR AS url
          FROM d)
    SELECT {web.surt_sql('url')} AS surt_key,
           make_timestamp(2026, 1, (doc_id % 9) + 1, doc_id % 10, 0, 0) AS capture_ts,
           url,
           CAST(NULL AS VARCHAR) AS mime,
           CAST(200 AS INTEGER) AS http_status,
           CAST(NULL AS VARCHAR) AS digest,
           CAST(doc_id * 1000 AS BIGINT) AS offset,
           CAST(500 + doc_id % 100 AS BIGINT) AS length,
           'crawl/seg-' || (doc_id % 10)::VARCHAR || '.warc.gz' AS filename
    FROM u
    """,
)
def cdx_parse_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ index parsing, fully native on both sides: the lane
    composes real CDX lines (SURT key via the same regex algebra both
    engines share, a 14-digit timestamp, a JSON attribute object built
    by to_json) and parses them back with sources/warc.parse_cdx
    (split-limit-3 + from_json + casts — zero Python).  The oracle
    computes every field algebraically; absent JSON attributes (mime,
    digest) must come back NULL.  At 100 TB the CDX is how a pipeline
    fetches 10^4 records out of the archives without scanning them
    (read_warc_ranged); this lane attests the index decode."""
    from tcdb_spark.sources.warc import parse_cdx

    d = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/d/"),
        F.col("doc_id").cast("string"),
    )
    ts14 = F.concat(
        F.lit("2026010"), ((F.col("doc_id") % 9) + 1).cast("string"),
        F.lpad((F.col("doc_id") % 10).cast("string"), 2, "0"), F.lit("0000"),
    )
    attrs = F.to_json(
        F.struct(
            url.alias("url"),
            F.lit("200").alias("status"),
            (F.col("doc_id") * 1000).cast("string").alias("offset"),
            (F.lit(500) + F.col("doc_id") % 100).cast("string").alias("length"),
            F.concat(
                F.lit("crawl/seg-"), (F.col("doc_id") % 10).cast("string"),
                F.lit(".warc.gz"),
            ).alias("filename"),
        )
    )
    lines = d.select(
        F.concat(web.surt_col(url), F.lit(" "), ts14, F.lit(" "), attrs).alias("value")
    )
    return parse_cdx(lines)
