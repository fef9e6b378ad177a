"""End-to-end web-corpus intake job (jobs/webcorpus.py): WARC archives
in, curated deduped text in the warehouse, idempotent re-run."""

from __future__ import annotations

from tcdb_spark.jobs.webcorpus import run_webcorpus_job
from tcdb_spark.sources.warc import build_http_response, build_warc
from tcdb_spark.sources.warehouse import Warehouse

LONG = "<p>" + "real content word soup " * 20 + "</p>"  # ~480 chars text
SPAM = "<p>" + '<a href="/x">click</a> ' * 40 + "</p>"  # link density ~10000bp
NAVONLY = "<nav><li>Home</li><li>About</li></nav>"  # all boilerplate


def _page(i: int, url: str, html: str, status: int = 200, ctype="text/html") -> dict:
    return {
        "warc_type": "response",
        "record_id": f"<urn:p:{i}>",
        "date": "2026-01-01T00:00:00Z",
        "target_uri": url,
        "payload": build_http_response(
            html.encode(), status=status, content_type=ctype
        ),
    }


def test_webcorpus_job_end_to_end(spark, tmp_path):
    recs = [
        # two messy variants of the SAME canonical url; longer body wins
        _page(0, "https://www.a.example:443/art?utm_source=x", LONG + "<p>extra tail</p>"),
        _page(1, "https://a.example/art#frag", LONG),
        # distinct good page
        _page(2, "https://b.example/good", LONG),
        # rejected: link spam, too short, all-boilerplate, 404, non-html
        # spam page is long enough to pass the length gate, so the
        # density gate is what rejects it (anchor chars ~84% of text)
        _page(3, "https://c.example/spam", SPAM),
        _page(4, "https://c.example/short", "<p>tiny</p>"),
        _page(5, "https://c.example/nav", NAVONLY),
        _page(6, "https://c.example/gone", LONG, status=404),
        _page(7, "https://c.example/img", LONG, ctype="image/png"),
    ]
    (tmp_path / "seg-0.warc.gz").write_bytes(build_warc(recs, gzip_members=True))
    wh = Warehouse(spark, str(tmp_path / "wh"))

    out = run_webcorpus_job(spark, str(tmp_path / "seg-0.warc.gz"), wh, min_chars=200)
    # 404 and non-html never become candidates; the other 6 do
    assert out["pages"] == 6
    assert out["kept_after_gates"] == 3  # two 'art' variants + 'good'
    assert out["kept_after_url_dedup"] == 2
    assert out["table_rows"] == 2

    rows = {r.canonical_url: r for r in wh.read("webdocs").collect()}
    assert set(rows) == {"https://a.example/art", "https://b.example/good"}
    art = rows["https://a.example/art"]
    assert "extra tail" in art.body  # longer variant won
    assert art.url == "https://www.a.example:443/art?utm_source=x"
    assert "Home" not in art.body  # (no nav in this page, sanity)

    # idempotence: re-running the same segment is a fixed point
    out2 = run_webcorpus_job(spark, str(tmp_path / "seg-0.warc.gz"), wh, min_chars=200)
    assert out2["table_rows"] == 2


def test_webcorpus_job_boilerplate_stripped(spark, tmp_path):
    html = NAVONLY + LONG + "<footer>legal notice</footer>"
    (tmp_path / "seg.warc").write_bytes(
        build_warc([_page(0, "https://d.example/p", html)])
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    run_webcorpus_job(spark, str(tmp_path / "seg.warc"), wh, min_chars=100)
    body = wh.read("webdocs").collect()[0].body
    assert "real content" in body
    assert "Home" not in body and "legal notice" not in body
