"""WARC reader/writer (sources/warc.py): framing strictness, gzip
member walking, HTTP payload splitting, truncation discipline, and the
distributed binaryFile scan path."""

from __future__ import annotations

import gzip

import pytest

from tcdb_spark.sources.warc import (
    build_http_response,
    build_warc,
    iter_warc_records,
    parse_http_response,
    read_warc,
)


def _rec(i: int, body: bytes, warc_type: str = "response") -> dict:
    r = {
        "warc_type": warc_type,
        "record_id": f"<urn:t:{i}>",
        "date": "2026-01-01T00:00:00Z",
        "payload": build_http_response(body) if warc_type == "response" else body,
    }
    if warc_type == "response":
        r["target_uri"] = f"https://x.example/{i}"
    return r


def test_roundtrip_plain_and_gzip():
    recs = [_rec(0, b"zero"), _rec(1, b"one"), _rec(2, b"two")]
    for gz in (False, True):
        got = list(iter_warc_records(build_warc(recs, gzip_members=gz)))
        assert [r["target_uri"] for r in got] == [r["target_uri"] for r in recs]
        bodies = [parse_http_response(r["payload"])[2] for r in got]
        assert bodies == [b"zero", b"one", b"two"]


def test_binary_safe_payload():
    # a body containing blank lines AND a fake record header must not
    # confuse framing — Content-Length octets rule
    evil = b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nstill body"
    got = list(iter_warc_records(build_warc([_rec(0, evil), _rec(1, b"next")])))
    assert len(got) == 2
    assert parse_http_response(got[0]["payload"])[2] == evil
    assert got[1]["target_uri"].endswith("/1")


def test_warcinfo_record_passthrough():
    recs = [_rec(0, b"software: x\r\n", warc_type="warcinfo"), _rec(1, b"body")]
    got = list(iter_warc_records(build_warc(recs)))
    assert [r["warc_type"] for r in got] == ["warcinfo", "response"]
    assert got[0]["target_uri"] is None


def test_truncated_archive_yields_complete_prefix():
    data = build_warc([_rec(0, b"aaaa"), _rec(1, b"bbbb")])
    # cut inside record 1's payload
    cut = data[: len(data) - 6]
    got = list(iter_warc_records(cut))
    assert len(got) == 1 and got[0]["target_uri"].endswith("/0")


def test_bad_content_length_stops():
    data = build_warc([_rec(0, b"ok")])
    assert list(iter_warc_records(data.replace(b"Content-Length: ", b"Content-Length: x", 1))) == []
    # oversized declared length: refuse rather than allocate
    assert list(iter_warc_records(data, max_payload_bytes=4)) == []


def test_lf_only_line_endings_tolerated():
    payload = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbody"
    raw = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Record-ID: <urn:t:0>\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\nWARC-Target-URI: https://x.example/0\n"
        + f"Content-Length: {len(payload)}\n\n".encode()
        + payload
        + b"\n\n"
    )
    got = list(iter_warc_records(raw))
    assert len(got) == 1
    status, hh, body = parse_http_response(got[0]["payload"])
    assert (status, hh["content-type"], body) == (200, "text/plain", b"body")


def test_non_http_response_payload():
    status, hh, body = parse_http_response(b"just bytes")
    assert (status, hh, body) == (0, {}, b"just bytes")


def test_multi_member_gzip_vs_whole_stream():
    recs = [_rec(i, f"b{i}".encode()) for i in range(4)]
    per_member = build_warc(recs, gzip_members=True)
    whole = gzip.compress(build_warc(recs))
    for data in (per_member, whole):
        got = list(iter_warc_records(data))
        assert [r["record_id"] for r in got] == [f"<urn:t:{i}>" for i in range(4)]


def test_read_warc_distributed(spark, tmp_path):
    for i, gz in [(0, False), (1, True)]:
        recs = [_rec(10 * i + j, f"doc {10 * i + j}".encode()) for j in range(3)]
        (tmp_path / f"seg-{i}.warc{'.gz' if gz else ''}").write_bytes(
            build_warc(recs, gzip_members=gz)
        )
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 6
    assert {r.http_status for r in rows} == {200}
    got = sorted(bytes(r.body).decode() for r in rows)
    assert got == sorted(f"doc {10 * i + j}" for i in (0, 1) for j in range(3))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # file-parallel, zero shuffles


# ---------------------------------------------------------------------------
# CDX index + byte-range record fetch
# ---------------------------------------------------------------------------


def test_build_cdx_offsets_are_real(tmp_path):
    from tcdb_spark.sources.warc import build_cdx_for, iter_warc_records

    recs = [_rec(i, f"body-{i}".encode()) for i in range(5)]
    recs.insert(0, _rec(99, b"software\r\n", warc_type="warcinfo"))
    blob, lines = build_cdx_for(recs, "seg.warc.gz")
    assert len(lines) == 5  # warcinfo not indexed
    import json

    for ln in lines:
        surt_key, ts, attrs = ln.split(" ", 2)
        a = json.loads(attrs)
        member = blob[int(a["offset"]) : int(a["offset"]) + int(a["length"])]
        rec = next(iter_warc_records(member))
        assert rec["target_uri"] == a["url"]
        assert surt_key.startswith("example,x)/")


def test_parse_cdx_and_ranged_fetch(spark, tmp_path):
    import json

    from tcdb_spark.sources.warc import build_cdx_for, parse_cdx, read_warc_ranged

    cdx_lines = []
    for seg in range(2):
        recs = [_rec(10 * seg + j, f"doc {10 * seg + j}".encode()) for j in range(4)]
        path = tmp_path / f"seg-{seg}.warc.gz"
        blob, lines = build_cdx_for(recs, str(path))
        path.write_bytes(blob)
        cdx_lines.extend(lines)
    cdx = parse_cdx(spark.createDataFrame([(l,) for l in cdx_lines], "value string"))
    rows = cdx.collect()
    assert len(rows) == 8 and all(r.http_status == 200 for r in rows)
    assert all(r.mime is None and r.digest is None for r in rows)  # absent attrs

    # fetch only 3 of the 8 records — by construction the task reads
    # length-bounded slices, never whole archives
    from pyspark.sql import functions as F

    picked = cdx.where(F.col("url").rlike("/(0|11|13)$"))
    got = read_warc_ranged(spark, picked).collect()
    assert sorted(bytes(r.body).decode() for r in got) == ["doc 0", "doc 11", "doc 13"]
    assert all(r.http_status == 200 for r in got)


def test_ranged_fetch_stale_index_null_row(spark, tmp_path):
    from tcdb_spark.sources.warc import build_cdx_for, parse_cdx, read_warc_ranged

    recs = [_rec(0, b"ok")]
    path = tmp_path / "seg.warc.gz"
    blob, lines = build_cdx_for(recs, str(path))
    path.write_bytes(blob)
    bogus = [
        lines[0],
        lines[0].replace(str(path), str(tmp_path / "missing.warc.gz")),
    ]
    cdx = parse_cdx(spark.createDataFrame([(l,) for l in bogus], "value string"))
    got = {r.warc_file: r for r in read_warc_ranged(spark, cdx).collect()}
    assert bytes(got[str(path)].body) == b"ok"
    missing = got[str(tmp_path / "missing.warc.gz")]
    assert missing.record_id is None and missing.body is None


def test_surt_twins_agree():
    from tcdb_spark.sources.web import surt

    assert surt("https://www.Example.ORG:8443/a/b?q") == "org,example)/a/b"
    assert surt("http://x.co.uk") == "uk,co,x)/"
