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
