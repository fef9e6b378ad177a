"""WARC (Web ARChive, ISO 28500) reader/writer — pure stdlib.

Common Crawl — the input corpus of C4/RefinedWeb-class pretraining
pipelines — ships as ``.warc.gz``: a concatenation of per-record gzip
members, each member one WARC record (version line, CRLF-delimited
named headers, ``Content-Length`` octet-counted payload, blank-line
terminators).  ``response`` records carry a full HTTP/1.x response
(status line + headers + body) as their payload.

This module implements the subset a corpus pipeline needs:

- :func:`build_warc` — compose spec-shaped WARC bytes (optionally as
  per-record gzip members, the standard Common Crawl layout) for
  fixtures, tests and the round-trip lane;
- :func:`iter_warc_records` — parse plain or gzipped WARC bytes into
  record dicts, tolerant of LF-only line endings and unknown headers,
  strict about ``Content-Length`` octet accounting (the payload is
  sliced by byte count, never re-scanned for delimiters — binary-safe);
- :func:`parse_http_response` — split a response payload into status /
  headers / body;
- :func:`read_warc` — the distributed path: ``spark.read.format
  ("binaryFile")`` over a path glob, one Arrow ``mapInPandas`` parse
  per file.  Files are the parallelism unit, exactly like production
  Spark WARC readers: WARC has no mid-file split points without a
  side index (``.cdx``), and Common Crawl segments are ~1 GB gzip
  members, so file-granular tasks are the right shape at 100 TB.

Scale notes: per-record gzip members decompress lazily (member by
member via zlib) so a task's peak memory is one record, not one file;
``max_payload_bytes`` caps a hostile record.  Reference-anchor: a
§2.12 extension (the reference's sources are ATCF decks; SURVEY.md §2.1
scan family is the analog).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"


def _warc_headers(fields: dict[str, str], content_length: int) -> bytes:
    lines = [b"WARC/1.0"]
    for k, v in fields.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {content_length}".encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF


def build_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Compose the HTTP/1.1 response payload of a ``response`` record."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Compose WARC bytes from record dicts with keys ``warc_type``,
    ``target_uri`` (optional), ``date`` (ISO-8601), ``record_id``,
    ``payload`` (bytes).  ``gzip_members=True`` emits one gzip member
    per record — the standard ``.warc.gz`` layout (members MUST be
    per-record for a seekable archive; a whole-file stream still parses
    here but cannot be range-read)."""
    out = []
    for r in records:
        fields = {
            "WARC-Type": r["warc_type"],
            "WARC-Record-ID": r["record_id"],
            "WARC-Date": r["date"],
        }
        if r.get("target_uri"):
            fields["WARC-Target-URI"] = r["target_uri"]
        if r["warc_type"] == "response":
            fields["Content-Type"] = "application/http; msgtype=response"
        payload = r["payload"]
        rec = _warc_headers(fields, len(payload)) + payload + CRLF + CRLF
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


def _gunzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time
    (bounded memory: one member inflated at once)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        chunk = d.decompress(data[pos:])
        yield chunk
        if not d.unused_data:
            break
        pos = len(data) - len(d.unused_data)


def iter_warc_records(
    data: bytes, max_payload_bytes: int = 64 << 20
) -> Iterator[dict]:
    """Parse WARC bytes (plain or gzipped) into dicts with keys
    ``warc_type target_uri date record_id headers payload``.

    Framing is strict: the payload is sliced by ``Content-Length``
    octets (binary-safe — bodies may contain blank lines or even
    ``WARC/1.0``), then the two terminating newlines are skipped.  A
    record whose declared length exceeds ``max_payload_bytes`` or runs
    past the buffer ends the iteration (truncated archive) rather than
    raising — partial archives yield their complete prefix, matching
    the repo's truncation discipline for media containers."""
    if data[:2] == b"\x1f\x8b":
        # a corrupt/truncated member ends the stream at the last member
        # that inflated cleanly — the same complete-prefix discipline as
        # octet framing below; never let zlib.error escape the iterator
        chunks: list[bytes] = []
        try:
            for c in _gunzip_members(data):
                chunks.append(c)
        except zlib.error:
            pass
        data = b"".join(chunks)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate stray newlines between records
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        if head_end == -1:
            head_end = data.find(b"\n\n", pos)
            sep = 2
        if head_end == -1:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.splitlines()
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        if clen < 0 or clen > max_payload_bytes:
            return
        body_start = head_end + sep
        if body_start + clen > n:
            return  # truncated payload: stop at the last complete record
        yield {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "headers": headers,
            "payload": data[body_start : body_start + clen],
        }
        pos = body_start + clen


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an HTTP response payload -> (status, lowercase headers, body).

    Returns (0, {}, payload) when the payload is not HTTP — some WARC
    writers store raw content in response records; callers decide."""
    head_end = payload.find(b"\r\n\r\n")
    sep = 4
    if head_end == -1:
        head_end = payload.find(b"\n\n")
        sep = 2
    if head_end == -1:
        return 0, {}, payload
    head = payload[:head_end].decode("latin-1")
    lines = head.splitlines()
    parts = lines[0].split(None, 2) if lines else []
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        return 0, {}, payload
    try:
        status = int(parts[1])
    except ValueError:
        return 0, {}, payload
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[head_end + sep :]


WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def records_frame(df: DataFrame, file_col: str, bytes_col: str) -> DataFrame:
    """(file, warc_bytes) -> one row per record, HTTP payloads split.

    One Arrow stage, zero shuffles; non-response records pass through
    with status 0 and the raw payload as body."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, data in zip(pdf[file_col], pdf[bytes_col]):
                if data is None:
                    continue
                for rec in iter_warc_records(bytes(data)):
                    if rec["warc_type"] == "response":
                        status, hh, body = parse_http_response(rec["payload"])
                        ctype = hh.get("content-type")
                    else:
                        status, ctype, body = 0, None, rec["payload"]
                    rows.append(
                        (
                            fname,
                            rec["record_id"],
                            rec["warc_type"],
                            rec["target_uri"],
                            rec["date"],
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA])

    return df.select(file_col, bytes_col).mapInPandas(_op, schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` over ``path`` (glob ok),
    one parse task per file — the production shape for Common Crawl
    segments (no mid-file split without a .cdx side index).  Column
    pruning note: binaryFile loads whole files by design; partition
    parallelism comes from file count, so keep segments ~1 GB."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return records_frame(files, "path", "content")


# ---------------------------------------------------------------------------
# CDX index + byte-range record fetch — WARC seekability at scale.
#
# read_warc's docstring notes WARC has no mid-file split points without
# a side index; this IS that index.  Common Crawl publishes CDXJ lines:
#
#   org,example)/path 20260101000000 {"url": "...", "status": "200",
#       "offset": "5678", "length": "1234", "filename": ".../x.warc.gz"}
#
# (SURT key, 14-digit timestamp, JSON attributes).  With per-record
# gzip members (the standard layout), (filename, offset, length) slices
# ONE record out of a multi-GB archive — the ranged-GET shape the video
# source already uses for frames.  Fetching 10^4 records from 100 TB of
# archives reads ~10^4 * avg_record bytes, not the archives.
# ---------------------------------------------------------------------------


def cdx_line(surt_key: str, ts: str, attrs_json: str) -> str:
    return f"{surt_key} {ts} {attrs_json}"


CDX_ATTRS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


def parse_cdx(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """CDXJ lines -> typed columns, fully native (split-limit-3 +
    from_json + to_timestamp; zero Python).  Numeric attributes arrive
    as JSON strings in real CC indexes — cast here, NULL on garbage."""
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(F.element_at(parts, 3), CDX_ATTRS_SCHEMA)
    return lines.select(
        F.element_at(parts, 1).alias("surt_key"),
        F.to_timestamp(F.element_at(parts, 2), "yyyyMMddHHmmss").alias("capture_ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("http_status"),
        j["digest"].alias("digest"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("length"),
        j["filename"].alias("filename"),
    )


def read_warc_ranged(spark: SparkSession, cdx: DataFrame) -> DataFrame:
    """Fetch exactly the records a CDX frame points at: one seek+read
    of ``length`` bytes per row (per-record gzip members decompress
    standalone), never a full-archive scan.  Input needs (filename,
    offset, length); local paths or any fsspec-ish mount.  Rows whose
    slice fails to parse (stale index, truncated file) come back with
    NULL record fields rather than failing the task — count them."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                rows = []
                for fname, off, ln in zip(
                    pdf["filename"], pdf["offset"], pdf["length"]
                ):
                    rec = None
                    try:
                        fh = handles.get(fname)
                        if fh is None:
                            fh = handles[fname] = open(fname, "rb")
                        fh.seek(int(off))
                        blob = fh.read(int(ln))
                        rec = next(iter_warc_records(blob), None)
                    except (OSError, TypeError, ValueError):
                        # missing file, NULL offset/length from a bad
                        # index row, or a corrupt slice — same contract:
                        rec = None
                    if rec is None:
                        rows.append((fname, None, None, None, None, None, None, None))
                        continue
                    if rec["warc_type"] == "response":
                        status, hh, body = parse_http_response(rec["payload"])
                        ctype = hh.get("content-type")
                    else:
                        status, ctype, body = 0, None, rec["payload"]
                    rows.append(
                        (
                            fname,
                            rec["record_id"],
                            rec["warc_type"],
                            rec["target_uri"],
                            rec["date"],
                            status,
                            ctype,
                            body,
                        )
                    )
                yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA])
        finally:
            for fh in handles.values():
                fh.close()

    cols = ["filename", "offset", "length"]
    return cdx.select(*cols).mapInPandas(_op, schema=WARC_SCHEMA)


def build_cdx_for(records: list[dict], filename: str, gzip_members: bool = True) -> tuple[bytes, list[str]]:
    """Compose a WARC archive AND its CDXJ index together (fixtures,
    tests, the lane): returns (archive_bytes, cdx_lines) with offsets/
    lengths measured from the actual member boundaries."""
    import json as _json

    from tcdb_spark.sources.web import surt

    blobs = [build_warc([r], gzip_members=gzip_members) for r in records]
    lines, pos = [], 0
    for r, blob in zip(records, blobs):
        if r["warc_type"] == "response" and r.get("target_uri"):
            status, _, _ = parse_http_response(r["payload"])
            attrs = {
                "url": r["target_uri"],
                "status": str(status),
                "offset": str(pos),
                "length": str(len(blob)),
                "filename": filename,
            }
            ts = r["date"].replace("-", "").replace(":", "").replace("T", "").replace("Z", "")
            lines.append(cdx_line(surt(r["target_uri"]), ts, _json.dumps(attrs)))
        pos += len(blob)
    return b"".join(blobs), lines
