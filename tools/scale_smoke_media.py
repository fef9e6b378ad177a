"""Codec throughput scale smoke (VERDICT r5 #2): quantify the
pure-stdlib decode ceiling so the native-library swap math in
OPERATIONS.md rests on measured numbers, not guesses.

Two measurements:

1. Single-core decode MB/s per format (the per-task rate any cluster
   sizing starts from).  PNG is measured twice — the repo encoder
   writes filter-0 rows, but real-world PNGs are predominantly
   Paeth-filtered, so a Paeth-filtered fixture (built independently,
   same construction as tests/test_codec_conformance.py) gives the
   honest number.
2. The distributed lanes: >= 10^4 mixed-format payloads through
   extract_features AND media_ahash on local[32] — wall time and
   aggregate payload MB/s.

Usage: python tools/scale_smoke_media.py [n_payloads]
"""

from __future__ import annotations

import os
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _paeth_png(px: np.ndarray) -> bytes:
    """Independently-built PNG with every row Paeth-filtered (type 4)."""
    h, w, c = px.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        line = px[y].ravel().astype(np.int64)
        row = bytearray([4])
        lst, pv = line.tolist(), prev.tolist()
        for x in range(w * c):
            a = lst[x - bpp] if x >= bpp else 0
            b = pv[x]
            cc = pv[x - bpp] if x >= bpp else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            row.append((lst[x] - pred) & 255)
        raw += row
        prev = line

    def chunk(cid: bytes, body: bytes) -> bytes:
        d = cid + body
        return struct.pack(">I", len(body)) + d + struct.pack(">I", zlib.crc32(d))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def build_payloads() -> dict[str, bytes]:
    from tcdb_spark.sources.multimodal import (
        encode_flac,
        encode_jpeg,
        encode_png,
        make_test_ppm,
        make_test_wav,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # smooth-ish image so JPEG entropy data is realistic, not max-entropy
    smooth = (
        np.add.outer(np.arange(64) * 2, np.arange(64))[..., None]
        + rng.integers(0, 32, (64, 64, 3))
    ).astype(np.uint8)
    wav = make_test_wav(sample_rate=8000, n_frames=4000)
    samples = np.sin(np.linspace(0, 300, 4000))[:, None] * 0.4
    return {
        "ppm": make_test_ppm(64, 64),
        "png_filter0": encode_png(img),
        "png_paeth": _paeth_png(smooth),
        "jpeg_baseline": encode_jpeg(smooth, quant=4),
        "jpeg_progressive": encode_jpeg(smooth, quant=4, progressive=True),
        "wav": wav,
        "flac": encode_flac(samples, sample_rate=8000),
    }


def single_core(payloads: dict[str, bytes], path_label: str) -> list[str]:
    """Per-format decode rate through media_features. ``path_label``
    names the routing in effect (``stdlib`` = kill switch set, ``native``
    = libjpeg/libpng where the format has one — WAV/FLAC/PPM always
    take the pure-Python decoders)."""
    from tcdb_spark.sources.multimodal import media_features

    lines = []
    for fmt, payload in payloads.items():
        # warm
        media_features(payload)
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 2.0:
            media_features(payload)
            n += 1
        dt = time.perf_counter() - t0
        mbs = len(payload) * n / dt / 1e6
        per = dt / n * 1000
        lines.append(
            f"| {fmt} | {path_label} | {len(payload)} B | {per:.2f} ms | {mbs:.2f} MB/s |"
        )
        print(lines[-1], flush=True)
    return lines


def distributed(payloads: dict[str, bytes], n_total: int, path_label: str) -> list[str]:
    """One SparkSession per routing path: the kill switch must reach the
    PYTHON WORKERS, whose environment is fixed when the worker daemon
    spawns — so it rides ``spark.executorEnv.*`` on a fresh context, not
    a post-hoc driver ``os.environ`` write (which workers never see)."""
    from tcdb_spark.session import get_spark
    from tcdb_spark.sources.multimodal import extract_features, media_ahash

    spark = get_spark(
        f"media-smoke-{path_label}",
        extra_conf={
            "spark.executorEnv.TCDB_SPARK_NATIVE_CODECS": (
                "0" if path_label == "stdlib" else "1"
            )
        },
    )
    fmts = list(payloads)
    rows = [
        (i, bytearray(payloads[fmts[i % len(fmts)]]), fmts[i % len(fmts)])
        for i in range(n_total)
    ]
    total_mb = sum(len(r[1]) for r in rows) / 1e6
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string"
    ).repartition(32).persist()
    media.count()

    lines = []
    for name, fn in (
        ("extract_features", lambda: extract_features(media)),
        ("media_ahash", lambda: media_ahash(media)),
    ):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        lines.append(
            f"| {name} [{path_label}]: {n_total} mixed payloads "
            f"({total_mb:.1f} MB) on local[32] | {dt:.1f} s "
            f"| {total_mb / dt:.1f} MB/s aggregate |"
        )
        print(lines[-1], flush=True)
    media.unpersist()
    spark.stop()
    return lines


def main() -> None:
    from tcdb_spark.sources import native_codecs

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    payloads = build_payloads()
    print("| format | path | payload | decode | throughput |")
    print("|---|---|---|---|---|")
    os.environ["TCDB_SPARK_NATIVE_CODECS"] = "0"
    sc = single_core(payloads, "stdlib")
    os.environ.pop("TCDB_SPARK_NATIVE_CODECS")
    have_native = native_codecs.jpeg_available() or native_codecs.png_available()
    if have_native:
        sc += single_core(payloads, "native")
    dist = distributed(payloads, n_total, "stdlib")
    if have_native:
        dist += distributed(payloads, n_total, "native")
    print("\nsingle-core rows:\n" + "\n".join(sc))
    print("\ndistributed rows:\n" + "\n".join(dist))


if __name__ == "__main__":
    main()
