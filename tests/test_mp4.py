"""ISO-BMFF (MP4) demuxer conformance (sources/mp4.py).

Fixtures are hand-assembled from the ISO/IEC 14496-12 box definitions —
the same discipline as test_codec_conformance.py: each structural
variant the spec allows (co64, largesize boxes, size==0 trailing box,
version-1 full boxes, fixed-size stsz, multi-run stsc, stss) is built
HERE, independently of the writer, so a writer/parser shared bug cannot
self-attest.  End-to-end, the existing video near-dup machinery must
produce identical results for the same JPEG frames packed as MP4 and as
TCVC (container-invariance), and non-decodable codecs must degrade to
header-only metadata without failing tasks.
"""

from __future__ import annotations

import struct

import pytest

from tcdb_spark.sources.mp4 import (
    DECODABLE_VIDEO_CODECS,
    encode_mp4_mjpeg,
    is_mp4,
    iter_boxes,
    parse_mp4,
    video_track_meta,
)
from tcdb_spark.sources.multimodal import decode_ppm, encode_jpeg, make_patterned_ppm
from tcdb_spark.sources.video import (
    decode_video_meta,
    encode_video,
    iter_video_frames,
    video_frame_hashes,
    video_near_dup_pairs,
)


def _jpeg_frames(prefix: str, n: int, brightness: int = 0) -> list[bytes]:
    return [
        encode_jpeg(
            decode_ppm(make_patterned_ppm(f"{prefix}-{i}", brightness=brightness))[
                "pixels"
            ],
            quant=1,
        )
        for i in range(n)
    ]


# --------------------------------------------------------------------------
# Hand-assembled fixture builder (independent of encode_mp4_mjpeg).
# --------------------------------------------------------------------------


def _b(fourcc: bytes, body: bytes, largesize: bool = False, zero: bool = False) -> bytes:
    if zero:  # size==0: box extends to the end of the file (§4.2)
        return struct.pack(">I", 0) + fourcc + body
    if largesize:
        return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _fb(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _b(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def build_mp4(
    samples: list[bytes],
    codec: bytes = b"jpeg",
    fps: float = 3.0,
    width: int = 32,
    height: int = 24,
    co64: bool = False,
    largesize_mdat: bool = False,
    v1_headers: bool = False,
    fixed_stsz: bool = False,
    stss: list[int] | None = None,
    chunking: list[int] | None = None,
    moov_zero_size: bool = False,
) -> bytes:
    """Assemble ftyp + mdat + moov straight from the 14496-12 box
    layouts, with every parser-visible structural variant switchable."""
    n = len(samples)
    timescale = 30000
    delta = round(timescale / fps)
    duration = n * delta
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _b(b"mdat", b"".join(samples), largesize=largesize_mdat)
    base = len(ftyp) + (16 if largesize_mdat else 8)

    sizes = [len(s) for s in samples]
    chunking = chunking or [1] * n  # samples per chunk, default 1:1
    assert sum(chunking) == n
    chunk_offsets, runs, pos, cur = [], [], base, 0
    for chunk_no, take in enumerate(chunking, start=1):
        chunk_offsets.append(pos)
        pos += sum(sizes[cur : cur + take])
        cur += take
        if not runs or runs[-1][1] != take:
            runs.append((chunk_no, take))

    entry = (
        struct.pack(">I", 86)
        + codec
        + b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    if fixed_stsz:
        assert len(set(sizes)) == 1
        stsz = _fb(b"stsz", 0, 0, struct.pack(">II", sizes[0], n))
    else:
        stsz = _fb(
            b"stsz", 0, 0, struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes)
        )
    if co64:
        stco = _fb(
            b"co64",
            0,
            0,
            struct.pack(">I", len(chunk_offsets))
            + struct.pack(f">{len(chunk_offsets)}Q", *chunk_offsets),
        )
    else:
        stco = _fb(
            b"stco",
            0,
            0,
            struct.pack(">I", len(chunk_offsets))
            + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
        )
    stbl_parts = [
        _fb(b"stsd", 0, 0, struct.pack(">I", 1) + entry),
        _fb(b"stts", 0, 0, struct.pack(">III", 1, n, delta)),
        _fb(
            b"stsc",
            0,
            0,
            struct.pack(">I", len(runs))
            + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
        ),
        stsz,
        stco,
    ]
    if stss is not None:
        stbl_parts.append(
            _fb(
                b"stss",
                0,
                0,
                struct.pack(">I", len(stss)) + struct.pack(f">{len(stss)}I", *stss),
            )
        )
    minf = _b(
        b"minf",
        _fb(b"vmhd", 0, 1, b"\x00" * 8)
        + _b(b"dinf", _fb(b"dref", 0, 0, struct.pack(">I", 1) + _fb(b"url ", 0, 1, b"")))
        + _b(b"stbl", b"".join(stbl_parts)),
    )
    if v1_headers:
        mdhd = _fb(
            b"mdhd",
            1,
            0,
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        tkhd = _fb(
            b"tkhd",
            1,
            7,
            struct.pack(">QQIIQ", 0, 0, 7, 0, duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        mvhd = _fb(
            b"mvhd",
            1,
            0,
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 8),
        )
    else:
        mdhd = _fb(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        tkhd = _fb(
            b"tkhd",
            0,
            7,
            struct.pack(">IIIII", 0, 0, 7, 0, duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        mvhd = _fb(
            b"mvhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 8),
        )
    hdlr = _fb(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"vh\x00")
    moov = _b(
        b"moov", mvhd + _b(b"trak", tkhd + _b(b"mdia", mdhd + hdlr + minf)),
        zero=moov_zero_size,
    )
    return ftyp + mdat + moov


_SAMPLES = [f"sample-{i}".encode() * (i + 1) for i in range(7)]


def _assert_track(payload: bytes, samples: list[bytes], **expect):
    meta = video_track_meta(payload)
    assert meta["n_frames"] == len(samples)
    for i, (off, ln) in enumerate(zip(meta["offsets"], meta["lengths"])):
        assert payload[off : off + ln] == samples[i], f"sample {i} range wrong"
    for k, v in expect.items():
        assert meta[k] == v, (k, meta[k], v)


def test_handwritten_baseline_parses():
    _assert_track(
        build_mp4(_SAMPLES), _SAMPLES, codec="jpeg", width=32, height=24,
        decodable=True, keyframes=None,
    )
    assert abs(video_track_meta(build_mp4(_SAMPLES))["fps"] - 3.0) < 1e-9


def test_co64_and_largesize_and_zero_size_variants():
    _assert_track(build_mp4(_SAMPLES, co64=True), _SAMPLES)
    _assert_track(build_mp4(_SAMPLES, largesize_mdat=True), _SAMPLES)
    _assert_track(build_mp4(_SAMPLES, moov_zero_size=True), _SAMPLES)
    _assert_track(
        build_mp4(_SAMPLES, co64=True, largesize_mdat=True, v1_headers=True), _SAMPLES
    )


def test_version1_fullboxes():
    m = video_track_meta(build_mp4(_SAMPLES, v1_headers=True))
    assert m["n_frames"] == 7 and abs(m["fps"] - 3.0) < 1e-9


def test_fixed_stsz():
    same = [b"x" * 20 for _ in range(4)]
    _assert_track(build_mp4(same, fixed_stsz=True), same)


def test_multi_run_stsc_chunking():
    # 3+3+1 -> two stsc runs; 2+2+2+1 -> two runs; 1:1 -> one run
    for chunking in ([3, 3, 1], [2, 2, 2, 1], [7], [1] * 7, [4, 1, 1, 1]):
        _assert_track(build_mp4(_SAMPLES, chunking=chunking), _SAMPLES)


def test_stss_keyframes():
    m = video_track_meta(build_mp4(_SAMPLES, stss=[1, 4, 7]))
    assert m["keyframes"] == [1, 4, 7]


def test_non_decodable_codec_header_only():
    m = video_track_meta(build_mp4(_SAMPLES, codec=b"avc1"))
    assert m["codec"] == "avc1" and m["decodable"] is False
    assert m["n_frames"] == 7 and m["width"] == 32  # full header metadata
    with pytest.raises(NotImplementedError, match="avc1"):
        list(iter_video_frames(build_mp4(_SAMPLES, codec=b"avc1")))
    assert "avc1" not in DECODABLE_VIDEO_CODECS


def test_malformed_inputs_raise():
    good = build_mp4(_SAMPLES)
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08abcd")  # not a leader fourcc
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(good[: good.index(b"moov") - 4])  # moov stripped
    # box claiming more bytes than its container has
    bad = bytearray(good)
    moov_at = good.index(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(good))  # oversize moov
    with pytest.raises(ValueError, match="claims"):
        parse_mp4(bytes(bad[: len(bad) - 4]))
    assert not is_mp4(b"shrt") and not is_mp4(b"")


def test_sample_table_inconsistency_raises():
    # stsc x stco place fewer samples than stsz declares
    payload = bytearray(build_mp4(_SAMPLES, chunking=[7]))
    # fourcc, then 4 bytes version/flags, then entry_count
    struct.pack_into(">I", payload, payload.index(b"stco") + 8, 0)  # zero chunks
    with pytest.raises(ValueError, match="inconsistent|stco"):
        video_track_meta(bytes(payload))


def test_writer_output_conforms_and_round_trips():
    frames = _jpeg_frames("wr", 5)
    mp4 = encode_mp4_mjpeg(frames, fps=2.0)
    # top-level structure: exactly ftyp, mdat, moov in order
    assert [n for n, _, _ in iter_boxes(mp4)] == ["ftyp", "mdat", "moov"]
    _assert_track(mp4, frames, codec="jpeg", decodable=True)
    meta = parse_mp4(mp4)
    assert meta["brand"] == "isom"
    t = meta["tracks"][0]
    assert (t["width"], t["height"]) == (32, 24)  # sniffed from SOF
    assert abs(t["fps"] - 2.0) < 1e-9
    with pytest.raises(ValueError):
        encode_mp4_mjpeg([])


def test_seam_routing_tcvc_vs_mp4_vs_garbage():
    frames = _jpeg_frames("rt", 3)
    assert decode_video_meta(encode_video(frames))["codec"] == "tcvc"
    assert decode_video_meta(encode_mp4_mjpeg(frames))["codec"] == "jpeg"
    with pytest.raises(ValueError, match="TCVC or ISO-BMFF"):
        decode_video_meta(b"\x89PNG\r\n\x1a\nnot-a-video")


def test_container_invariance_near_dup(spark):
    """The SAME JPEG frames packed as MP4 and as TCVC must yield
    identical frame hashes and identical near-dup verdicts — the
    demuxer only changes how byte ranges are found, never the bytes."""
    v1 = _jpeg_frames("cv1", 6)
    v2 = _jpeg_frames("cv1", 6, brightness=6)  # re-encode class
    v3 = _jpeg_frames("cv3", 6)  # unrelated
    rows = []
    for vid, frames in ((1, v1), (2, v2), (3, v3)):
        rows.append((vid, bytearray(encode_mp4_mjpeg(frames, fps=2.0))))
        rows.append((vid + 100, bytearray(encode_video(frames, fps=2.0))))
    media = spark.createDataFrame(rows, "video_id long, payload binary")
    hashes = video_frame_hashes(media).collect()
    # per-frame hashes identical across containers
    twin = {(r["video_id"], r["frame_idx"]): r["ahash"] for r in hashes}
    assert len(twin) == 36  # 3 videos x 6 frames x 2 containers
    for (vid, idx), h in twin.items():
        other = vid + 100 if vid < 100 else vid - 100
        assert twin[(other, idx)] == h, (vid, idx)
    # identical near-dup verdicts (counts included)
    mp4_pairs = {
        (r["video_id_a"], r["video_id_b"], r["matched_a"], r["matched_b"])
        for r in video_near_dup_pairs(
            video_frame_hashes(media.where("video_id < 100"))
        ).collect()
    }
    tcvc_pairs = {
        (r["video_id_a"] - 100, r["video_id_b"] - 100, r["matched_a"], r["matched_b"])
        for r in video_near_dup_pairs(
            video_frame_hashes(media.where("video_id >= 100"))
        ).collect()
    }
    assert mp4_pairs == tcvc_pairs and (1, 2) in {(a, b) for a, b, *_ in mp4_pairs}


def test_avc1_video_in_frame_hashes_emits_metadata_row(spark):
    media = spark.createDataFrame(
        [(9, bytearray(build_mp4(_SAMPLES, codec=b"avc1")))],
        "video_id long, payload binary",
    )
    rows = video_frame_hashes(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_frames"] == 7 and r["frame_idx"] is None and r["ahash"] is None
