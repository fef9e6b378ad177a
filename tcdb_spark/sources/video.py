"""Video container plumbing + frame-sampled near-duplicate detection.

§2.12 extension surface (the reference engine has no video path).  Real
video arrives in containers whose sample tables let a reader seek
straight to frame N without decoding the stream.  Two containers route
through the one seam here (``decode_video_meta`` /
``iter_video_frames``):

- **MP4 / ISO-BMFF** (``sources/mp4.py``, round 8): the real-world
  format — the moov sample tables (stsd/stsz/stsc/stco/stts/stss) parse
  pure-stdlib into the same seek-table dict.  Motion-JPEG tracks decode
  per-frame through the native-first JPEG path, so near-dup runs on
  actual .mp4 files; inter-frame codecs (H.264/HEVC/AV1 — no decoder in
  this image) parse to full header metadata with ``decodable=False``
  and refuse frame decode with an actionable error.
- **TCVC** — the repo's minimal index-plus-payloads fixture format
  (magic, frame count, frame rate, per-frame byte lengths, payloads
  back-to-back), kept as the codec-agnostic test container (PPM/PGM and
  PNG frames, which MP4 sample entries don't carry).

Scale shape: the header is parsed without touching frame bytes, frame
SAMPLING decodes only the selected frames (byte-range slices out of the
payload — the distributed twin of ranged GETs against object storage),
payloads never cross a shuffle (hashing rides the scan;
only (video_id, frame_idx, 8-byte hash) rows continue), and the
video-level near-dup join is the frame-level banded Hamming join
(pigeonhole-exact) followed by one aggregation per candidate pair."""

from __future__ import annotations

import struct as _struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from tcdb_spark.sources.multimodal import ahash_image

_MAGIC = b"TCVC"

FRAME_HASH_SCHEMA = "video_id long, n_frames int, frame_idx int, ahash long"


def encode_video(frames: list[bytes], fps: float = 1.0) -> bytes:
    """Pack image payloads into a TCVC container: magic, u32 frame
    count, u32 fps*1000, u32 per-frame byte lengths, then the frames."""
    if not frames:
        raise ValueError("a TCVC container needs at least one frame")
    head = _MAGIC + _struct.pack("<II", len(frames), int(round(fps * 1000)))
    head += b"".join(_struct.pack("<I", len(f)) for f in frames)
    return head + b"".join(frames)


def decode_video_meta(payload: bytes) -> dict:
    """Header-only parse: {n_frames, fps, lengths, offsets, codec,
    decodable} without reading a single frame byte — the seek-table
    property that makes frame sampling cheap.  Routes by container:
    TCVC magic first, then ISO-BMFF (MP4/MOV) via the stdlib box-tree
    demuxer in ``sources/mp4.py``."""
    if payload[:4] != _MAGIC:
        from tcdb_spark.sources.mp4 import is_mp4, video_track_meta

        if is_mp4(bytes(payload[:16])):
            return video_track_meta(payload)
        raise ValueError("not a TCVC or ISO-BMFF (MP4) video payload")
    if len(payload) < 12:
        raise ValueError("truncated TCVC header")
    n, fps_milli = _struct.unpack_from("<II", payload, 4)
    table_end = 12 + 4 * n
    if len(payload) < table_end:
        raise ValueError("truncated TCVC frame table")
    lengths = list(_struct.unpack_from(f"<{n}I", payload, 12))
    offsets, pos = [], table_end
    for ln in lengths:
        offsets.append(pos)
        pos += ln
    if len(payload) < pos:
        raise ValueError("TCVC payload shorter than frame table claims")
    return {
        "n_frames": n,
        "fps": fps_milli / 1000.0,
        "lengths": lengths,
        "offsets": offsets,
        "codec": "tcvc",
        "decodable": True,
    }


def iter_video_frames(
    payload: bytes, every_n: int = 1
) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_idx, frame_bytes) for every ``every_n``-th frame —
    only the selected byte ranges are sliced; skipped frames are never
    materialized.  Refuses tracks whose codec has no image decoder in
    this image (H.264/HEVC/AV1 samples are NAL units, not images)."""
    meta = decode_video_meta(payload)
    if not meta.get("decodable", True):
        raise NotImplementedError(
            f"no decoder for video codec '{meta.get('codec')}' in this "
            "image — header metadata (dims/fps/byte ranges/keyframes) is "
            "available via decode_video_meta; transcode the track to "
            "Motion-JPEG for frame-level work"
        )
    for idx in range(0, meta["n_frames"], every_n):
        off, ln = meta["offsets"][idx], meta["lengths"][idx]
        yield idx, payload[off : off + ln]


def video_frame_hashes(media: DataFrame, every_n: int = 1) -> DataFrame:
    """(video_id, payload) -> (video_id, n_frames, frame_idx, ahash):
    sample every ``every_n``-th frame, decode it (PPM/PNG/JPEG through
    the native-first seam) and emit its 64-bit perceptual hash.  One
    Arrow-batched mapInPandas riding the scan; a video whose container
    fails to parse yields a single null-hash row (schema-stable — the
    caller filters), a parsed container whose CODEC has no decoder
    (e.g. an H.264 MP4 track) yields one row carrying n_frames with a
    null frame_idx/hash (metadata survives; no NAL bytes are sliced),
    and an individual undecodable FRAME yields a null hash at its index
    without sinking the clip."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vid_col, nf_col, idx_col, hash_col = [], [], [], []
            for vid, p in zip(pdf["video_id"], pdf["payload"]):
                try:
                    payload = bytes(p)
                    meta = decode_video_meta(payload)
                except (ValueError, TypeError):
                    vid_col.append(vid)
                    nf_col.append(None)
                    idx_col.append(None)
                    hash_col.append(None)
                    continue
                if not meta.get("decodable", True):
                    vid_col.append(vid)
                    nf_col.append(meta["n_frames"])
                    idx_col.append(None)
                    hash_col.append(None)
                    continue
                for idx, frame in iter_video_frames(payload, every_n):
                    vid_col.append(vid)
                    nf_col.append(meta["n_frames"])
                    idx_col.append(idx)
                    try:
                        v = ahash_image(frame)
                        hash_col.append(v - (1 << 64) if v >= (1 << 63) else v)
                    except (ValueError, NotImplementedError):
                        hash_col.append(None)
            yield pd.DataFrame(
                {
                    "video_id": vid_col,
                    "n_frames": nf_col,
                    "frame_idx": idx_col,
                    "ahash": hash_col,
                }
            )

    return media.select("video_id", "payload").mapInPandas(
        _op, schema=FRAME_HASH_SCHEMA
    )


def video_near_dup_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 7,
    bands: int = 8,
    min_match_frac: float = 0.6,
) -> DataFrame:
    """Video-level near-duplicates from frame-level hash matches.

    Stage 1 — frame matches: banded Hamming equi-join over the per-frame
    hashes (pigeonhole-EXACT for ``max_hamming < bands``, identical
    machinery to ``media_near_dup_pairs``), keeping cross-video frame
    pairs within the threshold.  No frame alignment is required at this
    stage, so trimmed and shifted copies still match.

    Stage 2 — one aggregation per candidate video pair: count DISTINCT
    matched sampled-frame indices on each side and divide by each
    side's sampled-frame count; keep pairs whose LARGER coverage
    fraction reaches ``min_match_frac`` (containment semantics: a
    trimmed copy covers 100% of the shorter video — the max, like the
    text containment_join — while re-encodes cover ~100% of both).

    Output: (video_id_a, video_id_b, matched_a, matched_b,
    match_frac_a, match_frac_b), fractions rounded to 4 places.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"banded join is only exact for max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    band_exprs = ", ".join(
        f"CAST(shiftrightunsigned(ahash, {width * (bands - 1 - b)}) & {mask} AS INT)"
        for b in range(bands)
    )
    # Barrier: the hash table feeds BOTH sides of the self-join AND the
    # count denominators — without it the decode+hash mapInPandas runs
    # three times (same discipline as dedup_minhash_lsh's sigs persist).
    fh = frame_hashes.where(F.col("ahash").isNotNull()).persist()
    # sampled-frame count per video (the verify denominators)
    counts = fh.groupBy("video_id").agg(F.count("*").alias("n_sampled"))
    banded = fh.selectExpr(
        "video_id",
        "frame_idx",
        "ahash",
        f"posexplode(array({band_exprs})) AS (band, bval)",
    )
    a, b = banded.alias("a"), banded.alias("b")
    frame_matches = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.video_id") < F.col("b.video_id")),
        )
        .select(
            F.col("a.video_id").alias("video_id_a"),
            F.col("b.video_id").alias("video_id_b"),
            F.col("a.frame_idx").alias("frame_a"),
            F.col("b.frame_idx").alias("frame_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()  # a frame pair can collide in several bands
        .where(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
        )
    )
    pair_cov = frame_matches.groupBy("video_id_a", "video_id_b").agg(
        F.countDistinct("frame_a").alias("matched_a"),
        F.countDistinct("frame_b").alias("matched_b"),
    )
    ca = counts.select(
        F.col("video_id").alias("video_id_a"), F.col("n_sampled").alias("n_a")
    )
    cb = counts.select(
        F.col("video_id").alias("video_id_b"), F.col("n_sampled").alias("n_b")
    )
    # counts is tiny relative to the frame table (one row per video) —
    # broadcast both sides so the coverage join never shuffles pair_cov
    scored = (
        pair_cov.join(F.broadcast(ca), "video_id_a")
        .join(F.broadcast(cb), "video_id_b")
        .select(
            "video_id_a",
            "video_id_b",
            "matched_a",
            "matched_b",
            # gate on the UNROUNDED fractions (a pair at true coverage
            # min_match_frac - 5e-5 must not slip through via HALF_UP
            # rounding at >=10k sampled frames); round only the emitted
            # columns
            (F.col("matched_a") / F.col("n_a")).alias("_frac_a"),
            (F.col("matched_b") / F.col("n_b")).alias("_frac_b"),
        )
    )
    return (
        scored.where(F.greatest("_frac_a", "_frac_b") >= min_match_frac)
        .withColumn("match_frac_a", F.round(F.col("_frac_a"), 4))
        .withColumn("match_frac_b", F.round(F.col("_frac_b"), 4))
        .drop("_frac_a", "_frac_b")
    )


def _resize_frame(frame: bytes, out_w: int, out_h: int) -> bytes:
    from tcdb_spark.sources.multimodal import (
        _JPEG_MAGIC,
        _PNG_MAGIC,
        resize_jpeg,
        resize_png,
        resize_ppm,
    )

    if frame[:2] in (b"P5", b"P6"):
        return resize_ppm(frame, out_w, out_h)
    if frame[:8] == _PNG_MAGIC:
        return resize_png(frame, out_w, out_h)
    if frame[:3] == _JPEG_MAGIC:
        return resize_jpeg(frame, out_w, out_h)
    raise ValueError("unrecognized frame format")


RESIZED_VIDEO_SCHEMA = (
    "video_id long, n_frames int, n_sampled int, payload binary"
)


def video_resize_frames(
    media: DataFrame, out_w: int, out_h: int, every_n: int = 1
) -> DataFrame:
    """Video preprocessing in one pass: sample every ``every_n``-th
    frame (byte-range slices — skipped frames never decode), resize
    each sampled frame for real (PPM/PNG/JPEG through the same
    per-format resizers the image lane uses), and re-pack into a new
    TCVC container whose fps is scaled by the stride — the
    vision-model preprocessing shape (decode -> resize -> re-encode
    rides the scan; payloads never shuffle).  A video whose container
    fails to parse yields a null payload row; a single bad FRAME is
    dropped from the output container without sinking the clip (its
    absence is visible as n_sampled < ceil(n_frames / every_n))."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vid_col, nf_col, ns_col, out_col = [], [], [], []
            for vid, p in zip(pdf["video_id"], pdf["payload"]):
                vid_col.append(vid)
                try:
                    payload = bytes(p)
                    meta = decode_video_meta(payload)
                except (ValueError, TypeError):
                    nf_col.append(None)
                    ns_col.append(None)
                    out_col.append(None)
                    continue
                frames = []
                for _, frame in iter_video_frames(payload, every_n):
                    try:
                        frames.append(_resize_frame(frame, out_w, out_h))
                    except (ValueError, NotImplementedError):
                        pass
                nf_col.append(meta["n_frames"])
                ns_col.append(len(frames))
                out_col.append(
                    encode_video(frames, fps=meta["fps"] / every_n)
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {
                    "video_id": vid_col,
                    "n_frames": nf_col,
                    "n_sampled": ns_col,
                    "payload": out_col,
                }
            )

    return media.select("video_id", "payload").mapInPandas(
        _op, schema=RESIZED_VIDEO_SCHEMA
    )
