"""ISO Base Media File Format (MP4 / ISO-BMFF, ISO/IEC 14496-12) demuxer.

Closes the last real-world-input gap in the video path (§2.12 extension;
the reference engine has no video surface): a user's ``.mp4``/``.mov``
files now route through the SAME seam the TCVC container established —
``decode_video_meta`` returns the seek-table dict ``{n_frames, fps,
lengths, offsets}`` and frame sampling stays a byte-range slice per
selected sample, never a full-stream decode.

What an MP4 actually is, for our purposes, is exactly that seek table:
the ``moov`` box is an index over the ``mdat`` payload.  Per video
track, the sample-table boxes give everything frame sampling needs
without touching a frame byte:

- ``stsd``  — codec fourcc + coded width/height (VisualSampleEntry)
- ``stsz``  — per-sample byte sizes (or one fixed size)
- ``stsc``  — sample→chunk run-length map
- ``stco``/``co64`` — absolute file offsets of each chunk (32/64-bit)
- ``stts``  — time deltas (→ fps via the mdhd timescale)
- ``stss``  — sync (key) samples; absent means every sample is sync

Per-sample file offsets fall out of the classic stsc×stco×stsz walk
(14496-12 §8.7.4/8.7.5): expand the stsc runs to a samples-per-chunk
vector, then accumulate sizes within each chunk starting at its stco
offset.

Codec policy (the documented seam): Motion-JPEG tracks (``jpeg``,
``mjpa`` — each sample is a self-contained JFIF image) decode through
the repo's existing native-first JPEG path, so ``video_near_dup`` runs
unmodified on real .mp4 files.  Compressed inter-frame codecs (``avc1``
H.264, ``hvc1``/``hev1`` HEVC, ``vp09``, ``av01``) have no decoder in
this image: their tracks parse to full header metadata (codec, dims,
fps, per-sample byte ranges, keyframe table) with ``decodable=False``,
and the frame iterator refuses with an actionable error instead of
handing NAL units to an image hasher.

Pure stdlib (``struct`` only), like the MAT5/Avro/codec readers; the
writer emits spec-conformant minimal files (ftyp+mdat+moov) used by the
conformance fixtures AND as a general MJPEG packager.  Box layouts are
derived from the ISO/IEC 14496-12 box definitions, not from any
existing parser.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

# Sample-entry fourccs whose samples are self-contained JPEG images —
# decodable by sources/multimodal.decode_jpeg (native-first seam).
DECODABLE_VIDEO_CODECS = frozenset({"jpeg", "mjpa"})

# Fourccs that may legitimately lead a file (first top-level box).
_TOP_LEVEL_LEADERS = (b"ftyp", b"styp", b"moov", b"mdat", b"free", b"skip", b"wide")


def is_mp4(payload: bytes) -> bool:
    """Cheap sniff: a plausible big-endian box header whose type is a
    legal file-leading fourcc.  ``ftyp`` is near-universal; the others
    cover brand-less QuickTime-era files."""
    if len(payload) < 8:
        return False
    return payload[4:8] in _TOP_LEVEL_LEADERS


def iter_boxes(
    buf: bytes, start: int = 0, end: int | None = None
) -> Iterator[tuple[str, int, int]]:
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    ``buf[start:end]`` (one nesting level; recurse into container boxes
    by calling again on the body range).

    Handles the three header forms of 14496-12 §4.2: u32 size, size==1
    (u64 largesize follows the type), size==0 (box runs to the end of
    the enclosing container), and the ``uuid`` 16-byte usertype."""
    if end is None:
        end = len(buf)
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError(f"truncated box header at offset {pos}")
        (size,) = _struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if end - pos < 16:
                raise ValueError(f"truncated largesize header at offset {pos}")
            (size,) = _struct.unpack_from(">Q", buf, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if fourcc == b"uuid":
            header += 16
        if size < header or pos + size > end:
            raise ValueError(
                f"box '{fourcc.decode('latin-1')}' at offset {pos} claims "
                f"{size} bytes, container has {end - pos}"
            )
        yield fourcc.decode("latin-1"), pos + header, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: str) -> tuple[int, int]:
    for name, b, e in iter_boxes(buf, start, end):
        if name == fourcc:
            return b, e
    raise ValueError(f"required box '{fourcc}' not found")


def _find_opt(buf: bytes, start: int, end: int, fourcc: str) -> tuple[int, int] | None:
    for name, b, e in iter_boxes(buf, start, end):
        if name == fourcc:
            return b, e
    return None


def _fullbox(buf: bytes, body: int) -> tuple[int, int, int]:
    """(version, flags, payload_start) of a FullBox body."""
    version = buf[body]
    flags = int.from_bytes(buf[body + 1 : body + 4], "big")
    return version, flags, body + 4


def _u32_list(buf: bytes, pos: int, n: int) -> list[int]:
    return list(_struct.unpack_from(f">{n}I", buf, pos))


def _parse_stsd(buf: bytes, b: int, e: int) -> dict:
    _, _, p = _fullbox(buf, b)
    (entry_count,) = _struct.unpack_from(">I", buf, p)
    if entry_count < 1:
        raise ValueError("stsd with no sample entries")
    # first sample entry: a box whose fourcc is the codec id, body is a
    # SampleEntry (6 reserved + u16 data_reference_index) then, for
    # video handlers, the VisualSampleEntry fixed layout (§12.1.3)
    entries = iter_boxes(buf, p + 4, e)
    codec, sb, se = next(entries)
    out = {"codec": codec.strip(), "width": None, "height": None}
    if se - sb >= 8 + 70:  # SampleEntry + VisualSampleEntry fixed part
        w, h = _struct.unpack_from(">HH", buf, sb + 8 + 16)
        if 0 < w <= 16384 and 0 < h <= 16384:
            out["width"], out["height"] = w, h
    return out


def _sample_offsets(
    chunk_offsets: list[int], stsc_runs: list[tuple[int, int]], sizes: list[int]
) -> list[int]:
    """Per-sample absolute file offsets from the stsc×stco×stsz walk.

    ``stsc_runs`` is [(first_chunk, samples_per_chunk)] with 1-based
    first_chunk; each run covers chunks up to the next run's first
    chunk (the last run covers through the final stco entry)."""
    n = len(sizes)
    offsets: list[int] = []
    cursor = 0
    for ri, (first, per_chunk) in enumerate(stsc_runs):
        last = (
            stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else len(chunk_offsets)
        )
        for chunk in range(first, last + 1):
            if cursor >= n:
                break
            if chunk - 1 >= len(chunk_offsets):
                raise ValueError(
                    f"stsc references chunk {chunk} but stco has "
                    f"{len(chunk_offsets)} entries"
                )
            pos = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if cursor >= n:
                    break
                offsets.append(pos)
                pos += sizes[cursor]
                cursor += 1
    if cursor < n:
        raise ValueError(
            f"sample tables inconsistent: stsz declares {n} samples but "
            f"stsc x stco place only {cursor}"
        )
    return offsets


def _parse_stbl(buf: bytes, b: int, e: int, timescale: int) -> dict:
    sd = _parse_stsd(buf, *_find(buf, b, e, "stsd"))

    # stsz (stz2 compact form is a parse-only gap: raise actionably)
    if _find_opt(buf, b, e, "stz2") is not None and _find_opt(buf, b, e, "stsz") is None:
        raise NotImplementedError(
            "stz2 compact sample sizes are not supported; remux with a "
            "standard stsz box (every mainstream muxer writes stsz)"
        )
    zb, _ = _find(buf, b, e, "stsz")
    _, _, p = _fullbox(buf, zb)
    fixed, n_samples = _struct.unpack_from(">II", buf, p)
    if n_samples > len(buf):
        # every sample occupies >= 1 byte of the payload we were handed,
        # so a count past the buffer is corrupt — and materializing the
        # fixed-size list first would allocate up to 2^32 entries
        raise ValueError(f"stsz sample count {n_samples} exceeds payload size")
    sizes = [fixed] * n_samples if fixed else _u32_list(buf, p + 8, n_samples)

    # stco / co64
    co = _find_opt(buf, b, e, "stco")
    if co is not None:
        _, _, p = _fullbox(buf, co[0])
        (n_chunks,) = _struct.unpack_from(">I", buf, p)
        chunk_offsets = _u32_list(buf, p + 4, n_chunks)
    else:
        cb, _ = _find(buf, b, e, "co64")
        _, _, p = _fullbox(buf, cb)
        (n_chunks,) = _struct.unpack_from(">I", buf, p)
        chunk_offsets = list(_struct.unpack_from(f">{n_chunks}Q", buf, p + 4))

    # stsc
    cb, _ = _find(buf, b, e, "stsc")
    _, _, p = _fullbox(buf, cb)
    (n_runs,) = _struct.unpack_from(">I", buf, p)
    runs = [
        _struct.unpack_from(">II", buf, p + 4 + 12 * i) for i in range(n_runs)
    ]  # (first_chunk, samples_per_chunk); description index ignored

    # stts -> fps
    tb, _ = _find(buf, b, e, "stts")
    _, _, p = _fullbox(buf, tb)
    (n_tt,) = _struct.unpack_from(">I", buf, p)
    total_delta = 0
    for i in range(n_tt):
        cnt, delta = _struct.unpack_from(">II", buf, p + 4 + 8 * i)
        total_delta += cnt * delta
    fps = (timescale * n_samples / total_delta) if total_delta else 0.0

    # stss (absent == every sample is sync, §8.6.2)
    ss = _find_opt(buf, b, e, "stss")
    if ss is not None:
        _, _, p = _fullbox(buf, ss[0])
        (n_sync,) = _struct.unpack_from(">I", buf, p)
        keyframes = _u32_list(buf, p + 4, n_sync)
    else:
        keyframes = None

    return {
        "codec": sd["codec"],
        "width": sd["width"],
        "height": sd["height"],
        "n_samples": n_samples,
        "lengths": sizes,
        "offsets": _sample_offsets(chunk_offsets, [tuple(r) for r in runs], sizes),
        "fps": fps,
        "keyframes": keyframes,
    }


def _parse_trak(buf: bytes, b: int, e: int) -> dict | None:
    mb, me = _find(buf, b, e, "mdia")

    hb, he = _find(buf, mb, me, "hdlr")
    _, _, p = _fullbox(buf, hb)
    handler = buf[p + 4 : p + 8].decode("latin-1")

    db, _ = _find(buf, mb, me, "mdhd")
    version, _, p = _fullbox(buf, db)
    if version == 1:
        timescale, duration = _struct.unpack_from(">IQ", buf, p + 16)
    else:
        timescale, duration = _struct.unpack_from(">II", buf, p + 8)
    if timescale == 0:
        raise ValueError("mdhd timescale is zero")

    tb, _ = _find(buf, b, e, "tkhd")
    version, _, p = _fullbox(buf, tb)
    (track_id,) = _struct.unpack_from(">I", buf, p + (16 if version == 1 else 8))

    nb, ne = _find(buf, mb, me, "minf")
    sb, se = _find(buf, nb, ne, "stbl")
    track = _parse_stbl(buf, sb, se, timescale)
    track.update(
        {
            "track_id": track_id,
            "handler": handler,
            "timescale": timescale,
            "duration_s": duration / timescale,
        }
    )
    return track


def parse_mp4(payload: bytes) -> dict:
    """Full header parse: ``{brand, tracks: [...]}`` — each track a dict
    with codec / dims / fps / per-sample (offset, length) / keyframes.
    Never touches ``mdat`` bytes (the seek-table property)."""
    if not is_mp4(payload):
        raise ValueError("not an ISO-BMFF (MP4) payload")
    try:
        brand = None
        moov = None
        for name, b, e in iter_boxes(payload):
            if name == "ftyp":
                brand = payload[b : b + 4].decode("latin-1").strip()
            elif name == "moov":
                moov = (b, e)
        if moov is None:
            raise ValueError("no moov box (fragmented/streaming MP4 not supported)")
        tracks = [
            _parse_trak(payload, tb, te)
            for name, tb, te in iter_boxes(payload, *moov)
            if name == "trak"
        ]
        return {"brand": brand, "tracks": tracks}
    except _struct.error as ex:
        # a box size/count pointing past the buffer is corruption, and at
        # crawl scale it must land in the caller's quarantine path (the
        # documented ValueError contract), not kill the task as a raw
        # struct.error (hypothesis fuzz finding, tests/
        # test_property_containers.py); NotImplementedError (stz2 gate)
        # still propagates
        raise ValueError(f"malformed MP4 structure: {ex}") from ex


def video_track_meta(payload: bytes) -> dict:
    """The ``decode_video_meta`` seam dict for the FIRST video track:
    ``{n_frames, fps, lengths, offsets, codec, width, height,
    decodable, keyframes}`` — drop-in for the TCVC shape, so frame
    sampling and near-dup run unchanged on .mp4 files."""
    meta = parse_mp4(payload)
    for t in meta["tracks"]:
        if t["handler"] == "vide":
            return {
                "n_frames": t["n_samples"],
                "fps": t["fps"],
                "lengths": t["lengths"],
                "offsets": t["offsets"],
                "codec": t["codec"],
                "width": t["width"],
                "height": t["height"],
                "keyframes": t["keyframes"],
                "decodable": t["codec"] in DECODABLE_VIDEO_CODECS,
            }
    raise ValueError("MP4 has no video track")


# --------------------------------------------------------------------------
# Writer — minimal spec-conformant MJPEG packager (ftyp + mdat + moov).
# --------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return _struct.pack(">I", 8 + len(body)) + fourcc + body


def _fbox(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def _jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker of a JFIF stream."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = _struct.unpack_from(">HH", payload, pos + 5)
            return w, h
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg,) = _struct.unpack_from(">H", payload, pos + 2)
        pos += 2 + seg
    raise ValueError("JPEG has no SOF marker")


def encode_mp4_mjpeg(
    frames: list[bytes],
    fps: float = 1.0,
    width: int | None = None,
    height: int | None = None,
    chunk_size: int = 2,
) -> bytes:
    """Pack JPEG frames into a minimal conformant MP4: ``ftyp`` +
    ``mdat`` (frames back-to-back) + ``moov`` with one ``jpeg``-codec
    video track.  Dimensions are sniffed from the first frame's SOF
    when not given.  Chunking groups ``chunk_size`` samples per stco
    chunk so readers must exercise the real stsc×stco×stsz walk (a
    single-chunk file would never catch an offset-accumulation bug)."""
    if not frames:
        raise ValueError("an MP4 needs at least one frame")
    if width is None or height is None:
        width, height = _jpeg_dims(frames[0])
    n = len(frames)
    timescale = 90000
    delta = max(1, round(timescale / fps))
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_body = b"".join(frames)
    mdat = _box(b"mdat", mdat_body)
    mdat_start = len(ftyp) + 8  # file offset of the first frame byte

    # chunk layout: ceil(n / chunk_size) chunks of chunk_size samples,
    # last chunk possibly short -> at most two stsc runs
    sizes = [len(f) for f in frames]
    chunk_offsets, stsc_runs = [], []
    pos, i, chunk_no = mdat_start, 0, 1
    while i < n:
        take = min(chunk_size, n - i)
        chunk_offsets.append(pos)
        pos += sum(sizes[i : i + take])
        if not stsc_runs or stsc_runs[-1][1] != take:
            stsc_runs.append((chunk_no, take))
        i += take
        chunk_no += 1

    stsd_entry = (
        _struct.pack(">I", 8 + 8 + 70)
        + b"jpeg"
        + b"\x00" * 6
        + _struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + _struct.pack(">HH", width, height)
        + _struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + _struct.pack(">H", 1)  # frame_count
        + b"\x05mjpeg" + b"\x00" * 26  # compressorname (pascal, 32 B)
        + _struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stbl = b"".join(
        [
            _fbox(b"stsd", 0, 0, _struct.pack(">I", 1) + stsd_entry),
            _fbox(b"stts", 0, 0, _struct.pack(">III", 1, n, delta)),
            _fbox(
                b"stsc",
                0,
                0,
                _struct.pack(">I", len(stsc_runs))
                + b"".join(_struct.pack(">III", fc, spc, 1) for fc, spc in stsc_runs),
            ),
            _fbox(
                b"stsz",
                0,
                0,
                _struct.pack(">II", 0, n) + _struct.pack(f">{n}I", *sizes),
            ),
            _fbox(
                b"stco",
                0,
                0,
                _struct.pack(">I", len(chunk_offsets))
                + _struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
            ),
        ]
    )
    dinf = _box(
        b"dinf",
        _fbox(b"dref", 0, 0, _struct.pack(">I", 1) + _fbox(b"url ", 0, 1, b"")),
    )
    minf = _box(
        b"minf",
        _fbox(b"vmhd", 0, 1, b"\x00" * 8) + dinf + _box(b"stbl", stbl),
    )
    mdhd = _fbox(
        b"mdhd",
        0,
        0,
        _struct.pack(">IIII", 0, 0, timescale, duration)
        + _struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _fbox(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fbox(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        _struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + _struct.pack(">HHHH", 0, 0, 0, 0)
        + _struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fbox(
        b"mvhd",
        0,
        0,
        _struct.pack(">IIII", 0, 0, timescale, duration)
        + _struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume
        + b"\x00" * 8
        + _struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + _struct.pack(">I", 2),  # next_track_ID
    )
    return ftyp + mdat + _box(b"moov", mvhd + trak)
