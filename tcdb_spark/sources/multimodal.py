"""Multimodal columns (SURVEY.md §2.12): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

Decoding is REAL for three pure-stdlib/numpy formats — binary PPM images
(P5/P6), PNG (zlib inflate + the five scanline filters, 8-bit
gray/RGB/palette/alpha), and PCM WAV audio (RIFF headers + 8/16-bit
samples) — routed by magic bytes, so feature extraction computes from
actual pixels and samples with no codec libraries.  Other formats
(JPEG/MP4/...) would need PIL/ffmpeg, which are not in this container:
``decode_stub=True`` routes
them to a deterministic fake featureizer so the distributed path is
still exercised end to end; ``decode_stub=False`` raises
NotImplementedError where the codec call would sit in a real deployment.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(no driver collect); ``repartition`` before the map keeps batches balanced
when payload sizes are skewed; metadata-only plans never touch the binary
column thanks to Parquet column pruning.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes int, features array<double>"
)


# ----------------------------------------------------------- real decoders

def decode_ppm(payload: bytes) -> dict:
    """Binary PPM/PGM (P6 RGB / P5 gray): ASCII header (magic, width,
    height, maxval, '#' comments) then raw samples. Returns width,
    height, maxval and an (h, w, c) uint8/uint16 pixel array."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        if payload[pos : pos + 1].isspace():
            pos += 1
        elif payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
        else:
            end = pos
            while not payload[end : end + 1].isspace():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    n = width * height * channels
    pixels = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixels": pixels.reshape(height, width, channels),
    }


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode (zlib inflate + the five scanline filters):
    8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA), non-interlaced — the format real corpora
    actually contain, with no codec library anywhere.  Returns the same
    dict shape as :func:`decode_ppm` (width, height, maxval, (h, w, c)
    uint8 pixels; palette images expand to RGB).

    Filter inversion is row-sequential by spec; per row, None/Up are
    one vectorized add, Sub is a per-channel-lane cumsum (recon[x] =
    raw[x] + recon[x-bpp] is linear mod 256), and Average/Paeth walk
    the row (their left-neighbor dependency is inherently serial).
    16-bit depth and interlacing raise with a documented swap point."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (size,) = _struct.unpack_from(">I", payload, pos)
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", body)
        elif cid == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG compression/filter method ({comp}/{filt})")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"interlace={interlace}); 16-bit/Adam7 would slot in here"
        )
    channels = _PNG_CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub: cumsum per channel-offset lane, mod 256
            cur = (np.cumsum(line.reshape(w, bpp), axis=0) & 255).ravel()
        elif ft == 2:  # Up
            cur = (line + prev) & 255
        elif ft == 3:  # Average
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 255
        elif ft == 4:  # Paeth
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a_ = cur[x - bpp] if x >= bpp else 0
                b_ = prev[x]
                c_ = prev[x - bpp] if x >= bpp else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                cur[x] = (line[x] + pred) & 255
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    px = recon.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        px = plte[px[..., 0]]
    return {"width": w, "height": h, "maxval": 255, "pixels": px}


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal valid PNG writer (8-bit, non-interlaced, filter 0 rows,
    correct CRCs): gray / gray+alpha / RGB / RGBA from the channel
    count.  The re-encode half of the resize lane and the fixture
    factory for the decode tests."""
    import zlib

    px = np.ascontiguousarray(np.asarray(pixels, np.uint8))
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            _struct.pack(">I", len(body))
            + cid
            + body
            + _struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _is_image(payload: bytes) -> bool:
    return payload[:2] in (b"P5", b"P6") or payload[:8] == _PNG_MAGIC


def decode_image(payload: bytes) -> dict:
    """Magic-byte image router: Netpbm (P5/P6) or PNG — one dict shape
    (width, height, maxval, pixels) either way, so every image operator
    downstream (features, aHash, resize) is format-agnostic."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    raise ValueError("not a decodable image payload (PPM/PGM/PNG)")


def decode_wav(payload: bytes) -> dict:
    """PCM WAV: RIFF/WAVE chunk walk, fmt (PCM only) + data chunks.
    Returns sample_rate, n_channels and an (n_frames, n_channels)
    float64 array of samples scaled to [-1, 1]."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(f"only 8/16-bit PCM WAV supported (fmt={audio_format}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n_frames = len(samples) // n_channels
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "samples": samples[: n_frames * n_channels].reshape(n_frames, n_channels),
    }


def media_features(payload: bytes) -> list[float] | None:
    """Magic-byte-routed REAL features (fixed dim FEATURE_DIM).

    PPM/PGM: [width, height, channels, mean/std/min/max of the pixel
    values normalized by maxval, edge energy (mean |horizontal diff|)].
    WAV: [sample_rate, channels, duration_s, rms, peak, zero-cross
    rate, mean, dynamic range]. Returns None for unrecognized bytes.
    """
    if _is_image(payload):
        img = decode_image(payload)
        norm = img["pixels"].astype(np.float64) / img["maxval"]
        return [
            float(img["width"]),
            float(img["height"]),
            float(norm.shape[2]),
            float(norm.mean()),
            float(norm.std()),
            float(norm.min()),
            float(norm.max()),
            float(np.abs(np.diff(norm, axis=1)).mean()) if img["width"] > 1 else 0.0,
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        wav = decode_wav(payload)
        s = wav["samples"]
        mono = s.mean(axis=1)
        dur = s.shape[0] / wav["sample_rate"]
        zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
        return [
            float(wav["sample_rate"]),
            float(wav["n_channels"]),
            float(dur),
            float(np.sqrt(np.mean(s * s))),
            float(np.abs(s).max()),
            zc,
            float(s.mean()),
            float(s.max() - s.min()),
        ]
    return None


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoder+featureizer: md5-seeded values
    in [0, 1). Stable across runs/engines — usable in golden tests."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(payload + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """payload -> fixed-dim feature vector via mapInPandas (Arrow batches).

    PPM/PGM and PCM WAV payloads are decoded for real (magic-byte
    routing, pure numpy). Unrecognized formats fall back to the
    deterministic stub when ``decode_stub`` (keeps the distributed path
    testable), else raise where a PIL/ffmpeg call would sit.
    """

    def _one(p) -> list[float] | None:
        if p is None:
            return None
        payload = bytes(p)
        real = media_features(payload)
        if real is not None:
            return real
        if not decode_stub:
            raise NotImplementedError(
                "payload format needs codec libraries not in this container"
            )
        return _fake_features(payload)

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    cols = ["media_id", "payload", "media_type"]
    return media.select(*cols).mapInPandas(_op, schema=FEATURES_SCHEMA)


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize for PPM/PGM payloads — nearest-neighbor via a
    numpy index map (two gathers, no Python pixel loop), re-encoded as
    the same Netpbm format. The pure-numpy stand-in for the
    PIL.Image.resize call a full deployment would route non-Netpbm
    formats through."""
    img = decode_ppm(payload)
    px = img["pixels"]
    resized = _resize_pixels(img, out_w, out_h)
    magic = b"P6" if px.shape[2] == 3 else b"P5"
    header = magic + f"\n{out_w} {out_h}\n{img['maxval']}\n".encode()
    return header + resized.tobytes()


def _resize_pixels(img: dict, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded image dict via a numpy index
    map (two gathers, no Python pixel loop)."""
    ys = (np.arange(out_h) * img["height"] // out_h).astype(np.intp)
    xs = (np.arange(out_w) * img["width"] // out_w).astype(np.intp)
    return img["pixels"][ys][:, xs]


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize for PNG payloads — same nearest-neighbor index
    map as :func:`resize_ppm`, re-encoded PNG (filter-0 rows)."""
    return encode_png(_resize_pixels(decode_png(payload), out_w, out_h))


RESIZED_SCHEMA = (
    "media_id long, media_type string, width int, height int, payload binary"
)


def resize_media(
    media: DataFrame, out_w: int, out_h: int, decode_stub: bool = True
) -> DataFrame:
    """Distributed image resize over the binary column: one Arrow batch
    per partition through mapInPandas, Netpbm payloads resized for real,
    other formats passed through untouched (``decode_stub``) or raising
    where the codec call would sit. The resize itself never shuffles —
    it's a map over whatever partitioning the media table already has,
    so at 100 TB it rides the scan."""

    def _one(p):
        if p is None:
            return None
        payload = bytes(p)
        if payload[:2] in (b"P5", b"P6"):
            return resize_ppm(payload, out_w, out_h)
        if payload[:8] == _PNG_MAGIC:
            return resize_png(payload, out_w, out_h)
        if not decode_stub:
            raise NotImplementedError(
                "payload format needs codec libraries not in this container"
            )
        return payload

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": out_w,
                    "height": out_h,
                    "payload": out,
                }
            )

    cols = ["media_id", "payload", "media_type"]
    return media.select(*cols).mapInPandas(_op, schema=RESIZED_SCHEMA)


def resample_wav(payload: bytes, out_rate: int) -> bytes:
    """REAL audio resample for PCM WAV payloads — per-channel linear
    interpolation onto the new time grid (np.interp, no Python sample
    loop), re-encoded 16-bit PCM at ``out_rate``.  The pure-numpy
    stand-in for the soxr/librosa call a full deployment would route
    compressed formats through; linear interp is exact on piecewise-
    linear signals, which the closed-form test exploits."""
    wav = decode_wav(payload)
    samples, in_rate = wav["samples"], wav["sample_rate"]
    n_in = samples.shape[0]
    n_out = max(1, int(round(n_in * out_rate / in_rate)))
    t_out = np.arange(n_out) * (in_rate / out_rate)
    t_in = np.arange(n_in, dtype=np.float64)
    resampled = np.stack(
        [np.interp(t_out, t_in, samples[:, c]) for c in range(samples.shape[1])],
        axis=1,
    )
    pcm = np.clip(np.rint(resampled * 32768.0), -32768, 32767).astype("<i2")
    n_ch = pcm.shape[1]
    fmt = _struct.pack(
        "<HHIIHH", 1, n_ch, out_rate, out_rate * 2 * n_ch, 2 * n_ch, 16
    )
    data = pcm.tobytes()
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


RESAMPLED_SCHEMA = "media_id long, sample_rate int, payload binary"


def resample_media(
    media: DataFrame, out_rate: int, decode_stub: bool = True
) -> DataFrame:
    """Distributed audio resample over the binary column — same
    shuffle-free mapInPandas shape as :func:`resize_media`: RIFF/WAVE
    payloads resampled for real, other formats passed through
    (``decode_stub``) or raising where the codec call would sit."""

    def _one(p):
        if p is None:
            return None
        payload = bytes(p)
        if payload[:4] == b"RIFF":
            return resample_wav(payload, out_rate)
        if not decode_stub:
            raise NotImplementedError(
                "payload format needs codec libraries not in this container"
            )
        return payload

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": out_rate,
                    "payload": [_one(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _op, schema=RESAMPLED_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling PLUMBING: expands (media_id, duration_s) into
    one row per sampled timestamp with ``sequence`` (JVM-side); the decode
    of each frame is the stubbed step above. Demonstrates the explode
    pattern that keeps frame parallelism in Spark, not in the codec."""
    n = (F.col("duration_s") / every_s).cast("int")
    return (
        media.select("media_id", "media_type", "duration_s")
        .where(F.col("duration_s").isNotNull())
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n)))
        .withColumn("frame_ts_s", F.col("frame_idx") * every_s)
    )


def make_test_ppm(width: int = 8, height: int = 6, maxval: int = 255) -> bytes:
    """Deterministic P6 gradient fixture (with a header comment, which
    real Netpbm writers emit): pixel (x, y) = (x*30, y*40, (x+y)*10),
    clipped to maxval."""
    header = f"P6\n# tcdb_spark test fixture\n{width} {height}\n{maxval}\n".encode()
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes(
                min(v, maxval) for v in (x * 30, y * 40, (x + y) * 10)
            )
    return header + bytes(px)


def make_test_wav(
    sample_rate: int = 8000, n_frames: int = 800, period: int = 16, amp: int = 8192
) -> bytes:
    """Deterministic 16-bit mono PCM square-wave fixture: amplitude
    8192 = 0.25 exactly in [-1, 1], so rms/peak are closed-form."""
    samples = [
        amp if (i // (period // 2)) % 2 == 0 else -amp for i in range(n_frames)
    ]
    data = b"".join(_struct.pack("<h", s) for s in samples)
    fmt = _struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def extract_features_arrow(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features` — identical
    semantics, but the batch stays a ``pyarrow.RecordBatch`` end to
    end.  For binary-heavy columns this skips the Arrow->pandas
    object-boxing round trip (every payload becoming a Python bytes
    inside a pandas object Series) that the mapInPandas lane pays; the
    payload buffers are sliced straight out of the Arrow binary array.
    Equality with the pandas lane is pinned in tests.
    """
    import pyarrow as pa

    def _one(payload: bytes | None) -> list[float] | None:
        if payload is None:
            return None
        real = media_features(payload)
        if real is not None:
            return real
        if not decode_stub:
            raise NotImplementedError(
                "payload format needs codec libraries not in this container"
            )
        return _fake_features(payload)

    def _op(batches: Iterator) -> Iterator:
        for batch in batches:
            pay = batch.column(batch.schema.get_field_index("payload"))
            raw = [pay[i].as_py() for i in range(len(pay))]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    batch.column(batch.schema.get_field_index("media_type")),
                    # FEATURES_SCHEMA declares n_bytes int (32-bit):
                    # mapInArrow does NO implicit casting, the arrays
                    # must match the declared Arrow types exactly
                    pa.array(
                        [len(p) if p is not None else 0 for p in raw], pa.int32()
                    ),
                    pa.array([_one(p) for p in raw], pa.list_(pa.float64())),
                ],
                names=["media_id", "media_type", "n_bytes", "features"],
            )

    cols = ["media_id", "payload", "media_type"]
    return media.select(*cols).mapInArrow(_op, schema=FEATURES_SCHEMA)


# ------------------------------------------------- perceptual image hashing

AHASH_GRID = 8  # 8x8 cells -> 64-bit average hash

AHASH_SCHEMA = "media_id long, ahash long"


def ahash_image(payload: bytes, grid: int = AHASH_GRID) -> int:
    """Average hash (aHash) of any decodable image payload (PPM/PGM or
    PNG — magic-routed): grayscale -> grid x grid block means -> one bit
    per cell (cell >= global cell mean), packed row-major MSB-first.
    Returns the UNSIGNED 64-bit value; :func:`media_ahash` converts to
    Spark's signed LongType.

    Format-agnostic by construction: the SAME pixels encoded as PPM and
    as PNG hash identically (pinned in tests), which is what lets
    `image_phash_dedup` find cross-format re-encodes.  aHash is
    brightness-shift invariant (adding a constant to every pixel shifts
    every cell mean and the threshold by the same amount), which is
    exactly the near-duplicate class re-encoded/re-exposed images fall
    into."""
    img = decode_image(payload)
    px = img["pixels"].astype(np.float64).mean(axis=2)
    h, w = px.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    cells = np.empty((grid, grid))
    for r in range(grid):
        for c in range(grid):
            cells[r, c] = px[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean()
    bits = (cells >= cells.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val


def ahash_ppm(payload: bytes, grid: int = AHASH_GRID) -> int:
    """Back-compat alias: :func:`ahash_image` handles PPM/PGM and PNG."""
    return ahash_image(payload, grid)


def _ahash_signed(payload: bytes, decode_stub: bool = True) -> int:
    """64-bit aHash as a signed long (Spark LongType two's complement).
    Non-image payloads fall back to a deterministic md5 pseudo-hash
    (``decode_stub``) or raise where the codec call would sit."""
    if _is_image(payload):
        v = ahash_image(payload)
    elif decode_stub:
        import hashlib

        v = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    else:
        raise NotImplementedError(
            "payload format needs codec libraries not in this container"
        )
    return v - (1 << 64) if v >= (1 << 63) else v


def media_ahash(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(media_id, payload) -> (media_id, ahash) via Arrow-batched
    mapInPandas — the hashing map rides the scan (no shuffle); only the
    8-byte hashes continue into the dedup join, the payloads never do."""

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": [
                        _ahash_signed(bytes(p), decode_stub) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(_op, schema=AHASH_SCHEMA)


def media_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 7, bands: int = 8
) -> DataFrame:
    """Near-duplicate media pairs by banded Hamming join over 64-bit
    perceptual hashes: split each hash into ``bands`` equal bit-bands,
    equi-join on (band index, band value), then verify the true Hamming
    distance with ``bit_count(a ^ b) <= max_hamming``.

    EXACT for ``max_hamming < bands`` by pigeonhole — fewer differing
    bits than bands means at least one band is identical, so the banded
    equi-join provably finds every qualifying pair and the verify step
    discards false candidates; no all-pairs join exists anywhere.  With
    the defaults (8 bands of 8 bits, threshold 7) this is the media twin
    of the text SimHash lane (operators/textdedup): candidate volume is
    bounded by per-(band, value) bucket sizes, the hot-bucket hazard and
    its df-cap mitigation carry over unchanged at corpus scale."""
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
    banded = hashes.where(F.col("ahash").isNotNull()).selectExpr(
        "media_id", "ahash", f"posexplode(array({band_exprs})) AS (band, bval)"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()  # a pair can collide in several bands; dedup BEFORE popcount
    )
    return cand.select(
        "media_id_a",
        "media_id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def make_patterned_ppm(
    seed: str,
    width: int = 32,
    height: int = 24,
    grid: int = AHASH_GRID,
    brightness: int = 0,
    flip_cells: tuple = (),
) -> bytes:
    """Deterministic high-contrast P5 fixture for the perceptual-hash
    lane: each aHash cell is uniformly dark (10) or bright (200) from
    md5(seed, cell) — cell means sit far from the global mean, so the
    hash is stable under the uniform ``brightness`` shift (no clipping:
    values stay within [10, 208]) and ``flip_cells`` inverts exactly the
    named cells (one hash bit each)."""
    import hashlib

    rows = []
    for y in range(height):
        row = []
        for x in range(width):
            cr, cc = (y * grid) // height, (x * grid) // width
            on = int.from_bytes(
                hashlib.md5(f"{seed}:{cr}:{cc}".encode()).digest()[:2], "big"
            ) % 2 == 0
            if (cr, cc) in flip_cells:
                on = not on
            row.append((200 if on else 10) + brightness)
        rows.append(row)
    header = f"P5\n{width} {height}\n255\n".encode()
    return header + bytes(v for row in rows for v in row)
