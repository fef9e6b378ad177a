"""Native image/audio decode behind the ``decode_image`` /
``decode_audio`` routing seams — the fast path VERDICT r6 #1 asked
for, retiring the stdlib codec throughput ceiling (JPEG 0.26 MB/s ->
libjpeg-turbo, PNG-Paeth 1.9 MB/s -> libpng16, FLAC 0.4 MB/s -> a
self-contained compiled shim) while keeping the pure-Python decoders
as the portable fallback and as the cross-check twin.

Everything here is capability-gated and degrades to the stdlib path:

* **PNG** — pure ``ctypes`` against the system ``libpng16`` via the
  *simplified API* (``png_image_begin_read_from_memory`` /
  ``png_image_finish_read``).  The simplified API reports errors
  through return codes and ``png_image.message`` — no ``setjmp``
  involvement leaks across the FFI boundary, so raw ctypes is safe.
  Gated on ``libpng16.so.16`` dlopen succeeding.

* **JPEG** — the classic libjpeg API signals errors by ``longjmp``
  through ``error_exit`` (and the default handler calls ``exit()``),
  which CANNOT be survived from a raw ctypes callback: the Python
  callback frame returns before any longjmp target would be taken and
  libjpeg then continues on corrupt state.  A corrupt payload must be
  a catchable ``ValueError``, never an executor death, so the binding
  is a ~70-line C shim (source embedded below) that wraps the
  decompress sequence in ``setjmp`` and exposes two flat,
  error-code-returning functions.  The shim is compiled ON FIRST USE
  with the system ``gcc`` against the system ``jpeglib.h`` (both
  verified present in this image, libjpeg62-turbo 2.1.5) and cached
  under ``~/.cache/tcdb_spark`` keyed by a source hash; concurrent
  worker processes race benignly (identical output, atomic
  ``os.replace``).  Gated on gcc + header + link all succeeding.

Parity contract with the stdlib decoders (``multimodal.decode_png`` /
``decode_jpeg``): same return dict (width, height, maxval, (h, w, c)
uint8 pixels); PNG is lossless so outputs are byte-identical for the
formats both support; JPEG output may differ per-pixel by ±2 (the
fixed-point ``islow`` IDCT and fixed-point YCbCr conversion vs our
float math — both within T.81 decoder accuracy).  The shim sets
``do_fancy_upsampling = FALSE`` so 4:2:0 chroma upsampling is pixel
replication, matching the stdlib ``np.repeat`` path.  Capability
DELTAS are upgrades only: native JPEG additionally decodes
arithmetic-coded streams (libjpeg-turbo ships the decoder); native
PNG additionally handles 16-bit and interlaced files (converted to
8-bit by libpng) and honors palette transparency (tRNS -> alpha
channel) where the stdlib path raises or ignores.

Determinism note for heterogeneous clusters: routing is per-process
("native if it loads"), so a cluster with gcc on some nodes only
could produce ±2-different JPEG features on different executors.  Set
``TCDB_SPARK_NATIVE_CODECS=0`` (or ``1``) cluster-wide through
``spark.executorEnv.*`` when bit-identical output matters more than
throughput; ``0`` forces the stdlib path, ``1``/unset means "native
when available".  On a real cluster, pre-build the shim once and ship
it with ``spark.files`` + ``TCDB_SPARK_SHIM_DIR`` instead of relying
on per-node compilers (OPERATIONS.md "native codecs").

Reference parity: the reference has no media pipeline at all; this
is part of the §2.12 extension surface (SURVEY.md), sized for the
100 TB training-corpus use the stdlib ceiling math in OPERATIONS.md
quantified.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

# --------------------------------------------------------------- kill switch


def _env_enabled() -> bool:
    """``TCDB_SPARK_NATIVE_CODECS=0/false/off`` disables native routing
    (checked per call so tests can flip it without reloading modules)."""
    return os.environ.get("TCDB_SPARK_NATIVE_CODECS", "1").lower() not in (
        "0",
        "false",
        "off",
    )


# ------------------------------------------------------------------ libpng16
#
# png_image struct layout from png.h (PNG_IMAGE_VERSION 1, stable since
# libpng 1.6): opaque ptr + 6 uint32 + 64-char message.

_PNG_FMT_ALPHA = 0x01
_PNG_FMT_COLOR = 0x02
_PNG_FMT_LINEAR = 0x04  # 2-byte channels; we always request 8-bit
_PNG_FMT_COLORMAP = 0x08  # we always request the expanded form


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_libpng_handle: tuple[ctypes.CDLL | None] | None = None


def _libpng() -> ctypes.CDLL | None:
    """dlopen libpng16 once per process; None if absent/ABI-mismatched."""
    global _libpng_handle
    if _libpng_handle is None:
        lib = None
        for name in ("libpng16.so.16", "libpng16.so", "libpng.so"):
            try:
                cand = ctypes.CDLL(name)
                cand.png_image_begin_read_from_memory  # simplified API probe
                lib = cand
                break
            except (OSError, AttributeError):
                continue
        if lib is not None:
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(_PngImage),
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.png_image_begin_read_from_memory.restype = ctypes.c_int
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(_PngImage),
                ctypes.c_void_p,  # background (NULL)
                ctypes.c_void_p,  # buffer
                ctypes.c_int32,  # row_stride (0 = tight default)
                ctypes.c_void_p,  # colormap (NULL: we never request one)
            ]
            lib.png_image_finish_read.restype = ctypes.c_int
            lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
            lib.png_image_free.restype = None
        _libpng_handle = (lib,)
    return _libpng_handle[0]


def png_available() -> bool:
    return _libpng() is not None


def png_enabled() -> bool:
    return _env_enabled() and png_available()


def decode_png_native(payload: bytes) -> dict:
    """PNG decode through libpng's simplified API.  Same dict shape as
    ``multimodal.decode_png`` and byte-identical pixels for the formats
    both support (PNG is lossless).  Palette expands to RGB (to RGBA
    when a tRNS chunk is present); 16-bit and interlaced files are
    accepted and converted to 8-bit by libpng (the stdlib path raises
    on those).  Errors are catchable ``ValueError``s."""
    lib = _libpng()
    if lib is None:
        raise RuntimeError("libpng16 not available in this environment")
    img = _PngImage()
    img.version = 1  # PNG_IMAGE_VERSION
    if not lib.png_image_begin_read_from_memory(
        ctypes.byref(img), payload, len(payload)
    ):
        msg = img.message.decode("utf-8", "replace")
        raise ValueError(f"libpng: {msg or 'not a decodable PNG payload'}")
    try:
        # Request 8-bit, expanded form: strip LINEAR (16-bit) and
        # COLORMAP (palette), keep COLOR/ALPHA as libpng derived them
        # (palette gains ALPHA exactly when tRNS is present).
        want = img.format & (_PNG_FMT_COLOR | _PNG_FMT_ALPHA)
        if img.format & _PNG_FMT_COLORMAP:
            want |= _PNG_FMT_COLOR
        img.format = want
        channels = (3 if want & _PNG_FMT_COLOR else 1) + (
            1 if want & _PNG_FMT_ALPHA else 0
        )
        width, height = int(img.width), int(img.height)
        out = np.empty(height * width * channels, np.uint8)
        ok = lib.png_image_finish_read(
            ctypes.byref(img),
            None,
            out.ctypes.data_as(ctypes.c_void_p),
            0,
            None,
        )
        if not ok:
            msg = img.message.decode("utf-8", "replace")
            raise ValueError(f"libpng: {msg or 'PNG decode failed'}")
    finally:
        lib.png_image_free(ctypes.byref(img))  # no-op if already freed
    return {
        "width": width,
        "height": height,
        "maxval": 255,
        "pixels": out.reshape(height, width, channels),
    }


# ----------------------------------------------------------------- FLAC shim
#
# No system libFLAC exists in this image, but the format needs no
# library at all — a self-contained ~300-line C translation of the
# repo's own pure-Python decoder (multimodal.decode_flac: STREAMINFO,
# CRC-8/16-verified frames, CONSTANT/VERBATIM/FIXED/LPC subframes, Rice
# partitions with escapes, wasted bits, all three stereo decorrelation
# modes), compiled with the same cached-gcc machinery as the JPEG shim.
# FLAC is lossless, so parity with the stdlib twin is EXACT integer
# equality — pinned by the conformance tests through both paths.

_FLAC_SHIM_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* MSB-first bit reader with hard bounds: any overrun is error 1, never
   a read past the buffer. */
struct br { const unsigned char *buf; unsigned long nbits; unsigned long pos; };

static int br_read(struct br *r, int n, uint64_t *out) {
    uint64_t v = 0;
    if (r->pos + (unsigned long) n > r->nbits) return 1;
    while (n--) {
        v = (v << 1) | ((r->buf[r->pos >> 3] >> (7 - (r->pos & 7))) & 1u);
        r->pos++;
    }
    *out = v;
    return 0;
}

static int br_read_signed(struct br *r, int n, int64_t *out) {
    uint64_t v;
    if (n == 0) { *out = 0; return 0; }
    if (br_read(r, n, &v)) return 1;
    *out = (v >> (n - 1)) ? (int64_t) v - ((int64_t) 1 << n) : (int64_t) v;
    return 0;
}

static int br_unary(struct br *r, uint64_t *out) {
    uint64_t q = 0, b;
    for (;;) {
        if (br_read(r, 1, &b)) return 1;
        if (b) break;
        q++;
    }
    *out = q;
    return 0;
}

static uint8_t crc8(const unsigned char *d, unsigned long n) {
    uint8_t c = 0;
    while (n--) {
        c ^= *d++;
        for (int i = 0; i < 8; i++)
            c = (c & 0x80) ? (uint8_t) ((c << 1) ^ 0x07) : (uint8_t) (c << 1);
    }
    return c;
}

static uint16_t crc16(const unsigned char *d, unsigned long n) {
    uint16_t c = 0;
    while (n--) {
        c ^= (uint16_t) (*d++) << 8;
        for (int i = 0; i < 8; i++)
            c = (c & 0x8000) ? (uint16_t) ((c << 1) ^ 0x8005) : (uint16_t) (c << 1);
    }
    return c;
}

static int utf8_number(struct br *r) {
    uint64_t b0, b;
    if (br_read(r, 8, &b0)) return 1;
    if (b0 < 0x80) return 0;
    int n = 0;
    while ((b0 << n) & 0x80) n++;
    for (int i = 0; i < n - 1; i++)
        if (br_read(r, 8, &b)) return 1;
    return 0;
}

#define FAIL(msg) do { strncpy(errmsg, msg, 199); errmsg[199] = 0; goto fail; } while (0)

static const int FIXED_ORDERS[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1},
};

/* residual into res[0..blocksize-order) ; returns 0 ok */
static int residual(struct br *r, long blocksize, int order, int64_t *res) {
    uint64_t method, po, param, bits, q, u;
    long idx = 0;
    if (br_read(r, 2, &method) || method > 1) return 1;
    int plen = 4 + (int) method;
    if (br_read(r, 4, &po)) return 1;
    long nparts = 1L << po;
    for (long p = 0; p < nparts; p++) {
        long n = (blocksize >> po) - (p == 0 ? order : 0);
        if (n < 0) return 1;
        if (br_read(r, plen, &param)) return 1;
        if (param == ((1u << plen) - 1)) {        /* escape: raw residuals */
            if (br_read(r, 5, &bits)) return 1;
            for (long i = 0; i < n; i++) {
                int64_t v;
                if (br_read_signed(r, (int) bits, &v)) return 1;
                res[idx++] = v;
            }
        } else {
            for (long i = 0; i < n; i++) {
                if (br_unary(r, &q)) return 1;
                u = (q << param);
                if (param) {
                    uint64_t low;
                    if (br_read(r, (int) param, &low)) return 1;
                    u |= low;
                }
                res[idx++] = (int64_t) (u >> 1) ^ -(int64_t) (u & 1); /* zigzag */
            }
        }
    }
    return 0;
}

/* one subframe into out[0..blocksize) */
static int subframe(struct br *r, long blocksize, int bps, int64_t *out,
                    int64_t *scratch) {
    uint64_t pad, ftype, w;
    int wasted = 0;
    if (br_read(r, 1, &pad) || pad) return 1;
    if (br_read(r, 6, &ftype)) return 1;
    if (br_read(r, 1, &w)) return 1;
    if (w) {
        uint64_t q;
        if (br_unary(r, &q)) return 1;
        wasted = (int) q + 1;
        bps -= wasted;
        if (bps <= 0) return 1;
    }
    if (ftype == 0) {                               /* CONSTANT */
        int64_t v;
        if (br_read_signed(r, bps, &v)) return 1;
        for (long i = 0; i < blocksize; i++) out[i] = v;
    } else if (ftype == 1) {                        /* VERBATIM */
        for (long i = 0; i < blocksize; i++)
            if (br_read_signed(r, bps, &out[i])) return 1;
    } else if (ftype >= 8 && ftype <= 12) {         /* FIXED 0-4 */
        int order = (int) ftype - 8;
        for (int i = 0; i < order; i++)
            if (br_read_signed(r, bps, &out[i])) return 1;
        if (residual(r, blocksize, order, scratch)) return 1;
        const int *c = FIXED_ORDERS[order];
        for (long i = order; i < blocksize; i++) {
            int64_t pred = 0;
            for (int k = 0; k < order; k++) pred += (int64_t) c[k] * out[i - 1 - k];
            out[i] = pred + scratch[i - order];
        }
    } else if (ftype >= 32) {                       /* LPC, order 1-32 */
        int order = (int) ftype - 31;
        int64_t coefs[32];
        uint64_t prec4;
        int64_t shift;
        for (int i = 0; i < order; i++)
            if (br_read_signed(r, bps, &out[i])) return 1;
        if (br_read(r, 4, &prec4)) return 1;
        int prec = (int) prec4 + 1;
        if (br_read_signed(r, 5, &shift)) return 1;
        for (int i = 0; i < order; i++)
            if (br_read_signed(r, prec, &coefs[i])) return 1;
        if (residual(r, blocksize, order, scratch)) return 1;
        for (long i = order; i < blocksize; i++) {
            int64_t pred = 0;
            for (int k = 0; k < order; k++) pred += coefs[k] * out[i - 1 - k];
            pred >>= shift;
            out[i] = pred + scratch[i - order];
        }
    } else {
        return 1;                                   /* reserved type */
    }
    if (wasted)
        for (long i = 0; i < blocksize; i++) out[i] <<= wasted;
    return 0;
}

static const long BS_CODES[8] = {0, 192, 576, 1152, 2304, 4608, -1, -2};
static const int BPS_CODES[8] = {0, 8, 12, 0, 16, 20, 24, 0};

/* Decode everything after the metadata blocks.  out: interleaved
   sample-major int32 (out[i*nch + c]), capacity total per channel.
   Returns 0 ok, 1 decode error (errmsg). */
int flacshim_decode(const unsigned char *buf, unsigned long len,
                    unsigned long data_off, int nch, int stream_bps,
                    long total, int32_t *out, char *errmsg) {
    struct br r = {buf, len * 8, data_off * 8};
    int64_t *chan[8] = {0};
    int64_t *scratch = 0;
    long max_bs = 0;
    long written = 0;

    if (nch < 1 || nch > 8) FAIL("unsupported FLAC channel count");
    while (written < total) {
        if (r.pos >= r.nbits) FAIL("truncated FLAC stream");
        unsigned long hdr_start = r.pos >> 3;
        uint64_t sync, v, bs_code, rate_code, chan_code, bps_code;
        if (br_read(&r, 14, &sync) || sync != 0x3FFE) FAIL("bad FLAC frame sync");
        if (br_read(&r, 2, &v)) FAIL("truncated FLAC stream");      /* rsvd+strategy */
        if (br_read(&r, 4, &bs_code)) FAIL("truncated FLAC stream");
        if (br_read(&r, 4, &rate_code)) FAIL("truncated FLAC stream");
        if (br_read(&r, 4, &chan_code)) FAIL("truncated FLAC stream");
        if (br_read(&r, 3, &bps_code)) FAIL("truncated FLAC stream");
        if (br_read(&r, 1, &v)) FAIL("truncated FLAC stream");
        if (utf8_number(&r)) FAIL("truncated FLAC stream");
        long blocksize;
        if (bs_code == 6) {
            if (br_read(&r, 8, &v)) FAIL("truncated FLAC stream");
            blocksize = (long) v + 1;
        } else if (bs_code == 7) {
            if (br_read(&r, 16, &v)) FAIL("truncated FLAC stream");
            blocksize = (long) v + 1;
        } else if (bs_code >= 1 && bs_code <= 5) {
            blocksize = BS_CODES[bs_code];
        } else if (bs_code >= 8) {
            blocksize = 256L << (bs_code - 8);
        } else {
            FAIL("reserved FLAC blocksize code");
        }
        if (rate_code == 12) { if (br_read(&r, 8, &v)) FAIL("truncated FLAC stream"); }
        else if (rate_code == 13 || rate_code == 14) {
            if (br_read(&r, 16, &v)) FAIL("truncated FLAC stream");
        }
        int bps = stream_bps;
        if (bps_code != 0 && BPS_CODES[bps_code]) bps = BPS_CODES[bps_code];
        unsigned long hdr_end = r.pos >> 3;
        if (br_read(&r, 8, &v)) FAIL("truncated FLAC stream");
        if ((uint8_t) v != crc8(buf + hdr_start, hdr_end - hdr_start))
            FAIL("FLAC frame header CRC mismatch");

        if (blocksize > max_bs) {
            for (int c = 0; c < 8; c++) { free(chan[c]); chan[c] = 0; }
            free(scratch); scratch = 0;
            max_bs = blocksize;
            for (int c = 0; c < nch; c++) {
                chan[c] = (int64_t *) malloc((size_t) max_bs * sizeof(int64_t));
                if (!chan[c]) FAIL("FLAC decode allocation failed");
            }
            scratch = (int64_t *) malloc((size_t) max_bs * sizeof(int64_t));
            if (!scratch) FAIL("FLAC decode allocation failed");
        }

        if (chan_code < 8) {
            if ((int) chan_code + 1 != nch) FAIL("FLAC frame channel count mismatch");
            for (int c = 0; c < nch; c++)
                if (subframe(&r, blocksize, bps, chan[c], scratch))
                    FAIL("invalid FLAC subframe");
        } else if (chan_code <= 10) {
            if (nch != 2) FAIL("FLAC frame channel count mismatch");
            int extra_a = (chan_code == 9) ? 1 : 0;
            int extra_b = (chan_code == 9) ? 0 : 1;
            if (subframe(&r, blocksize, bps + extra_a, chan[0], scratch))
                FAIL("invalid FLAC subframe");
            if (subframe(&r, blocksize, bps + extra_b, chan[1], scratch))
                FAIL("invalid FLAC subframe");
            if (chan_code == 8) {                   /* left + side */
                for (long i = 0; i < blocksize; i++)
                    chan[1][i] = chan[0][i] - chan[1][i];
            } else if (chan_code == 9) {            /* side + right */
                for (long i = 0; i < blocksize; i++)
                    chan[0][i] = chan[0][i] + chan[1][i];
            } else {                                /* mid + side */
                for (long i = 0; i < blocksize; i++) {
                    int64_t m2 = (chan[0][i] << 1) | (chan[1][i] & 1);
                    int64_t s = chan[1][i];
                    chan[0][i] = (m2 + s) >> 1;
                    chan[1][i] = (m2 - s) >> 1;
                }
            }
        } else {
            FAIL("reserved FLAC channel assignment");
        }
        r.pos = (r.pos + 7) & ~7UL;                 /* align */
        unsigned long frame_end = r.pos >> 3;
        if (br_read(&r, 16, &v)) FAIL("truncated FLAC stream");
        if ((uint16_t) v != crc16(buf + hdr_start, frame_end - hdr_start))
            FAIL("FLAC frame CRC-16 mismatch");

        long take = blocksize;
        if (written + take > total) take = total - written;
        for (long i = 0; i < take; i++)
            for (int c = 0; c < nch; c++)
                out[(written + i) * nch + c] = (int32_t) chan[c][i];
        written += take;
    }
    for (int c = 0; c < 8; c++) free(chan[c]);
    free(scratch);
    return 0;
fail:
    for (int c = 0; c < 8; c++) free(chan[c]);
    free(scratch);
    return 1;
}
"""


def _flac_shim_path() -> str:
    digest = hashlib.sha256(_FLAC_SHIM_SOURCE.encode()).hexdigest()[:16]
    return os.path.join(_shim_cache_dir(), f"flacshim-{digest}.so")


def _build_flac_shim() -> str | None:
    so_path = _flac_shim_path()
    if os.path.exists(so_path):
        return so_path
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        return None
    try:
        os.makedirs(_shim_cache_dir(), exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "flacshim.c")
            with open(src, "w") as f:
                f.write(_FLAC_SHIM_SOURCE)
            out = os.path.join(td, "flacshim.so")
            proc = subprocess.run(
                [gcc, "-O2", "-fPIC", "-shared", src, "-o", out],
                capture_output=True,
                timeout=120,
            )
            if proc.returncode != 0:
                return None
            tmp_dst = f"{so_path}.tmp.{os.getpid()}"
            shutil.copy(out, tmp_dst)
            os.replace(tmp_dst, so_path)
        return so_path
    except (OSError, subprocess.SubprocessError):
        return None


_flac_handle: tuple[ctypes.CDLL | None] | None = None


def _flac_shim() -> ctypes.CDLL | None:
    global _flac_handle
    if _flac_handle is None:
        lib = None
        path = _build_flac_shim()
        if path is not None:
            try:
                cand = ctypes.CDLL(path)
                cand.flacshim_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_ulong,
                    ctypes.c_ulong,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_long,
                    ctypes.c_void_p,
                    ctypes.c_char_p,
                ]
                cand.flacshim_decode.restype = ctypes.c_int
                lib = cand
            except OSError:
                lib = None
        _flac_handle = (lib,)
    return _flac_handle[0]


def flac_available() -> bool:
    return _flac_shim() is not None


def flac_enabled() -> bool:
    return _env_enabled() and flac_available()


def decode_flac_native(payload: bytes) -> dict:
    """FLAC decode through the compiled shim — exact integer parity
    with ``multimodal.decode_flac`` (FLAC is lossless; same CRC
    verification, same stereo/Rice/wasted-bits semantics, translated
    from the same spec).  Streams with unknown STREAMINFO total fall
    back to the stdlib twin (the shim sizes its output from the
    header).  Same dict contract: sample_rate, n_channels, (n, ch)
    float64 samples scaled by the STREAMINFO bps."""
    lib = _flac_shim()
    if lib is None:
        raise RuntimeError("FLAC shim not available (gcc missing)")
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    # STREAMINFO + metadata walk (header-only, cheap, pure struct math)
    pos, info = 4, None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if hdr & 0x7F == 0 and len(body) >= 18:  # STREAMINFO
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 0x7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0xF) << 32) | int.from_bytes(body[14:18], "big")
            info = (rate, nch, bps, total)
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC payload missing STREAMINFO")
    rate, nch, bps, total = info
    if total <= 0:
        raise ValueError("FLAC STREAMINFO total_samples unknown — stdlib path")
    out = np.empty(total * nch, np.int32)
    err = ctypes.create_string_buffer(256)
    rc = lib.flacshim_decode(
        payload,
        len(payload),
        pos,
        nch,
        bps,
        total,
        out.ctypes.data_as(ctypes.c_void_p),
        err,
    )
    if rc:
        raise ValueError(err.value.decode("utf-8", "replace") or "FLAC decode failed")
    samples = out.reshape(total, nch).astype(np.float64) / float(1 << (bps - 1))
    return {"sample_rate": rate, "n_channels": nch, "samples": samples}


# -------------------------------------------------------------------- libjpeg

_JPEG_SHIM_SOURCE = r"""
#include <setjmp.h>
#include <stdio.h>
#include <string.h>
#include <jpeglib.h>

/* setjmp-based error trap: the ONLY safe way to consume classic-libjpeg
   errors from a foreign runtime.  error_exit longjmps back here and the
   caller gets a return code + message instead of exit()/UB. */
struct shim_err {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
    char msg[JMSG_LENGTH_MAX];
};

static void shim_error_exit(j_common_ptr cinfo) {
    struct shim_err *e = (struct shim_err *) cinfo->err;
    (*cinfo->err->format_message)(cinfo, e->msg);
    longjmp(e->jb, 1);
}

static void shim_emit_message(j_common_ptr cinfo, int msg_level) {
    /* swallow warnings: corrupt-but-recoverable streams decode with
       libjpeg's own resync, and stderr chatter from executors is noise */
    (void) cinfo; (void) msg_level;
}

/* Header-only probe: fills dims so the caller can size the buffer.
   Returns 0 ok, 1 decode error (errmsg filled, >= 200 bytes). */
int jshim_header(const unsigned char *buf, unsigned long len,
                 int *width, int *height, int *channels, char *errmsg) {
    struct jpeg_decompress_struct cinfo;
    struct shim_err jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        strncpy(errmsg, jerr.msg, 199); errmsg[199] = 0;
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = (cinfo.num_components == 1) ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_calc_output_dimensions(&cinfo);
    *width = (int) cinfo.output_width;
    *height = (int) cinfo.output_height;
    *channels = cinfo.output_components;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Full decode into a caller-provided buffer (row-major, tight stride).
   Returns 0 ok, 1 decode error (errmsg filled), 2 buffer too small. */
int jshim_decode(const unsigned char *buf, unsigned long len,
                 unsigned char *out, unsigned long outlen,
                 int *width, int *height, int *channels, char *errmsg) {
    struct jpeg_decompress_struct cinfo;
    struct shim_err jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    jerr.pub.emit_message = shim_emit_message;
    if (setjmp(jerr.jb)) {
        strncpy(errmsg, jerr.msg, 199); errmsg[199] = 0;
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = (cinfo.num_components == 1) ? JCS_GRAYSCALE : JCS_RGB;
    /* pixel-replication chroma upsampling: parity with the stdlib
       decoder's np.repeat path (and cheaper) */
    cinfo.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&cinfo);
    *width = (int) cinfo.output_width;
    *height = (int) cinfo.output_height;
    *channels = cinfo.output_components;
    {
        unsigned long stride =
            (unsigned long) cinfo.output_width * cinfo.output_components;
        if (stride * cinfo.output_height > outlen) {
            jpeg_destroy_decompress(&cinfo);
            return 2;
        }
        while (cinfo.output_scanline < cinfo.output_height) {
            JSAMPROW row = out + (unsigned long) cinfo.output_scanline * stride;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}
"""


def _shim_cache_dir() -> str:
    return os.environ.get("TCDB_SPARK_SHIM_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "tcdb_spark"
    )


def _shim_path() -> str:
    digest = hashlib.sha256(_JPEG_SHIM_SOURCE.encode()).hexdigest()[:16]
    return os.path.join(_shim_cache_dir(), f"jpegshim-{digest}.so")


def _build_shim() -> str | None:
    """Compile the shim once per machine; concurrent builders race
    benignly (identical artifact, atomic replace). None = no compiler
    or no jpeglib dev header on this node."""
    so_path = _shim_path()
    if os.path.exists(so_path):
        return so_path
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        return None
    try:
        os.makedirs(_shim_cache_dir(), exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "jpegshim.c")
            with open(src, "w") as f:
                f.write(_JPEG_SHIM_SOURCE)
            out = os.path.join(td, "jpegshim.so")
            proc = subprocess.run(
                [gcc, "-O2", "-fPIC", "-shared", src, "-o", out, "-ljpeg"],
                capture_output=True,
                timeout=120,
            )
            if proc.returncode != 0:
                return None
            tmp_dst = f"{so_path}.tmp.{os.getpid()}"
            shutil.copy(out, tmp_dst)
            os.replace(tmp_dst, so_path)  # atomic on the same filesystem
        return so_path
    except (OSError, subprocess.SubprocessError):
        return None


_jpeg_handle: tuple[ctypes.CDLL | None] | None = None


def _jpeg_shim() -> ctypes.CDLL | None:
    """Load (building if needed) the libjpeg shim once per process."""
    global _jpeg_handle
    if _jpeg_handle is None:
        lib = None
        path = _build_shim()
        if path is not None:
            try:
                cand = ctypes.CDLL(path)
                argt = [
                    ctypes.c_char_p,
                    ctypes.c_ulong,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.c_char_p,
                ]
                cand.jshim_header.argtypes = argt
                cand.jshim_header.restype = ctypes.c_int
                cand.jshim_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_ulong,
                    ctypes.c_void_p,
                    ctypes.c_ulong,
                    *argt[2:],
                ]
                cand.jshim_decode.restype = ctypes.c_int
                lib = cand
            except OSError:
                lib = None
        _jpeg_handle = (lib,)
    return _jpeg_handle[0]


def jpeg_available() -> bool:
    return _jpeg_shim() is not None


def jpeg_enabled() -> bool:
    return _env_enabled() and jpeg_available()


def decode_jpeg_native(payload: bytes) -> dict:
    """JPEG decode through libjpeg-turbo (classic API, setjmp shim).
    Same dict shape as ``multimodal.decode_jpeg``; pixels agree with
    the stdlib float-IDCT path within ±2 (fixed-point islow IDCT +
    fixed-point YCbCr, both T.81-conformant).  Baseline + progressive
    + arithmetic-coded streams; grayscale stays 1 channel, everything
    else converts to RGB.  Corrupt payloads raise ``ValueError``."""
    lib = _jpeg_shim()
    if lib is None:
        raise RuntimeError("libjpeg shim not available (gcc/jpeglib.h missing)")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.jshim_header(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch), err
    )
    if rc:
        raise ValueError(f"libjpeg: {err.value.decode('utf-8', 'replace')}")
    out = np.empty(h.value * w.value * ch.value, np.uint8)
    rc = lib.jshim_decode(
        payload,
        len(payload),
        out.ctypes.data_as(ctypes.c_void_p),
        out.nbytes,
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(ch),
        err,
    )
    if rc == 2:  # dims changed between header and decode: hostile stream
        raise ValueError("libjpeg: inconsistent JPEG dimensions")
    if rc:
        raise ValueError(f"libjpeg: {err.value.decode('utf-8', 'replace')}")
    return {
        "width": w.value,
        "height": h.value,
        "maxval": 255,
        "pixels": out.reshape(h.value, w.value, ch.value),
    }
