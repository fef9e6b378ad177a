"""Native (C-library) image decode behind the ``decode_image`` routing
seam — the fast path VERDICT r6 #1 asked for, retiring the stdlib
codec throughput ceiling (JPEG 0.26 MB/s -> libjpeg-turbo, PNG-Paeth
1.9 MB/s -> libpng16) while keeping the pure-Python decoders as the
portable fallback and as the cross-check twin.

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
