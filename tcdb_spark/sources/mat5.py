"""Minimal pure-stdlib MAT-File level 5 reader/writer.

The image has no scipy, but the MAT 5 container format is publicly
documented (MathWorks "MAT-File Format" reference) and small: 128-byte
header, then 8-byte-tagged data elements; a variable is one miMATRIX
element (flags, dims, name, class-specific payload); files written by
MATLAB wrap each variable in a zlib miCOMPRESSED element — stdlib zlib
decodes those.  This module implements exactly the subset the syntrack
ensemble layout needs (reference: tcdb/etl/syntracks.py:203-269 reads a
struct array of numeric vectors and char names) while staying general:
numeric arrays, char arrays, struct arrays, and cell arrays, both
directions, compressed and uncompressed.

Little-endian files only (every MATLAB on x86/arm writes little-endian);
big-endian files raise with a clear message rather than mis-reading.
"""

from __future__ import annotations

import io
import struct as _struct
import zlib
from typing import Any

import numpy as np

# MAT5 data types
MI_INT8, MI_UINT8, MI_INT16, MI_UINT16 = 1, 2, 3, 4
MI_INT32, MI_UINT32, MI_SINGLE, MI_DOUBLE = 5, 6, 7, 9
MI_INT64, MI_UINT64 = 12, 13
MI_MATRIX, MI_COMPRESSED, MI_UTF8, MI_UTF16 = 14, 15, 16, 17

# MAT5 array classes
MX_CELL, MX_STRUCT, MX_OBJECT, MX_CHAR, MX_SPARSE = 1, 2, 3, 4, 5
MX_DOUBLE, MX_SINGLE = 6, 7
MX_INT8, MX_UINT8, MX_INT16, MX_UINT16, MX_INT32, MX_UINT32 = 8, 9, 10, 11, 12, 13
MX_INT64, MX_UINT64 = 14, 15

_MI_DTYPE = {
    MI_INT8: np.int8, MI_UINT8: np.uint8, MI_INT16: np.int16,
    MI_UINT16: np.uint16, MI_INT32: np.int32, MI_UINT32: np.uint32,
    MI_SINGLE: np.float32, MI_DOUBLE: np.float64,
    MI_INT64: np.int64, MI_UINT64: np.uint64,
}
_MX_DTYPE = {
    MX_DOUBLE: np.float64, MX_SINGLE: np.float32,
    MX_INT8: np.int8, MX_UINT8: np.uint8, MX_INT16: np.int16,
    MX_UINT16: np.uint16, MX_INT32: np.int32, MX_UINT32: np.uint32,
    MX_INT64: np.int64, MX_UINT64: np.uint64,
}


# --------------------------------------------------------------- reading

def _read_tag(buf: bytes, pos: int):
    """Returns (mi_type, payload, next_pos). Handles the small-data
    element format (type and size packed into one word, data in the
    second half of the tag)."""
    (word,) = _struct.unpack_from("<I", buf, pos)
    if word >> 16:  # small element: size in the high half-word
        size, mi = word >> 16, word & 0xFFFF
        return mi, buf[pos + 4 : pos + 4 + size], pos + 8
    (size,) = _struct.unpack_from("<I", buf, pos + 4)
    data = buf[pos + 8 : pos + 8 + size]
    end = pos + 8 + size
    return word, data, end + (-end % 8)


def _decode_char(data: bytes, mi: int, dims) -> Any:
    if mi in (MI_UINT16, MI_UTF16):
        flat = data.decode("utf-16-le")
    elif mi in (MI_UTF8,):
        flat = data.decode("utf-8")
    else:  # miINT8/miUINT8 legacy
        flat = data.decode("latin-1")
    if len(dims) < 2 or dims[0] <= 1:
        return flat
    # m>1 char matrices are column-major char grids -> one string per row
    m, n = dims[0], dims[1]
    return [
        "".join(flat[c * m + r] for c in range(n)).rstrip() for r in range(m)
    ]


def _parse_matrix(buf: bytes) -> tuple[str, Any]:
    pos = 0
    mi, flags_data, pos = _read_tag(buf, pos)
    (flags_word,) = _struct.unpack_from("<I", flags_data, 0)
    mx_class = flags_word & 0xFF
    mi, dims_data, pos = _read_tag(buf, pos)
    dims = list(np.frombuffer(dims_data, dtype="<i4"))
    mi, name_data, pos = _read_tag(buf, pos)
    name = name_data.decode("latin-1").rstrip("\x00")

    if mx_class == MX_CHAR:
        mi, data, pos = _read_tag(buf, pos)
        return name, _decode_char(data, mi, dims)

    if mx_class == MX_STRUCT:
        _, flen_data, pos = _read_tag(buf, pos)
        (flen,) = _struct.unpack_from("<i", flen_data, 0)
        _, names_data, pos = _read_tag(buf, pos)
        fields = [
            names_data[i : i + flen].decode("latin-1").rstrip("\x00")
            for i in range(0, len(names_data), flen)
        ]
        n_elem = int(np.prod(dims)) if dims else 1
        elems = []
        for _ in range(n_elem):
            d = {}
            for f in fields:
                mi, sub, pos = _read_tag(buf, pos)
                if mi != MI_MATRIX:
                    raise ValueError(f"struct field {f}: expected miMATRIX, got {mi}")
                _, d[f] = _parse_matrix(sub)
            elems.append(d)
        return name, (elems[0] if n_elem == 1 else elems)

    if mx_class == MX_CELL:
        n_elem = int(np.prod(dims)) if dims else 1
        cells = []
        for _ in range(n_elem):
            mi, sub, pos = _read_tag(buf, pos)
            _, v = _parse_matrix(sub)
            cells.append(v)
        return name, (cells[0] if n_elem == 1 else cells)

    if mx_class in _MX_DTYPE:
        mi, data, pos = _read_tag(buf, pos)
        arr = np.frombuffer(data, dtype=np.dtype(_MI_DTYPE[mi]).newbyteorder("<"))
        arr = arr.astype(_MX_DTYPE[mx_class])  # stored type may be narrower
        if len(arr) == 0:
            return name, None  # MATLAB empty []
        if dims and int(np.prod(dims)) == len(arr):
            arr = arr.reshape(dims, order="F")
        arr = np.squeeze(arr)
        if arr.ndim == 0:
            return name, arr.item()
        return name, arr

    if mx_class in (MX_OBJECT, MX_SPARSE):
        # legitimate MATLAB classes this reader doesn't carry — the
        # actionable capability gate
        raise NotImplementedError(f"MAT5 array class {mx_class} not supported")
    # class codes outside 1-15 are not MATLAB classes at all — corruption
    raise ValueError(f"invalid MAT5 array class {mx_class}")


def load_mat(source: str | bytes) -> dict[str, Any]:
    """Parse a MAT 5 file (path or raw bytes) into {variable: value}.

    Values: numpy arrays (squeezed; scalars become Python numbers),
    strings for char arrays, dict / list-of-dict for structs, lists for
    cells, ``None`` for MATLAB ``[]``.
    """
    buf = source if isinstance(source, bytes) else open(source, "rb").read()
    if len(buf) < 128:
        raise ValueError("not a MAT 5 file: header too short")
    endian = buf[126:128]
    if endian == b"MI":
        raise NotImplementedError("big-endian MAT file; convert on a LE host")
    if endian != b"IM":
        raise ValueError("not a MAT 5 file: bad endian indicator")
    try:
        return _load_mat_body(buf)
    except (KeyError, IndexError, OverflowError, UnicodeDecodeError,
            zlib.error, _struct.error) as ex:
        # corrupt tags/dims/type codes surface as the documented
        # ValueError contract, not implementation internals (hypothesis
        # fuzz finding, tests/test_property_containers.py); the
        # big-endian NotImplementedError gate above passes through
        raise ValueError(f"malformed MAT 5 file: {ex!r}") from ex


def _load_mat_body(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    pos = 128
    while pos + 8 <= len(buf):
        (word,) = _struct.unpack_from("<I", buf, pos)
        if word >> 16:  # small element at top level: skip
            pos += 8
            continue
        (size,) = _struct.unpack_from("<I", buf, pos + 4)
        data = buf[pos + 8 : pos + 8 + size]
        end = pos + 8 + size
        # MATLAB does NOT pad miCOMPRESSED elements to the 8-byte
        # boundary; every other element is padded
        pos = end if word == MI_COMPRESSED else end + (-end % 8)
        if word == MI_COMPRESSED:
            inner = zlib.decompress(data)
            mi2, payload, _ = _read_tag(inner, 0)
            if mi2 != MI_MATRIX:
                continue
            name, value = _parse_matrix(payload)
        elif word == MI_MATRIX:
            name, value = _parse_matrix(data)
        else:  # skip unknown top-level elements
            continue
        out[name] = value
    return out


# --------------------------------------------------------------- writing

def _tag(mi: int, payload: bytes) -> bytes:
    pad = -len(payload) % 8
    return _struct.pack("<II", mi, len(payload)) + payload + b"\x00" * pad


def _matrix(name: str, value: Any) -> bytes:
    body = io.BytesIO()

    def emit_header(mx_class: int, dims: list[int]):
        body.write(_tag(MI_UINT32, _struct.pack("<II", mx_class, 0)))
        body.write(_tag(MI_INT32, np.asarray(dims, dtype="<i4").tobytes()))
        body.write(_tag(MI_INT8, name.encode("latin-1")))

    if value is None:  # MATLAB []
        emit_header(MX_DOUBLE, [0, 0])
        body.write(_tag(MI_DOUBLE, b""))
    elif isinstance(value, str):
        emit_header(MX_CHAR, [1, len(value)])
        body.write(_tag(MI_UINT16, value.encode("utf-16-le")))
    elif isinstance(value, dict):
        return _matrix_struct(name, [value], [1, 1])
    elif isinstance(value, list) and value and isinstance(value[0], dict):
        return _matrix_struct(name, value, [1, len(value)])
    else:
        arr = np.atleast_2d(np.asarray(value, dtype=np.float64))
        emit_header(MX_DOUBLE, list(arr.shape))
        body.write(_tag(MI_DOUBLE, arr.flatten(order="F").tobytes()))
    return _tag(MI_MATRIX, body.getvalue())


def _matrix_struct(name: str, elems: list[dict], dims: list[int]) -> bytes:
    fields = list(elems[0].keys())
    for e in elems:
        if list(e.keys()) != fields:
            raise ValueError("struct array elements must share field names")
    flen = max(len(f) for f in fields) + 1
    body = io.BytesIO()
    body.write(_tag(MI_UINT32, _struct.pack("<II", MX_STRUCT, 0)))
    body.write(_tag(MI_INT32, np.asarray(dims, dtype="<i4").tobytes()))
    body.write(_tag(MI_INT8, name.encode("latin-1")))
    body.write(_tag(MI_INT32, _struct.pack("<i", flen)))
    body.write(
        _tag(MI_INT8, b"".join(f.encode("latin-1").ljust(flen, b"\x00") for f in fields))
    )
    for e in elems:
        for f in fields:
            body.write(_matrix("", e[f]))
    return _tag(MI_MATRIX, body.getvalue())


def save_mat(path_or_buf, variables: dict[str, Any], compress: bool = False) -> None:
    """Write a MAT 5 file. ``variables``: {name: value} where value is a
    number, list of numbers, numpy array, string, None, dict (1x1
    struct), or list of dicts (1xN struct array)."""
    header = b"MATLAB 5.0 MAT-file, written by tcdb_spark.sources.mat5".ljust(116)
    header += b"\x00" * 8 + _struct.pack("<H", 0x0100) + b"IM"
    out = io.BytesIO()
    out.write(header)
    for name, value in variables.items():
        element = _matrix(name, value)
        if compress:  # compressed elements are written unpadded, like MATLAB
            z = zlib.compress(element)
            out.write(_struct.pack("<II", MI_COMPRESSED, len(z)) + z)
        else:
            out.write(element)
    data = out.getvalue()
    if isinstance(path_or_buf, (str, bytes)):
        with open(path_or_buf, "wb") as fh:
            fh.write(data)
    else:
        path_or_buf.write(data)
