"""Self-describing compressed ndarray envelopes (pack_array/unpack_array).

The reference Go library stops at the bytes level; its Python-world
counterpart (python-blosc ``pack_array``) wraps a frame with enough
metadata to reconstruct the ndarray.  This is that capability, with an
explicit little-endian envelope instead of pickle (no code execution on
untrusted input — SECURITY.md):

    TPBA | ver:u8 | flags:u8 | dlen:u8 | dtype-str | ndim:u8 | shape:u64*ndim | frame

``flags`` bit 0: payload empty (zero-size array, no frame follows).
``flags`` bit 1: Fortran-ordered source (restored on unpack).

The dtype string is numpy's .str form ('<f4', '|u1', '<M8[ns]', ...),
endianness included, so frames written on this little-endian host decode
to an identical array anywhere.
"""

from __future__ import annotations

import struct

import numpy as np

from .api import compress_with_options, decompress
from .errors import InvalidDataError, InvalidHeaderError
from .options import Options

_MAGIC = b"TPBA"
_VERSION = 1
_FLAG_EMPTY = 0x1
_FLAG_FORTRAN = 0x2

def pack_array(arr: np.ndarray, opts: Options | None = None) -> bytes:
    """Compress an ndarray into a self-describing envelope.

    ``type_size`` defaults to the dtype's item size (capped at 255, the
    frame header's limit) so the shuffle filter aligns with real element
    boundaries; pass ``opts`` to override any option.
    """
    arr = np.asarray(arr)
    if arr.dtype.kind == "O":
        raise TypeError("object dtypes cannot be packed")
    if arr.dtype.names is not None:
        raise TypeError("structured dtypes cannot be packed")
    dstr = arr.dtype.str.encode("ascii")
    if len(dstr) > 255:
        raise TypeError(f"dtype string too long: {arr.dtype.str!r}")
    if arr.ndim > 255:
        raise TypeError("arrays beyond 255 dimensions cannot be packed")

    fortran = arr.ndim > 1 and arr.flags.f_contiguous and not arr.flags.c_contiguous
    body = np.asfortranarray(arr).tobytes(order="F") if fortran else \
        np.ascontiguousarray(arr).tobytes()

    flags = 0
    if fortran:
        flags |= _FLAG_FORTRAN
    head = bytearray()
    head += _MAGIC
    head.append(_VERSION)
    flags_pos = len(head)
    head.append(flags)
    head.append(len(dstr))
    head += dstr
    head.append(arr.ndim)
    for dim in arr.shape:
        head += struct.pack("<Q", dim)

    if len(body) == 0:
        head[flags_pos] |= _FLAG_EMPTY
        return bytes(head)

    if opts is None:
        opts = Options(type_size=min(arr.dtype.itemsize, 255))
    frame = compress_with_options(body, opts)
    return bytes(head) + frame


def _parse_envelope(buf: bytes) -> tuple[np.dtype, tuple, int, int]:
    """Validate a TPBA envelope; return (dtype, shape, flags, payload_off)."""
    if len(buf) < 8 or buf[:4] != _MAGIC:
        raise InvalidHeaderError("blosc: invalid header: not a TPBA envelope")
    if buf[4] != _VERSION:
        raise InvalidHeaderError(
            f"blosc: invalid header: unsupported TPBA version {buf[4]}"
        )
    flags = buf[5]
    dlen = buf[6]
    pos = 7
    if len(buf) < pos + dlen + 1:
        raise InvalidDataError("blosc: invalid compressed data: truncated envelope")
    try:
        dtype = np.dtype(buf[pos : pos + dlen].decode("ascii"))
    except (UnicodeDecodeError, TypeError) as exc:
        raise InvalidDataError(
            f"blosc: invalid compressed data: bad dtype ({exc})"
        ) from None
    pos += dlen
    ndim = buf[pos]
    pos += 1
    if len(buf) < pos + 8 * ndim:
        raise InvalidDataError("blosc: invalid compressed data: truncated shape")
    shape = tuple(
        struct.unpack_from("<Q", buf, pos + 8 * i)[0] for i in range(ndim)
    )
    pos += 8 * ndim
    return dtype, shape, flags, pos


def unpack_array(data) -> np.ndarray:
    """Reconstruct the ndarray from a pack_array envelope."""
    buf = bytes(data) if not isinstance(data, bytes) else data
    dtype, shape, flags, pos = _parse_envelope(buf)

    if flags & _FLAG_EMPTY:
        return np.empty(shape, dtype=dtype)

    body = decompress(buf[pos:])
    order = "F" if flags & _FLAG_FORTRAN else "C"
    n_el = int(np.prod(shape)) if shape else 1
    if dtype.itemsize * n_el != len(body):
        raise InvalidDataError(
            "blosc: invalid compressed data: payload size does not match shape"
        )
    arr = np.frombuffer(body, dtype=dtype)
    return arr.reshape(shape, order=order).copy(order=order)
