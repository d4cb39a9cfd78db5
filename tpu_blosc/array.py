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

def _dtype_str(dtype: np.dtype) -> bytes:
    """Unambiguous envelope dtype string (registered name for extension
    dtypes like bfloat16 whose .str degrades to a void typestr)."""
    s = dtype.str
    if (
        s.lstrip("<>|=").startswith("V")
        and dtype.names is None
        and dtype.name != f"void{dtype.itemsize * 8}"
    ):
        s = dtype.name
    out = s.encode("ascii")
    if len(out) > 255:
        raise TypeError(f"dtype string too long: {s!r}")
    return out


def _envelope_head(dtype: np.dtype, shape: tuple, flags: int) -> bytearray:
    head = bytearray()
    head += _MAGIC
    head.append(_VERSION)
    head.append(flags)
    dstr = _dtype_str(dtype)
    head.append(len(dstr))
    head += dstr
    head.append(len(shape))
    for dim in shape:
        head += struct.pack("<Q", dim)
    return head


def pack_array(arr, opts: Options | None = None) -> bytes:
    """Compress an ndarray (or jax.Array) into a self-describing envelope.

    ``type_size`` defaults to the dtype's item size (capped at 255, the
    frame header's limit) so the shuffle filter aligns with real element
    boundaries; pass ``opts`` to override any option.

    Device arrays route through :func:`tpu_blosc.compress_array` — the
    shuffle filter runs on chip (SWAR word kernels) and only the
    filtered stream crosses the link; the envelope is identical to
    packing the fetched ndarray.
    """
    try:
        import jax

        is_jax = isinstance(arr, jax.Array) and not isinstance(
            arr, np.ndarray
        )
    except Exception:  # pragma: no cover - jax is baked into this env
        is_jax = False
    if is_jax:
        dtype = np.dtype(arr.dtype)
        if arr.ndim > 255:
            raise TypeError("arrays beyond 255 dimensions cannot be packed")
        if arr.size == 0:
            return bytes(
                _envelope_head(dtype, tuple(arr.shape), _FLAG_EMPTY)
            )
        from .device import compress_array

        if opts is None:
            opts = Options(type_size=min(dtype.itemsize, 255))
        frame = compress_array(arr, opts)
        return bytes(_envelope_head(dtype, tuple(arr.shape), 0)) + frame

    arr = np.asarray(arr)
    if arr.dtype.kind == "O":
        raise TypeError("object dtypes cannot be packed")
    if arr.dtype.names is not None:
        raise TypeError("structured dtypes cannot be packed")
    if arr.ndim > 255:
        raise TypeError("arrays beyond 255 dimensions cannot be packed")

    fortran = arr.ndim > 1 and arr.flags.f_contiguous and not arr.flags.c_contiguous
    # zero-copy into the compressor: F-contiguous arrays pack in F order by
    # flattening the transposed (C-contiguous) view; everything else passes
    # as a contiguous array — compress_with_options reads both through the
    # buffer protocol with no tobytes staging copy
    body = np.ascontiguousarray(arr.T) if fortran else \
        np.ascontiguousarray(arr)

    flags = _FLAG_FORTRAN if fortran else 0
    if body.nbytes == 0:
        flags |= _FLAG_EMPTY
        return bytes(_envelope_head(arr.dtype, arr.shape, flags))
    head = _envelope_head(arr.dtype, arr.shape, flags)

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
        dstr = buf[pos : pos + dlen].decode("ascii")
    except UnicodeDecodeError as exc:
        raise InvalidDataError(
            f"blosc: invalid compressed data: bad dtype ({exc})"
        ) from None
    try:
        dtype = np.dtype(dstr)
    except TypeError:
        # extension dtype stored by registered name; ml_dtypes may not
        # be imported in this process yet
        try:
            import ml_dtypes

            dtype = np.dtype(getattr(ml_dtypes, dstr))
        except Exception:
            raise InvalidDataError(
                f"blosc: invalid compressed data: bad dtype ({dstr!r})"
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


def unpack_array(data, device: bool = False, sharding=None):
    """Reconstruct the ndarray from a pack_array envelope.

    With ``device=True`` (or a ``sharding``) the result is a jax.Array
    placed on device via :func:`tpu_blosc.decompress_array` (C-ordered
    envelopes decode straight into device memory; Fortran-ordered ones
    decode on host first)."""
    buf = bytes(data) if not isinstance(data, bytes) else data
    dtype, shape, flags, pos = _parse_envelope(buf)

    if device or sharding is not None:
        import jax

        if flags & _FLAG_EMPTY:
            out = jax.numpy.empty(shape, dtype=dtype)
            return jax.device_put(out, sharding) if sharding else out
        if not flags & _FLAG_FORTRAN:
            from .device import decompress_array

            return decompress_array(
                buf[pos:], dtype, shape=shape, sharding=sharding
            )
        host = unpack_array(buf)
        return jax.device_put(host, sharding) if sharding else \
            jax.device_put(host)

    if flags & _FLAG_EMPTY:
        return np.empty(shape, dtype=dtype)

    payload = buf[pos:]
    order = "F" if flags & _FLAG_FORTRAN else "C"
    n_el = int(np.prod(shape)) if shape else 1
    # validate the declared size BEFORE allocating, then decode straight
    # into the result array (no intermediate bytes + frombuffer copy);
    # F-ordered payloads are the F-layout byte stream, so filling the
    # F-ordered array's memory in linear order is exactly right
    from .api import decompress_into, get_decompressed_size

    if dtype.itemsize * n_el != get_decompressed_size(payload):
        raise InvalidDataError(
            "blosc: invalid compressed data: payload size does not match shape"
        )
    view = None
    try:
        out = np.empty(shape, dtype=dtype, order=order)
        view = out.reshape(-1, order=order).view(np.uint8)
    except Exception:  # dtype/shape the u8 view can't express
        pass
    if view is not None and view.flags.c_contiguous:
        decompress_into(payload, view)
        return out
    body = decompress(payload)
    arr = np.frombuffer(body, dtype=dtype)
    return arr.reshape(shape, order=order).copy(order=order)


def unpack_array_rows(data, start: int, stop: int) -> np.ndarray:
    """Rows [start, stop) along axis 0 of a packed array, decoding only
    the frame blocks that cover those rows (api.decompress_range).

    C-ordered envelopes map rows to a contiguous decompressed byte range;
    Fortran-ordered envelopes have no such range and fall back to a full
    unpack + slice.  0-d arrays are rejected (no axis to slice)."""
    from .api import decompress_range

    buf = bytes(data) if not isinstance(data, bytes) else data
    dtype, shape, flags, pos = _parse_envelope(buf)
    if len(shape) == 0:
        raise InvalidDataError(
            "blosc: invalid compressed data: 0-d array has no rows"
        )
    nrows = shape[0]
    start, stop = int(start), int(stop)
    if not 0 <= start <= stop <= nrows:
        raise InvalidDataError(
            f"blosc: invalid compressed data: rows [{start}, {stop}) "
            f"outside [0, {nrows})"
        )
    out_shape = (stop - start,) + shape[1:]
    if flags & _FLAG_EMPTY or stop == start:
        return np.empty(out_shape, dtype=dtype)
    if flags & _FLAG_FORTRAN:
        return unpack_array(buf)[start:stop].copy()
    row_bytes = dtype.itemsize * int(np.prod(shape[1:], dtype=np.int64))
    view = None
    try:
        out = np.empty(out_shape, dtype=dtype)
        view = out.reshape(-1).view(np.uint8)
    except Exception:
        pass
    if view is not None and view.flags.c_contiguous:
        from .api import decompress_range_into

        decompress_range_into(
            buf[pos:], start * row_bytes, (stop - start) * row_bytes, view
        )
        return out
    body = decompress_range(
        buf[pos:], start * row_bytes, (stop - start) * row_bytes
    )
    return np.frombuffer(body, dtype=dtype).reshape(out_shape).copy()
