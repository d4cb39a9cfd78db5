"""Super-frame container: 64-bit framing for inputs beyond the uint32 cap.

The reference's frame header stores every size in uint32 (blosc.go:159-161),
capping a frame near 4 GiB; its ErrDataTooLarge sentinel is declared but
never raised (SURVEY §2 C4) — oversized inputs silently truncate.  This
library raises DataTooLargeError for a bare frame and offers this container
for the large-input path (BASELINE config 5: 4 GB sharded with ordered
gather).

Layout (all little-endian):

    bytes 0-3    magic  b"TPB2"   (0x54 first — can never be confused with
                                   a Blosc frame, whose byte 0 must be 2)
    byte  4      container version = 1
    byte  5      codec ID
    byte  6      flags (same bits as the frame header)
    byte  7      type size
    bytes 8-15   total uncompressed size (uint64)
    bytes 16-19  number of sub-frames (uint32)
    then         nframes x uint64 compressed sub-frame sizes
    then         concatenated standard chunked Blosc frames

Each sub-frame is an independent FLAG_SPLIT frame over a fixed-size slice
of the input (default 1 GiB), so sub-frames shard across hosts with only an
ordered gather of (size, payload) — dist/mesh.py reuses this layout for
the multi-host path.
"""

from __future__ import annotations

import struct

from .errors import InvalidDataError, InvalidHeaderError, SizeMismatchError
from .format import (
    FLAG_BITSHUFFLE,
    FLAG_SHUFFLE,
    Shuffle,
)
from .options import Options

MAGIC = b"TPB2"
CONTAINER_VERSION = 1
CONTAINER_HEADER_SIZE = 20

# Default uncompressed bytes per sub-frame; must stay far enough under the
# uint32 frame cap that header+table+incompressible payload still fits.
DEFAULT_FRAME_LIMIT = 1 << 30


def is_container(data) -> bool:
    return bytes(data[:4]) == MAGIC


def compress_container(
    raw: bytes, opts: Options, frame_limit: int = DEFAULT_FRAME_LIMIT
) -> bytes:
    """Compress into a super-frame of independent chunked sub-frames."""
    from .api import _compress_frame_sized

    if len(raw) == 0:
        raise InvalidDataError("blosc: invalid compressed data: empty input")
    n = len(raw)
    # align the slice boundary so shuffle groups never straddle sub-frames
    align = 8 * max(opts.type_size, 1)
    frame_limit = max((frame_limit // align) * align, align)

    frames: list[bytes] = []
    mv = memoryview(raw)  # zero-copy sub-frame slices
    for start in range(0, n, frame_limit):
        frames.append(
            _compress_frame_sized(mv[start : start + frame_limit], opts)
        )

    flags = 0
    if opts.shuffle == Shuffle.SHUFFLE:
        flags |= FLAG_SHUFFLE
    elif opts.shuffle == Shuffle.BITSHUFFLE:
        flags |= FLAG_BITSHUFFLE
    head = MAGIC + struct.pack(
        "<BBBBQI",
        CONTAINER_VERSION,
        int(opts.codec),
        flags,
        min(opts.type_size, 255),
        n,
        len(frames),
    )
    table = struct.pack(f"<{len(frames)}Q", *(len(f) for f in frames))
    return head + table + b"".join(frames)


def parse_container(data) -> tuple[int, int, int, int, int, list[int], int]:
    """Return (version, codec, flags, type_size, total, frame_sizes, offset)."""
    raw = bytes(data[:CONTAINER_HEADER_SIZE])
    if len(raw) < CONTAINER_HEADER_SIZE or raw[:4] != MAGIC:
        raise InvalidHeaderError("blosc: invalid container header")
    version, codec, flags, type_size, total, nframes = struct.unpack(
        "<BBBBQI", raw[4:]
    )
    if version != CONTAINER_VERSION:
        raise InvalidHeaderError(
            f"blosc: unsupported container version {version}"
        )
    table_end = CONTAINER_HEADER_SIZE + 8 * nframes
    if nframes == 0 or table_end > len(data):
        raise InvalidDataError("blosc: invalid container: bad frame table")
    sizes = list(
        struct.unpack(f"<{nframes}Q", bytes(data[CONTAINER_HEADER_SIZE:table_end]))
    )
    return version, codec, flags, type_size, total, sizes, table_end


from dataclasses import dataclass


@dataclass(frozen=True)
class ContainerInfo:
    """Metadata of a super-frame container (the get_info analogue)."""

    version: int
    codec: int
    flags: int
    type_size: int
    nbytes_orig: int
    num_frames: int

    @property
    def is_container(self) -> bool:
        return True


def get_container_info(data) -> ContainerInfo:
    version, codec, flags, type_size, total, sizes, _ = parse_container(data)
    return ContainerInfo(version, codec, flags, type_size, total, len(sizes))


def frame_spans(mv, total: int, sizes: list[int], offset: int):
    """Validated (frame_pos, frame_size, nbytes_orig) per sub-frame.

    Shared by every container reader (full decode AND range decode):
    bounds the frame region against the input, requires each sub-frame to
    carry a header, and cross-checks the container's declared uint64
    total against the sub-frame headers BEFORE any output allocation — a
    forged total (or sub-frame header) fails cleanly here instead of
    driving a huge buffer or silently misaligned range reads.
    """
    from .format import parse_header as _ph

    if offset + sum(sizes) > len(mv):
        raise InvalidDataError(
            "blosc: invalid container: frames overrun input"
        )
    spans = []
    pos = offset
    claimed = 0
    for fs in sizes:
        if fs < 16:
            raise InvalidDataError(
                "blosc: invalid container: sub-frame shorter than a header"
            )
        n_sub = _ph(bytes(mv[pos : pos + 16])).nbytes_orig
        spans.append((pos, fs, n_sub))
        claimed += n_sub
        pos += fs
    if claimed != total:
        raise SizeMismatchError(
            f"blosc: decompressed size mismatch: container declares {total} "
            f"bytes, sub-frames declare {claimed}"
        )
    return spans


def decompress_container(data, type_size: int = 0) -> bytes:
    """Decompress a super-frame (sub-frames decoded independently, in order).

    Decodes every sub-frame straight into one result allocation
    (decompress_into) — a join of per-frame bytes would touch the full
    output twice, which is pathological on hosts with slow page faults.
    """
    from .api import decompress_into, decompress_with_size

    _, _, _, _, total, sizes, offset = parse_container(data)
    mv = memoryview(data)
    frame_spans(mv, total, sizes, offset)  # validates before allocating
    try:
        from .native.backend import alloc_bytes, available as _native_ok
    except Exception:  # pragma: no cover
        _native_ok = lambda: False  # noqa: E731
    if _native_ok() and type_size <= 0:
        import ctypes

        import numpy as np

        from .format import parse_header

        out, addr = alloc_bytes(total)
        view = np.ctypeslib.as_array(
            ctypes.cast(addr, ctypes.POINTER(ctypes.c_ubyte)), shape=(total,)
        )
        pos = 0
        fpos = offset
        for fs in sizes:
            sub = mv[fpos : fpos + fs]
            fpos += fs
            n_sub = parse_header(bytes(sub[:16])).nbytes_orig
            if pos + n_sub > total:
                raise SizeMismatchError(
                    "blosc: decompressed size mismatch: container frames "
                    "exceed declared total"
                )
            decompress_into(sub, view[pos:])
            pos += n_sub
        if pos != total:
            raise SizeMismatchError(
                f"blosc: decompressed size mismatch: got {pos}, "
                f"expected {total}"
            )
        return out
    parts: list[bytes] = []
    pos = offset
    for fs in sizes:
        parts.append(decompress_with_size(mv[pos : pos + fs], type_size))
        pos += fs
    out = b"".join(parts)
    if len(out) != total:
        raise SizeMismatchError(
            f"blosc: decompressed size mismatch: got {len(out)}, "
            f"expected {total}"
        )
    return out
