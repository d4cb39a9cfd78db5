"""ctypes binding to the C++ host backend (libtpublosc.so).

Build contract: the shared library is compiled on demand from
``tpublosc.cpp`` next to this file (g++ -O3 -march=native -fopenmp -shared)
and cached; if the toolchain or source is missing, ``available()`` returns
False and callers fall back to the pure-Python/NumPy paths — the same
boolean-degradation contract as the reference's SIMD dispatch
(shuffle.go:31-57).

Beyond the single-buffer entry points (mirroring the reference's per-call
API), this exposes the whole-chunk block pipelines
(``compress_blocks``/``decompress_blocks``) that filter+compress every
block of a chunked frame in one call with OpenMP across blocks — the
host-side analogue of sharding blocks across TPU chips (SURVEY §5).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tpublosc.cpp")
# TPU_BLOSC_LIB: explicit path to a prebuilt library (sanitizer builds in
# CI, cross-build testing); when set, the staleness auto-rebuild is skipped.
_LIB_OVERRIDE = os.environ.get("TPU_BLOSC_LIB")
_LIB_PATH = _LIB_OVERRIDE or os.path.join(_HERE, "libtpublosc.so")

_lib = None
_fast = None  # CPython fastcall module (_tpbfast), see _load_fastmod
_lock = threading.Lock()
_tried = False

_i64 = ctypes.c_int64
_p = ctypes.c_void_p


def _build() -> bool:
    """Compile the shared library, degrading FLAGS before giving up.

    Stock Apple clang (the macos-arm64 `g++` alias) rejects both
    `-march=native` and `-fopenmp`; neither is required for a working
    backend — every AVX2/SSE intrinsic and every OpenMP call in the
    source is #ifdef-gated, so dropping the flags yields portable scalar
    kernels + the SpinPool (which needs no OpenMP) instead of a failed
    build (the reference ships NEON kernels for this slot,
    shuffle_arm64.s:65-224; our portability contract is the boolean
    fallback chain staying NATIVE on non-x86 hosts).  Homebrew include/
    lib paths are added on darwin — Apple clang does not search
    /opt/homebrew by default, and zlib/zstd live there on arm64 runners.
    """
    if not os.path.exists(_SRC):
        return False
    import sys

    extra: list[str] = []
    if sys.platform == "darwin":
        for pre in ("/opt/homebrew", "/usr/local"):
            if os.path.isdir(pre + "/include"):
                extra += ["-I" + pre + "/include", "-L" + pre + "/lib"]
    base = ["-O3", "-funroll-loops", "-shared", "-fPIC", "-std=c++17"]
    for flags in (
        ["-march=native", "-fopenmp"],
        ["-fopenmp"],
        ["-march=native"],
        [],
    ):
        cmd = (
            ["g++"] + base + flags + extra
            + [_SRC, "-o", _LIB_PATH, "-lz", "-lzstd"]
        )
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            return True
        except Exception:
            continue
    return False


def _load() -> None:
    global _lib, _tried
    with _lock:
        if _tried:
            return
        _tried = True
        if os.environ.get("TPU_BLOSC_NO_NATIVE"):
            return
        if _LIB_OVERRIDE:
            if not os.path.exists(_LIB_PATH):
                return
        elif not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                return
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return
        for name in ("tpb_lz4_compress",):
            fn = getattr(lib, name)
            fn.restype = _i64
            fn.argtypes = [_p, _i64, _p, _i64, ctypes.c_int]
        for name in (
            "tpb_lz4_decompress",
            "tpb_snappy_compress",
            "tpb_snappy_decompress",
            "tpb_blosclz_compress",
            "tpb_blosclz_decompress",
        ):
            fn = getattr(lib, name)
            fn.restype = _i64
            fn.argtypes = [_p, _i64, _p, _i64]
        for name in (
            "tpb_shuffle",
            "tpb_unshuffle",
            "tpb_bitshuffle",
            "tpb_bitunshuffle",
        ):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [_p, _p, _i64, ctypes.c_int]
        lib.tpb_compress_blocks.restype = _i64
        lib.tpb_compress_blocks.argtypes = [
            _p, _i64, _i64,                       # src, n, block_size
            ctypes.c_int, ctypes.c_int,           # ts, shuffle_mode
            ctypes.c_int, ctypes.c_int,           # codec, depth
            _p, _i64,                             # out, slot_stride
            _p, _p,                               # out_sizes, out_memcpy
            ctypes.c_int,                         # num_threads (0 = default)
        ]
        lib.tpb_decompress_blocks.restype = _i64
        lib.tpb_decompress_blocks.argtypes = [
            _p, _p, _p, _p,                       # payloads, offsets, psizes, is_memcpy
            _i64, _i64, _i64,                     # nb, block_size, total_n
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # ts, shuffle_mode, codec
            _p,                                   # out
            ctypes.c_int,                         # num_threads (0 = default)
        ]
        lib.tpb_compress_bound.restype = _i64
        lib.tpb_compress_bound.argtypes = [_i64, ctypes.c_int]
        lib.tpb_num_threads.restype = ctypes.c_int
        lib.tpb_num_threads.argtypes = []
        lib.tpb_gather.restype = _i64
        lib.tpb_gather.argtypes = [_p, _p, _i64, _i64, _p]
        lib.tpb_lz4_emit_runs.restype = _i64
        lib.tpb_lz4_emit_runs.argtypes = [_p, _p, _i64, _i64, _p, _i64]
        lib.tpb_lz4_emit_mixed.restype = _i64
        lib.tpb_lz4_emit_mixed.argtypes = [
            _p, _p, _i64,                         # lit_pos, lit_bytes, nlit
            _p, _i64, _i64,                       # row_d, seg, n
            _p, _i64,                             # dst, cap
        ]
        lib.tpb_mask_positions.restype = _i64
        lib.tpb_mask_positions.argtypes = [_p, _i64, _p, _i64]
        lib.tpb_set_num_threads.restype = None
        lib.tpb_set_num_threads.argtypes = [ctypes.c_int]
        # c_char_p lets the hot single-shot paths pass bytes objects with
        # zero wrapping (no numpy view, no pointer object churn)
        lib.tpb_compress_frame.restype = _i64
        lib.tpb_compress_frame.argtypes = [
            ctypes.c_char_p, _i64,                # src (bytes), n
            ctypes.c_int, ctypes.c_int,           # ts, shuffle_mode
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # header_codec, codec, depth
            _p,                                   # dst (16 + bound)
        ]
        lib.tpb_decompress_block_into.restype = _i64
        lib.tpb_decompress_block_into.argtypes = [
            ctypes.c_char_p, _i64, _i64,          # frame (bytes), payload_off, psize
            _p, _i64,                             # out, n
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # ts, shuffle_mode, codec
        ]
        _lib = lib
        _load_fastmod()


def _load_fastmod() -> None:
    """Build + import the CPython fastcall module (_tpbfast) when possible.

    The module links against libtpublosc.so (rpath $ORIGIN) and cuts the
    per-call ctypes marshalling + staging memmove from the single-block
    hot path.  Any failure (no toolchain, sanitizer override build,
    TPU_BLOSC_NO_FAST) silently leaves the ctypes path in charge.
    """
    global _fast
    if _LIB_OVERRIDE or os.environ.get("TPU_BLOSC_NO_FAST"):
        return
    import sysconfig

    src = os.path.join(_HERE, "fastmod.c")
    out = os.path.join(_HERE, "_tpbfast.so")
    if not os.path.exists(src):
        return
    if not os.path.exists(out) or os.path.getmtime(src) > os.path.getmtime(
        out
    ):
        cmd = [
            "gcc", "-O2", "-shared", "-fPIC",
            "-I", sysconfig.get_paths()["include"],
            src, "-o", out,
            "-L", _HERE, "-ltpublosc", "-Wl,-rpath,$ORIGIN",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        except Exception:
            return
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "tpu_blosc.native._tpbfast", out
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _fast = mod
    except Exception:
        _fast = None


def available() -> bool:
    if not _tried:
        _load()
    return _lib is not None


def num_threads() -> int:
    return _lib.tpb_num_threads() if available() else 1


def _ensure() -> None:
    if not available():
        raise RuntimeError("native backend unavailable")


# Uninitialized-bytes allocation via the CPython C API: native kernels
# write straight into the result object's buffer (the pattern C extensions
# use with PyBytes_FromStringAndSize(NULL, n)), eliminating the extra
# n-byte copy a numpy->tobytes round trip would cost.  The object is
# exclusively owned until returned, so the write-before-expose is safe.
_pybytes_new = ctypes.pythonapi.PyBytes_FromStringAndSize
_pybytes_new.restype = ctypes.py_object
_pybytes_new.argtypes = [ctypes.c_char_p, ctypes.c_ssize_t]
_pybytes_addr = ctypes.pythonapi.PyBytes_AsString
_pybytes_addr.restype = _p
_pybytes_addr.argtypes = [ctypes.py_object]


def alloc_bytes(n: int) -> tuple[bytes, int]:
    """Return (uninitialized bytes object of length n, writable address)."""
    b = _pybytes_new(None, n)
    return b, _pybytes_addr(b)


def set_num_threads(n: int) -> None:
    """Cap the OpenMP team (≙ Options.NumThreads, reference blosc.go:233)."""
    if available() and n > 0:
        _lib.tpb_set_num_threads(n)


def _as_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        a = data.reshape(-1).view(np.uint8)
        return a if a.flags.c_contiguous else np.ascontiguousarray(a)
    return np.frombuffer(data, dtype=np.uint8)


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(_p)


# ---------------------------------------------------------------------------
# single-buffer codec entry points
# ---------------------------------------------------------------------------


def lz4_compress(data, depth: int = 1) -> bytes:
    _ensure()
    a = _as_u8(data)
    n = a.size
    cap = n + n // 255 + 16
    out = np.empty(cap, dtype=np.uint8)
    written = _lib.tpb_lz4_compress(_ptr(a), n, _ptr(out), cap, depth)
    if written < 0:
        raise RuntimeError(f"native lz4 compress failed ({written})")
    return out[:written].tobytes()


def lz4_decompress(data, expected_size: int) -> bytes:
    _ensure()
    from ..errors import DecompressionFailedError

    a = _as_u8(data)
    out, addr = alloc_bytes(expected_size)
    written = _lib.tpb_lz4_decompress(_ptr(a), a.size, addr, expected_size)
    if written < 0:
        raise DecompressionFailedError(f"lz4: malformed stream (code {written})")
    return out if written == expected_size else out[:written]


def blosclz_compress(data) -> bytes:
    _ensure()
    a = _as_u8(data)
    n = a.size
    cap = n + n // 32 + 16
    out = np.empty(cap, dtype=np.uint8)
    written = _lib.tpb_blosclz_compress(_ptr(a), n, _ptr(out), cap)
    if written < 0:
        raise RuntimeError(f"native blosclz compress failed ({written})")
    return out[:written].tobytes()


def blosclz_decompress(data, expected_size: int) -> bytes:
    _ensure()
    from ..errors import DecompressionFailedError

    a = _as_u8(data)
    out, addr = alloc_bytes(expected_size)
    written = _lib.tpb_blosclz_decompress(_ptr(a), a.size, addr, expected_size)
    if written < 0:
        raise DecompressionFailedError(
            f"blosclz: malformed stream (code {written})"
        )
    return out if written == expected_size else out[:written]


def snappy_compress(data) -> bytes:
    _ensure()
    a = _as_u8(data)
    n = a.size
    cap = 32 + n + n // 6
    out = np.empty(cap, dtype=np.uint8)
    written = _lib.tpb_snappy_compress(_ptr(a), n, _ptr(out), cap)
    if written < 0:
        raise RuntimeError(f"native snappy compress failed ({written})")
    return out[:written].tobytes()


def snappy_decompress(data, expected_size: int) -> bytes:
    _ensure()
    from ..errors import DecompressionFailedError

    a = _as_u8(data)
    out, addr = alloc_bytes(expected_size)
    written = _lib.tpb_snappy_decompress(_ptr(a), a.size, addr, expected_size)
    if written < 0:
        raise DecompressionFailedError(
            f"snappy: malformed stream (code {written})"
        )
    return out if written == expected_size else out[:written]


def lz4_emit_runs(vals: np.ndarray, lens: np.ndarray, n: int) -> bytes:
    """Emit a standard LZ4 block stream from (value, length) run records.

    The device-RLE encoder's host half: O(runs) work, decodes everywhere.
    """
    _ensure()
    vals = np.ascontiguousarray(vals, dtype=np.uint8)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    cap = n + n // 255 + 16
    out = np.empty(cap, dtype=np.uint8)
    written = _lib.tpb_lz4_emit_runs(
        _ptr(vals), _ptr(lens), vals.size, n, _ptr(out), cap
    )
    if written < 0:
        raise RuntimeError(f"lz4_emit_runs failed ({written})")
    return out[:written].tobytes()


def lz4_emit_mixed(
    lit_pos: np.ndarray,
    lit_bytes: np.ndarray,
    row_d: np.ndarray,
    seg: int,
    n: int,
    cap: int | None = None,
) -> bytes | None:
    """Emit a standard LZ4 stream from fixed-offset match records.

    The device match-discovery encoder's host half: ``lit_pos``/``lit_bytes``
    are the block's literal positions (sorted) and values; every other byte
    of row r is a match at offset ``row_d[r]``.  O(records) work; the
    stream decodes with any LZ4 block decoder.  Returns None when the
    emitted stream would exceed ``cap`` (caller falls back to re-encoding).
    """
    _ensure()
    lit_pos = np.ascontiguousarray(lit_pos, dtype=np.int64)
    lit_bytes = np.ascontiguousarray(lit_bytes, dtype=np.uint8)
    row_d = np.ascontiguousarray(row_d, dtype=np.int32)
    if cap is None:
        cap = n + n // 255 + 16
    out = np.empty(cap, dtype=np.uint8)
    written = _lib.tpb_lz4_emit_mixed(
        _ptr(lit_pos), _ptr(lit_bytes), lit_pos.size,
        _ptr(row_d), seg, n, _ptr(out), cap,
    )
    if written == -1:
        return None
    if written < 0:
        raise RuntimeError(f"lz4_emit_mixed failed ({written})")
    return out[:written].tobytes()


def mask_positions(mask: np.ndarray, nset: int) -> np.ndarray | None:
    """Set-bit positions (sorted, int32) of a little-endian packed mask.

    ``nset`` is the expected popcount (the device pipeline already has it
    from the per-segment literal counts), so the output is allocated
    exactly and the C scan never reallocates.  Returns None when the mask
    holds MORE set bits than ``nset`` (device/host disagreement — callers
    bail to the transfer path).  ~20x the NumPy unpackbits formulation on
    multi-MiB masks (ctz word scan vs byte-expand).
    """
    _ensure()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.empty(nset, dtype=np.int32)
    k = _lib.tpb_mask_positions(_ptr(mask), mask.size, _ptr(out), nset)
    if k < 0:
        return None
    return out[:k]


# ---------------------------------------------------------------------------
# shuffle filter entry points
# ---------------------------------------------------------------------------


def _shuffle_call(name: str, data, type_size: int) -> np.ndarray:
    _ensure()
    a = _as_u8(data)
    out = np.empty(a.size, dtype=np.uint8)
    getattr(_lib, name)(_ptr(a), _ptr(out), a.size, type_size)
    return out


def shuffle(data, type_size: int) -> np.ndarray:
    return _shuffle_call("tpb_shuffle", data, type_size)


def unshuffle(data, type_size: int) -> np.ndarray:
    return _shuffle_call("tpb_unshuffle", data, type_size)


def bitshuffle(data, type_size: int) -> np.ndarray:
    return _shuffle_call("tpb_bitshuffle", data, type_size)


def bitunshuffle(data, type_size: int) -> np.ndarray:
    return _shuffle_call("tpb_bitunshuffle", data, type_size)


# ---------------------------------------------------------------------------
# whole-chunk block pipelines
# ---------------------------------------------------------------------------

# codec IDs of the native pipeline (NOT the frame codec byte; mapping is in
# chunk.py): 0 = BloscLZ, 1 = LZ4 (depth 1), 2 = LZ4HC (depth>1), 3 = Snappy
NATIVE_BLOSCLZ = 0
NATIVE_LZ4 = 1
NATIVE_LZ4HC = 2
NATIVE_SNAPPY = 3
NATIVE_ZLIB = 4
NATIVE_ZSTD = 5


def compress_blocks(
    data,
    block_size: int,
    type_size: int,
    shuffle_mode: int,
    native_codec: int,
    depth: int,
    num_threads: int = 0,
) -> tuple[list[bytes], list[bool]]:
    """Filter+compress every block of ``data`` in one parallel native call.

    Returns (payloads, is_memcpy) per block, mirroring the per-block logic
    of chunk.compress_chunked.  ``num_threads`` > 0 caps the OpenMP team
    for this call (Options.num_threads; ≙ the knob blosc.go:233 reserves).
    """
    _ensure()
    a = _as_u8(data)
    n = a.size
    nb = -(-n // block_size)
    slot = int(_lib.tpb_compress_bound(block_size, native_codec))
    out = np.empty(nb * slot, dtype=np.uint8)
    sizes = np.empty(nb, dtype=np.int64)
    memcpy_flags = np.empty(nb, dtype=np.uint8)
    rc = _lib.tpb_compress_blocks(
        _ptr(a), n, block_size,
        type_size, shuffle_mode, native_codec, depth,
        _ptr(out), slot, _ptr(sizes), _ptr(memcpy_flags),
        num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native compress_blocks failed ({rc})")
    payloads = [
        out[i * slot : i * slot + sizes[i]].tobytes() for i in range(nb)
    ]
    return payloads, [bool(f) for f in memcpy_flags]


def compress_blocks_frame(
    data,
    block_size: int,
    type_size: int,
    shuffle_mode: int,
    native_codec: int,
    depth: int,
    header_table_builder,
    num_threads: int = 0,
) -> bytes:
    """Filter+compress all blocks AND assemble the frame with one payload copy.

    ``header_table_builder(sizes, memcpy_flags) -> bytes`` produces the
    16-byte header + block table; payloads are gathered natively straight
    into the result bytes object.
    """
    _ensure()
    a = _as_u8(data)
    n = a.size
    nb = -(-n // block_size)
    slot = int(_lib.tpb_compress_bound(block_size, native_codec))
    out = np.empty(nb * slot, dtype=np.uint8)
    sizes = np.empty(nb, dtype=np.int64)
    memcpy_flags = np.empty(nb, dtype=np.uint8)
    rc = _lib.tpb_compress_blocks(
        _ptr(a), n, block_size,
        type_size, shuffle_mode, native_codec, depth,
        _ptr(out), slot, _ptr(sizes), _ptr(memcpy_flags),
        num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native compress_blocks failed ({rc})")
    prefix = header_table_builder(sizes, memcpy_flags)
    total = len(prefix) + int(sizes.sum())
    frame, addr = alloc_bytes(total)
    ctypes.memmove(addr, prefix, len(prefix))
    rc = _lib.tpb_gather(_ptr(out), _ptr(sizes), nb, slot, addr + len(prefix))
    if rc != 0:
        raise MemoryError("native frame gather failed: offsets allocation")
    return frame


def decompress_blocks(
    payloads: np.ndarray,
    offsets: np.ndarray,
    psizes: np.ndarray,
    is_memcpy: np.ndarray,
    block_size: int,
    total_n: int,
    type_size: int,
    shuffle_mode: int,
    native_codec: int,
    out_addr: int | None = None,
    num_threads: int = 0,
) -> bytes | None:
    """Decompress+unfilter every block in one parallel native call.

    Writes straight into the returned bytes object — no intermediate copy.
    With ``out_addr`` set, writes to the caller's buffer instead and
    returns the byte count (the decompress_into path).
    """
    _ensure()
    from ..errors import DecompressionFailedError

    nb = offsets.size
    if out_addr is None:
        out, addr = alloc_bytes(total_n)
    else:
        out, addr = None, out_addr
    got = _lib.tpb_decompress_blocks(
        _ptr(payloads), _ptr(offsets), _ptr(psizes), _ptr(is_memcpy),
        nb, block_size, total_n,
        type_size, shuffle_mode, native_codec,
        addr,
        num_threads,
    )
    if got != total_n:
        raise DecompressionFailedError(
            f"native decompress_blocks failed (code {got})"
        )
    return out if out_addr is None else total_n


_frame_scratch = threading.local()


def _staging_addr(nbytes: int) -> int:
    """Address of a per-thread staging buffer (grows, never moves mid-call)."""
    t = _frame_scratch
    if getattr(t, "cap", 0) < nbytes:
        buf = np.empty(max(nbytes, 1 << 17), dtype=np.uint8)
        t.buf = buf
        t.cap = buf.size
        t.addr = buf.ctypes.data
    return t.addr


# conservative superset of codec_bound() for every native codec (lz4 n/255,
# snappy n/6, zlib n/4096, zstd n/128 — all + small constants); lets the
# hot path skip a ctypes call to tpb_compress_bound
def _universal_bound(n: int) -> int:
    return 16 + n + (n >> 2) + 1024


def compress_frame(
    data: bytes,
    type_size: int,
    shuffle_mode: int,
    header_codec: int,
    native_codec: int,
    depth: int,
) -> bytes:
    """One C call producing a complete single-block frame (header included).

    The single-shot analogue of compressBackend (blosc.go:319-374): filter,
    codec, memcpy fallback, and header assembly all happen inside
    tpb_compress_frame — one ctypes crossing instead of four, which is what
    the reference's own 100 KB benchmark point is sensitive to.  ``data``
    must be a bytes object (passed zero-copy via c_char_p).
    """
    if _fast is not None:
        return _fast.compress_frame(
            data, type_size, shuffle_mode, header_codec, native_codec, depth
        )
    if not isinstance(data, bytes):  # ctypes c_char_p needs a bytes object
        data = bytes(data)
    n = len(data)
    dst = _staging_addr(_universal_bound(n))
    total = _lib.tpb_compress_frame(
        data, n, type_size, shuffle_mode, header_codec, native_codec,
        depth, dst,
    )
    if total < 0:
        raise RuntimeError(f"native compress_frame failed ({total})")
    out, addr = alloc_bytes(total)
    ctypes.memmove(addr, dst, total)
    return out


def compress_frames(
    items,
    type_size: int,
    shuffle_mode: int,
    header_codec: int,
    native_codec: int,
    depth: int,
) -> list:
    """Batch compress_frame: one binding crossing for N frames.

    With the fastcall module present, the native side runs whole small
    frames (< the segment-parallel floor) across the SpinPool and larger
    frames through their normal internally-parallel path, so output bytes
    are identical to per-item compress_frame at every size.  Without it,
    a scalar loop provides the same results.
    """
    if _fast is not None and hasattr(_fast, "compress_batch"):
        return _fast.compress_batch(
            items, type_size, shuffle_mode, header_codec, native_codec, depth
        )
    return [
        compress_frame(d if isinstance(d, bytes) else bytes(d), type_size,
                       shuffle_mode, header_codec, native_codec, depth)
        for d in items
    ]


def decompress_frames(items, type_size: int, native_map: bytes) -> list:
    """Batch single-block frame decode; None entries mean "not handled".

    native_map[codec_id] is the native codec id for header byte 1, 0xFF
    when that id must take the Python path (unknown / user-overridden /
    native unavailable).  Items that are not plain single-block frames,
    or whose payload fails to decode, come back as None — the caller
    re-runs those through the scalar path, which owns every typed error.
    """
    if _fast is not None and hasattr(_fast, "decompress_batch"):
        return _fast.decompress_batch(items, type_size, native_map)
    return [None] * len(items)


def decompress_frames_into(items, outs, native_map: bytes) -> list:
    """Batch decode into caller buffers; entries are byte counts or None.

    The zero-copy sibling of decompress_frames: eligible frames decode
    straight into ``outs[i]`` (writable, >= the frame's NBytesOrig).
    None entries punt to the scalar path exactly like decompress_frames.
    """
    if _fast is not None and hasattr(_fast, "decompress_batch_into"):
        return _fast.decompress_batch_into(items, outs, 0, native_map)
    return [None] * len(items)


def decompress_frame(
    data: bytes,
    payload_off: int,
    payload_size: int,
    nbytes_orig: int,
    type_size: int,
    shuffle_mode: int,
    native_codec: int,
) -> bytes:
    """One C call decoding + unfiltering a single-block frame body.

    Writes straight into the returned bytes object.  Raises
    DecompressionFailedError on malformed payloads and SizeMismatchError
    when the payload decodes cleanly to the wrong size (parity with the
    final check at blosc.go:429-431).
    """
    if _fast is not None:
        res = _fast.decompress_frame(
            data, payload_off, payload_size, nbytes_orig,
            type_size, shuffle_mode, native_codec,
        )
        if isinstance(res, bytes):
            return res
        got = res
    else:
        out, addr = alloc_bytes(nbytes_orig)
        got = _lib.tpb_decompress_block_into(
            data, payload_off, payload_size,
            addr, nbytes_orig,
            type_size, shuffle_mode, native_codec,
        )
        if got == nbytes_orig:
            return out
    from ..errors import DecompressionFailedError, SizeMismatchError

    if got < 0:
        raise DecompressionFailedError(
            f"blosc: decompression failed: malformed payload (code {got})"
        )
    raise SizeMismatchError(
        f"blosc: decompressed size mismatch: got {got}, "
        f"expected {nbytes_orig}"
    )
