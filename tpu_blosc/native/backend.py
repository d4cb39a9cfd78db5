"""ctypes binding to the C++ host backend (libtpublosc.so).

Build contract: the shared library is compiled on demand from
``tpublosc.cpp`` next to this file (g++ -O3 -march=native -shared -fPIC)
and cached; if the toolchain or source is missing, ``available()`` returns
False and callers fall back to the pure-Python/NumPy paths — the same
boolean-degradation contract as the reference's SIMD dispatch
(shuffle.go:31-57).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tpublosc.cpp")
_LIB_PATH = os.path.join(_HERE, "libtpublosc.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> None:
    global _lib, _tried
    with _lock:
        if _tried:
            return
        _tried = True
        if os.environ.get("TPU_BLOSC_NO_NATIVE"):
            return
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                return
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return
        # int64 tpb_lz4_compress(const uint8_t*, int64 n, uint8_t* out,
        #                        int64 out_cap, int depth)
        lib.tpb_lz4_compress.restype = ctypes.c_int64
        lib.tpb_lz4_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.tpb_lz4_decompress.restype = ctypes.c_int64
        lib.tpb_lz4_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.tpb_snappy_compress.restype = ctypes.c_int64
        lib.tpb_snappy_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.tpb_snappy_decompress.restype = ctypes.c_int64
        lib.tpb_snappy_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        for name in (
            "tpb_shuffle",
            "tpb_unshuffle",
            "tpb_bitshuffle",
            "tpb_bitunshuffle",
        ):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int,
            ]
        _lib = lib


def available() -> bool:
    if not _tried:
        _load()
    return _lib is not None


def lz4_compress(data: bytes, depth: int = 1) -> bytes:
    n = len(data)
    cap = n + n // 255 + 64
    out = ctypes.create_string_buffer(cap)
    written = _lib.tpb_lz4_compress(data, n, out, cap, depth)
    if written < 0:
        raise RuntimeError(f"native lz4 compress failed ({written})")
    return out.raw[:written]


def lz4_decompress(data: bytes, expected_size: int) -> bytes:
    from ..errors import DecompressionFailedError

    out = ctypes.create_string_buffer(max(expected_size, 1))
    written = _lib.tpb_lz4_decompress(data, len(data), out, expected_size)
    if written < 0:
        raise DecompressionFailedError(f"lz4: malformed stream (code {written})")
    return out.raw[:written]


def snappy_compress(data: bytes) -> bytes:
    n = len(data)
    cap = 32 + n + n // 6
    out = ctypes.create_string_buffer(cap)
    written = _lib.tpb_snappy_compress(data, n, out, cap)
    if written < 0:
        raise RuntimeError(f"native snappy compress failed ({written})")
    return out.raw[:written]


def snappy_decompress(data: bytes, expected_size: int) -> bytes:
    from ..errors import DecompressionFailedError

    out = ctypes.create_string_buffer(max(expected_size, 1))
    written = _lib.tpb_snappy_decompress(data, len(data), out, expected_size)
    if written < 0:
        raise DecompressionFailedError(f"snappy: malformed stream (code {written})")
    return out.raw[:written]


def _shuffle_call(name: str, data: bytes, type_size: int) -> bytes:
    out = ctypes.create_string_buffer(len(data))
    getattr(_lib, name)(data, out, len(data), type_size)
    return out.raw


def shuffle(data: bytes, type_size: int) -> bytes:
    return _shuffle_call("tpb_shuffle", data, type_size)


def unshuffle(data: bytes, type_size: int) -> bytes:
    return _shuffle_call("tpb_unshuffle", data, type_size)


def bitshuffle(data: bytes, type_size: int) -> bytes:
    return _shuffle_call("tpb_bitshuffle", data, type_size)


def bitunshuffle(data: bytes, type_size: int) -> bytes:
    return _shuffle_call("tpb_bitunshuffle", data, type_size)
