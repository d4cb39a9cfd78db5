"""The CPython fastcall module (_tpbfast) must be bit-identical to the
ctypes path and map errors through the same typed exceptions.

The fast module is a front door to the very same tpb_compress_frame /
tpb_decompress_block_into entry points (fastmod.c), so equality here is
about the binding layer: buffer handling, staging, allocation, and the
cold error paths.
"""

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc.errors import DecompressionFailedError, SizeMismatchError
from tpu_blosc.native import backend

pytestmark = pytest.mark.skipif(
    not backend.available() or backend._fast is None,
    reason="native fast module unavailable",
)


@pytest.fixture
def no_fast(monkeypatch):
    """Force the ctypes path for a comparison run."""
    monkeypatch.setattr(backend, "_fast", None)


def _ramp(n: int) -> bytes:
    return bytes(bytearray(i % 256 for i in range(n)))


@pytest.mark.parametrize("shuffle_mode", [0, 1, 2])
def test_compress_frame_matches_ctypes(monkeypatch, shuffle_mode):
    data = _ramp(100 * 1024)
    fast = backend.compress_frame(data, 4, shuffle_mode, 1, 1, 1)
    monkeypatch.setattr(backend, "_fast", None)
    slow = backend.compress_frame(data, 4, shuffle_mode, 1, 1, 1)
    assert fast == slow


def test_decompress_frame_matches_ctypes(monkeypatch):
    data = np.arange(25000, dtype=np.float32).tobytes()
    frame = backend.compress_frame(data, 4, 1, 1, 1, 1)
    fast = backend.decompress_frame(frame, 16, len(frame) - 16, len(data), 4, 1, 1)
    monkeypatch.setattr(backend, "_fast", None)
    slow = backend.decompress_frame(frame, 16, len(frame) - 16, len(data), 4, 1, 1)
    assert fast == slow == data


def test_memoryview_and_bytearray_inputs():
    data = _ramp(4096)
    want = backend.compress_frame(data, 4, 1, 1, 1, 1)
    assert backend.compress_frame(bytearray(data), 4, 1, 1, 1, 1) == want
    # memoryview exercises the PyObject_GetBuffer path end to end
    assert backend.compress_frame(memoryview(data), 4, 1, 1, 1, 1) == want


def test_malformed_payload_raises_decompression_failed():
    data = _ramp(4096)
    frame = bytearray(backend.compress_frame(data, 4, 1, 1, 1, 1))
    with pytest.raises(DecompressionFailedError):
        # truncate the payload: the LZ4 stream ends mid-sequence
        backend.decompress_frame(
            bytes(frame), 16, max(1, (len(frame) - 16) // 2), 4096, 4, 1, 1
        )


def test_wrong_size_raises_size_mismatch():
    data = _ramp(4096)
    frame = backend.compress_frame(data, 4, 0, 1, 1, 1)
    with pytest.raises((SizeMismatchError, DecompressionFailedError)):
        backend.decompress_frame(frame, 16, len(frame) - 16, 5000, 4, 0, 1)


def test_payload_range_validated():
    with pytest.raises(ValueError):
        backend._fast.decompress_frame(b"\x00" * 8, 4, 100, 16, 4, 0, 1)


def test_api_roundtrip_through_fast_path():
    data = np.arange(262144, dtype=np.float32).tobytes()
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert blosc.decompress(comp) == data
