"""decompress_range — random access into compressed frames.

FLAG_SPLIT frames decode only the covering blocks; TPB2 containers skip
whole sub-frames; single-block frames decode fully then slice.  Every
result must equal the corresponding slice of a full decompress.
"""

import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import tpu_blosc as blosc
from tpu_blosc import chunk, container
from tpu_blosc.errors import BloscError
from tpu_blosc.options import Options

FAST = settings(
    max_examples=int(os.environ.get("TPU_BLOSC_SOAK", 0)) or 120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _mixed(n: int) -> bytes:
    """Ramp + noise stripes: produces both compressed AND memcpy blocks."""
    rng = np.random.default_rng(21)
    ramp = (np.arange(n) % 251).astype(np.uint8)
    noise = rng.integers(0, 256, n, dtype=np.uint8)
    stripe = (np.arange(n) // 8192) % 2 == 0
    return np.where(stripe, ramp, noise).astype(np.uint8).tobytes()


DATA = _mixed(300_000)
FRAME_SPLIT = blosc.compress_with_options(
    DATA, Options(block_size=8192, type_size=1, shuffle=blosc.NOSHUFFLE)
)
FRAME_SPLIT_SHUF = blosc.compress_with_options(
    np.arange(75_000, dtype=np.float32).tobytes(),
    Options(block_size=8192, type_size=4),
)
DATA_SHUF = np.arange(75_000, dtype=np.float32).tobytes()
FRAME_SPLIT_BIT = blosc.compress_with_options(
    DATA_SHUF, Options(block_size=8192, type_size=4, shuffle=blosc.BITSHUFFLE)
)
FRAME_ONE = blosc.compress(DATA[:60_000])
CONT = container.compress_container(DATA, Options(type_size=1), frame_limit=65536)


def test_split_frame_has_memcpy_blocks():
    entries, _ = chunk.parse_block_table(
        FRAME_SPLIT, blosc.get_info(FRAME_SPLIT)
    )
    kinds = {m for _, m in entries}
    assert kinds == {True, False}, "fixture must mix memcpy + codec blocks"


@pytest.mark.parametrize("start,size", [
    (0, 0), (0, 1), (0, 300_000), (8191, 2), (8192, 8192),
    (299_999, 1), (123_456, 78_901), (16384, 0),
])
def test_range_split_frame(start, size):
    assert blosc.decompress_range(FRAME_SPLIT, start, size) == \
        DATA[start : start + size]


@FAST
@given(st.data())
def test_range_property_all_layouts(data):
    for frame, ref in (
        (FRAME_SPLIT, DATA),
        (FRAME_SPLIT_SHUF, DATA_SHUF),
        (FRAME_SPLIT_BIT, DATA_SHUF),
        (FRAME_ONE, DATA[:60_000]),
        (CONT, DATA),
    ):
        n = len(ref)
        start = data.draw(st.integers(0, n))
        size = data.draw(st.integers(0, n - start))
        assert blosc.decompress_range(frame, start, size) == \
            ref[start : start + size]


def test_range_container_skips_frames():
    s, z = 200_000, 30_000
    assert blosc.decompress_range(CONT, s, z) == DATA[s : s + z]


def test_range_bounds_errors():
    for frame, n in ((FRAME_SPLIT, len(DATA)), (FRAME_ONE, 60_000),
                     (CONT, len(DATA))):
        with pytest.raises(BloscError):
            blosc.decompress_range(frame, n, 1)
        with pytest.raises(BloscError):
            blosc.decompress_range(frame, 0, n + 1)
        with pytest.raises(BloscError):
            blosc.decompress_range(frame, -1, 1)
        assert blosc.decompress_range(frame, n, 0) == b""


def test_range_type_size_override():
    data = np.arange(50_000, dtype=np.float32).tobytes()
    frame = blosc.compress_with_options(
        data, Options(block_size=8192, type_size=4)
    )
    assert blosc.decompress_range(frame, 100, 200, type_size=4) == \
        data[100:300]


def test_range_python_path_matches(monkeypatch):
    """Force the registry path: per-block python decode must agree."""
    monkeypatch.setattr(chunk, "_native_pipeline_codec", lambda c, l: None)
    s, z = 12_345, 23_456
    assert blosc.decompress_range(FRAME_SPLIT, s, z) == DATA[s : s + z]
    assert blosc.decompress_range(FRAME_SPLIT_SHUF, s, z) == \
        DATA_SHUF[s : s + z]


def test_range_corrupt_block_raises():
    frame = bytearray(FRAME_SPLIT)
    entries, offset = chunk.parse_block_table(
        FRAME_SPLIT, blosc.get_info(FRAME_SPLIT)
    )
    # find the first NON-memcpy block and truncate its payload size
    poff = offset
    for psize, memcpy in entries:
        if not memcpy:
            frame[poff + psize // 2] ^= 0x5A
            break
        poff += psize
    bi_start = (poff - offset >= 0)
    assert bi_start
    # the range covering that block either raises or returns wrong-free data
    try:
        out = blosc.decompress_range(bytes(frame), 0, 16384)
    except BloscError:
        return
    assert len(out) == 16384


def test_range_container_forged_total_rejected():
    """decompress_range must apply the same total-vs-headers cross-check
    as decompress_container (shared frame_spans walk)."""
    import struct

    blob = bytearray(CONT)
    blob[8:16] = struct.pack("<Q", len(DATA) + 4096)
    with pytest.raises(BloscError):
        blosc.decompress_range(bytes(blob), len(DATA), 4096)
    with pytest.raises(BloscError):
        blosc.decompress_range(bytes(blob), 0, 10)


@pytest.mark.parametrize("start,size", [
    (0, 0), (0, 300_000), (8192, 81920), (8191, 2), (100, 150_000),
    (12_345, 98_765), (299_000, 1000), (8192, 8192), (0, 8191),
])
def test_range_into(start, size):
    out = bytearray(size + 7)  # slack: must write exactly size bytes
    out[size:] = b"\xAA" * 7
    got = blosc.decompress_range_into(FRAME_SPLIT, start, size, out)
    assert got == size
    assert bytes(out[:size]) == DATA[start : start + size]
    assert bytes(out[size:]) == b"\xAA" * 7  # no overwrite past size


@FAST
@given(st.data())
def test_range_into_property(data):
    for frame, ref in (
        (FRAME_SPLIT, DATA),
        (FRAME_SPLIT_SHUF, DATA_SHUF),
        (FRAME_ONE, DATA[:60_000]),
        (CONT, DATA),
    ):
        n = len(ref)
        start = data.draw(st.integers(0, n))
        size = data.draw(st.integers(0, n - start))
        out = bytearray(size)
        assert blosc.decompress_range_into(frame, start, size, out) == size
        assert bytes(out) == ref[start : start + size]


def test_range_into_errors():
    with pytest.raises(BloscError):
        blosc.decompress_range_into(FRAME_SPLIT, 0, 100, bytearray(50))
    with pytest.raises(BloscError):
        blosc.decompress_range_into(FRAME_SPLIT, len(DATA), 1,
                                    bytearray(16))
    with pytest.raises(BloscError):
        blosc.decompress_range_into(FRAME_SPLIT, -2, 1, bytearray(16))
