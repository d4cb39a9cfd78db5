"""decompress_into: zero-copy output into caller buffers."""

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc import container
from tpu_blosc.errors import InvalidDataError


@pytest.mark.parametrize("codec", [blosc.LZ4, blosc.ZSTD, blosc.SNAPPY])
@pytest.mark.parametrize("block_size", [0, 16384])
def test_decompress_into_roundtrip(codec, block_size):
    data = np.arange(50_000, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(
        data, blosc.Options(codec=codec, block_size=block_size)
    )
    out = bytearray(len(data))
    n = blosc.decompress_into(comp, out)
    assert n == len(data)
    assert bytes(out) == data


def test_decompress_into_ndarray():
    data = np.arange(10_000, dtype=np.float64)
    comp = blosc.compress_with_options(
        data.tobytes(), blosc.Options(type_size=8, block_size=8192)
    )
    out = np.empty(10_000, dtype=np.float64)
    n = blosc.decompress_into(comp, out)
    assert n == data.nbytes
    assert np.array_equal(out, data)


def test_decompress_into_container():
    data = np.arange(100_000, dtype=np.float32).tobytes()
    comp = container.compress_container(
        data, blosc.Options(block_size=16384), frame_limit=65536
    )
    out = bytearray(len(data))
    assert blosc.decompress_into(comp, out) == len(data)
    assert bytes(out) == data


def test_decompress_into_too_small():
    comp = blosc.compress(b"x" * 1000, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    with pytest.raises(InvalidDataError):
        blosc.decompress_into(comp, bytearray(10))


def test_decompress_into_readonly_rejected():
    data = np.arange(100, dtype=np.float32)
    comp = blosc.compress(data.tobytes(), blosc.LZ4, 5, blosc.SHUFFLE, 4)
    frozen = np.arange(100, dtype=np.float32)
    frozen.setflags(write=False)
    with pytest.raises(TypeError):
        blosc.decompress_into(comp, frozen)


def test_decompress_into_oversized_buffer_ok():
    data = b"payload bytes " * 100
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    out = bytearray(len(data) + 128)
    n = blosc.decompress_into(comp, out)
    assert out[:n] == data


def _truncate_block_table(frame: bytes) -> bytes:
    """Forge a split frame whose table lists one block fewer than required."""
    import struct

    from tpu_blosc.format import HEADER_SIZE

    (nb,) = struct.unpack_from("<I", frame, HEADER_SIZE)
    entries = list(struct.unpack_from(f"<{nb}I", frame, HEADER_SIZE + 4))
    last = entries[-1] & 0x7FFFFFFF
    body = frame[HEADER_SIZE + 4 + 4 * nb : len(frame) - last]
    table = struct.pack("<I", nb - 1) + struct.pack(f"<{nb - 1}I", *entries[:-1])
    head = bytearray(frame[:HEADER_SIZE])
    new_total = HEADER_SIZE + len(table) + len(body)
    struct.pack_into("<I", head, 12, new_total)
    return bytes(head) + table + body


def test_decompress_into_rejects_truncated_block_table():
    """ADVICE round-1 medium: a block table with fewer entries than
    ceil(nbytes_orig/block_size) must raise, not report success with the
    output tail uninitialized."""
    data = np.arange(60_000, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(data, blosc.Options(block_size=65536))
    bad = _truncate_block_table(comp)
    with pytest.raises(InvalidDataError):
        blosc.decompress(bad)
    out = bytearray(len(data))
    with pytest.raises(InvalidDataError):
        blosc.decompress_into(bad, out)


# ---------------------------------------------------------------------------
# entry-point agreement fuzz (round 3): every public decoder must accept
# and reject exactly the same frames, with identical bytes on accept —
# the fuzz that caught decompress_into's skipped frame-size validation
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tpu_blosc.options import Options


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    flip_pos=st.integers(min_value=0, max_value=4095),
    flip_val=st.integers(min_value=0, max_value=255),
    trunc=st.integers(min_value=0, max_value=300),
    split=st.booleans(),
)
def test_decode_entrypoints_agree_on_corrupt_frames(
    flip_pos, flip_val, trunc, split
):
    data = (np.arange(20_000, dtype=np.int32) % 509).tobytes()
    opts = Options(type_size=4, block_size=16384 if split else 0)
    frame = bytearray(blosc.compress_with_options(data, opts))
    if trunc:
        frame = frame[: max(0, len(frame) - trunc)]
    if frame and flip_pos < len(frame):
        frame[flip_pos] ^= flip_val
    frame = bytes(frame)

    def run(fn):
        try:
            return fn()
        except blosc.BloscError:
            return None

    r_plain = run(lambda: blosc.decompress(frame))
    # 0 = take type_size from the header (the second arg is the
    # reference's typeSize override, not an expected byte count)
    r_sized = run(lambda: blosc.decompress_with_size(frame, 0))

    def into():
        try:
            n = blosc.get_decompressed_size(frame)
        except blosc.BloscError:
            return None  # same rejection class
        buf = bytearray(max(n, 1))
        try:
            w = blosc.decompress_into(frame, buf)
        except blosc.BloscError:
            return None
        return bytes(buf[:w])

    r_into = into()
    assert (r_plain is None) == (r_into is None)
    assert (r_plain is None) == (r_sized is None)
    if r_plain is not None:
        assert r_plain == r_into
        assert r_sized == r_plain
