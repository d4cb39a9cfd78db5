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
