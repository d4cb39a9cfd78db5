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
