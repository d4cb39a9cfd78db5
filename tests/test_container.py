"""Super-frame container tests (64-bit framing past the uint32 cap).

The container logic is exercised with a tiny frame_limit; a true >4 GiB
roundtrip is gated behind TPU_BLOSC_BIG_TESTS=1 (it needs ~12 GB RAM and
runs in the perf environment, not the unit suite).
"""

import os

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc import container
from tpu_blosc.errors import BloscError, InvalidDataError, InvalidHeaderError
from tpu_blosc.options import Options


def test_container_roundtrip_small_frames():
    data = np.arange(100_000, dtype=np.float32).tobytes()
    opts = Options(block_size=16384)
    comp = container.compress_container(data, opts, frame_limit=65536)
    assert container.is_container(comp)
    assert blosc.decompress(comp) == data  # api auto-detects the magic
    assert container.decompress_container(comp) == data


def test_container_info():
    data = np.arange(50_000, dtype=np.float32).tobytes()
    comp = container.compress_container(
        data, Options(codec=blosc.ZSTD, type_size=4), frame_limit=65536
    )
    info = blosc.get_info(comp)
    assert info.is_container
    assert info.codec == int(blosc.ZSTD)
    assert info.nbytes_orig == len(data)
    assert info.num_frames == -(-len(data) // 65536)
    assert blosc.get_decompressed_size(comp) == len(data)


def test_container_frame_alignment_respects_type_size():
    # frame slices must align to 8*type_size so shuffle groups don't straddle
    data = np.arange(3000, dtype=np.float64).tobytes()
    comp = container.compress_container(
        data, Options(type_size=8, shuffle=blosc.BITSHUFFLE), frame_limit=1000
    )
    # 1000 aligned down to a multiple of 64 = 960
    _, _, _, _, total, sizes, _ = container.parse_container(comp)
    assert total == len(data)
    assert len(sizes) == -(-len(data) // 960)
    assert blosc.decompress(comp) == data


def test_container_magic_never_collides_with_frames():
    frame = blosc.compress(b"hello world" * 10, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert not container.is_container(frame)
    with pytest.raises(BloscError):
        container.parse_container(frame)


def test_container_malformed():
    data = np.arange(10_000, dtype=np.float32).tobytes()
    comp = container.compress_container(data, Options(), frame_limit=8192)
    with pytest.raises(InvalidHeaderError):
        container.parse_container(b"TPB2\x07" + comp[5:])  # bad version
    with pytest.raises((InvalidDataError, BloscError)):
        blosc.decompress(comp[: len(comp) // 2])  # truncated frames
    with pytest.raises(BloscError):
        container.decompress_container(comp[:16])


def test_container_type_size_override_roundtrip():
    data = np.arange(20_000, dtype=np.float32).tobytes()
    comp = container.compress_container(
        data, Options(type_size=4), frame_limit=16384
    )
    assert blosc.decompress_with_size(comp, 4) == data


@pytest.mark.skipif(
    not os.environ.get("TPU_BLOSC_BIG_TESTS"),
    reason="set TPU_BLOSC_BIG_TESTS=1 for the >4GiB container roundtrip",
)
def test_container_over_4gib():
    n = (1 << 32) + (1 << 20)  # 4 GiB + 1 MiB
    data = np.arange(n // 4, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(data, Options())
    assert container.is_container(comp)
    assert blosc.get_decompressed_size(comp) == n
    out = blosc.decompress(comp)
    assert out == data


def test_container_forged_total_rejected_before_allocation():
    """A forged uint64 total must fail cleanly against the sub-frame
    headers, not drive the output allocation."""
    import struct

    import tpu_blosc as blosc
    from tpu_blosc import container
    from tpu_blosc.errors import BloscError
    from tpu_blosc.options import Options

    data = bytes(range(256)) * 64
    blob = bytearray(
        container.compress_container(data, Options(), frame_limit=4096)
    )
    # total lives at bytes 8-15 of the container header
    blob[8:16] = struct.pack("<Q", 1 << 50)
    with pytest.raises(BloscError):
        container.decompress_container(bytes(blob))
    blob[8:16] = struct.pack("<Q", len(data))
    assert container.decompress_container(bytes(blob)) == data
