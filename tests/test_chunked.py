"""Multi-block chunked frame tests (this library's FLAG_SPLIT extension)."""

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc import chunk

rng = np.random.default_rng(99)


def test_chunked_roundtrip_exact_multiple():
    data = np.arange(65536, dtype=np.float32).tobytes()  # 256 KB
    comp = blosc.compress_with_options(
        data, blosc.Options(block_size=32768)
    )
    h = blosc.get_info(comp)
    assert h.is_split
    assert h.block_size == 32768
    assert blosc.decompress(comp) == data


def test_chunked_roundtrip_ragged_tail():
    data = rng.integers(0, 16, 100001, dtype=np.uint8).tobytes()
    comp = blosc.compress_with_options(
        data, blosc.Options(block_size=8192, type_size=2)
    )
    assert blosc.decompress(comp) == data


@pytest.mark.parametrize("codec", [blosc.LZ4, blosc.ZSTD, blosc.SNAPPY])
@pytest.mark.parametrize("shuffle", [blosc.NOSHUFFLE, blosc.SHUFFLE, blosc.BITSHUFFLE])
def test_chunked_codec_x_shuffle(codec, shuffle):
    data = np.sin(np.arange(40000) * 0.001).astype(np.float64).tobytes()
    comp = blosc.compress_with_options(
        data,
        blosc.Options(codec=codec, shuffle=shuffle, type_size=8, block_size=65536),
    )
    assert blosc.decompress(comp) == data


def test_chunked_memcpy_blocks():
    # incompressible data → every block memcpy; frame ≈ input + table
    data = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
    comp = blosc.compress_with_options(
        data, blosc.Options(block_size=8192, shuffle=blosc.NOSHUFFLE)
    )
    assert blosc.decompress(comp) == data
    h = blosc.get_info(comp)
    entries, _ = chunk.parse_block_table(comp, h)
    assert all(m for _, m in entries)


def test_chunked_mixed_memcpy_and_compressed():
    data = (b"\x00" * 20000) + rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
    comp = blosc.compress_with_options(
        data, blosc.Options(block_size=16384, shuffle=blosc.NOSHUFFLE)
    )
    h = blosc.get_info(comp)
    entries, _ = chunk.parse_block_table(comp, h)
    kinds = {m for _, m in entries}
    assert kinds == {True, False}
    assert blosc.decompress(comp) == data


def test_auto_block_threshold_switches_format():
    small = np.zeros(1024, dtype=np.float32).tobytes()
    comp = blosc.compress(small, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert not blosc.get_info(comp).is_split
    big = np.zeros(blosc.AUTO_BLOCK_THRESHOLD + 1024, dtype=np.uint8).tobytes()
    comp = blosc.compress(big, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert blosc.get_info(comp).is_split
    assert blosc.decompress(comp) == big


def test_block_size_alignment():
    # requested sizes are aligned down to a multiple of 8*type_size
    assert chunk.choose_block_size(10**6, 4, 10000) == 9984  # 10000 -> 312*32
    assert chunk.choose_block_size(10**6, 4, 0) % 32 == 0
    assert chunk.choose_block_size(100, 8, 1) == 64  # floor at one group


def test_chunked_corrupted_table_rejected():
    data = np.arange(8192, dtype=np.float32).tobytes()
    comp = bytearray(
        blosc.compress_with_options(data, blosc.Options(block_size=8192))
    )
    comp[16:20] = (0).to_bytes(4, "little")  # zero blocks
    with pytest.raises(blosc.InvalidDataError):
        blosc.decompress(bytes(comp))
    comp[16:20] = (10**6).to_bytes(4, "little")  # absurd block count
    with pytest.raises(blosc.InvalidDataError):
        blosc.decompress(bytes(comp))


def test_chunked_truncated_payload_rejected():
    data = np.arange(8192, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(data, blosc.Options(block_size=8192))
    with pytest.raises((blosc.InvalidDataError, blosc.DecompressionFailedError)):
        blosc.decompress(comp[: len(comp) // 2])


def test_chunked_header_fields():
    data = np.arange(100000, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(
        data, blosc.Options(codec=blosc.ZSTD, block_size=65536, type_size=4)
    )
    h = blosc.get_info(comp)
    assert h.nbytes_orig == len(data)
    assert h.nbytes_comp == len(comp)
    assert h.codec == int(blosc.Codec.ZSTD)


def test_chunked_type_size_override_decode():
    """DecompressWithSize's type-size override applies to split frames too
    (reference semantics blosc.go:417-426 extended to our multi-block)."""
    data = np.arange(50_000, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(
        data, blosc.Options(block_size=16384, type_size=4)
    )
    # override with the true type size decodes identically
    assert blosc.decompress_with_size(comp, 4) == data
    # a wrong override still returns length-preserving output
    out = blosc.decompress_with_size(comp, 2)
    assert len(out) == len(data) and out != data


def test_chunked_memcpy_ragged_tail_roundtrip():
    rng = np.random.default_rng(17)
    n = 2 * 8192 + 1234  # ragged, incompressible
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    comp = blosc.compress_with_options(data, blosc.Options(block_size=8192))
    assert blosc.decompress(comp) == data


def test_num_threads_option_identical_frames():
    """Options.num_threads caps the native OpenMP team (VERDICT r1 item 6);
    a 1-thread run must produce a byte-identical frame to the default."""
    data = np.arange(1_500_000, dtype=np.float32).tobytes()
    base = blosc.compress_with_options(data, blosc.Options(block_size=65536))
    one = blosc.compress_with_options(
        data, blosc.Options(block_size=65536, num_threads=1)
    )
    two = blosc.compress_with_options(
        data, blosc.Options(block_size=65536, num_threads=2)
    )
    assert one == base
    assert two == base
    assert blosc.decompress(one) == data


def test_epoch_taint_after_large_block():
    """Blocks past the 24-bit position cap run the memset table mode and
    taint the scratch; tagged compressions afterwards must still produce
    byte-identical frames (the epoch wrap clears the raw-position
    entries)."""
    big = (np.arange(34_000_000) % 250).astype(np.uint8).tobytes()
    small = np.arange(200_000, dtype=np.float32).tobytes()
    opts_small = blosc.Options(block_size=65536)
    expected_small = blosc.compress_with_options(small, opts_small)
    # 17 MiB blocks exceed the tagged-position cap -> untagged mode
    f_big = blosc.compress_with_options(
        big, blosc.Options(type_size=1, block_size=17 * 1024 * 1024)
    )
    assert blosc.decompress(f_big) == big
    # same-thread scratch now tainted; tagged path must clear + match
    for _ in range(3):
        assert blosc.compress_with_options(small, opts_small) == expected_small
