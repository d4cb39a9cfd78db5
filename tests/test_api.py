"""Public-API round-trip and error-path tests (≙ reference blosc_test.go)."""

import numpy as np
import pytest

import tpu_blosc as blosc

rng = np.random.default_rng(42)

ALL_CODECS = [blosc.LZ4, blosc.LZ4HC, blosc.SNAPPY, blosc.ZLIB, blosc.ZSTD]
ALL_SHUFFLES = [blosc.NOSHUFFLE, blosc.SHUFFLE, blosc.BITSHUFFLE]


def ramp(n: int) -> bytes:
    """100 KB-style i%256 ramp (reference benchmark data, blosc_test.go:363)."""
    return bytes(i % 256 for i in range(n))


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_roundtrip_per_codec(codec):
    data = ramp(10000)
    comp = blosc.compress(data, codec, 5, blosc.SHUFFLE, 4)
    assert blosc.decompress(comp) == data


@pytest.mark.parametrize("codec", ALL_CODECS)
@pytest.mark.parametrize("shuffle", ALL_SHUFFLES)
def test_roundtrip_codec_x_shuffle(codec, shuffle):
    data = np.sin(np.arange(4096) * 0.01).astype(np.float32).tobytes()
    comp = blosc.compress(data, codec, 5, shuffle, 4)
    assert blosc.decompress(comp) == data


@pytest.mark.parametrize("level", range(1, 10))
def test_all_levels(level):
    # ≙ blosc_test.go:268-288
    data = ramp(8192)
    for codec in ALL_CODECS:
        comp = blosc.compress(data, codec, level, blosc.SHUFFLE, 4)
        assert blosc.decompress(comp) == data


@pytest.mark.parametrize("ts", [1, 2, 4, 8, 16])
@pytest.mark.parametrize("shuffle", ALL_SHUFFLES)
def test_typesize_x_shuffle_matrix(ts, shuffle):
    # ≙ blosc_test.go:290-312
    data = rng.integers(0, 256, 4099, dtype=np.uint8).tobytes()
    comp = blosc.compress(data, blosc.LZ4, 5, shuffle, ts)
    assert blosc.decompress(comp) == data


def test_header_fields_after_compress():
    data = ramp(5000)
    comp = blosc.compress(data, blosc.ZSTD, 5, blosc.SHUFFLE, 8)
    h = blosc.get_info(comp)
    assert h.version == blosc.FORMAT_VERSION
    assert h.codec == int(blosc.Codec.ZSTD)
    assert h.type_size == 8
    assert h.nbytes_orig == 5000
    assert h.nbytes_comp == len(comp)
    assert h.has_shuffle and not h.has_bitshuffle
    assert blosc.get_decompressed_size(comp) == 5000


def test_empty_input_rejected():
    # ≙ blosc.go:269-271
    with pytest.raises(blosc.InvalidDataError):
        blosc.compress(b"", blosc.LZ4, 5, blosc.NOSHUFFLE, 1)


def test_short_decompress_input():
    # ≙ blosc.go:297-299
    with pytest.raises(blosc.InvalidHeaderError):
        blosc.decompress(b"\x02\x01\x00")


def test_bad_version():
    comp = bytearray(blosc.compress(ramp(100), blosc.LZ4, 5, blosc.NOSHUFFLE, 1))
    comp[0] = 3
    with pytest.raises(blosc.InvalidVersionError):
        blosc.decompress(bytes(comp))


def test_unknown_codec_in_header():
    comp = bytearray(blosc.compress(ramp(1000), blosc.LZ4, 5, blosc.SHUFFLE, 4))
    h = blosc.parse_header(bytes(comp))
    assert not h.is_memcpy  # otherwise codec byte is ignored
    comp[1] = 99
    with pytest.raises(blosc.InvalidCodecError):
        blosc.decompress(bytes(comp))


def test_header_claims_more_payload_than_present():
    comp = bytearray(blosc.compress(ramp(1000), blosc.LZ4, 5, blosc.SHUFFLE, 4))
    comp[12:16] = (len(comp) + 100).to_bytes(4, "little")
    with pytest.raises(blosc.InvalidDataError):
        blosc.decompress(bytes(comp))


def test_nbytescomp_below_header_size():
    comp = bytearray(blosc.compress(ramp(1000), blosc.LZ4, 5, blosc.SHUFFLE, 4))
    comp[12:16] = (8).to_bytes(4, "little")
    with pytest.raises(blosc.InvalidDataError):
        blosc.decompress(bytes(comp))


def test_forged_nbytesorig_size_mismatch():
    # ≙ ErrSizeMismatch check (blosc.go:429-431)
    data = ramp(1000)
    comp = bytearray(blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1))
    comp[4:8] = (999).to_bytes(4, "little")
    with pytest.raises((blosc.SizeMismatchError, blosc.DecompressionFailedError)):
        blosc.decompress(bytes(comp))


def test_corrupted_payload_per_codec():
    data = ramp(10000)
    for codec in ALL_CODECS:
        comp = bytearray(blosc.compress(data, codec, 5, blosc.SHUFFLE, 4))
        h = blosc.parse_header(bytes(comp))
        if h.is_memcpy:
            continue
        # stomp the middle of the payload; the format has no checksum, so
        # corruption must surface as an error OR as non-original bytes —
        # never as a silent correct-looking success
        mid = (blosc.HEADER_SIZE + len(comp)) // 2
        for k in range(24):
            if mid + k < len(comp):
                comp[mid + k] ^= 0xA5
        try:
            out = blosc.decompress(bytes(comp))
        except (blosc.DecompressionFailedError, blosc.SizeMismatchError,
                blosc.InvalidDataError, blosc.InvalidCodecError):
            continue
        assert out != data, f"corruption undetected for {codec}"


def test_level_clamping():
    # ≙ blosc_test.go:613-655: out-of-range levels are clamped, not errors
    data = ramp(4096)
    for level in [-5, 0, 10, 100]:
        comp = blosc.compress(data, blosc.LZ4, level, blosc.SHUFFLE, 4)
        assert blosc.decompress(comp) == data


def test_typesize_clamping():
    data = ramp(4096)
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 0)
    assert blosc.get_info(comp).type_size == 1
    assert blosc.decompress(comp) == data
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, -3)
    assert blosc.decompress(comp) == data


def test_typesize_override_decode():
    # ≙ blosc_test.go:683-719: caller override wins over the header value
    data = ramp(4096)
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 4)
    assert blosc.decompress_with_size(comp, 8) == data  # noshuffle: ts irrelevant
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert blosc.decompress_with_size(comp, 0) == data
    assert blosc.decompress_with_size(comp, 4) == data


def test_memcpy_fallback_roundtrip():
    # incompressible data → memcpy flag, exact roundtrip (blosc_test.go:243-266)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    h = blosc.get_info(comp)
    assert h.is_memcpy
    assert len(comp) == blosc.HEADER_SIZE + len(data)
    assert blosc.decompress(comp) == data


def test_memcpy_with_shuffle_clears_shuffle_flags():
    # our interop fix for the reference's latent memcpy+shuffle inconsistency
    # (SURVEY §2.4): raw bytes stored ⇒ shuffle flags MUST be cleared
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    h = blosc.get_info(comp)
    if h.is_memcpy:
        assert not h.has_shuffle and not h.has_bitshuffle
    assert blosc.decompress(comp) == data


def test_memcpy_stores_raw_unshuffled_bytes():
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    h = blosc.get_info(comp)
    if h.is_memcpy:
        assert comp[blosc.HEADER_SIZE :] == data


def test_numpy_array_input():
    arr = np.arange(1024, dtype=np.float64)
    comp = blosc.compress(arr, blosc.ZSTD, 5, blosc.SHUFFLE, 8)
    out = np.frombuffer(blosc.decompress(comp), dtype=np.float64)
    np.testing.assert_array_equal(arr, out)


def test_default_options():
    opts = blosc.default_options()
    assert opts.codec == blosc.Codec.LZ4
    assert opts.level == 5
    assert opts.shuffle == blosc.Shuffle.SHUFFLE
    assert opts.type_size == 4
    assert opts.block_size == 0


def test_single_byte_roundtrip():
    for codec in ALL_CODECS:
        comp = blosc.compress(b"x", codec, 5, blosc.SHUFFLE, 4)
        assert blosc.decompress(comp) == b"x"


def test_data_too_large_guard():
    class FakeBytes(bytes):
        pass
    # can't allocate 4 GB here; validate the guard arithmetic via options path
    from tpu_blosc.api import MAX_UINT32
    assert MAX_UINT32 == 0xFFFFFFFF


def test_huge_block_size_request():
    """A block_size beyond the input yields one block; beyond uint32 stays valid."""
    data = np.arange(10_000, dtype=np.float32).tobytes()
    comp = blosc.compress_with_options(data, blosc.Options(block_size=2**31))
    info = blosc.get_info(comp)
    assert info.is_split and blosc.decompress(comp) == data


def test_compression_is_deterministic():
    """Same input + options -> identical frame, across repeated calls
    (the OMP pipeline is per-block independent, so no nondeterminism)."""
    data = np.arange(500_000, dtype=np.float32).tobytes()
    opts = blosc.Options(block_size=65536)
    frames = {blosc.compress_with_options(data, opts) for _ in range(5)}
    assert len(frames) == 1


def test_compress_array_input_zero_copy_equality():
    """ndarray/memoryview inputs compress byte-identically to their
    tobytes() form at every path (single-block, chunked, F-order,
    strided, exotic dtypes) — the zero-copy coercion must never change
    output bytes."""
    rng2 = np.random.default_rng(11)
    arrays = [
        np.arange(25600, dtype=np.float32),              # single-block
        np.arange(3_000_000, dtype=np.float32),          # multi-block
        rng2.standard_normal((100, 300)),                # 2-D C-order
        np.asfortranarray(rng2.standard_normal((50, 40))),
        np.arange(100, dtype=np.int16)[::2],             # strided
        np.array([1, 2, 3], dtype="<M8[ns]"),            # buffer-hostile
    ]
    for arr in arrays:
        want = blosc.compress(arr.tobytes())
        assert blosc.compress(arr) == want
        assert blosc.compress(memoryview(arr.tobytes())) == want
        assert blosc.compress(bytearray(arr.tobytes())) == want
