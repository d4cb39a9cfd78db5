"""Header pack/parse tests (≙ reference blosc_test.go:165-192, fuzz_test.go:280-450)."""

import pytest

import tpu_blosc as blosc
from tpu_blosc.format import Header, parse_header


def test_header_roundtrip_fields():
    h = Header(
        version=2,
        version_lz=int(blosc.Codec.ZSTD),
        flags=blosc.FLAG_SHUFFLE,
        type_size=8,
        nbytes_orig=12345,
        block_size=4096,
        nbytes_comp=678,
    )
    raw = h.to_bytes()
    assert len(raw) == blosc.HEADER_SIZE
    p = parse_header(raw)
    assert p == h


def test_header_layout_little_endian():
    h = Header(
        version=2,
        version_lz=1,
        flags=0x5,
        type_size=4,
        nbytes_orig=0x01020304,
        block_size=0x0A0B0C0D,
        nbytes_comp=0x11223344,
    )
    raw = h.to_bytes()
    assert raw[0] == 2
    assert raw[1] == 1
    assert raw[2] == 0x5
    assert raw[3] == 4
    assert raw[4:8] == bytes([0x04, 0x03, 0x02, 0x01])
    assert raw[8:12] == bytes([0x0D, 0x0C, 0x0B, 0x0A])
    assert raw[12:16] == bytes([0x44, 0x33, 0x22, 0x11])


def test_parse_short_header():
    with pytest.raises(blosc.InvalidHeaderError):
        parse_header(b"\x02" * 15)


@pytest.mark.parametrize("version", [0, 1, 3, 255])
def test_parse_bad_version(version):
    raw = bytes([version]) + b"\x00" * 15
    with pytest.raises(blosc.InvalidVersionError):
        parse_header(raw)


def test_flag_accessors():
    h = Header(flags=blosc.FLAG_SHUFFLE)
    assert h.has_shuffle and not h.has_bitshuffle and not h.is_memcpy
    assert h.shuffle_mode == blosc.Shuffle.SHUFFLE
    h = Header(flags=blosc.FLAG_BITSHUFFLE)
    assert h.shuffle_mode == blosc.Shuffle.BITSHUFFLE
    h = Header(flags=blosc.FLAG_MEMCPY)
    assert h.is_memcpy
    assert h.shuffle_mode == blosc.Shuffle.NOSHUFFLE
    # BitShuffle wins when both set (reference blosc.go:216-224,
    # tested blosc_test.go:457-478)
    h = Header(flags=blosc.FLAG_SHUFFLE | blosc.FLAG_BITSHUFFLE)
    assert h.shuffle_mode == blosc.Shuffle.BITSHUFFLE


def test_enum_strings():
    assert str(blosc.Codec.LZ4) == "lz4"
    assert str(blosc.Codec.LZ4HC) == "lz4hc"
    assert str(blosc.Codec.SNAPPY) == "snappy"
    assert str(blosc.Codec.ZLIB) == "zlib"
    assert str(blosc.Codec.ZSTD) == "zstd"
    assert str(blosc.Codec.BLOSCLZ) == "blosclz"
    assert str(blosc.Shuffle.NOSHUFFLE) == "noshuffle"
    assert str(blosc.Shuffle.SHUFFLE) == "shuffle"
    assert str(blosc.Shuffle.BITSHUFFLE) == "bitshuffle"


def test_parse_reparse_consistency():
    # ≙ FuzzParseHeader's Bytes()-reparse agreement (fuzz_test.go:280-450)
    for flags in range(16):
        h = Header(
            version=2, version_lz=5, flags=flags, type_size=16,
            nbytes_orig=999, block_size=100, nbytes_comp=50,
        )
        assert parse_header(h.to_bytes()) == h
