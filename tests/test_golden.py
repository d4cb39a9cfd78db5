"""Golden frames: exact expected bytes for encoder-independent cases.

Memcpy frames contain the raw input, so their bytes depend only on the
frame format — these pin the header layout byte-for-byte against the
reference's conventions (SURVEY §2: codec ID in byte 1, little-endian
uint32 sizes, NBytesComp includes the header, flags 0x1/0x2/0x4/0x8).
"""

import struct

import numpy as np

import tpu_blosc as blosc
from tpu_blosc.options import Options


def test_golden_memcpy_single_block_frame():
    data = b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a"  # incompressible, short
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    expected = (
        bytes(
            [
                2,     # Version == FormatVersion 2        (blosc.go:180)
                1,     # VersionLZ = codec ID LZ4          (blosc.go:360)
                0x02,  # Flags = memcpy                    (blosc.go:341-356)
                1,     # TypeSize
            ]
        )
        + struct.pack("<III", 10, 10, 26)  # NBytesOrig, BlockSize, NBytesComp
        + data
    )
    assert frame == expected
    assert blosc.decompress(frame) == data


def test_golden_memcpy_shuffle_flags_cleared():
    """Deliberate divergence (SURVEY §2.4): memcpy frames clear shuffle
    flags so the stored raw bytes decode correctly under any decoder."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert frame[2] == 0x02          # memcpy only — NOT 0x03
    assert frame[16:] == data        # raw, unshuffled payload
    assert blosc.decompress(frame) == data


def test_golden_split_frame_memcpy_blocks():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    frame = blosc.compress_with_options(
        data, Options(shuffle=blosc.NOSHUFFLE, type_size=1, block_size=64)
    )
    # header: split flag, block size 64, 2 blocks, both memcpy
    table = struct.pack("<I", 2) + struct.pack("<II", 0x80000040, 0x80000040)
    expected = (
        bytes([2, 1, 0x08, 1])
        + struct.pack("<III", 128, 64, 16 + len(table) + 128)
        + table
        + data
    )
    assert frame == expected
    assert blosc.decompress(frame) == data


def test_golden_container_header():
    data = bytes(range(256)) * 4
    from tpu_blosc import container

    frame = container.compress_container(
        data, Options(shuffle=blosc.NOSHUFFLE, type_size=1), frame_limit=512
    )
    assert frame[:4] == b"TPB2"
    version, codec, flags, ts, total, nframes = struct.unpack(
        "<BBBBQI", frame[4:20]
    )
    assert (version, codec, flags, ts) == (1, 1, 0, 1)
    assert total == len(data)
    assert nframes == 2
    sizes = struct.unpack("<2Q", frame[20:36])
    assert sum(sizes) == len(frame) - 36
    assert blosc.decompress(frame) == data


def test_golden_header_roundtrip_all_codecs():
    """Byte 1 carries the codec ID for every codec (blosc.go:360)."""
    data = np.arange(1000, dtype=np.float32).tobytes()
    for codec in (blosc.LZ4, blosc.LZ4HC, blosc.SNAPPY, blosc.ZLIB, blosc.ZSTD):
        frame = blosc.compress(data, codec, 5, blosc.SHUFFLE, 4)
        assert frame[0] == 2
        assert frame[1] == int(codec)
        assert frame[3] == 4
        assert struct.unpack("<I", frame[4:8])[0] == len(data)
