"""Blosc frame format: header pack/parse, flags, codec and shuffle enums.

Byte-compatible with the reference's 16-byte little-endian header
(reference: blosc.go:48-224).  Header layout:

    byte  0      Version      (must == 2)
    byte  1      VersionLZ    codec ID (this library's convention: the codec
                              enum value lives here, NOT in flag bits 5-7 as
                              C-Blosc does — see reference blosc.go:360)
    byte  2      Flags        0x1 byte-shuffle, 0x2 memcpy, 0x4 bit-shuffle,
                              0x8 split (reserved, never set by the reference)
    byte  3      TypeSize     uint8 element size for shuffle
    bytes 4-7    NBytesOrig   uint32 LE original size
    bytes 8-11   BlockSize    uint32 LE block size
    bytes 12-15  NBytesComp   uint32 LE total compressed size INCLUDING header

Extension (this library only, guarded by FLAG_SPLIT which the reference
defines but never sets — blosc.go:114): multi-block frames carry a
per-block offset table immediately after the header; see chunk.py.
"""

from __future__ import annotations

import enum
import struct
from dataclasses import dataclass

from .errors import InvalidHeaderError, InvalidVersionError

VERSION = "1.1.0"
FORMAT_VERSION = 2
HEADER_SIZE = 16
MIN_HEADER_SIZE = 16
MAX_UINT32 = 0xFFFFFFFF

_HEADER_STRUCT = struct.Struct("<BBBBIII")


class Codec(enum.IntEnum):
    """Compression codec identifiers (reference: blosc.go:55-64)."""

    BLOSCLZ = 0  # our extension: implemented here (codecs/blosclz_ref.py);
    # the reference declares the enum but never implements it (blosc.go:58)
    LZ4 = 1
    LZ4HC = 2
    SNAPPY = 3
    ZLIB = 4
    ZSTD = 5

    def __str__(self) -> str:  # parity with Codec.String() (blosc.go:67-84)
        return _CODEC_NAMES.get(int(self), f"unknown({int(self)})")


_CODEC_NAMES = {
    0: "blosclz",
    1: "lz4",
    2: "lz4hc",
    3: "snappy",
    4: "zlib",
    5: "zstd",
}


class Shuffle(enum.IntEnum):
    """Shuffle mode for byte/bit reordering (reference: blosc.go:87-93)."""

    NOSHUFFLE = 0x0
    SHUFFLE = 0x1  # byte shuffle (≙ Shuffle1)
    BITSHUFFLE = 0x2

    def __str__(self) -> str:
        return {0: "noshuffle", 1: "shuffle", 2: "bitshuffle"}.get(
            int(self), f"unknown({int(self)})"
        )


# Flag bits in the Blosc header (reference: blosc.go:110-115)
FLAG_SHUFFLE = 0x1
FLAG_MEMCPY = 0x2
FLAG_BITSHUFFLE = 0x4
FLAG_SPLIT = 0x8


@dataclass
class Header:
    """The 16-byte Blosc frame header (reference: blosc.go:151-224)."""

    version: int = FORMAT_VERSION
    version_lz: int = 0  # codec ID
    flags: int = 0
    type_size: int = 1
    nbytes_orig: int = 0
    block_size: int = 0
    nbytes_comp: int = 0

    def to_bytes(self) -> bytes:
        """Serialize to 16 little-endian bytes (≙ Header.Bytes, blosc.go:188-198)."""
        return _HEADER_STRUCT.pack(
            self.version & 0xFF,
            self.version_lz & 0xFF,
            self.flags & 0xFF,
            self.type_size & 0xFF,
            self.nbytes_orig & MAX_UINT32,
            self.block_size & MAX_UINT32,
            self.nbytes_comp & MAX_UINT32,
        )

    # -- flag accessors (reference: blosc.go:200-224) --

    @property
    def has_shuffle(self) -> bool:
        return bool(self.flags & FLAG_SHUFFLE)

    @property
    def has_bitshuffle(self) -> bool:
        return bool(self.flags & FLAG_BITSHUFFLE)

    @property
    def is_memcpy(self) -> bool:
        return bool(self.flags & FLAG_MEMCPY)

    @property
    def is_split(self) -> bool:
        return bool(self.flags & FLAG_SPLIT)

    @property
    def shuffle_mode(self) -> Shuffle:
        """BitShuffle wins when both flags are set (blosc.go:216-224)."""
        if self.has_bitshuffle:
            return Shuffle.BITSHUFFLE
        if self.has_shuffle:
            return Shuffle.SHUFFLE
        return Shuffle.NOSHUFFLE

    @property
    def codec(self) -> int:
        """Codec ID stored in byte 1 (blosc.go:360, 403)."""
        return self.version_lz


def parse_header(data: bytes | bytearray | memoryview) -> Header:
    """Parse a Blosc header (≙ ParseHeader, blosc.go:165-185).

    Raises InvalidHeaderError on short input, InvalidVersionError when
    byte 0 != 2.
    """
    if len(data) < HEADER_SIZE:
        raise InvalidHeaderError(
            f"blosc: invalid header: need {HEADER_SIZE} bytes, got {len(data)}"
        )
    (
        version,
        version_lz,
        flags,
        type_size,
        nbytes_orig,
        block_size,
        nbytes_comp,
    ) = _HEADER_STRUCT.unpack_from(bytes(data[:HEADER_SIZE]))
    if version != FORMAT_VERSION:
        raise InvalidVersionError(
            f"blosc: unsupported format version: got {version}, "
            f"expected {FORMAT_VERSION}"
        )
    return Header(
        version=version,
        version_lz=version_lz,
        flags=flags,
        type_size=type_size,
        nbytes_orig=nbytes_orig,
        block_size=block_size,
        nbytes_comp=nbytes_comp,
    )
