"""Codec protocol + open registry (≙ CodecInterface/RegisterCodec, codec.go:14-53).

The registry is an ordinary dict keyed by codec ID; ``register_codec``
installs custom codecs exactly like the reference's ``RegisterCodec``
(codec.go:36-38), preserving the "custom codec" extension capability.
Unlike the reference (which mutates a global map with no lock), writes here
are guarded by a lock; reads are GIL-atomic dict lookups.
"""

from __future__ import annotations

import threading
from typing import Protocol, runtime_checkable

from ..format import Codec


@runtime_checkable
class CodecProtocol(Protocol):
    """≙ CodecInterface (codec.go:15-24)."""

    def compress(self, data: bytes, level: int) -> bytes:
        """Compress data with the given level (1-9)."""
        ...

    def decompress(self, data: bytes, expected_size: int) -> bytes:
        """Decompress data to the expected size."""
        ...

    def name(self) -> str:
        """Return the codec name."""
        ...


_codecs: dict[int, CodecProtocol] = {}
_lock = threading.Lock()
_version = 0  # bumped on every registration; lets fast paths cache lookups


def register_codec(codec_id: int, impl: CodecProtocol) -> None:
    """≙ RegisterCodec (codec.go:36-38)."""
    global _version
    with _lock:
        _codecs[int(codec_id)] = impl
        _version += 1


def registry_version() -> int:
    """Monotone counter of registry mutations (for memoized dispatch)."""
    return _version


def get_codec(codec_id: int) -> CodecProtocol | None:
    """≙ GetCodec (codec.go:41-44); returns None when unregistered."""
    return _codecs.get(int(codec_id))


def list_codecs() -> list[Codec | int]:
    """≙ ListCodecs (codec.go:47-53)."""
    out = []
    for cid in _codecs:
        try:
            out.append(Codec(cid))
        except ValueError:
            out.append(cid)
    return out
