"""Compression options with the reference's defaults and clamping rules.

Reference: Options/DefaultOptions (blosc.go:227-245) and the validation
in CompressWithOptions (blosc.go:268-282): typeSize<=0 → 1, level clamped
to [1, 9].
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from .format import Codec, Shuffle


@dataclass(frozen=True)
class Options:
    """Configures compression behavior (≙ Options, blosc.go:227-234).

    Unlike the reference — which accepts ``BlockSize`` but ignores it
    (blosc.go:232, 364 "Single block for simplicity") — this library honors
    ``block_size``: 0 means automatic (single-block for small inputs,
    multi-block chunking above AUTO_BLOCK_THRESHOLD; see chunk.py).
    """

    codec: Codec = Codec.LZ4
    level: int = 5
    shuffle: Shuffle = Shuffle.SHUFFLE
    type_size: int = 4
    block_size: int = 0  # 0 = automatic
    # 0 = automatic (all host cores).  Unlike the reference, where
    # NumThreads is declared and unused (blosc.go:233), this knob is LIVE:
    # it caps the OpenMP team of the native block pipelines
    # (chunk.py → native tpb_set_num_threads).
    num_threads: int = 0

    def clamped(self) -> "Options":
        """Apply the reference's option clamping (blosc.go:273-282)."""
        type_size = self.type_size if self.type_size > 0 else 1
        level = min(max(self.level, 1), 9)
        if type_size == self.type_size and level == self.level:
            return self
        return replace(self, type_size=type_size, level=level)


def default_options() -> Options:
    """≙ DefaultOptions (blosc.go:237-245): LZ4, level 5, byte shuffle, ts=4."""
    return Options()
