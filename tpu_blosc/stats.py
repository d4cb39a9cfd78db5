"""Observability: compression statistics and profiling helpers.

The reference has no instrumentation at all (SURVEY §5 — errors are the
only signal).  This module adds the production-side observability a
deployed codec needs without touching the hot paths: a stats-returning
compress wrapper, frame introspection down to per-block payloads, and a
context manager bridging to jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

from .format import Header, Shuffle, parse_header
from .options import Options


@dataclass(frozen=True)
class CompressionStats:
    """What happened during one compress call."""

    nbytes_orig: int
    nbytes_comp: int
    codec: int
    shuffle: Shuffle
    type_size: int
    block_size: int
    num_blocks: int
    memcpy_blocks: int
    elapsed_s: float

    @property
    def ratio(self) -> float:
        return self.nbytes_orig / max(self.nbytes_comp, 1)

    @property
    def throughput_gbps(self) -> float:
        return self.nbytes_orig / max(self.elapsed_s, 1e-12) / 1e9

    @property
    def used_memcpy(self) -> bool:
        return self.memcpy_blocks > 0


@dataclass(frozen=True)
class FrameStats:
    """Structure of an existing frame (no decompression performed)."""

    header: Header
    num_blocks: int
    block_payload_sizes: tuple = field(default_factory=tuple)
    memcpy_blocks: int = 0

    @property
    def ratio(self) -> float:
        return self.header.nbytes_orig / max(self.header.nbytes_comp, 1)


def frame_stats(frame) -> FrameStats:
    """Introspect a frame's block structure (single-block or FLAG_SPLIT)."""
    raw = bytes(frame) if not isinstance(frame, bytes) else frame
    header = parse_header(raw)
    if not header.is_split:
        payload = header.nbytes_comp - 16
        return FrameStats(
            header=header,
            num_blocks=1,
            block_payload_sizes=(payload,),
            memcpy_blocks=1 if header.is_memcpy else 0,
        )
    from .chunk import parse_block_table

    entries, _ = parse_block_table(raw, header)
    return FrameStats(
        header=header,
        num_blocks=len(entries),
        block_payload_sizes=tuple(s for s, _ in entries),
        memcpy_blocks=sum(1 for _, m in entries if m),
    )


def compress_with_stats(data, opts: Options | None = None):
    """Compress and return (frame, CompressionStats)."""
    from .api import compress_with_options

    if opts is None:
        opts = Options()
    t0 = time.perf_counter()
    frame = compress_with_options(data, opts)
    elapsed = time.perf_counter() - t0
    fs = frame_stats(frame) if frame[:4] != b"TPB2" else None
    header = parse_header(frame) if fs else None
    if fs is None:
        from .container import parse_container

        _, codec, _, type_size, total, sizes, _ = parse_container(frame)
        return frame, CompressionStats(
            nbytes_orig=total,
            nbytes_comp=len(frame),
            codec=codec,
            shuffle=opts.clamped().shuffle,
            type_size=type_size,
            block_size=0,
            num_blocks=len(sizes),
            memcpy_blocks=0,
            elapsed_s=elapsed,
        )
    return frame, CompressionStats(
        nbytes_orig=header.nbytes_orig,
        nbytes_comp=len(frame),
        codec=header.codec,
        shuffle=header.shuffle_mode,
        type_size=header.type_size,
        block_size=header.block_size,
        num_blocks=fs.num_blocks,
        memcpy_blocks=fs.memcpy_blocks,
        elapsed_s=elapsed,
    )


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Profile a region: wall time always; a jax.profiler device trace when
    ``log_dir`` is given (view with TensorBoard / xprof).

        with tpu_blosc.stats.trace("/tmp/trace") as t:
            blosc.compress_array(x)
        print(t["elapsed_s"])
    """
    record: dict = {}
    started = False
    if log_dir is not None:
        try:
            import jax

            jax.profiler.start_trace(log_dir)
            started = True
        except Exception:
            pass
    t0 = time.perf_counter()
    try:
        yield record
    finally:
        record["elapsed_s"] = time.perf_counter() - t0
        if started:
            import jax

            jax.profiler.stop_trace()
            record["trace_dir"] = log_dir
