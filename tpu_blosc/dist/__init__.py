"""Distributed (multi-chip / multi-host) block pipeline for tpu_blosc."""

from .mesh import (
    block_mesh,
    compress_chunked_mesh,
    decompress_chunked_mesh,
    filter_blocks_sharded,
    initialize_distributed,
)

__all__ = [
    "block_mesh",
    "compress_chunked_mesh",
    "decompress_chunked_mesh",
    "filter_blocks_sharded",
    "initialize_distributed",
]
