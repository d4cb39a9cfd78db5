"""JAX/XLA implementations of the shuffle filters (jit-compatible).

These are traced, statically-shaped functions over uint8 arrays — the
XLA-compiled analogue of the reference's generic Go loops (shuffle.go:60-72,
176-218), used on any backend.  The Pallas TPU kernels in
pallas_kernels.py are the analogue of the AVX2/NEON assembly; both must be
byte-identical to filters/reference.py (the oracle).

All functions here take and return 1-D uint8 jax arrays whose length is
already a multiple of ``type_size`` *and*, for the bit variants, of
``8*type_size`` — the ragged remainder handling (verbatim tails, partial
groups) is host-side slicing in filters/__init__.py, keeping traced shapes
static and tile-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIT_WEIGHTS = None


@partial(jax.jit, static_argnums=(1,))
def shuffle_bytes_body(x: jax.Array, type_size: int) -> jax.Array:
    """Byte-shuffle the full body: (ne, ts) -> (ts, ne) transpose."""
    ne = x.shape[0] // type_size
    return x.reshape(ne, type_size).T.reshape(-1)


@partial(jax.jit, static_argnums=(1,))
def unshuffle_bytes_body(x: jax.Array, type_size: int) -> jax.Array:
    ne = x.shape[0] // type_size
    return x.reshape(type_size, ne).T.reshape(-1)


def _bit_transpose_groups(planes: jax.Array) -> jax.Array:
    """8x8 MSB-first bit transpose over the last axis of a (..., 8) uint8 array.

    Returns (..., 8) uint8 where out[..., o] bit (7-i) = in[..., i] bit (7-o)
    — the exact per-group transform of the reference (shuffle.go:192-199).
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    # bits[..., i, b] = bit (7-b) of byte i
    bits = (planes[..., :, None] >> shifts[None, :]) & jnp.uint8(1)
    out_bits = jnp.swapaxes(bits, -1, -2)  # plain transpose in MSB-first form
    weights = (jnp.uint8(1) << shifts).astype(jnp.uint8)
    return (out_bits * weights[None, :]).sum(axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnums=(1,))
def bit_shuffle_body(x: jax.Array, type_size: int) -> jax.Array:
    """Bit-shuffle full groups: len(x) is a multiple of 8*type_size."""
    g = x.shape[0] // (8 * type_size)
    blk = x.reshape(g, 8, type_size)
    planes = jnp.swapaxes(blk, 1, 2)  # (g, ts, 8)
    return _bit_transpose_groups(planes).reshape(-1)


@partial(jax.jit, static_argnums=(1,))
def bit_unshuffle_body(x: jax.Array, type_size: int) -> jax.Array:
    g = x.shape[0] // (8 * type_size)
    planes = x.reshape(g, type_size, 8)
    blk = _bit_transpose_groups(planes)  # (g, ts, 8)
    return jnp.swapaxes(blk, 1, 2).reshape(-1)
