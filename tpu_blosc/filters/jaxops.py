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


# payload width for the two-stage byte-shuffle decomposition: transpose
# (P, ts) sub-tiles locally, then permute whole P-byte payloads.  TPU
# transposes cost by granularity — the big (ne/P, ts) permute moves P-byte
# units instead of single bytes.  Measured on the attached v5e (64 MiB,
# loop-slope timing): ts=4 shuffle P8 81.9 / P32 72.5 / P128 45.7 /
# P512 48.5 / plain 64.5 / u32 shift-pack 21.2 GB/s.  The INVERSE prefers
# the plain transpose (77.8 vs 51.5 at P8 / 60.5 at P128) — decomposing
# the gather direction only adds passes, so unshuffle does not use this.
_SHUF_PAYLOAD = 8


@partial(jax.jit, static_argnums=(1,))
def shuffle_bytes_body(x: jax.Array, type_size: int) -> jax.Array:
    """Byte-shuffle the full body: (ne, ts) -> (ts, ne) transpose."""
    ne = x.shape[0] // type_size
    P = _SHUF_PAYLOAD
    if ne % P == 0:
        t = x.reshape(ne // P, P, type_size)
        return jnp.swapaxes(t, 1, 2).swapaxes(0, 1).reshape(-1)
    return x.reshape(ne, type_size).T.reshape(-1)


@partial(jax.jit, static_argnums=(1,))
def unshuffle_bytes_body(x: jax.Array, type_size: int) -> jax.Array:
    ne = x.shape[0] // type_size
    return x.reshape(type_size, ne).T.reshape(-1)


def _bit_transpose_groups(planes: jax.Array) -> jax.Array:
    """8x8 MSB-first bit transpose over the last axis of a (..., 8) uint8 array.

    Returns (..., 8) uint8 where out[..., o] bit (7-i) = in[..., i] bit (7-o)
    — the exact per-group transform of the reference (shuffle.go:192-199).
    The transform is an involution, so it serves both directions.

    Formulated as 64 unrolled shift/mask/or ops over the 8 minor-dim byte
    slices: the earlier bit-matrix form (expand to (..., 8, 8) bits,
    transpose, weighted sum) materializes an 8x blow-up and measured 2x
    slower on the attached v5e (18.6 vs 38.2 GB/s, loop-slope timing).
    """
    b = [planes[..., i] for i in range(8)]
    outs = []
    for ob in range(8):
        acc = jnp.zeros_like(b[0])
        for ib in range(8):
            acc = acc | (
                (((b[ib] >> (7 - ob)) & jnp.uint8(1)) << (7 - ib)).astype(
                    jnp.uint8
                )
            )
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


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
