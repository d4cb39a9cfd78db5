"""Batched device filters: shuffle a whole batch of equal-size blocks at once.

One jit-compiled call filters (nb, block_size) uint8 on the accelerator —
the device analogue of the reference looping its SIMD kernel over a buffer
(shuffle_amd64.s:183-226), except the batch dimension also maps 1:1 onto a
device mesh axis for multi-chip sharding (dist/mesh.py shard_maps these
exact functions).

All functions take/return host numpy arrays of shape (nb, bs) with bs a
multiple of type_size (bit variants: of 8*type_size); ragged tails never
reach this layer (chunk.py keeps the final short block on the host path).

Performance note (measured on the attached TPU v5e, 64 MiB batches,
loop-slope timing — per-call timings are async-contaminated, see
CLAUDE.md): byte shuffle ts=4 runs ~80 GB/s processed with the two-stage
sub-tile decomposition (vs 60 for the plain reshape-transpose), inverse
~55, bitshuffle ~46 / bitunshuffle ~56 with the SWAR two-word bit
transpose (jaxops._bit_transpose_groups; was 38/45 unrolled).  Byte-
granular relayouts are the cost — the streaming ceiling on this chip is
~400 GB/s (819 GB/s HBM, read+write) and elementwise loop bodies that
stay VMEM-resident measure in TB/s.  Earlier TB/s claims for these
transposes were artifacts of per-call timing.  Hand-written Pallas
equivalents of the lane regroupings do not lower through Mosaic
(strided lane slice → gather; see pallas_kernels.py's record).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import jaxops


@partial(jax.jit, static_argnums=(1,))
def _shuffle_batch_dev(x: jax.Array, type_size: int) -> jax.Array:
    nb, bs = x.shape
    ne = bs // type_size
    P = jaxops._SHUF_PAYLOAD
    if ne % P == 0:
        # two-stage: local (P, ts) sub-tile transpose, then a whole-payload
        # permute — see jaxops._SHUF_PAYLOAD for the measured rationale
        t = x.reshape(nb, ne // P, P, type_size)
        return jnp.swapaxes(t, 2, 3).swapaxes(1, 2).reshape(nb, bs)
    return jnp.swapaxes(x.reshape(nb, ne, type_size), 1, 2).reshape(nb, bs)


@partial(jax.jit, static_argnums=(1,))
def _unshuffle_batch_dev(x: jax.Array, type_size: int) -> jax.Array:
    # plain transpose: measured 77.8 GB/s vs 51.5 (P8) / 60.5 (P128) for
    # the payload decomposition — the inverse direction gains nothing
    # from sub-tiling (see jaxops._SHUF_PAYLOAD note)
    nb, bs = x.shape
    ne = bs // type_size
    return jnp.swapaxes(x.reshape(nb, type_size, ne), 1, 2).reshape(nb, bs)


@partial(jax.jit, static_argnums=(1,))
def _bit_shuffle_batch_dev(x: jax.Array, type_size: int) -> jax.Array:
    nb, bs = x.shape
    g = bs // (8 * type_size)
    blk = x.reshape(nb, g, 8, type_size)
    planes = jnp.swapaxes(blk, 2, 3)  # (nb, g, ts, 8)
    return jaxops._bit_transpose_groups(planes).reshape(nb, bs)


@partial(jax.jit, static_argnums=(1,))
def _bit_unshuffle_batch_dev(x: jax.Array, type_size: int) -> jax.Array:
    nb, bs = x.shape
    g = bs // (8 * type_size)
    planes = x.reshape(nb, g, type_size, 8)
    blk = jaxops._bit_transpose_groups(planes)  # (nb, g, ts, 8)
    return jnp.swapaxes(blk, 2, 3).reshape(nb, bs)


def _run(fn, arr: np.ndarray, type_size: int) -> np.ndarray:
    out = fn(jnp.asarray(arr), type_size)
    return np.asarray(out)


def shuffle_batch(arr: np.ndarray, type_size: int) -> np.ndarray:
    """Byte-shuffle each row of (nb, bs); bs must be a multiple of ts."""
    if arr.shape[1] % type_size:
        raise ValueError("block size must be a multiple of type_size")
    return _run(_shuffle_batch_dev, arr, type_size)


def unshuffle_batch(arr: np.ndarray, type_size: int) -> np.ndarray:
    if arr.shape[1] % type_size:
        raise ValueError("block size must be a multiple of type_size")
    return _run(_unshuffle_batch_dev, arr, type_size)


def bit_shuffle_batch(arr: np.ndarray, type_size: int) -> np.ndarray:
    """Bit-shuffle each row; bs must be a multiple of 8*ts (full groups)."""
    if arr.shape[1] % (8 * type_size):
        raise ValueError("block size must be a multiple of 8*type_size")
    return _run(_bit_shuffle_batch_dev, arr, type_size)


def bit_unshuffle_batch(arr: np.ndarray, type_size: int) -> np.ndarray:
    if arr.shape[1] % (8 * type_size):
        raise ValueError("block size must be a multiple of 8*type_size")
    return _run(_bit_unshuffle_batch_dev, arr, type_size)
