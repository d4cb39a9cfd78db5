"""Batched device filters: shuffle a whole batch of equal-size blocks at once.

One jit-compiled call filters (nb, block_size) uint8 on the accelerator —
the device analogue of the reference looping its SIMD kernel over a buffer
(shuffle_amd64.s:183-226), except the batch dimension also maps 1:1 onto a
device mesh axis for multi-chip sharding (dist/mesh.py shard_maps these
exact functions).

All functions take/return host numpy arrays of shape (nb, bs) with bs a
multiple of type_size (bit variants: of 8*type_size); ragged tails never
reach this layer (chunk.py keeps the final short block on the host path).

Performance note (measured on the attached TPU, 64 MiB batches): the XLA
reshape-transpose formulation of byte shuffle runs at 1.4-2.7 TB/s
processed (~speed-of-light for ts 2/8 against the chip's ~2.6 TB/s copy
ceiling) and the shift/mask bitshuffle at 1.6-2.0 TB/s, so these are left
to XLA's fuser; hand-written Pallas equivalents of the lane regroupings do
not currently lower through Mosaic (strided lane slice → gather).
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
    return jnp.swapaxes(x.reshape(nb, ne, type_size), 1, 2).reshape(nb, bs)


@partial(jax.jit, static_argnums=(1,))
def _unshuffle_batch_dev(x: jax.Array, type_size: int) -> jax.Array:
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
