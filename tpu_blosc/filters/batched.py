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


def _t4x4(a, b, c, d):
    """Byte transpose of a 4x4 block held in 4 LE u32 words: o_k carries
    byte k of a,b,c,d (packed LE).  ~20 word ops per 16 bytes — the whole
    ts=4 shuffle runs in u32 space with no byte-granular relayout."""
    m0 = jnp.uint32(0x00FF00FF)
    m1 = jnp.uint32(0xFF00FF00)
    x0 = (a & m0) | ((b & m0) << 8)
    x1 = ((a >> 8) & m0) | (b & m1)
    x2 = (c & m0) | ((d & m0) << 8)
    x3 = ((c >> 8) & m0) | (d & m1)
    lo = jnp.uint32(0x0000FFFF)
    hi = jnp.uint32(0xFFFF0000)
    o0 = (x0 & lo) | (x2 << 16)
    o2 = (x0 >> 16) | (x2 & hi)
    o1 = (x1 & lo) | (x3 << 16)
    o3 = (x1 >> 16) | (x3 & hi)
    return o0, o1, o2, o3


@jax.jit
def _shuffle_batch_dev_u32(xw: jax.Array) -> jax.Array:
    """ts=4 byte shuffle over (nb, bs//4) uint32 rows (bs % 16 == 0).

    The words ARE the elements, so the (ne, 4) byte transpose becomes a
    4x4 SWAR transpose per word quad + a coarse concat — measured 142 vs
    79 GB/s for the u8 two-stage transpose on the attached v5e (64 MiB,
    loop-slope).  Input must arrive as u32 (free host .view / free
    same-width bitcast from 4-byte dtypes); converting a device u8 array
    costs more than it saves (see jaxops._bit_transpose_groups record).
    """
    nb, ne = xw.shape
    q = xw.reshape(nb, ne // 4, 4)
    o0, o1, o2, o3 = _t4x4(q[..., 0], q[..., 1], q[..., 2], q[..., 3])
    return jnp.concatenate([o0, o1, o2, o3], axis=1)


@jax.jit
def _unshuffle_batch_dev_u32(xw: jax.Array) -> jax.Array:
    """Inverse of _shuffle_batch_dev_u32 (101 vs 76 GB/s measured)."""
    nb, ne = xw.shape
    q = xw.reshape(nb, 4, ne // 4)
    o0, o1, o2, o3 = _t4x4(q[:, 0], q[:, 1], q[:, 2], q[:, 3])
    return jnp.stack([o0, o1, o2, o3], axis=-1).reshape(nb, ne)


@jax.jit
def _shuffle_batch_dev_u16(xh: jax.Array) -> jax.Array:
    """ts=2 byte shuffle over (nb, bs//2) uint16 rows (bs % 4 == 0).

    The bf16/f16/int16 analogue of the u32 SWAR path: each word IS one
    element, so the (ne, 2) byte transpose is a 2x2 SWAR per word pair —
    6 word ops per 4 bytes, no byte-granular relayout."""
    nb, ne = xh.shape
    q = xh.reshape(nb, ne // 2, 2)
    a, b = q[..., 0], q[..., 1]
    m = jnp.uint16(0x00FF)
    o0 = (a & m) | ((b & m) << 8)
    o1 = ((a >> 8) & m) | (b & jnp.uint16(0xFF00))
    return jnp.concatenate([o0, o1], axis=1)


@jax.jit
def _unshuffle_batch_dev_u16(xh: jax.Array) -> jax.Array:
    """Inverse of _shuffle_batch_dev_u16."""
    nb, ne = xh.shape
    q = xh.reshape(nb, 2, ne // 2)
    a, b = q[:, 0], q[:, 1]
    m = jnp.uint16(0x00FF)
    e0 = (a & m) | ((b & m) << 8)
    e1 = ((a >> 8) & m) | (b & jnp.uint16(0xFF00))
    return jnp.stack([e0, e1], axis=-1).reshape(nb, ne)


@jax.jit
def _shuffle_batch_dev_u32_ts8(xw: jax.Array) -> jax.Array:
    """ts=8 byte shuffle over (nb, bs//4) uint32 rows (bs % 32 == 0).

    An 8-byte element is two adjacent LE u32 words; planes 0-3 come from
    the even (lo) words, planes 4-7 from the odd (hi) words — two 4x4
    SWAR transposes over word picks from each octet."""
    nb, ne = xw.shape
    r = xw.reshape(nb, ne // 8, 8)
    o0, o1, o2, o3 = _t4x4(r[..., 0], r[..., 2], r[..., 4], r[..., 6])
    o4, o5, o6, o7 = _t4x4(r[..., 1], r[..., 3], r[..., 5], r[..., 7])
    return jnp.concatenate([o0, o1, o2, o3, o4, o5, o6, o7], axis=1)


@jax.jit
def _unshuffle_batch_dev_u32_ts8(xw: jax.Array) -> jax.Array:
    """Inverse of _shuffle_batch_dev_u32_ts8."""
    nb, ne = xw.shape
    q = xw.reshape(nb, 8, ne // 8)
    l0, l1, l2, l3 = _t4x4(q[:, 0], q[:, 1], q[:, 2], q[:, 3])
    h0, h1, h2, h3 = _t4x4(q[:, 4], q[:, 5], q[:, 6], q[:, 7])
    lo = jnp.stack([l0, l1, l2, l3], axis=-1).reshape(nb, ne // 2)
    hi = jnp.stack([h0, h1, h2, h3], axis=-1).reshape(nb, ne // 2)
    return jnp.stack([lo, hi], axis=-1).reshape(nb, ne)


def _word_view(arr: np.ndarray, type_size: int) -> np.ndarray | None:
    """Free reinterpretation of (nb, bs) u8 rows as SWAR words for the
    given type_size (u16 for ts=2, u32 for ts=4/8), when alignment and
    shape allow."""
    wdt, quant = {2: (np.uint16, 4), 4: (np.uint32, 16), 8: (np.uint32, 32)}[
        type_size
    ]
    if arr.shape[1] % quant:
        return None
    try:
        return arr.view(wdt)
    except ValueError:  # non-contiguous / misaligned source
        return None


_SWAR_SHUFFLE = {
    2: _shuffle_batch_dev_u16,
    4: _shuffle_batch_dev_u32,
    8: _shuffle_batch_dev_u32_ts8,
}
_SWAR_UNSHUFFLE = {
    2: _unshuffle_batch_dev_u16,
    4: _unshuffle_batch_dev_u32,
    8: _unshuffle_batch_dev_u32_ts8,
}


def _run(fn, arr: np.ndarray, type_size: int) -> np.ndarray:
    out = fn(jnp.asarray(arr), type_size)
    return np.asarray(out)


def shuffle_batch(arr: np.ndarray, type_size: int) -> np.ndarray:
    """Byte-shuffle each row of (nb, bs); bs must be a multiple of ts."""
    if arr.shape[1] % type_size:
        raise ValueError("block size must be a multiple of type_size")
    if type_size in _SWAR_SHUFFLE:
        w = _word_view(arr, type_size)
        if w is not None:
            out = np.asarray(_SWAR_SHUFFLE[type_size](jnp.asarray(w)))
            return out.view(np.uint8)
    return _run(_shuffle_batch_dev, arr, type_size)


def unshuffle_batch(arr: np.ndarray, type_size: int) -> np.ndarray:
    if arr.shape[1] % type_size:
        raise ValueError("block size must be a multiple of type_size")
    if type_size in _SWAR_UNSHUFFLE:
        w = _word_view(arr, type_size)
        if w is not None:
            out = np.asarray(_SWAR_UNSHUFFLE[type_size](jnp.asarray(w)))
            return out.view(np.uint8)
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
