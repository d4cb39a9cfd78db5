"""Round-5 probe: ts=8/16 byte shuffle via XLA-level word deinterleave
feeding the proven ts<=4 byte-plane Pallas kernels (VERDICT r4 item 5).

The in-kernel walls are proven dead (pallas_r5_probe.py): Mosaic cannot
compact lane-strided words.  But the even/odd word split can happen at
the XLA level OUTSIDE the kernel — one extra HBM pass — and each half
then needs only within-word byte extraction, which the u8 store unit
packs for free (the ts=4 kernel's 330 GB/s trick).

Expected ceiling: deint pass (r+w = 2n) + kernel pass (r+w = 2n) = 4n
HBM traffic ~= 676/4 = 169 GB/s processed vs SWAR ts=8's 105-111.

Measures (loop-slope, honest fetch discipline, 256 MiB):
  0. SWAR ts8 pair baseline (re-measure on today's chip)
  1. deint+reint identity pair (XLA only) — apportions the split cost
     (a) strided slice xw[:, 0::2]   (b) reshape+barrier+minor-pick
  2. full ts8 split+merge pair: deint -> 2-input plane kernel;
     2-output merge kernel -> XLA interleave
  3. ts16 variant (4 streams)
Correctness pinned against the flat-byte transpose oracle.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LN = 512
N = 256 * 1024 * 1024
R = N // 4 // LN
SL = 512


# --- kernels -----------------------------------------------------------

def split2_kernel(e_ref, o_ref, out_ref):
    """2 input word streams -> 8 u8 planes (planes 0-3 from even words,
    4-7 from odd): within-word extraction only."""
    for h, ref in enumerate((e_ref, o_ref)):
        w = ref[...]
        for c in range(4):
            out_ref[4 * h + c] = ((w >> (8 * c)) & 0xFF).astype(jnp.uint8)


def merge2_kernel(p_ref, e_ref, o_ref):
    """8 u8 planes -> 2 word streams (inverse of split2)."""
    for h, ref in enumerate((e_ref, o_ref)):
        w = p_ref[4 * h].astype(jnp.uint32)
        for c in range(1, 4):
            w = w | (p_ref[4 * h + c].astype(jnp.uint32) << (8 * c))
        ref[...] = w


def split4_kernel(a_ref, b_ref, c_ref, d_ref, out_ref):
    for h, ref in enumerate((a_ref, b_ref, c_ref, d_ref)):
        w = ref[...]
        for c in range(4):
            out_ref[4 * h + c] = ((w >> (8 * c)) & 0xFF).astype(jnp.uint8)


def merge4_kernel(p_ref, a_ref, b_ref, c_ref, d_ref):
    for h, ref in enumerate((a_ref, b_ref, c_ref, d_ref)):
        w = p_ref[4 * h].astype(jnp.uint32)
        for c in range(1, 4):
            w = w | (p_ref[4 * h + c].astype(jnp.uint32) << (8 * c))
        ref[...] = w


# --- composed ts8 ------------------------------------------------------

def deint_slice(xw):
    return xw[:, 0::2], xw[:, 1::2]


def deint_barrier(xw):
    t = jax.lax.optimization_barrier(xw.reshape(R, LN // 2, 2))
    return t[..., 0], t[..., 1]


@functools.partial(jax.jit, static_argnums=(1,))
def ts8_split(xw, mode):
    e, o = deint_slice(xw) if mode == "slice" else deint_barrier(xw)
    half = LN // 2
    return pl.pallas_call(
        split2_kernel,
        out_shape=jax.ShapeDtypeStruct((8, R, half), jnp.uint8),
        grid=(R // SL,),
        in_specs=[
            pl.BlockSpec((SL, half), lambda i: (i, 0)),
            pl.BlockSpec((SL, half), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, SL, half), lambda i: (0, i, 0)),
    )(e, o)


@jax.jit
def ts8_merge(planes):
    half = LN // 2
    e, o = pl.pallas_call(
        merge2_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((R, half), jnp.uint32),
            jax.ShapeDtypeStruct((R, half), jnp.uint32),
        ],
        grid=(R // SL,),
        in_specs=[pl.BlockSpec((8, SL, half), lambda i: (0, i, 0))],
        out_specs=[
            pl.BlockSpec((SL, half), lambda i: (i, 0)),
            pl.BlockSpec((SL, half), lambda i: (i, 0)),
        ],
    )(planes)
    return jnp.stack([e, o], axis=-1).reshape(R, LN)


@functools.partial(jax.jit, static_argnums=(1,))
def ts16_split(xw, mode):
    q = LN // 4
    if mode == "slice":
        parts = [xw[:, k::4] for k in range(4)]
    else:
        t = jax.lax.optimization_barrier(xw.reshape(R, q, 4))
        parts = [t[..., k] for k in range(4)]
    return pl.pallas_call(
        split4_kernel,
        out_shape=jax.ShapeDtypeStruct((16, R, q), jnp.uint8),
        grid=(R // SL,),
        in_specs=[pl.BlockSpec((SL, q), lambda i: (i, 0))] * 4,
        out_specs=pl.BlockSpec((16, SL, q), lambda i: (0, i, 0)),
    )(*parts)


@jax.jit
def ts16_merge(planes):
    q = LN // 4
    parts = pl.pallas_call(
        merge4_kernel,
        out_shape=[jax.ShapeDtypeStruct((R, q), jnp.uint32)] * 4,
        grid=(R // SL,),
        in_specs=[pl.BlockSpec((16, SL, q), lambda i: (0, i, 0))],
        out_specs=[pl.BlockSpec((SL, q), lambda i: (i, 0))] * 4,
    )(planes)
    return jnp.stack(parts, axis=-1).reshape(R, LN)


# --- XLA-only identity pairs -------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def deint_reint(xw, mode):
    e, o = deint_slice(xw) if mode == "slice" else deint_barrier(xw)
    e = jax.lax.optimization_barrier(e)
    o = jax.lax.optimization_barrier(o)
    return jnp.stack([e, o], axis=-1).reshape(R, LN)


# --- SWAR baseline (import the production kernels) ----------------------

import sys
sys.path.insert(0, "/root/repo")
from tpu_blosc.filters.batched import (  # noqa: E402
    _shuffle_batch_dev_u32_ts8,
    _unshuffle_batch_dev_u32_ts8,
    _shuffle_batch_dev_u32_ts16,
    _unshuffle_batch_dev_u32_ts16,
)


def time_loop(body, x, k):
    @jax.jit
    def prog(a):
        return jax.lax.fori_loop(0, k, lambda i, a: body(a), a)

    r = prog(x)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = prog(x)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(body, x, lo=4, hi=20):
    t_lo, t_hi = time_loop(body, x, lo), time_loop(body, x, hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    print("device:", jax.devices())
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 2**32, (R, LN), dtype=np.uint32)
    xw = jax.device_put(raw)
    jax.block_until_ready(xw)
    np.asarray(xw[0, :8])  # honest-timing sync

    # correctness first (ts8)
    got = np.asarray(ts8_split(xw, "slice"))
    flat = raw.tobytes()
    exp8 = np.frombuffer(flat, np.uint8).reshape(-1, 8).T  # (8, ne)
    assert np.array_equal(got.reshape(8, -1), exp8), "ts8 split wrong"
    back = np.asarray(ts8_merge(jnp.asarray(got)))
    assert np.array_equal(back, raw), "ts8 merge wrong"
    got16 = np.asarray(ts16_split(xw, "slice"))
    exp16 = np.frombuffer(flat, np.uint8).reshape(-1, 16).T
    assert np.array_equal(got16.reshape(16, -1), exp16), "ts16 split wrong"
    back16 = np.asarray(ts16_merge(jnp.asarray(got16)))
    assert np.array_equal(back16, raw), "ts16 merge wrong"
    got_b = np.asarray(ts8_split(xw, "barrier"))
    assert np.array_equal(got_b, got), "barrier variant differs"
    print("correctness: ts8 + ts16 split/merge == oracle")

    def report(name, per, nbytes_per_op, ops=1):
        print(f"{name}: {ops * nbytes_per_op / per / 1e9:.1f} GB/s "
              f"per-op (per-iter {per * 1e6:.0f} us)")

    # 0. SWAR baselines (pairs)
    per = slope(lambda a: _unshuffle_batch_dev_u32_ts8(
        _shuffle_batch_dev_u32_ts8(a)), xw)
    report("SWAR ts8 pair", per, N, 2)
    per = slope(lambda a: _unshuffle_batch_dev_u32_ts16(
        _shuffle_batch_dev_u32_ts16(a)), xw)
    report("SWAR ts16 pair", per, N, 2)

    # 1. deint/reint identity (XLA only)
    for mode in ("slice", "barrier"):
        per = slope(lambda a, m=mode: deint_reint(a, m), xw)
        report(f"deint+reint [{mode}]", per, N, 2)

    # 2. full ts8 pairs
    for mode in ("slice", "barrier"):
        per = slope(lambda a, m=mode: ts8_merge(ts8_split(a, m)), xw)
        report(f"ts8 split+merge [{mode}]", per, N, 2)

    # 3. ts16 pairs
    for mode in ("slice", "barrier"):
        per = slope(lambda a, m=mode: ts16_merge(ts16_split(a, m)), xw)
        report(f"ts16 split+merge [{mode}]", per, N, 2)


if __name__ == "__main__":
    main()
