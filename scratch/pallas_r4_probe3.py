"""Round-4 probe 3: calibrate the 752 GB/s ts4 pair reading.

Suspicion: per-op time ~89 us for 128 MiB traffic would be 1.4 TB/s —
beyond the 819 GB/s HBM.  Calibrate the same loop harness with a known
quantity (elementwise x^const measured ~213 GB/s in round 3) and rerun
the ts4 pair with a wide K spread, printing absolute times.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LN = 512
N = 256 * 1024 * 1024
SL = 512


def ts4_kernel(x_ref, o_ref):
    w = x_ref[...]
    for c in range(4):
        o_ref[c] = ((w >> (8 * c)) & 0xFF).astype(jnp.uint8)


def ts4_un_kernel(p_ref, o_ref):
    w = p_ref[0].astype(jnp.uint32)
    for c in range(1, 4):
        w = w | (p_ref[c].astype(jnp.uint32) << (8 * c))
    o_ref[...] = w


def ew_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] ^ jnp.uint32(0x5A5A5A5A)


@functools.partial(jax.jit, static_argnums=(1,))
def ts4_shuffle(xw, sl):
    rows, ln = xw.shape
    return pl.pallas_call(
        ts4_kernel,
        out_shape=jax.ShapeDtypeStruct((4, rows, ln), jnp.uint8),
        grid=(rows // sl,),
        in_specs=[pl.BlockSpec((sl, ln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((4, sl, ln), lambda i: (0, i, 0)),
    )(xw)


@functools.partial(jax.jit, static_argnums=(1,))
def ts4_unshuffle(planes, sl):
    _, rows, ln = planes.shape
    return pl.pallas_call(
        ts4_un_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, ln), jnp.uint32),
        grid=(rows // sl,),
        in_specs=[pl.BlockSpec((4, sl, ln), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((sl, ln), lambda i: (i, 0)),
    )(planes)


@functools.partial(jax.jit, static_argnums=(1,))
def elementwise(xw, sl):
    rows, ln = xw.shape
    return pl.pallas_call(
        ew_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, ln), jnp.uint32),
        grid=(rows // sl,),
        in_specs=[pl.BlockSpec((sl, ln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((sl, ln), lambda i: (i, 0)),
    )(xw)


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


def slope(body, x, lo, hi):
    t_lo, t_hi = time_loop(body, x, lo), time_loop(body, x, hi)
    per = max((t_hi - t_lo) / (hi - lo), 1e-9)
    return per, t_lo, t_hi


def main():
    print("device:", jax.devices())
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 2**32, (N // 4 // LN, LN), dtype=np.uint32)
    xw = jax.device_put(raw)
    jax.block_until_ready(xw)
    np.asarray(xw[0, :8])

    per, tl, th = slope(lambda a: elementwise(a, SL), xw, 8, 72)
    print(
        f"elementwise xor: {N / per / 1e9:.1f} GB/s "
        f"(per-iter {per * 1e6:.0f} us, t8={tl * 1e3:.1f} ms t72={th * 1e3:.1f} ms)"
    )

    per, tl, th = slope(
        lambda a: ts4_unshuffle(ts4_shuffle(a, SL), SL), xw, 8, 72
    )
    print(
        f"ts4 pair: per-op {2 * N / per / 1e9:.1f} GB/s "
        f"(per-pair {per * 1e6:.0f} us, t8={tl * 1e3:.1f} ms t72={th * 1e3:.1f} ms)"
    )

    # one-way with xor feedback (adds ~1.5 elementwise passes of overhead)
    def fwd_only(a):
        p = ts4_shuffle(a, SL)
        return a ^ p[0].astype(jnp.uint32)

    per, tl, th = slope(fwd_only, xw, 8, 72)
    print(
        f"ts4 shuffle + xor feedback: {N / per / 1e9:.1f} GB/s "
        f"(per-iter {per * 1e6:.0f} us)"
    )

    # sanity: the pair really is an identity (compiler did NOT fold it:
    # pallas_call is opaque, but verify numerics anyway)
    got = np.asarray(ts4_unshuffle(ts4_shuffle(xw, SL), SL)[:2, :8])
    assert np.array_equal(got, raw[:2, :8])
    print("pair identity verified on data")


if __name__ == "__main__":
    main()
