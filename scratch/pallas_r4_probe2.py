"""Round-4 Pallas probe, part 2: honest slope timing of the elementwise
byte-plane kernels (probe 1 proved correctness; its timing loop was DCE'd
— constant input let XLA hoist the kernel).  Loop body feeds outputs back
(unshuffle(shuffle(a))) so every iteration depends on the last.

Also: strided lane loads via ref[..., pl.Slice(t, k, 4)] for the ts8/ts16
phase splits, and a ts8 kernel built on them.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LN = 512
N = 64 * 1024 * 1024
SL = 512  # 1 MiB grid tiles


def report(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# --- ts4 pair ---------------------------------------------------------------

def ts4_kernel(x_ref, o_ref):
    w = x_ref[...]
    for c in range(4):
        o_ref[c] = ((w >> (8 * c)) & 0xFF).astype(jnp.uint8)


def ts4_un_kernel(p_ref, o_ref):
    w = p_ref[0].astype(jnp.uint32)
    for c in range(1, 4):
        w = w | (p_ref[c].astype(jnp.uint32) << (8 * c))
    o_ref[...] = w


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


# --- strided loads + ts8 ----------------------------------------------------

def strided_kernel(x_ref, o_ref):
    for t in range(4):
        o_ref[t] = x_ref[:, pl.Slice(t, LN // 4, 4)]


@functools.partial(jax.jit, static_argnums=(1,))
def strided_split(xw, sl):
    rows, ln = xw.shape
    return pl.pallas_call(
        strided_kernel,
        out_shape=jax.ShapeDtypeStruct((4, rows, ln // 4), jnp.uint32),
        grid=(rows // sl,),
        in_specs=[pl.BlockSpec((sl, ln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((4, sl, ln // 4), lambda i: (0, i, 0)),
    )(xw)


def ts8_kernel(x_ref, o_ref):
    # elements = u32 word pairs; phase loads a_d[k] = w[2k+d], then plane
    # c = byte (c%4) of a_{c//4} elementwise — u8 stores do the packing
    for d in range(2):
        a = x_ref[:, pl.Slice(d, LN // 2, 2)]
        for cm in range(4):
            o_ref[4 * d + cm] = ((a >> (8 * cm)) & 0xFF).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1,))
def ts8_shuffle(xw, sl):
    rows, ln = xw.shape
    return pl.pallas_call(
        ts8_kernel,
        out_shape=jax.ShapeDtypeStruct((8, rows, ln // 2), jnp.uint8),
        grid=(rows // sl,),
        in_specs=[pl.BlockSpec((sl, ln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, sl, ln // 2), lambda i: (0, i, 0)),
    )(xw)


def check_strided():
    rng = np.random.default_rng(1)
    xw_h = rng.integers(0, 2**32, (8, LN), dtype=np.uint32)
    out = np.asarray(strided_split(jax.device_put(xw_h), 8))
    want = np.stack([xw_h[:, t::4] for t in range(4)])
    assert np.array_equal(out, want)
    return "strided load exact"


def check_ts8():
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, 8 * LN * 4, np.uint8)
    xw = jax.device_put(raw.view(np.uint32).reshape(8, LN))
    out = np.asarray(ts8_shuffle(xw, 8))
    want = raw.reshape(-1, 8).T.reshape(8, 8, LN // 2)
    assert np.array_equal(out, want), "ts8 bytes diverge"
    return "bytes exact"


# --- honest slope: chained pair ----------------------------------------------

def slope_pair(fwd, inv, x, lo=4, hi=16):
    def loop(k):
        @jax.jit
        def prog(a):
            def body(i, a):
                return inv(fwd(a))

            return jax.lax.fori_loop(0, k, body, a)

        r = prog(x)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = prog(x)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = loop(lo), loop(hi)
    per_pair = max((t_hi - t_lo) / (hi - lo), 1e-9)
    return 2 * N / per_pair / 1e9  # per-op GB/s if both ops equal-cost


def main():
    print("device:", jax.devices())
    report("strided load correctness", check_strided)
    report("ts8 shuffle correctness", check_ts8)

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 2**32, (N // 4 // LN, LN), dtype=np.uint32)
    xw = jax.device_put(raw)
    jax.block_until_ready(xw)
    np.asarray(xw[0, :8])

    report(
        "ts4 pair per-op GB/s (slope, 64 MiB)",
        lambda: round(
            slope_pair(
                lambda a: ts4_shuffle(a, SL), lambda p: ts4_unshuffle(p, SL),
                xw,
            ),
            1,
        ),
    )
    # strided-split round trip isn't defined; time it against a cheap
    # inverse-free chain: split then OR the 4 phases back via concat in
    # XLA would relayout — instead chain split with a trivial re-pack
    # kernel is future work; report the one-way slope with xor-feedback.

    def xor_feedback(a):
        s = strided_split(a, SL)
        return a ^ jnp.concatenate([s[0], s[1], s[2], s[3]], axis=1)

    def loop_one(fn, k):
        @jax.jit
        def prog(a):
            return jax.lax.fori_loop(0, k, lambda i, a: fn(a), a)

        r = prog(xw)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = prog(xw)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best

    def slope_one(fn, lo=4, hi=16):
        t_lo, t_hi = loop_one(fn, lo), loop_one(fn, hi)
        per = max((t_hi - t_lo) / (hi - lo), 1e-9)
        return N / per / 1e9

    report(
        "strided split + xla concat xor chain GB/s",
        lambda: round(slope_one(xor_feedback), 1),
    )

    def ts8_chain(a):
        p = ts8_shuffle(a, SL)
        # feedback without an inverse: XOR the first plane into the input
        return a ^ p[0].astype(jnp.uint32)

    report(
        "ts8 shuffle (+feedback overhead) GB/s",
        lambda: round(slope_one(ts8_chain), 1),
    )


if __name__ == "__main__":
    main()
