"""Round-4 Pallas probe: can Mosaic express the byte-shuffle family as
strided loads + byte extracts + narrow stores?

Hypotheses (see filters/pallas_kernels.py experiment record for rounds
2-3):
  A. ts4 shuffle = pure elementwise per plane: o[c] = (w >> 8c) & 0xFF
     stored as a u8 ref — no lane regrouping at all (the XLA SWAR _t4x4
     exists only because XLA-level u8 outputs relayout; a Pallas u8
     STORE does the packing in the store unit).
  B. pl.Slice(start, size, stride) lowers via tpu.strided_load — the
     lane compaction primitive rounds 2-3 never found (ts8/ts16 need
     phase loads at stride 2/4).
  C. pltpu.repeat on the lane axis: element-interleave or tile? (the
     unshuffle ts8/ts16 expansion needs interleave semantics).

Run on the real TPU:  python scratch/pallas_r4_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN = 512


def report(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# --------------------------------------------------------------------------
# A. ts4 shuffle: elementwise byte extract + u8 plane stores
# --------------------------------------------------------------------------

def ts4_kernel(x_ref, o_ref):
    w = x_ref[...]
    for c in range(4):
        o_ref[c] = ((w >> (8 * c)) & 0xFF).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1,))
def ts4_shuffle(xw, sl):
    rows, ln = xw.shape
    grid = rows // sl
    return pl.pallas_call(
        ts4_kernel,
        out_shape=jax.ShapeDtypeStruct((4, rows, ln), jnp.uint8),
        grid=(grid,),
        in_specs=[pl.BlockSpec((sl, ln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((4, sl, ln), lambda i: (0, i, 0)),
    )(xw)


def check_ts4():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 8 * LN * 4, np.uint8)
    xw = jax.device_put(raw.view(np.uint32).reshape(8, LN))
    out = np.asarray(ts4_shuffle(xw, 8))
    want = raw.reshape(-1, 4).T.reshape(4, 8, LN)
    assert np.array_equal(out, want), "ts4 bytes diverge"
    return "bytes exact"


# --------------------------------------------------------------------------
# B. strided lane load
# --------------------------------------------------------------------------

def strided_kernel(x_ref, o_ref):
    for t in range(4):
        a = pl.load(x_ref, (slice(None), pl.Slice(t, LN // 4, 4)))
        o_ref[t] = a


@functools.partial(jax.jit, static_argnums=(1,))
def strided_split(xw, sl):
    rows, ln = xw.shape
    grid = rows // sl
    return pl.pallas_call(
        strided_kernel,
        out_shape=jax.ShapeDtypeStruct((4, rows, ln // 4), jnp.uint32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((sl, ln), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((4, sl, ln // 4), lambda i: (0, i, 0)),
    )(xw)


def check_strided():
    rng = np.random.default_rng(1)
    xw_h = rng.integers(0, 2**32, (8, LN), dtype=np.uint32)
    out = np.asarray(strided_split(jax.device_put(xw_h), 8))
    want = np.stack([xw_h[:, t::4] for t in range(4)])
    assert np.array_equal(out, want), "strided load diverges"
    return "strided load exact"


# --------------------------------------------------------------------------
# C. pltpu.repeat semantics on the lane axis
# --------------------------------------------------------------------------

def repeat_kernel(x_ref, o_ref):
    o_ref[...] = pltpu.repeat(x_ref[...], 4, 1)


@jax.jit
def run_repeat(xw):
    return pl.pallas_call(
        repeat_kernel,
        out_shape=jax.ShapeDtypeStruct((8, LN * 4), jnp.uint32),
        in_specs=[pl.BlockSpec((8, LN), lambda: (0, 0))],
        out_specs=pl.BlockSpec((8, LN * 4), lambda: (0, 0)),
    )(xw)


def check_repeat():
    xw_h = np.arange(8 * LN, dtype=np.uint32).reshape(8, LN)
    out = np.asarray(run_repeat(jax.device_put(xw_h)))
    tiled = np.tile(xw_h, (1, 4))
    inter = np.repeat(xw_h, 4, axis=1)
    if np.array_equal(out, inter):
        return "np.repeat interleave semantics"
    if np.array_equal(out, tiled):
        return "TILE semantics (concat copies)"
    return "UNKNOWN semantics"


# --------------------------------------------------------------------------
# D. ts4 unshuffle: u8 plane loads + widen + pack
# --------------------------------------------------------------------------

def ts4_un_kernel(p_ref, o_ref):
    w = p_ref[0].astype(jnp.uint32)
    for c in range(1, 4):
        w = w | (p_ref[c].astype(jnp.uint32) << (8 * c))
    o_ref[...] = w


@functools.partial(jax.jit, static_argnums=(1,))
def ts4_unshuffle(planes, sl):
    _, rows, ln = planes.shape
    grid = rows // sl
    return pl.pallas_call(
        ts4_un_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, ln), jnp.uint32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((4, sl, ln), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((sl, ln), lambda i: (i, 0)),
    )(planes)


def check_ts4_un():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, 8 * LN * 4, np.uint8)
    planes = jax.device_put(raw.reshape(-1, 4).T.reshape(4, 8, LN).copy())
    out = np.asarray(ts4_unshuffle(planes, 8))
    want = raw.view(np.uint32).reshape(8, LN)
    assert np.array_equal(out, want), "ts4 unshuffle diverges"
    return "bytes exact"


# --------------------------------------------------------------------------
# slope timing at 64 MiB
# --------------------------------------------------------------------------

N = 64 * 1024 * 1024


def slope(fn, x, lo=6, hi=30):
    def loop(k):
        @jax.jit
        def prog(x):
            def body(i, a):
                r = fn(a)
                # feed output back where shapes allow; else re-run on x
                return a

            # simple: run k independent applications via fori on x
            def body2(i, s):
                r = fn(x)
                return s + r.reshape(-1)[0].astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, body2, jnp.uint32(0))

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
    per = max((t_hi - t_lo) / (hi - lo), 1e-9)
    return N / per / 1e9


def main():
    print("device:", jax.devices())
    r = report("A ts4 shuffle correctness", check_ts4)
    report("B strided load correctness", check_strided)
    report("C repeat semantics", check_repeat)
    report("D ts4 unshuffle correctness", check_ts4_un)

    # perf (only for the ones that lowered)
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 2**32, (N // 4 // LN, LN), dtype=np.uint32)
    xw = jax.device_put(raw)
    jax.block_until_ready(xw)
    np.asarray(xw[0, :8])  # honest-timing fetch
    SL = 512  # 1 MiB tiles

    if r is not None:
        report(
            "A ts4 shuffle GB/s (slope, 64 MiB)",
            lambda: round(slope(lambda a: ts4_shuffle(a, SL), xw), 1),
        )
    report(
        "B strided split GB/s (slope, 64 MiB)",
        lambda: round(slope(lambda a: strided_split(a, SL), xw), 1),
    )
    planes = jnp.zeros((4, N // 4 // LN, LN), jnp.uint8)
    jax.block_until_ready(planes)
    report(
        "D ts4 unshuffle GB/s (slope, 64 MiB)",
        lambda: round(slope(lambda a: ts4_unshuffle(a, SL), planes), 1),
    )


if __name__ == "__main__":
    main()
