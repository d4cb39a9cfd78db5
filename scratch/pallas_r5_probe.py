"""Round-4 session-2 probe: in-kernel dtype reinterpretation on Mosaic.

The ts=8/16 byte-plane split/merge chains need one reinterpret between
passes (split pass 2 must read pass-1 u8 planes as u16; merge pass B must
read u16 intermediates as u8).  Candidates:
  A. pltpu.bitcast(value, dtype)      (sublane-dim semantics? linear?)
  B. lax.bitcast_convert_type + minor (…, 2) reshape (linear by def)
Each case: does it lower, and WHAT byte order does it produce.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SL, LN = 8, 512


def run_case(name, kern, x, out_shape):
    try:
        fn = pl.pallas_call(kern, out_shape=out_shape)
        y = np.asarray(jax.jit(fn)(x))
        return name, "ok", y
    except Exception as e:  # noqa: BLE001
        return name, f"FAIL {type(e).__name__}: {str(e)[:200]}", None


rng = np.random.default_rng(0)
x16 = rng.integers(0, 1 << 16, (SL, LN), dtype=np.uint16)
x8 = x16.view(np.uint8).reshape(SL, 2 * LN)  # linear byte view per row


# --- A1: pltpu.bitcast u16 -> u8 -------------------------------------------
def k_a1(x_ref, o_ref):
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.uint8)


# try both candidate output shapes
for shp in [(2 * SL, LN), (SL, 2 * LN)]:
    name, st, y = run_case(
        f"A1 pltpu.bitcast u16->u8 out{shp}",
        k_a1,
        jnp.asarray(x16),
        jax.ShapeDtypeStruct(shp, jnp.uint8),
    )
    print(name, st)
    if y is not None:
        lin = x16.view(np.uint8).reshape(shp)
        # sublane-interleave candidate: out[2s+k, l] = byte k of in[s, l]
        subl = np.zeros((2 * SL, LN), np.uint8)
        subl[0::2, :] = (x16 & 0xFF).astype(np.uint8)
        subl[1::2, :] = (x16 >> 8).astype(np.uint8)
        print("   linear?", np.array_equal(y.reshape(-1), x16.view(np.uint8).reshape(SL, -1).reshape(-1)),
              " sublane-interleave?", y.shape == subl.shape and np.array_equal(y, subl))
        # also: grouped-sublane candidate out[s, :] , out[s+SL, :]
        grp = np.concatenate([(x16 & 0xFF).astype(np.uint8), (x16 >> 8).astype(np.uint8)], 0)
        if y.shape == grp.shape:
            print("   grouped-halves?", np.array_equal(y, grp))


# --- A2: pltpu.bitcast u8 -> u16 -------------------------------------------
def k_a2(x_ref, o_ref):
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.uint16)


for shp in [(SL // 2, 2 * LN), (SL, LN)]:
    name, st, y = run_case(
        f"A2 pltpu.bitcast u8->u16 out{shp}",
        k_a2,
        jnp.asarray(x8),
        jax.ShapeDtypeStruct(shp, jnp.uint16),
    )
    print(name, st)
    if y is not None:
        print("   roundtrip-linear?", np.array_equal(y.reshape(-1), x8.reshape(-1).view(np.uint16)))
        # sublane-pair candidate: out[s, l] = in[2s, l] | in[2s+1, l]<<8
        sp = (x8[0::2, :].astype(np.uint16) | (x8[1::2, :].astype(np.uint16) << 8))
        if y.shape == sp.shape:
            print("   sublane-pair?", np.array_equal(y, sp))


# --- B1: lax.bitcast_convert_type u16 -> (…,2) u8 + reshape ----------------
def k_b1(x_ref, o_ref):
    v = jax.lax.bitcast_convert_type(x_ref[:], jnp.uint8)  # (SL, LN, 2)
    o_ref[:] = v.reshape(SL, 2 * LN)


name, st, y = run_case(
    "B1 lax.bitcast u16->(..2)u8 reshape",
    k_b1,
    jnp.asarray(x16),
    jax.ShapeDtypeStruct((SL, 2 * LN), jnp.uint8),
)
print(name, st)
if y is not None:
    print("   linear?", np.array_equal(y, x16.view(np.uint8).reshape(SL, 2 * LN)))


# --- B2: reshape (…,2) + lax.bitcast u8 -> u16 ------------------------------
def k_b2(x_ref, o_ref):
    v = x_ref[:].reshape(SL, LN, 2)
    o_ref[:] = jax.lax.bitcast_convert_type(v, jnp.uint16)


name, st, y = run_case(
    "B2 reshape+lax.bitcast u8->u16",
    k_b2,
    jnp.asarray(x8),
    jax.ShapeDtypeStruct((SL, LN), jnp.uint16),
)
print(name, st)
if y is not None:
    print("   linear?", np.array_equal(y, x16))
