"""Scatter fixed-cost origin + real-u64 + plane-extract fill timings."""

import time

import jax
import jax.numpy as jnp
import numpy as np

total = 256 * 1024 * 1024


def timeit(fn, *a, reps=5):
    r = fn(*a)
    jax.block_until_ready(r)
    f = r[0] if isinstance(r, tuple) else r
    np.asarray(f.reshape(-1)[:8])  # honest-timing sync (CLAUDE.md)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def make(nupd, grid, dtype=jnp.uint16):
    rng = np.random.default_rng(3)
    pos = np.sort(rng.choice(grid, nupd, replace=False)).astype(np.int32)
    vals = (pos & 0xFF).astype(np.uint8)
    dp, dv = jax.device_put(pos), jax.device_put(vals)
    jax.block_until_ready((dp, dv))

    @jax.jit
    def scat(p, v):
        return jnp.zeros(grid, dtype).at[p].set(
            v.astype(dtype), mode="drop", unique_indices=True,
            indices_are_sorted=True,
        )

    return scat, dp, dv


def main():
    # fixed-cost origin: vary grid size at fixed update count
    for grid in (total, total // 4, total // 16, total // 64):
        scat, dp, dv = make(1_000_000, grid)
        t = timeit(scat, dp, dv)
        print(f"grid {grid / 2**20:6.0f} MiB-el, 1M upd: {t * 1e3:6.1f} ms")
    # update scaling at full grid
    for n in (100_000, 1_000_000, 4_000_000, 8_000_000):
        scat, dp, dv = make(n, total)
        t = timeit(scat, dp, dv)
        print(f"grid full, {n:8d} upd: {t * 1e3:6.1f} ms ({t / n * 1e9:.1f} ns/upd)")

    # real u64 4-key coalesced scatter under enable_x64
    with jax.enable_x64(True):
        rng = np.random.default_rng(5)
        nw = 1_965_000
        w = np.sort(rng.choice(total // 4, nw, replace=False)).astype(np.int64)
        k = rng.integers(0, 2**63, nw).astype(np.uint64)
        dw, dk = jax.device_put(w), jax.device_put(k)
        jax.block_until_ready((dw, dk))

        @jax.jit
        def scat64(p, v):
            return jnp.zeros(total // 4, jnp.uint64).at[p].set(
                v, mode="drop", unique_indices=True, indices_are_sorted=True
            )

        t = timeit(scat64, dw, dk)
        print(f"u64 scatter {nw} upd: {t * 1e3:.1f} ms")

    # u32 2-key coalesced (no x64 needed): 3.93M updates
    scat, dp, dv = make(3_930_000, total // 2, jnp.uint32)
    t = timeit(scat, dp, dv)
    print(f"u32 scatter 3.93M upd: {t * 1e3:.1f} ms")

    # plane-extract fill from a u32 grid (2 u16 keys per word), d=256
    d = 256
    m = total // d
    g32 = jnp.zeros(total // 2, jnp.uint32)
    g32 = jax.device_put(np.random.default_rng(1).integers(
        0, 2**31, total // 2, np.uint32))
    jax.block_until_ready(g32)

    @jax.jit
    def fill_planes2(g):
        gr = g.reshape(m, d // 2)
        idx = (jnp.arange(m, dtype=jnp.int32)[:, None] + 1) << 8
        outs = []
        for c in range(2):
            pc = ((gr >> (16 * c)) & 0xFFFF).astype(jnp.int32)
            key = jnp.where(pc != 0, idx | (pc & 0xFF), 0)
            key = jax.lax.cummax(key, axis=0)
            outs.append((key & 0xFF).astype(jnp.uint8))
        return tuple(outs)

    t = timeit(fill_planes2, g32)
    print(f"fill 2x extracted planes (one-level, m={m}): {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
