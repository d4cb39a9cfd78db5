"""Window-scatter probe: does lax.scatter with update_window_dims keep the
~6 ns/update marginal cost?  If yes, run-coalesced literal scatters divide
the records-decode scatter time by the window width."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

total = 256 * 1024 * 1024


def timeit(fn, *a, reps=5):
    r = fn(*a)
    jax.block_until_ready(r)
    np.asarray(r.reshape(-1)[:8])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def probe(W, nupd):
    rng = np.random.default_rng(W)
    idx = np.sort(
        rng.choice(total // W, nupd, replace=False)
    ).astype(np.int32) * W
    upd = rng.integers(0, 2**15, (nupd, W)).astype(np.uint16) | 0x100
    di = jax.device_put(idx[:, None])
    du = jax.device_put(upd)
    jax.block_until_ready((di, du))

    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )

    @jax.jit
    def scat(i, u):
        return lax.scatter(
            jnp.zeros(total, jnp.uint16), i, u, dn,
            indices_are_sorted=True, unique_indices=True,
            mode=lax.GatherScatterMode.FILL_OR_DROP,
        )

    t = timeit(scat, di, du)
    print(
        f"W={W:2d} {nupd:8d} upd ({nupd * W / 1e6:5.1f}M bytes): "
        f"{t * 1e3:6.1f} ms  ({(t) / nupd * 1e9:6.1f} ns/upd)"
    )


def main():
    probe(1, 8_000_000)
    probe(2, 4_000_000)
    probe(4, 2_000_000)
    probe(8, 1_000_000)
    probe(16, 500_000)
    probe(8, 1_500_000)


if __name__ == "__main__":
    main()
