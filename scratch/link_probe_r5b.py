"""Round-5 link probe (take 2): defeat jax's host-copy caching by
producing a FRESH device array per measurement (xor with the rep index).
Interleaved A/B per NOTES discipline."""

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

M = 1024 * 1024


@jax.jit
def fresh(a, k):
    return a ^ k


def main():
    print("device:", jax.devices())
    rng = np.random.default_rng(7)
    mask_host = rng.integers(0, 256, 32 * M, dtype=np.uint8)
    mask_d = jax.device_put(mask_host.reshape(1024, 32 * 1024))
    up_host = rng.integers(0, 65536, 6 * M, dtype=np.uint16)  # 12 MB
    jax.block_until_ready(mask_d)
    np.asarray(mask_d[0, :8])

    results = {G: [] for G in (1, 2, 4, 8)}
    k = 0
    for rep in range(3):
        for G in (1, 2, 4, 8):
            k += 1
            m = fresh(mask_d, jnp.uint8(k % 256))
            jax.block_until_ready(m)
            rows = 1024 // G
            t0 = time.perf_counter()
            parts = [
                np.asarray(m[c * rows:(c + 1) * rows]) for c in range(G)
            ]
            dt = time.perf_counter() - t0
            results[G].append(dt)
            del parts
    for G, ts in results.items():
        b = min(ts)
        print(f"fetch 32MB in {G:2d} chunks: best {b*1e3:7.1f} ms "
              f"({32*M/b/1e6:.0f} MB/s)  all={[f'{t:.2f}' for t in ts]}")

    # full-duplex with FRESH fetch each time
    def timed_fetch():
        nonlocal k
        k += 1
        m = fresh(mask_d, jnp.uint8(k % 256))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        r = np.asarray(m)
        return time.perf_counter() - t0, r

    t_fetch, _ = timed_fetch()
    t0 = time.perf_counter()
    u = jax.device_put(up_host)
    jax.block_until_ready(u)
    t_up = time.perf_counter() - t0
    print(f"serial: fetch {t_fetch*1e3:.0f} ms, upload {t_up*1e3:.0f} ms")

    k += 1
    m2 = fresh(mask_d, jnp.uint8(k % 256))
    jax.block_until_ready(m2)
    up2 = up_host ^ 3
    with ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.perf_counter()
        fut = ex.submit(lambda: np.asarray(m2))
        u = jax.device_put(up2)
        jax.block_until_ready(u)
        t_up_done = time.perf_counter() - t0
        fut.result()
        t_both = time.perf_counter() - t0
    print(f"concurrent: upload done {t_up_done*1e3:.0f} ms, both "
          f"{t_both*1e3:.0f} ms (serial sum {(t_fetch+t_up)*1e3:.0f} ms)")

    # gather program overlapping a fetch
    segs = jax.device_put(
        rng.integers(0, 256, 256 * M, dtype=np.uint8).reshape(1024, -1)
    )
    pos = jnp.asarray(
        np.sort(
            rng.choice(256 * M, 768 * 1024, replace=False)
        ).astype(np.int32)
    )
    jax.block_until_ready((segs, pos))

    @jax.jit
    def gather(s, p):
        return s.reshape(-1)[p]

    g = gather(segs, pos)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    g = gather(segs, pos ^ 0)
    jax.block_until_ready(g)
    t_g = time.perf_counter() - t0
    print(f"gather alone: {t_g*1e3:.0f} ms")
    k += 1
    m3 = fresh(mask_d, jnp.uint8(k % 256))
    jax.block_until_ready(m3)
    with ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.perf_counter()
        fut = ex.submit(lambda: np.asarray(m3))
        g = gather(segs, pos ^ 1)
        jax.block_until_ready(g)
        t_g_done = time.perf_counter() - t0
        fut.result()
        t_both = time.perf_counter() - t0
    print(f"concurrent: gather done {t_g_done*1e3:.0f} ms, both "
          f"{t_both*1e3:.0f} ms (fetch alone was {t_fetch*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
