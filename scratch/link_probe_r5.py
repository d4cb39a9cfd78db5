"""Round-5 link probe: is a chunked-overlap match pipeline viable?

Questions:
  1. Chunked mask fetch: what does splitting a 32 MB device->host fetch
     into G chunks cost (per-chunk program/sync floor)?
  2. Full-duplex: do a device->host fetch (thread) and a host->device
     upload (main) overlap, or does the tunnel serialize them?
  3. Does a dispatched gather program overlap with a concurrent fetch?
"""

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

M = 1024 * 1024


def main():
    print("device:", jax.devices())
    rng = np.random.default_rng(7)
    mask_host = rng.integers(0, 256, 32 * M, dtype=np.uint8)
    mask_d = jax.device_put(mask_host.reshape(1024, 32 * 1024))
    up_host = rng.integers(0, 65536, 6 * M, dtype=np.uint16)  # 12 MB
    jax.block_until_ready(mask_d)
    np.asarray(mask_d[0, :8])  # honesty sync

    # 1. chunked fetch cost
    for G in (1, 2, 4, 8, 16):
        rows = 1024 // G
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            parts = [
                np.asarray(mask_d[c * rows:(c + 1) * rows])
                for c in range(G)
            ]
            best = min(best, time.perf_counter() - t0)
        tot = sum(p.nbytes for p in parts)
        print(f"fetch 32MB in {G:2d} chunks: {best*1e3:7.1f} ms "
              f"({tot/best/1e6:.0f} MB/s)")

    # 2. full-duplex: fetch 32 MB (thread) while uploading 12 MB (main)
    def fetch_all():
        return np.asarray(mask_d)

    t0 = time.perf_counter()
    _ = fetch_all()
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = jax.device_put(up_host)
    jax.block_until_ready(u)
    t_up = time.perf_counter() - t0
    print(f"serial: fetch {t_fetch*1e3:.0f} ms, upload {t_up*1e3:.0f} ms, "
          f"sum {(t_fetch+t_up)*1e3:.0f} ms")

    with ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.perf_counter()
        fut = ex.submit(fetch_all)
        u = jax.device_put(up_host)
        jax.block_until_ready(u)
        t_up_done = time.perf_counter() - t0
        fut.result()
        t_both = time.perf_counter() - t0
    print(f"concurrent: upload done at {t_up_done*1e3:.0f} ms, "
          f"both done at {t_both*1e3:.0f} ms "
          f"(overlap saves {(t_fetch+t_up-t_both)*1e3:.0f} ms)")

    # 3. gather program concurrent with a fetch
    segs = jax.device_put(
        rng.integers(0, 256, 256 * M, dtype=np.uint8).reshape(1024, 256 * 1024)
    )
    pos = jnp.asarray(
        np.sort(rng.choice(256 * M, 768 * 1024, replace=False)).astype(np.int32)
    )
    jax.block_until_ready((segs, pos))

    @jax.jit
    def gather(s, p):
        return s.reshape(-1)[p]

    g = gather(segs, pos)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    g = gather(segs, pos)
    jax.block_until_ready(g)
    t_g = time.perf_counter() - t0
    print(f"gather program alone: {t_g*1e3:.0f} ms")
    with ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.perf_counter()
        fut = ex.submit(fetch_all)
        g = gather(segs, pos)
        jax.block_until_ready(g)
        t_g_done = time.perf_counter() - t0
        fut.result()
        t_both = time.perf_counter() - t0
    print(f"concurrent: gather done at {t_g_done*1e3:.0f} ms, "
          f"both at {t_both*1e3:.0f} ms (fetch alone {t_fetch*1e3:.0f})")


if __name__ == "__main__":
    main()
