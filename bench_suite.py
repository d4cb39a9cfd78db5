"""Full benchmark suite over the BASELINE.json configs.

Prints one JSON line per config (bench.py remains the driver's single
headline line).  Run: python bench_suite.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import tpu_blosc as blosc
from tpu_blosc.options import Options


def _best(fn, reps=5):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def run_config(name, data, opts, reps=5):
    n = len(data)
    comp = blosc.compress_with_options(data, opts)  # warmup
    blosc.decompress(comp)
    t_c, comp = _best(lambda: blosc.compress_with_options(data, opts), reps)
    t_d, out = _best(lambda: blosc.decompress(comp), reps)
    assert out == data
    return {
        "config": name,
        "bytes": n,
        "compress_gbps": round(n / t_c / 1e9, 3),
        "decompress_gbps": round(n / t_d / 1e9, 3),
        "ratio": round(n / len(comp), 2),
    }


def main():
    results = []

    # config 1: 1 MiB f32 ramp, LZ4-5, byte shuffle, ts 4
    data = np.arange(262144, dtype=np.float32).tobytes()
    results.append(run_config("1MB_f32_lz4_shuffle", data, Options(), reps=20))

    # 4 MiB single-block: top of the segment-parallel frame range
    data = np.arange(1024 * 1024, dtype=np.float32).tobytes()
    results.append(run_config("4MB_f32_lz4_shuffle_single_block", data,
                              Options(), reps=12))

    # BloscLZ (codec 0, our extension) on the same 4 MiB single-block shape
    results.append(run_config(
        "4MB_f32_blosclz_shuffle_single_block", data,
        Options(codec=blosc.BLOSCLZ), reps=12))

    # config 2: 100 KB mixed, LZ4 + Snappy, no/byte shuffle
    rng = np.random.default_rng(42)
    mixed = np.concatenate(
        [
            (np.sin(np.arange(12800) * 0.01) * 1000).astype(np.float32).view(np.uint8),
            rng.integers(0, 256, 25600, dtype=np.uint8),
            np.frombuffer(b"text payload " * 1750, dtype=np.uint8)[:22800],
        ]
    ).tobytes()
    for codec, shuffle, tag in [
        (blosc.LZ4, blosc.NOSHUFFLE, "100KB_mixed_lz4_noshuffle"),
        (blosc.LZ4, blosc.SHUFFLE, "100KB_mixed_lz4_shuffle"),
        (blosc.SNAPPY, blosc.NOSHUFFLE, "100KB_mixed_snappy_noshuffle"),
        (blosc.SNAPPY, blosc.SHUFFLE, "100KB_mixed_snappy_shuffle"),
    ]:
        results.append(
            run_config(
                tag, mixed, Options(codec=codec, shuffle=shuffle), reps=30
            )
        )

    # config 3: 64 MiB f64, ZSTD-5, byte shuffle, ts 8, multi-block
    data = (np.arange(8 * 1024 * 1024, dtype=np.float64) * 0.001).tobytes()
    results.append(
        run_config(
            "64MB_f64_zstd_shuffle_ts8",
            data,
            Options(codec=blosc.ZSTD, level=5, type_size=8,
                    block_size=2 * 1024 * 1024),
        )
    )

    # config 4: bitshuffle int16 + f32, LZ4-5
    data = ((np.arange(4 * 1024 * 1024) % 512) - 256).astype(np.int16).tobytes()
    results.append(
        run_config(
            "8MB_int16_lz4_bitshuffle",
            data,
            Options(shuffle=blosc.BITSHUFFLE, type_size=2),
        )
    )
    data = np.linspace(0, 1, 4 * 1024 * 1024, dtype=np.float32).tobytes()
    results.append(
        run_config(
            "16MB_f32_lz4_bitshuffle",
            data,
            Options(shuffle=blosc.BITSHUFFLE, type_size=4),
        )
    )

    # config 5 analogue (single host): 512 MiB f32 via the 64-bit container
    # path; the true 4 GB multi-host ordered gather is exercised by
    # tests/test_container.py (TPU_BLOSC_BIG_TESTS) and dist/mesh.py
    data = np.arange(128 * 1024 * 1024, dtype=np.float32).tobytes()
    from tpu_blosc import container

    n = len(data)
    comp = container.compress_container(
        data, Options(), frame_limit=128 * 1024 * 1024
    )
    t_c, comp = _best(
        lambda: container.compress_container(
            data, Options(), frame_limit=128 * 1024 * 1024
        ),
        3,
    )
    t_d, out = _best(lambda: blosc.decompress(comp), 3)
    assert out == data
    results.append(
        {
            "config": "512MB_f32_container",
            "bytes": n,
            "compress_gbps": round(n / t_c / 1e9, 3),
            "decompress_gbps": round(n / t_d / 1e9, 3),
            "ratio": round(n / len(comp), 2),
        }
    )

    # batch API: 64 x 100 KB ramp frames per call (the reference's own
    # benchmark payload), aggregate GB/s — the sub-256 KiB regime's
    # all-cores path (whole-frame SpinPool slices; see BASELINE.md)
    db = bytes(bytearray(i % 256 for i in range(100 * 1024)))
    items = [db] * 64
    nb = len(db) * 64
    frames = blosc.compress_batch(items)
    t_c, frames = _best(lambda: blosc.compress_batch(items), 10)
    t_d, back = _best(lambda: blosc.decompress_batch(frames), 10)
    assert back == items
    results.append(
        {
            "config": "batch_64x100KB_lz4_shuffle",
            "bytes": nb,
            "compress_gbps": round(nb / t_c / 1e9, 3),
            "decompress_gbps": round(nb / t_d / 1e9, 3),
            "ratio": round(nb / sum(len(f) for f in frames), 2),
        }
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
