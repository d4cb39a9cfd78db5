"""tpu_blosc benchmark — prints ONE JSON line for the driver.

Headline metric: end-to-end shuffle+LZ4 chunked compress throughput on the
BASELINE config-3-style input (64 MiB f32 ramp, level 5, byte shuffle,
typeSize 4) — directly comparable to the reference's published LZ4
compress number (3.31 GB/s on Apple M3 Max, README.md:119; BASELINE.md).

Extra fields report decompress throughput, the device (TPU) filter
throughput, compression ratio, and backend details; the single required
schema keys are metric/value/unit/vs_baseline.
"""

from __future__ import annotations

import json
import os
import signal

import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# Watchdog: the TPU tunnel can hang indefinitely (observed: device_put of
# 4 KB stuck >2 min) and a jax backend init hang would stall even the
# import below.  Whatever happens, the driver gets ONE JSON line: the
# watchdog prints the best record collected so far and exits.
# ---------------------------------------------------------------------------
_RECORD = {
    "metric": "shuffle_lz4_compress_throughput",
    "value": 0.0,
    "unit": "GB/s",
    "vs_baseline": 0.0,
    "watchdog": "fired before host bench completed",
}


def _watchdog(signum, frame):  # pragma: no cover - only fires on hangs
    print(json.dumps(_RECORD), flush=True)
    os._exit(0)


signal.signal(signal.SIGALRM, _watchdog)
signal.alarm(1200)


def _run_with_timeout(fn, seconds: float):
    """Run fn() on a daemon thread; {} + error field on timeout/crash.

    Device benches go through here so a hung tunnel costs bounded time
    (the stuck thread dies with the process).
    """
    box = {}

    def target():
        try:
            box["result"] = fn()
        except Exception as exc:  # pragma: no cover - defensive
            box["error"] = str(exc)[:100]

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    if "result" in box:
        return box["result"]
    if "error" in box:
        return {"device_error": box["error"]}
    return {"device_error": f"device bench timed out ({seconds:.0f}s)"}


try:  # persistent compiled-program cache: tunnel compiles cost minutes
    import jax as _jax_cfg

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    _jax_cfg.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    _jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax_cfg.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

import tpu_blosc as blosc
from tpu_blosc.options import Options

BASELINE_LZ4_COMPRESS_GBPS = 3.310  # reference README.md:119
N = 64 * 1024 * 1024
BLOCK = 1024 * 1024  # matches DEFAULT_AUTO_BLOCK (L2-resident sweet spot)
# best-of-N against the shared host's run-to-run variance (±30% observed)
REPS = 9


def _best(fn, reps=REPS):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, out


def bench_host_pipeline() -> dict:
    data = np.arange(N // 4, dtype=np.float32).tobytes()
    opts = Options(block_size=BLOCK)  # LZ4, level 5, SHUFFLE, ts 4

    # warmup
    comp = blosc.compress_with_options(data, opts)
    blosc.decompress(comp)

    t_comp, comp = _best(lambda: blosc.compress_with_options(data, opts))
    t_dec, out = _best(lambda: blosc.decompress(comp))
    assert out == data, "roundtrip failed"
    return {
        "compress_gbps": N / t_comp / 1e9,
        "decompress_gbps": N / t_dec / 1e9,
        "ratio": N / len(comp),
    }


def bench_device_filter() -> dict:
    """Device (TPU) batched shuffle throughput — the Pallas/XLA kernel path."""
    try:
        import jax

        from tpu_blosc.filters import batched as fb

        if jax.default_backend() == "cpu":
            return {}
        arr = jax.device_put(
            np.arange(N // 4, dtype=np.int32)
            .view(np.uint8)
            .reshape(N // BLOCK, BLOCK)
        )
        fn = fb._shuffle_batch_dev
        r = fn(arr, 4)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            r = fn(arr, 4)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        bit = fb._bit_shuffle_batch_dev
        r = bit(arr, 4)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = bit(arr, 4)
        jax.block_until_ready(r)
        dt_bit = (time.perf_counter() - t0) / reps
        return {
            "device_shuffle_gbps": N / dt / 1e9,
            "device_bitshuffle_gbps": N / dt_bit / 1e9,
            "device": jax.devices()[0].device_kind,
        }
    except Exception as exc:  # pragma: no cover - device bench is best-effort
        return {"device_error": str(exc)[:100]}


def bench_device_match() -> dict:
    """Device match-discovery codec vs plain transfer on 256 MiB of
    dense-but-compressible f32 (tiled pattern + 1% noise): the data the
    RLE strategy can't help, the BASELINE north-star dense-segment case."""
    try:
        import jax

        if jax.default_backend() == "cpu":
            return {}
        from tpu_blosc import device as tbdev

        rng = np.random.default_rng(5)
        n_el = 64 * 1024 * 1024  # 256 MiB of f32
        pattern = rng.random(256).astype(np.float32)
        data = np.tile(pattern, n_el // 256)
        hit = rng.choice(data.size, data.size // 100, replace=False)
        data[hit] += rng.random(hit.size).astype(np.float32) * 0.01
        x = jax.device_put(data)
        jax.block_until_ready(x)
        opts = Options(block_size=BLOCK)
        t_match, fm = _best(
            lambda: tbdev.compress_array(x, opts, strategy="match"), reps=3
        )
        t_xfer, ft = _best(
            lambda: tbdev.compress_array(x, opts, strategy="transfer"), reps=2
        )
        assert blosc.decompress(fm) == blosc.decompress(ft)
        return {
            "device_match_s": round(t_match, 2),
            "device_transfer_s": round(t_xfer, 2),
            "device_match_speedup": round(t_xfer / t_match, 2),
        }
    except Exception as exc:  # pragma: no cover - device bench best-effort
        return {"device_match_error": str(exc)[:100]}


def main() -> None:
    host = bench_host_pipeline()
    value = round(host["compress_gbps"], 3)
    _RECORD.update({
        "value": value,
        "vs_baseline": round(value / BASELINE_LZ4_COMPRESS_GBPS, 3),
        "decompress_gbps": round(host["decompress_gbps"], 3),
        "ratio": round(host["ratio"], 1),
        "backend": blosc.backend_name(),
    })
    _RECORD["watchdog"] = "fired during device benches (host numbers valid)"
    device = _run_with_timeout(bench_device_filter, 180)
    device.update(_run_with_timeout(bench_device_match, 420))
    _RECORD.update(
        {k: (round(v, 1) if isinstance(v, float) else v)
         for k, v in device.items()}
    )
    del _RECORD["watchdog"]
    signal.alarm(0)
    print(json.dumps(_RECORD))


if __name__ == "__main__":
    main()
