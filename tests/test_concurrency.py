"""Concurrent-use safety: the reference documents all functions as safe
for concurrent callers (blosc.go:37-39); this locks in the same contract
for the accelerated paths (per-thread native scratch, single-shot
staging buffers, registry reads)."""

from concurrent.futures import ThreadPoolExecutor

import numpy as np

import tpu_blosc as blosc


def test_concurrent_compress_decompress_threads():
    rng = np.random.default_rng(0)
    datasets = [
        np.arange(50_000 + 1000 * i, dtype=np.float32).tobytes()
        for i in range(8)
    ] + [rng.integers(0, 256, 30_000, np.uint8).tobytes() for _ in range(4)]

    def work(i):
        data = datasets[i % len(datasets)]
        codec = [blosc.LZ4, blosc.ZSTD, blosc.SNAPPY][i % 3]
        frame = blosc.compress(data, codec, 5, blosc.SHUFFLE, 4)
        assert blosc.decompress(frame) == data
        return len(frame)

    with ThreadPoolExecutor(max_workers=8) as ex:
        sizes = list(ex.map(work, range(64)))
    # determinism under concurrency: same input+codec -> same size
    for i in range(64):
        assert sizes[i] == sizes[i % 12] or True
    base = {i % 12: s for i, s in enumerate(sizes)}
    for i, s in enumerate(sizes):
        assert s == base[i % 12]


def test_concurrent_chunked_frames():
    data = np.arange(1_000_000, dtype=np.float32).tobytes()
    opts = blosc.Options(block_size=65536)
    expected = blosc.compress_with_options(data, opts)

    def work(_):
        frame = blosc.compress_with_options(data, opts)
        assert frame == expected  # byte-identical under contention
        assert blosc.decompress(frame) == data
        return True

    with ThreadPoolExecutor(max_workers=6) as ex:
        assert all(ex.map(work, range(24)))


def test_concurrent_streams_distinct_files(tmp_path):
    def work(i):
        p = tmp_path / f"s{i}.tpbs"
        payload = bytes([i]) * 10_000
        with blosc.StreamWriter(p) as w:
            w.write(payload)
        with blosc.StreamReader(p) as r:
            return r.read(0) == payload

    with ThreadPoolExecutor(max_workers=8) as ex:
        assert all(ex.map(work, range(32)))


def test_concurrent_fused_window_decodes():
    """Round-5 fused decode + adaptive dispatcher under thread contention:
    concurrent callers race the SpinPool (nested run() declines via
    try_lock/busy_hint, the loser decodes serially) and the adaptive
    EWMA state is shared — every result must stay bit-exact, whichever
    path each call takes."""
    frames = []
    for k, n in [(3, 100 * 1024), (7, 128 * 1024), (11, 200 * 1024)]:
        data = bytes(bytearray((i * k + (i >> 3)) % 256 for i in range(n)))
        frames.append((blosc.compress(data), data))

    def work(i):
        frame, data = frames[i % len(frames)]
        for _ in range(40):
            if blosc.decompress(frame) != data:
                return False
        return True

    with ThreadPoolExecutor(max_workers=6) as ex:
        assert all(ex.map(work, range(18)))
