"""ZLIB encode design space at the 1 MiB bench config:
serial libz-5 vs pigz-layout levels vs libdeflate levels (speed + size).
All single-thread numbers; the pool multiplies by ~3.5 on 4 cores.
"""

import ctypes
import time
import zlib

import numpy as np

LD = ctypes.CDLL("libdeflate.so.0")
LD.libdeflate_alloc_compressor.restype = ctypes.c_void_p
LD.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
LD.libdeflate_deflate_compress.restype = ctypes.c_size_t
LD.libdeflate_deflate_compress.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.c_size_t,
]


def fixtures():
    rng = np.random.default_rng(1)
    ramp = np.arange(262144, dtype=np.float32)
    noisy = (np.arange(262144, dtype=np.float32)
             + rng.random(262144).astype(np.float32))
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"compression"]
    text = b" ".join(words[i % 6] for i in rng.integers(0, 6, 200000))[:2**20]
    import tpu_blosc.filters.reference as ref
    return {
        "ramp_shuf": bytes(ref.shuffle_bytes(ramp.tobytes(), 4)),
        "noisy_shuf": bytes(ref.shuffle_bytes(noisy.tobytes(), 4)),
        "text": text,
    }


def best(fn, reps=7):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        b = min(b, time.perf_counter() - t0)
    return b, r


def pigz(data, level, segn=4):
    """Python model of the native pigz layout (sizes exact, speed ~model)."""
    n = len(data)
    seg = -(-n // segn)
    out = []
    for t in range(segn):
        lo, hi = t * seg, min(n, (t + 1) * seg)
        if lo >= hi:
            continue
        c = zlib.compressobj(level, zlib.DEFLATED, -15, 8)
        if lo > 0:
            c = zlib.compressobj(level, zlib.DEFLATED, -15, 8,
                                 zlib.Z_DEFAULT_STRATEGY, data[lo - 32768:lo])
        body = c.compress(data[lo:hi])
        body += c.flush(zlib.Z_FINISH if hi == n else zlib.Z_SYNC_FLUSH)
        out.append(body)
    return b"".join(out)


def main():
    for name, data in fixtures().items():
        n = len(data)
        t, ser = best(lambda: zlib.compress(data, 5))
        print(f"{name}: serial libz-5  {n / t / 1e9:5.2f} GB/s  {len(ser)} B")
        base = len(ser)
        for lv in (5, 4, 3, 2, 1):
            t, out = best(lambda: pigz(data, lv))
            print(f"  pigz-{lv} (1-thread): {n / t / 1e9:5.2f} GB/s  "
                  f"{len(out)} B ({(len(out) - base) / base * 100:+.1f}%)")
        for lv in (1, 3, 5, 6, 7, 9):
            comp = LD.libdeflate_alloc_compressor(lv)
            cap = n + 1024
            buf = ctypes.create_string_buffer(cap)
            t, sz = best(lambda: LD.libdeflate_deflate_compress(
                comp, data, n, buf, cap))
            print(f"  libdeflate-{lv} raw: {n / t / 1e9:5.2f} GB/s  "
                  f"{sz} B ({(sz - base) / base * 100:+.1f}%)")


if __name__ == "__main__":
    main()
