"""Extended randomized end-to-end stress: big data, random configs, all APIs.

Not collected by pytest (no test_ prefix) — run directly for soak:
    python tests/stress.py [seconds]
Last full run: 8270 iterations / 7 min, all roundtrips exact.
"""
import os, sys, time, random
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import tpu_blosc as blosc
from tpu_blosc import container

rng = np.random.default_rng(12345)
random.seed(12345)
t_end = time.time() + (int(sys.argv[1]) if len(sys.argv) > 1 else 420)
iters = 0
PATTERNS = ["ramp", "rand", "runs", "sin", "mixed", "sparse"]
while time.time() < t_end:
    iters += 1
    n = int(rng.integers(1, 8_000_000))
    pat = random.choice(PATTERNS)
    if pat == "ramp": data = (np.arange(n) % 9973).astype(np.uint8).tobytes()
    elif pat == "rand": data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    elif pat == "runs": data = np.repeat(rng.integers(0, 256, n//100 + 1, dtype=np.uint8), 100)[:n].tobytes()
    elif pat == "sin": data = (np.sin(np.arange((n+3)//4)*0.01)*1e4).astype(np.float32).tobytes()[:n]
    elif pat == "sparse":
        a = np.zeros(n, np.uint8); idx = rng.integers(0, n, max(n//50, 1)); a[idx] = 255
        data = a.tobytes()
    else:
        data = (rng.integers(0, 256, n//2+1, dtype=np.uint8).tobytes() + bytes(n))[:n]
    codec = random.choice([blosc.LZ4, blosc.LZ4HC, blosc.SNAPPY, blosc.ZLIB, blosc.ZSTD])
    shuffle = random.choice([blosc.NOSHUFFLE, blosc.SHUFFLE, blosc.BITSHUFFLE])
    ts = random.choice([1, 2, 3, 4, 7, 8, 16])
    bs = random.choice([0, 4096, 65536, 1<<20])
    level = random.choice([1, 5, 9])
    opts = blosc.Options(codec=codec, level=level, shuffle=shuffle, type_size=ts, block_size=bs)
    api = random.choice(["bytes", "into", "container", "array", "batch"])
    try:
        if api == "batch":
            # split into 1-9 random pieces; batch must equal scalar calls
            cuts = sorted(rng.integers(1, max(n, 2), rng.integers(0, 8)).tolist())
            pieces, prev = [], 0
            for c in cuts + [n]:
                if c > prev:
                    pieces.append(data[prev:c])
                    prev = c
            if not pieces:
                continue
            frames = blosc.compress_batch_with_options(pieces, opts)
            assert frames == [blosc.compress_with_options(p, opts) for p in pieces]
            assert blosc.decompress_batch(frames) == pieces, ("batch", pat, codec, shuffle, ts, bs)
            outs = [bytearray(len(p)) for p in pieces]
            assert blosc.decompress_batch_into(frames, outs) == [len(p) for p in pieces]
            assert [bytes(o) for o in outs] == pieces
            continue
        if api == "container" and n > 1000:
            frame = container.compress_container(data, opts, frame_limit=max(n//3, 1024))
        elif api == "array" and n >= 4 and codec in (blosc.LZ4, blosc.LZ4HC) and ts in (2,4,8):
            m = (len(data) // ts) * ts
            if m == 0: continue
            arr = jnp.asarray(np.frombuffer(data[:m], dtype=f"uint{8*ts}" if ts in (2,4,8) else np.uint8))
            frame = blosc.compress_array(arr, opts, strategy=random.choice(["transfer", "rle"]))
            data = data[:m]
        else:
            frame = blosc.compress_with_options(data, opts)
        if api == "into":
            out = bytearray(len(data) + 7)
            got = blosc.decompress_into(frame, out)
            assert got == len(data) and bytes(out[:got]) == data, ("into", pat, codec, shuffle, ts, bs)
        else:
            assert blosc.decompress(frame) == data, (api, pat, codec, shuffle, ts, bs, n)
    except AssertionError:
        raise
print(f"stress complete: {iters} iterations, all roundtrips exact", flush=True)
