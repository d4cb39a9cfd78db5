"""Golden compressed-size pins for the BASELINE configs (VERDICT r1 item 7).

The "compressed size ≤ go-blosc" claim cannot be measured directly (no Go
toolchain in this environment), so parity is asserted via format identity
(golden byte-level frames in test_golden.py) plus these size pins: any
encoder regression that inflates ratios on the BASELINE configs fails
here.  LZ4/LZ4HC/Snappy streams come from our own deterministic encoders
(exact pins); ZLIB/ZSTD come from system libraries whose bytes may change
across library versions (ceiling pins with headroom).
"""

import os

import numpy as np
import pytest

import tpu_blosc as blosc

pytestmark = pytest.mark.skipif(
    os.environ.get("TPU_BLOSC_NO_NATIVE") or os.environ.get("TPU_BLOSC_FORCE_NUMPY"),
    reason="pure-Python codecs are too slow for the MB-size golden configs",
)

# exact sizes from our own deterministic encoders
# (2026-08-17, DEFAULT_AUTO_BLOCK = 1 MiB)
# The 1 MiB single-block pins moved +0.7% / +0.13% when the segment-
# parallel frame encoder landed (matches cannot cross the 4 deterministic
# segment cuts; see tpublosc.cpp lz4_frame_parallel) — a deliberate
# size-for-4x-threads trade that keeps the stream valid for any LZ4
# block decoder and byte-identical across thread counts.
EXACT = {
    "1MB_f32_lz4_shuffle": 13252,
    # unchanged in round 4: the fused small-frame path is shuffle-ts4-only
    # (contiguous noshuffle segments measured SLOWER — unbalanced slices;
    # see tpb_compress_frame), so noshuffle frames stay serial
    "100KB_mixed_lz4_noshuffle": 50218,
    "100KB_mixed_snappy": 52164,
    "8MB_int16_lz4_bitshuffle": 39564,
    # round 3: the fixed-offset scan encoder engages on this config (one
    # shared offset beats greedy's per-position churn) — 16% smaller
    "16MB_f32_lz4_bitshuffle": 3166358,
    "64MB_f32_lz4_shuffle": 539719,
    "1MB_f32_lz4hc9": 13315,
    # BloscLZ (codec 0, our extension; 2026-08-18): 6.5% smaller than LZ4
    # on the 64 MB ramp (shorter match tokens), 9% larger on the 1 MiB
    # single-block shape (32-byte literal runs) — both deterministic
    "1MB_f32_blosclz_shuffle": 14465,
    "64MB_f32_blosclz_shuffle": 504835,
}

# system-library codecs: assert we never regress past these ceilings
CEILING = {
    "64MB_f64_zstd_shuffle_ts8": 520_000,   # measured 470649
    "1MB_f32_zlib5": 9_000,                 # measured 7896
    "1MB_f32_zstd5": 5_500,                 # measured 4398
}


def _mixed_100kb() -> bytes:
    rng = np.random.default_rng(1234)
    ramp = bytes(bytearray([i % 256 for i in range(50_000)]))
    return ramp + rng.integers(0, 256, 49_550, dtype=np.uint8).tobytes()


def _produce() -> dict[str, int]:
    out = {}
    d1 = np.arange(262144, dtype=np.float32).tobytes()
    out["1MB_f32_lz4_shuffle"] = len(
        blosc.compress(d1, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    )
    out["1MB_f32_lz4hc9"] = len(
        blosc.compress(d1, blosc.LZ4HC, 9, blosc.SHUFFLE, 4)
    )
    out["1MB_f32_zlib5"] = len(
        blosc.compress(d1, blosc.ZLIB, 5, blosc.SHUFFLE, 4)
    )
    out["1MB_f32_zstd5"] = len(
        blosc.compress(d1, blosc.ZSTD, 5, blosc.SHUFFLE, 4)
    )
    mixed = _mixed_100kb()
    out["100KB_mixed_lz4_noshuffle"] = len(
        blosc.compress(mixed, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    )
    out["100KB_mixed_snappy"] = len(
        blosc.compress(mixed, blosc.SNAPPY, 5, blosc.NOSHUFFLE, 1)
    )
    d3 = np.linspace(0, 1000, 8 * 1024 * 1024, dtype=np.float64).tobytes()
    out["64MB_f64_zstd_shuffle_ts8"] = len(
        blosc.compress_with_options(
            d3, blosc.Options(codec=blosc.ZSTD, type_size=8)
        )
    )
    d4 = (np.arange(4 * 1024 * 1024, dtype=np.int16) % 1024).tobytes()
    out["8MB_int16_lz4_bitshuffle"] = len(
        blosc.compress_with_options(
            d4, blosc.Options(shuffle=blosc.BITSHUFFLE, type_size=2)
        )
    )
    d5 = np.linspace(0, 1, 4 * 1024 * 1024, dtype=np.float32).tobytes()
    out["16MB_f32_lz4_bitshuffle"] = len(
        blosc.compress_with_options(
            d5, blosc.Options(shuffle=blosc.BITSHUFFLE, type_size=4)
        )
    )
    d6 = np.arange(16 * 1024 * 1024, dtype=np.float32).tobytes()
    out["64MB_f32_lz4_shuffle"] = len(
        blosc.compress_with_options(d6, blosc.Options())
    )
    out["1MB_f32_blosclz_shuffle"] = len(
        blosc.compress(d1, blosc.BLOSCLZ, 5, blosc.SHUFFLE, 4)
    )
    out["64MB_f32_blosclz_shuffle"] = len(
        blosc.compress_with_options(d6, blosc.Options(codec=blosc.BLOSCLZ))
    )
    return out


def test_golden_compressed_sizes():
    got = _produce()
    mismatches = {
        k: (got[k], want) for k, want in EXACT.items() if got[k] != want
    }
    assert not mismatches, (
        "deterministic encoder output sizes changed (update EXACT only for "
        f"deliberate encoder changes): {mismatches}"
    )
    over = {
        k: (got[k], cap) for k, cap in CEILING.items() if got[k] > cap
    }
    assert not over, f"library-codec sizes regressed past ceilings: {over}"
