"""Filter unit tests (≙ reference shuffle_test.go).

Includes a literal, loop-for-loop transcription of the reference algorithms
used once to validate the vectorized NumPy oracle — the same
"generic-implementation-as-oracle" pattern the reference uses for its SIMD
kernels (shuffle_amd64_test.go:152-174).
"""

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc.filters import reference as ref

rng = np.random.default_rng(1234)


# --- literal transcriptions of reference semantics (shuffle.go) ---

def literal_shuffle(src: bytes, ts: int) -> bytes:
    if ts <= 1 or len(src) < ts:
        return bytes(src)
    n = len(src)
    ne = n // ts
    dst = bytearray(n)
    for i in range(ne):
        for j in range(ts):
            dst[j * ne + i] = src[i * ts + j]
    dst[ne * ts :] = src[ne * ts :]
    return bytes(dst)


def literal_bitshuffle(src: bytes, ts: int) -> bytes:
    if ts <= 1 or len(src) < ts:
        return bytes(src)
    n = len(src)
    ne = n // ts
    dst = bytearray(n)
    groups = ne // 8
    for g in range(groups):
        base = g * 8 * ts
        for byte_idx in range(ts):
            bb = [src[base + e * ts + byte_idx] for e in range(8)]
            for out_bit in range(8):
                ob = 0
                for in_byte in range(8):
                    if bb[in_byte] & (1 << (7 - out_bit)):
                        ob |= 1 << (7 - in_byte)
                dst[base + byte_idx * 8 + out_bit] = ob
    dst[groups * 8 * ts :] = src[groups * 8 * ts :]
    return bytes(dst)


SIZES = [0, 1, 2, 7, 8, 13, 16, 28, 32, 35, 64, 100, 127, 128, 1003, 4096, 65539]
TYPE_SIZES = [1, 2, 3, 4, 5, 8, 16, 32]


@pytest.mark.parametrize("ts", TYPE_SIZES)
@pytest.mark.parametrize("n", SIZES)
def test_numpy_oracle_matches_literal_shuffle(n, ts):
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert ref.shuffle_bytes(data, ts).tobytes() == literal_shuffle(data, ts)
    assert ref.bit_shuffle(data, ts).tobytes() == literal_bitshuffle(data, ts)


@pytest.mark.parametrize("ts", TYPE_SIZES)
@pytest.mark.parametrize("n", SIZES)
def test_oracle_roundtrip(n, ts):
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert ref.unshuffle_bytes(ref.shuffle_bytes(data, ts), ts).tobytes() == data
    assert ref.bit_unshuffle(ref.bit_shuffle(data, ts), ts).tobytes() == data


@pytest.mark.parametrize("ts", [2, 4, 8])
def test_shuffle_semantics_example(ts):
    # [A0..][B0..][C0..] -> [A0 B0 C0][A1 B1 C1]... (shuffle.go:14-15)
    ne = 3
    data = bytes(range(ne * ts))
    out = ref.shuffle_bytes(data, ts).tobytes()
    expected = bytes(i * ts + j for j in range(ts) for i in range(ne))
    assert out == expected


def test_noop_contracts():
    # typeSize<=1 or len<typeSize → identity (shuffle.go:17-19)
    data = bytes(range(40))
    assert ref.shuffle_bytes(data, 1).tobytes() == data
    assert ref.shuffle_bytes(data, 0).tobytes() == data
    assert ref.shuffle_bytes(b"ab", 4).tobytes() == b"ab"
    assert ref.bit_shuffle(data, 1).tobytes() == data
    assert ref.bit_shuffle(b"abc", 8).tobytes() == b"abc"


def test_length_preservation():
    for n in [13, 28, 35, 1003]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for ts in [2, 4, 8]:
            assert ref.shuffle_bytes(data, ts).size == n
            assert ref.bit_shuffle(data, ts).size == n


def test_bitshuffle_partial_group_copied_verbatim():
    # 13 elements of ts=4: one full group of 8, 5 elements copied untransposed
    ts = 4
    data = rng.integers(0, 256, 13 * ts, dtype=np.uint8).tobytes()
    out = ref.bit_shuffle(data, ts).tobytes()
    assert out[8 * ts :] == data[8 * ts :]
    assert out[: 8 * ts] != data[: 8 * ts]  # (with overwhelming probability)


def test_dispatch_matches_oracle():
    from tpu_blosc import filters

    for n in [64, 1003, 300000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for ts in [2, 4, 8]:
            assert (
                filters.shuffle_bytes(data, ts).tobytes()
                == ref.shuffle_bytes(data, ts).tobytes()
            )
            assert (
                filters.bit_shuffle(data, ts).tobytes()
                == ref.bit_shuffle(data, ts).tobytes()
            )
            assert (
                filters.unshuffle_bytes(data, ts).tobytes()
                == ref.unshuffle_bytes(data, ts).tobytes()
            )
            assert (
                filters.bit_unshuffle(data, ts).tobytes()
                == ref.bit_unshuffle(data, ts).tobytes()
            )


def test_inplace_buffer_wrappers():
    # ≙ ShuffleBuffer/UnshuffleBuffer (shuffle.go:298-323)
    data = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    buf = bytearray(data)
    blosc.shuffle_buffer(buf, 4, blosc.Shuffle.SHUFFLE)
    assert bytes(buf) == ref.shuffle_bytes(data, 4).tobytes()
    blosc.unshuffle_buffer(buf, 4, blosc.Shuffle.SHUFFLE)
    assert bytes(buf) == data
    # NOSHUFFLE mode: no-op
    blosc.shuffle_buffer(buf, 4, blosc.Shuffle.NOSHUFFLE)
    assert bytes(buf) == data


def test_shuffle_improves_compressibility():
    # property test from reference shuffle_test.go:186-211: shuffle improves
    # LZ4 ratio on float-like ramp data
    from tpu_blosc.codecs import lz4_ref

    data = np.arange(8192, dtype=np.float32).tobytes()
    plain = lz4_ref.compress_block(data)
    shuffled = lz4_ref.compress_block(ref.shuffle_bytes(data, 4).tobytes())
    assert len(shuffled) < len(plain)
