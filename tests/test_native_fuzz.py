"""Crash-safety fuzz of the native decoders (ctypes → C++).

A memory-safety bug here takes down the process, not just a test — these
run random and mutated inputs straight into the C decoders with tight
output capacities.  Complements the format-level fuzz in test_fuzz.py.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tpu_blosc.errors import BloscError
from tpu_blosc.native import backend as nb

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native backend unavailable"
)

import os as _os

# TPU_BLOSC_SOAK=<n> cranks the example count for soak runs
FUZZ = settings(
    max_examples=int(_os.environ.get("TPU_BLOSC_SOAK", 0)) or 300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@FUZZ
@given(
    data=st.binary(min_size=0, max_size=2048),
    expected=st.integers(0, 4096),
)
def test_lz4_decoder_random_bytes(data, expected):
    try:
        out = nb.lz4_decompress(data, expected)
        assert len(out) <= expected
    except BloscError:
        pass


@FUZZ
@given(
    data=st.binary(min_size=0, max_size=2048),
    expected=st.integers(0, 4096),
)
def test_snappy_decoder_random_bytes(data, expected):
    try:
        out = nb.snappy_decompress(data, expected)
        assert len(out) <= expected
    except BloscError:
        pass


@FUZZ
@given(
    payload=st.binary(min_size=16, max_size=4096),
    flips=st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    ),
    wrong_expected=st.integers(0, 8192),
)
def test_lz4_mutated_valid_streams(payload, flips, wrong_expected):
    """Start from a VALID stream, flip bytes, lie about the size —
    decoders must stay in-bounds."""
    stream = bytearray(nb.lz4_compress(payload, 1))
    for pos, val in flips:
        stream[pos % len(stream)] = val
    try:
        out = nb.lz4_decompress(bytes(stream), wrong_expected)
        assert len(out) <= wrong_expected
    except BloscError:
        pass


@FUZZ
@given(
    payload=st.binary(min_size=16, max_size=4096),
    flips=st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    ),
    wrong_expected=st.integers(0, 8192),
)
def test_snappy_mutated_valid_streams(payload, flips, wrong_expected):
    stream = bytearray(nb.snappy_compress(payload))
    for pos, val in flips:
        stream[pos % len(stream)] = val
    try:
        out = nb.snappy_decompress(bytes(stream), wrong_expected)
        assert len(out) <= wrong_expected
    except BloscError:
        pass


@FUZZ
@given(
    n=st.integers(1, 8192),
    ts=st.integers(1, 32),
    seed=st.integers(0, 2**31),
)
def test_shuffle_kernels_arbitrary_sizes(n, ts, seed):
    """Every (n, ts) combination round-trips through the native kernels."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert nb.unshuffle(nb.shuffle(data, ts), ts).tobytes() == data
    assert nb.bitunshuffle(nb.bitshuffle(data, ts), ts).tobytes() == data


@settings(max_examples=150, deadline=None)
@given(
    n_lit=st.integers(0, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_emit_mixed_malformed_records(n_lit, seed):
    """Arbitrary (unsorted, out-of-range, short-gap) literal records must
    error cleanly from lz4_emit_mixed, never crash or emit garbage."""
    rng = np.random.default_rng(seed)
    seg, ts = 512, 4
    n = seg * ts
    pos = rng.integers(-10, n + 50, n_lit).astype(np.int64)
    vals = rng.integers(0, 256, n_lit, np.uint8)
    row_d = rng.choice([0, 1, 2, 7, 64, 70000], ts).astype(np.int32)
    try:
        stream = nb.lz4_emit_mixed(pos, vals, row_d, seg, n)
    except RuntimeError:
        return  # malformed rejected — correct
    if stream is not None:
        # emitted a stream: it must decode to exactly n bytes
        out = nb.lz4_decompress(stream, n)
        assert len(out) == n


@settings(max_examples=80, deadline=None)
@given(
    n_bytes=st.integers(1, 5000),
    ts=st.sampled_from([1, 2, 3, 4, 8, 16]),
    mode=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_compress_frame_arbitrary_inputs(n_bytes, ts, mode, seed):
    """Single-shot frame path on arbitrary inputs: valid frame out,
    decodes back bit-exact through both native and Python paths."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, n_bytes, np.uint8).tobytes()
    frame = nb.compress_frame(data, ts, mode, 1, nb.NATIVE_LZ4, 1)
    import tpu_blosc as blosc

    assert blosc.decompress(frame) == data


@settings(
    max_examples=max(25, int(_os.environ.get("TPU_BLOSC_SOAK", 0)) // 10),
    deadline=None,
)
@given(
    kb=st.integers(96, 255),
    extra=st.integers(0, 7),
    ts=st.sampled_from([2, 4]),
    codec_name=st.sampled_from(["lz4", "lz4hc", "blosclz"]),
    pattern=st.sampled_from(["ramp", "period", "noise", "float"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_fused_decode_window_property(kb, extra, ts, codec_name, pattern,
                                      seed):
    """Round-5 fused decode+unshuffle engagement window [96 KiB, 256 KiB):
    any data/size/ts/codec combination must decode bit-exact and agree
    with the serial path (the adaptive dispatcher and every scan gate
    route between byte-identical implementations)."""
    import os

    import tpu_blosc as blosc

    n = kb * 1024 + extra
    rng = np.random.default_rng(seed)
    if pattern == "ramp":
        data = bytes(bytearray(i % 256 for i in range(n)))
    elif pattern == "period":
        p = int(rng.integers(3, 600))
        data = np.tile(rng.integers(0, 256, p, np.uint8), n // p + 1)[
            :n
        ].tobytes()
    elif pattern == "noise":
        base = np.frombuffer(
            bytes(bytearray(i % 256 for i in range(n))), np.uint8
        ).copy()
        hit = rng.integers(0, n, n // 40)
        base[hit] = rng.integers(0, 256, hit.size)
        data = base.tobytes()
    else:
        data = (
            np.linspace(0, 1, n // 4 + 1, dtype=np.float32)
            .tobytes()[:n]
        )
    codec = {"lz4": blosc.LZ4, "lz4hc": blosc.LZ4HC,
             "blosclz": blosc.BLOSCLZ}[codec_name]
    frame = blosc.compress(data, codec, 5, blosc.SHUFFLE, ts)
    out_default = blosc.decompress(frame)
    os.environ["TPU_BLOSC_NO_FUSED_DECODE"] = "1"
    try:
        out_serial = blosc.decompress(frame)
    finally:
        del os.environ["TPU_BLOSC_NO_FUSED_DECODE"]
    assert out_default == out_serial == data
