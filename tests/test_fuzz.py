"""Property/fuzz tests — the Hypothesis port of the reference's fuzz targets.

Reference: fuzz_test.go's three targets (SURVEY §4):
  FuzzDecompress  (:11-160)  — arbitrary bytes must never crash the decoder;
                               success implies len(result) == NBytesOrig.
  FuzzCompress    (:165-276) — roundtrip must hold for every valid config;
                               out-of-range levels/typeSizes clamp, never panic.
  FuzzParseHeader (:280-450) — field faithfulness, Bytes() reparse identity,
                               ParseHeader/GetInfo/GetDecompressedSize agree.
"""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import tpu_blosc as blosc
from tpu_blosc.errors import BloscError
from tpu_blosc.format import HEADER_SIZE, Header, parse_header

import os as _os

# TPU_BLOSC_SOAK=<n> cranks the example count for soak runs
FAST = settings(
    max_examples=int(_os.environ.get("TPU_BLOSC_SOAK", 0)) or 200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

CODECS = [
    blosc.BLOSCLZ, blosc.LZ4, blosc.LZ4HC, blosc.SNAPPY, blosc.ZLIB,
    blosc.ZSTD,
]
SHUFFLES = [blosc.NOSHUFFLE, blosc.SHUFFLE, blosc.BITSHUFFLE]


# ---------------------------------------------------------------------------
# FuzzDecompress analogue
# ---------------------------------------------------------------------------


@FAST
@given(data=st.binary(min_size=0, max_size=4096))
def test_decompress_never_crashes(data):
    """Arbitrary input: clean BloscError or a size-consistent success."""
    try:
        out = blosc.decompress(data)
    except BloscError:
        return
    header = parse_header(data)
    assert len(out) == header.nbytes_orig


@FAST
@given(
    payload=st.binary(min_size=0, max_size=512),
    version=st.integers(0, 255),
    codec=st.integers(0, 255),
    flags=st.integers(0, 255),
    type_size=st.integers(0, 255),
    nbytes_orig=st.integers(0, 0xFFFFFFFF),
    nbytes_comp=st.integers(0, 0xFFFFFFFF),
)
def test_decompress_forged_headers(
    payload, version, codec, flags, type_size, nbytes_orig, nbytes_comp
):
    """Forged 16-byte headers over random payloads never crash."""
    frame = (
        struct.pack(
            "<BBBBIII",
            version,
            codec,
            flags,
            type_size,
            nbytes_orig,
            len(payload),
            nbytes_comp,
        )
        + payload
    )
    try:
        out = blosc.decompress(frame)
    except BloscError:
        return
    assert len(out) == nbytes_orig


def test_decompress_seed_corpus():
    """The reference's seed corpus shapes (fuzz_test.go:16-80)."""
    valid = blosc.compress(b"seed corpus data" * 8, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    cases = [
        b"",
        b"\x00",
        valid[:HEADER_SIZE],           # header only, payload gone
        valid[: len(valid) // 2],      # truncated payload
        b"\x01" + valid[1:],           # wrong version
        b"\xff" * 16,                  # all-ones header
        valid[:12] + b"\xff\xff\xff\xff" + valid[16:],  # forged NBytesComp
        valid[:4] + b"\xff\xff\xff\xff" + valid[8:],    # forged NBytesOrig
    ]
    for case in cases:
        try:
            out = blosc.decompress(case)
            assert len(out) == parse_header(case).nbytes_orig
        except BloscError:
            pass


# ---------------------------------------------------------------------------
# FuzzCompress analogue
# ---------------------------------------------------------------------------


@FAST
@given(
    data=st.binary(min_size=1, max_size=8192),
    codec=st.sampled_from(CODECS),
    level=st.integers(-5, 20),
    shuffle=st.sampled_from(SHUFFLES),
    type_size=st.integers(-3, 40),
)
def test_compress_roundtrip_any_config(data, codec, level, shuffle, type_size):
    """Every config roundtrips: the clamped options always produce a frame
    that decodes to the original bytes (stronger than the reference, which
    only asserts roundtrip for NoShuffle/ts=1 and no-panic otherwise)."""
    comp = blosc.compress(data, codec, level, shuffle, type_size)
    assert blosc.decompress(comp) == data


@FAST
@given(
    data=st.binary(min_size=1, max_size=65536),
    block_size=st.integers(1, 16384),
    shuffle=st.sampled_from(SHUFFLES),
    type_size=st.sampled_from([1, 2, 4, 8]),
)
def test_compress_chunked_roundtrip(data, block_size, shuffle, type_size):
    comp = blosc.compress_with_options(
        data,
        blosc.Options(
            block_size=block_size, shuffle=shuffle, type_size=type_size
        ),
    )
    assert blosc.decompress(comp) == data


@FAST
@given(data=st.binary(min_size=1, max_size=2048))
def test_compressed_size_never_pathological(data):
    """Memcpy fallback bounds expansion: payload never exceeds input size
    (frame adds the 16-byte header; reference blosc.go:341-345)."""
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert len(comp) <= len(data) + HEADER_SIZE


# ---------------------------------------------------------------------------
# FuzzParseHeader analogue
# ---------------------------------------------------------------------------


@FAST
@given(
    codec=st.integers(0, 255),
    flags=st.integers(0, 255),
    type_size=st.integers(0, 255),
    nbytes_orig=st.integers(0, 0xFFFFFFFF),
    block_size=st.integers(0, 0xFFFFFFFF),
    nbytes_comp=st.integers(0, 0xFFFFFFFF),
)
def test_header_field_faithfulness(
    codec, flags, type_size, nbytes_orig, block_size, nbytes_comp
):
    h = Header(
        version=2,
        version_lz=codec,
        flags=flags,
        type_size=type_size,
        nbytes_orig=nbytes_orig,
        block_size=block_size,
        nbytes_comp=nbytes_comp,
    )
    raw = h.to_bytes()
    assert len(raw) == HEADER_SIZE
    h2 = parse_header(raw)
    assert h2 == h
    # Bytes() reparse identity
    assert h2.to_bytes() == raw
    # agreement of the three metadata entry points (fuzz_test.go:280-450)
    frame = raw + b"\x00" * 8
    assert blosc.get_info(frame) == h
    assert blosc.get_decompressed_size(frame) == nbytes_orig


@FAST
@given(raw=st.binary(min_size=0, max_size=64))
def test_parse_header_never_crashes(raw):
    try:
        h = parse_header(raw)
    except BloscError:
        return
    assert h.version == 2
    assert h.to_bytes() == bytes(raw[:HEADER_SIZE])


@FAST
@given(
    data=st.binary(min_size=1, max_size=4096),
    override=st.integers(0, 32),
)
def test_decompress_type_size_override(data, override):
    """DecompressWithSize type-size override never crashes and preserves
    length (reference blosc.go:417-426, blosc_test.go:683-719)."""
    comp = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    try:
        out = blosc.decompress_with_size(comp, override)
    except BloscError:
        return
    assert len(out) == len(data)
    if override in (0, 4):
        assert out == data


@settings(max_examples=120, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=8))
def test_decompress_batch_differential_vs_scalar(frames):
    """decompress_batch on arbitrary (mostly corrupt) inputs must agree
    with the scalar path: same first-error type, same successes."""
    try:
        scalar = [blosc.decompress(f) for f in frames]
        scalar_err = None
    except Exception as e:
        scalar, scalar_err = None, type(e)
    try:
        batch = blosc.decompress_batch(frames)
        batch_err = None
    except Exception as e:
        batch, batch_err = None, type(e)
    assert batch_err is scalar_err
    if scalar_err is None:
        assert batch == scalar


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=600), min_size=1, max_size=6),
    st.integers(min_value=0, max_value=9),
)
def test_compress_batch_differential_vs_scalar(items, seed):
    """Valid-frame mutation fuzz: batch compress equals scalar compress,
    and mutated copies of the frames decode identically both ways."""
    frames = blosc.compress_batch(items, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert frames == [
        blosc.compress(d, blosc.LZ4, 5, blosc.SHUFFLE, 4) for d in items
    ]
    # flip one byte in one frame; both paths must fail or succeed alike
    rng = np.random.default_rng(seed)
    k = int(rng.integers(0, len(frames)))
    mut = bytearray(frames[k])
    mut[int(rng.integers(0, len(mut)))] ^= 1 + int(rng.integers(0, 255))
    mutated = list(frames)
    mutated[k] = bytes(mut)
    try:
        scalar = [blosc.decompress(f) for f in mutated]
        scalar_err = None
    except Exception as e:
        scalar, scalar_err = None, type(e)
    try:
        batch = blosc.decompress_batch(mutated)
        batch_err = None
    except Exception as e:
        batch, batch_err = None, type(e)
    assert batch_err is scalar_err
    if scalar_err is None:
        assert batch == scalar
