"""BloscLZ (codec ID 0) — our extension filling the reference's empty enum
slot (blosc.go:58 declares BloscLZ, codec.go:27-33 never registers it).

Coverage mirrors the per-codec strategy of the reference's codec_test.go:
roundtrips, oracle/native cross-decodability, malformed-stream rejection,
frame-level matrix, and the memcpy fallback.
"""

import os
import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import tpu_blosc as blosc
from tpu_blosc.codecs import blosclz_ref as bz
from tpu_blosc.errors import BloscError, DecompressionFailedError
from tpu_blosc.options import Options

try:
    from tpu_blosc.native import backend as nb

    HAVE_NATIVE = nb.available()
except Exception:  # pragma: no cover
    HAVE_NATIVE = False

FAST = settings(
    max_examples=int(os.environ.get("TPU_BLOSC_SOAK", 0)) or 150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

needs_native = pytest.mark.skipif(not HAVE_NATIVE, reason="no native backend")


def _fixtures():
    rng = np.random.default_rng(7)
    page = rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
    return [
        b"",
        b"a",
        b"abc",
        b"aaaa" * 200,
        bytes(range(256)) * 40,
        b"hello world, " * 500,
        np.arange(12000, dtype=np.float32).tobytes(),
        rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
        rng.integers(0, 4, 150000, dtype=np.uint8).tobytes(),
        page * 4,  # matches only at distance 20000 — the 3-byte escape
    ]


# ---------------------------------------------------------------------------
# oracle codec level
# ---------------------------------------------------------------------------


def test_oracle_roundtrip_fixtures():
    for data in _fixtures():
        comp = bz.compress(data)
        assert bz.decompress(comp, len(data)) == data


def test_oracle_far_distance_uses_escape():
    """The 20 KB-period fixture must actually compress (escape engaged)."""
    rng = np.random.default_rng(11)
    page = rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
    comp = bz.compress(page * 4)
    assert len(comp) < 2 * len(page)  # pages 2-4 fold onto page 1


def test_oracle_rle_overlap():
    comp = bz.compress(b"z" * 10000)
    assert len(comp) < 64
    assert bz.decompress(comp, 10000) == b"z" * 10000


@FAST
@given(data=st.binary(min_size=0, max_size=8192))
def test_oracle_roundtrip_property(data):
    assert bz.decompress(bz.compress(data), len(data)) == data


@FAST
@given(data=st.binary(min_size=0, max_size=2048))
def test_decoder_never_crashes(data):
    """Arbitrary bytes: clean error or output of exactly the claimed size."""
    try:
        out = bz.decompress(data, 512)
    except DecompressionFailedError:
        return
    assert len(out) == 512


def test_decoder_rejects_malformed():
    # literal run overruns input
    with pytest.raises(DecompressionFailedError):
        bz.decompress(bytes([31]), 32)  # promises 32 literals, has none
    # truncated match (control byte only)
    with pytest.raises(DecompressionFailedError):
        bz.decompress(bytes([0x40]), 3)
    # distance before stream start
    with pytest.raises(DecompressionFailedError):
        bz.decompress(bytes([0x00, 0x41, 0x20, 0x05]), 4)  # lit 'A', dist 6
    # output overruns expected size
    comp = bz.compress(b"q" * 100)
    with pytest.raises(DecompressionFailedError):
        bz.decompress(comp, 50)
    # output short of expected size
    with pytest.raises(DecompressionFailedError):
        bz.decompress(comp, 200)
    # truncated far-distance operand
    with pytest.raises(DecompressionFailedError):
        bz.decompress(bytes([0x20 | 0x1F, 0xFF, 0x01]), 8)


# ---------------------------------------------------------------------------
# native codec level
# ---------------------------------------------------------------------------


@needs_native
def test_native_roundtrip_fixtures():
    for data in _fixtures():
        comp = nb.blosclz_compress(data)
        assert nb.blosclz_decompress(comp, len(data)) == data


@needs_native
def test_cross_decodability_fixtures():
    """Either encoder's stream decodes under either decoder — the same
    contract the LZ4/Snappy differential tests pin."""
    for data in _fixtures():
        native = nb.blosclz_compress(data)
        oracle = bz.compress(data)
        assert bz.decompress(native, len(data)) == data
        assert nb.blosclz_decompress(oracle, len(data)) == data


@needs_native
@FAST
@given(data=st.binary(min_size=0, max_size=8192))
def test_cross_decodability_property(data):
    native = nb.blosclz_compress(data)
    oracle = bz.compress(data)
    assert bz.decompress(native, len(data)) == data
    assert nb.blosclz_decompress(oracle, len(data)) == data


@needs_native
@FAST
@given(data=st.binary(min_size=1, max_size=2048))
def test_native_decoder_never_crashes(data):
    try:
        out = nb.blosclz_decompress(data, 512)
    except BloscError:
        return
    # backend returns short output on under-produce; codec wrapper callers
    # (frame layer) enforce the exact-size contract
    assert len(out) <= 512


# ---------------------------------------------------------------------------
# frame level
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shuffle", [blosc.NOSHUFFLE, blosc.SHUFFLE, blosc.BITSHUFFLE])
@pytest.mark.parametrize("type_size", [1, 2, 4, 8])
def test_frame_roundtrip_matrix(shuffle, type_size):
    rng = np.random.default_rng(3)
    ramp = np.arange(20000, dtype=np.float32).tobytes()
    noisy = rng.integers(0, 50, 30000, dtype=np.uint8).tobytes()
    for data in (ramp, noisy):
        frame = blosc.compress(data, blosc.BLOSCLZ, 5, shuffle, type_size)
        assert blosc.decompress(frame) == data
        info = blosc.get_info(frame)
        assert info.codec == 0


def test_frame_multiblock_roundtrip():
    data = np.arange(600000, dtype=np.float32).tobytes()
    opts = Options(codec=blosc.BLOSCLZ, shuffle=blosc.SHUFFLE, type_size=4,
                   block_size=65536)
    frame = blosc.compress_with_options(data, opts)
    assert blosc.decompress(frame) == data
    # shuffle makes the f32 ramp highly compressible under blosclz too
    assert len(frame) < len(data) // 4


def test_frame_memcpy_fallback_random_data():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    frame = blosc.compress(data, blosc.BLOSCLZ, 5, blosc.NOSHUFFLE, 1)
    info = blosc.get_info(frame)
    assert info.is_memcpy
    assert blosc.decompress(frame) == data


def test_decompress_into_and_size():
    data = b"0123456789" * 4000
    frame = blosc.compress(data, blosc.BLOSCLZ, 5, blosc.NOSHUFFLE, 1)
    assert blosc.get_decompressed_size(frame) == len(data)
    out = bytearray(len(data))
    blosc.decompress_into(frame, out)
    assert bytes(out) == data


def test_registry_lists_blosclz():
    from tpu_blosc.codecs.registry import get_codec, list_codecs

    assert blosc.Codec.BLOSCLZ in list_codecs()
    impl = get_codec(0)
    assert impl is not None and impl.name() == "blosclz"


def test_level_ignored_like_lz4():
    data = np.arange(8000, dtype=np.int32).tobytes()
    frames = {
        lv: blosc.compress(data, blosc.BLOSCLZ, lv, blosc.SHUFFLE, 4)
        for lv in (1, 5, 9)
    }
    assert frames[1] == frames[5] == frames[9]


def test_corrupted_frame_raises_cleanly():
    data = b"abcd" * 5000
    frame = bytearray(blosc.compress(data, blosc.BLOSCLZ, 5, blosc.NOSHUFFLE, 1))
    rng = np.random.default_rng(13)
    for _ in range(50):
        pos = int(rng.integers(16, len(frame)))
        val = int(rng.integers(0, 256))
        mutated = bytes(frame[:pos]) + bytes([val]) + bytes(frame[pos + 1 :])
        try:
            out = blosc.decompress(mutated)
        except BloscError:
            continue
        assert len(out) == len(data)


def test_python_and_native_frames_cross_decode():
    """Frame produced with the forced-Python codec path must decode
    natively and vice versa (subprocess gate, like test_dispatch)."""
    import subprocess
    import sys

    code = (
        "import tpu_blosc as b;"
        "d = bytes(range(250)) * 100;"
        "f = b.compress(d, b.BLOSCLZ, 5, b.SHUFFLE, 4);"
        "import sys; sys.stdout.buffer.write(f)"
    )
    env = dict(os.environ, TPU_BLOSC_NO_NATIVE="1", TPU_BLOSC_NO_DEVICE="1")
    frame = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, env=env, check=True
    ).stdout
    assert blosc.decompress(frame) == bytes(range(250)) * 100
