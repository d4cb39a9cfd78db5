"""Segment-parallel single-block LZ4 frame encoder (tpublosc.cpp
lz4_frame_parallel).

Frames >= 256 KiB (kFrameSegMin) encode their LZ4/LZ4HC payload as
deterministic segments stitched into ONE valid LZ4 block stream, so the
frame stays a reference-compatible single-block frame (blosc.go:364)
while the encode uses every core (spin pool).  The contract mirrors the reference's stream contract
(codec.go:63-84: any conformant LZ4 block decoder reads the payload):

  * the payload decodes with the independent pure-Python decoder,
  * output bytes are identical for ANY thread count (segmentation is a
    pure function of n — golden pins stay machine-independent),
  * the memcpy fallback still triggers on incompressible input,
  * size inflation vs the serial encoder stays marginal (matches cannot
    cross the segment cuts).
"""

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc import filters
from tpu_blosc.codecs import lz4_ref
from tpu_blosc.native import backend as nb

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native backend unavailable"
)

SEG_MIN = 256 * 1024  # tpublosc.cpp kFrameSegMin (spin-pool floor, round 3)


def _payload(frame):
    h = blosc.get_info(frame)
    assert not (h.flags & 0x2), "unexpected memcpy frame"
    return frame[16 : h.nbytes_comp]


def _filtered(data, shuffle, ts):
    if shuffle == blosc.SHUFFLE and ts > 1:
        return bytes(filters.shuffle_bytes(data, ts))
    if shuffle == blosc.BITSHUFFLE and ts > 1:
        return bytes(filters.bit_shuffle(data, ts))
    return data


@pytest.mark.parametrize(
    "n",
    [
        SEG_MIN,  # first parallel size (4 segments)
        SEG_MIN + 1,  # ragged tail segment
        2 * 1024 * 1024,  # 8-segment threshold
        2 * 1024 * 1024 + 37,
        4 * 1024 * 1024 - 3,  # top of the single-block range
    ],
)
@pytest.mark.parametrize(
    "shuffle,ts",
    [(blosc.SHUFFLE, 4), (blosc.BITSHUFFLE, 4), (blosc.NOSHUFFLE, 1),
     (blosc.SHUFFLE, 8)],
)
def test_stitched_stream_decodes_anywhere(n, shuffle, ts):
    data = (
        (np.arange(n) % 251).astype(np.uint8)
        + (np.arange(n) // 8191).astype(np.uint8)
    ).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, shuffle, ts)
    assert blosc.decompress(frame) == data
    # the payload must be ONE valid LZ4 block stream for any decoder
    dec = lz4_ref.decompress_block(_payload(frame), n)
    assert dec == _filtered(data, shuffle, ts)


def test_thread_count_invariance():
    """Segmentation depends only on n: bytes identical for any
    tpb_set_num_threads value (the reference's SIMD-vs-generic equality
    analogue for the parallel encoder)."""
    n = 3 * 1024 * 1024 + 13
    data = np.sin(np.arange(n // 4, dtype=np.float32) / 97).tobytes()[:n]
    old = nb.num_threads()
    try:
        frames = []
        for t in (1, 2, 4):
            nb.set_num_threads(t)
            frames.append(blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4))
    finally:
        nb.set_num_threads(old)
    assert frames[0] == frames[1] == frames[2]
    assert blosc.decompress(frames[0]) == data


def test_inflation_vs_serial_encoder_is_marginal():
    """Cutting the stream into segments loses cross-cut matches; the cost
    must stay marginal on numeric data (measured +0.7% on the 1 MiB f32
    BASELINE config)."""
    n = 1024 * 1024
    data = np.arange(n // 4, dtype=np.float32).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    serial = nb.lz4_compress(
        np.frombuffer(_filtered(data, blosc.SHUFFLE, 4), np.uint8), 1
    )
    assert len(_payload(frame)) <= len(serial) * 1.02 + 64


def test_memcpy_fallback_still_engages():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 2 * 1024 * 1024, dtype=np.uint8).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    h = blosc.get_info(frame)
    assert h.flags & 0x2
    assert blosc.decompress(frame) == data


def test_literal_only_middle_segment():
    """A segment that encodes to a single literal token (pure noise) must
    pend into the NEXT segment's first sequence — the seam-stitch path
    with accumulated pending literals."""
    rng = np.random.default_rng(3)
    seg = (SEG_MIN + 3) // 4 + 1  # segment length for n = SEG_MIN + 3
    n = SEG_MIN + 3
    parts = [
        bytes((np.arange(seg) % 199).astype(np.uint8)),   # compressible
        rng.integers(0, 256, seg, dtype=np.uint8).tobytes(),  # literal-only
        bytes((np.arange(seg) % 7).astype(np.uint8)),     # compressible
        rng.integers(0, 256, n - 3 * seg, dtype=np.uint8).tobytes(),
    ]
    data = b"".join(parts)
    assert len(data) == n
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        assert lz4_ref.decompress_block(_payload(frame), n) == data


def test_consecutive_literal_only_segments():
    """Two adjacent noise segments accumulate two pending chunks before a
    compressible segment flushes them."""
    rng = np.random.default_rng(9)
    n = 2 * 1024 * 1024  # 8 segments of 256 KiB
    seg = n // 8
    parts = [bytes((np.arange(seg) % 13).astype(np.uint8))]
    parts.append(rng.integers(0, 256, seg, dtype=np.uint8).tobytes())
    parts.append(rng.integers(0, 256, seg, dtype=np.uint8).tobytes())
    parts.append(bytes((np.arange(seg) % 13).astype(np.uint8)))
    parts.append(bytes(4 * seg))  # zeros keep the whole frame compressible
    data = b"".join(parts)
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    assert not (h.flags & 0x2)
    assert lz4_ref.decompress_block(_payload(frame), n) == data


def test_trailing_literal_only_segment():
    """Noise in the FINAL segment: its literals close the stream."""
    rng = np.random.default_rng(11)
    n = SEG_MIN + 40
    seg = (n + 3) // 4
    data = bytes((np.arange(3 * seg) % 17).astype(np.uint8))
    data += rng.integers(0, 256, n - 3 * seg, dtype=np.uint8).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        assert lz4_ref.decompress_block(_payload(frame), n) == data


@pytest.mark.parametrize("level", [1, 9])
def test_lz4hc_parallel_roundtrip(level):
    n = 1024 * 1024 + 5
    data = (np.arange(n) % 241).astype(np.uint8).tobytes()
    frame = blosc.compress(data, blosc.LZ4HC, level, blosc.SHUFFLE, 4)
    assert blosc.decompress(frame) == data
    assert lz4_ref.decompress_block(
        _payload(frame), n
    ) == _filtered(data, blosc.SHUFFLE, 4)


@pytest.mark.parametrize(
    "n", [SEG_MIN, SEG_MIN + 1, 2 * 1024 * 1024 + 37, 4 * 1024 * 1024 - 3]
)
@pytest.mark.parametrize("shuffle,ts", [(blosc.SHUFFLE, 4), (blosc.NOSHUFFLE, 1)])
def test_snappy_parallel_roundtrip_and_stream(n, shuffle, ts):
    """Snappy segments concatenate directly (no end-of-stream token
    constraints): one global preamble + stripped per-segment bodies must
    be a valid stream for the independent pure-Python decoder."""
    from tpu_blosc.codecs import snappy_ref

    data = (
        (np.arange(n) % 251).astype(np.uint8)
        + (np.arange(n) // 8191).astype(np.uint8)
    ).tobytes()
    frame = blosc.compress(data, blosc.SNAPPY, 5, shuffle, ts)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        want = _filtered(data, shuffle, ts)
        assert snappy_ref.decompress(frame[16 : h.nbytes_comp]) == want


def test_snappy_thread_count_invariance():
    n = 1024 * 1024 + 9
    data = (np.arange(n) % 241).astype(np.uint8).tobytes()
    old = nb.num_threads()
    try:
        frames = []
        for t in (1, 4):
            nb.set_num_threads(t)
            frames.append(blosc.compress(data, blosc.SNAPPY, 5, blosc.NOSHUFFLE, 1))
    finally:
        nb.set_num_threads(old)
    assert frames[0] == frames[1]
    assert blosc.decompress(frames[0]) == data


def test_snappy_foreign_serial_frame():
    """Serial pure-Python Snappy frames fail the decode pre-scan and take
    the sequential decoder — byte-exact either way."""
    from tpu_blosc.codecs import snappy_ref
    from tpu_blosc.format import FORMAT_VERSION, HEADER_SIZE, Header

    n = 1 << 20
    data = (np.arange(n) % 199).astype(np.uint8).tobytes()
    stream = snappy_ref.compress(data)
    h = Header(
        version=FORMAT_VERSION, version_lz=3, flags=0, type_size=1,
        nbytes_orig=n, block_size=n, nbytes_comp=HEADER_SIZE + len(stream),
    )
    assert blosc.decompress(h.to_bytes() + stream) == data


@pytest.mark.parametrize("n", [SEG_MIN, 2 * 1024 * 1024 + 37])
@pytest.mark.parametrize("level", [1, 6, 9])
def test_zlib_parallel_stream_is_standard(n, level):
    """The pigz-style parallel zlib encode must emit ONE standard zlib
    stream (raw-deflate segments with Z_SYNC_FLUSH seams + combined
    adler32) that plain zlib.decompress — and therefore the reference's
    kzlib.NewReader — reads."""
    import zlib

    data = (
        (np.arange(n) % 251).astype(np.uint8)
        + (np.arange(n) // 8191).astype(np.uint8)
    ).tobytes()
    frame = blosc.compress(data, blosc.ZLIB, level, blosc.SHUFFLE, 4)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    assert not (h.flags & 0x2)
    assert zlib.decompress(frame[16 : h.nbytes_comp]) == _filtered(
        data, blosc.SHUFFLE, 4
    )


def test_zlib_thread_count_invariance():
    n = 1024 * 1024 + 3
    data = (np.arange(n) % 241).astype(np.uint8).tobytes()
    old = nb.num_threads()
    try:
        frames = []
        for t in (1, 4):
            nb.set_num_threads(t)
            frames.append(blosc.compress(data, blosc.ZLIB, 5, blosc.NOSHUFFLE, 1))
    finally:
        nb.set_num_threads(old)
    assert frames[0] == frames[1]
    assert blosc.decompress(frames[0]) == data


def test_zstd_multiframe_payload_decodes():
    """ZSTD payloads holding concatenated frames (RFC 8878 §3) must decode
    on both the native path (parallel per-frame) and the pure-Python
    zstandard wrapper — parity with the reference's klauspost DecodeAll,
    which accepts back-to-back frames.  Our encoder itself never segments
    zstd (ratio cost measured at tens of percent — rejected)."""
    import zstandard

    from tpu_blosc.codecs.standard import ZstdCodec
    from tpu_blosc.format import FORMAT_VERSION, HEADER_SIZE, Header

    n = 1 << 20
    data = (np.arange(n) % 199).astype(np.uint8).tobytes()
    c = zstandard.ZstdCompressor(level=3)
    stream = c.compress(data[: n // 2]) + c.compress(data[n // 2 :])
    h = Header(
        version=FORMAT_VERSION, version_lz=5, flags=0, type_size=1,
        nbytes_orig=n, block_size=n, nbytes_comp=HEADER_SIZE + len(stream),
    )
    assert blosc.decompress(h.to_bytes() + stream) == data
    assert ZstdCodec().decompress(stream, n) == data


def test_zstd_trailing_frame_rejected_everywhere():
    """A payload whose FIRST frame already yields nbytes_orig but which
    carries a further non-empty frame must be rejected by the native path
    AND the pure-Python wrapper alike (accept/reject parity across decode
    entry points — a first-frame-only python decode used to pass it)."""
    import zstandard

    from tpu_blosc.codecs.standard import ZstdCodec
    from tpu_blosc.format import FORMAT_VERSION, HEADER_SIZE, Header

    n = 1 << 20
    data = (np.arange(n) % 199).astype(np.uint8).tobytes()
    c = zstandard.ZstdCompressor(level=3)
    stream = c.compress(data) + c.compress(b"extra!")
    h = Header(
        version=FORMAT_VERSION, version_lz=5, flags=0, type_size=1,
        nbytes_orig=n, block_size=n, nbytes_comp=HEADER_SIZE + len(stream),
    )
    with pytest.raises(blosc.BloscError):
        blosc.decompress(h.to_bytes() + stream)
    out = ZstdCodec().decompress(stream, n)
    assert len(out) != n  # wrapper must not return exactly-n silently


def test_zstd_encode_stays_single_frame():
    """The zstd encoder must keep emitting ONE frame (no segmentation):
    bytes and size identical to the serial library call."""
    import zstandard

    n = 1 << 20
    data = np.arange(n // 4, dtype=np.float32).tobytes()
    frame = blosc.compress(data, blosc.ZSTD, 5, blosc.SHUFFLE, 4)
    h = blosc.get_info(frame)
    payload = frame[16 : h.nbytes_comp]
    # one frame that spans the whole payload
    params = zstandard.get_frame_parameters(payload)
    assert params.content_size == n
    assert zstandard.ZstdDecompressor().decompress(
        payload, max_output_size=n
    ) == bytes(filters.shuffle_bytes(data, 4))


def test_parallel_decode_foreign_serial_frame():
    """Frames from OTHER encoders (here: the pure-Python greedy encoder)
    fail the decode pre-scan at the first cross-cut match and must take
    the sequential decoder — byte-exact either way."""
    from tpu_blosc.format import FORMAT_VERSION, HEADER_SIZE, Header

    n = 1 << 20
    data = (np.arange(n) % 199).astype(np.uint8).tobytes()
    shuf = bytes(filters.shuffle_bytes(data, 4))
    stream = lz4_ref.compress_block(shuf)
    h = Header(
        version=FORMAT_VERSION, version_lz=1, flags=1, type_size=4,
        nbytes_orig=n, block_size=n, nbytes_comp=HEADER_SIZE + len(stream),
    )
    assert blosc.decompress(h.to_bytes() + stream) == data


def test_parallel_decode_corruption_parity():
    """Bit-flipped parallel-range frames must behave exactly like the
    host reference decoder: same accept/reject and same bytes (the
    pre-scan + chunk decoders add no new acceptance surface)."""
    import random

    n = 1 << 20
    data = (np.arange(n) % 97).astype(np.uint8).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    rng = random.Random(42)
    for _ in range(60):
        fb = bytearray(frame)
        i = rng.randrange(16, len(fb))
        fb[i] ^= 1 << rng.randrange(8)
        fb = bytes(fb)
        try:
            got = blosc.decompress(fb)
        except blosc.BloscError:
            got = None
        # oracle: pure-Python decode of the same mutated payload
        try:
            want = lz4_ref.decompress_block(fb[16:], n)
            if len(want) != n:
                want = None
        except Exception:
            want = None
        assert got == want, f"divergence at flip {i}"


@pytest.mark.parametrize(
    "codec", [blosc.LZ4, blosc.SNAPPY, blosc.ZLIB]
)
def test_cross_decoding_native_python_large_frames(codec, monkeypatch):
    """At/above the 256 KiB floor the native frame bytes legitimately
    DIVERGE from the pure-Python encoder's (segmented vs single stream) —
    the contract is cross-decodability: each decoder reads the other's
    frames bit-exactly.  (Well below the floor, test_differential.py's
    ≤40 KB corpus asserts full byte-identity of native vs python frames.)"""
    from tpu_blosc import chunk

    n = SEG_MIN + 17
    data = (np.arange(n) % 239).astype(np.uint8).tobytes()
    native_frame = blosc.compress(data, codec, 5, blosc.SHUFFLE, 4)

    orig = chunk._native_pipeline_codec
    monkeypatch.setattr(chunk, "_native_pipeline_codec", lambda c, l: None)
    python_frame = blosc.compress_with_options(
        data, blosc.Options(codec=codec, shuffle=blosc.SHUFFLE, type_size=4)
    )
    # python decoder reads the native (segmented) frame
    assert blosc.decompress(native_frame) == data
    monkeypatch.setattr(chunk, "_native_pipeline_codec", orig)
    # native decoder reads the python (single-stream) frame
    assert blosc.decompress(python_frame) == data


def test_no_frame_parallel_escape_hatch(tmp_path):
    """TPU_BLOSC_NO_FRAME_PARALLEL=1 restores the serial encoder (read
    once at library init → needs a subprocess); serial frames differ in
    bytes, roundtrip there, and still decode in THIS process."""
    import os
    import subprocess
    import sys

    n = SEG_MIN + 5
    data = (np.arange(n) % 233).astype(np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "serial.frame"
    code = (
        "import sys; sys.path.insert(0, %r);"
        "import tpu_blosc as blosc;"
        "d = open(%r,'rb').read();"
        "f = blosc.compress(d, blosc.LZ4, 5, blosc.NOSHUFFLE, 1);"
        "assert blosc.decompress(f) == d;"
        "open(%r,'wb').write(f)"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        str(src), str(out),
    )
    env = dict(
        os.environ, TPU_BLOSC_NO_FRAME_PARALLEL="1", TPU_BLOSC_NO_DEVICE="1"
    )
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, timeout=300,
        capture_output=True,
    )
    serial_frame = out.read_bytes()
    parallel_frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert serial_frame != parallel_frame  # the hatch actually flipped paths
    assert blosc.decompress(serial_frame) == data


def test_scan_encoder_inside_segments():
    """Segments >= 256 KiB still route through the fixed-offset scan
    encoder when the probe accepts; the stitched result must stay a valid
    stream."""
    n = 4 * 1024 * 1024  # 8 x 512 KiB segments, scan-eligible
    base = np.tile(np.arange(96, dtype=np.uint8), n // 96 + 1)[:n]
    data = base.tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert blosc.decompress(frame) == data
    assert lz4_ref.decompress_block(_payload(frame), n) == data


# ---------------------------------------------------------------------------
# BloscLZ segment parallelism — the simplest of the family: no preamble and
# no end-of-stream constraints, so segment outputs concatenate directly and
# the decode pre-scan needs no literal-run bookkeeping.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n", [SEG_MIN, SEG_MIN + 13, 2 * 1024 * 1024 + 5, 4 * 1024 * 1024 - 3]
)
@pytest.mark.parametrize(
    "shuffle,ts",
    [(blosc.SHUFFLE, 4), (blosc.BITSHUFFLE, 4), (blosc.NOSHUFFLE, 1)],
)
def test_blosclz_parallel_roundtrip_and_stream(n, shuffle, ts):
    """Parallel-encoded BloscLZ payloads must be one valid stream for the
    independent pure-Python decoder, and roundtrip through the (parallel)
    native decode path."""
    from tpu_blosc.codecs import blosclz_ref

    data = (
        (np.arange(n) % 251).astype(np.uint8)
        + (np.arange(n) // 8191).astype(np.uint8)
    ).tobytes()
    frame = blosc.compress(data, blosc.BLOSCLZ, 5, shuffle, ts)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        want = _filtered(data, shuffle, ts)
        assert blosclz_ref.decompress(frame[16 : h.nbytes_comp], n) == want


def test_blosclz_parallel_frame_is_segment_concat():
    """The payload must be EXACTLY the concatenation of the per-segment
    one-shot encodes — segmentation is a pure function of n, so the frame
    bytes are deterministic across thread counts and machines."""
    n = 2 * 1024 * 1024  # 8-segment size
    data = (np.arange(n) % 239).astype(np.uint8).tobytes()
    frame = blosc.compress(data, blosc.BLOSCLZ, 5, blosc.NOSHUFFLE, 1)
    seg = (n + 7) // 8
    expect = b"".join(
        nb.blosclz_compress(data[lo : lo + seg]) for lo in range(0, n, seg)
    )
    assert _payload(frame) == expect


def test_blosclz_foreign_serial_stream_decodes():
    """Serially encoded streams (the Python oracle) fail the decode
    pre-scan and must take the sequential decoder — byte-exact."""
    from tpu_blosc.codecs import blosclz_ref
    from tpu_blosc.format import FORMAT_VERSION, HEADER_SIZE, Header

    n = 1 << 20
    data = (np.arange(n) % 199).astype(np.uint8).tobytes()
    shuf = bytes(filters.shuffle_bytes(data, 4))
    stream = blosclz_ref.compress(shuf)
    h = Header(
        version=FORMAT_VERSION, version_lz=0, flags=1, type_size=4,
        nbytes_orig=n, block_size=n, nbytes_comp=HEADER_SIZE + len(stream),
    )
    assert blosc.decompress(h.to_bytes() + stream) == data


def test_blosclz_parallel_decode_corruption_parity():
    """Bit-flipped parallel-range BloscLZ frames: the pre-scan + chunk
    decoders must add no acceptance surface vs the Python decoder."""
    import random

    from tpu_blosc.codecs import blosclz_ref
    from tpu_blosc.errors import BloscError

    n = 1 << 20
    data = (np.arange(n) % 97).astype(np.uint8).tobytes()
    frame = blosc.compress(data, blosc.BLOSCLZ, 5, blosc.NOSHUFFLE, 1)
    rng = random.Random(77)
    for _ in range(25):
        pos = rng.randrange(16, len(frame))
        val = rng.randrange(256)
        mutated = frame[:pos] + bytes([val]) + frame[pos + 1 :]
        h = blosc.get_info(mutated)
        native_out = native_err = None
        try:
            native_out = blosc.decompress(mutated)
        except BloscError:
            native_err = True
        py_out = py_err = None
        try:
            py_out = blosclz_ref.decompress(
                mutated[16 : h.nbytes_comp], h.nbytes_orig
            )
        except BloscError:
            py_err = True
        if native_err or py_err:
            if native_err != py_err:
                accepted = native_out if py_err else py_out
                assert accepted == data
        else:
            assert native_out == py_out


# ---------------------------------------------------------------------------
# round 4: libdeflate encode path for SHUFFLED zlib payloads
# (tpublosc.cpp zlib_ld_segment/zlib_ld_whole + deflate_walk BFINAL patch)
# ---------------------------------------------------------------------------


def _zlib_fixture(kind, n):
    rng = np.random.default_rng(11)
    if kind == "ramp":
        return np.arange(n // 4, dtype=np.float32).tobytes()[:n]
    if kind == "noisy":
        base = np.arange(n // 4, dtype=np.float32)
        return (base + rng.random(n // 4).astype(np.float32)).tobytes()[:n]
    if kind == "random":  # incompressible: libdeflate emits stored blocks
        return rng.integers(0, 256, n, np.uint8).tobytes()
    return (b"the quick brown fox compresses " * (n // 31 + 1))[:n]


@pytest.mark.parametrize("kind", ["ramp", "noisy", "random", "text"])
@pytest.mark.parametrize(
    "n", [SEG_MIN, SEG_MIN + 13, 1024 * 1024 + 7, 2 * 1024 * 1024]
)
@pytest.mark.parametrize("level", [4, 5, 9])
def test_zlib_ld_patched_stream_is_standard(kind, n, level):
    """Shuffled zlib payloads ride libdeflate; non-final segments are
    BFINAL-patched by the deflate walker into the Z_SYNC_FLUSH layout.
    The result must stay ONE standard zlib stream for plain
    zlib.decompress (≙ the reference's kzlib.NewReader) across data
    classes including stored-block (incompressible) streams."""
    import zlib

    data = _zlib_fixture(kind, n)
    frame = blosc.compress(data, blosc.ZLIB, level, blosc.SHUFFLE, 4)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if h.flags & 0x2:  # random data goes memcpy: nothing zlib to check
        assert kind == "random"
        return
    assert zlib.decompress(frame[16 : h.nbytes_comp]) == _filtered(
        data, blosc.SHUFFLE, 4
    )


def test_zlib_ld_whole_stream_small_frames_stay_libz():
    """Below the 64 KiB libdeflate floor the serial path keeps emitting
    CPython-zlib-identical bytes (the differential-test contract)."""
    import zlib

    data = np.arange(8192, dtype=np.float32).tobytes()  # 32 KiB < floor
    frame = blosc.compress(data, blosc.ZLIB, 5, blosc.SHUFFLE, 4)
    h = blosc.get_info(frame)
    assert frame[16 : h.nbytes_comp] == zlib.compress(
        bytes(_filtered(data, blosc.SHUFFLE, 4)), 5
    )


def test_zlib_ld_enc_escape_hatch(tmp_path):
    """TPU_BLOSC_NO_LIBDEFLATE_ENC=1 restores the pigz-libz encoder
    (read at library init → subprocess); both frames roundtrip and both
    inflate under CPython zlib."""
    import os
    import subprocess
    import sys
    import zlib

    n = 1024 * 1024
    data = np.arange(n // 4, dtype=np.float32).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "libz.frame"
    code = (
        "import sys; sys.path.insert(0, %r);"
        "import tpu_blosc as blosc;"
        "d = open(%r,'rb').read();"
        "f = blosc.compress(d, blosc.ZLIB, 5, blosc.SHUFFLE, 4);"
        "assert blosc.decompress(f) == d;"
        "open(%r,'wb').write(f)"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        str(src), str(out),
    )
    env = dict(
        os.environ, TPU_BLOSC_NO_LIBDEFLATE_ENC="1", TPU_BLOSC_NO_DEVICE="1"
    )
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, timeout=300,
        capture_output=True,
    )
    libz_frame = out.read_bytes()
    ld_frame = blosc.compress(data, blosc.ZLIB, 5, blosc.SHUFFLE, 4)
    h = blosc.get_info(ld_frame)
    if libz_frame != ld_frame:  # ld engaged (libdeflate present)
        assert len(ld_frame) <= len(libz_frame)  # never larger than libz
    assert blosc.decompress(libz_frame) == data
    assert zlib.decompress(ld_frame[16 : h.nbytes_comp]) == _filtered(
        data, blosc.SHUFFLE, 4
    )


def test_zlib_ld_multiblock_matches_host_and_inflates():
    """Per-block libdeflate (blocks >= the 64 KiB floor) in chunked
    frames: every block payload is a standard zlib stream."""
    import zlib

    from tpu_blosc.options import Options

    data = np.arange(200_000, dtype=np.float32).tobytes()
    opts = Options(codec=blosc.ZLIB, level=5, block_size=128 * 1024)
    frame = blosc.compress_with_options(data, opts)
    assert blosc.decompress(frame) == data


# ---------------------------------------------------------------------------
# round 4: fused small-frame parallel encode (48 KiB <= n < 256 KiB LZ4:
# per-plane slices for byte-shuffle ts=4, plain segments for no-shuffle)
# ---------------------------------------------------------------------------

SMALL_MIN = 48 * 1024  # tpublosc.cpp kSmallFrameMin


@pytest.mark.parametrize("ts", [2, 4])  # ts=8 measured+rejected, see gate
@pytest.mark.parametrize("codec", [1, 2, 3, 0])  # LZ4, LZ4HC, Snappy, BloscLZ
@pytest.mark.parametrize("n", [SMALL_MIN + 3, 100 * 1024])
def test_small_frame_fused_all_codecs(n, codec, ts):
    """Every fused-eligible codec (round 4: LZ4/LZ4HC/Snappy/BloscLZ)
    roundtrips through the plane-aligned parallel encode — ts=4 (four
    plane slices) and ts=2 (two), tails included."""
    data = bytes(bytearray((i * 11 + i // 503) % 256 for i in range(n)))
    frame = blosc.compress(data, codec, 5, blosc.SHUFFLE, ts)
    assert blosc.decompress(frame) == data
    # compressible input MUST yield a real compressed frame — a memcpy
    # here means the fused stitch silently rejected its own segments
    # (the ragged-tail snappy bug this test was added for)
    assert not (blosc.get_info(frame).flags & 0x2), (n, codec)
    assert len(frame) < len(data) // 4


@pytest.mark.parametrize("mode", ["shuffle", "noshuffle"])
def test_small_frame_zlib_segments_roundtrip(mode):
    """ZLIB segments small frames in BOTH modes (its ~100+ us slices
    dwarf the slice imbalance); the pigz-layout stream stays one valid
    zlib stream and the seam cost is bounded (~40-60 B/seam)."""
    n = 100 * 1024
    data = bytes(bytearray((i * 11 + i // 503) % 256 for i in range(n)))
    sh = blosc.SHUFFLE if mode == "shuffle" else blosc.NOSHUFFLE
    frame = blosc.compress(data, blosc.ZLIB, 5, sh, 4)
    assert blosc.decompress(frame) == data
    # independent inflate: the payload must satisfy the SYSTEM zlib
    import zlib as _z
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        body = _z.decompress(bytes(frame[16 : h.nbytes_comp]))
        assert body == bytes(_filtered(data, sh, 4))


def test_fused_big_frames_byte_identical_to_two_stage(tmp_path):
    """>= 256 KiB byte-shuffled frames take the FUSED extract+encode path
    when n % max(ts, nseg) == 0; its bounds coincide with the plain
    segment cuts, so bytes must equal the two-stage filter+encode path
    (TPU_BLOSC_NO_FUSED_BIG=1, static env -> subprocess)."""
    import os
    import subprocess
    import sys

    cases = []
    for n in (256 * 1024, 512 * 1024, 2 * 1024 * 1024):
        data = np.arange(n // 4, dtype=np.float32).tobytes()
        for ts in (2, 4):
            for codec in (blosc.LZ4, blosc.SNAPPY):
                cases.append((data, codec, ts))
    fused = [
        blosc.compress(d, c, 5, blosc.SHUFFLE, ts) for d, c, ts in cases
    ]
    for f, (d, _, _) in zip(fused, cases):
        assert blosc.decompress(f) == d
    blob = tmp_path / "frames.bin"
    import pickle
    blob.write_bytes(pickle.dumps([bytes(f) for f in fused]))
    code = (
        "import sys, pickle; sys.path.insert(0, %r);"
        "import numpy as np; import tpu_blosc as blosc;"
        "fused = pickle.loads(open(%r,'rb').read());"
        "cases = [];"
        "ns = (256*1024, 512*1024, 2*1024*1024);"
        "[cases.append((np.arange(n//4, dtype=np.float32).tobytes(), c, ts))"
        " for n in ns for ts in (2, 4)"
        " for c in (blosc.LZ4, blosc.SNAPPY)];"
        "assert all(bytes(blosc.compress(d, c, 5, blosc.SHUFFLE, ts)) == f"
        "           for (d, c, ts), f in zip(cases, fused))"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        str(blob),
    )
    env = dict(
        os.environ, TPU_BLOSC_NO_FUSED_BIG="1", TPU_BLOSC_NO_DEVICE="1"
    )
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, timeout=300,
        capture_output=True,
    )


@pytest.mark.parametrize("n", [48 * 1024, 64 * 1024, 100 * 1024, 127 * 1024])
@pytest.mark.parametrize("level", [1, 3, 5, 9])
@pytest.mark.parametrize("mode", ["noshuffle", "shuffle"])
def test_zlib_small_segment_dictionary_clamp(n, level, mode):
    """48-127 KiB zlib frames have segments under 32 KiB; the libz
    dictionary priming must clamp to the bytes that actually precede the
    segment.  The unclamped form primed from BEFORE the buffer (heap
    OOB read) and emitted invalid-distance streams that CPython zlib
    rejected (round-4 session-2 regression; ASan-confirmed)."""
    import zlib as _z

    sh = blosc.SHUFFLE if mode == "shuffle" else blosc.NOSHUFFLE
    ts = 4 if mode == "shuffle" else 1
    data = bytes(bytearray(((i * 7 + i // 997) & 0xFF) for i in range(n)))
    frame = blosc.compress(data, blosc.ZLIB, level, sh, ts)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        body = _z.decompress(bytes(frame[16 : h.nbytes_comp]))
        assert body == bytes(_filtered(data, sh, ts))


def test_zlib_parallel_inflate_roundtrip_and_adversarial():
    """>= 48 KiB single-block zlib frames decode in parallel when the
    Z_SYNC_FLUSH seam scan finds exactly nseg-1 markers; validation is
    per-piece exact sizes + whole-stream adler32, serial fallback
    otherwise.  Data CONTAINING the 00 00 FF FF marker bytes (stored
    blocks) must still roundtrip — false candidates reject into the
    serial decoder, never corrupt."""
    import zlib as _z

    # big parallel case (nseg=8)
    n = 1 << 20
    data = np.arange(n // 4, dtype=np.float32).tobytes()
    frame = blosc.compress(data, blosc.ZLIB, 5, blosc.SHUFFLE, 4)
    assert blosc.decompress(frame) == data
    # adversarial: marker bytes inside stored/compressed data
    evil = (b"\x00\x00\xff\xff" * 300 + bytes(1000)) * 200
    for level, sh, ts in ((1, blosc.NOSHUFFLE, 1), (9, blosc.SHUFFLE, 4)):
        f = blosc.compress(evil, blosc.ZLIB, level, sh, ts)
        assert blosc.decompress(f) == evil
    # foreign serial stream under our header: must take the serial path
    from tpu_blosc.format import FORMAT_VERSION, HEADER_SIZE, Header

    stream = _z.compress(data, 6)
    h = Header(
        version=FORMAT_VERSION, version_lz=4, flags=0, type_size=1,
        nbytes_orig=n, block_size=n, nbytes_comp=HEADER_SIZE + len(stream),
    )
    assert blosc.decompress(h.to_bytes() + stream) == data
    # corruption parity vs the CPython-zlib ORACLE: the parallel path
    # validates hard (exact piece sizes + adler) or rejects into the
    # serial decoder — it must never accept what a standard inflate
    # rejects, nor produce different bytes when both accept
    for pos in (20, len(frame) // 2, len(frame) - 6):
        bad = bytearray(frame)
        bad[pos] ^= 0x40
        payload = bytes(bad[16 : blosc.get_info(frame).nbytes_comp])
        try:
            want = _z.decompress(payload)
            if len(want) != n:
                want = None
        except _z.error:
            want = None
        try:
            got = blosc.decompress(bytes(bad))
        except blosc.BloscError:
            got = None
        if want is None:
            assert got is None or got == data  # redundant-bit hits only
        else:
            assert got == bytes(
                np.frombuffer(want, np.uint8)
                .reshape(4, -1).T.reshape(-1)
            ) or got == want or got is None


def test_zlib_ts1_shuffle_matches_noshuffle_size():
    """ts=1 makes the shuffle a no-op, so the segmented zlib encoder must
    route by 'did filtering RUN' (it did not), not by the mode flag:
    unfiltered text through libdeflate measured 2.7x larger (regression
    test for the frame_encode_slice gate)."""
    rng = np.random.default_rng(7)
    words = [
        bytes(rng.integers(97, 123, rng.integers(3, 9)).astype(np.uint8))
        for _ in range(500)
    ]
    text = b" ".join(words[i % 500] for i in range(40000))[: 200 * 1024]
    a = blosc.compress(text, blosc.ZLIB, 5, blosc.SHUFFLE, 1)
    b = blosc.compress(text, blosc.ZLIB, 5, blosc.NOSHUFFLE, 1)
    assert blosc.decompress(a) == text
    assert a[16:] == b[16:]  # identical payload, only header flags differ


@pytest.mark.parametrize("n", [
    SMALL_MIN, SMALL_MIN + 3, 100 * 1024, 100 * 1024 + 2, SEG_MIN - 1,
])
def test_small_frame_fused_shuffle_stream(n):
    """The fused path's plane-aligned stitched stream must decode with the
    independent pure-Python LZ4 decoder and roundtrip — including tails
    (n % 4 != 0) absorbed by the last segment."""
    data = bytes(bytearray((i * 7 + i // 997) % 256 for i in range(n)))
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        body = lz4_ref.decompress_block(
            bytes(frame[16 : h.nbytes_comp]), h.nbytes_orig
        )
        assert bytes(body) == bytes(_filtered(data, blosc.SHUFFLE, 4))


def test_small_frame_lane_invariance():
    """Fused segmentation is a pure function of (n, codec, ts, mode):
    a 1-lane pool (serial fallback) must produce identical bytes — this
    is what keeps batch-encoded frames byte-identical to scalar calls."""
    n = 100 * 1024
    data = bytes(bytearray((i * 13) % 251 for i in range(n)))
    old = nb.num_threads()
    try:
        frames = []
        for t in (1, 4):
            nb.set_num_threads(t)
            frames.append(blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4))
    finally:
        nb.set_num_threads(old)
    assert frames[0] == frames[1]
    assert blosc.decompress(frames[0]) == data


def test_small_frame_below_floor_stays_serial(tmp_path):
    """Below kSmallFrameMin the fused path must NOT engage: bytes equal
    the forced-serial encoder's (TPU_BLOSC_NO_FRAME_PARALLEL=1, which is
    read once at library init → subprocess), so reference-config pins for
    tiny frames stay stable."""
    import os
    import subprocess
    import sys

    n = SMALL_MIN - 4096
    data = bytes(bytearray(i % 256 for i in range(n)))
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    assert blosc.decompress(frame) == data
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "serial.frame"
    code = (
        "import sys; sys.path.insert(0, %r);"
        "import tpu_blosc as blosc;"
        "d = open(%r,'rb').read();"
        "f = blosc.compress(d, blosc.LZ4, 5, blosc.SHUFFLE, 4);"
        "open(%r,'wb').write(f)"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        str(src), str(out),
    )
    env = dict(
        os.environ, TPU_BLOSC_NO_FRAME_PARALLEL="1", TPU_BLOSC_NO_DEVICE="1"
    )
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, timeout=300,
        capture_output=True,
    )
    assert out.read_bytes() == frame  # sub-floor frames ARE the serial bytes


def test_small_frame_noshuffle_stays_serial():
    """Noshuffle small frames are NOT segmented (contiguous segments
    carry unbalanced work and measured slower — see tpb_compress_frame):
    bytes must equal the serial encoder's."""
    n = 100 * 1024
    rng = np.random.default_rng(5)
    base = np.arange(n, dtype=np.uint8)
    base[rng.integers(0, n, n // 50)] = 0
    data = base.tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    assert blosc.decompress(frame) == data
    h = blosc.get_info(frame)
    if not (h.flags & 0x2):
        body = lz4_ref.decompress_block(
            bytes(frame[16 : h.nbytes_comp]), h.nbytes_orig
        )
        assert bytes(body) == data


def test_small_frame_batch_scalar_byte_identity():
    """Batch-encoded 100 KB frames (whole-frame pool slices running the
    fused segments serially) must stay byte-identical to scalar calls."""
    db = bytes(bytearray(i % 256 for i in range(100 * 1024)))
    items = [db] * 8
    fb = blosc.compress_batch(items)
    scalar = blosc.compress(db)
    assert all(f == scalar for f in fb)
    assert blosc.decompress_batch(fb) == items


def test_fused_small_frame_decode_matches_serial(monkeypatch):
    """Round-5 fused decode+unshuffle (one pool dispatch for LZ4 chunk
    decode AND unshuffle, tpublosc.cpp fused_dec_slice) must produce
    exactly the serial path's output across its engagement range,
    including verbatim tails (n % ts != 0), both ts values, and LZ4HC."""
    import os

    cases = [
        (blosc.LZ4, 4, 100 * 1024),
        (blosc.LZ4, 4, 100 * 1024 + 3),   # tail rides the last slice
        (blosc.LZ4, 2, 128 * 1024),       # ts=2 above the 96 KiB floor
        (blosc.LZ4, 2, 128 * 1024 + 1),   # ts=2 with a verbatim tail
        (blosc.LZ4, 2, 49 * 1024 + 1),    # below the floor: serial both
        (blosc.LZ4, 4, 255 * 1024),       # top of the small-frame window
        (blosc.LZ4HC, 4, 100 * 1024),
        (blosc.SNAPPY, 4, 100 * 1024),    # concat-body codec
        (blosc.SNAPPY, 2, 128 * 1024),
        (blosc.BLOSCLZ, 4, 100 * 1024),   # plain-concat codec
        (blosc.BLOSCLZ, 2, 128 * 1024 + 3),
    ]
    for codec, ts, n in cases:
        data = bytes(bytearray((i * 7 + (i >> 3)) % 256 for i in range(n)))
        frame = blosc.compress(data, codec, 5, blosc.SHUFFLE, ts)
        out_fused = blosc.decompress(frame)
        monkeypatch.setitem(os.environ, "TPU_BLOSC_NO_FUSED_DECODE", "1")
        out_serial = blosc.decompress(frame)
        monkeypatch.delitem(os.environ, "TPU_BLOSC_NO_FUSED_DECODE")
        assert out_fused == out_serial == data, (codec, ts, n)


def test_fused_decode_rejects_foreign_serial_stream():
    """A serially-encoded (non-seam) stream in the fused window must fall
    back to the serial decoder via the scan reject — exercised with a
    pure-Python reference encoding wrapped in a hand-built header."""
    import struct

    n = 100 * 1024
    data = bytes(bytearray((i * 13) % 251 for i in range(n)))
    shuffled = filters.shuffle_bytes(data, 4).tobytes()
    payload = bytes(lz4_ref.compress_block(shuffled))
    assert len(payload) < n
    header = struct.pack(
        "<BBBBIII", 2, 1, 0x1, 4, n, n, 16 + len(payload)
    )
    assert blosc.decompress(header + payload) == data
