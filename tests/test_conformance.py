"""Third-party conformance gate: system liblz4 / libsnappy via ctypes.

The reference's LZ4/LZ4HC/Snappy codecs ARE independent third-party
libraries (pierrec/lz4 at /root/reference/codec.go:63-84, klauspost
snappy at codec.go:228-244), so every reference frame is implicitly
cross-implementation-validated.  Our encoders and decoders are written
from scratch and could, in principle, share one misreading of the spec
while the whole suite stays green.  This gate crosses the implementation
boundary both ways:

  (a) every stream CLASS our encoders can emit — serial, 4- and 8-segment
      seam-stitched parallel, scan-emitter, batch-produced, LZ4HC, the
      device match strategy's ``lz4_emit_mixed`` records streams
      (tpublosc.cpp:1154) and the RLE strategy's ``lz4_emit_runs`` —
      must decode bit-exactly under the SYSTEM ``liblz4.so.1`` /
      ``libsnappy.so.1``;
  (b) foreign frames whose payloads were encoded by the system libs
      (LZ4_compress_default, LZ4_compress_HC, snappy_compress) must
      decode bit-exactly under OUR decoder.

Skips gracefully when the system libraries are absent (CI installs them;
see .github/workflows/ci.yml).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc import chunk, format as tbformat
from tpu_blosc.filters import reference as fref
from tpu_blosc.native import backend as nb
from tpu_blosc.options import Options


def _load(name: str):
    for cand in (name, ctypes.util.find_library(name.split(".")[0][3:])):
        if not cand:
            continue
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    return None


_LZ4 = _load("liblz4.so.1")
_SNAPPY = _load("libsnappy.so.1")

if _LZ4 is None or _SNAPPY is None:  # pragma: no cover - CI installs both
    pytest.skip(
        "system liblz4/libsnappy not available", allow_module_level=True
    )

_LZ4.LZ4_decompress_safe.restype = ctypes.c_int
_LZ4.LZ4_decompress_safe.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
]
_LZ4.LZ4_compress_default.restype = ctypes.c_int
_LZ4.LZ4_compress_default.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
]
_LZ4.LZ4_compress_HC.restype = ctypes.c_int
_LZ4.LZ4_compress_HC.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_int,
]
_SNAPPY.snappy_uncompress.restype = ctypes.c_int
_SNAPPY.snappy_uncompress.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t),
]
_SNAPPY.snappy_uncompressed_length.restype = ctypes.c_int
_SNAPPY.snappy_uncompressed_length.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
]
_SNAPPY.snappy_compress.restype = ctypes.c_int
_SNAPPY.snappy_compress.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t),
]
_SNAPPY.snappy_max_compressed_length.restype = ctypes.c_size_t
_SNAPPY.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]


def sys_lz4_decompress(payload: bytes, expected_size: int) -> bytes:
    dst = ctypes.create_string_buffer(expected_size)
    n = _LZ4.LZ4_decompress_safe(payload, dst, len(payload), expected_size)
    assert n == expected_size, f"liblz4 decode returned {n}"
    return dst.raw[:n]


def sys_lz4_compress(data: bytes, hc: bool = False) -> bytes:
    cap = len(data) + len(data) // 255 + 16
    dst = ctypes.create_string_buffer(cap)
    if hc:
        n = _LZ4.LZ4_compress_HC(data, dst, len(data), cap, 9)
    else:
        n = _LZ4.LZ4_compress_default(data, dst, len(data), cap)
    assert n > 0
    return dst.raw[:n]


def sys_snappy_uncompress(payload: bytes) -> bytes:
    out_len = ctypes.c_size_t(0)
    rc = _SNAPPY.snappy_uncompressed_length(
        payload, len(payload), ctypes.byref(out_len)
    )
    assert rc == 0, "libsnappy rejected the preamble"
    dst = ctypes.create_string_buffer(out_len.value)
    n = ctypes.c_size_t(out_len.value)
    rc = _SNAPPY.snappy_uncompress(payload, len(payload), dst, ctypes.byref(n))
    assert rc == 0, f"libsnappy decode failed ({rc})"
    return dst.raw[: n.value]


def sys_snappy_compress(data: bytes) -> bytes:
    cap = _SNAPPY.snappy_max_compressed_length(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = ctypes.c_size_t(cap)
    rc = _SNAPPY.snappy_compress(data, len(data), dst, ctypes.byref(n))
    assert rc == 0
    return dst.raw[: n.value]


def _filter(raw: bytes, opts: Options) -> bytes:
    if opts.shuffle == blosc.SHUFFLE and opts.type_size > 1:
        return fref.shuffle_bytes(raw, opts.type_size).tobytes()
    if opts.shuffle == blosc.BITSHUFFLE and opts.type_size > 1:
        return fref.bit_shuffle(raw, opts.type_size).tobytes()
    return raw


def iter_streams(frame: bytes, opts: Options):
    """Yield (codec_payload, expected_filtered_bytes) for every
    non-memcpy codec stream in a frame (single-block or FLAG_SPLIT)."""
    header = tbformat.parse_header(frame)
    raw_equiv = blosc.decompress(frame)  # round-trip sanity + raw bytes
    if not header.is_split:
        assert not header.is_memcpy, "test data must not take memcpy"
        yield frame[16 : header.nbytes_comp], _filter(raw_equiv, opts)
        return
    entries, off = chunk.parse_block_table(frame, header)
    bs = header.block_size
    for i, (psize, is_memcpy) in enumerate(entries):
        payload = frame[off : off + psize]
        off += psize
        if is_memcpy:
            continue
        block = raw_equiv[i * bs : (i + 1) * bs]
        yield payload, _filter(block, opts)


def assert_frame_conformant_lz4(frame: bytes, opts: Options):
    n = 0
    for payload, expect in iter_streams(frame, opts):
        assert sys_lz4_decompress(payload, len(expect)) == expect
        n += 1
    assert n >= 1, "no codec streams produced (all memcpy?)"


RNG = np.random.default_rng(2024)


def _ramp_f32(nbytes: int) -> bytes:
    return np.linspace(0, 1000, nbytes // 4, dtype=np.float32).tobytes()


def _noisy_f32(nbytes: int) -> bytes:
    # tiled pattern + noise: compressible but not trivially (mixed tokens)
    base = np.tile(RNG.standard_normal(256).astype(np.float32), nbytes // 1024)
    base += 0.01 * RNG.standard_normal(base.size).astype(np.float32)
    return base.tobytes()


# ---------------------------------------------------------------------------
# (a) our streams decode under the system libraries
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", [blosc.LZ4, blosc.LZ4HC])
def test_lz4_serial_100kb_stream(codec):
    """The reference's own benchmark config: 100 KB.  For LZ4 and LZ4HC
    this is now the FUSED small-frame class (4 plane-aligned stitched
    segments, round 4)."""
    data = _ramp_f32(100_000 // 4 * 4)
    opts = Options(codec=codec, shuffle=blosc.SHUFFLE, type_size=4)
    frame = blosc.compress_with_options(data, opts)
    assert_frame_conformant_lz4(frame, opts)


@pytest.mark.parametrize(
    "nbytes", [48 * 1024, 48 * 1024 + 3, 100 * 1024 + 2, 256 * 1024 - 4]
)
def test_lz4_fused_small_frame_streams(nbytes):
    """Round-4 fused small-frame class (48 KiB <= n < 256 KiB, shuffle
    ts=4): plane-aligned stitched segments, the last one absorbing the
    n % 4 tail — must decode under the system liblz4 like every other
    stream class."""
    data = bytes(bytearray((i * 7 + i // 997) % 256 for i in range(nbytes)))
    opts = Options(codec=blosc.LZ4, shuffle=blosc.SHUFFLE, type_size=4)
    frame = blosc.compress_with_options(data, opts)
    assert blosc.decompress(frame) == data
    assert_frame_conformant_lz4(frame, opts)


@pytest.mark.parametrize("codec", [blosc.LZ4, blosc.LZ4HC])
@pytest.mark.parametrize("nbytes", [1 << 20, 4 << 20])
def test_lz4_segment_parallel_streams(codec, nbytes):
    """1 MiB → 4-segment, 4 MiB → 8-segment seam-stitched single streams
    (tpublosc.cpp lz4_frame_parallel): the exotic class — non-final
    literal-only tails merged into the next segment's first sequence."""
    data = _noisy_f32(nbytes)
    opts = Options(codec=codec, shuffle=blosc.SHUFFLE, type_size=4)
    frame = blosc.compress_with_options(data, opts)
    assert_frame_conformant_lz4(frame, opts)


def test_lz4_scan_emitter_stream():
    """Bitshuffled f32 with noisy mantissas engages the fixed-offset scan
    encoder + word-walk emitter (BASELINE 16 MiB config, scaled down)."""
    data = _noisy_f32(2 << 20)
    opts = Options(codec=blosc.LZ4, shuffle=blosc.BITSHUFFLE, type_size=4)
    frame = blosc.compress_with_options(data, opts)
    assert_frame_conformant_lz4(frame, opts)


def test_lz4_multiblock_streams():
    """FLAG_SPLIT frames: every per-block stream is independently valid."""
    data = _noisy_f32(8 << 20)
    opts = Options(
        codec=blosc.LZ4, shuffle=blosc.SHUFFLE, type_size=4,
        block_size=1 << 20,
    )
    frame = blosc.compress_with_options(data, opts)
    assert_frame_conformant_lz4(frame, opts)


def test_lz4_batch_streams():
    """compress_batch routes small frames through SpinPool workers — the
    bytes must stay conformant (and identical to scalar calls)."""
    opts = Options(codec=blosc.LZ4, shuffle=blosc.SHUFFLE, type_size=4)
    items = [_ramp_f32(100_000 // 4 * 4) for _ in range(8)]
    frames = blosc.compress_batch_with_options(items, opts)
    for item, frame in zip(items, frames):
        assert frame == blosc.compress_with_options(item, opts)
        assert_frame_conformant_lz4(frame, opts)


def test_lz4_emit_mixed_records_stream():
    """The device match strategy's host emitter (tpublosc.cpp:1154):
    O(records) fixed-offset match streams must be standard LZ4."""
    if not nb.available():
        pytest.skip("native backend unavailable")
    ts, seg = 4, 4096
    n = ts * seg
    row_d = np.array([1, 4, 8, 16], dtype=np.int32)
    rows = []
    for t, d in enumerate(row_d):
        row = np.tile(
            RNG.integers(0, 256, d, dtype=np.uint8), seg // d + 1
        )[:seg]
        # sprinkle ~2% literal breaks
        bad = RNG.choice(seg, seg // 50, replace=False)
        row[bad] = RNG.integers(0, 256, bad.size, dtype=np.uint8)
        rows.append(row)
    block = np.concatenate(rows)
    # literal mask: positions forward-fill at offset d cannot produce
    # (first d bytes of each row + every break), then the emitter's
    # structural preconditions the device opening guarantees upstream:
    # a literal tail closing the block and no match shorter than 4
    mask = np.zeros(n, bool)
    for t, d in enumerate(row_d):
        row = rows[t]
        mask[t * seg : (t + 1) * seg] = np.concatenate(
            [np.ones(d, bool), row[d:] != row[:-d]]
        )
    mask[n - 12 :] = True
    # close match runs shorter than kMinMatch=4 into literals
    padded = np.concatenate([[True], mask, [True]])
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    for a, b in zip(edges[::2], edges[1::2]):  # [a, b) is a False run
        if b - a < 4:
            mask[a:b] = True
    lit_pos = np.flatnonzero(mask).astype(np.int64)
    lit_bytes = block[mask]
    stream = nb.lz4_emit_mixed(lit_pos, lit_bytes, row_d, seg, n)
    assert stream is not None
    expect = block.tobytes()
    # system liblz4 decodes it
    assert sys_lz4_decompress(stream, n) == expect
    # and our own decoder agrees
    assert nb.lz4_decompress(stream, n) == expect


def test_lz4_emit_runs_stream():
    """The device RLE strategy's host emitter: run records → LZ4."""
    if not nb.available():
        pytest.skip("native backend unavailable")
    lens = RNG.integers(1, 5000, 200).astype(np.int64)
    vals = RNG.integers(0, 256, 200).astype(np.uint8)
    n = int(lens.sum())
    stream = nb.lz4_emit_runs(vals, lens, n)
    expect = np.repeat(vals, lens).tobytes()
    assert sys_lz4_decompress(stream, n) == expect
    assert nb.lz4_decompress(stream, n) == expect


@pytest.mark.parametrize("nbytes", [100_000, 1 << 20, 4 << 20])
def test_snappy_streams(nbytes):
    """Fused small-frame (48-256 KiB, round 4) and segment-parallel
    (≥256 KiB) snappy bodies under one global uvarint preamble must
    satisfy libsnappy."""
    data = _noisy_f32(nbytes)
    opts = Options(codec=blosc.SNAPPY, shuffle=blosc.SHUFFLE, type_size=4)
    frame = blosc.compress_with_options(data, opts)
    seen = 0
    for payload, expect in iter_streams(frame, opts):
        assert sys_snappy_uncompress(payload) == expect
        seen += 1
    assert seen >= 1


def test_snappy_batch_streams():
    opts = Options(codec=blosc.SNAPPY, shuffle=blosc.SHUFFLE, type_size=4)
    items = [_noisy_f32(100_000) for _ in range(6)]
    for frame, item in zip(
        blosc.compress_batch_with_options(items, opts), items
    ):
        for payload, expect in iter_streams(frame, opts):
            assert sys_snappy_uncompress(payload) == expect


# ---------------------------------------------------------------------------
# (b) foreign system-lib frames decode under our decoder
# ---------------------------------------------------------------------------


def _foreign_frame(codec_id: int, payload: bytes, raw_len: int,
                   flags: int, type_size: int, block_size: int) -> bytes:
    h = tbformat.Header(
        version=tbformat.FORMAT_VERSION,
        version_lz=codec_id,
        flags=flags,
        type_size=type_size,
        nbytes_orig=raw_len,
        block_size=block_size,
        nbytes_comp=16 + len(payload),
    )
    return h.to_bytes() + payload


@pytest.mark.parametrize("hc", [False, True])
@pytest.mark.parametrize("nbytes", [100_000, 1 << 20, 4 << 20])
def test_foreign_lz4_frames_decode(hc, nbytes):
    """liblz4-encoded payloads (≙ what the reference's pierrec encoder
    ships) must decode under our native + python decoders at every size
    class, including the ones our parallel pre-scan inspects."""
    data = _noisy_f32(nbytes)
    filtered = fref.shuffle_bytes(data, 4).tobytes()
    payload = sys_lz4_compress(filtered, hc=hc)
    codec_id = int(blosc.LZ4HC) if hc else int(blosc.LZ4)
    frame = _foreign_frame(
        codec_id, payload, len(data), tbformat.FLAG_SHUFFLE, 4, len(data)
    )
    assert blosc.decompress(frame) == data


@pytest.mark.parametrize("nbytes", [100_000, 1 << 20])
def test_foreign_snappy_frames_decode(nbytes):
    data = _noisy_f32(nbytes)
    filtered = fref.shuffle_bytes(data, 4).tobytes()
    payload = sys_snappy_compress(filtered)
    frame = _foreign_frame(
        int(blosc.SNAPPY), payload, len(data), tbformat.FLAG_SHUFFLE, 4,
        len(data),
    )
    assert blosc.decompress(frame) == data


def test_foreign_lz4_python_fallback_decodes():
    """The pure-Python LZ4 decoder (the oracle) reads liblz4 streams."""
    from tpu_blosc.codecs import lz4_ref

    data = _noisy_f32(200_000)
    payload = sys_lz4_compress(data)
    assert lz4_ref.decompress_block(payload, len(data)) == data
