"""Batch frame API tests.

Contract under test: ``compress_batch`` / ``decompress_batch`` are
semantically identical to mapping the scalar API over the items —
including output BYTES (batching changes scheduling, never bytes; see
tpb_compress_batch in native/tpublosc.cpp) and including the typed error
raised for the first offending item.  The reference has no batch surface
(one frame per call, blosc.go:257-303); this is a beyond-parity API.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tpu_blosc as blosc
from tpu_blosc.options import Options

rng = np.random.default_rng(7)

ALL_CODECS = [
    blosc.BLOSCLZ, blosc.LZ4, blosc.LZ4HC, blosc.SNAPPY, blosc.ZLIB,
    blosc.ZSTD,
]
ALL_SHUFFLES = [blosc.NOSHUFFLE, blosc.SHUFFLE, blosc.BITSHUFFLE]


def mixed_items() -> list[bytes]:
    """Sizes spanning serial, pool-sliced, segment-parallel, multi-block."""
    return [
        b"z",
        bytes(bytearray(i % 256 for i in range(100 * 1024))),  # ref config
        rng.integers(0, 255, 333, dtype=np.uint8).tobytes(),   # noise
        np.arange(9000, dtype=np.float32).tobytes(),
        b"ab" * (300 * 1024),                                  # >256 KiB
        np.arange(1_200_000, dtype=np.float32).tobytes(),      # >4 MiB
    ]


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_batch_bytes_identical_to_scalar(codec):
    items = mixed_items()
    batch = blosc.compress_batch(items, codec, 5, blosc.SHUFFLE, 4)
    scalar = [blosc.compress(d, codec, 5, blosc.SHUFFLE, 4) for d in items]
    assert batch == scalar
    assert blosc.decompress_batch(batch) == items


@pytest.mark.parametrize("shuffle", ALL_SHUFFLES)
def test_batch_shuffle_modes(shuffle):
    items = mixed_items()
    batch = blosc.compress_batch(items, blosc.LZ4, 5, shuffle, 8)
    scalar = [blosc.compress(d, blosc.LZ4, 5, shuffle, 8) for d in items]
    assert batch == scalar
    assert blosc.decompress_batch(batch) == items


def test_batch_with_options_block_size():
    # explicit block_size forces the multi-block path for every item;
    # results must still match the scalar call exactly
    opts = Options(codec=blosc.LZ4, level=5, shuffle=blosc.SHUFFLE,
                   type_size=4, block_size=64 * 1024)
    items = [np.arange(50_000, dtype=np.float32).tobytes(), b"q" * 1000]
    batch = blosc.compress_batch_with_options(items, opts)
    assert batch == [blosc.compress_with_options(d, opts) for d in items]
    assert blosc.decompress_batch(batch) == items


def test_batch_empty_list_and_single():
    assert blosc.compress_batch([]) == []
    assert blosc.decompress_batch([]) == []
    one = blosc.compress_batch([b"hello world"])
    assert one == [blosc.compress(b"hello world")]
    assert blosc.decompress_batch(one) == [b"hello world"]


def test_batch_empty_item_raises_with_index():
    with pytest.raises(blosc.InvalidDataError, match="batch item 1"):
        blosc.compress_batch([b"ok", b""])


def test_batch_accepts_ndarray_items():
    arrs = [np.arange(100, dtype=np.int16), np.ones(64, dtype=np.float64)]
    batch = blosc.compress_batch(arrs, blosc.LZ4, 5, blosc.SHUFFLE, 2)
    assert blosc.decompress_batch(batch) == [a.tobytes() for a in arrs]


def test_decompress_batch_mixed_codecs_and_special_frames():
    """One batch mixing codecs, memcpy, multi-block, and container frames."""
    ramp = np.arange(30_000, dtype=np.float32).tobytes()
    frames = [
        blosc.compress(ramp, blosc.ZSTD, 5, blosc.SHUFFLE, 4),
        blosc.compress(ramp, blosc.LZ4, 5, blosc.BITSHUFFLE, 4),
        # memcpy frame (incompressible noise)
        blosc.compress(rng.integers(0, 255, 5000, dtype=np.uint8).tobytes(),
                       blosc.LZ4, 5, blosc.NOSHUFFLE, 1),
        # multi-block FLAG_SPLIT frame
        blosc.compress_with_options(
            ramp, Options(codec=blosc.LZ4, block_size=8192, type_size=4)),
        blosc.compress(ramp, blosc.SNAPPY, 5, blosc.NOSHUFFLE, 4),
    ]
    expected = [blosc.decompress(f) for f in frames]
    assert blosc.decompress_batch(frames) == expected


def test_decompress_batch_type_size_override():
    data = np.arange(4096, dtype=np.float32).tobytes()
    frame = blosc.compress(data, blosc.LZ4, 5, blosc.SHUFFLE, 4)
    want = blosc.decompress_with_size(frame, 8)
    assert blosc.decompress_batch([frame, frame], 8) == [want, want]


def test_decompress_batch_error_matches_scalar():
    good = blosc.compress(b"payload data here" * 10)
    # corrupt payload: scalar raises DecompressionFailedError
    bad = bytearray(good)
    bad[20] ^= 0xFF
    bad = bytes(bad)
    try:
        blosc.decompress(bad)
        scalar_err = None
    except blosc.BloscError as e:
        scalar_err = type(e)
    if scalar_err is not None:
        with pytest.raises(scalar_err):
            blosc.decompress_batch([good, bad])
    with pytest.raises(blosc.InvalidHeaderError):
        blosc.decompress_batch([good, b"\x02tooshort"])
    with pytest.raises(blosc.InvalidVersionError):
        blosc.decompress_batch([good, b"\x07" + good[1:]])


def test_decompress_batch_forged_size_mismatch():
    good = blosc.compress(np.arange(2048, dtype=np.float32).tobytes())
    forged = bytearray(good)
    forged[4:8] = (int.from_bytes(good[4:8], "little") + 8).to_bytes(
        4, "little")
    with pytest.raises(blosc.SizeMismatchError):
        blosc.decompress_batch([good, bytes(forged)])


def test_batch_respects_registry_override():
    """A user-registered codec must win over the native fast path (≙ the
    override-wins semantics of RegisterCodec, codec.go:36-38)."""
    from tpu_blosc.codecs.registry import register_codec

    class Identity:
        def name(self):
            return "identity"

        def compress(self, data, level):
            return bytes(data)

        def decompress(self, data, expected_size):
            return bytes(data)

    original = blosc.get_codec(blosc.Codec.LZ4)
    register_codec(blosc.Codec.LZ4, Identity())
    try:
        items = [b"abcabcabc" * 50, b"xyz" * 400]
        batch = blosc.compress_batch(items, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
        scalar = [blosc.compress(d, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
                  for d in items]
        assert batch == scalar
        assert blosc.decompress_batch(batch) == items
    finally:
        register_codec(blosc.Codec.LZ4, original)


def test_batch_fallback_without_fastcall_module(monkeypatch):
    """With _tpbfast absent the wrappers must degrade to scalar loops."""
    from tpu_blosc.native import backend

    if not backend.available():
        pytest.skip("native backend unavailable")
    monkeypatch.setattr(backend, "_fast", None)
    items = mixed_items()[:4]
    batch = blosc.compress_batch(items)
    assert batch == [blosc.compress(d) for d in items]
    assert blosc.decompress_batch(batch) == items


def test_batch_concurrent_callers():
    """Two threads batching concurrently: the pool serializes via try_lock,
    the loser runs serially — results stay correct either way."""
    import threading

    items = [os.urandom(2000) + b"A" * 60_000 for _ in range(16)]
    expected = [blosc.compress(d) for d in items]
    results: dict = {}

    def work(k):
        for _ in range(5):
            results[k] = blosc.compress_batch(items)

    threads = [threading.Thread(target=work, args=(k,)) for k in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0] == expected and results[1] == expected


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=4000), min_size=1, max_size=12),
    st.sampled_from([blosc.LZ4, blosc.ZSTD, blosc.BLOSCLZ]),
    st.sampled_from(ALL_SHUFFLES),
    st.sampled_from([1, 2, 4, 8]),
)
def test_batch_property_roundtrip(items, codec, shuffle, ts):
    batch = blosc.compress_batch(items, codec, 5, shuffle, ts)
    assert batch == [blosc.compress(d, codec, 5, shuffle, ts) for d in items]
    assert blosc.decompress_batch(batch) == items


def test_decompress_batch_into_matches_scalar():
    items = mixed_items()
    frames = blosc.compress_batch(items)
    outs = [bytearray(len(d)) for d in items]
    counts = blosc.decompress_batch_into(frames, outs)
    assert counts == [len(d) for d in items]
    assert [bytes(o) for o in outs] == items


def test_decompress_batch_into_numpy_outs_and_oversize():
    data = np.arange(5000, dtype=np.float32)
    frame = blosc.compress(data.tobytes(), blosc.LZ4, 5, blosc.SHUFFLE, 4)
    out = np.empty(5000, dtype=np.float32)
    big = bytearray(len(data.tobytes()) + 100)  # oversized out is fine
    counts = blosc.decompress_batch_into([frame, frame], [out, big])
    assert counts == [data.nbytes, data.nbytes]
    np.testing.assert_array_equal(out, data)
    assert bytes(big[: data.nbytes]) == data.tobytes()


def test_decompress_batch_into_error_paths():
    data = b"hello world " * 100
    frame = blosc.compress(data)
    with pytest.raises(blosc.InvalidDataError, match="too small"):
        blosc.decompress_batch_into([frame], [bytearray(10)])
    with pytest.raises(TypeError):
        # read-only out buffer: scalar path owns the error
        blosc.decompress_batch_into([frame], [b"x" * len(data)])
    with pytest.raises(ValueError, match="must match"):
        blosc.decompress_batch_into([frame, frame], [bytearray(len(data))])


def test_decompress_batch_into_special_frames():
    from tpu_blosc.options import Options

    data = np.arange(300_000, dtype=np.float32).tobytes()
    split = blosc.compress_with_options(
        data, Options(codec=blosc.LZ4, block_size=65536, type_size=4))
    memcpy = blosc.compress(os.urandom(4000), blosc.LZ4, 5,
                            blosc.NOSHUFFLE, 1)
    outs = [bytearray(len(data)), bytearray(4000)]
    counts = blosc.decompress_batch_into([split, memcpy], outs)
    assert counts == [len(data), 4000]
    assert bytes(outs[0]) == data
    assert bytes(outs[1]) == blosc.decompress(memcpy)


def test_stream_read_many_into(tmp_path):
    from tpu_blosc.stream import StreamReader, StreamWriter

    chunks = [np.arange(20_000, dtype=np.float32).tobytes(),
              b"abc" * 5000, os.urandom(3000)]
    path = tmp_path / "s.tpbs"
    with StreamWriter(path, checksum=True) as w:
        w.write_many(chunks)
    with StreamReader(path) as r:
        outs = [bytearray(len(c)) for c in chunks]
        assert r.read_many_into(range(3), outs) == [len(c) for c in chunks]
        assert [bytes(o) for o in outs] == chunks


def test_stream_read_many_into_dict_records(tmp_path):
    from tpu_blosc.stream import StreamReader, StreamWriter

    recs = [b"shared structure " * 8 + bytes([i]) * 30 for i in range(10)]
    path = tmp_path / "d.tpbs"
    with StreamWriter(path, train_dict=8) as w:
        w.write_many(recs)
    with StreamReader(path) as r:
        outs = [bytearray(len(x)) for x in recs]
        assert r.read_many_into(range(len(recs)), outs) == [
            len(x) for x in recs]
        assert [bytes(o) for o in outs] == recs


def test_batch_with_num_threads_one(monkeypatch):
    """tpb_set_num_threads(1) drops the pool to one lane; the batch entry
    points must fall back to in-place serial loops with identical bytes."""
    from tpu_blosc.native import backend

    if not backend.available():
        pytest.skip("native backend unavailable")
    items = [os.urandom(500) + b"B" * 50_000 for _ in range(8)]
    expected = blosc.compress_batch(items)
    backend._lib.tpb_set_num_threads(1)
    try:
        assert blosc.compress_batch(items) == expected
        assert blosc.decompress_batch(expected) == items
    finally:
        backend._lib.tpb_set_num_threads(4)


def test_batch_with_frame_parallel_disabled():
    """TPU_BLOSC_NO_FRAME_PARALLEL only affects intra-frame segmentation;
    batch scheduling stays on and bytes match the scalar calls (both see
    the same serial frame encoder)."""
    import subprocess
    import sys

    code = """
import tpu_blosc as blosc
items = [bytes(bytearray(i % 251 for i in range(s))) for s in (70_000, 400_000)]
batch = blosc.compress_batch(items)
scalar = [blosc.compress(d) for d in items]
assert batch == scalar
assert blosc.decompress_batch(batch) == items
print("OK")
"""
    env = dict(os.environ, TPU_BLOSC_NO_FRAME_PARALLEL="1",
               TPU_BLOSC_NO_DEVICE="1")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr


def test_batch_concurrent_decompress():
    import threading

    items = [os.urandom(1000) + b"C" * 40_000 for _ in range(12)]
    frames = blosc.compress_batch(items)
    results: dict = {}

    def work(k):
        for _ in range(5):
            results[k] = blosc.decompress_batch(frames)

    threads = [threading.Thread(target=work, args=(k,)) for k in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0] == items and results[1] == items
