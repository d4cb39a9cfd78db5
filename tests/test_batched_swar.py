"""SWAR word-transpose batched filters vs the u8 oracle kernels.

The ts=2/4/8 byte shuffles ride in-register word SWAR (batched._t4x4 and
friends) instead of byte-granular relayouts; these tests pin byte
equality with the generic u8 transpose kernels (which are themselves
pinned against filters/reference.py by the dispatch tests), for every
supported type_size, plus the dtype-matrix of the jitted device prep
(including a ragged tail and bfloat16 — the dominant TPU dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc import device as tbdev
from tpu_blosc.filters import batched as fb
from tpu_blosc.options import Options

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("ts", [2, 4, 8])
@pytest.mark.parametrize("bs", [4096, 1024, 96])
def test_swar_shuffle_matches_u8_kernel(ts, bs):
    arr = RNG.integers(0, 256, size=(5, bs), dtype=np.uint8)
    ref = np.asarray(fb._shuffle_batch_dev(jnp.asarray(arr), ts))
    got = fb.shuffle_batch(arr, ts)
    assert np.array_equal(ref, got)
    back = fb.unshuffle_batch(got, ts)
    assert np.array_equal(back, arr)


@pytest.mark.parametrize("ts", [2, 4, 8])
def test_swar_unshuffle_matches_u8_kernel(ts):
    arr = RNG.integers(0, 256, size=(3, 2048), dtype=np.uint8)
    ref = np.asarray(fb._unshuffle_batch_dev(jnp.asarray(arr), ts))
    got = fb.unshuffle_batch(arr, ts)
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("ts", [2, 4, 8])
@pytest.mark.parametrize("bs", [4096, 1024, 64])
def test_swar_bit_shuffle_matches_u8_kernel(ts, bs):
    arr = RNG.integers(0, 256, size=(5, bs), dtype=np.uint8)
    ref = np.asarray(fb._bit_shuffle_batch_dev(jnp.asarray(arr), ts))
    got = fb.bit_shuffle_batch(arr, ts)
    assert np.array_equal(ref, got)
    refu = np.asarray(fb._bit_unshuffle_batch_dev(jnp.asarray(arr), ts))
    gotu = fb.bit_unshuffle_batch(arr, ts)
    assert np.array_equal(refu, gotu)
    assert np.array_equal(fb.bit_unshuffle_batch(got, ts), arr)


@pytest.mark.parametrize(
    "dtype", ["bfloat16", np.float16, np.float32, np.float64]
)
def test_device_prep_bitshuffle_swar_byte_identical(dtype):
    n_el, bs = 4096, 512
    if dtype == "bfloat16":
        x = jnp.asarray(RNG.random(n_el, dtype=np.float32), dtype=jnp.bfloat16)
    else:
        x = jnp.asarray((RNG.random(n_el) * 100).astype(dtype))
    tsz = x.dtype.itemsize
    nb = (n_el * tsz) // bs - 1  # leave a tail
    f8, t8 = tbdev._device_filter_prep(x, nb, bs, tsz, 2, False)
    fw, tw = tbdev._device_filter_prep(x, nb, bs, tsz, 2, True)
    if tsz in (4, 8):
        # SWAR branch engaged; ts=2 stays u8 on device (the widening
        # u16->u32 bitcast materializes lane-padded 64x — see prep)
        assert np.asarray(fw).dtype != np.uint8
    assert (
        np.ascontiguousarray(np.asarray(fw)).tobytes()
        == np.asarray(f8).tobytes()
    )
    assert np.asarray(tw).tobytes() == np.asarray(t8).tobytes()


def test_compress_array_bitshuffle_bit_identical_to_host():
    x = jnp.asarray(np.linspace(0, 1, 200_000), dtype=jnp.float32)
    host_bytes = np.asarray(x).tobytes()
    from tpu_blosc.format import Shuffle

    opts = Options(type_size=4, shuffle=Shuffle.BITSHUFFLE)
    frame_dev = tbdev.compress_array(x, opts)
    frame_host = blosc.compress_with_options(host_bytes, opts)
    assert frame_dev == frame_host
    assert blosc.decompress(frame_dev) == host_bytes


def test_swar_skips_unaligned_block_size():
    # bs=24: multiple of ts=8 but not of the ts=8 SWAR quantum (32) —
    # must fall back to the generic kernel, still correct
    arr = RNG.integers(0, 256, size=(4, 24), dtype=np.uint8)
    ref = np.asarray(fb._shuffle_batch_dev(jnp.asarray(arr), 8))
    assert np.array_equal(fb.shuffle_batch(arr, 8), ref)


@pytest.mark.parametrize(
    "dtype", ["bfloat16", np.float16, np.int16, np.float32, np.uint32]
)
def test_device_prep_swar_byte_identical(dtype):
    n_el, bs = 5000, 512
    if dtype == "bfloat16":
        x = jnp.asarray(RNG.random(n_el, dtype=np.float32), dtype=jnp.bfloat16)
    else:
        x = jnp.asarray(
            (RNG.random(n_el) * 100).astype(dtype)
            if np.dtype(dtype).kind == "f"
            else RNG.integers(0, 1000, n_el).astype(dtype)
        )
    tsz = x.dtype.itemsize
    nb = (n_el * tsz) // bs  # leaves a ragged word tail
    f8, t8 = tbdev._device_filter_prep(x, nb, bs, tsz, 1, False)
    fw, tw = tbdev._device_filter_prep(x, nb, bs, tsz, 1, True)
    assert np.asarray(fw).dtype != np.uint8  # the SWAR branch engaged
    assert (
        np.ascontiguousarray(np.asarray(fw)).tobytes()
        == np.asarray(f8).tobytes()
    )
    assert np.asarray(tw).tobytes() == np.asarray(t8).tobytes()


def test_compress_array_bf16_bit_identical_to_host():
    x = jnp.asarray(np.arange(100_000) % 311, dtype=jnp.bfloat16)
    host_bytes = np.asarray(x).tobytes()
    opts = Options(type_size=2)
    frame_dev = tbdev.compress_array(x, opts)
    frame_host = blosc.compress_with_options(host_bytes, opts)
    assert frame_dev == frame_host
    assert blosc.decompress(frame_dev) == host_bytes
