"""Round-4 Pallas byte-plane kernels vs the NumPy oracle.

These run in Pallas interpret mode on the CPU mesh (small shapes); the
real-TPU oracle equality at 64 KiB / 1 MiB shapes was verified on
hardware (pallas_kernels.py record) and bench.py slope-times them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_blosc.filters import batched as fb
from tpu_blosc.filters import pallas_kernels as pk
from tpu_blosc.filters import reference as ref

RNG = np.random.default_rng(99)


@pytest.mark.parametrize("ts,wdt", [(2, np.uint16), (4, np.uint32)])
@pytest.mark.parametrize("nb,bs", [(2, 16384), (3, 32768)])
def test_byte_plane_split_matches_oracle(ts, wdt, nb, bs):
    if not pk.byte_plane_fusable(bs, ts):
        bs = 16384 * ts  # smallest legal for this ts
    raw = RNG.integers(0, 256, nb * bs, np.uint8)
    xw = jnp.asarray(raw.view(wdt).reshape(nb, bs // ts))
    out = np.asarray(pk.byte_plane_split(xw, ts)).reshape(nb, bs)
    want = np.stack(
        [
            np.asarray(ref.shuffle_bytes(raw.reshape(nb, bs)[i].tobytes(), ts))
            for i in range(nb)
        ]
    )
    assert np.array_equal(out, want)
    back = np.asarray(
        pk.byte_plane_merge(jnp.asarray(out.reshape(nb, ts, bs // ts)), ts)
    )
    assert np.array_equal(back.view(np.uint8).reshape(nb, bs),
                          raw.reshape(nb, bs))


def test_byte_plane_fusable_gate():
    assert pk.byte_plane_fusable(1 << 20, 4)
    assert pk.byte_plane_fusable(16384, 4)
    assert not pk.byte_plane_fusable(8192, 4)      # rows < 8
    assert not pk.byte_plane_fusable(16384 + 4, 4)  # not tile-aligned
    assert pk.byte_plane_fusable(8192, 2)
    assert not pk.byte_plane_fusable(1 << 20, 8)    # ts8 stays SWAR
    assert not pk.byte_plane_fusable(1 << 20, 16)


def test_use_pallas_planes_respects_backend_and_env(monkeypatch):
    # on the CPU test mesh the production dispatch must NOT engage
    assert jax.default_backend() != "tpu"
    assert not fb._use_pallas_planes(1 << 20, 4)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert fb._use_pallas_planes(1 << 20, 4)
    monkeypatch.setenv("TPU_BLOSC_NO_PALLAS_SHUFFLE", "1")
    assert not fb._use_pallas_planes(1 << 20, 4)


def test_dev_unfilter_planes_matches_words(monkeypatch):
    """The Pallas unfilter body equals the SWAR word body (both vs the
    uploaded filtered stream) — interpret mode, small shape."""
    from tpu_blosc import device as tbdev

    nb, bs = 2, 16384
    raw = RNG.integers(0, 256, nb * bs, np.uint8)
    shuffled = np.stack(
        [
            np.asarray(ref.shuffle_bytes(raw.reshape(nb, bs)[i].tobytes(), 4))
            for i in range(nb)
        ]
    )
    planes = shuffled.reshape(nb, 4, bs // 4)
    out_p = np.asarray(tbdev._dev_unfilter_planes(jnp.asarray(planes), "float32"))
    xw = jnp.asarray(shuffled.reshape(nb, bs).view(np.uint32))
    out_w = np.asarray(tbdev._dev_unfilter_words(xw, 1, "float32"))
    assert np.array_equal(out_p.view(np.uint8), out_w.view(np.uint8))
    assert np.array_equal(out_p.view(np.uint8), raw)
