"""pack_array/unpack_array: self-describing ndarray envelopes.

Counterpart coverage to python-blosc's pack_array semantics — but the
envelope here is explicit little-endian metadata (array.py docstring),
never pickle, so the negative cases test malformed-envelope rejection.
"""

import numpy as np
import pytest

import tpu_blosc as blosc
from tpu_blosc.errors import InvalidDataError, InvalidHeaderError
from tpu_blosc.options import Options


@pytest.mark.parametrize(
    "dtype",
    [np.uint8, np.int16, np.float32, np.float64, np.complex64, np.bool_,
     "<M8[ns]", "<m8[us]", "<U7", "S5"],
)
def test_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(0)
    if np.dtype(dtype).kind in "SU":
        arr = np.array(["ab", "cdef", "", "xyzzy12"][:3] * 7, dtype=dtype)
    elif np.dtype(dtype).kind in "Mm":
        arr = rng.integers(0, 2**40, 1000).astype(dtype)
    elif np.dtype(dtype) == np.bool_:
        arr = rng.integers(0, 2, 1000).astype(dtype)
    elif np.dtype(dtype).kind == "c":
        arr = (rng.random(1000) + 1j * rng.random(1000)).astype(dtype)
    else:
        arr = (rng.random(1000) * 100).astype(dtype)
    out = blosc.unpack_array(blosc.pack_array(arr))
    assert out.dtype == arr.dtype
    assert np.array_equal(out, arr)


@pytest.mark.parametrize(
    "shape", [(), (0,), (1,), (7, 11), (2, 3, 4, 5), (1000,), (0, 5)]
)
def test_roundtrip_shapes(shape):
    arr = np.arange(int(np.prod(shape)), dtype=np.float32).reshape(shape)
    out = blosc.unpack_array(blosc.pack_array(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_fortran_order_preserved():
    arr = np.asfortranarray(np.arange(35, dtype=np.int32).reshape(5, 7))
    out = blosc.unpack_array(blosc.pack_array(arr))
    assert out.flags.f_contiguous
    assert np.array_equal(out, arr)


def test_custom_options_and_big_itemsize():
    arr = np.arange(4096, dtype=np.float64)
    packed = blosc.pack_array(
        arr, Options(codec=blosc.ZSTD, level=3, shuffle=blosc.BITSHUFFLE,
                     type_size=8)
    )
    assert np.array_equal(blosc.unpack_array(packed), arr)


def test_list_input_accepted():
    out = blosc.unpack_array(blosc.pack_array([[1, 2], [3, 4]]))
    assert np.array_equal(out, np.array([[1, 2], [3, 4]]))


def test_object_and_structured_dtypes_rejected():
    with pytest.raises(TypeError):
        blosc.pack_array(np.array([object()], dtype=object))
    with pytest.raises(TypeError):
        blosc.pack_array(np.zeros(3, dtype=[("a", "<i4"), ("b", "<f8")]))


def test_unpack_rejects_garbage():
    with pytest.raises(InvalidHeaderError):
        blosc.unpack_array(b"")
    with pytest.raises(InvalidHeaderError):
        blosc.unpack_array(b"not an envelope at all")
    # right magic, wrong version
    with pytest.raises(InvalidHeaderError):
        blosc.unpack_array(b"TPBA\xff\x00\x00\x00")


def test_unpack_rejects_truncation_and_mismatch():
    packed = blosc.pack_array(np.arange(100, dtype=np.int32))
    with pytest.raises((InvalidDataError, InvalidHeaderError)):
        blosc.unpack_array(packed[: len(packed) // 2])
    # corrupt a shape dim so payload no longer matches
    mut = bytearray(packed)
    mut[11] ^= 0x01  # first shape byte (magic4+ver+flags+dlen+'<i4'+ndim)
    with pytest.raises(InvalidDataError):
        blosc.unpack_array(bytes(mut))


_FAST = None


def _fast_settings():
    global _FAST
    if _FAST is None:
        from hypothesis import HealthCheck, settings

        _FAST = settings(
            max_examples=40,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
    return _FAST


def test_property_roundtrip_any_dtype_shape():
    from hypothesis import given
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as hnp

    @given(
        arr=hnp.arrays(
            dtype=st.sampled_from(
                [np.uint8, np.int16, np.int32, np.float32, np.float64]
            ),
            shape=hnp.array_shapes(max_dims=4, max_side=17),
        )
    )
    @_fast_settings()
    def inner(arr):
        out = blosc.unpack_array(blosc.pack_array(arr))
        assert out.dtype == arr.dtype and out.shape == arr.shape
        assert np.array_equal(out, arr, equal_nan=True)

    inner()


def test_property_envelope_mutations_never_crash():
    from hypothesis import given
    from hypothesis import strategies as st

    base = blosc.pack_array(np.arange(200, dtype=np.int16))

    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        val=st.integers(min_value=0, max_value=255),
    )
    @_fast_settings()
    def inner(pos, val):
        mut = bytearray(base)
        mut[pos] = val
        try:
            out = blosc.unpack_array(bytes(mut))
        except (blosc.BloscError, TypeError):
            return  # typed rejection is the contract
        assert isinstance(out, np.ndarray)  # or a clean decode

    inner()


def test_envelope_is_not_a_plain_frame():
    packed = blosc.pack_array(np.arange(64, dtype=np.float32))
    with pytest.raises(blosc.BloscError):  # 'T' parses as a bad version byte
        blosc.decompress(packed)


# ---------------------------------------------------------------------------
# extension dtypes + device arrays (round-3 additions)
# ---------------------------------------------------------------------------


def test_pack_array_bfloat16_dtype_fidelity():
    """Extension dtypes whose .str degrades to void must round-trip their
    REAL dtype (stored by registered name), not as raw void bytes."""
    import jax.numpy as jnp

    x = np.asarray(jnp.asarray(np.arange(1000) % 97, dtype=jnp.bfloat16))
    out = blosc.unpack_array(blosc.pack_array(x))
    assert out.dtype == x.dtype  # bfloat16, NOT |V2
    assert np.array_equal(out.view(np.uint16), x.view(np.uint16))


def test_pack_array_float8_dtype_fidelity():
    import ml_dtypes

    x = np.arange(256, dtype=np.float32).astype(ml_dtypes.float8_e4m3fn)
    out = blosc.unpack_array(blosc.pack_array(x))
    assert out.dtype == x.dtype
    assert np.array_equal(out.view(np.uint8), x.view(np.uint8))


def test_pack_array_void_dtype_still_void():
    x = np.frombuffer(bytes(range(64)), dtype=np.dtype("V4")).copy()
    out = blosc.unpack_array(blosc.pack_array(x))
    assert out.dtype == np.dtype("V4")
    assert out.tobytes() == x.tobytes()


def test_pack_array_jax_array_identical_envelope():
    """Packing a device array (filter on chip) produces the same bytes
    as packing the fetched ndarray."""
    import jax.numpy as jnp

    xj = jnp.asarray(np.arange(5000, dtype=np.float32).reshape(50, 100))
    assert blosc.pack_array(xj) == blosc.pack_array(np.asarray(xj))


def test_unpack_array_device():
    import jax
    import jax.numpy as jnp

    xj = jnp.asarray((np.arange(4096) % 31).astype(np.int32).reshape(64, 64))
    packed = blosc.pack_array(xj)
    out = blosc.unpack_array(packed, device=True)
    assert isinstance(out, jax.Array)
    assert out.shape == (64, 64) and out.dtype == jnp.int32
    assert np.array_equal(np.asarray(out), np.asarray(xj))


def test_unpack_array_device_bf16_and_empty():
    import jax
    import jax.numpy as jnp

    b = jnp.asarray(np.arange(300) % 7, dtype=jnp.bfloat16)
    out = blosc.unpack_array(blosc.pack_array(b), device=True)
    assert out.dtype == jnp.bfloat16 and bool((out == b).all())
    e = blosc.unpack_array(
        blosc.pack_array(jnp.zeros((0, 3), jnp.float32)), device=True
    )
    assert isinstance(e, jax.Array) and e.shape == (0, 3)


def test_unpack_array_device_fortran_falls_back_via_host():
    f = np.asfortranarray(np.arange(12, dtype=np.int32).reshape(3, 4))
    out = blosc.unpack_array(blosc.pack_array(f), device=True)
    assert np.array_equal(np.asarray(out), f)


def test_unpack_array_device_sharded():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_blosc.dist.mesh import block_mesh

    x = np.arange(2**14, dtype=np.float32).reshape(128, 128)
    sh = NamedSharding(block_mesh(), P("blocks"))
    out = blosc.unpack_array(blosc.pack_array(x), sharding=sh)
    assert np.array_equal(np.asarray(out), x)


def test_unpack_array_rows():
    import tpu_blosc as blosc
    from tpu_blosc.options import Options

    arr = np.arange(600_000, dtype=np.float32).reshape(6000, 100)
    packed = blosc.pack_array(arr, Options(block_size=16384, type_size=4))
    got = blosc.unpack_array_rows(packed, 1234, 2345)
    np.testing.assert_array_equal(got, arr[1234:2345])
    assert blosc.unpack_array_rows(packed, 5, 5).shape == (0, 100)
    np.testing.assert_array_equal(
        blosc.unpack_array_rows(packed, 0, 6000), arr
    )
    import pytest

    from tpu_blosc.errors import BloscError

    with pytest.raises(BloscError):
        blosc.unpack_array_rows(packed, 0, 6001)
    with pytest.raises(BloscError):
        blosc.unpack_array_rows(packed, -1, 5)


def test_unpack_array_rows_fortran_and_1d():
    import tpu_blosc as blosc

    f = np.asfortranarray(np.arange(20_000, dtype=np.int32).reshape(200, 100))
    packed = blosc.pack_array(f)
    np.testing.assert_array_equal(
        blosc.unpack_array_rows(packed, 10, 20), f[10:20]
    )
    one = np.arange(50_000, dtype=np.int16)
    p1 = blosc.pack_array(one)
    np.testing.assert_array_equal(
        blosc.unpack_array_rows(p1, 100, 200), one[100:200]
    )
