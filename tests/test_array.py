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
