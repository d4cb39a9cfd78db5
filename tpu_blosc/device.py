"""Device-resident array compression: jax.Array in, Blosc frame out.

The TPU-native entry point for compressing data that already lives on an
accelerator (activations, checkpoint shards): the shuffle/bitshuffle
filter runs ON DEVICE over the array's bytes (1.4-2.7 TB/s, see
filters/pallas_kernels.py), only the filtered stream is transferred, and
the host runs the codec stage (OpenMP native pipeline).

Frames are BIT-IDENTICAL to ``compress(np.asarray(x).tobytes(), ...)`` —
device filtering is an execution choice, never a format choice — so
everything decodes everywhere (including the reference's own decoder for
single-block frames).

decompress_array is the inverse convenience: decode on host straight into
a pinned buffer and device_put.
"""

from __future__ import annotations

import numpy as np

from . import filters
from .chunk import _ENTRY_MEMCPY, choose_block_size
from .codecs.registry import get_codec
from .errors import InvalidCodecError, InvalidDataError
from .format import (
    FLAG_BITSHUFFLE,
    FLAG_SHUFFLE,
    FLAG_SPLIT,
    FORMAT_VERSION,
    HEADER_SIZE,
    Header,
    Shuffle,
)
from .options import Options


from functools import partial

import jax as _jax


@partial(_jax.jit, static_argnums=(1, 2, 3, 4))
def _device_filter_prep(x, nb: int, bs: int, type_size: int, mode: int):
    """One compiled unit: flatten to bytes, filter the full-block prefix,
    return (filtered (nb, bs), tail bytes).  A single jit keeps tunnel
    compile costs to one round per input shape."""
    import jax
    import jax.numpy as jnp

    from .filters import batched as fb

    flat = x.reshape(-1)
    if flat.dtype != jnp.uint8:
        x_bytes = jax.lax.bitcast_convert_type(flat, jnp.uint8).reshape(-1)
    else:
        x_bytes = flat
    blocks = x_bytes[: nb * bs].reshape(nb, bs)
    if mode == int(Shuffle.SHUFFLE):
        filtered = fb._shuffle_batch_dev(blocks, type_size)
    else:
        filtered = fb._bit_shuffle_batch_dev(blocks, type_size)
    return filtered, x_bytes[nb * bs :]


def compress_array(x, opts: Options | None = None) -> bytes:
    """Compress a jax.Array (or ndarray) with the filter stage on device.

    type_size defaults to the dtype's itemsize.  Output frames are
    bit-identical to the host path at the same options.
    """
    import jax
    import jax.numpy as jnp

    if opts is None:
        opts = Options()
    if not isinstance(x, jax.Array):
        host_dtype = np.asarray(x).dtype
        x = jnp.asarray(x)
        if np.dtype(x.dtype) != host_dtype:
            raise TypeError(
                f"jax narrowed {host_dtype} to {x.dtype}; enable jax_enable_x64 "
                "for 64-bit dtypes or pass bytes through compress() instead"
            )
    itemsize = np.dtype(x.dtype).itemsize
    if opts.type_size == Options().type_size and itemsize != opts.type_size:
        opts = Options(
            codec=opts.codec, level=opts.level, shuffle=opts.shuffle,
            type_size=itemsize, block_size=opts.block_size,
            num_threads=opts.num_threads,
        )
    opts = opts.clamped()

    n = int(np.prod(x.shape)) * itemsize
    if n == 0:
        raise InvalidDataError("blosc: invalid compressed data: empty input")

    from .api import AUTO_BLOCK_THRESHOLD, compress_with_options

    block_size = choose_block_size(n, opts.type_size, opts.block_size)
    nb_full = n // block_size
    do_filter = opts.shuffle != Shuffle.NOSHUFFLE and opts.type_size > 1
    use_chunked = opts.block_size > 0 or n > AUTO_BLOCK_THRESHOLD

    if not use_chunked or not do_filter or nb_full == 0:
        # single-block / unfiltered routing: one transfer, host path
        # (keeps frames bit-identical to the host API's routing rules)
        return compress_with_options(np.asarray(x).tobytes(), opts)

    filtered_dev, tail_dev = _device_filter_prep(
        x, nb_full, block_size, opts.type_size, int(opts.shuffle)
    )
    filtered = np.asarray(filtered_dev).reshape(-1)  # one transfer
    tail = np.asarray(tail_dev)
    if tail.size:
        if opts.shuffle == Shuffle.SHUFFLE and tail.size >= opts.type_size:
            shuf_tail = filters.shuffle_bytes(tail, opts.type_size)
        elif opts.shuffle == Shuffle.BITSHUFFLE and tail.size >= opts.type_size:
            shuf_tail = filters.bit_shuffle(tail, opts.type_size)
        else:
            shuf_tail = tail
        filtered_all = np.concatenate([filtered, shuf_tail])
    else:
        filtered_all = filtered

    # host codec stage over the pre-filtered stream.  Use the SAME native
    # pipeline as chunk.compress_chunked (shuffle_mode=0 — data is already
    # filtered) so streams and fallback decisions are byte-identical to
    # the host path; memcpy-flagged blocks are then patched to carry raw
    # pre-filter bytes (the format contract, blosc.go:341-345).
    from . import chunk as _chunk

    payloads: list[bytes] = []
    entries: list[int] = []
    native = _chunk._native_pipeline_codec(opts.codec, opts.level)
    if native is not None:
        from .native import backend as _nb

        native_codec, depth = native
        payloads, memf = _nb.compress_blocks(
            filtered_all, block_size, opts.type_size, 0, native_codec, depth
        )
    else:
        compressor = get_codec(opts.codec)
        if compressor is None:
            raise InvalidCodecError(f"blosc: unsupported codec: {opts.codec}")
        payloads, memf = [], []
        pos = 0
        while pos < n:
            bs = min(block_size, n - pos)
            comp = compressor.compress(
                filtered_all[pos : pos + bs].tobytes(), opts.level
            )
            if len(comp) >= bs:
                payloads.append(filtered_all[pos : pos + bs].tobytes())
                memf.append(True)
            else:
                payloads.append(comp)
                memf.append(False)
            pos += bs
    for i, is_memcpy in enumerate(memf):
        bs = len(payloads[i]) if is_memcpy else None
        if is_memcpy:
            # recover raw pre-filter bytes by unfiltering on the host
            if opts.shuffle == Shuffle.SHUFFLE:
                raw_block = filters.unshuffle_bytes(payloads[i], opts.type_size)
            else:
                raw_block = filters.bit_unshuffle(payloads[i], opts.type_size)
            payloads[i] = raw_block.tobytes()
            entries.append(_ENTRY_MEMCPY | bs)
        else:
            entries.append(len(payloads[i]))

    import struct

    num_blocks = len(payloads)
    table = struct.pack("<I", num_blocks) + struct.pack(
        f"<{num_blocks}I", *entries
    )
    total = HEADER_SIZE + len(table) + sum(len(p) for p in payloads)
    flags = FLAG_SPLIT | (
        FLAG_SHUFFLE if opts.shuffle == Shuffle.SHUFFLE else FLAG_BITSHUFFLE
    )
    header = Header(
        version=FORMAT_VERSION,
        version_lz=int(opts.codec),
        flags=flags,
        type_size=min(opts.type_size, 255),
        nbytes_orig=n,
        block_size=block_size,
        nbytes_comp=total,
    )
    return header.to_bytes() + table + b"".join(payloads)


def decompress_array(data, dtype, shape=None, sharding=None):
    """Decompress a frame and place the result on device.

    Returns a jax.Array of ``dtype`` (and ``shape`` if given, else 1-D),
    optionally placed with ``sharding`` (a jax.sharding.Sharding).
    """
    import jax

    from .api import decompress_into, get_decompressed_size

    n = get_decompressed_size(data)
    dt = np.dtype(dtype)
    if n % dt.itemsize:
        raise InvalidDataError(
            f"blosc: {n} bytes is not a whole number of {dt} elements"
        )
    host = np.empty(n // dt.itemsize, dtype=dt)
    decompress_into(data, host.view(np.uint8))
    if shape is not None:
        host = host.reshape(shape)
    if sharding is not None:
        return jax.device_put(host, sharding)
    return jax.device_put(host)
