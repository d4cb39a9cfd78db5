"""Compressed pytree checkpoints: save/load nested array structures.

The framework-level use of the stream layer: model/optimizer state is a
nested structure of arrays; each leaf compresses as one stream record
(type_size = dtype itemsize, so byte shuffle lines up with the element
stride), and record 0 is a JSON manifest of the structure + leaf
metadata.  The reference has no persistence layer at all; this is the
checkpoint story for the TPU runtime (device arrays go straight through
compress_array — filtering on device — and can load straight back onto
devices).

Supported structure: arbitrarily nested dict (string keys) / list /
tuple with leaves that are numpy or jax arrays plus JSON-native scalars
(int, float, str, bool, None).  Dtypes/shapes round-trip exactly.

    state = {"params": {"w": w, "b": b}, "step": 1000}
    checkpoint.save_pytree(path, state)
    state2 = checkpoint.load_pytree(path)           # numpy leaves
    state3 = checkpoint.load_pytree(path, device=True)  # jax.Array leaves
"""

from __future__ import annotations

import json

import numpy as np

from .errors import InvalidDataError
from .options import Options
from .stream import StreamReader, StreamWriter

_MANIFEST_VERSION = 1


def _is_array(x) -> bool:
    if isinstance(x, np.ndarray):
        return True
    try:
        import jax

        return isinstance(x, jax.Array)
    except Exception:  # pragma: no cover - jax is baked into this env
        return False


def _encode(obj, leaves: list):
    if isinstance(obj, np.generic):  # numpy scalar -> 0-d array leaf
        obj = np.asarray(obj)
    if _is_array(obj):
        if obj.size == 0:  # empty arrays carry no record, just metadata
            return {
                "t": "array0",
                "dtype": str(obj.dtype),
                "shape": list(obj.shape),
            }
        leaves.append(obj)
        return {
            "t": "array",
            "i": len(leaves) - 1,
            "dtype": str(obj.dtype),
            "shape": list(obj.shape),
        }
    if isinstance(obj, dict):
        items = []
        for k, v in obj.items():
            if not isinstance(k, str):
                raise TypeError(
                    f"checkpoint dict keys must be strings, got {type(k)!r}"
                )
            items.append([k, _encode(v, leaves)])
        return {"t": "dict", "items": items}
    if isinstance(obj, (list, tuple)):
        return {
            "t": "list" if isinstance(obj, list) else "tuple",
            "items": [_encode(v, leaves) for v in obj],
        }
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"t": "raw", "v": obj}
    raise TypeError(f"unsupported checkpoint leaf type: {type(obj)!r}")


def _decode(node, fetch):
    t = node["t"]
    if t == "array":
        return fetch(node["i"], np.dtype(node["dtype"]), tuple(node["shape"]))
    if t == "array0":
        return np.empty(tuple(node["shape"]), dtype=np.dtype(node["dtype"]))
    if t == "dict":
        return {k: _decode(v, fetch) for k, v in node["items"]}
    if t == "list":
        return [_decode(v, fetch) for v in node["items"]]
    if t == "tuple":
        return tuple(_decode(v, fetch) for v in node["items"])
    if t == "raw":
        return node["v"]
    raise InvalidDataError(f"blosc: invalid compressed data: manifest node {t!r}")


def save_pytree(path, tree, opts: Options | None = None) -> None:
    """Write a nested array structure as a compressed checkpoint file."""
    leaves: list = []
    skeleton = _encode(tree, leaves)
    manifest = json.dumps(
        {"version": _MANIFEST_VERSION, "tree": skeleton, "leaves": len(leaves)}
    ).encode()
    with StreamWriter(path, opts) as w:
        w.write(manifest, Options(type_size=1))
        for leaf in leaves:
            itemsize = np.dtype(leaf.dtype).itemsize
            leaf_opts = opts if opts is not None else Options()
            leaf_opts = Options(
                codec=leaf_opts.codec, level=leaf_opts.level,
                shuffle=leaf_opts.shuffle, type_size=itemsize,
                block_size=leaf_opts.block_size,
                num_threads=leaf_opts.num_threads,
            )
            if isinstance(leaf, np.ndarray):
                w.write(np.ascontiguousarray(leaf), leaf_opts)
            else:  # device array: filter on device
                w.write_array(leaf, leaf_opts)


def load_pytree(path, device: bool = False):
    """Read a checkpoint back; numpy leaves by default, jax with device=True."""
    with StreamReader(path) as r:
        if len(r) == 0:
            raise InvalidDataError("blosc: invalid compressed data: empty checkpoint")
        meta = json.loads(r.read(0))
        if meta.get("version") != _MANIFEST_VERSION:
            raise InvalidDataError(
                f"blosc: invalid version: checkpoint manifest {meta.get('version')}"
            )
        if meta["leaves"] != len(r) - 1:
            raise InvalidDataError(
                "blosc: invalid compressed data: checkpoint leaf count mismatch"
            )

        def fetch(i: int, dtype: np.dtype, shape: tuple):
            if device:
                return r.read_array(i + 1, dtype, shape=shape)
            buf = r.read(i + 1)
            return np.frombuffer(buf, dtype=dtype).reshape(shape).copy()

        return _decode(meta["tree"], fetch)
