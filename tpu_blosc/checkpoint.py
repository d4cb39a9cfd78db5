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


# Host leaves batch-compress in bounded windows: grouping by type_size
# within a window gives one native crossing per group (small leaves
# schedule across the core pool), while the window cap bounds peak memory
# to ~window + bound-sized outputs instead of "every frame of the
# checkpoint at once".  Record bytes and emission order are identical to
# the per-leaf write() path (batching never changes bytes).
_BATCH_WINDOW_BYTES = 64 * 1024 * 1024


def _pipeline_disabled() -> bool:
    import os

    return bool(os.environ.get("TPU_BLOSC_NO_CKPT_PIPELINE"))


def _write_leaf_records(w: StreamWriter, records, opts: Options | None,
                        strategy: str = "transfer"):
    """Emit ("host", ndarray) / ("device", jax-array) records in order.

    Runs of consecutive device leaves write through a 1-deep pipeline: a
    worker thread runs leaf k+1's device filter + link fetch
    (_compress_array_stage1) while this thread runs leaf k's host codec +
    file write (_compress_array_stage2) — the two halves of
    compress_array, so frame bytes are identical to the serial
    write_array path (TPU_BLOSC_NO_CKPT_PIPELINE=1 forces serial).
    """
    base = opts if opts is not None else Options()

    def leaf_opts_for(itemsize: int) -> Options:
        return Options(
            codec=base.codec, level=base.level, shuffle=base.shuffle,
            type_size=itemsize, block_size=base.block_size,
            num_threads=base.num_threads,
        )

    from .api import compress_batch_with_options

    pending: list[np.ndarray] = []
    pending_bytes = 0

    def flush():
        nonlocal pending, pending_bytes
        if not pending:
            return
        by_ts: dict[int, list[int]] = {}
        for k, arr in enumerate(pending):
            by_ts.setdefault(arr.dtype.itemsize, []).append(k)
        frames: dict[int, bytes] = {}
        for itemsize, idxs in by_ts.items():
            for k, frame in zip(idxs, compress_batch_with_options(
                    [pending[k] for k in idxs], leaf_opts_for(itemsize))):
                frames[k] = frame
        for k in range(len(pending)):
            w.write_frame(frames[k])
        pending, pending_bytes = [], 0

    def write_device_run(run: list):
        if len(run) == 1 or _pipeline_disabled():
            for data in run:
                w.write_array(
                    data, leaf_opts_for(np.dtype(data.dtype).itemsize),
                    strategy=strategy,
                )
            return
        from .device import _compress_array_stage1, _compress_array_stage2
        from .stream import _iter_prefetch

        for staged in _iter_prefetch(
            lambda t: _compress_array_stage1(
                run[t],
                leaf_opts_for(np.dtype(run[t].dtype).itemsize),
                strategy,
            ),
            len(run),
            prefetch=1,
        ):
            w.write_frame(_compress_array_stage2(staged))

    records = list(records)  # leaves are tree references, already live
    i, n_rec = 0, len(records)
    while i < n_rec:
        kind, data = records[i]
        if kind == "host":
            arr = np.ascontiguousarray(data)
            pending.append(arr)
            pending_bytes += arr.nbytes
            if pending_bytes >= _BATCH_WINDOW_BYTES:
                flush()
            i += 1
            continue
        # device run: flush to keep record order, then pipeline the run
        flush()
        j = i
        while j < n_rec and records[j][0] == "device":
            j += 1
        write_device_run([d for _, d in records[i:j]])
        i = j
    flush()


def _collect_leaf_specs(tree, n_leaves: int):
    """Map leaf index -> (dtype, shape) by walking the manifest skeleton.

    Returns None when the manifest's leaf indices are not exactly
    0..n_leaves-1 (forged/damaged manifest) — the caller then keeps the
    per-leaf allocating path, whose errors match the original loader.
    """
    specs: dict[int, tuple] = {}

    def walk(node):
        t = node.get("t") if isinstance(node, dict) else None
        if t == "array":
            i = node["i"]
            if not isinstance(i, int) or i in specs:
                raise ValueError
            specs[i] = (np.dtype(node["dtype"]), tuple(node["shape"]))
        elif t == "dict":
            for _, v in node["items"]:
                walk(v)
        elif t in ("list", "tuple"):
            for v in node["items"]:
                walk(v)

    try:
        walk(tree)
    except Exception:
        return None
    return specs if sorted(specs) == list(range(n_leaves)) else None


def save_pytree(path, tree, opts: Options | None = None,
                checksum: bool = False, strategy: str = "transfer") -> None:
    """Write a nested array structure as a compressed checkpoint file.

    ``checksum=True`` adds a crc32 per record (stream flag bit 0) so
    load_pytree detects bit rot inside compressed leaves instead of
    returning plausible garbage — the integrity story for model state.

    ``strategy`` applies to DEVICE leaves (forwards to
    device.compress_array): "transfer" (default) ships the filtered
    bytes over the link; "match" lets the device match-discovery codec
    ship O(records) instead when a leaf is record-sparse — on a slow
    host<->device link the checkpoint save is link-bound, so shipping
    ~10x fewer bytes is the only real lever (frames stay standard and
    load-compatible either way; dense leaves fall back to transfer).
    """
    leaves: list = []
    skeleton = _encode(tree, leaves)
    manifest = json.dumps(
        {"version": _MANIFEST_VERSION, "tree": skeleton, "leaves": len(leaves)}
    ).encode()
    with StreamWriter(path, opts, checksum=checksum) as w:
        w.write(manifest, Options(type_size=1))
        _write_leaf_records(
            w,
            (("host" if isinstance(lf, np.ndarray) else "device", lf)
             for lf in leaves),
            opts,
            strategy=strategy,
        )


def load_pytree(path, device: bool = False, strategy: str = "transfer"):
    """Read a checkpoint back; numpy leaves by default, jax with device=True.

    With ``device=True``, ``strategy`` forwards to
    device.decompress_array per leaf: "records"/"rle" ship O(literal)
    records over the link and reconstruct on device (the slow-link lever
    — raw device_put is what binds the default path), "transfer"
    (default) host-decodes with a prefetch pipeline and uploads bytes.
    """
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

        # host loads decode every leaf anyway: pre-allocate each array
        # from its manifest dtype/shape and batch-decode straight into
        # them (read_many_into) — no intermediate bytes objects and no
        # frombuffer().copy() second pass.  Leaves whose record size
        # disagrees with the manifest re-fetch through the allocating
        # path, which raises exactly like the per-leaf loop did.
        # device loads pipeline: a worker thread reads + host-decodes leaf
        # k+1 (the codec half of read_array) while this thread runs leaf
        # k's device_put — host decode overlaps the host→device link.
        # Requires a well-formed manifest (specs); dict-mode records and
        # serial fallback go through read_array as before.
        dev_gen = None
        produced: dict[int, np.ndarray] = {}
        if device and strategy not in ("transfer", "auto"):
            # records/rle/device strategies decode ON DEVICE from frame
            # records — the host-decode prefetch pipeline does not apply
            pass
        elif device and not _pipeline_disabled():
            specs = _collect_leaf_specs(meta["tree"], meta["leaves"])
            if specs is not None:
                from .device import _checked_decode_size, _host_decode_frame
                from .stream import DICT_MAGIC, _iter_prefetch

                def stage_host(i: int):
                    dtype, shape = specs[i]
                    frame = r.read_frame(i + 1)
                    if frame[:4] == DICT_MAGIC:
                        buf = r._decode_dict_record(frame)
                        return i, np.frombuffer(buf, dtype=dtype).reshape(shape)
                    n = _checked_decode_size(frame, dtype)
                    return i, _host_decode_frame(frame, n, dtype, shape)

                dev_gen = _iter_prefetch(stage_host, meta["leaves"], prefetch=2)

        arrs: dict[int, np.ndarray] = {}
        if not device:
            specs = _collect_leaf_specs(meta["tree"], meta["leaves"])
            if specs is not None:
                # allocate only leaves whose manifest size AGREES with the
                # record's own declared size (peek_size): a forged manifest
                # must not drive allocations past what the record headers
                # themselves claim (the same validate-before-allocate
                # posture as the container/range decoders)
                for i, (dtype, shape) in specs.items():
                    nbytes = dtype.itemsize * int(np.prod(shape, dtype=np.int64))
                    try:
                        if r.peek_size(i + 1) != nbytes:
                            continue
                        arrs[i] = np.empty(shape, dtype)
                    except (InvalidDataError, MemoryError):
                        continue  # allocating path raises the typed error
                order = sorted(arrs)
                counts = r.read_many_into(
                    [i + 1 for i in order], [arrs[i] for i in order]
                )
                for i, c in zip(order, counts):
                    if c != arrs[i].nbytes:
                        del arrs[i]  # size mismatch: allocating path raises

        def fetch(i: int, dtype: np.dtype, shape: tuple):
            if device:
                if dev_gen is not None:
                    import jax

                    # _iter_prefetch yields leaves in index order; a
                    # permuted (but complete — specs validated) manifest
                    # walks out of order, so buffer until i arrives
                    while i not in produced:
                        k, host = next(dev_gen)
                        produced[k] = host
                    return jax.device_put(produced.pop(i))
                return r.read_array(i + 1, dtype, shape=shape,
                                    strategy=strategy)
            got = arrs.get(i)
            if got is not None:
                return got
            buf = r.read(i + 1)
            return np.frombuffer(buf, dtype=dtype).reshape(shape).copy()

        return _decode(meta["tree"], fetch)


def load_leaf(path, key_path: str, device: bool = False):
    """Load ONE leaf from a checkpoint without decoding the others.

    ``key_path`` walks the tree with '/'-separated segments: dict keys by
    name, list/tuple elements by index — e.g. ``"params/layers/0/w"``.
    An empty path returns the root (useful for scalar checkpoints).
    Array leaves read exactly one stream record; everything else in the
    file stays untouched — the point of one-record-per-leaf layout.
    """
    with StreamReader(path) as r:
        if len(r) == 0:
            raise InvalidDataError(
                "blosc: invalid compressed data: empty checkpoint"
            )
        meta = json.loads(r.read(0))
        if meta.get("version") != _MANIFEST_VERSION:
            raise InvalidDataError(
                f"blosc: invalid version: checkpoint manifest "
                f"{meta.get('version')}"
            )
        node = _walk_manifest(meta["tree"], key_path)

        def fetch(i: int, dtype: np.dtype, shape: tuple):
            if device:
                return r.read_array(i + 1, dtype, shape=shape)
            buf = r.read(i + 1)
            return np.frombuffer(buf, dtype=dtype).reshape(shape).copy()

        return _decode(node, fetch)


# ---------------------------------------------------------------------------
# multi-process sharded checkpoints
# ---------------------------------------------------------------------------


def _slices_to_json(index, shape) -> list:
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append([start, stop])
    return out


def save_pytree_sharded(path_prefix, tree, opts: Options | None = None,
                        checksum: bool = False) -> None:
    """Multi-process checkpoint: every process writes its addressable shards.

    Call from ALL processes with the same arguments.  Process p writes
    ``{path_prefix}.p{p}.tpbs`` containing one compressed record per
    addressable shard of each sharded leaf (device-filtered via
    compress_array), with the global dtype/shape and shard byte-ranges in
    the manifest.  Fully-replicated leaves and host values are written by
    process 0 only.  load_pytree_sharded reassembles from all files.
    """
    import jax

    pid = jax.process_index()
    leaves: list = []
    skeleton = _encode_sharded(tree, leaves, pid)
    records: list = []
    manifest_leaves = []
    for kind, obj in leaves:
        if kind == "replicated":
            manifest_leaves.append({"k": "replicated", "n": 1 if obj is not None else 0})
            if obj is not None:
                records.append(("host", obj))
        else:  # sharded jax array: this process's addressable shards
            shards = [
                s for s in obj.addressable_shards
                if getattr(s, "replica_id", 0) == 0
            ]
            manifest_leaves.append({
                "k": "sharded",
                "n": len(shards),
                "spans": [
                    _slices_to_json(s.index, obj.shape) for s in shards
                ],
            })
            for s in shards:
                records.append(("device", s.data))

    manifest = json.dumps({
        "version": _MANIFEST_VERSION,
        "tree": skeleton,
        "leaf_records": manifest_leaves,
        "process": pid,
    }).encode()
    with StreamWriter(f"{path_prefix}.p{pid}.tpbs", opts,
                      checksum=checksum) as w:
        w.write(manifest, Options(type_size=1))
        _write_leaf_records(w, records, opts)


def _encode_sharded(obj, leaves: list, pid: int):
    try:
        import jax

        is_jax = isinstance(obj, jax.Array)
    except Exception:  # pragma: no cover
        is_jax = False
    if is_jax and not obj.is_fully_replicated:
        leaves.append(("sharded", obj))
        return {
            "t": "sharded_array",
            "i": len(leaves) - 1,
            "dtype": str(obj.dtype),
            "shape": list(obj.shape),
        }
    if isinstance(obj, np.generic):
        obj = np.asarray(obj)
    if _is_array(obj):
        if is_jax:
            obj = np.asarray(obj)  # replicated: process 0 stores it
        if obj.size == 0:
            return {"t": "array0", "dtype": str(obj.dtype), "shape": list(obj.shape)}
        leaves.append(("replicated", obj if pid == 0 else None))
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
                raise TypeError("checkpoint dict keys must be strings")
            items.append([k, _encode_sharded(v, leaves, pid)])
        return {"t": "dict", "items": items}
    if isinstance(obj, (list, tuple)):
        return {
            "t": "list" if isinstance(obj, list) else "tuple",
            "items": [_encode_sharded(v, leaves, pid) for v in obj],
        }
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"t": "raw", "v": obj}
    raise TypeError(f"unsupported checkpoint leaf type: {type(obj)!r}")


def _walk_manifest(tree: dict, key_path: str) -> dict:
    """Resolve a '/'-separated path in a manifest tree (shared by
    load_leaf and load_leaf_sharded); raises KeyError on misses."""
    node = tree
    walked = []
    for seg in (key_path.split("/") if key_path else []):
        walked.append(seg)
        t = node.get("t")
        if t == "dict":
            for k, v in node["items"]:
                if k == seg:
                    node = v
                    break
            else:
                raise KeyError(f"checkpoint has no leaf {'/'.join(walked)!r}")
        elif t in ("list", "tuple"):
            if not seg.isdigit() or int(seg) >= len(node["items"]):
                raise KeyError(f"checkpoint has no leaf {'/'.join(walked)!r}")
            node = node["items"][int(seg)]
        else:
            raise KeyError(
                f"checkpoint path {'/'.join(walked)!r} descends into a "
                f"{t!r} leaf"
            )
    return node


def load_leaf_sharded(path_prefix, num_processes: int, key_path: str):
    """Load ONE leaf of a sharded checkpoint, reading only its records.

    Per-process record indices are computable from the manifest alone
    (record 0 is the manifest; leaf i's records start at
    1 + sum(n of leaves before i) in each process file), so a single
    tensor comes out of a multi-terabyte sharded checkpoint touching one
    manifest + that leaf's shard records per process.
    """
    files = [f"{path_prefix}.p{p}.tpbs" for p in range(num_processes)]
    readers = [StreamReader(f) for f in files]
    try:
        metas = [json.loads(r.read(0)) for r in readers]
        for m in metas:
            if m.get("version") != _MANIFEST_VERSION:
                raise InvalidDataError(
                    "blosc: invalid version: sharded checkpoint manifest"
                )
        node = _walk_manifest(metas[0]["tree"], key_path)
        t = node.get("t")
        if t == "raw":
            return node["v"]
        if t == "array0":
            return np.empty(tuple(node["shape"]), np.dtype(node["dtype"]))
        if t not in ("array", "sharded_array"):
            raise KeyError(
                f"checkpoint path {key_path!r} is a {t!r} subtree; "
                "load_leaf_sharded loads single leaves"
            )
        i = node["i"]
        dtype = np.dtype(node["dtype"])
        shape = tuple(node["shape"])
        if t == "array":  # replicated: stored by whichever process has n=1
            for p, m in enumerate(metas):
                info = m["leaf_records"][i]
                if info["n"]:
                    base = 1 + sum(
                        x["n"] for x in m["leaf_records"][:i]
                    )
                    buf = readers[p].read(base)
                    return np.frombuffer(buf, dtype=dtype).reshape(shape).copy()
            raise InvalidDataError(
                "blosc: invalid compressed data: replicated leaf missing"
            )
        out = np.empty(shape, dtype=dtype)
        filled = np.zeros(shape, dtype=bool) if out.size else None
        for p, m in enumerate(metas):
            info = m["leaf_records"][i]
            base = 1 + sum(x["n"] for x in m["leaf_records"][:i])
            for k, span in enumerate(info.get("spans", [])):
                buf = readers[p].read(base + k)
                sub_shape = tuple(b - a for a, b in span)
                idx = tuple(slice(a, b) for a, b in span)
                out[idx] = np.frombuffer(buf, dtype=dtype).reshape(sub_shape)
                if filled is not None:
                    filled[idx] = True
        if filled is not None and not filled.all():
            raise InvalidDataError(
                "blosc: invalid compressed data: sharded leaf has holes"
            )
        return out
    finally:
        for r in readers:
            r.close()


def load_pytree_sharded(path_prefix, num_processes: int):
    """Reassemble a sharded checkpoint from all process files (host arrays)."""
    files = [f"{path_prefix}.p{p}.tpbs" for p in range(num_processes)]
    readers = [StreamReader(f) for f in files]
    try:
        metas = [json.loads(r.read(0)) for r in readers]
        for m in metas:
            if m.get("version") != _MANIFEST_VERSION:
                raise InvalidDataError(
                    "blosc: invalid version: sharded checkpoint manifest"
                )
        # per-process record cursors (record 0 is the manifest)
        cursors = [1] * num_processes

        def fetch_leaf(i: int, dtype, shape, t: str):
            if t == "array":  # replicated: stored by process 0 only
                out = None
                for p, m in enumerate(metas):
                    info = m["leaf_records"][i]
                    if info["n"]:
                        buf = readers[p].read(cursors[p])
                        out = np.frombuffer(buf, dtype=dtype).reshape(shape).copy()
                    cursors[p] += info["n"]
                if out is None:
                    raise InvalidDataError(
                        "blosc: invalid compressed data: replicated leaf missing"
                    )
                return out
            # sharded: gather every process's spans
            out = np.empty(shape, dtype=dtype)
            filled = np.zeros(shape, dtype=bool) if out.size else None
            for p, m in enumerate(metas):
                info = m["leaf_records"][i]
                for span in info.get("spans", []):
                    buf = readers[p].read(cursors[p])
                    cursors[p] += 1
                    sub_shape = tuple(b - a for a, b in span)
                    piece = np.frombuffer(buf, dtype=dtype).reshape(sub_shape)
                    idx = tuple(slice(a, b) for a, b in span)
                    out[idx] = piece
                    if filled is not None:
                        filled[idx] = True
            if filled is not None and not filled.all():
                raise InvalidDataError(
                    "blosc: invalid compressed data: sharded leaf has holes"
                )
            return out

        def fetch(node):
            t = node["t"]
            if t in ("array", "sharded_array"):
                return fetch_leaf(
                    node["i"], np.dtype(node["dtype"]), tuple(node["shape"]), t
                )
            if t == "array0":
                return np.empty(tuple(node["shape"]), np.dtype(node["dtype"]))
            if t == "dict":
                return {k: fetch(v) for k, v in node["items"]}
            if t == "list":
                return [fetch(v) for v in node["items"]]
            if t == "tuple":
                return tuple(fetch(v) for v in node["items"])
            if t == "raw":
                return node["v"]
            raise InvalidDataError(
                f"blosc: invalid compressed data: manifest node {t!r}"
            )

        return fetch(metas[0]["tree"])
    finally:
        for r in readers:
            r.close()
