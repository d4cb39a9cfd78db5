"""Worker for the multi-process sharded checkpoint test (not a test module).

    python tests/ckpt_worker.py <pid> <nprocs> <port> <prefix>

Each process places a deterministic global array over the process mesh,
saves its shards via save_pytree_sharded, and (process 0 only, after a
barrier) reloads + verifies the reassembled tree.
"""

import sys


def main() -> None:
    pid, nprocs, port, prefix = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from tpu_blosc import checkpoint

    mesh = Mesh(np.array(jax.devices()), ("x",))
    global_shape = (nprocs * 4, 1000)
    sharding = NamedSharding(mesh, P("x", None))
    data = np.arange(
        global_shape[0] * global_shape[1], dtype=np.float32
    ).reshape(global_shape)

    # build the globally-sharded array from per-process local shards
    arr = jax.make_array_from_callback(
        global_shape, sharding, lambda idx: data[idx]
    )
    tree = {"w": arr, "bias": np.ones(7, np.float32), "step": 42}
    checkpoint.save_pytree_sharded(prefix, tree)
    multihost_utils.sync_global_devices("ckpt_written")

    if pid == 0:
        out = checkpoint.load_pytree_sharded(prefix, nprocs)
        assert np.array_equal(out["w"], data), "sharded leaf mismatch"
        assert np.array_equal(out["bias"], tree["bias"])
        assert out["step"] == 42
        # single-leaf load across the real process files
        leaf = checkpoint.load_leaf_sharded(prefix, nprocs, "w")
        assert np.array_equal(leaf, data), "load_leaf_sharded mismatch"
        assert checkpoint.load_leaf_sharded(prefix, nprocs, "step") == 42
        with open(prefix + ".ok", "w") as f:
            f.write("ok")


if __name__ == "__main__":
    main()
