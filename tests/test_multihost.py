"""Executed multi-host gather: 2 localhost processes over jax.distributed.

The reference has no distributed layer at all (SURVEY §2/§5: zero network
imports); dist/multihost.py is the must-build replacement.  This test
actually EXECUTES the P>1 process_allgather branch (multihost.py) with two
real processes on the CPU backend (Gloo collectives over localhost),
asserting both processes assemble a frame byte-identical to the
single-process compressor's output — the multi-host extension of the
mesh-invariance contract.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import tpu_blosc as blosc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_data() -> bytes:
    # must match multihost_worker.py exactly
    ramp = np.arange(140_000, dtype=np.float32).tobytes()
    noise = np.random.default_rng(7).integers(
        0, 256, 40_000, dtype=np.uint8
    ).tobytes()
    return ramp + noise


@pytest.mark.parametrize("nprocs", [2, 3])
def test_multihost_two_processes_bit_identical(tmp_path, nprocs):
    port = _free_port()
    outs = [str(tmp_path / f"frame_p{p}.bin") for p in range(nprocs)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children need no virtual device mesh
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(p), str(nprocs), str(port), outs[p]],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for p in range(nprocs)
    ]
    for proc in procs:
        try:
            _, err = proc.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert proc.returncode == 0, err.decode(errors="replace")[-2000:]

    frames = [open(o, "rb").read() for o in outs]
    # every process assembled the identical frame
    assert all(f == frames[0] for f in frames[1:])

    # ...and it is byte-identical to the single-process compressor
    data = _worker_data()
    single = blosc.compress_with_options(data, blosc.Options(block_size=65536))
    assert frames[0] == single
    assert blosc.decompress(frames[0]) == data

    # the workers' per-process decoded slices concatenate to the input
    slices = b"".join(open(o + ".dec", "rb").read() for o in outs)
    assert slices == data

    # work division: every process handled ~n/P bytes (within one block) —
    # the measured datapoint behind the linear-scaling claim (BASELINE.md)
    import json

    stats = [json.load(open(o + ".stats.json")) for o in outs]
    n = len(data)
    for s in stats:
        assert s["num_processes"] == nprocs
        assert abs(s["local_bytes"] - n / nprocs) <= 65536 + 1, s
        assert s["local_compress_s"] >= 0.0
    assert sum(s["local_bytes"] for s in stats) == n
    total_blocks = sum(s["local_blocks"] for s in stats)
    assert max(s["local_blocks"] for s in stats) <= total_blocks // nprocs + 1


def test_multihost_decode_single_process():
    """P=1 degenerate case of the sliced decoder."""
    from tpu_blosc.dist import multihost

    data = _worker_data()
    frame = blosc.compress_with_options(data, blosc.Options(block_size=65536))
    local, start, end = multihost.decompress_chunked_multihost(frame)
    assert (start, end) == (0, len(data))
    assert local == data
    # non-split frames pass through decompress
    small = blosc.compress(b"hello" * 100, blosc.LZ4, 5, blosc.NOSHUFFLE, 1)
    local, start, end = multihost.decompress_chunked_multihost(small)
    assert local == b"hello" * 100 and (start, end) == (0, 500)
