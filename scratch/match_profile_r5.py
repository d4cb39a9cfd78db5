"""Round-5: stage-level profile of the device match pipeline (VERDICT
item 2).  Replicates _compress_array_match's flow on the exact bench
shape (256 MiB tiled-f32 + 1% noise, 1 MiB blocks, ts=4) with honest
per-stage timers (fetch-rule: a warmup np.asarray precedes all timing,
then block_until_ready is honest).

Stages:
  A  filter program          (_device_filter_prep, block_until_ready)
  B  match programs          (count fori_loop + fused nibble kernel + pack)
  C  mask/meta fetch         (np.asarray of packed 33.5 MB + lit_counts + tail)
  D  host position scan      (_nb.mask_positions ctz)
  E  value gather            (delta encode + upload + gather program + fetch)
  F  host emit               (lz4_emit_mixed per block + frame assembly)

Also times the end-to-end match arm and the transfer arm, interleaved,
to place the stage sum against device_match_speedup.
"""

import os
import time

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

import sys
sys.path.insert(0, "/root/repo")
from tpu_blosc import device as tbdev  # noqa: E402
from tpu_blosc.options import Options  # noqa: E402
from tpu_blosc.format import Codec, Shuffle  # noqa: E402
from tpu_blosc.native import backend as _nb  # noqa: E402

BLOCK = 1024 * 1024


def _match_bench_data() -> np.ndarray:
    rng = np.random.default_rng(5)
    n_el = 64 * 1024 * 1024
    pattern = rng.random(256).astype(np.float32)
    data = np.tile(pattern, n_el // 256)
    hit = rng.choice(data.size, data.size // 100, replace=False)
    data[hit] += rng.random(hit.size).astype(np.float32) * 0.01
    return data


def profile_once(x, opts):
    ts = opts.type_size
    n = x.size * 4
    nb_full = n // BLOCK
    seg = BLOCK // ts
    offsets = tbdev._match_offsets(seg)
    stages = {}

    t = time.perf_counter()
    filtered, tail_d = tbdev._device_filter_prep(
        x, nb_full, BLOCK, ts, int(opts.shuffle)
    )
    jax.block_until_ready(filtered)
    stages["A_filter_prog"] = time.perf_counter() - t

    t = time.perf_counter()
    segs_d, best_d, lc_d, packed_d = tbdev._device_match_core_fused(
        filtered, seg, offsets
    )
    jax.block_until_ready((best_d, lc_d, packed_d))
    stages["B_match_progs"] = time.perf_counter() - t

    t = time.perf_counter()
    lit_counts = np.asarray(lc_d).astype(np.int64)
    tail = np.asarray(tail_d)
    best = np.asarray(best_d)
    packed = np.asarray(packed_d)
    stages["C_mask_fetch"] = time.perf_counter() - t

    offs = np.asarray(offsets, dtype=np.int32)
    d_all = offs[best]
    nseg = d_all.size
    sparse = lit_counts <= seg // 10
    sparse_idx = np.flatnonzero(sparse)
    dense_idx = np.flatnonzero(~sparse)
    n_real = int(lit_counts[sparse_idx].sum())

    t = time.perf_counter()
    pos = _nb.mask_positions(packed.reshape(-1), n_real)
    stages["D_mask_positions"] = time.perf_counter() - t
    assert pos is not None and pos.size == n_real

    t = time.perf_counter()
    du, dkeep = tbdev._delta_encode_positions(pos)
    stages["E1_delta_encode"] = time.perf_counter() - t

    t = time.perf_counter()
    cap = tbdev._cap_bucket(max(du.size, 4096))
    du_p = np.zeros(cap, np.uint16)
    du_p[: du.size] = du
    dup_dev = jax.device_put(du_p)
    jax.block_until_ready(dup_dev)
    stages["E2_pos_upload"] = time.perf_counter() - t

    t = time.perf_counter()
    vals_d = tbdev._device_gather_vals_delta(segs_d, dup_dev)
    jax.block_until_ready(vals_d)
    stages["E3_gather_prog"] = time.perf_counter() - t

    t = time.perf_counter()
    fetched = np.asarray(vals_d[: du.size])
    stages["E4_vals_fetch"] = time.perf_counter() - t
    vals = fetched[dkeep]

    t = time.perf_counter()
    rec_first = np.searchsorted(pos, (sparse_idx * seg).astype(np.int32))
    rec_last = np.append(rec_first[1:], n_real)
    if dense_idx.size:
        dense = np.asarray(
            tbdev._device_rows_gather(
                segs_d, jax.device_put(dense_idx.astype(np.int32)),
                int(dense_idx.size),
            )
        )
    stages["E5_dense_rows"] = time.perf_counter() - t

    t = time.perf_counter()
    sparse_pos_of = {int(s): j for j, s in enumerate(sparse_idx)}
    row_sparse = sparse.reshape(nb_full, ts)
    payloads = [b""] * nb_full
    entries = [0] * nb_full
    rebuild_blocks = []
    for blk in range(nb_full):
        if row_sparse[blk].all():
            parts_p, parts_v = [], []
            for tt in range(ts):
                s = blk * ts + tt
                j = sparse_pos_of[s]
                a, b = int(rec_first[j]), int(rec_last[j])
                parts_p.append(pos[a:b] - s * seg + tt * seg)
                parts_v.append(vals[a:b])
            stream = _nb.lz4_emit_mixed(
                np.concatenate(parts_p), np.concatenate(parts_v),
                d_all[blk * ts : (blk + 1) * ts], seg, BLOCK,
                cap=BLOCK // 4,
            )
            if stream is not None:
                payloads[blk] = stream
                entries[blk] = len(stream)
                continue
        rebuild_blocks.append(blk)
    stages["F_host_emit"] = time.perf_counter() - t
    stages["F_rebuild_blocks"] = len(rebuild_blocks)
    stages["n_real"] = n_real
    stages["nseg_sparse"] = int(sparse_idx.size)
    stages["nseg"] = int(nseg)
    return stages


def main():
    print("device:", jax.devices())
    x = jax.device_put(_match_bench_data())
    jax.block_until_ready(x)
    np.asarray(x[:8])  # honesty sync
    opts = Options(block_size=BLOCK)

    # full warmup of BOTH arms (compile + allocator)
    fm = tbdev.compress_array(x, opts, strategy="match")
    ft = tbdev.compress_array(x, opts, strategy="transfer")
    print("warm done; match frame", len(fm), "transfer frame", len(ft))
    _ = profile_once(x, opts)  # warm the staged variants too

    for rep in range(3):
        stages = profile_once(x, opts)
        t0 = time.perf_counter()
        tbdev.compress_array(x, opts, strategy="match")
        t_match = time.perf_counter() - t0
        t0 = time.perf_counter()
        tbdev.compress_array(x, opts, strategy="transfer")
        t_xfer = time.perf_counter() - t0
        tot = sum(v for k, v in stages.items()
                  if k[0] in "ABCDEF" and isinstance(v, float))
        print(f"--- rep {rep}: staged_sum={tot:.3f}s  e2e_match={t_match:.3f}s"
              f"  e2e_transfer={t_xfer:.3f}s  speedup={t_xfer/t_match:.2f}")
        for k in sorted(stages):
            v = stages[k]
            if isinstance(v, float):
                print(f"    {k:20s} {v*1e3:8.1f} ms")
            else:
                print(f"    {k:20s} {v}")


if __name__ == "__main__":
    main()
