"""Pallas TPU kernels + the measured device-path engineering record.

What lives here
---------------
1. ``stream_probe`` — genuine Pallas kernels: a pass over device-resident
   data computing compressibility statistics (adjacent-byte run fraction,
   mean byte value) without moving the data to the host.  Powers
   ``tpu_blosc.suggest_codec``.
2. Re-exports of the XLA shuffle bodies (jaxops) as the device filter
   path — a deliberate, measured decision, not an omission.

Kernel experiment record (this chip; round-2 numbers were per-call timed
and async-contaminated — everything re-measured round 3 with loop-slope
timing at 64 MiB; the honest streaming ceiling is ~400 GB/s processed on
819 GB/s HBM):

    round-2 per-call numbers (KEPT FOR HISTORY, inflated ~20-30x):
    XLA reshape-transpose shuffle   ts=4: "1464"  — honest: 60-82
    Pallas elementwise (x*2)              "2979"  — honest: ~213
    Pallas shift/mask contig-pack   ts=4:  153
    Pallas uint8 (T,4)->(4,T) .T          Mosaic crash (HTTP 500)
    Pallas int32-cast block .T            Mosaic crash
    Pallas (...,128,4)->(...,4,128) swap  Mosaic crash
    Pallas strided lane slice y[:,0::4]   gather lowering error
    Pallas (T,512)->(T,128,4) reshape     Mosaic crash
    Pallas pltpu.roll by 511 lanes        compiles 320 s, runs 26 GB/s
    Pallas 5 reductions in one kernel     compile hang (>400 s)
    Pallas 1 reduction per kernel         compiles 0.5 s, 15-22 GB/s

    round-3 slope-timed (GB/s processed, 64 MiB):
    XLA shuffle ts=4 (P=8 payload)         81.9  (P32 72.5, plain 64.5,
                                                  P128 45.7, u32pack 21.2)
    XLA unshuffle ts=4 (plain transpose)   77.8  (P8 51.5, P128 60.5)
    XLA bitshuffle ts=4 (unrolled 64-op)   38    (u64 butterfly 8.8 —
                                                  u64 ops are emulated)
    Pallas elementwise u32 (x*2)           213
    Pallas CONTIGUOUS lane slice + concat  232   ← lowers fine!
    Pallas contiguous sublane slice        250
    Pallas cross-word byte shift (<<8|>>24) 252
    Pallas narrow sublane concat (127x1)   Mosaic crash (vpad vector)
    Pallas fused match select+open+nibble  23.8  (11.3 ms/256 MiB — the
          20-offset eq recompute is VPU-bound; replaces an ~100 ms XLA
          subchain of ~44 passes, ~9x on that stage)

Conclusions encoded below: (a) Mosaic cannot lower cross-lane byte
REGROUPINGS (strided slices, minor-dim reshapes, rolls) — but CONTIGUOUS
lane/sublane slices + concats lower cleanly at near-ceiling speed, which
is what the fused match kernel (match_select_open_nibble) is built from;
(b) XLA's transpose codegen keeps the shuffle/bitshuffle device path
(filters/jaxops.py, filters/batched.py); (c) reduction kernels are
VPU-int-op bound — fine for probing, wrong for full streams; keep one
reduction chain per kernel and avoid lane rolls; (d) byte-granular
predicates are cheapest as 0x80-per-byte masks in u32 lanes (the
haszero trick), not as bool arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the device filter bodies (XLA codegen — see module docstring)
from .jaxops import (  # noqa: F401  (re-exported for the dispatch layer)
    bit_shuffle_body,
    bit_unshuffle_body,
    shuffle_bytes_body,
    unshuffle_bytes_body,
)

_LANES = 512          # int32 words per row (4 lane-tiles)
_TILE_ROWS = 512      # rows per grid step (1 MiB per step)
_INTERPRET = jax.default_backend() not in ("tpu",)


def _runs_kernel(x_ref, o_ref):
    """Within-word adjacent-equal byte pairs (3 of every 4 pairs — an
    unbiased sample; the cross-word pair needs a lane roll, which Mosaic
    compiles pathologically — see module docstring)."""
    x = x_ref[:].astype(jnp.uint32)
    intra = (x ^ (x >> 8)) & jnp.uint32(0xFFFFFF)
    eq = (
        ((intra & 0xFF) == 0).astype(jnp.int32)
        + (((intra >> 8) & 0xFF) == 0).astype(jnp.int32)
        + (((intra >> 16) & 0xFF) == 0).astype(jnp.int32)
    )
    o_ref[0] = jnp.zeros((8, 128), jnp.int32) + jnp.sum(eq)


def _bytesum_kernel(x_ref, o_ref):
    """Sum of all byte values (mod 2^32) — one fused reduction chain."""
    x = x_ref[:].astype(jnp.uint32)
    t = (x & 0xFF) + ((x >> 8) & 0xFF) + ((x >> 16) & 0xFF) + (x >> 24)
    o_ref[0] = jnp.zeros((8, 128), jnp.int32) + jnp.sum(t.astype(jnp.int32))


def _make_probe(kernel):
    @jax.jit
    def run(x: jax.Array) -> jax.Array:
        grid = x.shape[0] // _TILE_ROWS
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (_TILE_ROWS, _LANES),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=_INTERPRET,
        )(x)

    return run


_probe_runs = _make_probe(_runs_kernel)
_probe_bytesum = _make_probe(_bytesum_kernel)


def probe_ready(data) -> jax.Array:
    """Device-put a byte buffer in the probe's expected (rows, 512) int32
    layout, zero-padded and SNAPPED to 1, 2, or 4 tiles (1-4 MiB).

    Snapping keeps the pallas_call grid one of three shapes, so the
    compile cache is bounded (each new grid costs a ~25 s TPU compile over
    the tunnel); inputs beyond 4 MiB are sampled with EIGHT evenly-spaced
    windows spanning the whole buffer (round-2 verdict: a prefix-only
    sample mis-advises heterogeneous data) — probe statistics, not exact
    counts, are the contract.
    """
    host = np.frombuffer(
        data.tobytes() if isinstance(data, np.ndarray) else bytes(data),
        dtype=np.uint8,
    )
    tile_bytes = _TILE_ROWS * _LANES * 4
    tiles_needed = -(-max(host.size, 1) // tile_bytes)
    tiles = 1 if tiles_needed <= 1 else 2 if tiles_needed <= 2 else 4
    budget = tiles * tile_bytes
    if host.size > budget:
        # strided multi-window sample across the full input
        nwin = 8
        win = budget // nwin
        step = (host.size - win) // (nwin - 1)
        host = np.concatenate(
            [host[k * step : k * step + win] for k in range(nwin)]
        )
    buf = np.zeros(budget, dtype=np.uint8)
    buf[: host.size] = host
    return jax.device_put(buf.view(np.int32).reshape(-1, _LANES))


def stream_probe(data) -> dict:
    """One pass of compressibility statistics on the accelerator.

    Returns {"run_fraction", "mean_byte", "n"}.  High run_fraction means
    RLE-like data where LZ4 excels; low run_fraction with a skewed byte
    distribution suggests entropy coding (ZSTD/ZLIB); run_fraction ~1/256
    with mean ~127.5 reads as incompressible.

    Accepts bytes / ndarray, or a jax.Array already in probe_ready()
    layout (rows, 512) int32 — the zero-transfer path for device data.
    """
    if isinstance(data, jax.Array):
        a = data
        if a.ndim != 2 or a.shape[1] != _LANES or a.dtype != jnp.int32:
            raise TypeError(
                "device arrays must be (rows, 512) int32; use probe_ready()"
            )
        n = int(a.shape[0]) * _LANES * 4
    else:
        n = len(data) if not isinstance(data, np.ndarray) else data.nbytes
        a = probe_ready(data)
    runs = int(np.asarray(_probe_runs(a))[:, 0, 0].astype(np.int64).sum())
    bsum = int(np.asarray(_probe_bytesum(a))[:, 0, 0].astype(np.int64).sum())
    total = a.shape[0] * _LANES * 4
    n = min(n, total)  # probe_ready samples at most 4 tiles
    # the zero padding contributes exactly 3 equal pairs per padded word
    # (all-zero bytes) and 0 to the byte sum; correct both out
    pad_words = (total - n) // 4
    runs = max(runs - 3 * pad_words, 0)
    pairs = max(3 * (n // 4), 1)
    return {
        "run_fraction": min(runs / pairs, 1.0),
        "mean_byte": bsum / max(n, 1),
        "n": n,
    }


# ---------------------------------------------------------------------------
# byte-shuffle kernels (round 4): elementwise byte-plane split/merge
# ---------------------------------------------------------------------------
#
# Round-4 finding (scratch/pallas_r4_probe*.py, measured on the attached
# v5e): the ts=4 byte shuffle needs NO lane regrouping at all when the
# kernel's output ref is uint8 — plane c is just ((w >> 8c) & 0xFF) of
# every word IN ORDER, and the u8 STORE does the byte packing in the
# store unit.  The whole XLA SWAR _t4x4 dance exists only because an
# XLA-level u8 output materializes with relayouts.  Honest loop-slope
# numbers, feedback-chained pair (shuffle∘unshuffle), per-op GB/s:
#
#   64 MiB:  pair per-op 663 (intermediates VMEM-resident), one-way ~450
#   256 MiB: pair per-op 338 — at the HBM wall (1 GiB traffic / 1.59 ms
#            = 676 GB/s of the 819 peak), no VMEM help possible
#
# vs the XLA SWAR path's 141-144 (ts4) / 84-90 (ts2).  Strided lane
# loads (pl.Slice(t, k, 4)) still crash Mosaic server-side (HTTP 500),
# so ts8/ts16 — which need phase compaction — stay on the SWAR path;
# ts2 rides the same elementwise trick in u16 words.
#
# ts=8/16 two-pass byte-plane chains: DEAD END (probed 2026-08-19,
# scratch/pallas_r5_probe.py).  The split decomposes cleanly (ts8 =
# ts4-extract over u32 words, then lo/hi extract over each plane as
# u16), but the inter-pass reinterpret is unobtainable: value-level
# lax.bitcast_convert_type with a width change is NotImplementedError
# in this Mosaic, and pltpu.bitcast lowers with SUBLANE-INTERLEAVE
# semantics — u16 (S,512)->u8 gives out[2s+k,l] = byte k of in[s,l],
# pairing bytes 512 lanes apart, never lane-adjacent.  Every
# reformulation (u16 truncate-store ladders, compensating write
# permutations, index-map block remaps, (n,2) minor-dim views,
# pack/unpack_elementwise — value ops, no density change) reduces to a
# lane-strided access or a lane-dim-2 materialization, both known
# walls.  Word-granularity downsampling (the f64 even/odd word split)
# is intrinsically lane-strided; only within-word byte extraction
# changes density for free (u8/u16 stores pack in the store unit),
# which is why ts<=4 works and ts>=8 cannot.  The same argument caps
# any Pallas bitshuffle at >=3 passes (each pass downsamples <=4x
# in-word; bitshuffle needs 8*ts) — 6x HBM traffic ~= 110 GB/s ceiling
# vs SWAR's 98-141: not worth the compile risk.  Do not retry without
# a Mosaic that lowers lane-strided slices.
#
# ts=8/16 via OUTSIDE-the-kernel XLA deinterleave: DEAD END too (probed
# 2026-08-20, scratch/r5_deint_probe.py, 256 MiB pair-chained slope).
# The even/odd word split at the XLA level (strided slice or
# reshape+barrier+minor-pick) feeding 2-/4-input plane kernels is
# oracle-correct but the deint pass ALONE (deint+reint identity pair:
# 108 GB/s per-op) costs more than the whole SWAR ts8 shuffle pair
# (146.5 GB/s per-op today; ts16 154.8).  Composition end-to-end: 77
# (ts8) / 87 (ts16) GB/s — a 1.7-1.9x loss.  XLA's strided u32 lane
# slice materializes at ~108 GB/s, nowhere near the HBM wall, and
# pallas operands cannot absorb the fusion.  SWAR stays production for
# ts>=8.

_BP_LN = 512  # lanes per kernel row (words)


def _plane_split_kernel(ts: int):
    def kern(x_ref, o_ref):
        # u16 vector shifts don't legalize (arith.shrui on packed i16);
        # widen to u32 in-register — the conversion is a value op, cheap
        w = x_ref[0].astype(jnp.uint32)
        for c in range(ts):
            o_ref[0, c] = ((w >> (8 * c)) & 0xFF).astype(jnp.uint8)

    return kern


def _plane_merge_kernel(ts: int, wdt):
    def kern(p_ref, o_ref):
        w = p_ref[0, 0].astype(jnp.uint32)
        for c in range(1, ts):
            w = w | (p_ref[0, c].astype(jnp.uint32) << (8 * c))
        o_ref[0] = w.astype(wdt)

    return kern


def byte_plane_fusable(bs: int, ts: int) -> bool:
    """Geometry gate: the (rows, 512)-word view of one block needs whole
    tiles of >= 8 sublane rows."""
    if ts not in (2, 4):
        return False
    rows = bs // ts // _BP_LN
    return bs % (ts * _BP_LN) == 0 and rows >= 8 and rows % 8 == 0


def _bp_tile(rows: int) -> int:
    sl = 512
    while rows % sl:
        sl //= 2
    return sl


@partial(jax.jit, static_argnums=(1,))
def byte_plane_split(xw, ts: int):
    """(nb, W) words of ts-byte elements -> (nb, ts, W) uint8 byte planes
    (flattening the last two dims of the output gives the byte-shuffled
    stream of each block).  ≙ shuffleBytes (shuffle.go:60-64) per block."""
    nb, W = xw.shape
    rows = W // _BP_LN
    sl = _bp_tile(rows)
    x3 = xw.reshape(nb, rows, _BP_LN)
    out = pl.pallas_call(
        _plane_split_kernel(ts),
        out_shape=jax.ShapeDtypeStruct((nb, ts, rows, _BP_LN), jnp.uint8),
        grid=(nb, rows // sl),
        in_specs=[pl.BlockSpec((1, sl, _BP_LN), lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec(
            (1, ts, sl, _BP_LN), lambda b, i: (b, 0, i, 0)
        ),
        interpret=_INTERPRET,
    )(x3)
    return out.reshape(nb, ts, W)


@partial(jax.jit, static_argnums=(1,))
def byte_plane_merge(planes, ts: int):
    """(nb, ts, W) uint8 byte planes -> (nb, W) words; the inverse of
    byte_plane_split.  ≙ unshuffleBytes (shuffle.go:85-117) per block."""
    nb, _, W = planes.shape
    rows = W // _BP_LN
    sl = _bp_tile(rows)
    wdt = jnp.uint16 if ts == 2 else jnp.uint32
    p4 = planes.reshape(nb, ts, rows, _BP_LN)
    out = pl.pallas_call(
        _plane_merge_kernel(ts, wdt),
        out_shape=jax.ShapeDtypeStruct((nb, rows, _BP_LN), wdt),
        grid=(nb, rows // sl),
        in_specs=[
            pl.BlockSpec((1, ts, sl, _BP_LN), lambda b, i: (b, 0, i, 0))
        ],
        out_specs=pl.BlockSpec((1, sl, _BP_LN), lambda b, i: (b, i, 0)),
        interpret=_INTERPRET,
    )(p4)
    return out.reshape(nb, W)


# ---------------------------------------------------------------------------
# fused match kernel: per-row best-offset equality + opening(T) + nibble mask
# ---------------------------------------------------------------------------

_MF_LANES = 512  # u32 lanes per sublane row of the kernel's segment view


def _make_match_kernel(offsets: tuple, SL: int, seg: int, tail: int, T: int):
    """Kernel: ONE grid step = one segment, viewed as (SL, 512) u32.

    The TPU half of the match-strategy literal-mask stage (the Go
    reference's encoder inner loop, codec.go:63-128, restructured as a
    data-parallel single pass).  For the row's chosen offset d the kernel
    computes the byte-equality mask eq[p] = (x[p] == x[p-d]), erodes and
    dilates it to runs >= T (the literal-island rule of
    device._open_mask), and emits the literal mask as one nibble per u32
    word — all in VMEM, one HBM read + n/4 write.  Replaces an ~44-pass
    XLA subchain (measured 9x on the stage; see the module record).

    Built exclusively from the Mosaic-lowerable vocabulary: contiguous
    lane/sublane slices + concats, in-word shifts, the 0x80-haszero byte
    equality.  The per-row offset is DATA (scalar-prefetched), so eq is
    computed for every candidate offset and where-selected — VPU ops are
    ~50x cheaper than the HBM passes they replace.
    """
    LN = _MF_LANES

    def _shift_builder(src, down):
        """bytes-shift(src, s): stream-right when down else stream-left.
        Narrow sublane-dim concats crash Mosaic (vpad on vector<Nx1>), so
        the sublane carry is ONE full-width shifted copy; each word shift
        is then a single lane-dim concat of two contiguous slices."""
        if down:
            carry = jnp.concatenate(
                [jnp.zeros((1, LN), jnp.uint32), src[:-1, :]], axis=0
            )
        else:
            carry = jnp.concatenate(
                [src[1:, :], jnp.zeros((1, LN), jnp.uint32)], axis=0
            )
        cache = {}

        def ws(k):
            if k == 0:
                return src
            if k not in cache:
                if down:
                    cache[k] = jnp.concatenate(
                        [carry[:, LN - k:], src[:, :LN - k]], axis=1
                    )
                else:
                    cache[k] = jnp.concatenate(
                        [src[:, k:], carry[:, :k]], axis=1
                    )
            return cache[k]

        def sh(s):
            kw, b = divmod(s, 4)
            if b == 0:
                return ws(kw)
            if down:
                return (ws(kw) << (8 * b)) | (ws(kw + 1) >> (8 * (4 - b)))
            return (ws(kw) >> (8 * b)) | (ws(kw + 1) << (8 * (4 - b)))

        return sh

    def kern(bd_ref, x_ref, o_ref):
        w = x_ref[0]
        i0 = pl.program_id(0)
        bi = bd_ref[i0, 0]  # best offset INDEX into `offsets`
        dv = bd_ref[i0, 1]  # best offset VALUE (bytes)
        shr = _shift_builder(w, down=True)
        eq = jnp.zeros((SL, LN), jnp.uint32)
        for i, d in enumerate(offsets):
            s = shr(d)
            z = w ^ s
            y = (z & jnp.uint32(0x7F7F7F7F)) + jnp.uint32(0x7F7F7F7F)
            e = ~(y | z | jnp.uint32(0x7F7F7F7F))  # 0x80 per equal byte
            eq = jnp.where(bi == i, e, eq)
        # positional masks, bits at 0x80 per byte: head (pos >= d) and
        # forced literal tail (pos < seg - tail)
        wp4 = (
            jax.lax.broadcasted_iota(jnp.int32, (SL, LN), 0) * LN
            + jax.lax.broadcasted_iota(jnp.int32, (SL, LN), 1)
        ) * 4
        keep = jnp.zeros((SL, LN), jnp.uint32)
        for t in range(4):
            bit = jnp.uint32(0x80 << (8 * t))
            keep = keep | jnp.where(
                (wp4 + t >= dv) & (wp4 + t < seg - tail), bit, 0
            )
        eq = eq & keep
        # erosion er[p] = AND_{s<T} eq[p+s] (stream-left shifts) ...
        shl = _shift_builder(eq, down=False)
        er = eq
        for s in range(1, T):
            er = er & shl(s)
        # ... dilation match[p] = OR_{s<T} er[p-s] (stream-right shifts)
        shr2 = _shift_builder(er, down=True)
        match = er
        for s in range(1, T):
            match = match | shr2(s)
        lit = ~match
        # nibble: out-byte bit t = lit bit of byte t of this word
        n = (
            ((lit >> 7) & 1)
            | ((lit >> 14) & 2)
            | ((lit >> 21) & 4)
            | ((lit >> 28) & 8)
        )
        o_ref[0] = n.astype(jnp.uint8)

    return kern


def match_fusable(seg: int, offsets: tuple) -> bool:
    """Geometry gate for the fused kernel: the (SL, 512)-u32 segment view
    needs seg % 16384 == 0 (SL a multiple of 8), and word shifts stay
    within one lane row only for offsets <= 2044 bytes."""
    return (
        seg % (4 * _MF_LANES * 8) == 0
        and len(offsets) > 0
        and max(offsets) + 4 <= 4 * _MF_LANES
    )


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def match_select_open_nibble(
    segs, bd, seg: int, offsets: tuple, tail: int, T: int
):
    """(nseg, seg)-u8 filtered segments + per-row (index, value) best
    offsets -> (nseg, seg//4)-u8 literal-mask nibbles (bit t of byte j =
    byte 4j+t is a literal).  Callers gate on match_fusable()."""
    nseg = segs.shape[0]
    SL = seg // 4 // _MF_LANES
    # little-endian word view via 4 strided-slice shift-ors — NOT
    # bitcast_convert_type: its (..., 4) minor-dim reshape gets a 32x
    # tile-padded layout at scale (32 GiB for a 256 MiB input, compile
    # OOM).  Strided u8 slices are XLA's own fast path.
    w = (
        segs[:, 0::4].astype(jnp.uint32)
        | (segs[:, 1::4].astype(jnp.uint32) << 8)
        | (segs[:, 2::4].astype(jnp.uint32) << 16)
        | (segs[:, 3::4].astype(jnp.uint32) << 24)
    ).reshape(nseg, SL, _MF_LANES)
    kern = _make_match_kernel(offsets, SL, seg, tail, T)
    nib = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nseg, SL, _MF_LANES), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nseg,),
            in_specs=[
                pl.BlockSpec((1, SL, _MF_LANES), lambda i, bd: (i, 0, 0))
            ],
            out_specs=pl.BlockSpec(
                (1, SL, _MF_LANES), lambda i, bd: (i, 0, 0)
            ),
        ),
        interpret=_INTERPRET,
    )(bd, w)
    return nib.reshape(nseg, seg // 4)
