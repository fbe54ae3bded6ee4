"""Fused Pallas moment-accumulation kernel for the feature stage.

Replaces the stage-2 voxel scatter of `ops/features.py` — the largest
single item inside the batched step (`segment_sum` over (B*P, 63) moment
rows + the 9-offset roll/shift combine: 1.29 ms of the 4.24 ms B=8 step,
measured in-scan by `tools/profile_scan_stages.py`; XLA's scatter-add is
row-rate bound, ~29 GB/s effective, on this TPU).

TPU-first reformulation: the scatter becomes a ONE-HOT CONTRACTION on the
MXU over COMPACT cells. Occupied voxels are ranked by a plain cumsum over
the dense occupancy grid (vid order, no sort, no scatter); every point
carries the compact rank of its 9 neighbor voxels (riding the existing
neighborhood gather). The kernel computes, per (batch lane, point tile):

    acc[:, c] += sum_oi  D_oi (16, PT) @ OH_oi (PT, 128)

where OH_oi[p, c] = (target_rank[p, oi] == c) selects the point's target
cell and D_oi packs the 9 moment columns ALREADY SHIFTED to the target
voxel center (cnt, S0, S1x, S1y, Sxx, Sxy, Syy, cnt*cx_t, cnt*cy_t; the
cx_t/cy_t columns recover each compact cell's voxel center afterwards, so
no inverse rank->vid map is ever materialized). Orientation matters: the
moment axis rides the MXU SUBLANES (M=16, two f32 sublane tiles — exact)
and cells ride the 128 LANES, so nothing pads (the r4 lesson: 8-wide
operands on the LANE axis waste 16x; on the sublane axis they are free).

Cell tiles are x-major slabs of the voxel grid (rank = cumsum in vid
order), so a (cell tile, point tile) pair whose x-ranges are disjoint
after dilating by (res + leaf) cannot receive any contribution — the
SMEM-prefetched slab test skips it with `pl.when`. MEASURED CAVEAT: with
azimuth-major host-compact points a 512-point tile spans ~13 full radar
rays (~315 m of x), so at bench occupancy the executed-pair fraction is
1.0 — the skip never fires without a device-side spatial re-sort of the
points (~0.4 ms argsort + pack gather), which is part of why this kernel
loses to the XLA scatter (see eval_results/FEATURE_ROOFLINE_r5.txt).

Exactness: OH entries are 0/1 (exact in any dtype); cnt columns are
exact integer sums in f32; weighted columns accumulate in f32 with
HIGHEST-precision dots — equal to the XLA scatter path up to f32
summation order (equivalence-tested at tolerance; the integer gates
nsamples/occupancy are bit-equal).

STATUS: measured NEGATIVE RESULT on this TPU — 7.5 ms (per-offset dots)
/ 13.7 ms (fused K-axis dot) vs 2.70 ms for the XLA scatter, in-scan at
B=8 (eval_results/FEATURE_ROOFLINE_r5.txt has the full analysis). Kept
as the equivalence-tested `feature.backend="pallas"` ablation; "auto"
picks the XLA scatter.

Runs compiled on TPU; interpreter mode on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: number of moment rows in the kernel output (9 used + 7 pad -> two f32
#: sublane tiles)
N_MOMENTS = 16
#: cells per MXU lane tile
CT = 128
#: points per grid step
PT = 512


def _moment_kernel(n_off, n_ct, offsets_m, ct_lo_ref, ct_hi_ref,
                   pt_lo_ref, pt_hi_ref, pack_ref, acc_ref):
    """One grid step: accumulate one point tile into all cell tiles.

    pack rows: 0 rx, 1 ry, 2 w, 3 own_cx, 4 own_cy,
               5..5+n_off mem_oi, 5+n_off..5+2*n_off trank_oi.
    offsets_m: static python list of (dx_m, dy_m) metric offsets.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    rx = pack_ref[0:1, :]                  # (1, PT)
    ry = pack_ref[1:2, :]
    w = pack_ref[2:3, :]
    ocx = pack_ref[3:4, :]
    ocy = pack_ref[4:5, :]

    # per-offset data rows, shifted to the TARGET voxel center
    # (rxt = rx - dx_m; the own-center accumulation + closed-form shift of
    # the XLA path collapses to computing the moments at shifted coords)
    d_rows = []
    for oi, (dxm, dym) in enumerate(offsets_m):
        mem = pack_ref[5 + oi:6 + oi, :]
        rxt = rx - dxm
        ryt = ry - dym
        wm = w * mem
        d_rows.append(jnp.concatenate([
            mem,                            # cnt
            wm,                             # S0
            wm * rxt, wm * ryt,             # S1
            wm * rxt * rxt, wm * rxt * ryt, wm * ryt * ryt,   # S2
            mem * (ocx + dxm),              # cnt * cx_target
            mem * (ocy + dym),              # cnt * cy_target
        ], axis=0))                         # (9, PT)

    # one (16, n_off*PT) data block and per-cell-tile one-hot, both in the
    # natural (sublane, lane) orientation — no in-kernel transposes; ONE
    # MXU contraction per cell tile over the fused (offset, point) axis
    d_all = jnp.concatenate(
        [jnp.concatenate(d_rows, axis=1),
         jnp.zeros((N_MOMENTS - 9, n_off * PT), jnp.float32)], axis=0)
    trank_all = jnp.concatenate(
        [pack_ref[5 + n_off + oi:6 + n_off + oi, :]
         for oi in range(n_off)], axis=1).astype(jnp.int32)   # (1, n_off*PT)

    plo = pt_lo_ref[b, j]
    phi = pt_hi_ref[b, j]
    for ct in range(n_ct):
        # x-slab overlap test (cell-tile x-range pre-dilated on host side)
        @pl.when((ct_lo_ref[b, ct] <= phi) & (ct_hi_ref[b, ct] >= plo))
        def _(ct=ct):
            cell_ids = jax.lax.broadcasted_iota(
                jnp.int32, (CT, n_off * PT), 0) + ct * CT
            oh = (trank_all == cell_ids).astype(jnp.float32)  # (CT, K)
            acc_ref[:, ct * CT:(ct + 1) * CT] += jax.lax.dot_general(
                d_all, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("offsets_m", "n_off", "c_pre",
                                             "interpret"))
def moment_accumulate(pack, ct_lo, ct_hi, pt_lo, pt_hi, offsets_m,
                      n_off: int, c_pre: int, interpret: bool = False):
    """Accumulate per-compact-cell feature moments.

    pack (B, R, N) f32 with R >= 5 + 2*n_off rows (see `_moment_kernel`;
    trank rows hold the target cell's compact rank as f32, >= c_pre for
    "no target"); ct_lo/ct_hi (B, c_pre/128) f32 dilated x-slab bounds of
    each cell tile; pt_lo/pt_hi (B, N/PT) f32 x-bounds of each point tile;
    offsets_m: tuple of (dx_m, dy_m) metric neighbor offsets (len n_off).

    Returns (B, 16, c_pre) f32: rows [cnt, S0, S1x, S1y, Sxx, Sxy, Syy,
    cnt*cx, cnt*cy, 0...] per compact cell, moments about the cell's voxel
    center."""
    b, r, n = pack.shape
    if n % PT or c_pre % CT:
        raise ValueError(f"moment_accumulate: N={n} %% {PT} and "
                         f"c_pre={c_pre} %% {CT} must be 0")
    n_ct = c_pre // CT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n // PT),
        in_specs=[
            pl.BlockSpec((None, r, PT), lambda i, j, *_: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((None, N_MOMENTS, c_pre),
                               lambda i, j, *_: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_moment_kernel, n_off, n_ct, tuple(offsets_m)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, N_MOMENTS, c_pre), jnp.float32),
        interpret=interpret,
    )(ct_lo.astype(jnp.float32), ct_hi.astype(jnp.float32),
      pt_lo.astype(jnp.float32), pt_hi.astype(jnp.float32),
      pack.astype(jnp.float32))


def supported(n_points: int, c_pre: int) -> bool:
    return n_points % PT == 0 and c_pre % CT == 0
