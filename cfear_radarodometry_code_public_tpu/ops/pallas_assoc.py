"""Fused 1-NN association kernel: distance + argmin without HBM round-trips.

The dense XLA association backend materializes the (S, M_src, M_tar) squared
-distance matrix in HBM (~150 MB at CFEAR-3 Oxford scale) and reads it back
for the argmin — ~0.33 ms per association iteration, pure bandwidth. This
kernel computes each (TS, M_tar) distance tile in VMEM from broadcasted
coordinate vectors and reduces it to (min, argmin) on the VPU in the same
pass, so only the tiny (M_src,) results ever touch HBM.

The difference form (sx - tx)^2 + (sy - ty)^2 is used rather than the
|s|^2 + |t|^2 - 2 s.t matmul form: with only 2 coordinates the MXU brings no
advantage (K would be padded to 128 lanes, inflating FLOPs 64x), and the
difference form has no cancellation error — it matches the reference
kd-tree's arithmetic (`pointnormal.cpp:238-254`) bit-for-bit semantics
(exact nearest neighbor, lowest-index tie-break like `jnp.argmin`).

Runs compiled on TPU; interpreter mode on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TS = 256            # source rows per grid step (512 measured slower: 479.8 vs 486.6 fps batched)
_TS_FAT = 512        # fat tile for batched grids (fewer grid steps; the
                     # round-1 512-slower measurement was at cells=3072
                     # where the (512, M) d2 transient crowded VMEM)


def _nn_kernel(sx_ref, sy_ref, tx_ref, ty_ref, mask_ref, nn_ref, d2_ref):
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]
    tx = tx_ref[...]                       # (1, M)
    ty = ty_ref[...]
    dx = sx - tx                           # (TS, M) in VMEM
    dy = sy - ty
    d2 = dx * dx + dy * dy + mask_ref[...]   # +inf on invalid targets
    nn_ref[...] = jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
    d2_ref[...] = jnp.min(d2, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def nn_min(src_xy, tar_xy, tar_valid, interpret: bool = False,
           ts: int | None = None):
    """Exact 1-NN of each source point among each keyframe's target points.

    src_xy (M, 2); tar_xy (S, M, 2); tar_valid (S, M) bool.
    Returns (nn (S, M) int32, d2min (S, M) f32 — +inf rows where no valid
    target exists). Identical results to the dense XLA argmin backend.

    `ts` is the source-tile height (grid-step granularity). Default: the
    fat tile when the (ts, M) d2 transient stays within ~4 MB of VMEM —
    fewer grid steps amortize the fixed per-step overhead, which dominates
    once the call is vmapped over a batch (vmap prepends the batch as a
    sequential grid dimension).
    """
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    if ts is None:
        ts = _TS_FAT if (m <= 2048 and m_src % _TS_FAT == 0) else _TS
    if m_src % ts:
        raise ValueError(
            f"nn_min: m_src={m_src} not divisible by source tile ts={ts} "
            "(the grid would silently drop the trailing rows)")
    sx = src_xy[:, 0:1].astype(jnp.float32)              # (M, 1)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)[:, None, :]  # (S, 1, M)
    ty = tar_xy[..., 1].astype(jnp.float32)[:, None, :]
    mask = jnp.where(tar_valid, 0.0, jnp.inf)[:, None, :].astype(jnp.float32)

    nn, d2 = pl.pallas_call(
        _nn_kernel,
        grid=(s, m_src // ts),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((ts, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, ts, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, ts, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((s, m_src, 1), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src, 1), jnp.float32)],
        interpret=interpret,
    )(sx, sy, tx, ty, mask)
    return nn[..., 0], d2[..., 0]


def supported(m: int) -> bool:
    """The kernel requires the cell budget to tile evenly."""
    return m % _TS == 0


# ---------------------------------------------------------------------------
# multi-keyframe kernel: in-kernel loop over S, fat source tiles
# ---------------------------------------------------------------------------
#
# The (s, m // TS) grid of `nn_min` becomes pathological once the call is
# vmapped over a batch: vmap prepends the batch as ANOTHER sequential grid
# dimension, so a batch-8 CFEAR-3 association runs 8*4*8 = 256 tiny
# (256, M) grid steps whose fixed per-step overhead (~5 us) dominates the
# ~0.5 Mop of compute each carries (measured: 0.1 -> 1.45 ms net going
# B1 -> B8). This variant keeps ALL S keyframes' target rows resident in
# VMEM (S*M*3 f32 = 1.8 MB even at s50 scale) and loops over them with an
# in-kernel fori_loop, so the grid is just the source tiles: batch-8
# CFEAR-3 runs 8*4 = 32 fat steps doing S times the work each.

def _ts_multi(m: int) -> int:
    # d2 transient is (TS, M) f32; keep it ~4 MB so double-buffered target
    # rows + outputs still fit the ~16 MB VMEM
    return 512 if m <= 2048 else 256


def _nn_multi_kernel(n_kf, sx_ref, sy_ref, tx_ref, ty_ref, mask_ref,
                     nn_ref, d2_ref):
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]

    def body(s, _):
        tx = tx_ref[pl.ds(s, 1), :]        # (1, M)
        ty = ty_ref[pl.ds(s, 1), :]
        msk = mask_ref[pl.ds(s, 1), :]
        dx = sx - tx                       # (TS, M)
        dy = sy - ty
        d2 = dx * dx + dy * dy + msk
        nn_ref[pl.ds(s, 1), :] = (
            jnp.argmin(d2, axis=1).astype(jnp.int32)[None, :])
        d2_ref[pl.ds(s, 1), :] = jnp.min(d2, axis=1)[None, :]
        return 0

    jax.lax.fori_loop(0, n_kf, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_min_multi(src_xy, tar_xy, tar_valid, interpret: bool = False):
    """Exact 1-NN per keyframe, identical results to `nn_min`.

    src_xy (M, 2); tar_xy (S, M, 2); tar_valid (S, M). Returns
    (nn (S, M_src) int32, d2min (S, M_src) f32). Same arithmetic and
    tie-break as `nn_min` (difference form, lowest-index argmin)."""
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    ts = _ts_multi(m)
    if m_src % ts:
        raise ValueError(
            f"nn_min_multi: m_src={m_src} not divisible by tile ts={ts}")
    sx = src_xy[:, 0:1].astype(jnp.float32)              # (M_src, 1)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)              # (S, M)
    ty = tar_xy[..., 1].astype(jnp.float32)
    mask = jnp.where(tar_valid, 0.0, jnp.inf).astype(jnp.float32)

    nn, d2 = pl.pallas_call(
        functools.partial(_nn_multi_kernel, s),
        grid=(m_src // ts,),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda i: (i, 0)),
            pl.BlockSpec((ts, 1), lambda i: (i, 0)),
            pl.BlockSpec((s, m), lambda i: (0, 0)),
            pl.BlockSpec((s, m), lambda i: (0, 0)),
            pl.BlockSpec((s, m), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, ts), lambda i: (0, i)),
            pl.BlockSpec((s, ts), lambda i: (0, i)),
        ],
        out_shape=[jax.ShapeDtypeStruct((s, m_src), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src), jnp.float32)],
        interpret=interpret,
    )(sx, sy, tx, ty, mask)
    return nn, d2


def supported_multi(m_src: int, m_tar: int) -> bool:
    """Tiling constraint for `nn_min_multi`."""
    return m_src % _ts_multi(m_tar) == 0 and m_tar % 128 == 0


def _nn_multi_unrolled_kernel(n_kf, sx_ref, sy_ref, tx_ref, ty_ref,
                              mask_ref, nn_ref, d2_ref):
    # STATIC python loop over keyframes: every slice index is a
    # compile-time constant, so Mosaic emits plain vector loads/stores
    # (the fori_loop variant's dynamic sublane slicing lowers worse)
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]
    for s in range(n_kf):
        dx = sx - tx_ref[s:s + 1, :]       # (TS, M)
        dy = sy - ty_ref[s:s + 1, :]
        d2 = dx * dx + dy * dy + mask_ref[s:s + 1, :]
        nn_ref[s:s + 1, :] = (
            jnp.argmin(d2, axis=1).astype(jnp.int32)[None, :])
        d2_ref[s:s + 1, :] = jnp.min(d2, axis=1)[None, :]


# ---------------------------------------------------------------------------
# block-sparse kernel: bounding-box tile skipping
# ---------------------------------------------------------------------------
#
# At CFEAR-3-s50 scale the dense association is VPU-compute-bound
# (S * M^2 distances per outer iteration, ~4.3 Gop at batch 8 / 16 active
# keyframes) although ~85-90% of (source cell, keyframe) pairs end beyond
# the association radius. When the cell maps are spatially ordered
# (feature.spatial_sort Morton order), contiguous cell tiles are compact
# blobs, so a (source tile, target tile) pair whose bounding boxes are
# farther apart than the association radius can skip its distance tile
# entirely. The skip test runs on scalars prefetched to SMEM; skipped
# pairs cost a few scalar ops. EXACT for the downstream gate: a skipped
# pair can only contain distances > radius, which the `ok` gate rejects
# anyway — rows whose true 1-NN sits beyond the radius report (+inf, 0)
# exactly like the dense kernel's masked rows.

_TT_SPARSE = 512     # target columns per skip-test granule


def _nn_sparse_kernel(n_tt, tt, sb_ref, tb_ref, r2_ref,
                      sx_ref, sy_ref, tx_ref, ty_ref, mask_ref,
                      nn_ref, d2_ref, best_scr, barg_scr):
    i = pl.program_id(0)                   # keyframe
    j = pl.program_id(1)                   # source tile
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]
    best_scr[...] = jnp.full(best_scr.shape, jnp.inf, jnp.float32)
    barg_scr[...] = jnp.zeros(barg_scr.shape, jnp.int32)
    sxmin = sb_ref[j, 0]
    sxmax = sb_ref[j, 1]
    symin = sb_ref[j, 2]
    symax = sb_ref[j, 3]
    for jt in range(n_tt):
        gapx = jnp.maximum(jnp.maximum(tb_ref[i, jt, 0] - sxmax,
                                       sxmin - tb_ref[i, jt, 1]), 0.0)
        gapy = jnp.maximum(jnp.maximum(tb_ref[i, jt, 2] - symax,
                                       symin - tb_ref[i, jt, 3]), 0.0)

        @pl.when(gapx * gapx + gapy * gapy <= r2_ref[0])
        def _():
            tx = tx_ref[0, jt * tt:(jt + 1) * tt]      # (1, TT) static
            ty = ty_ref[0, jt * tt:(jt + 1) * tt]
            msk = mask_ref[0, jt * tt:(jt + 1) * tt]
            dx = sx - tx                                # (TS, TT)
            dy = sy - ty
            d2 = dx * dx + dy * dy + msk
            lmin = jnp.min(d2, axis=1, keepdims=True)   # (TS, 1)
            larg = (jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
                    + jt * tt)
            better = lmin < best_scr[...]   # strict '<': earlier (lower
            # index) tiles win exact ties, like jnp.argmin
            barg_scr[...] = jnp.where(better, larg, barg_scr[...])
            best_scr[...] = jnp.where(better, lmin, best_scr[...])

    nn_ref[...] = barg_scr[...].reshape(nn_ref.shape)
    d2_ref[...] = best_scr[...].reshape(d2_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def nn_min_sparse(src_xy, src_bounds, tar_xy, tar_bounds, tar_valid,
                  radius, interpret: bool = False, ts: int = 256):
    """Block-sparse exact 1-NN within `radius` per keyframe.

    src_xy (M_src, 2); src_bounds (M_src/ts, 4) [xmin,xmax,ymin,ymax] of
    each source tile (invalid cells excluded); tar_xy (S, M, 2);
    tar_bounds (S, M/_TT_SPARSE, 4); tar_valid (S, M); radius scalar (the
    CURRENT association radius — pairs beyond it may report +inf).
    Returns (nn (S, M_src) i32, d2 (S, M_src) f32): identical to `nn_min`
    for every row whose true 1-NN distance is <= radius; rows beyond the
    radius report d2 >= radius^2 (possibly +inf), which the association
    gate rejects either way."""
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    tt = _TT_SPARSE
    if m_src % ts or m % tt:
        raise ValueError(
            f"nn_min_sparse: m_src={m_src} %% ts={ts} and m_tar={m} %% "
            f"tt={tt} must both be 0 (grid truncation drops rows otherwise)")
    n_tt = m // tt
    sx = src_xy[:, 0:1].astype(jnp.float32)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)[:, None, :]   # (S, 1, M)
    ty = tar_xy[..., 1].astype(jnp.float32)[:, None, :]
    mask = jnp.where(tar_valid, 0.0, jnp.inf)[:, None, :].astype(jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    r2 = jnp.reshape(radius * radius, (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s, m_src // ts),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda i, j, *_: (j, 0)),
            pl.BlockSpec((ts, 1), lambda i, j, *_: (j, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, ts, 1), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((None, ts, 1), lambda i, j, *_: (i, j, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((ts, 1), jnp.float32),
                        pltpu.VMEM((ts, 1), jnp.int32)],
    )
    nn, d2 = pl.pallas_call(
        functools.partial(_nn_sparse_kernel, n_tt, tt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((s, m_src, 1), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src, 1), jnp.float32)],
        interpret=interpret,
    )(src_bounds.astype(jnp.float32), tar_bounds.astype(jnp.float32), r2,
      sx, sy, tx, ty, mask)
    return nn[..., 0], d2[..., 0]


def _nn_sparse_multi_kernel(n_kf, n_tt, tt, sb_ref, tb_ref, r2_ref,
                            sx_ref, sy_ref, tx_ref, ty_ref, mask_ref,
                            nn_ref, d2_ref):
    """Block-sparse 1-NN with the keyframe loop INSIDE the kernel.

    Grid = source tiles only. The (S, m_src/ts) grid of `nn_min_sparse`
    pays the fixed per-grid-step cost S times per source tile — and vmap
    over a batch prepends ANOTHER sequential grid dim, so a batch-8 s50
    association runs 8*50*8 = 3200 thin steps (~2 us each = 6.4 ms of
    pure overhead). Here the grid is 8*8 = 64 fat steps; each loops over
    the S keyframes with a `fori_loop` and over target tiles statically,
    skipping (src tile, tar tile) pairs by the same SMEM bounding-box
    test."""
    j = pl.program_id(0)                   # source tile
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]
    ts = sx.shape[0]
    sxmin = sb_ref[j, 0]
    sxmax = sb_ref[j, 1]
    symin = sb_ref[j, 2]
    symax = sb_ref[j, 3]
    r2 = r2_ref[0]

    def kf_body(i, _):
        best = jnp.full((ts, 1), jnp.inf, jnp.float32)
        barg = jnp.zeros((ts, 1), jnp.int32)
        for jt in range(n_tt):
            gapx = jnp.maximum(jnp.maximum(tb_ref[i, jt, 0] - sxmax,
                                           sxmin - tb_ref[i, jt, 1]), 0.0)
            gapy = jnp.maximum(jnp.maximum(tb_ref[i, jt, 2] - symax,
                                           symin - tb_ref[i, jt, 3]), 0.0)

            def hit(best=best, barg=barg, jt=jt):
                tx = tx_ref[pl.ds(i, 1), jt * tt:(jt + 1) * tt]  # (1, TT)
                ty = ty_ref[pl.ds(i, 1), jt * tt:(jt + 1) * tt]
                msk = mask_ref[pl.ds(i, 1), jt * tt:(jt + 1) * tt]
                dx = sx - tx                                # (TS, TT)
                dy = sy - ty
                d2 = dx * dx + dy * dy + msk
                lmin = jnp.min(d2, axis=1, keepdims=True)
                larg = (jnp.argmin(d2, axis=1, keepdims=True)
                        .astype(jnp.int32) + jt * tt)
                better = lmin < best     # strict '<': lowest-index ties
                return (jnp.where(better, lmin, best),
                        jnp.where(better, larg, barg))

            best, barg = jax.lax.cond(
                gapx * gapx + gapy * gapy <= r2, hit,
                lambda best=best, barg=barg: (best, barg))
        nn_ref[pl.ds(i, 1), :] = barg.reshape(1, ts)
        d2_ref[pl.ds(i, 1), :] = best.reshape(1, ts)
        return 0

    jax.lax.fori_loop(0, n_kf, kf_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def nn_min_sparse_multi(src_xy, src_bounds, tar_xy, tar_bounds, tar_valid,
                        radius, interpret: bool = False, ts: int = 256):
    """`nn_min_sparse` semantics, keyframe loop in-kernel (see the kernel
    docstring for why). Identical outputs to `nn_min_sparse`."""
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    tt = _TT_SPARSE
    if m_src % ts or m % tt:
        raise ValueError(
            f"nn_min_sparse_multi: m_src={m_src} %% ts={ts} and m_tar={m} "
            f"%% tt={tt} must both be 0")
    sx = src_xy[:, 0:1].astype(jnp.float32)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)               # (S, M)
    ty = tar_xy[..., 1].astype(jnp.float32)
    mask = jnp.where(tar_valid, 0.0, jnp.inf).astype(jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    r2 = jnp.reshape(radius * radius, (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_src // ts,),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda j, *_: (j, 0)),
            pl.BlockSpec((ts, 1), lambda j, *_: (j, 0)),
            pl.BlockSpec((s, m), lambda j, *_: (0, 0)),
            pl.BlockSpec((s, m), lambda j, *_: (0, 0)),
            pl.BlockSpec((s, m), lambda j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, ts), lambda j, *_: (0, j)),
            pl.BlockSpec((s, ts), lambda j, *_: (0, j)),
        ],
    )
    nn, d2 = pl.pallas_call(
        functools.partial(_nn_sparse_multi_kernel, s, m // tt, tt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((s, m_src), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src), jnp.float32)],
        interpret=interpret,
    )(src_bounds.astype(jnp.float32), tar_bounds.astype(jnp.float32), r2,
      sx, sy, tx, ty, mask)
    return nn, d2


def _nn_sparse_unrolled_kernel(n_kf, n_tt, tt, sb_ref, tb_ref, r2_ref,
                               sx_ref, sy_ref, tx_ref, ty_ref, mask_ref,
                               nn_ref, d2_ref, best_scr, barg_scr):
    """Block-sparse 1-NN, keyframes unrolled STATICALLY in-kernel.

    profile_s50 v2 (TPU v5e, 967-cell occupancy, 22.4% executed pairs):
    the (S, m_src/ts) grid `nn_min_sparse` spends ~85% of its time on
    per-grid-step fixed costs (3200 thin steps at B8 s50 — scratch init,
    output writes, pipeline sync), not on the surviving distance tiles;
    the fori_loop variant (`nn_min_sparse_multi`) trades them for
    dynamic-slice + loop overhead (9.3 vs 7.3 ms — worse). Here the grid
    is source tiles only (64 fat steps at B8) and BOTH loops are
    unrolled at trace time: every target-row slice is static, every
    (keyframe, tar-tile) pair is one `pl.when`-guarded straight-line
    block with its SMEM bbox test, and per-keyframe (best, argmin) live
    in registers between blocks."""
    j = pl.program_id(0)                   # source tile
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]
    ts = sx.shape[0]
    sxmin = sb_ref[j, 0]
    sxmax = sb_ref[j, 1]
    symin = sb_ref[j, 2]
    symax = sb_ref[j, 3]
    r2 = r2_ref[0]

    # pl.when (scalar predicate, side effects on scratch) lowers to a real
    # jump; a value-carried lax.cond is predicated — BOTH sides execute,
    # destroying the skip (measured: the cond variant ran SLOWER than
    # dense)
    for i in range(n_kf):
        best_scr[...] = jnp.full(best_scr.shape, jnp.inf, jnp.float32)
        barg_scr[...] = jnp.zeros(barg_scr.shape, jnp.int32)
        for jt in range(n_tt):
            gapx = jnp.maximum(jnp.maximum(tb_ref[i, jt, 0] - sxmax,
                                           sxmin - tb_ref[i, jt, 1]), 0.0)
            gapy = jnp.maximum(jnp.maximum(tb_ref[i, jt, 2] - symax,
                                           symin - tb_ref[i, jt, 3]), 0.0)

            @pl.when(gapx * gapx + gapy * gapy <= r2)
            def _(i=i, jt=jt):
                tx = tx_ref[i:i + 1, jt * tt:(jt + 1) * tt]    # (1, TT)
                ty = ty_ref[i:i + 1, jt * tt:(jt + 1) * tt]
                msk = mask_ref[i:i + 1, jt * tt:(jt + 1) * tt]
                dx = sx - tx                                # (TS, TT)
                dy = sy - ty
                d2 = dx * dx + dy * dy + msk
                lmin = jnp.min(d2, axis=1, keepdims=True)
                larg = (jnp.argmin(d2, axis=1, keepdims=True)
                        .astype(jnp.int32) + jt * tt)
                better = lmin < best_scr[...]   # strict '<': lowest-index
                barg_scr[...] = jnp.where(better, larg, barg_scr[...])
                best_scr[...] = jnp.where(better, lmin, best_scr[...])
        nn_ref[i:i + 1, :] = barg_scr[...].reshape(1, ts)
        d2_ref[i:i + 1, :] = best_scr[...].reshape(1, ts)


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def nn_min_sparse_unrolled(src_xy, src_bounds, tar_xy, tar_bounds,
                           tar_valid, radius, interpret: bool = False,
                           ts: int = 256):
    """`nn_min_sparse` semantics, statically-unrolled in-kernel keyframe
    loop (see the kernel docstring). Identical outputs."""
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    tt = _TT_SPARSE
    if m_src % ts or m % tt:
        raise ValueError(
            f"nn_min_sparse_unrolled: m_src={m_src} %% ts={ts} and "
            f"m_tar={m} %% tt={tt} must both be 0")
    sx = src_xy[:, 0:1].astype(jnp.float32)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)               # (S, M)
    ty = tar_xy[..., 1].astype(jnp.float32)
    mask = jnp.where(tar_valid, 0.0, jnp.inf).astype(jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    r2 = jnp.reshape(radius * radius, (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_src // ts,),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda j, *_: (j, 0)),
            pl.BlockSpec((ts, 1), lambda j, *_: (j, 0)),
            pl.BlockSpec((s, m), lambda j, *_: (0, 0)),
            pl.BlockSpec((s, m), lambda j, *_: (0, 0)),
            pl.BlockSpec((s, m), lambda j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, ts), lambda j, *_: (0, j)),
            pl.BlockSpec((s, ts), lambda j, *_: (0, j)),
        ],
        scratch_shapes=[pltpu.VMEM((ts, 1), jnp.float32),
                        pltpu.VMEM((ts, 1), jnp.int32)],
    )
    nn, d2 = pl.pallas_call(
        functools.partial(_nn_sparse_unrolled_kernel, s, m // tt, tt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((s, m_src), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src), jnp.float32)],
        interpret=interpret,
    )(src_bounds.astype(jnp.float32), tar_bounds.astype(jnp.float32), r2,
      sx, sy, tx, ty, mask)
    return nn, d2


def _nn_sparse_attrs_kernel(n_tt, tt, sb_ref, tb_ref, r2_ref,
                            sx_ref, sy_ref, tx_ref, ty_ref, mask_ref,
                            at_ref, nn_ref, d2_ref, g_ref,
                            best_scr, barg_scr, gsel_scr):
    """Block-sparse 1-NN + fused attribute lookup.

    Extends `_nn_sparse_kernel`: for every EXECUTED (src tile, tar tile)
    pair, the winning target's attribute columns are selected on the MXU
    via a local one-hot contraction (at_tile (D, TT) @ onehot^T (TT, TS))
    and carried in VMEM scratch next to the running (min, argmin) — the
    separate per-iteration XLA one-hot/gather pass (4.5 ms at s50 B8) and
    its HBM round-trip disappear. Selection via one-hot dot is EXACT: each
    row has exactly one 1.0, products 1.0*x and 0.0*x are exact, and at
    most one nonzero enters each sum (HIGHEST precision keeps f32 operands
    unsplit). Rows whose every pair was skipped report (+inf, 0, zeros);
    the downstream radius gate rejects them either way."""
    j = pl.program_id(1)                   # source tile
    sx = sx_ref[...]                       # (TS, 1)
    sy = sy_ref[...]
    best_scr[...] = jnp.full(best_scr.shape, jnp.inf, jnp.float32)
    barg_scr[...] = jnp.zeros(barg_scr.shape, jnp.int32)
    gsel_scr[...] = jnp.zeros(gsel_scr.shape, jnp.float32)
    ts = sx.shape[0]
    sxmin = sb_ref[j, 0]
    sxmax = sb_ref[j, 1]
    symin = sb_ref[j, 2]
    symax = sb_ref[j, 3]
    i = pl.program_id(0)                   # keyframe
    for jt in range(n_tt):
        gapx = jnp.maximum(jnp.maximum(tb_ref[i, jt, 0] - sxmax,
                                       sxmin - tb_ref[i, jt, 1]), 0.0)
        gapy = jnp.maximum(jnp.maximum(tb_ref[i, jt, 2] - symax,
                                       symin - tb_ref[i, jt, 3]), 0.0)

        @pl.when(gapx * gapx + gapy * gapy <= r2_ref[0])
        def _():
            tx = tx_ref[0, jt * tt:(jt + 1) * tt]      # (1, TT) static
            ty = ty_ref[0, jt * tt:(jt + 1) * tt]
            msk = mask_ref[0, jt * tt:(jt + 1) * tt]
            at = at_ref[:, jt * tt:(jt + 1) * tt]      # (D_pad, TT)
            dx = sx - tx                                # (TS, TT)
            dy = sy - ty
            d2 = dx * dx + dy * dy + msk
            lmin = jnp.min(d2, axis=1, keepdims=True)   # (TS, 1)
            larg_l = jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
            larg = larg_l + jt * tt
            better = lmin < best_scr[...]   # strict '<': earlier (lower
            # index) tiles win exact ties, like jnp.argmin
            oh = (jax.lax.broadcasted_iota(jnp.int32, (ts, tt), 1)
                  == larg_l).astype(jnp.float32)        # (TS, TT)
            g_new = jax.lax.dot_general(
                at, oh, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)    # (D_pad, TS)
            gsel_scr[...] = jnp.where(better.reshape(1, ts), g_new,
                                      gsel_scr[...])
            barg_scr[...] = jnp.where(better, larg, barg_scr[...])
            best_scr[...] = jnp.where(better, lmin, best_scr[...])

    nn_ref[...] = barg_scr[...].reshape(nn_ref.shape)
    d2_ref[...] = best_scr[...].reshape(d2_ref.shape)
    g_ref[...] = gsel_scr[...].reshape(g_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def nn_min_sparse_attrs(src_xy, src_bounds, tar_xy, tar_bounds, tar_valid,
                        attrs_t, radius, interpret: bool = False,
                        ts: int = 256):
    """`nn_min_sparse` + fused attribute lookup in one kernel pass.

    MEASURED NEGATIVE RESULT (kept as a working variant + equivalence
    test, NOT in the hot path): end-to-end on TPU v5e this is 17-24%
    SLOWER than nn_min_sparse + the separate XLA one-hot contraction
    (s50 exact 129.5 -> 107.8 fps/chip, K16 b4 348.9 -> 265.5; r4 bench).
    The per-executed-pair (D_pad, TT) dots pad D_pad=8 rows onto the
    128-lane MXU (16x waste) and serialize against the VPU distance
    reduction, while XLA pipelines one large one-hot matmul at full
    throughput. The lesson matches pallas_lm: on this hardware, fusing
    small MXU ops into a VPU kernel loses to separate well-pipelined XLA
    passes.

    attrs_t: (S, D_pad, M) f32 — the world-attribute matrix of
    `registration._world_attrs`, TRANSPOSED so the cell axis is the
    128-aligned lane dimension (D_pad = 8 or 16, the f32 sublane tile).
    Returns (nn (S, M_src) i32, d2 (S, M_src) f32, g (S, D_pad, M_src)
    f32) with g[i, :, n] = attrs_t[i, :, nn[i, n]] for every row whose
    1-NN lies within `radius` (zeros for skipped rows — which the radius
    gate rejects regardless)."""
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    tt = _TT_SPARSE
    d_pad = attrs_t.shape[1]
    if m_src % ts or m % tt:
        raise ValueError(
            f"nn_min_sparse_attrs: m_src={m_src} %% ts={ts} and m_tar={m} "
            f"%% tt={tt} must both be 0")
    if d_pad % 8:
        raise ValueError(f"attrs_t D_pad={d_pad} must be a multiple of 8")
    sx = src_xy[:, 0:1].astype(jnp.float32)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)[:, None, :]   # (S, 1, M)
    ty = tar_xy[..., 1].astype(jnp.float32)[:, None, :]
    mask = jnp.where(tar_valid, 0.0, jnp.inf)[:, None, :].astype(jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    r2 = jnp.reshape(radius * radius, (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s, m_src // ts),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda i, j, *_: (j, 0)),
            pl.BlockSpec((ts, 1), lambda i, j, *_: (j, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, 1, m), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, d_pad, m), lambda i, j, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, ts, 1), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((None, ts, 1), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((None, d_pad, ts), lambda i, j, *_: (i, 0, j)),
        ],
        scratch_shapes=[pltpu.VMEM((ts, 1), jnp.float32),
                        pltpu.VMEM((ts, 1), jnp.int32),
                        pltpu.VMEM((d_pad, ts), jnp.float32)],
    )
    nn, d2, g = pl.pallas_call(
        functools.partial(_nn_sparse_attrs_kernel, m // tt, tt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((s, m_src, 1), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src, 1), jnp.float32),
                   jax.ShapeDtypeStruct((s, d_pad, m_src), jnp.float32)],
        interpret=interpret,
    )(src_bounds.astype(jnp.float32), tar_bounds.astype(jnp.float32), r2,
      sx, sy, tx, ty, mask, attrs_t.astype(jnp.float32))
    return nn[..., 0], d2[..., 0], g


def tile_bounds(xy, valid, tile: int):
    """Per-contiguous-tile bounding boxes [xmin,xmax,ymin,ymax].

    xy (..., N, 2), valid (..., N) -> (..., N/tile, 4); empty tiles get
    (+inf, -inf, +inf, -inf) so every pair test skips them."""
    shape = xy.shape[:-2] + (xy.shape[-2] // tile, tile)
    x = jnp.where(valid, xy[..., 0], jnp.inf).reshape(shape)
    y = jnp.where(valid, xy[..., 1], jnp.inf).reshape(shape)
    xn = jnp.where(valid, xy[..., 0], -jnp.inf).reshape(shape)
    yn = jnp.where(valid, xy[..., 1], -jnp.inf).reshape(shape)
    return jnp.stack([jnp.min(x, -1), jnp.max(xn, -1),
                      jnp.min(y, -1), jnp.max(yn, -1)], -1)


def supported_sparse(m_src: int, m_tar: int, ts: int = 256) -> bool:
    return m_src % ts == 0 and m_tar % _TT_SPARSE == 0


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def nn_min_multi_unrolled(src_xy, tar_xy, tar_valid,
                          interpret: bool = False, ts: int | None = None):
    """`nn_min_multi` with a statically-unrolled keyframe loop.

    Grid = source tiles only (batch vmap prepends its own grid dim), so a
    batch-8 x 16-keyframe association runs 8 * (M_src/ts) fat steps doing
    S tile reductions each, instead of 8*16*(M_src/ts) thin ones."""
    s, m = tar_valid.shape
    m_src = src_xy.shape[0]
    if ts is None:
        ts = _ts_multi(m)
    if m_src % ts:
        raise ValueError(
            f"nn_min_multi_unrolled: m_src={m_src} not divisible by "
            f"tile ts={ts}")
    sx = src_xy[:, 0:1].astype(jnp.float32)              # (M_src, 1)
    sy = src_xy[:, 1:2].astype(jnp.float32)
    tx = tar_xy[..., 0].astype(jnp.float32)              # (S, M)
    ty = tar_xy[..., 1].astype(jnp.float32)
    mask = jnp.where(tar_valid, 0.0, jnp.inf).astype(jnp.float32)

    nn, d2 = pl.pallas_call(
        functools.partial(_nn_multi_unrolled_kernel, s),
        grid=(m_src // ts,),
        in_specs=[
            pl.BlockSpec((ts, 1), lambda i: (i, 0)),
            pl.BlockSpec((ts, 1), lambda i: (i, 0)),
            pl.BlockSpec((s, m), lambda i: (0, 0)),
            pl.BlockSpec((s, m), lambda i: (0, 0)),
            pl.BlockSpec((s, m), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, ts), lambda i: (0, i)),
            pl.BlockSpec((s, ts), lambda i: (0, i)),
        ],
        out_shape=[jax.ShapeDtypeStruct((s, m_src), jnp.int32),
                   jax.ShapeDtypeStruct((s, m_src), jnp.float32)],
        interpret=interpret,
    )(sx, sy, tx, ty, mask)
    return nn, d2
