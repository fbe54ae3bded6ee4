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
