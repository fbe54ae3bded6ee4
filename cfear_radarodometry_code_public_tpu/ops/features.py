"""Oriented surface points ("cells"): the core CFEAR feature representation.

TPU-first re-design of `MapPointNormal` / `cell`
(`pointnormal.cpp:7-63,265-297`). The reference voxel-downsamples the cloud
(leaf = res/downsample_factor), then for every voxel centroid runs a kd-tree
radius search (r = res) over the full cloud and computes an intensity-weighted
mean / 2x2 covariance / smallest-eigenvector normal per cell.

Here the kd-tree + per-cell loops become three dense array passes:

1. scatter-add points into a static voxel grid -> per-voxel unweighted
   centroid (the voxel-grid "sample mean" of `pointnormal.cpp:277-280`);
2. for each of the (2*noff+1)^2 neighbor offsets, test every point against
   the neighbor voxel's centroid (exact circular radius test, identical to
   the kd radius search) and scatter-add weighted moments into that voxel's
   accumulator — coordinates are accumulated RELATIVE to the voxel center so
   f32 moments stay well-conditioned;
3. closed-form 2x2 eigendecomposition per voxel (no LAPACK), validity gates
   (`pointnormal.cpp:53-56`), then compaction to a fixed `max_cells` budget.

Weighted statistics match `cell::cell` (`pointnormal.cpp:7-36`):
w_i = max(intensity_i - 60, 0) (or 1), normalized to sum 1;
mean = sum w_i x_i; cov = sum w_i (x_i - mean)(x_i - mean)^T.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cfear_radarodometry_code_public_tpu.config import CFEARConfig
from cfear_radarodometry_code_public_tpu.ops.filtering import PointCloud
from cfear_radarodometry_code_public_tpu.utils import se2


class CellMap(NamedTuple):
    """Fixed-size masked set of oriented surface points (one scan)."""

    mean: jax.Array        # (M, 2) float32 — weighted mean, sensor-local frame
    normal: jax.Array      # (M, 2) float32 — unit normal (toward sensor)
    cov: jax.Array         # (M, 2, 2) float32
    nsamples: jax.Array    # (M,) float32 — points inside the search radius
    planarity: jax.Array   # (M,) float32 — scale_ = log(1 + cond/2)
    valid: jax.Array       # (M,) bool

    @property
    def n(self) -> jax.Array:
        return jnp.sum(self.valid)


def _grid_geometry(cfg: CFEARConfig):
    """Static voxel-grid geometry for the feature stage."""
    leaf = cfg.feature.res / cfg.feature.downsample_factor
    half = int(math.ceil(cfg.radar.max_usable_range / leaf)) + 2
    dim = 2 * half
    # the Morton spatial sort (_morton2) interleaves <=15-bit coordinates
    # and uses 2^30 as its invalid-cell sentinel; fail loudly instead of
    # silently colliding codes on extreme max_usable_range/leaf configs
    if dim > (1 << 15):
        raise ValueError(
            f"voxel grid dim {dim} exceeds the 15-bit Morton-code limit "
            f"(max_usable_range={cfg.radar.max_usable_range}, leaf={leaf}); "
            "increase feature.res or reduce radar.max_usable_range")
    noff = int(math.ceil(cfg.feature.res / leaf))
    return leaf, dim, noff


def _eig2x2_min(a, b, c):
    """Eigen-pair of symmetric [[a, b], [b, c]]: (lmin, lmax, evec_min).

    Closed form; evec picked from the better-conditioned column of
    (A - lmin I)'s adjugate to stay stable when b ~ 0.
    """
    half_tr = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    lmin = half_tr - disc
    lmax = half_tr + disc
    v1 = jnp.stack([lmin - c, b], -1)       # rows of (A - lmax I) ~ evec of lmin
    v2 = jnp.stack([b, lmin - a], -1)
    n1 = jnp.sum(v1 * v1, -1)
    n2 = jnp.sum(v2 * v2, -1)
    v = jnp.where((n1 >= n2)[..., None], v1, v2)
    vn = jnp.sum(v * v, -1, keepdims=True)
    # degenerate (isotropic) covariance: fall back to x-axis
    v = jnp.where(vn > 1e-20, v * jax.lax.rsqrt(jnp.maximum(vn, 1e-20)),
                  jnp.stack([jnp.ones_like(a), jnp.zeros_like(a)], -1))
    return lmin, lmax, v


def _morton2(ix, iy):
    """Interleave two <=15-bit non-negative int32 coordinates (Morton/Z
    order): bit k of ix lands at position 2k, iy at 2k+1."""
    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return spread(ix) | (spread(iy) << 1)


def budget_points(points: PointCloud, budget: int) -> PointCloud:
    """Row compaction to a fixed point budget (batched: leaves are (B, N, ...)).

    Overflow policy: drop the WEAKEST-intensity points (their feature weight
    max(I-60, 0) is smallest), never an azimuth wedge. This is THE device-side
    budget contract — the native host compaction
    (`native/cfear_io.cpp` filter_frames_host_compact) must match it
    bit-for-bit (tested in tests/test_native_io.py)."""
    key = jnp.where(points.valid, points.intensity, -1.0)
    order = jnp.argsort(-key, axis=-1)[..., :budget]
    # one packed (rows, 5) gather instead of four per-array gathers
    # (gathers are row-rate-bound on this TPU)
    packed = jnp.concatenate(
        [points.xy, points.intensity[..., None],
         points.valid.astype(points.xy.dtype)[..., None],
         points.peak.astype(points.xy.dtype)[..., None]], axis=-1)
    kept = jnp.take_along_axis(packed, order[..., None], axis=-2)
    return PointCloud(
        xy=kept[..., 0:2],
        intensity=kept[..., 2],
        valid=kept[..., 3] > 0.5,
        peak=kept[..., 4] > 0.5)


def compute_cells(points: PointCloud, cfg: CFEARConfig) -> CellMap:
    """Point cloud -> oriented surface points (sensor-local frame)."""
    batched = compute_cells_batched(
        jax.tree.map(lambda a: a[None], points), cfg)
    return jax.tree.map(lambda a: a[0], batched)


def compute_cells_batched(points: PointCloud, cfg: CFEARConfig) -> CellMap:
    """Batched oriented-surface-point extraction: leaves carry (B, N, ...).

    Identical per-lane results to `jax.vmap(compute_cells)`, but all lanes
    share ONE segment_sum per stage (segment ids offset by lane*ncells) and
    ONE neighborhood gather — XLA serializes vmapped scatters/gathers per
    lane, which flattens batched throughput (measured: vmap x8 costs ~8x a
    single frame; this formulation keeps the scatter's flat ~0.37 ms cost).
    """
    feat = cfg.feature
    leaf, dim, noff = _grid_geometry(cfg)
    ncells = dim * dim
    p = feat.point_budget
    if p and p < points.xy.shape[1]:
        # row compaction: every scatter/gather below is row-bound, and the
        # (A, k) candidate array carries many invalid slots
        points = budget_points(points, p)

    backend = feat.backend
    if backend == "auto":
        # MEASURED NEGATIVE RESULT (r5, eval_results/FEATURE_ROOFLINE_r5):
        # the fused one-hot MXU moment kernel loses to the XLA scatter on
        # this TPU in every formulation tried (7.5 / 13.7 ms vs 2.70 ms
        # in-scan at B=8) — occupied voxels (~4.5k) are 5x the post-gate
        # cell count, azimuth-ordered point tiles span the full world so
        # bbox skipping never fires, and the one-hot contraction does 128x
        # redundant MACs at 6-pass f32 precision. "auto" therefore always
        # picks the XLA scatter; the kernel stays as an explicitly
        # selectable, equivalence-tested backend.
        backend = "xla"
    if backend == "pallas":
        return _compute_cells_batched_pallas(
            points, cfg, interpret=jax.default_backend() == "cpu")

    xy = points.xy                                            # (B, N, 2)
    b, n_pts = xy.shape[0], xy.shape[1]
    valid = points.valid                                      # (B, N)
    lane = jnp.arange(b, dtype=jnp.int32)[:, None]            # (B, 1)

    # --- stage 1: voxel centroids (unweighted, like pcl::VoxelGrid) ---
    vidx = jnp.floor(xy / leaf).astype(jnp.int32) + dim // 2
    in_grid = valid & jnp.all((vidx >= 0) & (vidx < dim), axis=-1)
    vid = vidx[..., 0] * dim + vidx[..., 1]                   # (B, N)
    # lane-offset flat segment ids; one shared overflow slot at b*ncells
    vid_flat = jnp.where(in_grid, lane * ncells + vid, b * ncells)
    ones = in_grid.astype(jnp.float32)
    # one fused scatter for [count, sum_x, sum_y] (scatter cost is a flat
    # ~0.37 ms on this TPU regardless of width — never scatter twice)
    s1 = jax.ops.segment_sum(
        jnp.concatenate([ones[..., None], xy * ones[..., None]],
                        -1).reshape(b * n_pts, 3),
        vid_flat.reshape(b * n_pts),
        num_segments=b * ncells + 1)[:b * ncells].reshape(b, ncells, 3)
    cnt_vox, sum_vox = s1[..., 0], s1[..., 1:3]               # (B, ncells, .)
    centroid = sum_vox / jnp.maximum(cnt_vox, 1.0)[..., None]
    occupied = cnt_vox >= 1.0

    # --- stage 2: weighted moments per candidate cell ---
    if feat.weight_intensity:
        w_pt = jnp.maximum(points.intensity - feat.intensity_floor, 0.0)
    else:
        w_pt = jnp.ones_like(points.intensity)

    offsets = [(dx, dy) for dx in range(-noff, noff + 1)
               for dy in range(-noff, noff + 1)]
    # Pre-pack each voxel's neighborhood (centroid x/y + occupancy per
    # offset) with dense rolls so the per-offset loop below needs NO gathers
    # — ONE (B*N, 3*n_off) gather replaces 3 gathers per offset (dynamic
    # gathers are the slow op on this TPU; the rolls and the scatter are
    # cheap). Rolled wrap-around entries are masked by the `ok` bounds test.
    cgrid = jnp.concatenate(
        [centroid.reshape(b, dim, dim, 2),
         occupied.reshape(b, dim, dim, 1).astype(jnp.float32)], -1)
    nb = jnp.concatenate(
        [jnp.roll(cgrid, (-dx, -dy), (1, 2)) for dx, dy in offsets], -1)
    vid_c = jnp.clip(jnp.where(in_grid, vid, ncells), 0, ncells - 1)
    nb_pt = nb.reshape(b * ncells, 3 * len(offsets))[
        (lane * ncells + vid_c).reshape(b * n_pts)]           # (B*N, 27)
    nb_pt = nb_pt.reshape(b, n_pts, 3 * len(offsets))

    # Per-offset membership masks (per-point circular gate vs the TARGET
    # voxel's centroid). The scatter itself targets each point's OWN voxel:
    # for a fixed offset the target id is own_id + const, so the per-offset
    # scatter result equals the own-voxel scatter ROLLED by the offset on the
    # dense grid — ONE (B*N)-row scatter with 9x7 masked columns replaces the
    # (9*B*N)-row scatter (scatter cost is row-bound on this TPU). Moments
    # are accumulated about the OWN voxel center and shifted to the target
    # center in closed form afterwards (rel_t = rel_own - offset*leaf).
    own_cx = (vidx[..., 0].astype(jnp.float32) - dim // 2 + 0.5) * leaf
    own_cy = (vidx[..., 1].astype(jnp.float32) - dim // 2 + 0.5) * leaf
    rx = xy[..., 0] - own_cx                              # (B, N)
    ry = xy[..., 1] - own_cy
    base = jnp.stack(
        [jnp.ones_like(w_pt),           # raw sample count
         w_pt,                          # S0
         w_pt * rx, w_pt * ry,          # S1 (own-center coordinates)
         w_pt * rx * rx, w_pt * rx * ry, w_pt * ry * ry],  # S2
        axis=-1)                                          # (B, N, 7)

    mem_cols = []
    for oi, (dx, dy) in enumerate(offsets):
        tx = vidx[..., 0] + dx
        ty = vidx[..., 1] + dy
        ok = in_grid & (tx >= 0) & (tx < dim) & (ty >= 0) & (ty < dim)
        c = nb_pt[..., 3 * oi:3 * oi + 2]
        occ = nb_pt[..., 3 * oi + 2] > 0.5
        d2 = jnp.sum((xy - c) ** 2, axis=-1)
        mem_cols.append(ok & occ & (d2 <= feat.res * feat.res))
    mem = jnp.stack(mem_cols, -1).astype(jnp.float32)     # (B, N, n_off)

    data = (mem[..., :, None] * base[..., None, :]).reshape(
        b, n_pts, len(offsets) * 7)
    acc_own = jax.ops.segment_sum(
        data.reshape(b * n_pts, -1), vid_flat.reshape(b * n_pts),
        num_segments=b * ncells + 1)[:b * ncells].reshape(
            b, dim, dim, len(offsets), 7)

    # roll each offset's grid onto its target voxel and shift the moment
    # origin from the own center to the target center (d = offset * leaf)
    acc = jnp.zeros((b, dim, dim, 7), jnp.float32)
    for oi, (dx, dy) in enumerate(offsets):
        g = jnp.roll(acc_own[..., oi, :], (dx, dy), (1, 2))
        dxl, dyl = dx * leaf, dy * leaf
        cnt, s0_, s1x, s1y, sxx, sxy, syy = [g[..., i] for i in range(7)]
        acc = acc + jnp.stack(
            [cnt, s0_,
             s1x - dxl * s0_,
             s1y - dyl * s0_,
             sxx - 2.0 * dxl * s1x + dxl * dxl * s0_,
             sxy - dxl * s1y - dyl * s1x + dxl * dyl * s0_,
             syy - 2.0 * dyl * s1y + dyl * dyl * s0_], -1)
    acc = acc.reshape(b, ncells, 7)
    nsamp, s0 = acc[..., 0], acc[..., 1]

    safe_s0 = jnp.maximum(s0, 1e-12)
    mx, my = acc[..., 2] / safe_s0, acc[..., 3] / safe_s0
    cxx = acc[..., 4] / safe_s0 - mx * mx
    cxy = acc[..., 5] / safe_s0 - mx * my
    cyy = acc[..., 6] / safe_s0 - my * my

    # static voxel centers (constants folded by XLA)
    ii = jnp.arange(dim, dtype=jnp.float32) - dim // 2 + 0.5
    vc_x = jnp.repeat(ii, dim) * leaf           # (ncells,)
    vc_y = jnp.tile(ii, dim) * leaf

    # --- stage 3: normals + validity gates (`pointnormal.cpp:37-62`) ---
    lmin, lmax, nvec = _eig2x2_min(cxx, cxy, cyy)
    cond = jnp.abs(lmax / jnp.where(lmin == 0.0, 1e-30, lmin))
    det = lmax * lmin
    cell_ok = (
        occupied
        & (nsamp >= feat.min_samples)
        & (s0 > 0.0)
        & (cond <= feat.cond_max)
        & (det > feat.det_min)
        & (lmin > 0.0)
        & (lmax > 0.0)
    )
    mean = jnp.stack([mx + vc_x, my + vc_y], -1)
    # flip normal toward the sensor origin (`pointnormal.cpp:59-61`)
    flip = jnp.sum(nvec * (0.0 - mean), -1) < 0.0
    nvec = jnp.where(flip[..., None], -nvec, nvec)
    planarity = jnp.log1p(cond / 2.0)

    # --- compaction to the fixed cell budget ---
    ib = jnp.broadcast_to(jnp.arange(ncells, dtype=jnp.int32)[None],
                          (b, ncells))
    return _finalize_cells(mean, nvec, cxx, cxy, cyy, nsamp, planarity,
                           cell_ok, ib // dim, ib % dim, cfg)


def _finalize_cells(mean, nvec, cxx, cxy, cyy, nsamp, planarity, cell_ok,
                    ix, iy, cfg: CFEARConfig) -> CellMap:
    """Shared compaction tail: candidate cell rows -> fixed-budget CellMap.

    Valid cells first; on overflow keep the MOST-SUPPORTED cells (largest
    nsamples) rather than a spatial band of voxel ids. All per-cell
    outputs are packed into ONE (B, rows, 12) buffer first so the
    compaction pays a single (B*m)-row gather instead of many (gathers
    are row-rate-bound on this TPU: ~0.13 ms per 16k rows each). The
    voxel indices (ix, iy) ride two pack columns (< 2^15, exact in f32)
    for the optional Morton re-sort.
    """
    feat = cfg.feature
    m = feat.max_cells
    order = jnp.argsort(
        -jnp.where(cell_ok, nsamp + 1.0, 0.0), axis=-1)
    take = order[..., :m]                                 # (B, m)

    packed = jnp.stack(
        [mean[..., 0], mean[..., 1], nvec[..., 0], nvec[..., 1],
         cxx, cxy, cyy, nsamp, planarity,
         cell_ok.astype(mean.dtype),
         ix.astype(mean.dtype), iy.astype(mean.dtype)],
        axis=-1)                                          # (B, rows, 12)
    kept = jnp.take_along_axis(packed, take[..., None], axis=1)
    kept_valid = kept[..., 9] > 0.5

    if feat.spatial_sort:
        # re-order the KEPT cells by Morton code of their voxel index
        # (valid first) so contiguous cell tiles are compact spatial blobs
        # — the block-sparse association kernel skips (src-tile, tar-tile)
        # pairs by bounding box, which needs this coherence. Set-semantics
        # preserved: same cells, different order.
        code = _morton2(kept[..., 10].astype(jnp.int32),
                        kept[..., 11].astype(jnp.int32))
        skey = jnp.where(kept_valid, code, jnp.int32(2 ** 30))
        order2 = jnp.argsort(skey, axis=-1, stable=True)
        kept = jnp.take_along_axis(kept, order2[..., None], axis=1)
        kept_valid = kept[..., 9] > 0.5
    vmask = kept_valid[..., None]
    cov = jnp.stack(
        [jnp.stack([kept[..., 4], kept[..., 5]], -1),
         jnp.stack([kept[..., 5], kept[..., 6]], -1)], -2)
    return CellMap(
        mean=jnp.where(vmask, kept[..., 0:2], 0.0),
        normal=jnp.where(vmask, kept[..., 2:4], 0.0),
        cov=jnp.where(vmask[..., None], cov, 0.0),
        nsamples=jnp.where(kept_valid, kept[..., 7], 0.0),
        planarity=jnp.where(kept_valid, kept[..., 8], 0.0),
        valid=kept_valid,
    )


def _pre_cells(cfg: CFEARConfig) -> int:
    """Compact-cell budget of the pallas feature backend.

    Must cover the OCCUPIED-VOXEL count (not the post-gate valid-cell
    count, which is ~5x smaller): the Oxford-scale bench frame occupies
    ~4.5k voxels from its 8192 budgeted points. Kernel cost is linear in
    this budget."""
    if cfg.feature.pre_cells:
        return cfg.feature.pre_cells
    return max(4608, -(-2 * cfg.feature.max_cells // 128) * 128)


def _compute_cells_batched_pallas(points: PointCloud, cfg: CFEARConfig,
                                  interpret: bool = False) -> CellMap:
    """Pallas-backend oriented-surface-point extraction.

    Same stage-1 voxel pass as the XLA path; stage-2 becomes the fused
    one-hot MXU moment kernel (`ops/pallas_features.py`) over COMPACT
    cells (occupied voxels ranked by a plain cumsum in vid order — no
    sort, no scatter, no inverse map: the kernel's cnt*cx/cnt*cy columns
    recover each cell's voxel center). Replaces the (B*P, 63) segment_sum,
    the 9-offset roll/shift combine, and the dense-grid compaction argsort
    (the final top-max_cells argsort runs over c_pre rows instead of the
    full voxel grid). Results equal the XLA backend up to f32 summation
    order; integer gates (nsamples, occupancy) are bit-equal. Occupied
    voxels beyond `c_pre` (vid order) are dropped — the XLA path instead
    keeps the most-supported cells; bench/longrun occupancy leaves >2x
    headroom (see FeatureConfig.pre_cells).
    """
    from cfear_radarodometry_code_public_tpu.ops import pallas_features

    feat = cfg.feature
    leaf, dim, noff = _grid_geometry(cfg)
    ncells = dim * dim
    c_pre = _pre_cells(cfg)
    xy = points.xy                                            # (B, N, 2)
    b, n_pts = xy.shape[0], xy.shape[1]
    valid = points.valid
    lane = jnp.arange(b, dtype=jnp.int32)[:, None]

    # --- stage 1: voxel centroids (identical to the XLA path) -------------
    vidx = jnp.floor(xy / leaf).astype(jnp.int32) + dim // 2
    in_grid = valid & jnp.all((vidx >= 0) & (vidx < dim), axis=-1)
    vid = vidx[..., 0] * dim + vidx[..., 1]
    vid_flat = jnp.where(in_grid, lane * ncells + vid, b * ncells)
    ones = in_grid.astype(jnp.float32)
    s1 = jax.ops.segment_sum(
        jnp.concatenate([ones[..., None], xy * ones[..., None]],
                        -1).reshape(b * n_pts, 3),
        vid_flat.reshape(b * n_pts),
        num_segments=b * ncells + 1)[:b * ncells].reshape(b, ncells, 3)
    cnt_vox, sum_vox = s1[..., 0], s1[..., 1:3]
    centroid = sum_vox / jnp.maximum(cnt_vox, 1.0)[..., None]
    occupied = cnt_vox >= 1.0                                 # (B, ncells)

    # --- compact ranks: cumsum over the occupancy grid (vid order) --------
    ranks = jnp.cumsum(occupied.astype(jnp.int32), axis=-1) - 1
    rank_ok = occupied & (ranks < c_pre)
    rank_f = jnp.where(rank_ok, ranks, c_pre).astype(jnp.float32)

    # --- neighborhood pack: (cx, cy, occ, rank) per offset per point ------
    if feat.weight_intensity:
        w_pt = jnp.maximum(points.intensity - feat.intensity_floor, 0.0)
    else:
        w_pt = jnp.ones_like(points.intensity)
    offsets = [(dx, dy) for dx in range(-noff, noff + 1)
               for dy in range(-noff, noff + 1)]
    n_off = len(offsets)
    cgrid = jnp.concatenate(
        [centroid.reshape(b, dim, dim, 2),
         occupied.reshape(b, dim, dim, 1).astype(jnp.float32),
         rank_f.reshape(b, dim, dim, 1)], -1)
    nb = jnp.concatenate(
        [jnp.roll(cgrid, (-dx, -dy), (1, 2)) for dx, dy in offsets], -1)
    vid_c = jnp.clip(jnp.where(in_grid, vid, ncells), 0, ncells - 1)
    nb_pt = nb.reshape(b * ncells, 4 * n_off)[
        (lane * ncells + vid_c).reshape(b * n_pts)]
    nb_pt = nb_pt.reshape(b, n_pts, 4 * n_off)

    own_cx = (vidx[..., 0].astype(jnp.float32) - dim // 2 + 0.5) * leaf
    own_cy = (vidx[..., 1].astype(jnp.float32) - dim // 2 + 0.5) * leaf
    rx = xy[..., 0] - own_cx
    ry = xy[..., 1] - own_cy

    mem_rows, trank_rows = [], []
    for oi, (dx, dy) in enumerate(offsets):
        tx = vidx[..., 0] + dx
        ty = vidx[..., 1] + dy
        ok = in_grid & (tx >= 0) & (tx < dim) & (ty >= 0) & (ty < dim)
        c = nb_pt[..., 4 * oi:4 * oi + 2]
        occ = nb_pt[..., 4 * oi + 2] > 0.5
        trk = nb_pt[..., 4 * oi + 3]
        d2 = jnp.sum((xy - c) ** 2, axis=-1)
        mem = ok & occ & (d2 <= feat.res * feat.res) & (trk < c_pre)
        mem_rows.append(mem.astype(jnp.float32))
        trank_rows.append(jnp.where(mem, trk, float(c_pre)))

    n_rows = 5 + 2 * n_off
    n_rows_pad = -(-n_rows // 8) * 8
    pack = jnp.stack(
        [rx, ry, w_pt * in_grid, own_cx, own_cy]
        + mem_rows + trank_rows
        + [jnp.zeros_like(rx)] * (n_rows_pad - n_rows), axis=1)

    # --- tile bounds for the kernel's x-slab skip -------------------------
    # cell tiles are rank slabs in vid (x-major) order: tile t covers the
    # x-rows whose occupied-count interval overlaps [128 t, 128 (t+1))
    n_ct = c_pre // pallas_features.CT
    row_counts = jnp.sum(rank_ok.reshape(b, dim, dim).astype(jnp.int32), -1)
    cum_end = jnp.cumsum(row_counts, axis=-1)                 # (B, dim)
    cum_lo = cum_end - row_counts
    starts = (jnp.arange(n_ct, dtype=jnp.int32)
              * pallas_features.CT)[None, None, :]
    has = (cum_end[..., None] > starts) \
        & (cum_lo[..., None] < starts + pallas_features.CT)   # (B, dim, n_ct)
    rlo = (jnp.arange(dim, dtype=jnp.float32) - dim // 2) * leaf
    rhi = rlo + leaf
    dil = feat.res + 1e-3
    ct_lo = jnp.min(jnp.where(has, rlo[None, :, None], jnp.inf), 1) - dil
    ct_hi = jnp.max(jnp.where(has, rhi[None, :, None], -jnp.inf), 1) + dil

    pt = pallas_features.PT
    px = jnp.where(in_grid, xy[..., 0], jnp.inf).reshape(b, n_pts // pt, pt)
    pxn = jnp.where(in_grid, xy[..., 0], -jnp.inf).reshape(b, n_pts // pt, pt)
    pt_lo = jnp.min(px, -1)
    pt_hi = jnp.max(pxn, -1)

    offsets_m = tuple((dx * leaf, dy * leaf) for dx, dy in offsets)
    acc = pallas_features.moment_accumulate(
        pack, ct_lo, ct_hi, pt_lo, pt_hi, offsets_m=offsets_m,
        n_off=n_off, c_pre=c_pre, interpret=interpret)        # (B, 16, C)

    # --- moments about each compact cell's voxel center -------------------
    nsamp = acc[:, 0]
    s0 = acc[:, 1]
    safe_cnt = jnp.maximum(nsamp, 1.0)
    vc_x = acc[:, 7] / safe_cnt
    vc_y = acc[:, 8] / safe_cnt
    safe_s0 = jnp.maximum(s0, 1e-12)
    mx, my = acc[:, 2] / safe_s0, acc[:, 3] / safe_s0
    cxx = acc[:, 4] / safe_s0 - mx * mx
    cxy = acc[:, 5] / safe_s0 - mx * my
    cyy = acc[:, 6] / safe_s0 - my * my

    lmin, lmax, nvec = _eig2x2_min(cxx, cxy, cyy)
    cond = jnp.abs(lmax / jnp.where(lmin == 0.0, 1e-30, lmin))
    det = lmax * lmin
    cell_ok = (
        (nsamp >= feat.min_samples)      # implies the voxel is occupied
        & (s0 > 0.0)
        & (cond <= feat.cond_max)
        & (det > feat.det_min)
        & (lmin > 0.0)
        & (lmax > 0.0)
    )
    mean = jnp.stack([mx + vc_x, my + vc_y], -1)
    flip = jnp.sum(nvec * (0.0 - mean), -1) < 0.0
    nvec = jnp.where(flip[..., None], -nvec, nvec)
    planarity = jnp.log1p(cond / 2.0)

    # recover integer voxel indices from the exact-multiple voxel centers
    ix = jnp.round(vc_x / leaf + dim // 2 - 0.5).astype(jnp.int32)
    iy = jnp.round(vc_y / leaf + dim // 2 - 0.5).astype(jnp.int32)
    ix = jnp.clip(ix, 0, dim - 1)
    iy = jnp.clip(iy, 0, dim - 1)
    return _finalize_cells(mean, nvec, cxx, cxy, cyy, nsamp, planarity,
                           cell_ok, ix, iy, cfg)


def compute_raw_cells(points: PointCloud, cfg: CFEARConfig) -> CellMap:
    """"use_raw_pointcloud" ablation: one identity cell per filtered point.

    Mirrors `cell::GetIdentityCell` (`pointnormal.h:62,79-81`): mean = point,
    cov = 0.1*I, normal = (1, 0), planarity scale = 1, Nsamples = 1. The
    fixed cell budget keeps the first `max_cells_raw` valid points.
    """
    m = cfg.feature.max_cells_raw
    order = jnp.argsort(~points.valid, stable=True)[:m]
    valid = points.valid[order]
    xy = jnp.where(valid[:, None], points.xy[order], 0.0)
    eye = jnp.broadcast_to(0.1 * jnp.eye(2, dtype=xy.dtype), (m, 2, 2))
    normal = jnp.broadcast_to(jnp.asarray([1.0, 0.0], xy.dtype), (m, 2))
    ones = jnp.ones((m,), xy.dtype)
    return CellMap(mean=xy, normal=jnp.where(valid[:, None], normal, 0.0),
                   cov=jnp.where(valid[:, None, None], eye, 0.0),
                   nsamples=jnp.where(valid, ones, 0.0),
                   planarity=jnp.where(valid, ones, 0.0),
                   valid=valid)


def transform_cells(cells: CellMap, pose) -> CellMap:
    """Rigid-transform a cell map by an SE(2) pose.

    Equivalent of `cell::TransformCopy` (`pointnormal.cpp:515-529`) with the
    mathematically correct covariance rotation R Sigma R^T (the reference's
    line 517 contains a typo'd `R*T*cov_*R.transpose()`; see SURVEY.md §2.1).
    """
    R = se2.rotmat(pose[..., 2])
    mean = se2.transform(pose, cells.mean)
    normal = se2.rotate(pose, cells.normal)
    cov = jnp.einsum("...ij,...njk,...lk->...nil", R, cells.cov, R)
    return cells._replace(mean=mean, normal=normal, cov=cov)


def compensate_cells(cells: CellMap, tmot, ccw: bool) -> CellMap:
    """Motion-compensate cell means/normals by per-cell relative scan time.

    Equivalent of `MapPointNormal::Compensate` (`pointnormal.cpp:113-133`).
    """
    d = se2.rel_timestamp(cells.mean, ccw)
    ang = d * tmot[..., None, 2]
    c, s = jnp.cos(ang), jnp.sin(ang)
    R = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    mean = jnp.einsum("...nij,...nj->...ni", R, cells.mean) \
        + d[..., None] * tmot[..., None, :2]
    normal = jnp.einsum("...nij,...nj->...ni", R, cells.normal)
    cov = jnp.einsum("...nij,...njk,...nlk->...nil", R, cells.cov, R)
    return cells._replace(mean=mean, normal=normal, cov=cov)
