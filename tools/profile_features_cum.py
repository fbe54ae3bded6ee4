"""Cumulative profile of the batched feature stage on the BENCH path.

profile_features.py times each phase standalone, which buries ~0.8 ms of
dispatch overhead in every row. Here each jitted probe runs the pipeline
FROM the compact-ingest input UP TO stage k, so consecutive deltas are the
net on-device cost of each stage — the dispatch overhead appears once per
row and cancels in the deltas.

Stages (matching ops/features.py compute_cells_batched):
  points   : points_from_compact (+ nothing else)
  scatter1 : + stage-1 voxel segment_sum -> centroids
  nbpack   : + neighborhood roll-concat + per-point gather
  data     : + membership masks + 63-wide data build
  scatter2 : + stage-2 63-wide moment segment_sum
  combine  : + 9-offset rolls + moment shift to target centers
  eig      : + normals/gates/planarity
  full     : + compaction argsort + packed take + Morton resort
"""

import argparse
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--max-cells", type=int, default=1024)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.ops import filtering
    from cfear_radarodometry_code_public_tpu.ops.features import (
        _eig2x2_min, _grid_geometry, _morton2, compute_cells_batched)
    from cfear_radarodometry_code_public_tpu.utils import native_io

    cfg = preset("CFEAR-3", dataset="oxford")
    cfg = cfg.replace(feature=dataclasses.replace(
        cfg.feature, point_budget=8192, max_cells=args.max_cells,
        spatial_sort=True))
    feat = cfg.feature
    b = args.batch

    images, _ = synthetic.make_sequence(seed=1, n_frames=1, cfg=cfg,
                                        speed=6.0)
    f = cfg.filter
    min_bin = int(math.ceil(cfg.radar.min_distance / cfg.radar.range_res))
    cb, ca, ci, cp = native_io.filter_frames_host_compact(
        images, f.k_strongest, f.z_min, f.nms_window,
        feat.point_budget, min_bin, z_quantile=f.z_min_quantile)
    comp = filtering.CompactCandidates(
        bins=jnp.asarray(np.repeat(cb, b, 0)),
        azimuth=jnp.asarray(np.repeat(ca, b, 0)),
        intensity=jnp.asarray(np.repeat(ci, b, 0)),
        peak=jnp.asarray(np.repeat(cp, b, 0)))

    leaf, dim, noff = _grid_geometry(cfg)
    ncells = dim * dim
    offsets = [(dx, dy) for dx in range(-noff, noff + 1)
               for dy in range(-noff, noff + 1)]
    n_pts = feat.point_budget
    lane = jnp.arange(b, dtype=jnp.int32)[:, None]
    print(f"backend={jax.default_backend()} B={b} N={n_pts} dim={dim} "
          f"ncells={ncells} max_cells={feat.max_cells}")

    def pts_stage(c):
        return jax.vmap(lambda cc: filtering.points_from_compact(cc, cfg))(c)

    def common(points):
        xy = points.xy
        valid = points.valid
        vidx = jnp.floor(xy / leaf).astype(jnp.int32) + dim // 2
        in_grid = valid & jnp.all((vidx >= 0) & (vidx < dim), axis=-1)
        vid = vidx[..., 0] * dim + vidx[..., 1]
        vid_flat = jnp.where(in_grid, lane * ncells + vid, b * ncells)
        return xy, valid, vidx, in_grid, vid, vid_flat

    def s1_stage(points):
        xy, valid, vidx, in_grid, vid, vid_flat = common(points)
        ones = in_grid.astype(jnp.float32)
        s1 = jax.ops.segment_sum(
            jnp.concatenate([ones[..., None], xy * ones[..., None]],
                            -1).reshape(b * n_pts, 3),
            vid_flat.reshape(b * n_pts),
            num_segments=b * ncells + 1)[:b * ncells].reshape(b, ncells, 3)
        return s1

    def nb_stage(points):
        xy, valid, vidx, in_grid, vid, vid_flat = common(points)
        s1 = s1_stage(points)
        cnt_vox, sum_vox = s1[..., 0], s1[..., 1:3]
        centroid = sum_vox / jnp.maximum(cnt_vox, 1.0)[..., None]
        occupied = cnt_vox >= 1.0
        cgrid = jnp.concatenate(
            [centroid.reshape(b, dim, dim, 2),
             occupied.reshape(b, dim, dim, 1).astype(jnp.float32)], -1)
        nb = jnp.concatenate(
            [jnp.roll(cgrid, (-dx, -dy), (1, 2)) for dx, dy in offsets], -1)
        vid_c = jnp.clip(jnp.where(in_grid, vid, ncells), 0, ncells - 1)
        nb_pt = nb.reshape(b * ncells, 3 * len(offsets))[
            (lane * ncells + vid_c).reshape(b * n_pts)]
        return nb_pt.reshape(b, n_pts, 3 * len(offsets))

    def data_stage(points):
        xy, valid, vidx, in_grid, vid, vid_flat = common(points)
        nb_pt = nb_stage(points)
        if feat.weight_intensity:
            w_pt = jnp.maximum(points.intensity - feat.intensity_floor, 0.0)
        else:
            w_pt = jnp.ones_like(points.intensity)
        own_cx = (vidx[..., 0].astype(jnp.float32) - dim // 2 + 0.5) * leaf
        own_cy = (vidx[..., 1].astype(jnp.float32) - dim // 2 + 0.5) * leaf
        rx = xy[..., 0] - own_cx
        ry = xy[..., 1] - own_cy
        base = jnp.stack(
            [jnp.ones_like(w_pt), w_pt, w_pt * rx, w_pt * ry,
             w_pt * rx * rx, w_pt * rx * ry, w_pt * ry * ry], axis=-1)
        mem_cols = []
        for oi, (dx, dy) in enumerate(offsets):
            tx = vidx[..., 0] + dx
            ty = vidx[..., 1] + dy
            ok = in_grid & (tx >= 0) & (tx < dim) & (ty >= 0) & (ty < dim)
            c = nb_pt[..., 3 * oi:3 * oi + 2]
            occ = nb_pt[..., 3 * oi + 2] > 0.5
            d2 = jnp.sum((xy - c) ** 2, axis=-1)
            mem_cols.append(ok & occ & (d2 <= feat.res * feat.res))
        mem = jnp.stack(mem_cols, -1).astype(jnp.float32)
        return (mem[..., :, None] * base[..., None, :]).reshape(
            b, n_pts, len(offsets) * 7)

    def s2_stage(points):
        xy, valid, vidx, in_grid, vid, vid_flat = common(points)
        data = data_stage(points)
        return jax.ops.segment_sum(
            data.reshape(b * n_pts, -1), vid_flat.reshape(b * n_pts),
            num_segments=b * ncells + 1)[:b * ncells].reshape(
                b, dim, dim, len(offsets), 7)

    def combine_stage(points):
        acc_own = s2_stage(points)
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
        return acc.reshape(b, ncells, 7)

    def eig_stage(points):
        s1 = s1_stage(points)
        occupied = s1[..., 0].reshape(b, ncells) >= 1.0
        acc = combine_stage(points)
        nsamp, s0 = acc[..., 0], acc[..., 1]
        safe_s0 = jnp.maximum(s0, 1e-12)
        mx, my = acc[..., 2] / safe_s0, acc[..., 3] / safe_s0
        cxx = acc[..., 4] / safe_s0 - mx * mx
        cxy = acc[..., 5] / safe_s0 - mx * my
        cyy = acc[..., 6] / safe_s0 - my * my
        lmin, lmax, nvec = _eig2x2_min(cxx, cxy, cyy)
        cond = jnp.abs(lmax / jnp.where(lmin == 0.0, 1e-30, lmin))
        det = lmax * lmin
        cell_ok = (occupied & (nsamp >= feat.min_samples) & (s0 > 0.0)
                   & (cond <= feat.cond_max) & (det > feat.det_min)
                   & (lmin > 0.0) & (lmax > 0.0))
        return cell_ok, nsamp, cxx

    def full_stage(points):
        return compute_cells_batched(points, cfg)

    def timeit(fn, arg):
        jfn = jax.jit(fn)
        out = jfn(arg)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.time()
        for _ in range(args.iters):
            out = jfn(arg)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return (time.time() - t0) / args.iters * 1e3

    pts = jax.jit(pts_stage)(comp)
    pts = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), pts)

    rows = [("points", pts_stage, comp), ("scatter1", s1_stage, pts),
            ("nbpack", nb_stage, pts), ("data", data_stage, pts),
            ("scatter2", s2_stage, pts), ("combine", combine_stage, pts),
            ("eig", eig_stage, pts), ("full", full_stage, pts)]
    prev = 0.0
    base = None
    for name, fn, arg in rows:
        t = timeit(fn, arg)
        if name == "points":
            base = t
            print(f"{name:10s} cum {t:7.3f} ms")
            prev = 0.0
            continue
        print(f"{name:10s} cum {t:7.3f} ms   delta {t - prev if prev else t:7.3f}")
        prev = t


if __name__ == "__main__":
    main()
