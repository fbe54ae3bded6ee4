"""Micro-profile of the batched feature stage (compute_cells_batched).

Times each internal phase of the batched oriented-surface-point extraction
in isolation on the current backend. CAVEAT (r5): these standalone numbers
include 1-3 ms of remote-tunnel dispatch cost per probe — for true device
time use tools/profile_scan_stages.py (in-scan, one dispatch), which
supersedes this tool's absolute numbers (kept for phase RATIOS and CPU
runs).

Phases:
  budget   : point_budget argsort + take (row compaction)
  scatter1 : stage-1 voxel segment_sum (count, sum_x, sum_y)
  nbpack   : neighborhood roll-concat + per-point gather
  members  : per-offset membership masks + data outer product
  scatter2 : stage-2 63-wide moment segment_sum
  finish   : offset rolls + moment shift + eig + compaction argsort

Timing is synced via host transfer (np.asarray) because block_until_ready
under-waits on the axon backend; values include ~0.8 ms dispatch overhead,
so compare deltas/ratios.
"""

import argparse
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def timeit(fn, args, iters):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp

    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.ops import filtering
    from cfear_radarodometry_code_public_tpu.ops.features import (
        _grid_geometry, compute_cells_batched)
    from cfear_radarodometry_code_public_tpu.utils import native_io
    import dataclasses

    cfg = preset("CFEAR-3", dataset="oxford")
    cfg = cfg.replace(feature=dataclasses.replace(
        cfg.feature, point_budget=8192, max_cells=2048))
    feat = cfg.feature
    b = args.batch

    images, _ = synthetic.make_sequence(
        seed=1, n_frames=1,
        cfg=cfg.replace(radar=dataclasses.replace(cfg.radar,
                                                  dataset="oxford")),
        speed=6.0)
    f = cfg.filter
    cb, ci, cp = native_io.filter_frames_host(images, f.k_strongest, f.z_min,
                                              f.nms_window)
    cand = filtering.Candidates(bins=jnp.asarray(np.repeat(cb, b, 0)),
                                intensity=jnp.asarray(np.repeat(ci, b, 0)),
                                peak=jnp.asarray(np.repeat(cp, b, 0)))
    pts = jax.jit(jax.vmap(lambda c: filtering.points_from_candidates(c, cfg))
                  )(cand)
    pts = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), pts)

    leaf, dim, noff = _grid_geometry(cfg)
    ncells = dim * dim
    p = feat.point_budget
    print(f"backend={jax.default_backend()} B={b} N={pts.xy.shape[1]} "
          f"budget={p} dim={dim} ncells={ncells}")

    # ---- budget: argsort top-p compaction --------------------------------
    @jax.jit
    def budget(points):
        key = jnp.where(points.valid, points.intensity, -1.0)
        order = jnp.argsort(-key, axis=-1)[:, :p]
        return jax.tree.map(
            lambda a: jnp.take_along_axis(
                a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1),
            points)

    t = timeit(budget, (pts,), args.iters)
    print(f"budget(argsort+take)    {t:8.3f} ms")

    @jax.jit
    def budget_topk(points):
        key = jnp.where(points.valid, points.intensity, -1.0)
        _, order = jax.lax.top_k(key, p)
        return jax.tree.map(
            lambda a: jnp.take_along_axis(
                a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1),
            points)

    t = timeit(budget_topk, (pts,), args.iters)
    print(f"budget(top_k+take)      {t:8.3f} ms")

    ptsb = budget(pts)
    ptsb = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), ptsb)
    xy = ptsb.xy
    n_pts = xy.shape[1]

    # ---- stage-1 scatter --------------------------------------------------
    lane = jnp.arange(b, dtype=jnp.int32)[:, None]

    @jax.jit
    def stage1(xy, valid):
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
        return s1

    t = timeit(stage1, (xy, ptsb.valid), args.iters)
    print(f"scatter1(3-wide)        {t:8.3f} ms")

    s1 = stage1(xy, ptsb.valid)
    s1 = jnp.asarray(np.asarray(s1))
    centroid = s1[..., 1:3] / jnp.maximum(s1[..., 0], 1.0)[..., None]
    occupied = s1[..., 0] >= 1.0
    centroid = jnp.asarray(np.asarray(centroid))
    occupied = jnp.asarray(np.asarray(occupied))

    offsets = [(dx, dy) for dx in range(-noff, noff + 1)
               for dy in range(-noff, noff + 1)]

    @jax.jit
    def nbpack(centroid, occupied, xy, valid):
        vidx = jnp.floor(xy / leaf).astype(jnp.int32) + dim // 2
        in_grid = valid & jnp.all((vidx >= 0) & (vidx < dim), axis=-1)
        vid = vidx[..., 0] * dim + vidx[..., 1]
        cgrid = jnp.concatenate(
            [centroid.reshape(b, dim, dim, 2),
             occupied.reshape(b, dim, dim, 1).astype(jnp.float32)], -1)
        nb = jnp.concatenate(
            [jnp.roll(cgrid, (-dx, -dy), (1, 2)) for dx, dy in offsets], -1)
        vid_c = jnp.clip(jnp.where(in_grid, vid, ncells), 0, ncells - 1)
        nb_pt = nb.reshape(b * ncells, 3 * len(offsets))[
            (lane * ncells + vid_c).reshape(b * n_pts)]
        return nb_pt.reshape(b, n_pts, 3 * len(offsets))

    t = timeit(nbpack, (centroid, occupied, xy, ptsb.valid), args.iters)
    print(f"nbpack(rolls+gather)    {t:8.3f} ms")

    nb_pt = jnp.asarray(np.asarray(nbpack(centroid, occupied, xy,
                                          ptsb.valid)))

    @jax.jit
    def members(nb_pt, xy, valid, intensity):
        vidx = jnp.floor(xy / leaf).astype(jnp.int32) + dim // 2
        in_grid = valid & jnp.all((vidx >= 0) & (vidx < dim), axis=-1)
        w_pt = jnp.maximum(intensity - feat.intensity_floor, 0.0)
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

    t = timeit(members, (nb_pt, xy, ptsb.valid, ptsb.intensity), args.iters)
    print(f"members(data build)     {t:8.3f} ms")

    data = jnp.asarray(np.asarray(members(nb_pt, xy, ptsb.valid,
                                          ptsb.intensity)))

    @jax.jit
    def scatter2(data, xy, valid):
        vidx = jnp.floor(xy / leaf).astype(jnp.int32) + dim // 2
        in_grid = valid & jnp.all((vidx >= 0) & (vidx < dim), axis=-1)
        vid = vidx[..., 0] * dim + vidx[..., 1]
        vid_flat = jnp.where(in_grid, lane * ncells + vid, b * ncells)
        return jax.ops.segment_sum(
            data.reshape(b * n_pts, -1), vid_flat.reshape(b * n_pts),
            num_segments=b * ncells + 1)[:b * ncells]

    t = timeit(scatter2, (data, xy, ptsb.valid), args.iters)
    print(f"scatter2(63-wide)       {t:8.3f} ms")

    # ---- full stage for reference ----------------------------------------
    @jax.jit
    def full(points):
        return compute_cells_batched(points, cfg)

    t = timeit(full, (pts,), args.iters)
    print(f"FULL compute_cells_b    {t:8.3f} ms")


if __name__ == "__main__":
    main()
