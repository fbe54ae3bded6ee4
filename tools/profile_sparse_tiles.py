"""Tile-geometry probe for the block-sparse association kernel.

Times `nn_min_sparse` at (ts, tt) in {256,512} x {256,512} on a REAL
s50 window (bench occupancy), plus the skip rate each geometry achieves:
fatter source tiles halve grid steps but coarsen the source bounding
boxes; finer target granules raise the skip rate but add bbox tests.

Usage: python tools/profile_sparse_tiles.py [--batch 8] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.models import odometry
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc, registration

    interp = jax.default_backend() == "cpu"
    cfg = preset("CFEAR-3-s50", dataset="oxford")
    cfg = cfg.replace(feature=dataclasses.replace(
        cfg.feature, max_cells=2048, point_budget=8192, spatial_sort=True))
    images, _ = synthetic.make_sequence(seed=5, n_frames=64, cfg=cfg,
                                        speed=12.0)
    runner = odometry.OdometryRunner(cfg, chunk=16, ingest="host")
    runner.process(images)
    st = runner.state
    kf_cells = jax.tree.map(np.asarray, st.kf_cells)
    kf_poses = np.asarray(st.kf_poses)
    kf_valid = np.asarray(st.kf_valid)
    s, m = kf_valid.shape[0], kf_cells.valid.shape[1]
    src = jax.tree.map(lambda a: jnp.asarray(a[-1]), kf_cells)
    attrs_np = np.asarray(registration._world_attrs(
        jax.tree.map(jnp.asarray, kf_cells), jnp.asarray(kf_poses), cfg))
    radius = cfg.registration.assoc_radius
    src_w = np.asarray(jax.jit(
        lambda: registration.se2.transform(jnp.asarray(kf_poses[-1]),
                                           src.mean))())
    tvalid_np = (attrs_np[..., 6] > 0.5) & kf_valid[:, None]
    b = args.batch
    tar_xy = jnp.asarray(np.broadcast_to(attrs_np[None, ..., 0:2],
                                         (b, s, m, 2)).copy())
    tvalid = jnp.asarray(np.broadcast_to(tvalid_np[None], (b, s, m)).copy())
    src_b = jnp.asarray(np.broadcast_to(src_w[None], (b, m, 2)).copy())
    print(f"backend={jax.default_backend()} B={b} S={s} M={m} "
          f"occ={tvalid_np.sum(1).mean():.0f}")

    def timeit(fn, fargs):
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return (time.time() - t0) / args.iters * 1e3

    for ts in (256, 512):
        for tt in (256, 512):
            old_tt = pallas_assoc._TT_SPARSE
            pallas_assoc._TT_SPARSE = tt
            try:
                sb_np = np.asarray(pallas_assoc.tile_bounds(
                    jnp.asarray(src_w), src.valid, ts))
                tb_np = np.asarray(pallas_assoc.tile_bounds(
                    jnp.asarray(attrs_np[..., 0:2]), jnp.asarray(tvalid_np),
                    tt))
                total = pairs = 0
                for i in range(s):
                    for jj in range(sb_np.shape[0]):
                        for k in range(tb_np.shape[1]):
                            gx = max(tb_np[i, k, 0] - sb_np[jj, 1],
                                     sb_np[jj, 0] - tb_np[i, k, 1], 0)
                            gy = max(tb_np[i, k, 2] - sb_np[jj, 3],
                                     sb_np[jj, 2] - tb_np[i, k, 3], 0)
                            total += 1
                            pairs += (gx * gx + gy * gy) <= radius * radius
                sb_b = jnp.asarray(np.broadcast_to(
                    sb_np[None], (b,) + sb_np.shape).copy())
                tb_b = jnp.asarray(np.broadcast_to(
                    tb_np[None], (b,) + tb_np.shape).copy())

                fn = jax.jit(lambda sx, sbb, tx, tbb, tv, ts=ts:
                             jax.vmap(lambda a1, a2, a3, a4, a5:
                                      pallas_assoc.nn_min_sparse(
                                          a1, a2, a3, a4, a5, radius,
                                          interpret=interp, ts=ts))(
                                 sx, sbb, tx, tbb, tv))
                t = timeit(fn, (src_b, sb_b, tar_xy, tb_b, tvalid))
                print(f"ts={ts} tt={tt}: {t:7.3f} ms  "
                      f"(executed {pairs}/{total} = "
                      f"{100.0 * pairs / total:.1f}%)")
            finally:
                pallas_assoc._TT_SPARSE = old_tt


if __name__ == "__main__":
    main()
