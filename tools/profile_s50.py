"""CFEAR-3-s50 association/register breakdown on REAL cell maps.

VERDICT r3 weak #2: the s50 batch-8 regression (325 vs 349 fps/chip at
K=16) and the exact-mode gap (129.5 fps) were unexplained. This probe
builds a genuine 50-keyframe window by running the s50 pipeline on the
simulator, then times each association ingredient at batch 1/4/8:

  sparse    : pallas_assoc.nn_min_sparse (block-sparse, Morton-ordered)
  dense_pl  : pallas_assoc.nn_min (fused dense kernel)
  skip rate : host-side count of (kf, src-tile, tar-tile) bbox pairs
              within the association radius (the work the sparse kernel
              cannot skip)
  onehot/flat: the two attribute-lookup formulations at S=50
  register  : the full jitted register() call (exact and K-gated)

Timing via host transfer (np.asarray) — block_until_ready under-waits on
the axon backend.

Usage: python tools/profile_s50.py [--batch-list 1,4,8] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    ap.add_argument("--batch-list", default="1,4,8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n-frames", type=int, default=64)
    ap.add_argument("--max-cells", type=int, default=2048,
                    help="cell budget (2048 = the BENCH_s50 config)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    global jax
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
        cfg.feature, max_cells=args.max_cells, point_budget=8192,
        spatial_sort=True))
    print(f"backend={jax.default_backend()} cfg={cfg.name} "
          f"S={cfg.odometry.submap_scan_size} M={cfg.feature.max_cells}")

    # --- build a real 50-keyframe window --------------------------------
    images, gt = synthetic.make_sequence(seed=5, n_frames=args.n_frames,
                                         cfg=cfg, speed=12.0)
    runner = odometry.OdometryRunner(cfg, chunk=16, ingest="host")
    runner.process(images)
    st = runner.state
    kf_cells = jax.tree.map(np.asarray, st.kf_cells)
    kf_poses = np.asarray(st.kf_poses)
    kf_valid = np.asarray(st.kf_valid)
    s, m = kf_valid.shape[0], kf_cells.valid.shape[1]
    print(f"window: S={s} valid_kf={kf_valid.sum()} "
          f"mean_cells={kf_cells.valid.sum(1).mean():.0f} M={m}")

    # source scan = newest keyframe's cells, world frame at its pose
    src = jax.tree.map(lambda a: jnp.asarray(a[-1]), kf_cells)
    attrs_np = np.asarray(registration._world_attrs(
        jax.tree.map(jnp.asarray, kf_cells), jnp.asarray(kf_poses), cfg))
    d = attrs_np.shape[-1]
    radius = cfg.registration.assoc_radius

    # --- host-side skip-rate ------------------------------------------------
    ts, tt = 256, pallas_assoc._TT_SPARSE
    import jax.numpy as _j
    src_w = np.asarray(jax.jit(
        lambda: registration.se2.transform(jnp.asarray(kf_poses[-1]),
                                           src.mean))())
    sb = np.asarray(pallas_assoc.tile_bounds(
        jnp.asarray(src_w), src.valid, ts))          # (m/ts, 4)
    tb = np.asarray(pallas_assoc.tile_bounds(
        jnp.asarray(attrs_np[..., 0:2]),
        jnp.asarray((attrs_np[..., 6] > 0.5) & kf_valid[:, None]), tt))
    total = pairs = 0
    for i in range(s):
        for j in range(sb.shape[0]):
            for k in range(tb.shape[1]):
                gx = max(tb[i, k, 0] - sb[j, 1], sb[j, 0] - tb[i, k, 1], 0)
                gy = max(tb[i, k, 2] - sb[j, 3], sb[j, 2] - tb[i, k, 3], 0)
                total += 1
                pairs += (gx * gx + gy * gy) <= radius * radius
    print(f"sparse skip: {pairs}/{total} tile pairs executed "
          f"({100.0 * pairs / total:.1f}% of dense work)")

    tar_xy = jnp.asarray(np.broadcast_to(attrs_np[None, ..., 0:2],
                                         (8, s, m, 2)).copy())
    tvalid = jnp.asarray(np.broadcast_to(
        ((attrs_np[..., 6] > 0.5) & kf_valid[:, None])[None], (8, s, m)).copy())
    src_b = jnp.asarray(np.broadcast_to(src_w[None], (8, m, 2)).copy())
    attrs_b = jnp.asarray(np.broadcast_to(attrs_np[None], (8, s, m, d)).copy())
    sb_b = jnp.asarray(np.broadcast_to(sb[None], (8,) + sb.shape).copy())
    tb_b = jnp.asarray(np.broadcast_to(tb[None], (8,) + tb.shape).copy())

    for b in [int(x) for x in args.batch_list.split(",")]:
        sl = lambda a: jax.tree.map(lambda x: x[:b], a)

        @jax.jit
        def f_sparse(sx, sbb, tx, tbb, tv):
            return jax.vmap(lambda a1, a2, a3, a4, a5: pallas_assoc.nn_min_sparse(
                a1, a2, a3, a4, a5, radius, interpret=interp, ts=ts))(
                sx, sbb, tx, tbb, tv)

        t = timeit(f_sparse, (sl(src_b), sl(sb_b), sl(tar_xy), sl(tb_b),
                              sl(tvalid)), args.iters)
        print(f"B={b} nn_min_sparse          {t:8.3f} ms")

        d_pad = 8 if d <= 8 else 16
        at_b = jnp.swapaxes(attrs_b, -1, -2)
        at_b = jnp.pad(at_b, ((0, 0), (0, 0), (0, d_pad - d), (0, 0)))

        @jax.jit
        def f_sparse_attrs(sx, sbb, tx, tbb, tv, at):
            return jax.vmap(
                lambda a1, a2, a3, a4, a5, a6: pallas_assoc.nn_min_sparse_attrs(
                    a1, a2, a3, a4, a5, a6, radius, interpret=interp,
                    ts=256))(sx, sbb, tx, tbb, tv, at)

        t = timeit(f_sparse_attrs, (sl(src_b), sl(sb_b), sl(tar_xy),
                                    sl(tb_b), sl(tvalid), sl(at_b)),
                   args.iters)
        print(f"B={b} nn_min_sparse_attrs    {t:8.3f} ms (fused lookup)")

        @jax.jit
        def f_sparse_multi(sx, sbb, tx, tbb, tv):
            return jax.vmap(
                lambda a1, a2, a3, a4, a5: pallas_assoc.nn_min_sparse_multi(
                    a1, a2, a3, a4, a5, radius, interpret=interp,
                    ts=256))(sx, sbb, tx, tbb, tv)

        t = timeit(f_sparse_multi, (sl(src_b), sl(sb_b), sl(tar_xy),
                                    sl(tb_b), sl(tvalid)), args.iters)
        print(f"B={b} nn_min_sparse_multi    {t:8.3f} ms (in-kernel S loop)")

        @jax.jit
        def f_sparse_unr(sx, sbb, tx, tbb, tv):
            return jax.vmap(
                lambda a1, a2, a3, a4, a5:
                pallas_assoc.nn_min_sparse_unrolled(
                    a1, a2, a3, a4, a5, radius, interpret=interp,
                    ts=256))(sx, sbb, tx, tbb, tv)

        t = timeit(f_sparse_unr, (sl(src_b), sl(sb_b), sl(tar_xy),
                                  sl(tb_b), sl(tvalid)), args.iters)
        print(f"B={b} nn_min_sparse_unrolled {t:8.3f} ms (static S loop)")

        @jax.jit
        def f_dense(sx, tx, tv):
            return jax.vmap(lambda a1, a2, a3: pallas_assoc.nn_min(
                a1, a2, a3, interpret=interp))(sx, tx, tv)

        t = timeit(f_dense, (sl(src_b), sl(tar_xy), sl(tvalid)), args.iters)
        print(f"B={b} nn_min (dense kernel)  {t:8.3f} ms")

        nn = jnp.asarray(
            np.random.default_rng(0).integers(0, m, size=(b, s, m))
            .astype(np.int32))

        @jax.jit
        def g_onehot(at, nn_):
            oh = (nn_[..., None] == jnp.arange(m, dtype=jnp.int32)).astype(
                jnp.float32)
            return jnp.einsum("bsnm,bsmd->bsnd", oh, at,
                              preferred_element_type=jnp.float32)

        t = timeit(g_onehot, (sl(attrs_b), nn), args.iters)
        print(f"B={b} gather_onehot (MXU)    {t:8.3f} ms")

        @jax.jit
        def g_flat(at, nn_):
            flat = at.reshape(b * s * m, d)
            base = (jnp.arange(b * s, dtype=jnp.int32) * m).reshape(b, s, 1)
            idx = (nn_ + base).reshape(b * s * m)
            return flat[idx].reshape(b, s, m, d)

        t = timeit(g_flat, (sl(attrs_b), nn), args.iters)
        print(f"B={b} gather_flat            {t:8.3f} ms")

        # full register() call, exact and gated
        for k_act, tag in ((0, "exact"), (16, "K=16")):
            import dataclasses
            c2 = cfg.replace(registration=dataclasses.replace(
                cfg.registration, max_active_keyframes=k_act))

            kf_j = jax.tree.map(jnp.asarray, kf_cells)
            po_j = jnp.asarray(kf_poses)
            va_j = jnp.asarray(kf_valid)
            guess = jnp.asarray(kf_poses[-1] + np.array([0.5, 0.1, 0.01],
                                                        np.float32))

            @jax.jit
            def f_reg(g_):
                return jax.vmap(lambda gg: registration.register(
                    kf_j, po_j, va_j, src, gg, cfg=c2).pose)(g_)

            gb = jnp.broadcast_to(guess[None], (b, 3))
            t = timeit(f_reg, (gb,), max(args.iters // 3, 5))
            print(f"B={b} register ({tag:5s})      {t:8.3f} ms "
                  f"({1000.0 * b / t:.0f} reg/s)")


if __name__ == "__main__":
    main()
