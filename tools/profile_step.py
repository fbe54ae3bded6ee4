"""Step-level batched-scaling profile: extract vs fuse halves.

The bench's batched x8 aggregate speedup plateaued at 1.50x and batch 16
regressed (r2). The feature-stage phase profile (`profile_features.py`)
shows the feature phases scale FINE (2.3x cost for 8x lanes) — so this tool
splits the whole production step at the extract/fuse boundary to find where
the non-scaling actually lives:

  extract : points_from_compact + compensate + compute_cells_batched
  fuse    : vmap(_fuse_frame) = registration (association + LM while-loops
            under vmap) + keyframe gates
  step    : the fused production step (make_batched_step)

Hypothesis to test: vmapping the outer-association / LM `lax.while_loop`s
makes every lane pay max-iterations-over-lanes AND `lax.cond` under vmap
executes both branches — so the fuse half scales super-linearly with batch
width while extract does not.

Timing via host transfer (np.asarray); ~0.8 ms dispatch overhead included.
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
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--preset", default="CFEAR-3")
    ap.add_argument("--max-cells", type=int, default=2048)
    ap.add_argument("--point-budget", type=int, default=8192)
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    import dataclasses

    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.models import odometry
    from cfear_radarodometry_code_public_tpu.ops import features, filtering
    from cfear_radarodometry_code_public_tpu.utils import native_io, se2

    cfg = preset(args.preset, dataset="oxford")
    cfg = cfg.replace(feature=dataclasses.replace(
        cfg.feature, point_budget=args.point_budget,
        max_cells=args.max_cells))
    print(f"backend={jax.default_backend()} preset={cfg.name} "
          f"cells={cfg.feature.max_cells} budget={cfg.feature.point_budget}")

    images, _ = synthetic.make_sequence(seed=1, n_frames=2, cfg=cfg.replace(
        radar=dataclasses.replace(cfg.radar, dataset="oxford")), speed=6.0)
    f = cfg.filter
    min_bin = int(math.ceil(cfg.radar.min_distance / cfg.radar.range_res))
    cb, ca, ci, cp = native_io.filter_frames_host_compact(
        images, f.k_strongest, f.z_min, f.nms_window,
        cfg.feature.point_budget, min_bin)

    for b in args.batches:
        def rep(x):
            return jnp.asarray(np.broadcast_to(
                x[None, 1], (b,) + x[1].shape).copy())

        cand = filtering.CompactCandidates(bins=rep(cb), azimuth=rep(ca),
                                           intensity=rep(ci), peak=rep(cp))
        states = jax.vmap(lambda _: odometry.init_state(cfg))(jnp.arange(b))
        boot = filtering.CompactCandidates(
            bins=jnp.asarray(np.broadcast_to(cb[None, 0],
                                             (b,) + cb[0].shape).copy()),
            azimuth=jnp.asarray(np.broadcast_to(ca[None, 0],
                                                (b,) + ca[0].shape).copy()),
            intensity=jnp.asarray(np.broadcast_to(
                ci[None, 0], (b,) + ci[0].shape).copy()),
            peak=jnp.asarray(np.broadcast_to(cp[None, 0],
                                             (b,) + cp[0].shape).copy()))
        states, _ = jax.jit(jax.vmap(odometry.make_bootstrap(
            cfg, "compact")))(states, boot)
        states = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), states)

        @jax.jit
        def extract(sts, cd):
            pts = jax.vmap(
                lambda c: filtering.points_from_compact(c, cfg))(cd)
            xy = jax.vmap(
                lambda p, t: se2.compensate_points(p, t, cfg.radar.ccw))(
                    pts.xy, sts.tmot)
            return features.compute_cells_batched(pts._replace(xy=xy), cfg)

        t_ex = timeit(extract, (states, cand), args.iters)

        cells = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                             extract(states, cand))

        @jax.jit
        def fuse(sts, cl):
            return jax.vmap(
                lambda s, c: odometry._fuse_frame(s, c, cfg))(sts, cl)

        t_fu = timeit(fuse, (states, cells), args.iters)

        stepb = odometry.make_batched_step(cfg, "compact")

        @jax.jit
        def step(sts, cd):
            return stepb(sts, cd)

        t_st = timeit(step, (states, cand), args.iters)
        print(f"B={b:3d}  extract {t_ex:7.3f} ms   fuse {t_fu:7.3f} ms   "
              f"step {t_st:7.3f} ms   (per-lane step "
              f"{t_st / b:6.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
