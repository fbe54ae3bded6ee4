"""Fuse-half sub-phase profile at a given batch width.

Splits `_fuse_frame`'s registration internals (vmapped, as the batched
production step runs them):

  world_attrs : per-call (S, M, D) keyframe pre-transform
  assoc       : ONE fused Pallas association (distance+argmin over S
                keyframes) + gather/weights — the per-outer-iteration cost
  lm          : ONE packed LM solve (pack_associations + while-loop)
  register    : the full register() (outer while-loop, ~5-8 iterations)
  fuse        : full _fuse_frame (register + gates + keyframe push)

Use: direct where the batched fuse milliseconds actually go before
optimizing. Timing via host transfer; ~0.8 ms dispatch overhead included.
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--preset", default="CFEAR-3")
    ap.add_argument("--max-cells", type=int, default=2048)
    ap.add_argument("--point-budget", type=int, default=8192)
    ap.add_argument("--max-active-keyframes", type=int, default=0)
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    import dataclasses

    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.models import odometry
    from cfear_radarodometry_code_public_tpu.ops import (features, filtering,
                                                         pallas_lm,
                                                         registration)
    from cfear_radarodometry_code_public_tpu.utils import native_io

    cfg = preset(args.preset, dataset="oxford")
    cfg = cfg.replace(feature=dataclasses.replace(
        cfg.feature, point_budget=args.point_budget,
        max_cells=args.max_cells))
    if args.max_active_keyframes:
        cfg = cfg.replace(registration=dataclasses.replace(
            cfg.registration,
            max_active_keyframes=args.max_active_keyframes))
    reg = cfg.registration
    b = args.batch
    print(f"backend={jax.default_backend()} preset={cfg.name} B={b} "
          f"cells={cfg.feature.max_cells} S={cfg.odometry.submap_scan_size}")

    images, _ = synthetic.make_sequence(seed=1, n_frames=2, cfg=cfg.replace(
        radar=dataclasses.replace(cfg.radar, dataset="oxford")), speed=6.0)
    f = cfg.filter
    min_bin = int(math.ceil(cfg.radar.min_distance / cfg.radar.range_res))
    cb, ca, ci, cp = native_io.filter_frames_host_compact(
        images, f.k_strongest, f.z_min, f.nms_window,
        cfg.feature.point_budget, min_bin)

    def rep(x, i):
        return jnp.asarray(np.broadcast_to(x[None, i],
                                           (b,) + x[i].shape).copy())

    states = jax.vmap(lambda _: odometry.init_state(cfg))(jnp.arange(b))
    boot = filtering.CompactCandidates(bins=rep(cb, 0), azimuth=rep(ca, 0),
                                       intensity=rep(ci, 0), peak=rep(cp, 0))
    states, _ = jax.jit(jax.vmap(odometry.make_bootstrap(
        cfg, "compact")))(states, boot)
    cand = filtering.CompactCandidates(bins=rep(cb, 1), azimuth=rep(ca, 1),
                                       intensity=rep(ci, 1), peak=rep(cp, 1))

    @jax.jit
    def extract(sts, cd):
        pts = jax.vmap(lambda c: filtering.points_from_compact(c, cfg))(cd)
        return features.compute_cells_batched(pts, cfg)

    cells = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                         extract(states, cand))
    states = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), states)
    guesses = jnp.tile(jnp.asarray([[1.5, 0.0, 0.0]], jnp.float32), (b, 1))

    cos_gate = math.cos(math.radians(reg.angle_outlier_deg))

    @jax.jit
    def world_attrs(sts):
        return jax.vmap(
            lambda kc, kp: registration._world_attrs(kc, kp, cfg))(
                sts.kf_cells, sts.kf_poses)

    t = timeit(world_attrs, (states,), args.iters)
    print(f"world_attrs      {t:8.3f} ms")
    attrs = jnp.asarray(np.asarray(world_attrs(states)))

    @jax.jit
    def assoc(at, sts, cl, g):
        return jax.vmap(
            lambda a_, kv, c, p: registration._associate_world(
                a_, c, p, kv, reg.assoc_radius, cfg, cos_gate, "pallas"))(
                    at, sts.kf_valid, cl, g)

    t = timeit(assoc, (attrs, states, cells, guesses), args.iters)
    print(f"assoc(pallas)    {t:8.3f} ms")

    a_out, tgt = assoc(attrs, states, cells, guesses)
    a_out = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), a_out)
    tgt = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tgt)

    @jax.jit
    def lm(cl, tg, ao, g):
        def one(c, t_, a_, g_):
            packed = pallas_lm.pack_associations(
                c.mean, t_, a_.weight * a_.valid, cfg)
            return pallas_lm.lm_solve_packed_xla(packed, g_, cfg)
        return jax.vmap(one)(cl, tg, ao, g)

    t = timeit(lm, (cells, tgt, a_out, guesses), args.iters)
    print(f"lm(packed xla)   {t:8.3f} ms")

    @jax.jit
    def reg_full(sts, cl, g):
        return jax.vmap(
            lambda kc, kp, kv, c, g_: registration.register(
                kc, kp, kv, c, g_, cfg=cfg))(
                    sts.kf_cells, sts.kf_poses, sts.kf_valid, cl, g)

    t = timeit(reg_full, (states, cells, guesses), args.iters)
    print(f"register(full)   {t:8.3f} ms")

    @jax.jit
    def fuse(sts, cl):
        return jax.vmap(lambda s, c: odometry._fuse_frame(s, c, cfg))(sts,
                                                                      cl)

    t = timeit(fuse, (states, cells), args.iters)
    print(f"fuse(full)       {t:8.3f} ms")


if __name__ == "__main__":
    main()
