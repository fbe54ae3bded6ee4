"""Per-stage TPU timing probe: single vs vmapped per-frame pipeline stages.

Answers "where does the batched (vmap) odometry step lose its parallelism?"
by timing, per stage, the single-frame function and its vmap over B lanes:

  features : candidates -> points -> compute_cells
  register : cells + keyframe window -> registration.register

Usage:  python tools/profile_stages.py [--batch 8] [--iters 50]

Timing is synced via host transfer (np.asarray) because block_until_ready
under-waits on the axon backend. Measurements are THROUGHPUT per call
(iters async dispatches, one scalar sync at the end); absolute values
include ~0.8 ms/call dispatch overhead through the tunnel, so compare
ratios, and trust bench.py (chunked scans) for end-to-end numbers.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def timeit(fn, args, iters, sync):
    """sync must fetch only a few bytes — the tunnel runs ~25 MB/s, so
    fetching a full output block would dominate the measurement."""
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters * 1e3


def scalar_of(x):
    """Fetch a single element of an arbitrarily-shaped array."""
    return np.asarray(x.ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.models import odometry
    from cfear_radarodometry_code_public_tpu.ops import features, filtering, registration
    from cfear_radarodometry_code_public_tpu.ops.filtering import Candidates
    from cfear_radarodometry_code_public_tpu.utils import native_io, se2

    cfg = preset("CFEAR-3", dataset="oxford")
    b = args.batch
    print(f"device: {jax.devices()[0]}  batch={b}", file=sys.stderr)

    images, _ = synthetic.make_sequence(seed=1, n_frames=args.frames, cfg=cfg,
                                        speed=6.0)
    f = cfg.filter
    bi, it, pk = native_io.filter_frames_host(images, f.k_strongest, f.z_min,
                                              f.nms_window)
    cand = Candidates(bins=jnp.asarray(bi), intensity=jnp.asarray(it),
                      peak=jnp.asarray(pk))
    c0 = jax.tree.map(lambda x: x[0], cand)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], (b,) + x.shape[1:]),
                      cand)
    cb0 = jax.tree.map(lambda x: x[0], cb)

    # --- features stage ---------------------------------------------------
    def feat(c):
        pts = filtering.points_from_candidates(c, cfg)
        return features.compute_cells(pts, cfg)

    feat1 = jax.jit(feat)
    featb = jax.jit(jax.vmap(feat))

    ms1 = timeit(feat1, (c0,), args.iters, lambda o: scalar_of(o.mean))
    msb = timeit(featb, (cb,), args.iters, lambda o: scalar_of(o.mean))
    print(f"features   single {ms1:7.3f} ms   vmap x{b} {msb:7.3f} ms "
          f"({msb / ms1:.2f}x single; ideal 1.0x, serial {b:.1f}x)")

    def featbb(c):
        pts = jax.vmap(lambda ci: filtering.points_from_candidates(ci, cfg))(c)
        return features.compute_cells_batched(pts, cfg)

    msbb = timeit(jax.jit(featbb), (cb,), args.iters,
                  lambda o: scalar_of(o.mean))
    print(f"features   batched x{b} {msbb:7.3f} ms ({msbb / ms1:.2f}x single)")

    # --- registration stage ------------------------------------------------
    # build a realistic keyframe window: same scene from 4 nearby poses
    cells0 = feat1(c0)
    s = cfg.odometry.submap_scan_size
    kf_poses = jnp.asarray(
        [[-4.5 + 1.5 * i, 0.02 * i, 0.01 * i] for i in range(s)], jnp.float32)
    kf_cells = jax.tree.map(lambda a: jnp.stack([a] * s), cells0)
    kf_valid = jnp.ones((s,), bool)
    guess = jnp.asarray([1.2, 0.05, 0.01], jnp.float32)

    def reg(kc, kp, kv, src, g):
        return registration.register(kc, kp, kv, src, g, cfg=cfg)

    reg1 = jax.jit(reg)
    regb = jax.jit(jax.vmap(reg))

    kcb = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), kf_cells)
    kpb = jnp.broadcast_to(kf_poses, (b, s, 3))
    kvb = jnp.broadcast_to(kf_valid, (b, s))
    srcb = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), cells0)
    gb = jnp.broadcast_to(guess, (b, 3))

    ms1 = timeit(reg1, (kf_cells, kf_poses, kf_valid, cells0, guess),
                 args.iters, lambda o: scalar_of(o.pose))
    msb = timeit(regb, (kcb, kpb, kvb, srcb, gb), args.iters,
                 lambda o: scalar_of(o.pose))
    print(f"register   single {ms1:7.3f} ms   vmap x{b} {msb:7.3f} ms "
          f"({msb / ms1:.2f}x single)")

    # attribution: how much of register is LM while-loop iterations?
    import dataclasses
    for cap in (5, 2):
        cfg_cap = cfg.replace(registration=dataclasses.replace(
            cfg.registration, max_itr_solver=cap))
        mc = timeit(jax.jit(lambda kc, kp, kv, src, g, c=cfg_cap:
                            registration.register(kc, kp, kv, src, g, cfg=c)),
                    (kf_cells, kf_poses, kf_valid, cells0, guess),
                    args.iters, lambda o: scalar_of(o.pose))
        print(f"register   single {mc:7.3f} ms   [max_itr_solver={cap}]")

    # --- registration sub-stages -------------------------------------------
    import math
    from cfear_radarodometry_code_public_tpu.ops import pallas_lm
    from cfear_radarodometry_code_public_tpu.ops.registration import (
        _associate_world, _world_attrs)

    cos_gate = math.cos(math.radians(cfg.registration.angle_outlier_deg))

    @jax.jit
    def assoc_pack(kc, kp, kv, src, pose):
        attrs = _world_attrs(kc, kp, cfg)
        assoc, tgt = _associate_world(attrs, src, pose, kv,
                                      cfg.registration.assoc_radius, cfg,
                                      cos_gate, "pallas")
        return pallas_lm.pack_associations(src.mean, tgt,
                                           assoc.weight * assoc.valid, cfg)

    packed = assoc_pack(kf_cells, kf_poses, kf_valid, cells0, guess)
    ms1 = timeit(assoc_pack, (kf_cells, kf_poses, kf_valid, cells0, guess),
                 args.iters, lambda o: scalar_of(o))
    msb = timeit(jax.jit(jax.vmap(assoc_pack)),
                 (kcb, kpb, kvb, srcb, gb), args.iters,
                 lambda o: scalar_of(o))
    print(f"assoc+pack single {ms1:7.3f} ms   vmap x{b} {msb:7.3f} ms "
          f"({msb / ms1:.2f}x single)  [one outer iteration]")

    @jax.jit
    def lm(p, pose):
        return pallas_lm.lm_solve_packed_xla(p, pose, cfg)

    packedb = jnp.broadcast_to(packed, (b,) + packed.shape)
    ms1 = timeit(lm, (packed, guess), args.iters, lambda o: scalar_of(o[0]))
    msb = timeit(jax.jit(jax.vmap(lm)), (packedb, gb), args.iters,
                 lambda o: scalar_of(o[0]))
    print(f"LM solve   single {ms1:7.3f} ms   vmap x{b} {msb:7.3f} ms "
          f"({msb / ms1:.2f}x single)  [one outer iteration]")

    # --- full step ----------------------------------------------------------
    step = odometry.make_step(cfg, "candidates")
    boot = jax.jit(odometry.make_bootstrap(cfg, "candidates"))
    st0, _ = boot(odometry.init_state(cfg), c0)
    step1 = jax.jit(step)
    stepb = jax.jit(jax.vmap(step))
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), st0)

    ms1 = timeit(step1, (st0, c0), args.iters, lambda o: scalar_of(o[1].pose))
    msb = timeit(stepb, (stb, cb), args.iters, lambda o: scalar_of(o[1].pose))
    print(f"full step  single {ms1:7.3f} ms   vmap x{b} {msb:7.3f} ms "
          f"({msb / ms1:.2f}x single)")

    stepbb = jax.jit(odometry.make_batched_step(cfg, "candidates"))
    msbb = timeit(stepbb, (stb, cb), args.iters,
                  lambda o: scalar_of(o[1].pose))
    print(f"full step  batched x{b} {msbb:7.3f} ms ({msbb / ms1:.2f}x single; "
          f"{b * ms1 / msbb:.2f}x throughput vs single)")


if __name__ == "__main__":
    main()
