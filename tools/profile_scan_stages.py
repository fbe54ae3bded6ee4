"""In-scan per-stage timing of the batched odometry step (ONE dispatch).

The r4 micro-benchmarks (profile_breakdown/profile_features) time each
stage with a Python dispatch loop; on the remote-TPU tunnel the per-call
enqueue cost is 1-3 ms, so small stages measure the enqueue floor, not
device time (their stage sum is ~2x the fused step). Here every probe is
a `lax.scan` of K iterations inside ONE jitted call — per-iteration cost
is total/K with the dispatch paid once, i.e. true device time, the same
regime the production chunk runner executes in.

Probes (bench config: CFEAR-3 Oxford scale, host-compact ingest,
point_budget=8192, max_cells=1024, Morton sort, pallas_sparse assoc):
  ingest    : points_from_compact (vmapped)
  features  : compute_cells_batched
  feat_nos2 : features up to the 63-wide moment data, reduced WITHOUT the
              voxel scatter (sum over points) — features - feat_nos2
              isolates the stage-2 segment_sum + combine cost
  register  : vmapped register() against a 4-keyframe window
  step      : the full batched step (make_batched_step)

Each probe perturbs its input by a tiny carry-dependent epsilon so the
scanned body has a true loop-carried dependency (no dead-code elision).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan-len", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-cells", type=int, default=1024)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.datasets import synthetic
    from cfear_radarodometry_code_public_tpu.models import odometry
    from cfear_radarodometry_code_public_tpu.ops import (features, filtering,
                                                         registration)
    from cfear_radarodometry_code_public_tpu.utils import native_io

    cfg = preset("CFEAR-3", dataset="oxford")
    cfg = cfg.replace(
        feature=dataclasses.replace(cfg.feature, max_cells=args.max_cells,
                                    point_budget=8192, spatial_sort=True),
        registration=dataclasses.replace(cfg.registration,
                                         assoc_method="pallas_sparse"))
    b = args.batch
    k = args.scan_len

    images, _ = synthetic.make_sequence(seed=1, n_frames=1, cfg=cfg,
                                        speed=6.0)
    f, radar = cfg.filter, cfg.radar
    min_bin = int(math.ceil(radar.min_distance / radar.range_res))
    bb, aa, ii, pp = native_io.filter_frames_host_compact(
        images, f.k_strongest, f.z_min, f.nms_window,
        cfg.feature.point_budget, min_bin)
    comp = filtering.CompactCandidates(
        bins=jnp.asarray(np.repeat(bb, b, 0)),
        azimuth=jnp.asarray(np.repeat(aa, b, 0)),
        intensity=jnp.asarray(np.repeat(ii, b, 0)),
        peak=jnp.asarray(np.repeat(pp, b, 0)))

    ingest = jax.jit(jax.vmap(lambda c: filtering.points_from_compact(c, cfg)))
    pts = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), ingest(comp))

    featb = jax.jit(lambda p: features.compute_cells_batched(p, cfg))
    cells = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), featb(pts))

    s = cfg.odometry.submap_scan_size
    c0 = jax.tree.map(lambda a: a[0], cells)
    kf_cells = jax.tree.map(
        lambda a: jnp.asarray(np.broadcast_to(
            np.stack([np.asarray(a)] * s), (b, s) + a.shape).copy()), c0)
    kf_poses = jnp.asarray(np.broadcast_to(np.asarray(
        [[-4.5 + 1.5 * i, 0.02 * i, 0.01 * i] for i in range(s)],
        np.float32), (b, s, 3)).copy())
    kf_valid = jnp.ones((b, s), bool)
    guess = jnp.asarray(np.broadcast_to(
        np.asarray([1.2, 0.05, 0.01], np.float32), (b, 3)).copy())

    def scan_time(make_body, init_carry):
        @jax.jit
        def run(c0):
            return jax.lax.scan(make_body, c0, None, length=k)[0]

        out = run(init_carry)           # compile
        np.asarray(out)
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = run(init_carry)
            np.asarray(out)
            ts.append((time.time() - t0) / k * 1e3)
        return float(np.median(ts))

    eps = jnp.float32(1e-12)
    rows = []

    def probe(name, t):
        rows.append((name, t))
        print(f"{name:10s} {t:8.3f} ms/iter", flush=True)

    # ingest
    def body_ingest(c, _):
        # the carry-dependent epsilon keeps the body loop-VARIANT — on a
        # constant input XLA would hoist the whole ingest out of the scan
        # and the probe would measure ~0
        cc = comp._replace(intensity=comp.intensity + c * 0.0)
        p = jax.vmap(lambda x: filtering.points_from_compact(x, cfg))(cc)
        return c + eps * jnp.sum(p.xy[:, :8, 0]) , None
    probe("ingest", scan_time(body_ingest, jnp.float32(0.0)))

    # features (carry perturbs one coordinate -> true dependency)
    cfg_fx = cfg.replace(feature=dataclasses.replace(cfg.feature,
                                                     backend="xla"))

    def body_feat(c, _):
        p = pts._replace(xy=pts.xy + c * 0.0)
        cm = features.compute_cells_batched(p, cfg_fx)
        return c + eps * jnp.sum(cm.mean[:, :8, 0]), None
    probe("features", scan_time(body_feat, jnp.float32(0.0)))

    # features through the fused Pallas moment kernel
    cfg_fp = cfg.replace(feature=dataclasses.replace(cfg.feature,
                                                     backend="pallas"))

    def body_feat_pl(c, _):
        p = pts._replace(xy=pts.xy + c * 0.0)
        cm = features.compute_cells_batched(p, cfg_fp)
        return c + eps * jnp.sum(cm.mean[:, :8, 0]), None
    try:
        probe("feat_pallas", scan_time(body_feat_pl, jnp.float32(0.0)))
    except Exception as e:  # keep the rest of the table on kernel failure
        print(f"feat_pallas FAILED: {type(e).__name__}: {e}", flush=True)

    # features WITHOUT the stage-2 scatter (sum over the point axis instead)
    leaf, dim, noff = features._grid_geometry(cfg)
    ncells = dim * dim
    offsets = [(dx, dy) for dx in range(-noff, noff + 1)
               for dy in range(-noff, noff + 1)]
    n_pts = cfg.feature.point_budget
    lane = jnp.arange(b, dtype=jnp.int32)[:, None]
    feat = cfg.feature

    def feat_nos2(points):
        xy = points.xy
        valid = points.valid
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
        occupied = cnt_vox >= 1.0
        cgrid = jnp.concatenate(
            [centroid.reshape(b, dim, dim, 2),
             occupied.reshape(b, dim, dim, 1).astype(jnp.float32)], -1)
        nb = jnp.concatenate(
            [jnp.roll(cgrid, (-dx, -dy), (1, 2)) for dx, dy in offsets], -1)
        vid_c = jnp.clip(jnp.where(in_grid, vid, ncells), 0, ncells - 1)
        nb_pt = nb.reshape(b * ncells, 3 * len(offsets))[
            (lane * ncells + vid_c).reshape(b * n_pts)]
        nb_pt = nb_pt.reshape(b, n_pts, 3 * len(offsets))
        w_pt = jnp.maximum(points.intensity - feat.intensity_floor, 0.0)
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
            cc = nb_pt[..., 3 * oi:3 * oi + 2]
            occ = nb_pt[..., 3 * oi + 2] > 0.5
            d2 = jnp.sum((xy - cc) ** 2, axis=-1)
            mem_cols.append(ok & occ & (d2 <= feat.res * feat.res))
        mem = jnp.stack(mem_cols, -1).astype(jnp.float32)
        data = (mem[..., :, None] * base[..., None, :]).reshape(
            b, n_pts, len(offsets) * 7)
        # REDUCE over points instead of scattering: same reads, no scatter
        return jnp.sum(data, axis=1)

    def body_nos2(c, _):
        p = pts._replace(xy=pts.xy + c * 0.0)
        acc = feat_nos2(p)
        return c + eps * jnp.sum(acc[:, :4]), None
    probe("feat_nos2", scan_time(body_nos2, jnp.float32(0.0)))

    # register
    def body_reg(c, _):
        g = guess + c * 0.0
        pose = jax.vmap(
            lambda kc, kp, kv, src, gg: registration.register(
                kc, kp, kv, src, gg, cfg=cfg).pose)(
            kf_cells, kf_poses, kf_valid, cells, g)
        return c + eps * jnp.sum(pose), None
    probe("register", scan_time(body_reg, jnp.float32(0.0)))

    # full step (xla feature backend, then the auto/pallas default)
    for label, cfg_s in (("step_xla", cfg_fx), ("step", cfg)):
        stepb = odometry.make_batched_step(cfg_s, "compact")
        states0 = jax.vmap(lambda _: odometry.init_state(cfg_s))(
            jnp.arange(b))
        states0, _ = jax.jit(jax.vmap(odometry.make_bootstrap(
            cfg_s, "compact")))(states0, comp)
        states0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                               states0)

        def body_step(st, _, stepb=stepb):
            st2, out = stepb(st, comp)
            return st2, None

        @jax.jit
        def run_step(st, body_step=body_step):
            return jax.lax.scan(body_step, st, None, length=k)[0]

        try:
            out = run_step(states0)
            np.asarray(out.t_prev)
            ts = []
            for _ in range(args.repeats):
                t0 = time.time()
                out = run_step(states0)
                np.asarray(out.t_prev)
                ts.append((time.time() - t0) / k * 1e3)
            probe(label, float(np.median(ts)))
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {e}", flush=True)

    print()
    d = dict(rows)
    print(f"scatter2+combine (features - feat_nos2): "
          f"{d['features'] - d['feat_nos2']:.3f} ms")
    print(f"stage sum (ingest+features+register): "
          f"{d['ingest'] + d['features'] + d['register']:.3f} ms "
          f"vs step {d.get('step', float('nan')):.3f} ms")
    print(f"per-chip steady state at B={b}: "
          f"{1000.0 * b / d['step']:.0f} frames/s")


if __name__ == "__main__":
    main()
