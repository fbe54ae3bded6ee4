"""Multi-session SLAM merge CLI.

Merges two sessions' `simple_graph.npz` artifacts (as written by
`offline_odometry --save-graph`; the reference's `.sgh` hand-off to
TBV-SLAM, `types.h:192-196`, `README.md:150-152`) into one jointly
optimized graph: cross-session ring-key matching, registration
verification, consensus rigid alignment, inter-session LOOP_APPEARANCE
edges (`models/multisession.py`).

Usage:
  python -m cfear_radarodometry_code_public_tpu.merge_sessions \
      session_a/simple_graph.npz session_b/simple_graph.npz \
      --out merged_graph.npz [--preset CFEAR-3] [--dataset synthetic]
      [--tum merged.tum] [--cpu]

Writes the merged graph npz (optimized node poses; session B's nodes
follow session A's) and optionally a TUM-format pose file of the merged
trajectory.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="merge two CFEAR session graphs into one frame")
    ap.add_argument("graph_a")
    ap.add_argument("graph_b")
    ap.add_argument("--out", default="merged_graph.npz")
    ap.add_argument("--preset", default="CFEAR-3")
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--max-cells", type=int, default=0,
                    help="cell budget for verification registrations "
                         "(0 = preset value)")
    ap.add_argument("--tum", default=None,
                    help="also write the merged trajectory in TUM format")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    from cfear_radarodometry_code_public_tpu.config import preset
    from cfear_radarodometry_code_public_tpu.models import (multisession,
                                                            posegraph)

    cfg = preset(args.preset, dataset=args.dataset)
    if args.max_cells:
        cfg = cfg.replace(feature=dataclasses.replace(
            cfg.feature, max_cells=args.max_cells))
    gb_a = posegraph.GraphBuilder.load(args.graph_a)
    gb_b = posegraph.GraphBuilder.load(args.graph_b)
    print(f"session A: {len(gb_a.poses)} nodes, "
          f"{gb_a.n_constraints(posegraph.ODOMETRY)} odometry edges; "
          f"session B: {len(gb_b.poses)} nodes", flush=True)

    opt, joint, inliers, t_ab = multisession.merge_sessions(
        gb_a, gb_b, cfg, iters=args.iters)
    print(f"merged: {len(inliers)} cross-session edges, "
          f"T_ab = [{t_ab[0]:.2f} m, {t_ab[1]:.2f} m, "
          f"{np.degrees(t_ab[2]):.1f} deg]")

    for k in range(len(joint.poses)):
        joint.poses[k] = opt[k]
    joint.save(args.out)
    print(f"wrote {args.out} ({len(joint.poses)} nodes, "
          f"{len(joint.edges)} edges)")
    if args.tum:
        with open(args.tum, "w") as f:
            for k, p in enumerate(joint.poses):
                qz = np.sin(p[2] / 2.0)
                qw = np.cos(p[2] / 2.0)
                f.write(f"{joint.stamps[k]:.6f} {p[0]:.6f} {p[1]:.6f} "
                        f"0.000000 0.000000 0.000000 {qz:.6f} {qw:.6f}\n")
        print(f"wrote {args.tum}")
    return dict(n_nodes=len(joint.poses), n_cross=len(inliers),
                t_ab=[float(x) for x in t_ab])


if __name__ == "__main__":
    main()
