"""Loop-closure detection + verification for the pose-graph back-end.

The reference emits an odometry-only `simple_graph` whose loop constraints
are added downstream by the companion TBV-SLAM project (`types.h:150-190`
defines the loop_appearance / mini_loop constraint types). This module
completes the SLAM story in-repo:

- **Descriptor**: a rotation-invariant ring key per keyframe — the
  nsamples-weighted histogram of cell-mean ranges (rings), plus an
  azimuthal sector histogram used to estimate relative yaw by circular
  cross-correlation (scan-context style).
- **Proposal**: cosine distance between ring keys of non-adjacent keyframes.
- **Verification**: CFEAR registration of the two keyframe scans seeded with
  the correlation yaw; accepted matches become `LOOP_APPEARANCE` constraints
  with the registration covariance.
- **Optimization**: the pose graph (odometry chain + verified loops) is
  solved with the GN/CG backend (optionally distributed).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cfear_radarodometry_code_public_tpu.config import CFEARConfig
from cfear_radarodometry_code_public_tpu.models import posegraph
from cfear_radarodometry_code_public_tpu.ops import features, filtering, registration
from cfear_radarodometry_code_public_tpu.utils import se2


@dataclasses.dataclass
class LoopCloserConfig:
    n_rings: int = 24
    n_sectors: int = 60
    max_ring_distance: float = 0.25     # cosine distance gate on ring keys
    min_keyframe_separation: int = 10
    max_candidates: int = 5             # per keyframe
    verify_score_max: float = 0.05      # registration score acceptance
    min_assoc: int = 50


def _descriptors(cells: features.CellMap, cfg: CFEARConfig,
                 lc: LoopCloserConfig):
    """(ring_key (n_rings,), sector_hist (n_sectors,)) for one scan."""
    valid = cells.valid
    r = jnp.linalg.norm(cells.mean, axis=-1)
    a = jnp.mod(jnp.arctan2(cells.mean[:, 1], cells.mean[:, 0]),
                2 * jnp.pi)
    max_r = cfg.radar.max_usable_range
    ring = jnp.clip((r / max_r * lc.n_rings).astype(jnp.int32), 0,
                    lc.n_rings - 1)
    sector = jnp.clip((a / (2 * jnp.pi) * lc.n_sectors).astype(jnp.int32), 0,
                      lc.n_sectors - 1)
    w = jnp.where(valid, cells.nsamples, 0.0)
    ring_key = jax.ops.segment_sum(w, ring, num_segments=lc.n_rings)
    sector_hist = jax.ops.segment_sum(w, sector, num_segments=lc.n_sectors)
    return ring_key, sector_hist


def _cosine_dist(a: np.ndarray, b: np.ndarray) -> float:
    na = np.linalg.norm(a)
    nb = np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 1.0
    return float(1.0 - (a @ b) / (na * nb))


def _yaw_from_sectors(h_i: np.ndarray, h_j: np.ndarray,
                      n_sectors: int) -> float:
    """Relative yaw by circular cross-correlation of sector histograms."""
    corr = np.fft.irfft(np.fft.rfft(h_i) * np.conj(np.fft.rfft(h_j)),
                        n=n_sectors)
    shift = int(np.argmax(corr))
    return shift / n_sectors * 2 * np.pi


class LoopCloser:
    """Offline SLAM pass over an odometry run (the TBV-SLAM role)."""

    def __init__(self, cfg: CFEARConfig, lc: LoopCloserConfig | None = None):
        self.cfg = cfg
        self.lc = lc or LoopCloserConfig()
        self._cells_fn = jax.jit(lambda img: features.compute_cells(
            filtering.filter_polar_image(img, cfg), cfg))
        self._desc_fn = jax.jit(lambda c: _descriptors(c, cfg, self.lc))

        def _reg(kf_cells, kf_pose, src_cells, guess):
            kf = jax.tree.map(lambda a: a[None], kf_cells)
            return registration.register(
                kf, kf_pose[None, :], jnp.ones(1, bool), src_cells, guess,
                cfg=cfg)

        self._reg_fn = jax.jit(_reg)

    def close(self, images: np.ndarray, gb: posegraph.GraphBuilder,
              keyframe_frames: List[int]) -> List[Tuple[int, int]]:
        """Detect + verify loops; append constraints to `gb`.

        `keyframe_frames[k]` is the sequence frame index of graph node k.
        Returns the list of accepted (i, j) node pairs.
        """
        lc = self.lc
        cells_list = []
        ring_keys = []
        sector_hists = []
        for f in keyframe_frames:
            c = self._cells_fn(jnp.asarray(images[f]))
            rk, sh = self._desc_fn(c)
            cells_list.append(c)
            ring_keys.append(np.asarray(rk))
            sector_hists.append(np.asarray(sh))

        accepted = []
        n = len(keyframe_frames)
        for i in range(n):
            cands = []
            for j in range(0, i - lc.min_keyframe_separation):
                d = _cosine_dist(ring_keys[i], ring_keys[j])
                if d < lc.max_ring_distance:
                    cands.append((d, j))
            cands.sort()
            for d, j in cands[:lc.max_candidates]:
                yaw = _yaw_from_sectors(sector_hists[i], sector_hists[j],
                                        lc.n_sectors)
                # guess: odometry relative pose, yaw refined by correlation
                t_odo = np.asarray(se2.relative(
                    jnp.asarray(gb.poses[j]), jnp.asarray(gb.poses[i])))
                guess = jnp.asarray([t_odo[0], t_odo[1], -yaw], jnp.float32)
                # translation from odometry may have drifted: try odometry
                # translation and zero translation
                best = None
                for g0 in (guess, jnp.asarray([0.0, 0.0, -yaw], jnp.float32)):
                    res = self._reg_fn(cells_list[j],
                                       jnp.zeros(3, jnp.float32),
                                       cells_list[i], g0)
                    if not bool(res.success):
                        continue
                    if best is None or float(res.score) < float(best.score):
                        best = res
                if best is None:
                    continue
                if (float(best.score) < lc.verify_score_max
                        and int(best.num_assoc) >= lc.min_assoc):
                    gb.add_loop_edge(j, i, np.asarray(best.pose),
                                     np.asarray(best.cov),
                                     kind=posegraph.LOOP_APPEARANCE)
                    accepted.append((i, j))
                    break
        return accepted


def close_and_optimize(images: np.ndarray, outputs, trajectory: np.ndarray,
                       cfg: CFEARConfig, stamps=None,
                       lc: LoopCloserConfig | None = None,
                       iters: int = 15, mesh=None):
    """Full SLAM pass: build graph from odometry, close loops, optimize.

    Returns (optimized node poses (K, 3), graph builder, accepted pairs).
    """
    gb = posegraph.build_graph_from_odometry(outputs, trajectory, stamps)
    keyframe_frames = list(np.where(np.asarray(outputs.fused))[0])
    closer = LoopCloser(cfg, lc)
    accepted = closer.close(images, gb, keyframe_frames)
    graph = gb.to_arrays()
    if mesh is not None:
        from cfear_radarodometry_code_public_tpu.parallel import pgo
        opt, _ = pgo.distributed_optimize(graph, mesh, iters=iters)
    else:
        opt, _ = posegraph.optimize(graph, iters=iters)
    return np.asarray(opt.poses), gb, accepted
