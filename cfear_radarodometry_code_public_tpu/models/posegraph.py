"""Pose-graph back-end: odometry + loop-closure constraints, GN optimization.

Data-model rebuild of the reference's `simple_graph`
(`types.h:93-196`: RadarScan poses + Constraint3d {id_begin, id_end, t_be,
6x6 information, type}) with a TPU-native optimizer: instead of a sparse
direct solver, Gauss-Newton steps are computed matrix-free — the GN
normal-equation matvec H x = J^T J x is evaluated edge-wise via jvp/vjp of
the residual function and reduced with `psum` when edges are sharded across
devices (`parallel/pgo.py`), and the linear system is solved with conjugate
gradients. Poses are gauge-fixed at node 0.

Residual per constraint (standard SE(2) pose-graph error, matching the
semantics of Ceres' 2-D pose-graph formulation used downstream of the
reference): r = sqrt_info @ [R_i^T (t_j - t_i) - t_ij ; wrap(th_j - th_i - th_ij)].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cfear_radarodometry_code_public_tpu.utils import se2

# constraint types (`types.h:150-190`)
ODOMETRY = 0
LOOP_APPEARANCE = 1
MINI_LOOP = 2
CANDIDATE = 3


class PoseGraph(NamedTuple):
    """Fixed-shape pose graph (padded, masked)."""

    poses: jax.Array       # (N, 3) node poses [x, y, yaw]
    node_valid: jax.Array  # (N,) bool
    edge_i: jax.Array      # (E,) int32 id_begin
    edge_j: jax.Array      # (E,) int32 id_end
    t_ij: jax.Array        # (E, 3) measured relative pose (i -> j)
    sqrt_info: jax.Array   # (E, 3, 3) square-root information
    edge_type: jax.Array   # (E,) int32
    edge_valid: jax.Array  # (E,) bool


def edge_residuals(poses, graph: PoseGraph):
    """(E, 3) weighted residuals (zeros for invalid edges)."""
    pi = poses[graph.edge_i]
    pj = poses[graph.edge_j]
    rel = se2.relative(pi, pj)
    d = rel - graph.t_ij
    d = d.at[:, 2].set(se2.normalize_angle(d[:, 2]))
    r = jnp.einsum("eab,eb->ea", graph.sqrt_info, d)
    return jnp.where(graph.edge_valid[:, None], r, 0.0)


def _gauge_fix(x):
    return x.at[0].set(0.0)


def gn_step(poses, graph: PoseGraph, cg_iters: int = 50, damping: float = 1e-6):
    """One matrix-free Gauss-Newton step: solve (J^T J + lam I) dx = -J^T r."""

    def res_fn(p):
        return edge_residuals(p, graph)

    r, vjp = jax.vjp(res_fn, poses)
    (grad,) = vjp(r)
    grad = _gauge_fix(grad)

    def hvp(x):
        x = _gauge_fix(x)
        _, jv = jax.jvp(res_fn, (poses,), (x,))
        (h,) = vjp(jv)
        return _gauge_fix(h) + damping * x

    dx = _cg(hvp, -grad, cg_iters)
    new_poses = poses + _gauge_fix(dx)
    cost = 0.5 * jnp.sum(r * r)
    return new_poses, cost, jnp.linalg.norm(grad)


def _cg(matvec, b, iters: int):
    """Plain conjugate gradients (fixed iteration count, jit-friendly)."""

    def body(_, state):
        x, r, p, rs = state
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = rs / jnp.where(denom > 0, denom, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.where(rs > 0, rs, 1.0)
        p = r + beta * p
        return x, r, p, rs_new

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.sum(b * b))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@jax.jit
def optimize(graph: PoseGraph, iters: int = 10, cg_iters: int = 50):
    """Gauss-Newton pose-graph optimization (single device)."""

    def body(_, carry):
        poses, _ = carry
        poses, cost, _ = gn_step(poses, graph, cg_iters)
        return poses, cost

    poses, cost = jax.lax.fori_loop(
        0, iters, body, (graph.poses, jnp.asarray(0.0, graph.poses.dtype)))
    return graph._replace(poses=poses), cost


def total_cost(graph: PoseGraph):
    r = edge_residuals(graph.poses, graph)
    return 0.5 * jnp.sum(r * r)


# ---------------------------------------------------------------------------
# host-side graph construction / serialization (simple_graph equivalent)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GraphBuilder:
    """Accumulates keyframe poses + constraints; the `.sgh` role is played by
    an npz archive (`save`/`load`), the hand-off artifact for SLAM back-ends
    (reference `SaveSimpleGraph`, `types.cpp:103-130`)."""

    poses: list = dataclasses.field(default_factory=list)
    stamps: list = dataclasses.field(default_factory=list)
    gt_poses: list = dataclasses.field(default_factory=list)
    has_gt: list = dataclasses.field(default_factory=list)
    edges: list = dataclasses.field(default_factory=list)  # (i, j, tij, info, type)

    def add_node(self, pose, stamp: float = 0.0) -> int:
        self.poses.append(np.asarray(pose, np.float64))
        self.stamps.append(float(stamp))
        self.gt_poses.append(np.zeros(3))
        self.has_gt.append(False)
        return len(self.poses) - 1

    def add_odometry_edge(self, i: int, j: int, cov3: np.ndarray):
        """Odometry constraint j -> i with information cov^-1
        (`AddToGraph`, `odometrykeyframefuser.cpp:428-445`)."""
        t_ij = np.asarray(se2.relative(
            jnp.asarray(self.poses[i]), jnp.asarray(self.poses[j])))
        info = np.linalg.inv(cov3 + 1e-12 * np.eye(3))
        self.edges.append((i, j, t_ij, info, ODOMETRY))

    def add_loop_edge(self, i: int, j: int, t_ij, cov3, kind: int = LOOP_APPEARANCE):
        info = np.linalg.inv(np.asarray(cov3) + 1e-12 * np.eye(3))
        self.edges.append((i, j, np.asarray(t_ij, np.float64), info, kind))

    def attach_ground_truth(self, stamps, gt_xyt, tol: float = 1e-4):
        """Match GT poses to nodes by timestamp (`AddGroundTruth`,
        `odometrykeyframefuser.cpp:446-463`)."""
        stamps = np.asarray(stamps)
        for k, t in enumerate(self.stamps):
            d = np.abs(stamps - t)
            m = int(np.argmin(d))
            if d[m] <= tol:
                self.gt_poses[k] = np.asarray(gt_xyt[m], np.float64)
                self.has_gt[k] = True

    def to_arrays(self, max_nodes: Optional[int] = None,
                  max_edges: Optional[int] = None,
                  dtype=jnp.float32) -> PoseGraph:
        n = len(self.poses)
        e = len(self.edges)
        nn = max_nodes or n
        ee = max_edges or max(e, 1)
        poses = np.zeros((nn, 3))
        poses[:n] = np.stack(self.poses) if n else 0
        ei = np.zeros(ee, np.int32)
        ej = np.zeros(ee, np.int32)
        tij = np.zeros((ee, 3))
        sinfo = np.zeros((ee, 3, 3))
        etype = np.zeros(ee, np.int32)
        for k, (i, j, t, info, kind) in enumerate(self.edges[:ee]):
            ei[k], ej[k] = i, j
            tij[k] = t
            sinfo[k] = np.linalg.cholesky(
                (info + info.T) / 2 + 1e-12 * np.eye(3)).T
            etype[k] = kind
        return PoseGraph(
            poses=jnp.asarray(poses, dtype),
            node_valid=jnp.asarray(np.arange(nn) < n),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            t_ij=jnp.asarray(tij, dtype),
            sqrt_info=jnp.asarray(sinfo, dtype),
            edge_type=jnp.asarray(etype),
            edge_valid=jnp.asarray(np.arange(ee) < e),
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            poses=np.stack(self.poses) if self.poses else np.zeros((0, 3)),
            stamps=np.asarray(self.stamps),
            gt_poses=np.stack(self.gt_poses) if self.gt_poses else np.zeros((0, 3)),
            has_gt=np.asarray(self.has_gt),
            edge_i=np.asarray([e[0] for e in self.edges], np.int64),
            edge_j=np.asarray([e[1] for e in self.edges], np.int64),
            t_ij=np.stack([e[2] for e in self.edges]) if self.edges else np.zeros((0, 3)),
            info=np.stack([e[3] for e in self.edges]) if self.edges else np.zeros((0, 3, 3)),
            edge_type=np.asarray([e[4] for e in self.edges], np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "GraphBuilder":
        z = np.load(path)
        gb = cls()
        gb.poses = list(z["poses"])
        gb.stamps = list(z["stamps"])
        gb.gt_poses = list(z["gt_poses"])
        gb.has_gt = list(z["has_gt"])
        gb.edges = [(int(i), int(j), t, inf, int(k))
                    for i, j, t, inf, k in zip(z["edge_i"], z["edge_j"],
                                               z["t_ij"], z["info"],
                                               z["edge_type"])]
        return gb


def build_graph_from_odometry(outputs, trajectory_xyt, stamps=None
                              ) -> GraphBuilder:
    """Assemble the odometry pose graph from fuser frame outputs
    (keyframe nodes + chained odometry constraints)."""
    gb = GraphBuilder()
    fused = np.asarray(outputs.fused)
    covs = np.asarray(outputs.cov, np.float64)
    prev = None
    for k in np.where(fused)[0]:
        stamp = float(stamps[k]) if stamps is not None else float(k)
        idx = gb.add_node(trajectory_xyt[k], stamp)
        if prev is not None:
            gb.add_odometry_edge(idx, prev, covs[k])
        prev = idx
    return gb
