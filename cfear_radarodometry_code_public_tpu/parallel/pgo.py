"""Distributed pose-graph optimization over TPU collectives.

The reference has no distributed back-end (its `simple_graph` is serialized
for an external SLAM project; SURVEY.md §2.3/§5). Here multi-session /
loop-closed graphs are optimized across a device mesh: constraint edges are
sharded over the `data` axis, node poses are replicated, and every
Gauss-Newton gradient / J^T J matvec is an edge-local computation followed by
a `psum` — the Schur-style "partial normal equations + all-reduce" pattern.
The CG iteration state is replicated, so all devices walk the same solution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cfear_radarodometry_code_public_tpu.models.posegraph import (
    DEFAULT_GNC_START, DEFAULT_LOOP_LOSS, DEFAULT_LOOP_LOSS_LIMIT, PoseGraph,
    edge_residuals, gnc_limit)


def _pad_edges(graph: PoseGraph, n_dev: int) -> PoseGraph:
    e = graph.edge_i.shape[0]
    pad = (-e) % n_dev
    if pad == 0:
        return graph
    return graph._replace(
        edge_i=jnp.pad(graph.edge_i, (0, pad)),
        edge_j=jnp.pad(graph.edge_j, (0, pad)),
        t_ij=jnp.pad(graph.t_ij, ((0, pad), (0, 0))),
        sqrt_info=jnp.pad(graph.sqrt_info, ((0, pad), (0, 0), (0, 0))),
        edge_type=jnp.pad(graph.edge_type, (0, pad)),
        edge_valid=jnp.pad(graph.edge_valid, (0, pad)),
    )


def distributed_optimize(graph: PoseGraph, mesh: Mesh, axis: str = "data",
                         iters: int = 10, cg_iters: int = 50,
                         damping: float = 1e-6,
                         loop_loss: str = DEFAULT_LOOP_LOSS,
                         loop_loss_limit: float = DEFAULT_LOOP_LOSS_LIMIT,
                         gnc_start: float = DEFAULT_GNC_START):
    """Edge-sharded Gauss-Newton: returns (optimized PoseGraph, final cost).

    Same robust-loop-edge / CANDIDATE-masking / graduated-non-convexity
    semantics as the single-device optimizer (`posegraph.edge_residuals`,
    `posegraph.gnc_limit`); the IRLS weights are edge-local, so
    robustification adds no extra collectives."""
    n_dev = mesh.shape[axis]
    graph = _pad_edges(graph, n_dev)

    edge_spec = P(axis)
    repl = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, edge_spec, edge_spec, edge_spec,
                       edge_spec, edge_spec, edge_spec),
             out_specs=(repl, repl),
             check_vma=False)
    def run(poses, node_valid, ei, ej, tij, sinfo, etype, evalid):
        local = PoseGraph(poses, node_valid, ei, ej, tij, sinfo, etype, evalid)

        def gauge(x):
            return x.at[0].set(0.0)

        def gn_body(k, carry):
            p, _ = carry
            limit_k = gnc_limit(k, iters, loop_loss_limit, gnc_start)

            def local_res(q):
                return edge_residuals(q, local._replace(poses=q),
                                      loop_loss, limit_k)

            r, vjp = jax.vjp(local_res, p)
            (grad,) = vjp(r)
            grad = gauge(jax.lax.psum(grad, axis))
            cost = 0.5 * jax.lax.psum(jnp.sum(r * r), axis)

            def hvp(x):
                x = gauge(x)
                _, jv = jax.jvp(local_res, (p,), (x,))
                (h,) = vjp(jv)
                return gauge(jax.lax.psum(h, axis)) + damping * x

            def cg_body(_, state):
                x, rr, pp, rs = state
                Ap = hvp(pp)
                denom = jnp.sum(pp * Ap)
                alpha = rs / jnp.where(denom > 0, denom, 1.0)
                x = x + alpha * pp
                rr = rr - alpha * Ap
                rs_new = jnp.sum(rr * rr)
                beta = rs_new / jnp.where(rs > 0, rs, 1.0)
                return x, rr, rr + beta * pp, rs_new

            b = -grad
            dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                       (jnp.zeros_like(b), b, b,
                                        jnp.sum(b * b)))
            return p + gauge(dx), cost

        poses_out, cost = jax.lax.fori_loop(
            0, iters, gn_body, (poses, jnp.asarray(0.0, poses.dtype)))
        return poses_out, cost

    poses_out, cost = run(graph.poses, graph.node_valid, graph.edge_i,
                          graph.edge_j, graph.t_ij, graph.sqrt_info,
                          graph.edge_type, graph.edge_valid)
    return graph._replace(poses=poses_out), cost
