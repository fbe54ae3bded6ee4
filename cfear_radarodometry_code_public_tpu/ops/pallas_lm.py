"""Fused Pallas kernel: the entire inner Levenberg-Marquardt solve.

The registration hot loop (`_lm_solve`) runs up to 20 trust-region
iterations, each assembling a robust cost / gradient / 3x3 Gauss-Newton
Hessian over all (keyframe, cell) associations. In XLA that is hundreds of
small kernel launches per frame; here the WHOLE solve is one `pallas_call`:

- association data is packed lane-major as (rows, S*M) f32 so every residual
  quantity is a (1, N)-shaped VPU vector op (N = S*M, a multiple of 128);
- the packed block (<= ~0.6 MB) lives in VMEM for the entire solve;
- the LM loop runs inside the kernel as `lax.while_loop` over scalars, with
  reductions (cost, g, H entries) on the VPU;
- outputs (pose, cost, steps, last relative decrease) come back in one
  (1, 128) vector.

Row layout (cost-metric dependent, see `pack_associations`):
  P2P / P2D: [sx, sy, mx, my, w, l11, l21, l22]   (l* = sqrt-info; 1/0 for P2P)
  P2L:       [sx, sy, mx, my, w, nx, ny, pad]
The robust loss rho/rho' is inlined per the static config (losses.rho).

Runs in interpreter mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfear_radarodometry_code_public_tpu.config import CFEARConfig
from cfear_radarodometry_code_public_tpu.ops import losses


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_associations(src_mean, tgt, assoc_weight, cfg: CFEARConfig):
    """(S, M) association data -> (8, N) packed f32 block, N = round128(S*M).

    Invalid associations carry weight 0 and contribute nothing.
    """
    reg = cfg.registration
    s, m = assoc_weight.shape
    n = s * m
    npad = _round_up(n, 128)

    def flat(x):
        v = x.reshape(n)
        return jnp.pad(v, (0, npad - n))

    sx = flat(jnp.broadcast_to(src_mean[None, :, 0], (s, m)))
    sy = flat(jnp.broadcast_to(src_mean[None, :, 1], (s, m)))
    mx = flat(tgt["mean"][..., 0])
    my = flat(tgt["mean"][..., 1])
    w = flat(assoc_weight)
    if reg.cost == "P2L":
        r5 = flat(tgt["normal"][..., 0])
        r6 = flat(tgt["normal"][..., 1])
        r7 = jnp.zeros_like(w)
    elif reg.cost == "P2D":
        r5 = flat(tgt["sqrt_info"][..., 0])
        r6 = flat(tgt["sqrt_info"][..., 1])
        r7 = flat(tgt["sqrt_info"][..., 2])
    else:  # P2P: identity sqrt-info
        r5 = jnp.ones_like(w)
        r6 = jnp.zeros_like(w)
        r7 = jnp.ones_like(w)
    return jnp.stack([sx, sy, mx, my, w, r5, r6, r7])


def _lm_funcs(rows, cfg: CFEARConfig):
    """Build the trust-region LM iteration (cgh, body, cond) over packed
    rows — pure jnp closures shared by the Pallas kernels (rows = VMEM
    vectors) and the XLA fallback (rows = arrays)."""
    reg = cfg.registration
    cost_metric = reg.cost
    sx, sy, mx, my, w, r5, r6, r7 = rows

    def cgh(px, py, pt):
        """cost, g(3,), H(6 upper entries) at pose (px, py, pt)."""
        c, s = jnp.cos(pt), jnp.sin(pt)
        tx = c * sx - s * sy + px       # transformed source
        ty = s * sx + c * sy + py
        jx = -s * sx - c * sy           # d(tx)/dtheta
        jy = c * sx - s * sy            # d(ty)/dtheta
        dx = tx - mx
        dy = ty - my
        # separate reductions fuse better under XLA than a stacked (10, N)
        # buffer (measured: stacking cost ~20% end-to-end)
        if cost_metric == "P2L":
            e = dx * r5 + dy * r6
            ssq = e * e
            rho, drho = losses.rho(ssq, reg.loss, reg.loss_limit)
            wd = w * drho
            # J = [nx, ny, nx*jx + ny*jy]
            jt = r5 * jx + r6 * jy
            cost = 0.5 * jnp.sum(w * rho)
            g = (jnp.sum(wd * r5 * e), jnp.sum(wd * r6 * e),
                 jnp.sum(wd * jt * e))
            h = (jnp.sum(wd * r5 * r5), jnp.sum(wd * r5 * r6),
                 jnp.sum(wd * r5 * jt), jnp.sum(wd * r6 * r6),
                 jnp.sum(wd * r6 * jt), jnp.sum(wd * jt * jt))
        else:
            # residual = L @ [dx, dy]; L = [[l11, 0], [l21, l22]]
            e0 = r5 * dx
            e1 = r6 * dx + r7 * dy
            ssq = e0 * e0 + e1 * e1
            rho, drho = losses.rho(ssq, reg.loss, reg.loss_limit)
            wd = w * drho
            # J0 = [l11, 0, l11*jx]; J1 = [l21, l22, l21*jx + l22*jy]
            j0t = r5 * jx
            j1t = r6 * jx + r7 * jy
            cost = 0.5 * jnp.sum(w * rho)
            g = (jnp.sum(wd * (r5 * e0 + r6 * e1)), jnp.sum(wd * (r7 * e1)),
                 jnp.sum(wd * (j0t * e0 + j1t * e1)))
            h = (jnp.sum(wd * (r5 * r5 + r6 * r6)), jnp.sum(wd * (r6 * r7)),
                 jnp.sum(wd * (r5 * j0t + r6 * j1t)),
                 jnp.sum(wd * (r7 * r7)), jnp.sum(wd * (r7 * j1t)),
                 jnp.sum(wd * (j0t * j0t + j1t * j1t)))
        return cost, g, h

    def cost_only(px, py, pt):
        c, s = jnp.cos(pt), jnp.sin(pt)
        tx = c * sx - s * sy + px
        ty = s * sx + c * sy + py
        dx = tx - mx
        dy = ty - my
        if cost_metric == "P2L":
            e = dx * r5 + dy * r6
            ssq = e * e
        else:
            e0 = r5 * dx
            e1 = r6 * dx + r7 * dy
            ssq = e0 * e0 + e1 * e1
        rho, _ = losses.rho(ssq, reg.loss, reg.loss_limit)
        return 0.5 * jnp.sum(w * rho)

    def solve3(h, g):
        hxx, hxy, hxt, hyy, hyt, htt = h
        c00 = hyy * htt - hyt * hyt
        c01 = hxt * hyt - hxy * htt
        c02 = hxy * hyt - hxt * hyy
        c11 = hxx * htt - hxt * hxt
        c12 = hxy * hxt - hxx * hyt
        c22 = hxx * hyy - hxy * hxy
        det = hxx * c00 + hxy * c01 + hxt * c02
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        dx = (c00 * g[0] + c01 * g[1] + c02 * g[2]) * inv_det
        dy = (c01 * g[0] + c11 * g[1] + c12 * g[2]) * inv_det
        dt = (c02 * g[0] + c12 * g[1] + c22 * g[2]) * inv_det
        return dx, dy, dt

    def body(carry):
        (px, py, pt, cost, g, h, radius, dec, itr, steps, lastrel, done) = carry
        hxx, hxy, hxt, hyy, hyt, htt = h
        dxx = jnp.clip(hxx, 1e-6, 1e32) / radius
        dyy = jnp.clip(hyy, 1e-6, 1e32) / radius
        dtt = jnp.clip(htt, 1e-6, 1e32) / radius
        hlm = (hxx + dxx, hxy, hxt, hyy + dyy, hyt, htt + dtt)
        sx_, sy_, st_ = solve3(hlm, (-g[0], -g[1], -g[2]))
        npx, npy, npt = px + sx_, py + sy_, pt + st_
        new_cost = cost_only(npx, npy, npt)
        gd = g[0] * sx_ + g[1] * sy_ + g[2] * st_
        hd0 = hxx * sx_ + hxy * sy_ + hxt * st_
        hd1 = hxy * sx_ + hyy * sy_ + hyt * st_
        hd2 = hxt * sx_ + hyt * sy_ + htt * st_
        model_red = -(gd + 0.5 * (sx_ * hd0 + sy_ * hd1 + st_ * hd2))
        rel = (cost - new_cost) / jnp.maximum(model_red, 1e-30)
        accept = (rel > 1e-3) & jnp.isfinite(new_cost)
        shrink = 1.0 - (2.0 * rel - 1.0) ** 3
        r_ok = radius / jnp.maximum(jnp.maximum(shrink, 1.0 / 3.0), 1e-3)
        r_bad = radius / dec
        func_conv = jnp.abs(cost - new_cost) <= reg.function_tolerance * cost
        pred_conv = model_red <= reg.function_tolerance * cost
        stepn = jnp.sqrt(sx_ * sx_ + sy_ * sy_ + st_ * st_)
        posen = jnp.sqrt(px * px + py * py + pt * pt)
        step_small = stepn <= 1e-8 * (posen + 1e-8)
        new_done = (accept & func_conv) | pred_conv | step_small | (r_bad < 1e-32)
        spx = jnp.where(accept, npx, px)
        spy = jnp.where(accept, npy, py)
        spt = jnp.where(accept, npt, pt)
        cost2, g2, h2 = cgh(spx, spy, spt)
        cost2 = jnp.where(accept, cost2, cost)
        g2 = tuple(jnp.where(accept, a, b) for a, b in zip(g2, g))
        h2 = tuple(jnp.where(accept, a, b) for a, b in zip(h2, h))
        return (spx, spy, spt, cost2, g2, h2,
                jnp.where(accept, jnp.minimum(r_ok, 1e16), r_bad),
                jnp.where(accept, 2.0, dec * 2.0),
                itr + 1, steps + accept.astype(jnp.int32), rel, new_done)

    def cond(carry):
        itr, done = carry[8], carry[11]
        return jnp.logical_not(done) & (itr < reg.max_itr_solver)

    return cgh, body, cond


def _lm_core(rows, px0, py0, pt0, cfg: CFEARConfig, bounded: bool = False):
    """The trust-region LM loop over packed rows — pure jnp, shared by the
    Pallas kernel (rows = VMEM vectors) and the XLA fallback (rows = arrays).
    Returns (px, py, pt, cost, steps_f32, last_rel).

    `bounded=True` replaces the data-dependent `lax.while_loop` with a
    fixed-trip `lax.fori_loop` whose converged state is frozen by masking —
    identical results, but a STATIC loop the Mosaic/remote compiler
    handles inside a kernel (the while_loop variant stalls it when the
    kernel is embedded in lax.scan)."""
    reg = cfg.registration
    cgh, body, cond = _lm_funcs(rows, cfg)
    cost0, g0, h0 = cgh(px0, py0, pt0)
    init = (px0, py0, pt0, cost0, g0, h0,
            jnp.float32(1e4), jnp.float32(2.0),
            jnp.int32(0), jnp.int32(0), jnp.float32(jnp.inf),
            jnp.asarray(False))
    if bounded:
        def fbody(_, carry):
            new = body(carry)
            done = carry[11]
            return jax.tree.map(
                lambda c, n: jnp.where(done, c, n), carry, new)

        carry = jax.lax.fori_loop(0, reg.max_itr_solver, fbody, init)
        (px, py, pt, cost, g, h, radius, dec, itr, steps, lastrel, done) = carry
    elif reg.unroll_solver:
        # straight-line masked iterations: identical results to the while
        # loop (converged state is frozen), but no per-iteration loop sync
        # and no cross-lane lockstep under vmap
        carry = init
        for _ in range(reg.max_itr_solver):
            new = body(carry)
            done = carry[11]
            carry = jax.tree.map(
                lambda c, n: jnp.where(done, c, n), carry, new)
        (px, py, pt, cost, g, h, radius, dec, itr, steps, lastrel, done) = carry
    else:
        (px, py, pt, cost, g, h, radius, dec, itr, steps, lastrel, done) = \
            jax.lax.while_loop(cond, body, init)
    return px, py, pt, cost, steps.astype(jnp.float32), lastrel


def _lm_kernel(data_ref, init_ref, out_ref, *, cfg: CFEARConfig):
    rows = tuple(data_ref[i, :] for i in range(8))
    # bounded fori_loop: the in-kernel while_loop variant stalls the remote
    # compiler when this kernel sits inside a lax.scan'd step
    px, py, pt, cost, steps_f, lastrel = _lm_core(
        rows, init_ref[0, 0], init_ref[0, 1], init_ref[0, 2], cfg,
        bounded=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(lane == 0, px,
          jnp.where(lane == 1, py,
          jnp.where(lane == 2, pt,
          jnp.where(lane == 3, cost,
          jnp.where(lane == 4, steps_f,
          jnp.where(lane == 5, lastrel, 0.0))))))
    out_ref[:, :] = out


def _lm_kernel_ee(data_ref, init_ref, out_ref, st_ref, *, cfg: CFEARConfig):
    """Early-exit variant: the LM state lives in SMEM scalars and every
    iteration's full-block work is guarded by `pl.when(not done)` — a real
    jump, so a solve that converges after k steps pays k iterations plus
    (max_itr - k) scalar tests, instead of the masked fori variant's
    always-max_itr full-block passes (VERDICT r4 #6)."""
    reg = cfg.registration
    rows = tuple(data_ref[i, :] for i in range(8))
    cgh, body, _ = _lm_funcs(rows, cfg)
    cost0, g0, h0 = cgh(init_ref[0, 0], init_ref[0, 1], init_ref[0, 2])
    st_ref[0] = init_ref[0, 0]
    st_ref[1] = init_ref[0, 1]
    st_ref[2] = init_ref[0, 2]
    st_ref[3] = cost0
    for k in range(3):
        st_ref[4 + k] = g0[k]
    for k in range(6):
        st_ref[7 + k] = h0[k]
    st_ref[13] = jnp.float32(1e4)     # trust radius
    st_ref[14] = jnp.float32(2.0)     # decrease factor
    st_ref[15] = jnp.float32(0.0)     # itr
    st_ref[16] = jnp.float32(0.0)     # accepted steps
    st_ref[17] = jnp.float32(jnp.inf)  # last relative decrease
    st_ref[18] = jnp.float32(0.0)     # done flag

    def fbody(i, _):
        @pl.when(st_ref[18] == 0.0)
        def _():
            carry = (st_ref[0], st_ref[1], st_ref[2], st_ref[3],
                     (st_ref[4], st_ref[5], st_ref[6]),
                     (st_ref[7], st_ref[8], st_ref[9], st_ref[10],
                      st_ref[11], st_ref[12]),
                     st_ref[13], st_ref[14],
                     st_ref[15].astype(jnp.int32),
                     st_ref[16].astype(jnp.int32),
                     st_ref[17], st_ref[18] > 0.5)
            (px, py, pt, cost, g, h, radius, dec, itr, steps, lastrel,
             done) = body(carry)
            st_ref[0] = px
            st_ref[1] = py
            st_ref[2] = pt
            st_ref[3] = cost
            for k in range(3):
                st_ref[4 + k] = g[k]
            for k in range(6):
                st_ref[7 + k] = h[k]
            st_ref[13] = radius
            st_ref[14] = dec
            st_ref[15] = itr.astype(jnp.float32)
            st_ref[16] = steps.astype(jnp.float32)
            st_ref[17] = lastrel
            st_ref[18] = jnp.where(done, 1.0, 0.0)
        return 0

    jax.lax.fori_loop(0, reg.max_itr_solver, fbody, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(lane == 0, st_ref[0],
          jnp.where(lane == 1, st_ref[1],
          jnp.where(lane == 2, st_ref[2],
          jnp.where(lane == 3, st_ref[3],
          jnp.where(lane == 4, st_ref[16],
          jnp.where(lane == 5, st_ref[17], 0.0))))))
    out_ref[:, :] = out


def lm_solve_packed_xla(packed, pose0, cfg: CFEARConfig):
    """XLA (non-Pallas) execution of the same packed LM loop — far fewer
    kernel launches per iteration than the einsum formulation."""
    rows = tuple(packed[i] for i in range(8))
    p = pose0.astype(jnp.float32)
    px, py, pt, cost, steps_f, lastrel = _lm_core(rows, p[0], p[1], p[2], cfg)
    pose = jnp.stack([px, py, pt]).astype(pose0.dtype)
    return pose, cost, steps_f.astype(jnp.int32), lastrel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret",
                                             "early_exit"))
def lm_solve_fused(packed, pose0, cfg: CFEARConfig, interpret: bool = False,
                   early_exit: bool = True):
    """Run the fused LM solve. Returns (pose (3,), cost, steps, last_rel).

    `early_exit=True` uses the SMEM-state kernel whose iterations are
    skipped with a real jump once converged; False keeps the masked
    always-max_itr fori variant (ablation)."""
    init = jnp.zeros((1, 128), jnp.float32).at[0, :3].set(
        pose0.astype(jnp.float32))
    if early_exit:
        out = pl.pallas_call(
            functools.partial(_lm_kernel_ee, cfg=cfg),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((32,), jnp.float32)],
            interpret=interpret,
        )(packed.astype(jnp.float32), init)
    else:
        out = pl.pallas_call(
            functools.partial(_lm_kernel, cfg=cfg),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(packed.astype(jnp.float32), init)
    pose = out[0, :3].astype(pose0.dtype)
    return pose, out[0, 3], out[0, 4].astype(jnp.int32), out[0, 5]
