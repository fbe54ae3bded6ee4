"""Micro-profile of feature-stage 'finish' alternatives.

The phase profile shows the device-side (B, ~13-16k) argsorts are the
single most expensive primitives in the batched feature stage (~2 ms net
at batch 8 for argsort+take over (8, 16000)). The final cell compaction
(top `max_cells` by nsamples among valid cells) currently pays one such
argsort over (B, ncells). Candidates measured here:

  argsort      : current — argsort(-key) + take m
  topk         : lax.top_k(key, m) + take
  compact2     : occupied-mask cumsum -> scatter ranks -> (B, C) compact,
                 then argsort over (B, C=4096) + take  (exact while
                 #occupied <= C; occupancy is ~920-1600 at Oxford scale)
  rollcombine  : the 9-offset roll+moment-shift loop (for reference)
  conv_combine : same contraction as one lax.conv (3x3, 63->7 channels)

Timing via host transfer; ~0.6-1.0 ms dispatch overhead included.
"""

import argparse
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
    ap.add_argument("--ncells", type=int, default=13456)
    ap.add_argument("--dim", type=int, default=116)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--cand", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp

    b, nc, m, C, dim = (args.batch, args.ncells, args.m, args.cand, args.dim)
    rng = np.random.default_rng(0)
    # ~1500 occupied cells per lane, like the Oxford occupancy
    nsamp = np.where(rng.random((b, nc)) < 1500 / nc,
                     rng.random((b, nc)).astype(np.float32) * 40, 0.0)
    ok = jnp.asarray(nsamp > 0)
    nsamp = jnp.asarray(nsamp)
    vals = jnp.asarray(rng.normal(size=(b, nc, 6)).astype(np.float32))
    print(f"backend={jax.default_backend()} B={b} ncells={nc} m={m} C={C}")

    @jax.jit
    def argsort_take(nsamp, ok, vals):
        order = jnp.argsort(-jnp.where(ok, nsamp + 1.0, 0.0), axis=-1)
        take = order[..., :m]
        return jnp.take_along_axis(vals, take[..., None], axis=1), \
            jnp.take_along_axis(ok, take, axis=1)

    t = timeit(argsort_take, (nsamp, ok, vals), args.iters)
    print(f"argsort+take            {t:8.3f} ms")

    @jax.jit
    def topk_take(nsamp, ok, vals):
        _, take = jax.lax.top_k(jnp.where(ok, nsamp + 1.0, 0.0), m)
        return jnp.take_along_axis(vals, take[..., None], axis=1), \
            jnp.take_along_axis(ok, take, axis=1)

    t = timeit(topk_take, (nsamp, ok, vals), args.iters)
    print(f"top_k+take              {t:8.3f} ms")

    @jax.jit
    def compact2(nsamp, ok, vals):
        # stage A: mask-compact occupied cells to (B, C) with cumsum+scatter
        rank = jnp.cumsum(ok.astype(jnp.int32), axis=-1) - 1
        lane = jnp.arange(b, dtype=jnp.int32)[:, None]
        dest = jnp.where(ok & (rank < C), lane * C + rank, b * C)
        flat_dest = dest.reshape(b * nc)
        cn = jnp.zeros((b * C + 1,), nsamp.dtype).at[flat_dest].set(
            nsamp.reshape(b * nc), mode="drop")[:b * C].reshape(b, C)
        cv = jnp.zeros((b * C + 1, vals.shape[-1]), vals.dtype).at[
            flat_dest].set(vals.reshape(b * nc, -1), mode="drop")[
                :b * C].reshape(b, C, -1)
        cok = jnp.zeros((b * C + 1,), bool).at[flat_dest].set(
            ok.reshape(b * nc), mode="drop")[:b * C].reshape(b, C)
        # stage B: small argsort over (B, C)
        order = jnp.argsort(-jnp.where(cok, cn + 1.0, 0.0), axis=-1)
        take = order[..., :m]
        return jnp.take_along_axis(cv, take[..., None], axis=1), \
            jnp.take_along_axis(cok, take, axis=1)

    t = timeit(compact2, (nsamp, ok, vals), args.iters)
    print(f"compact2(scatter+sort)  {t:8.3f} ms")

    # equivalence: same multiset of selected rows when #occupied <= C
    a1, o1 = jax.tree.map(np.asarray, argsort_take(nsamp, ok, vals))
    a2, o2 = jax.tree.map(np.asarray, compact2(nsamp, ok, vals))
    s1 = {tuple(r) for r in a1[o1]}
    s2 = {tuple(r) for r in a2[o2]}
    print(f"  compact2 same selected set: {s1 == s2}")

    # ---- roll-combine vs conv ------------------------------------------
    offsets = [(dx, dy) for dx in range(-1, 2) for dy in range(-1, 2)]
    leaf = 3.0
    acc_own = jnp.asarray(
        rng.normal(size=(b, dim, dim, 9, 7)).astype(np.float32))

    @jax.jit
    def rollcombine(acc_own):
        acc = jnp.zeros((b, dim, dim, 7), jnp.float32)
        for oi, (dx, dy) in enumerate(offsets):
            g = jnp.roll(acc_own[..., oi, :], (dx, dy), (1, 2))
            dxl, dyl = dx * leaf, dy * leaf
            cnt, s0_, s1x, s1y, sxx, sxy, syy = [g[..., i] for i in range(7)]
            acc = acc + jnp.stack(
                [cnt, s0_, s1x - dxl * s0_, s1y - dyl * s0_,
                 sxx - 2.0 * dxl * s1x + dxl * dxl * s0_,
                 sxy - dxl * s1y - dyl * s1x + dxl * dyl * s0_,
                 syy - 2.0 * dyl * s1y + dyl * dyl * s0_], -1)
        return acc

    t = timeit(rollcombine, (acc_own,), args.iters)
    print(f"rollcombine(9 rolls)    {t:8.3f} ms")

    # conv formulation: kernel (3, 3, 63, 7) built from the same moment
    # shift; wrap-around semantics differ at the border only for rolls
    # (the production border is masked dead cells, so both agree there)
    kern = np.zeros((3, 3, 9, 7, 7), np.float32)
    for oi, (dx, dy) in enumerate(offsets):
        sh = np.eye(7, dtype=np.float32)
        dxl, dyl = dx * leaf, dy * leaf
        sh[1, 2] = 0.0
        shift = np.eye(7, dtype=np.float32)
        # rows: out moments; cols: in moments (cnt,s0,s1x,s1y,sxx,sxy,syy)
        shift[2, 1] = -dxl
        shift[3, 1] = -dyl
        shift[4, 1] = dxl * dxl
        shift[4, 2] = -2.0 * dxl
        shift[5, 1] = dxl * dyl
        shift[5, 2] = -dyl
        shift[5, 3] = -dxl
        shift[6, 1] = dyl * dyl
        shift[6, 3] = -2.0 * dyl
        # roll by (dx, dy) == conv tap at (-dx, -dy) relative to center
        kern[1 - dx, 1 - dy, oi] = shift
    kern = jnp.asarray(kern.reshape(3, 3, 63, 7))

    @jax.jit
    def conv_combine(acc_own):
        x = acc_own.reshape(b, dim, dim, 63)
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = timeit(conv_combine, (acc_own,), args.iters)
    print(f"conv_combine(3x3 conv)  {t:8.3f} ms")
    r1 = np.asarray(rollcombine(acc_own))
    r2 = np.asarray(conv_combine(acc_own))
    inner = np.abs(r1[:, 1:-1, 1:-1] - r2[:, 1:-1, 1:-1]).max()
    print(f"  conv == rolls (interior): max abs diff {inner:.2e}")


if __name__ == "__main__":
    main()
