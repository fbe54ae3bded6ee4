"""Micro-profile of batched association strategies.

Measured verdicts (TPU v5e, recorded in CLAUDE.md):
 - kernel variants tie (grid-step overhead is ~1-2 us, NOT dominant):
   at B8/S16/M2048 nn_cur 3.37 / nn_fat 3.46 / nn_unrolled 3.22 ms —
   the dense association is VPU-compute-bound; only WORK REDUCTION
   (nn_min_sparse bounding-box tile skipping) beats it
 - gathers: flat (collapsed keyframe axis) beats per-kf vmap at small S
   (0.65 vs 0.88 ms, B8/S4); the MXU one-hot contraction wins at large S
   (2.08 vs 3.90 ms, B8/S16) — gathers are row-rate-bound in B*S*M

  nn_cur      : pallas_assoc.nn_min vmapped over B
  nn_fat      : nn_min_multi (in-kernel fori loop over keyframes)
  nn_unrolled : nn_min_multi_unrolled (static keyframe loop, ts=256;
                ts=512 OOMs scoped VMEM at S=16)
  gather_vmap : per-(lane, kf) attribute gather (vmap of vmap)
  gather_flat : ONE lane-offset flat gather of (B*S*M) rows
  gather_onehot: one-hot(nn) @ attrs on the MXU

Timing via host transfer; ~0.6-1.0 ms dispatch overhead included.
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
    ap.add_argument("--s", type=int, default=4, help="keyframes")
    ap.add_argument("--m", type=int, default=2048, help="cell budget")
    ap.add_argument("--d", type=int, default=8, help="attr columns")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--ts", type=int, default=256)
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc

    b, s, m, d = args.batch, args.s, args.m, args.d
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(b, m, 2)).astype(np.float32) * 50)
    tar = jnp.asarray(rng.normal(size=(b, s, m, 2)).astype(np.float32) * 50)
    tvalid = jnp.asarray(rng.random((b, s, m)) < 0.7)
    attrs = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    nn = jnp.asarray(rng.integers(0, m, size=(b, s, m)).astype(np.int32))
    interp = jax.default_backend() == "cpu"
    print(f"backend={jax.default_backend()} B={b} S={s} M={m} D={d}")

    @jax.jit
    def nn_cur(src, tar, tvalid):
        return jax.vmap(lambda a, b_, c: pallas_assoc.nn_min(
            a, b_, c, interpret=interp))(src, tar, tvalid)

    t = timeit(nn_cur, (src, tar, tvalid), args.iters)
    print(f"nn_cur(vmap 256-tiles)  {t:8.3f} ms")

    if hasattr(pallas_assoc, "nn_min_multi"):
        @jax.jit
        def nn_fat(src, tar, tvalid):
            return jax.vmap(lambda a, b_, c: pallas_assoc.nn_min_multi(
                a, b_, c, interpret=interp))(src, tar, tvalid)

        t = timeit(nn_fat, (src, tar, tvalid), args.iters)
        print(f"nn_fat(in-kernel S)     {t:8.3f} ms")
        o1 = jax.tree.map(np.asarray, nn_cur(src, tar, tvalid))
        o2 = jax.tree.map(np.asarray, nn_fat(src, tar, tvalid))
        print(f"  match: nn={np.array_equal(o1[0], o2[0])} "
              f"d2={np.allclose(o1[1], o2[1], rtol=0, atol=0)}")

    if hasattr(pallas_assoc, "nn_min_multi_unrolled"):
        @jax.jit
        def nn_unr(src, tar, tvalid):
            return jax.vmap(
                lambda a, b_, c: pallas_assoc.nn_min_multi_unrolled(
                    a, b_, c, interpret=interp, ts=256))(src, tar, tvalid)

        t = timeit(nn_unr, (src, tar, tvalid), args.iters)
        print(f"nn_unrolled(static S)   {t:8.3f} ms")
        o1 = jax.tree.map(np.asarray, nn_cur(src, tar, tvalid))
        o3 = jax.tree.map(np.asarray, nn_unr(src, tar, tvalid))
        print(f"  match: nn={np.array_equal(o1[0], o3[0])} "
              f"d2={np.allclose(o1[1], o3[1], rtol=0, atol=0)}")

    @jax.jit
    def gather_vmap(attrs, nn):
        return jax.vmap(jax.vmap(lambda a, i: a[i]))(attrs, nn)

    t = timeit(gather_vmap, (attrs, nn), args.iters)
    print(f"gather_vmap             {t:8.3f} ms")

    @jax.jit
    def gather_flat(attrs, nn):
        flat = attrs.reshape(b * s * m, d)
        base = (jnp.arange(b * s, dtype=jnp.int32) * m).reshape(b, s, 1)
        idx = (nn + base).reshape(b * s * m)
        return flat[idx].reshape(b, s, m, d)

    t = timeit(gather_flat, (attrs, nn), args.iters)
    print(f"gather_flat             {t:8.3f} ms")
    g1 = np.asarray(gather_vmap(attrs, nn))
    g2 = np.asarray(gather_flat(attrs, nn))
    print(f"  match: {np.array_equal(g1, g2)}")

    @jax.jit
    def gather_onehot(attrs, nn):
        # MXU path: one-hot(nn) @ attrs per (lane, kf)
        oh = (nn[..., None] == jnp.arange(m, dtype=jnp.int32)).astype(
            jnp.float32)
        return jnp.einsum("bsnm,bsmd->bsnd", oh, attrs,
                          preferred_element_type=jnp.float32)

    t = timeit(gather_onehot, (attrs, nn), args.iters)
    print(f"gather_onehot(MXU)      {t:8.3f} ms")


if __name__ == "__main__":
    main()
