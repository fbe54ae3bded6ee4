import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cfear_radarodometry_code_public_tpu.config import preset
from cfear_radarodometry_code_public_tpu.ops import features, losses, registration
from cfear_radarodometry_code_public_tpu.ops.filtering import PointCloud
from cfear_radarodometry_code_public_tpu.utils import se2


def _cfg(cost="P2L", loss="Huber", weight_opt="Combined", soft=False,
         max_cells=256):
    cfg = preset("CFEAR-3", dataset="synthetic")
    feat = dataclasses.replace(cfg.feature, res=3.0, max_cells=max_cells)
    reg = dataclasses.replace(cfg.registration, cost=cost, loss=loss,
                              weight_opt=weight_opt, soft_constraint=soft)
    radar = dataclasses.replace(cfg.radar, max_distance=80.0)
    return cfg.replace(feature=feat, registration=reg, radar=radar)


def _world_cloud(rng, n=800):
    """Structured world: points along several walls (gives useful normals)."""
    pts = []
    for _ in range(10):
        p0 = rng.uniform(-50, 50, 2)
        ang = rng.uniform(0, 2 * np.pi)
        t = np.linspace(0, rng.uniform(15, 40), 80)
        wall = p0 + np.stack([np.cos(ang) * t, np.sin(ang) * t], -1)
        pts.append(wall + rng.normal(0, 0.08, wall.shape))
    xy = np.concatenate(pts)[:n]
    intens = rng.uniform(100, 220, len(xy))
    return xy, intens


def _cells_from_world(xy, intens, pose_xyt, cfg, budget=2048):
    """Observe world points from a sensor pose -> local cells."""
    inv = np.asarray(se2.inverse(jnp.asarray(pose_xyt, jnp.float32)))
    c, s = np.cos(inv[2]), np.sin(inv[2])
    local = xy @ np.array([[c, s], [-s, c]]) + inv[:2]
    keep = np.linalg.norm(local, axis=1) < 75.0
    local, w = local[keep], intens[keep]
    n = len(local)
    pad = budget - n
    pc = PointCloud(
        xy=jnp.asarray(np.concatenate([local, np.zeros((pad, 2))]),
                       jnp.float32),
        intensity=jnp.asarray(np.concatenate([w, np.zeros(pad)]), jnp.float32),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool),
                                          np.zeros(pad, bool)])),
        peak=jnp.asarray(np.concatenate([np.ones(n, bool),
                                         np.zeros(pad, bool)])),
    )
    return features.compute_cells(pc, cfg)


def _stack_keyframes(cells_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cells_list)


def _register_case(cost, loss, weight_opt, true_pose, guess_offset,
                   soft=False, n_kf=2):
    rng = np.random.default_rng(42)
    cfg = _cfg(cost, loss, weight_opt, soft)
    xy, intens = _world_cloud(rng)
    kf_poses_np = [np.zeros(3)]
    if n_kf > 1:
        kf_poses_np.append(np.array([1.5, 0.3, 0.04]))
    kf_cells = _stack_keyframes(
        [_cells_from_world(xy, intens, p, cfg) for p in kf_poses_np])
    kf_poses = jnp.asarray(np.stack(kf_poses_np), jnp.float32)
    kf_valid = jnp.ones(len(kf_poses_np), bool)
    src = _cells_from_world(xy, intens, true_pose, cfg)
    guess = jnp.asarray(true_pose + guess_offset, jnp.float32)
    res = registration.register(kf_cells, kf_poses, kf_valid, src, guess,
                                cfg=cfg)
    return res, true_pose


def test_recovers_known_transform_p2l():
    true = np.array([3.0, 1.0, 0.08])
    res, _ = _register_case("P2L", "Huber", "Combined", true,
                            np.array([0.4, -0.3, 0.03]))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.pose), true, atol=0.03)


def test_recovers_known_transform_p2p():
    true = np.array([2.0, -1.5, -0.05])
    res, _ = _register_case("P2P", "Huber", "Uniform", true,
                            np.array([-0.5, 0.2, -0.02]))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.pose), true, atol=0.03)


def test_recovers_known_transform_p2d():
    true = np.array([1.0, 2.0, 0.03])
    res, _ = _register_case("P2D", "Huber", "Combined", true,
                            np.array([0.3, 0.3, 0.02]))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.pose), true, atol=0.05)


def test_all_losses_converge():
    true = np.array([1.0, 0.5, 0.02])
    for loss in ("None", "Huber", "Cauchy", "SoftLOne", "Tukey", "Combined"):
        res, _ = _register_case("P2L", loss, "Uniform", true,
                                np.array([0.2, -0.2, 0.01]))
        assert bool(res.success), loss
        np.testing.assert_allclose(np.asarray(res.pose), true, atol=0.05,
                                   err_msg=loss)


def test_soft_constraint_pulls_to_guess():
    # with a very tight prior the solution must stay near the guess
    true = np.array([1.0, 0.0, 0.0])
    rng = np.random.default_rng(1)
    cfg = _cfg("P2L", soft=True)
    xy, intens = _world_cloud(rng)
    kf_cells = _stack_keyframes(
        [_cells_from_world(xy, intens, np.zeros(3), cfg)])
    src = _cells_from_world(xy, intens, true, cfg)
    guess = jnp.asarray([1.3, 0.2, 0.01], jnp.float32)
    tight = jnp.eye(3) * 1e-8
    res = registration.register(kf_cells, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                src, guess, reg_cov_guess=tight, cfg=cfg)
    assert np.linalg.norm(np.asarray(res.pose) - np.asarray(guess)) < 0.05


def test_no_valid_targets_fails_gracefully():
    cfg = _cfg("P2L")
    rng = np.random.default_rng(2)
    xy, intens = _world_cloud(rng)
    src = _cells_from_world(xy, intens, np.zeros(3), cfg)
    empty = jax.tree.map(lambda a: jnp.zeros_like(a[None]), src)
    res = registration.register(empty, jnp.zeros((1, 3)),
                                jnp.zeros(1, bool), src,
                                jnp.zeros(3, jnp.float32), cfg=cfg)
    assert not bool(res.success)
    assert np.isfinite(np.asarray(res.pose)).all()


def test_covariance_sane():
    true = np.array([2.0, 1.0, 0.05])
    res, _ = _register_case("P2L", "Huber", "Combined", true,
                            np.array([0.2, 0.2, 0.01]))
    cov = np.asarray(res.cov)
    assert np.all(np.linalg.eigvalsh(cov) > 0)
    assert np.all(np.diag(cov) < 1.0)       # well-constrained problem


def test_loss_functions_ceres_semantics():
    s = jnp.asarray([0.0025, 0.25, 4.0])
    # Huber(0.1): s <= 0.01 -> s ; else 2*0.1*sqrt(s) - 0.01
    r, dr = losses.rho(s, "Huber", 0.1)
    np.testing.assert_allclose(np.asarray(r),
                               [0.0025, 2 * 0.1 * 0.5 - 0.01,
                                2 * 0.1 * 2 - 0.01], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dr), [1.0, 0.1 / 0.5, 0.1 / 2.0],
                               rtol=1e-6)
    # Cauchy(1): rho = log(1+s)
    r, dr = losses.rho(s, "Cauchy", 1.0)
    np.testing.assert_allclose(np.asarray(r), np.log1p([0.0025, 0.25, 4.0]),
                               rtol=1e-6)


def test_weight_options():
    w = losses.association_weight("Sim_N", jnp.asarray(10.0), jnp.asarray(30.0),
                                  jnp.asarray(0.9), jnp.asarray(1.0),
                                  jnp.asarray(2.0))
    np.testing.assert_allclose(float(w), 2 * 10 / 40, rtol=1e-6)
    w = losses.association_weight("Combined", jnp.asarray(10.0),
                                  jnp.asarray(10.0), jnp.asarray(0.9),
                                  jnp.asarray(1.0), jnp.asarray(1.0))
    np.testing.assert_allclose(float(w), 1.0 + 0.9 + 1.0, rtol=1e-6)


def test_association_exact_nn():
    cfg = _cfg("P2L")
    rng = np.random.default_rng(3)
    xy, intens = _world_cloud(rng)
    cells = _cells_from_world(xy, intens, np.zeros(3), cfg)
    kf = _stack_keyframes([cells])
    assoc = registration.associate(kf, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                   cells, jnp.zeros(3), 2.0, cfg)
    # identity transform: every valid cell must associate with itself
    valid = np.asarray(cells.valid)
    tar = np.asarray(assoc.tar_idx[0])
    ok = np.asarray(assoc.valid[0])
    idx = np.where(valid)[0]
    assert ok[idx].all()
    np.testing.assert_array_equal(tar[idx], idx)


def test_grid_association_matches_dense():
    rng = np.random.default_rng(7)
    cfg_g = _cfg("P2L")
    cfg_d = cfg_g.replace(registration=dataclasses.replace(
        cfg_g.registration, assoc_method="dense"))
    xy, intens = _world_cloud(rng)
    cells = _cells_from_world(xy, intens, np.zeros(3), cfg_g)
    kf = _stack_keyframes([cells])
    src = _cells_from_world(xy, intens, np.array([1.2, 0.7, 0.05]), cfg_g)
    pose = jnp.asarray([1.2, 0.7, 0.05], jnp.float32)
    for radius in (2.0, 4.0):
        a_g = registration.associate(kf, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                     src, pose, radius, cfg_g)
        a_d = registration.associate(kf, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                     src, pose, radius, cfg_d)
        np.testing.assert_array_equal(np.asarray(a_g.valid),
                                      np.asarray(a_d.valid))
        vg = np.asarray(a_g.valid[0])
        np.testing.assert_array_equal(np.asarray(a_g.tar_idx[0])[vg],
                                      np.asarray(a_d.tar_idx[0])[vg])
        np.testing.assert_allclose(np.asarray(a_g.weight), np.asarray(a_d.weight),
                                   atol=1e-6)


def test_grid_register_matches_dense():
    rng = np.random.default_rng(8)
    cfg_g = _cfg("P2P")
    cfg_d = cfg_g.replace(registration=dataclasses.replace(
        cfg_g.registration, assoc_method="dense"))
    xy, intens = _world_cloud(rng)
    cells = _cells_from_world(xy, intens, np.zeros(3), cfg_g)
    kf = _stack_keyframes([cells])
    src = _cells_from_world(xy, intens, np.array([2.0, -0.5, 0.03]), cfg_g)
    guess = jnp.asarray([2.2, -0.3, 0.02], jnp.float32)
    rg = registration.register(kf, jnp.zeros((1, 3)), jnp.ones(1, bool), src,
                               guess, cfg=cfg_g)
    rd = registration.register(kf, jnp.zeros((1, 3)), jnp.ones(1, bool), src,
                               guess, cfg=cfg_d)
    np.testing.assert_allclose(np.asarray(rg.pose), np.asarray(rd.pose),
                               atol=1e-5)


def test_many_to_many_refinement():
    rng = np.random.default_rng(11)
    cfg = _cfg("P2L")
    xy, intens = _world_cloud(rng)
    true_poses = np.array([[0.0, 0.0, 0.0],
                           [2.0, 0.5, 0.05],
                           [4.0, 1.0, 0.10]])
    cells = _stack_keyframes(
        [_cells_from_world(xy, intens, p, cfg) for p in true_poses])
    noisy = true_poses + np.array([[0, 0, 0],
                                   [0.3, -0.2, 0.02],
                                   [-0.25, 0.3, -0.03]])
    refined = registration.refine_many_to_many(
        cells, jnp.asarray(noisy, jnp.float32), jnp.ones(3, bool), cfg)
    refined = np.asarray(refined)
    np.testing.assert_allclose(refined[0], true_poses[0], atol=1e-6)  # fixed
    np.testing.assert_allclose(refined[1:], true_poses[1:], atol=0.05)
    # must beat the initialization
    assert (np.linalg.norm(refined[1:, :2] - true_poses[1:, :2], axis=1)
            < np.linalg.norm(noisy[1:, :2] - true_poses[1:, :2], axis=1)).all()


def test_divergence_reported_as_failure():
    """VERDICT r2 weakness #6: a solver that silently follows the guess
    (all associations collapsed — e.g. a guess far outside the association
    radius, or Tukey zeroing every residual) must report success=False so
    the fuser counts a registration failure and falls back to the motion
    model (`odometrykeyframefuser.cpp:190-199` failure-as-outcome)."""
    rng = np.random.default_rng(15)
    cfg = _cfg("P2P")
    xy, intens = _world_cloud(rng)
    cells = _cells_from_world(xy, intens, np.zeros(3), cfg)
    kf = _stack_keyframes([cells])
    src = _cells_from_world(xy, intens, np.array([1.0, 0.0, 0.0]), cfg)

    good = registration.register(kf, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                 src, jnp.asarray([1.1, 0.1, 0.0]), cfg=cfg)
    assert bool(good.success)

    # a guess hundreds of meters off: nothing associates within the radius
    bad = registration.register(kf, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                src, jnp.asarray([500.0, 0.0, 0.0]),
                                cfg=cfg)
    assert not bool(bad.success)
    assert int(bad.num_assoc) < 0.02 * int(jnp.sum(src.valid))

    # the max_score ceiling alone also trips the gate
    cfg_ceiling = cfg.replace(registration=dataclasses.replace(
        cfg.registration, min_assoc_fraction=0.0, max_score=1e-9))
    capped = registration.register(kf, jnp.zeros((1, 3)), jnp.ones(1, bool),
                                   src, jnp.asarray([1.1, 0.1, 0.0]),
                                   cfg=cfg_ceiling)
    assert not bool(capped.success)


def test_max_active_keyframes_equivalence():
    """`max_active_keyframes` K-nearest gating must be EXACT when every
    overlapping keyframe is among the K nearest: distant keyframes (here
    300 m away, observing a different part of the world) contribute zero
    associations, so dropping them from the (S, M, M) work changes nothing."""
    rng = np.random.default_rng(14)
    cfg_all = _cfg("P2P")
    cfg_gate = cfg_all.replace(registration=dataclasses.replace(
        cfg_all.registration, max_active_keyframes=4))
    xy, intens = _world_cloud(rng)
    far_xy = xy + np.array([300.0, 0.0])      # a different, distant scene

    near_poses = np.array([[0.0, 0.0, 0.0], [2.0, 0.3, 0.02],
                           [4.0, 0.6, 0.04], [6.0, 0.9, 0.06]])
    far_poses = np.array([[300.0, 0.0, 0.0], [302.0, 0.3, 0.02],
                          [304.0, 0.6, 0.04], [306.0, 0.9, 0.06]])
    kf_list = [_cells_from_world(xy, intens, p, cfg_all) for p in near_poses]
    kf_list += [_cells_from_world(far_xy, intens, p, cfg_all)
                for p in far_poses]
    kf = _stack_keyframes(kf_list)
    kf_poses = jnp.asarray(np.concatenate([near_poses, far_poses]),
                           jnp.float32)
    kf_valid = jnp.ones(8, bool)
    src = _cells_from_world(xy, intens, np.array([7.0, 1.0, 0.07]), cfg_all)
    guess = jnp.asarray([7.2, 0.8, 0.06], jnp.float32)

    r_all = registration.register(kf, kf_poses, kf_valid, src, guess,
                                  cfg=cfg_all)
    r_gate = registration.register(kf, kf_poses, kf_valid, src, guess,
                                   cfg=cfg_gate)
    assert bool(r_all.success) and bool(r_gate.success)
    assert int(r_all.num_assoc) == int(r_gate.num_assoc)
    np.testing.assert_allclose(np.asarray(r_gate.pose),
                               np.asarray(r_all.pose), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_gate.cov),
                               np.asarray(r_all.cov), rtol=1e-4, atol=1e-9)


def test_many_to_many_refinement_s50_scale():
    """s50-window joint refinement (`registration.h:48` at the flagship
    submap size): 50 scans, nearest-8 pairing, fori-loop GN/CG — must
    compile + run as one program in well under a minute (the Python-unrolled
    S^2 formulation took 74 s at S=3) and improve every perturbed pose."""
    import time

    rng = np.random.default_rng(13)
    cfg = _cfg("P2L")
    xy, intens = _world_cloud(rng, n=600)
    s = 50
    true_poses = np.zeros((s, 3))
    for i in range(1, s):
        true_poses[i] = true_poses[i - 1] + [1.5, 0.1 * np.sin(i / 5), 0.01]
    cells = _stack_keyframes(
        [_cells_from_world(xy, intens, p, cfg, budget=1024)
         for p in true_poses])
    noise = rng.normal(0, 1, (s, 3)) * np.array([0.15, 0.15, 0.015])
    noise[0] = 0
    noisy = true_poses + noise
    t0 = time.time()
    refined = np.asarray(registration.refine_many_to_many(
        cells, jnp.asarray(noisy, jnp.float32), jnp.ones(s, bool), cfg,
        outer_iters=3, gn_iters=6, cg_iters=24))
    elapsed = time.time() - t0
    assert elapsed < 120.0, f"s50 refinement took {elapsed:.0f}s"
    err_in = np.linalg.norm(noisy[1:, :2] - true_poses[1:, :2], axis=1)
    err_out = np.linalg.norm(refined[1:, :2] - true_poses[1:, :2], axis=1)
    np.testing.assert_allclose(refined[0], true_poses[0], atol=1e-6)
    # mean error must drop substantially (only pose 0 is gauge-fixed, so
    # residual error includes global gauge drift of the whole 75 m chain)
    assert np.mean(err_out) < 0.5 * np.mean(err_in), (err_out.mean(),
                                                      err_in.mean())


def test_consistency_gate_and_service():
    cfg = _cfg("P2L")
    rng = np.random.default_rng(12)
    xy, intens = _world_cloud(rng)
    poses = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    scans = _stack_keyframes(
        [_cells_from_world(xy, intens, p, cfg) for p in poses])
    res, ok = registration.register_scans_service(
        scans, jnp.asarray(poses, jnp.float32), cfg)
    assert bool(ok)
    # consistency rejects a wildly different result
    assert not bool(registration.is_consistent(
        jnp.asarray([5.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 0.0])))


def test_pallas_assoc_backend_matches_dense():
    """The fused Pallas association kernel (interpreter mode on CPU) must
    produce identical registrations to the dense XLA backend."""
    rng = np.random.default_rng(7)
    true = np.array([2.5, 0.8, 0.06])
    xy, intens = _world_cloud(rng)
    results = {}
    for method in ("dense", "pallas"):
        cfg = _cfg("P2L", "Huber", "Combined")
        cfg = cfg.replace(registration=dataclasses.replace(
            cfg.registration, assoc_method=method))
        kf_poses_np = [np.zeros(3), np.array([1.5, 0.3, 0.04])]
        kf_cells = _stack_keyframes(
            [_cells_from_world(xy, intens, p, cfg) for p in kf_poses_np])
        kf_poses = jnp.asarray(np.stack(kf_poses_np), jnp.float32)
        kf_valid = jnp.ones(2, bool)
        src = _cells_from_world(xy, intens, true, cfg)
        guess = jnp.asarray(true + np.array([0.3, -0.2, 0.02]), jnp.float32)
        results[method] = registration.register(
            kf_cells, kf_poses, kf_valid, src, guess, cfg=cfg)
    assert bool(results["pallas"].success)
    np.testing.assert_allclose(np.asarray(results["dense"].pose),
                               np.asarray(results["pallas"].pose), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(results["dense"].num_assoc),
                                  np.asarray(results["pallas"].num_assoc))


def test_nn_kernel_variants_match():
    """All Pallas 1-NN kernel variants (256-tile, fat 512-tile, in-kernel
    keyframe loop) return identical (nn, d2) to a numpy argmin reference,
    including the lowest-index tie-break and all-invalid keyframes."""
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc

    rng = np.random.default_rng(3)
    s, m = 3, 512
    src = rng.normal(size=(m, 2)).astype(np.float32) * 40
    tar = rng.normal(size=(s, m, 2)).astype(np.float32) * 40
    tar[1, 10] = tar[1, 20]                    # exact duplicate -> tie
    src[5] = tar[1, 10]
    valid = rng.random((s, m)) < 0.8
    valid[2] = False                           # keyframe with no targets
    d2 = np.sum((src[None, :, None, :] - tar[:, None, :, :]) ** 2, -1)
    d2 = np.where(valid[:, None, :], d2, np.inf)
    ref_nn = np.argmin(d2, axis=2)
    ref_d2 = np.min(d2, axis=2)
    for name, fn in [
        ("ts256", lambda: pallas_assoc.nn_min(
            jnp.asarray(src), jnp.asarray(tar), jnp.asarray(valid),
            interpret=True, ts=256)),
        ("ts512", lambda: pallas_assoc.nn_min(
            jnp.asarray(src), jnp.asarray(tar), jnp.asarray(valid),
            interpret=True, ts=512)),
        ("multi", lambda: pallas_assoc.nn_min_multi(
            jnp.asarray(src), jnp.asarray(tar), jnp.asarray(valid),
            interpret=True)),
        ("unrolled", lambda: pallas_assoc.nn_min_multi_unrolled(
            jnp.asarray(src), jnp.asarray(tar), jnp.asarray(valid),
            interpret=True)),
    ]:
        nn, dd = fn()
        np.testing.assert_array_equal(np.asarray(nn), ref_nn, err_msg=name)
        # d2 agrees to f32 ulp (numpy's summation order differs)
        np.testing.assert_allclose(np.asarray(dd), ref_d2, rtol=1e-5,
                                   err_msg=name)


def test_sparse_assoc_kernel_matches_dense():
    """The block-sparse 1-NN kernel (bounding-box tile skipping) must agree
    with the dense kernel on every row whose true 1-NN lies within the
    association radius, and report d2 >= radius^2 elsewhere."""
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc as pa

    rng = np.random.default_rng(1)
    s, m, msrc, ts, radius = 4, 1024, 512, 256, 5.0
    src = rng.normal(size=(msrc, 2)).astype(np.float32) * 60
    src = src[np.argsort(src[:, 0], kind="stable")]      # spatially ordered
    tar = rng.normal(size=(s, m, 2)).astype(np.float32) * 60
    for k in range(s):
        tar[k] = tar[k][np.argsort(tar[k][:, 0], kind="stable")]
    tv = rng.random((s, m)) < 0.8
    tv[2] = False                                        # empty keyframe
    sb = pa.tile_bounds(jnp.asarray(src), jnp.ones((msrc,), bool), ts)
    tb = pa.tile_bounds(jnp.asarray(tar), jnp.asarray(tv), pa._TT_SPARSE)
    nn, d2 = pa.nn_min_sparse(jnp.asarray(src), sb, jnp.asarray(tar), tb,
                              jnp.asarray(tv), radius, interpret=True, ts=ts)
    dn, dd = pa.nn_min(jnp.asarray(src), jnp.asarray(tar), jnp.asarray(tv),
                       interpret=True)
    nn, d2, dn, dd = map(np.asarray, (nn, d2, dn, dd))
    within = dd <= radius * radius
    assert within.any() and not within.all()
    np.testing.assert_array_equal(nn[within], dn[within])
    np.testing.assert_array_equal(d2[within], dd[within])
    assert (d2[~within] >= radius * radius).all()
    assert np.isinf(d2[2]).all()


def test_register_sparse_backend_matches_dense():
    """Full register() through assoc_method='pallas_sparse' (Morton-sorted
    cells, interpreter mode) must reproduce the dense backend's pose and
    association count."""
    rng = np.random.default_rng(7)
    true = np.array([2.5, 0.8, 0.06])
    xy, intens = _world_cloud(rng)
    results = {}
    for method in ("dense", "pallas_sparse"):
        cfg = _cfg("P2L", "Huber", "Combined")
        cfg = cfg.replace(
            feature=dataclasses.replace(cfg.feature, max_cells=512,
                                        spatial_sort=True),
            registration=dataclasses.replace(
                cfg.registration, assoc_method=method))
        kf_poses_np = [np.zeros(3) + [0.4 * i, 0.1 * i, 0.01 * i]
                       for i in range(8)]
        kf_cells = _stack_keyframes(
            [_cells_from_world(xy, intens, p, cfg) for p in kf_poses_np])
        kf_poses = jnp.asarray(np.stack(kf_poses_np), jnp.float32)
        kf_valid = jnp.ones(8, bool)
        src = _cells_from_world(xy, intens, true, cfg)
        guess = jnp.asarray(true + np.array([0.3, -0.2, 0.02]), jnp.float32)
        results[method] = registration.register(
            kf_cells, kf_poses, kf_valid, src, guess, cfg=cfg)
    assert bool(results["pallas_sparse"].success)
    np.testing.assert_allclose(
        np.asarray(results["dense"].pose),
        np.asarray(results["pallas_sparse"].pose), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(results["dense"].num_assoc),
        np.asarray(results["pallas_sparse"].num_assoc))


def test_onehot_attr_lookup_exact():
    """The MXU one-hot attribute lookup used for large keyframe windows
    must reproduce the gathered rows bit-for-bit (each one-hot row selects
    exactly one attrs row; f32 matmul at 'highest' precision)."""
    rng = np.random.default_rng(5)
    s, m, d = 9, 256, 7
    attrs = jnp.asarray(rng.normal(size=(s, m, d)).astype(np.float32) * 100)
    nn = jnp.asarray(rng.integers(0, m, size=(s, m)).astype(np.int32))
    oh = (nn[..., None] == jnp.arange(m, dtype=jnp.int32)).astype(jnp.float32)
    g_mxu = jnp.einsum("snm,smd->snd", oh, attrs,
                       preferred_element_type=jnp.float32)
    g_ref = jax.vmap(lambda a, i: a[i])(attrs, nn)
    np.testing.assert_array_equal(np.asarray(g_mxu), np.asarray(g_ref))


def test_fused_lm_matches_packed_xla():
    """The fused Pallas LM kernels (masked-fori and early-exit variants,
    interpreter mode on CPU) return the same solve as the packed-XLA
    while-loop path. ABLATION: the kernels are no longer reachable from
    config (they measured slower in every variant — r4 418 vs 450 fps,
    r5 1267 vs ~1293 fps/chip batched WITH the early exit); this pins
    their correctness as standalone ops."""
    from cfear_radarodometry_code_public_tpu.ops import pallas_lm

    rng = np.random.default_rng(31)
    true_pose = np.array([1.2, 0.4, 0.03])
    cfg = _cfg("P2L", "Huber", "Combined")
    xy, intens = _world_cloud(rng)
    kf_cells = _stack_keyframes(
        [_cells_from_world(xy, intens, np.zeros(3), cfg)])
    kf_poses = jnp.zeros((1, 3), jnp.float32)
    kf_valid = jnp.ones(1, bool)
    src = _cells_from_world(xy, intens, true_pose, cfg)
    guess = jnp.asarray(true_pose + [0.3, -0.2, 0.02], jnp.float32)
    r_x = registration.register(kf_cells, kf_poses, kf_valid, src, guess,
                                cfg=cfg)
    assert bool(r_x.success)
    # drive the kernels directly on a packed association problem
    from cfear_radarodometry_code_public_tpu.ops.registration import (
        _associate_world, _world_attrs, resolve_assoc_method)
    import math as _math
    method = resolve_assoc_method(cfg, src.valid.shape[0],
                                  kf_cells.valid.shape[1], 1)
    attrs = _world_attrs(kf_cells, kf_poses, cfg)
    assoc, tgt = _associate_world(
        attrs, src, guess, kf_valid, 2.0 * cfg.registration.assoc_radius,
        cfg, _math.cos(_math.radians(cfg.registration.angle_outlier_deg)),
        method)
    packed = pallas_lm.pack_associations(
        src.mean, tgt, assoc.weight * assoc.valid, cfg)
    p_ref, c_ref, _, _ = pallas_lm.lm_solve_packed_xla(packed, guess, cfg)
    for ee in (False, True):
        p_k, c_k, _, _ = pallas_lm.lm_solve_fused(
            packed, guess, cfg, interpret=True, early_exit=ee)
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref),
                                   atol=1e-4, err_msg=f"early_exit={ee}")
        np.testing.assert_allclose(float(c_k), float(c_ref), rtol=1e-3)


def test_sparse_attrs_fused_lookup_matches_gather():
    """`nn_min_sparse_attrs` (in-kernel one-hot attribute selection) must
    reproduce attrs[nn] BIT-FOR-BIT on every row whose 1-NN lies within
    the radius, and agree with `nn_min_sparse` on (nn, d2)."""
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc as pa

    rng = np.random.default_rng(5)
    s, m, msrc, ts, radius, d = 4, 1024, 512, 256, 5.0, 7
    src = rng.normal(size=(msrc, 2)).astype(np.float32) * 60
    src = src[np.argsort(src[:, 0], kind="stable")]
    tar = rng.normal(size=(s, m, 2)).astype(np.float32) * 60
    for k in range(s):
        tar[k] = tar[k][np.argsort(tar[k][:, 0], kind="stable")]
    tv = rng.random((s, m)) < 0.8
    attrs = rng.normal(size=(s, m, d)).astype(np.float32)
    d_pad = 8
    at = np.zeros((s, d_pad, m), np.float32)
    at[:, :d] = np.swapaxes(attrs, -1, -2)
    sb = pa.tile_bounds(jnp.asarray(src), jnp.ones((msrc,), bool), ts)
    tb = pa.tile_bounds(jnp.asarray(tar), jnp.asarray(tv), pa._TT_SPARSE)
    nn, d2, g_t = pa.nn_min_sparse_attrs(
        jnp.asarray(src), sb, jnp.asarray(tar), tb, jnp.asarray(tv),
        jnp.asarray(at), radius, interpret=True, ts=ts)
    nn0, d20 = pa.nn_min_sparse(jnp.asarray(src), sb, jnp.asarray(tar), tb,
                                jnp.asarray(tv), radius, interpret=True,
                                ts=ts)
    nn, d2, g_t = map(np.asarray, (nn, d2, g_t))
    np.testing.assert_array_equal(nn, np.asarray(nn0))
    np.testing.assert_array_equal(d2, np.asarray(d20))
    g = np.swapaxes(g_t, -1, -2)[..., :d]              # (S, Msrc, D)
    within = d2 <= radius * radius
    assert within.any()
    expect = np.take_along_axis(attrs, nn[..., None], axis=1)
    np.testing.assert_array_equal(g[within], expect[within])
    # rows with every pair skipped carry zeros
    assert (g[~np.isfinite(d2)] == 0.0).all()


def test_sparse_multi_kernel_matches_sparse():
    """`nn_min_sparse_multi` (in-kernel keyframe fori_loop + bbox tile
    skipping) must reproduce `nn_min_sparse` exactly — same arithmetic,
    same lowest-index tie-break, same (+inf, 0) skipped rows."""
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc as pa

    rng = np.random.default_rng(9)
    s, m, msrc, ts, radius = 6, 1024, 512, 256, 5.0
    src = rng.normal(size=(msrc, 2)).astype(np.float32) * 60
    src = src[np.argsort(src[:, 0], kind="stable")]
    tar = rng.normal(size=(s, m, 2)).astype(np.float32) * 60
    for k in range(s):
        tar[k] = tar[k][np.argsort(tar[k][:, 0], kind="stable")]
    tv = rng.random((s, m)) < 0.8
    tv[3] = False                                        # empty keyframe
    sb = pa.tile_bounds(jnp.asarray(src), jnp.ones((msrc,), bool), ts)
    tb = pa.tile_bounds(jnp.asarray(tar), jnp.asarray(tv), pa._TT_SPARSE)
    a = pa.nn_min_sparse(jnp.asarray(src), sb, jnp.asarray(tar), tb,
                         jnp.asarray(tv), radius, interpret=True, ts=ts)
    b = pa.nn_min_sparse_multi(jnp.asarray(src), sb, jnp.asarray(tar), tb,
                               jnp.asarray(tv), radius, interpret=True,
                               ts=ts)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_sparse_unrolled_kernel_matches_sparse():
    """`nn_min_sparse_unrolled` (statically-unrolled in-kernel keyframe
    loop, pl.when-guarded scratch accumulation) must reproduce
    `nn_min_sparse` exactly — tie-breaks and skipped-row (+inf, 0)
    semantics included."""
    from cfear_radarodometry_code_public_tpu.ops import pallas_assoc as pa

    rng = np.random.default_rng(13)
    s, m, msrc, ts, radius = 6, 1024, 512, 256, 5.0
    src = rng.normal(size=(msrc, 2)).astype(np.float32) * 60
    src = src[np.argsort(src[:, 0], kind="stable")]
    tar = rng.normal(size=(s, m, 2)).astype(np.float32) * 60
    for k in range(s):
        tar[k] = tar[k][np.argsort(tar[k][:, 0], kind="stable")]
    tv = rng.random((s, m)) < 0.8
    tv[2] = False                                        # empty keyframe
    sb = pa.tile_bounds(jnp.asarray(src), jnp.ones((msrc,), bool), ts)
    tb = pa.tile_bounds(jnp.asarray(tar), jnp.asarray(tv), pa._TT_SPARSE)
    a = pa.nn_min_sparse(jnp.asarray(src), sb, jnp.asarray(tar), tb,
                         jnp.asarray(tv), radius, interpret=True, ts=ts)
    b = pa.nn_min_sparse_unrolled(jnp.asarray(src), sb, jnp.asarray(tar),
                                  tb, jnp.asarray(tv), radius,
                                  interpret=True, ts=ts)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_dcs_rho_is_consistent_antiderivative():
    """r5 regression: DCS's (rho, drho) must satisfy rho' = drho with rho
    MONOTONE non-decreasing and bounded (the former rho = w*s peaked at
    s=a and DECREASED beyond — any cost comparison built on it rewarded
    exploding outliers, which silently broke pose-graph step acceptance)."""
    from cfear_radarodometry_code_public_tpu.ops import losses

    a = 4.0
    s = jnp.linspace(0.0, 400.0, 4001)
    rho, drho = losses.rho(s, "DCS", a)
    rho = np.asarray(rho)
    drho = np.asarray(drho)
    # monotone, bounded by 3a, quadratic region exact
    assert np.all(np.diff(rho) >= -1e-6)
    assert rho[-1] <= 3.0 * a + 1e-6
    np.testing.assert_allclose(rho[s <= a], np.asarray(s)[s <= a],
                               atol=1e-5)
    # drho equals the numeric derivative of rho
    num = np.diff(rho) / float(s[1] - s[0])
    mid = 0.5 * (drho[1:] + drho[:-1])
    np.testing.assert_allclose(num, mid, atol=2e-3)
    # weight redescends toward 0
    assert drho[-1] < 0.05
