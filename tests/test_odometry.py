import dataclasses

import numpy as np
import jax.numpy as jnp

from cfear_radarodometry_code_public_tpu.config import preset
from cfear_radarodometry_code_public_tpu.datasets import synthetic
from cfear_radarodometry_code_public_tpu.eval.kitti import kitti_drift
from cfear_radarodometry_code_public_tpu.eval.trajectory import ate_rmse
from cfear_radarodometry_code_public_tpu.models import odometry


def _cfg(**kw):
    cfg = preset("CFEAR-3", dataset="synthetic")
    feat = dataclasses.replace(cfg.feature, max_cells=512)
    filt = dataclasses.replace(cfg.filter, k_strongest=12)
    cfg = cfg.replace(feature=feat, filter=filt)
    if kw:
        cfg = cfg.replace(odometry=dataclasses.replace(cfg.odometry, **kw))
    return cfg


def test_end_to_end_tracks_ground_truth():
    cfg = _cfg()
    images, gt = synthetic.make_sequence(seed=3, n_frames=30, cfg=cfg)
    runner = odometry.OdometryRunner(cfg, chunk=8)
    runner.process(images)
    traj = runner.trajectory()
    assert traj.shape == (30, 3)
    out = runner.frame_outputs()
    assert bool(out.success.all())
    assert ate_rmse(traj[:, :2], gt[:, :2]) < 0.5
    # heading error stays small
    dth = np.abs(np.arctan2(np.sin(traj[:, 2] - gt[:, 2]),
                            np.cos(traj[:, 2] - gt[:, 2])))
    assert dth.max() < 0.05


def test_end_to_end_cacfar_host_ingest():
    """Exclusive CA-CFAR filtering drives the full pipeline through the
    host-ingest data plane (no silent fallback to image ingest)."""
    cfg = _cfg()
    filt = dataclasses.replace(cfg.filter, method="cacfar", cfar_window=10,
                               cfar_guard=2, cfar_max_per_azimuth=24)
    cfg = cfg.replace(filter=filt)
    images, gt = synthetic.make_sequence(seed=3, n_frames=24, cfg=cfg)
    runner = odometry.OdometryRunner(cfg, chunk=8, ingest="host")
    assert runner.ingest == "host"
    runner.process(images)
    traj = runner.trajectory()
    assert ate_rmse(traj[:, :2], gt[:, :2]) < 1.0
    # candidates ingest == image ingest, identical trajectory
    r2 = odometry.OdometryRunner(cfg, chunk=8, ingest="image")
    r2.process(images)
    np.testing.assert_allclose(traj, r2.trajectory(), atol=1e-4)


def test_ccw_scan_direction_end_to_end():
    """A counter-clockwise radar (MulRan-style, `ccw=True`) reverses the
    per-azimuth scan-time convention (`utils.h:28-32`). Rendering the SAME
    world/trajectory with a ccw sensor and running the pipeline with the
    matching flag must track ground truth as well as the cw sensor does."""
    cfg_cw = _cfg()
    cfg_ccw = cfg_cw.replace(
        radar=dataclasses.replace(cfg_cw.radar, ccw=True))
    results = {}
    for name, cfg in (("cw", cfg_cw), ("ccw", cfg_ccw)):
        images, gt = synthetic.make_sequence(seed=21, n_frames=24, cfg=cfg,
                                             speed=7.0)
        runner = odometry.OdometryRunner(cfg, chunk=8)
        runner.process(images)
        results[name] = ate_rmse(runner.trajectory()[:, :2], gt[:, :2])
    assert results["ccw"] < 0.5
    assert abs(results["ccw"] - results["cw"]) < 0.3
    # wrong flag on ccw data must be measurably worse (the sign convention
    # is actually exercised at this speed)
    images, gt = synthetic.make_sequence(seed=21, n_frames=24, cfg=cfg_ccw,
                                         speed=7.0)
    runner = odometry.OdometryRunner(cfg_cw, chunk=8)
    runner.process(images)
    wrong = ate_rmse(runner.trajectory()[:, :2], gt[:, :2])
    assert wrong > results["ccw"]


def test_keyframe_gating():
    cfg = _cfg()
    images, gt = synthetic.make_sequence(seed=5, n_frames=20, cfg=cfg,
                                         speed=2.0)
    runner = odometry.OdometryRunner(cfg, chunk=8)
    runner.process(images)
    out = runner.frame_outputs()
    fused = np.asarray(out.fused)
    assert fused[0]                     # bootstrap frame is a keyframe
    # at 2 m/s * 0.25 s = 0.5 m/frame, a keyframe every ~3-4 frames
    assert 3 <= fused.sum() <= 12


def test_stationary_sensor_no_keyframes():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    world = synthetic.make_world(rng)
    img = synthetic.render_polar(world, np.zeros(3), cfg, rng)
    images = np.stack([img] * 6)
    runner = odometry.OdometryRunner(cfg, chunk=6)
    runner.process(images)
    out = runner.frame_outputs()
    traj = runner.trajectory()
    assert out.fused.sum() == 1         # only the bootstrap keyframe
    assert np.abs(traj[:, :2]).max() < 0.2


def test_chunked_equals_unchunked():
    cfg = _cfg()
    images, _ = synthetic.make_sequence(seed=9, n_frames=12, cfg=cfg)
    r1 = odometry.OdometryRunner(cfg, chunk=4)
    r1.process(images)
    r2 = odometry.OdometryRunner(cfg, chunk=12)
    r2.process(images)
    np.testing.assert_allclose(r1.trajectory(), r2.trajectory(),
                               atol=1e-5)


def test_anchor_rebase_keeps_device_poses_small():
    cfg = _cfg()
    images, gt = synthetic.make_sequence(seed=11, n_frames=25, cfg=cfg,
                                         speed=8.0)
    runner = odometry.OdometryRunner(cfg, chunk=5)
    runner.process(images)
    out = runner.frame_outputs()
    # all on-device poses stay within the submap scale even though the
    # trajectory is ~50 m long
    assert np.abs(np.asarray(out.pose)[:, :2]).max() < 20.0
    traj = runner.trajectory()
    assert np.linalg.norm(traj[-1, :2]) > 25.0   # but the world pose grows


def test_drift_metric_on_long_sequence():
    cfg = _cfg()
    images, gt = synthetic.make_sequence(seed=13, n_frames=120, cfg=cfg,
                                         speed=7.0)
    runner = odometry.OdometryRunner(cfg, chunk=16)
    runner.process(images)
    traj = runner.trajectory()
    res = kitti_drift(traj, gt, step_size=5, lengths=(50.0, 100.0))
    assert res["n_subsequences"] > 5
    # coarse synthetic sensor (0.175 m bins, k=12): guard against regression
    assert res["t_err_percent"] < 3.0, res


def test_batched_step_matches_single_steps():
    """make_batched_step (hand-batched feature stage) == per-lane make_step."""
    import jax

    cfg = _cfg()
    b, t = 3, 6
    seqs = [synthetic.make_sequence(seed=40 + s, n_frames=t, cfg=cfg)[0]
            for s in range(b)]
    step = jax.jit(odometry.make_step(cfg))
    boot = jax.jit(odometry.make_bootstrap(cfg))
    stepb = jax.jit(odometry.make_batched_step(cfg))

    states, poses_ref = [], []
    for s in range(b):
        st, _ = boot(odometry.init_state(cfg), jnp.asarray(seqs[s][0]))
        states.append(st)
    stb = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    for i in range(1, t):
        frames = jnp.stack([jnp.asarray(seqs[s][i]) for s in range(b)])
        stb, outb = stepb(stb, frames)
        for s in range(b):
            states[s], out1 = step(states[s], frames[s])
            np.testing.assert_allclose(np.asarray(outb.pose[s]),
                                       np.asarray(out1.pose), atol=1e-5)
            assert bool(outb.fused[s]) == bool(out1.fused)
    for s in range(b):
        np.testing.assert_allclose(np.asarray(stb.t_prev[s]),
                                   np.asarray(states[s].t_prev), atol=1e-5)


def test_large_submap_s16():
    """CFEAR-3-s50-style large submaps (`oxford_demo:57-66`): S=16 keyframe
    window with Cauchy loss runs end-to-end and tracks at least as well as
    the S=4 default on the same sequence."""
    cfg4 = _cfg()
    cfg16 = cfg4.replace(
        odometry=dataclasses.replace(cfg4.odometry, submap_scan_size=16,
                                     keyframe_min_dist=0.5),
        registration=dataclasses.replace(cfg4.registration, loss="Cauchy"))
    images, gt = synthetic.make_sequence(seed=15, n_frames=40, cfg=cfg4,
                                         speed=6.0)
    errs = {}
    for name, cfg in (("s4", cfg4), ("s16", cfg16)):
        runner = odometry.OdometryRunner(cfg, chunk=8)
        runner.process(images)
        out = runner.frame_outputs()
        assert bool(out.success.all()), name
        errs[name] = ate_rmse(runner.trajectory()[:, :2], gt[:, :2])
    # deep submap fills past S=4: keyframe count must exceed the window
    assert int(out.fused.sum()) > 16
    assert errs["s16"] < max(2.0 * errs["s4"], 0.3)


def test_reverse_registration_health_signal():
    """VERDICT r4 weak #4: the odometry health signal. Every K frames the
    pipeline re-registers the last keyframe's cells against the current
    scan at its estimated pose and reports the forward/backward
    discrepancy. On a nominal sequence the checks fire on schedule and
    report healthy (sub-tolerance discrepancy); with registration
    disabled (pose = guess, never corrected) the reverse solve recovers
    the TRUE offset and flags the frames unhealthy."""
    cfg = _cfg(health_check_every=4)
    images, gt = synthetic.make_sequence(seed=3, n_frames=24, cfg=cfg)
    runner = odometry.OdometryRunner(cfg, chunk=8)
    runner.process(images)
    out = runner.frame_outputs()
    checked = np.asarray(out.health_checked)
    assert checked.sum() >= 4          # fires every K frames
    assert not checked[0]              # bootstrap frame never checks
    assert bool(out.healthy.all()), (
        np.asarray(out.health_dist)[checked],
        np.asarray(out.health_rot)[checked])
    # checked frames carry a real (finite, small) discrepancy measurement
    assert np.all(np.asarray(out.health_dist)[checked] <
                  cfg.odometry.health_max_dist)

    # degraded regime: disable_registration follows the (stale constant
    # velocity) guess, so the estimate diverges from the scans -- the
    # reverse solve must flag it. Use a turning trajectory so the
    # constant-velocity guess is wrong.
    cfg_bad = _cfg(health_check_every=4)
    cfg_bad = cfg_bad.replace(registration=dataclasses.replace(
        cfg_bad.registration, disable_registration=True))
    r2 = odometry.OdometryRunner(cfg_bad, chunk=8)
    r2.process(images)
    out2 = r2.frame_outputs()
    checked2 = np.asarray(out2.health_checked)
    assert checked2.sum() >= 4
    unhealthy_frac = float((~np.asarray(out2.healthy)[checked2]).mean())
    assert unhealthy_frac > 0.4, unhealthy_frac

    # health fields survive checkpoint/resume (old checkpoints without
    # them load with defaults -- covered by the defaults branch)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ck = f"{d}/ck.npz"
        runner.save_checkpoint(ck)
        r3 = odometry.OdometryRunner.resume(cfg, ck, chunk=8)
        out3 = r3.frame_outputs()
        np.testing.assert_array_equal(out3.health_checked, checked)


def test_collapsed_reverse_solve_is_unhealthy():
    """A failed/collapsed reverse solve must flag the frame UNHEALTHY.

    A collapsed solve (zero associations) echoes its guess, so the
    forward/backward discrepancy is exactly zero — the discrepancy
    thresholds alone would report precisely the most-degraded frames
    healthy. The health signal must consult the reverse solve's success
    flag: here the sensor goes blind (all-zero frames, empty scans), the
    reverse registration finds no targets, and every checked blind frame
    must come back unhealthy."""
    cfg = _cfg(health_check_every=1)
    images, _ = synthetic.make_sequence(seed=3, n_frames=16, cfg=cfg)
    images = np.array(images)
    images[8:] = 0                     # sensor goes blind mid-sequence
    runner = odometry.OdometryRunner(cfg, chunk=8)
    runner.process(images)
    out = runner.frame_outputs()
    checked = np.asarray(out.health_checked)
    healthy = np.asarray(out.healthy)
    # nominal prefix: checks fire and pass
    assert checked[1:8].all() and healthy[1:8].all()
    # blind suffix: the reverse solve collapses (d == 0) — the success
    # flag, not the thresholds, must flag these frames
    blind_checked = checked[8:]
    assert blind_checked.any()
    assert not healthy[8:][blind_checked].any(), (
        np.asarray(out.health_dist)[8:], healthy[8:])
