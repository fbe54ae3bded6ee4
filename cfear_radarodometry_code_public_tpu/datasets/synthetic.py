"""Synthetic spinning-FMCW radar simulator.

The reference is evaluated on recorded rosbags (Oxford Radar RobotCar,
MulRan); this module provides a physics-lite stand-in so every stage — and
the end-to-end drift benchmark — can run hermetically: a static world of
point scatterers is swept by a rotating beam, painting Gaussian intensity
blobs into a polar (azimuth x range) uint8 image, with per-azimuth sensor
motion (true motion distortion, matching the scan-time convention of
`utils.h:28-32`) and speckle noise below/around the detector threshold.

Conventions match the reference exactly so the same pipeline constants work:
azimuth bin b covers bearing theta = (b+1)/A * 2*pi (`radar_filters.cpp:317`),
range bin r covers distance (r+0.5) * dr (`radar_filters.cpp:324-330`),
azimuth b is measured at relative scan time d(theta) per GetRelTimeStamp.
"""

from __future__ import annotations

import numpy as np

from cfear_radarodometry_code_public_tpu.config import CFEARConfig


def make_world(rng: np.random.Generator, n_landmarks: int = 600,
               extent: float = 160.0) -> np.ndarray:
    """Random world: point scatterers along walls + clutter. (L, 3): x, y, refl."""
    pts = []
    n_walls = 14
    for _ in range(n_walls):
        p0 = rng.uniform(-extent, extent, 2)
        ang = rng.uniform(0, 2 * np.pi)
        length = rng.uniform(20.0, 90.0)
        n = max(int(length / 0.7), 2)
        t = np.linspace(0, length, n)
        wall = p0[None, :] + np.stack([np.cos(ang) * t, np.sin(ang) * t], -1)
        refl = np.full((n, 1), rng.uniform(150, 230))
        pts.append(np.concatenate([wall + rng.normal(0, 0.05, wall.shape),
                                   refl], -1))
    n_clutter = max(n_landmarks - sum(p.shape[0] for p in pts), 50)
    clutter = np.concatenate(
        [rng.uniform(-extent, extent, (n_clutter, 2)),
         rng.uniform(90, 200, (n_clutter, 1))], -1)
    pts.append(clutter)
    return np.concatenate(pts, 0)


def make_trajectory(rng: np.random.Generator, n_frames: int,
                    dt: float = 0.25, speed: float = 5.0) -> np.ndarray:
    """Smooth forward trajectory (T, 3) [x, y, yaw]: car-like motion."""
    yaw_rate = np.zeros(n_frames)
    n_knots = max(n_frames // 40, 2)
    knots = rng.uniform(-0.25, 0.25, n_knots)
    xs = np.linspace(0, n_frames - 1, n_knots)
    yaw_rate = np.interp(np.arange(n_frames), xs, knots)
    v = speed * (1.0 + 0.2 * np.sin(np.arange(n_frames) * 0.05))
    poses = np.zeros((n_frames, 3))
    for i in range(1, n_frames):
        th = poses[i - 1, 2]
        poses[i, 0] = poses[i - 1, 0] + v[i] * dt * np.cos(th)
        poses[i, 1] = poses[i - 1, 1] + v[i] * dt * np.sin(th)
        poses[i, 2] = th + yaw_rate[i] * dt
    return poses


def render_polar(world: np.ndarray, pose: np.ndarray, cfg: CFEARConfig,
                 rng: np.random.Generator, motion: np.ndarray | None = None,
                 noise_scale: float = 12.0) -> np.ndarray:
    """Render one polar sweep (A, R) uint8 at `pose`; `motion` is the
    frame-to-frame motion applied fractionally across the sweep (distortion)."""
    radar = cfg.radar
    a_bins, r_bins = radar.n_azimuths, radar.n_bins
    dr = radar.range_res

    img = np.zeros((a_bins, r_bins), np.float32)
    if noise_scale > 0:
        img += rng.exponential(noise_scale, (a_bins, r_bins)).astype(np.float32)

    # sensor pose per azimuth (motion distortion): azimuth b is captured at
    # relative time d = (b+1)/A - 0.5 (ccw flips sign)
    d = (np.arange(a_bins) + 1.0) / a_bins - 0.5
    if radar.ccw:
        d = -d
    if motion is None:
        motion = np.zeros(3)
    ang = pose[2] + d * motion[2]
    px = pose[0] + d * (np.cos(pose[2]) * motion[0] - np.sin(pose[2]) * motion[1])
    py = pose[1] + d * (np.sin(pose[2]) * motion[0] + np.cos(pose[2]) * motion[1])

    # landmark bearing/range per azimuth-of-capture: use the sensor pose of
    # the azimuth bin nearest to each landmark's bearing (fixed-point iterate
    # once: bearing from the undistorted pose, then refine with that bin's pose)
    def project(sx, sy, sth):
        rel_x = world[:, 0] - sx
        rel_y = world[:, 1] - sy
        c, s = np.cos(-sth), np.sin(-sth)
        lx = c * rel_x - s * rel_y
        ly = s * rel_x + c * rel_y
        theta = np.mod(np.arctan2(ly, lx), 2 * np.pi)
        rngs = np.hypot(lx, ly)
        return theta, rngs

    theta0, _ = project(pose[0], pose[1], pose[2])
    b0 = np.clip(np.round(theta0 * a_bins / (2 * np.pi) - 1.0).astype(int),
                 0, a_bins - 1)
    theta, rngs = project(px[b0], py[b0], ang[b0])
    az_f = theta * a_bins / (2 * np.pi) - 1.0           # fractional azimuth bin
    rng_f = rngs / dr - 0.5                             # fractional range bin

    keep = (rngs > 1.0) & (rng_f < r_bins - 4) & (rng_f > 2)
    az_f, rng_f, refl = az_f[keep], rng_f[keep], world[keep, 2]

    sig_a, sig_r = 1.0, 1.2
    for da in range(-2, 3):
        ab = np.mod(np.round(az_f) + da, a_bins).astype(int)
        wa = np.exp(-0.5 * ((np.round(az_f) + da - az_f) / sig_a) ** 2)
        for drb in range(-3, 4):
            rb = np.clip(np.round(rng_f) + drb, 0, r_bins - 1).astype(int)
            wr = np.exp(-0.5 * ((np.round(rng_f) + drb - rng_f) / sig_r) ** 2)
            np.add.at(img, (ab, rb), refl * wa * wr)

    return np.clip(img, 0, 255).astype(np.uint8)


def make_sequence(seed: int, n_frames: int, cfg: CFEARConfig,
                  speed: float = 5.0, noise_scale: float = 12.0):
    """Full synthetic sequence: (images (T, A, R) uint8, gt_poses (T, 3))."""
    rng = np.random.default_rng(seed)
    world = make_world(rng)
    gt = make_trajectory(rng, n_frames, dt=cfg.radar.sensor_period, speed=speed)
    images = np.zeros((n_frames, cfg.radar.n_azimuths, cfg.radar.n_bins),
                      np.uint8)
    for i in range(n_frames):
        motion = None
        if i > 0:
            # frame-to-frame motion in the previous frame's frame
            prev, cur = gt[i - 1], gt[i]
            c, s = np.cos(prev[2]), np.sin(prev[2])
            dx, dy = cur[0] - prev[0], cur[1] - prev[1]
            motion = np.array([c * dx + s * dy, -s * dx + c * dy,
                               cur[2] - prev[2]])
        images[i] = render_polar(world, gt[i], cfg, rng, motion=motion,
                                 noise_scale=noise_scale)
    return images, gt
