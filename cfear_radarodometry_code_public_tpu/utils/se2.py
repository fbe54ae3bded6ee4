"""SE(2) pose algebra on arrays.

The reference carries poses as `Eigen::Affine3d` restricted to planar motion
and converts to/from [x, y, yaw] vectors (`utils.cpp:115-127`,
`registration.cpp:130-150`). Here the [x, y, theta] vector IS the native
representation: every function is pure, jit/vmap-friendly and batched over
leading axes. Poses compose like matrices: ``compose(a, b) == Ta @ Tb``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_angle(a):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def rotmat(theta):
    """(...,) -> (..., 2, 2) rotation matrices."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def identity(dtype=jnp.float32):
    return jnp.zeros((3,), dtype=dtype)


def compose(a, b):
    """T_a * T_b for [x, y, theta] poses (batched)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = a[..., 2] + b[..., 2]
    return jnp.stack([x, y, t], -1)


def inverse(a):
    """T^{-1} for [x, y, theta] poses (batched)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, -a[..., 2]], -1)


def relative(a, b):
    """T_a^{-1} * T_b (the motion taking frame a to frame b)."""
    return compose(inverse(a), b)


def transform(pose, pts):
    """Apply pose [x,y,theta] to points (..., N, 2)."""
    R = rotmat(pose[..., 2])
    return jnp.einsum("...ij,...nj->...ni", R, pts) + pose[..., None, :2]


def rotate(pose, vecs):
    """Apply only the rotation of pose to vectors (..., N, 2)."""
    R = rotmat(pose[..., 2])
    return jnp.einsum("...ij,...nj->...ni", R, vecs)


def scaled(pose, factor):
    """Fractional motion: scale translation and angle by `factor`.

    Mirrors getScaledRotationMatrix/TranslationVector (`utils.cpp:130-146`)
    used for per-point motion-distortion compensation.
    """
    return jnp.stack([pose[..., 0] * factor, pose[..., 1] * factor,
                      pose[..., 2] * factor], -1)


def exp(xi):
    """SE(2) exponential map: twist [vx, vy, omega] -> pose [x, y, theta]."""
    w = xi[..., 2]
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, jnp.ones_like(w), w)
    s, c = jnp.sin(ws), jnp.cos(ws)
    a = jnp.where(small, 1.0 - w * w / 6.0, s / ws)          # sin(w)/w
    b = jnp.where(small, w / 2.0 - w ** 3 / 24.0, (1 - c) / ws)  # (1-cos(w))/w
    x = a * xi[..., 0] - b * xi[..., 1]
    y = b * xi[..., 0] + a * xi[..., 1]
    return jnp.stack([x, y, w], -1)


def log(pose):
    """SE(2) logarithm map: pose [x, y, theta] -> twist [vx, vy, omega]."""
    w = normalize_angle(pose[..., 2])
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, jnp.ones_like(w), w)
    half = ws / 2.0
    cot = half * jnp.cos(half) / jnp.sin(half)
    a = jnp.where(small, 1.0 - w * w / 12.0, cot)            # (w/2) cot(w/2)
    b = w / 2.0
    x = a * pose[..., 0] + b * pose[..., 1]
    y = -b * pose[..., 0] + a * pose[..., 1]
    return jnp.stack([x, y, w], -1)


def to_matrix(pose):
    """[x,y,theta] -> 4x4 homogeneous matrix (for trajectory export)."""
    pose = np.asarray(pose, dtype=np.float64)
    c, s = np.cos(pose[..., 2]), np.sin(pose[..., 2])
    m = np.zeros(pose.shape[:-1] + (4, 4), dtype=np.float64)
    m[..., 0, 0], m[..., 0, 1] = c, -s
    m[..., 1, 0], m[..., 1, 1] = s, c
    m[..., 2, 2] = 1.0
    m[..., 3, 3] = 1.0
    m[..., 0, 3] = pose[..., 0]
    m[..., 1, 3] = pose[..., 1]
    return m


def from_matrix(m):
    """4x4 (or 3x3 / 3x4) homogeneous matrix -> [x,y,theta] (host-side)."""
    m = np.asarray(m)
    theta = np.arctan2(m[..., 1, 0], m[..., 0, 0])
    return np.stack([m[..., 0, -1], m[..., 1, -1], theta], -1)


def rel_timestamp(xy, ccw: bool):
    """Relative scan time in [-0.5, 0.5] of point(s) from azimuth.

    Reproduces GetRelTimeStamp (`utils.h:28-32`): a = atan2(y, x);
    d = (a > 1e-5 ? a : 2*pi + a) / (2*pi); return ccw ? -(d-0.5) : (d-0.5).
    """
    a = jnp.arctan2(xy[..., 1], xy[..., 0])
    d = jnp.where(a > 0.00001, a, 2.0 * jnp.pi + a) / (2.0 * jnp.pi)
    return jnp.where(ccw, -(d - 0.5), d - 0.5)


def compensate_points(xy, tmot, ccw: bool):
    """Motion-distortion compensate points by fractional application of tmot.

    Reproduces Compensate (`utils.cpp:96-107`): each point is moved by the
    scaled rotation+translation of the previous frame motion, scaled by its
    relative scan timestamp.
    """
    d = rel_timestamp(xy, ccw)                       # (..., N)
    ang = d * tmot[..., None, 2]
    c, s = jnp.cos(ang), jnp.sin(ang)
    x, y = xy[..., 0], xy[..., 1]
    xr = c * x - s * y + d * tmot[..., None, 0]
    yr = s * x + c * y + d * tmot[..., None, 1]
    return jnp.stack([xr, yr], -1)
