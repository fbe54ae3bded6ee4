"""Polar-image return filtering: k-strongest, axial NMS peaks, CA-CFAR.

TPU-first re-design of the reference's `StructuredKStrongest`
(`radar_filters.cpp:198-337`) and `AzimuthCACFAR` (`cfar.cpp:35-71`):
variable-length per-azimuth candidate lists become fixed-shape (A, k) masked
arrays selected with `jax.lax.top_k`, and the NMS score becomes a windowed
sum + windowed max over the dense image — all static shapes, no gather loops.

Semantics reproduced exactly:
- keep the k strongest bins with intensity >= z_min per azimuth; on intensity
  ties the larger range bin wins (the reference's sorted-insert over
  (intensity, range) pairs, `radar_filters.cpp:220-229`)
- NMS score of bin r = sum of the 7 raw intensities in [r-3, r+3]
  (`radar_filters.cpp:253-263`); a kept bin is a peak iff its score is >= all
  scores within +-3 bins and the bin is >= 3 away from the image border
  (`radar_filters.cpp:267-296`)
- Cartesian conversion: theta = (azimuth+1)/A * 2pi, range = (bin+0.5)*dr,
  keep only bin > ceil(min_distance/dr) (`radar_filters.cpp:315-330`)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cfear_radarodometry_code_public_tpu.config import CFEARConfig


class PointCloud(NamedTuple):
    """Fixed-size masked 2-D point set (one slot per (azimuth, k) candidate)."""

    xy: jax.Array          # (N, 2) float32, garbage where ~valid
    intensity: jax.Array   # (N,) float32
    valid: jax.Array       # (N,) bool — k-strongest & range-gated
    peak: jax.Array        # (N,) bool — additionally an axial-NMS peak

    @property
    def n(self) -> jax.Array:
        return jnp.sum(self.valid)


def _windowed_sum(img_f32: jax.Array, w: int) -> jax.Array:
    """Sum over [r-w, r+w] along the last axis, zero-padded borders."""
    pad = jnp.pad(img_f32, ((0, 0), (w, w)))
    cs = jnp.cumsum(pad, axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))
    # sum over window ending at index i+2w+1 minus prefix before i
    return cs[:, 2 * w + 1:] - cs[:, :-(2 * w + 1)]


def _windowed_max(x: jax.Array, w: int) -> jax.Array:
    """Max over [r-w, r+w] along the last axis."""
    out = x
    for shift in range(1, w + 1):
        left = jnp.pad(x[:, shift:], ((0, 0), (0, shift)), constant_values=-jnp.inf)
        right = jnp.pad(x[:, :-shift], ((0, 0), (shift, 0)), constant_values=-jnp.inf)
        out = jnp.maximum(out, jnp.maximum(left, right))
    return out


def kstrongest_mask(image: jax.Array, k: int, z_min: int):
    """Per-azimuth k-strongest selection.

    Returns (bins, valid): (A, k) int32 selected range bins and bool mask.
    Tie-break on equal intensity prefers the larger range bin, matching the
    reference's lower_bound sorted insert (`radar_filters.cpp:225-228`).
    """
    a, r = image.shape
    intens = image.astype(jnp.int32)
    bins_iota = jax.lax.broadcasted_iota(jnp.int32, (a, r), 1)
    # composite sort key: intensity major, range bin minor (r < 2**shift)
    shift = 1 << (r - 1).bit_length()
    key = jnp.where(intens >= z_min, intens * shift + bins_iota, -1)
    topv, _ = jax.lax.top_k(key, k)                      # (A, k) descending
    valid = topv >= 0
    bins = jnp.where(valid, topv % shift, 0)
    return bins, valid


def nms_peak_image(image: jax.Array, w: int) -> jax.Array:
    """Dense bool (A, R): bin is a local max of the 7-bin smoothed intensity."""
    a, r = image.shape
    score = _windowed_sum(image.astype(jnp.float32), w)
    is_max = score >= _windowed_max(score, w)
    bins_iota = jax.lax.broadcasted_iota(jnp.int32, (a, r), 1)
    interior = (bins_iota >= w) & (bins_iota < r - w)
    return is_max & interior


def cacfar_mask(image: jax.Array, cfg: CFEARConfig) -> jax.Array:
    """Cell-averaging CFAR detections along range, per azimuth.

    Reproduces `AzimuthCACFAR::getFilteredPointCloud` (`cfar.cpp:35-71`)
    bin-exactly: alpha = N (Pfa^(-1/N) - 1) with N = 2*window; a cell with
    range in (min_distance, max_distance) and intensity > static_threshold is
    detected if I^2 > alpha * (trailing_mean + forward_mean)/2, where the
    trailing window covers squared intensities over [r-g-w, r-g-1] and the
    forward window [r+g, r+g+w-1], both clamped to the image (a window fully
    outside the image yields NaN in the reference -> never detects; we
    reproduce that as an explicit mask).
    """
    f, radar = cfg.filter, cfg.radar
    win, guard = f.cfar_window, f.cfar_guard
    alpha = (2 * win) * (f.false_alarm_rate ** (-1.0 / (2 * win)) - 1.0)
    a, r = image.shape
    sq = image.astype(jnp.float32) ** 2
    # prefix[i] = sum of sq[:, :i]
    prefix = jnp.pad(jnp.cumsum(sq, axis=1), ((0, 0), (1, 0)))
    bins = jax.lax.broadcasted_iota(jnp.int32, (a, r), 1)
    t_lo = jnp.clip(bins - guard - win, 0, r)
    t_hi = jnp.clip(bins - guard, 0, r)
    f_lo = jnp.clip(bins + guard, 0, r)
    f_hi = jnp.clip(bins + guard + win, 0, r)
    gather = lambda idx: jnp.take_along_axis(prefix, idx, axis=1)
    t_cnt = (t_hi - t_lo).astype(jnp.float32)
    f_cnt = (f_hi - f_lo).astype(jnp.float32)
    t_mean = (gather(t_hi) - gather(t_lo)) / jnp.maximum(t_cnt, 1.0)
    f_mean = (gather(f_hi) - gather(f_lo)) / jnp.maximum(f_cnt, 1.0)
    noise = 0.5 * (t_mean + f_mean)
    rng = bins.astype(jnp.float32) * radar.range_res
    det = (
        (rng > radar.min_distance)
        & (rng < radar.max_distance)
        & (image.astype(jnp.float32) > f.cfar_static_threshold)
        & (sq > alpha * noise)
        & (t_cnt > 0)
        & (f_cnt > 0)
    )
    return det


def polar_to_points(bins, valid, intens, peaks, cfg: CFEARConfig) -> PointCloud:
    """(A, k) selected bins -> flat fixed-size Cartesian point cloud."""
    radar = cfg.radar
    a = radar.n_azimuths
    az = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 0)
    theta = (az + 1).astype(jnp.float32) / a * (2.0 * jnp.pi)
    rng = (bins.astype(jnp.float32) + 0.5) * radar.range_res
    min_bin = int(math.ceil(radar.min_distance / radar.range_res))
    keep = valid & (bins > min_bin)
    xy = jnp.stack([rng * jnp.cos(theta), rng * jnp.sin(theta)], -1)
    return PointCloud(
        xy=xy.reshape(-1, 2),
        intensity=intens.astype(jnp.float32).reshape(-1),
        valid=keep.reshape(-1),
        peak=(keep & peaks).reshape(-1),
    )


class Candidates(NamedTuple):
    """Pre-filtered per-azimuth k-strongest candidate set (host-filter ingest).

    Produced by the native data plane (`utils/native_io.py:
    filter_frames_host`); ~25x fewer bytes over the host->device link than
    the raw polar image. One frame is (A, K) per field.
    """

    bins: jax.Array        # int16 — selected range bins, -1 for empty slots
    intensity: jax.Array   # uint8
    peak: jax.Array        # uint8 — axial-NMS peak flag


def points_from_candidates(cand: Candidates, cfg: CFEARConfig) -> PointCloud:
    """Device-side half of the split ingest: candidates -> point cloud.

    Equivalent to `filter_polar_image` on the original image (the candidate
    set is exactly the k-strongest selection; only the cheap
    polar->Cartesian conversion remains on device)."""
    bins = cand.bins.astype(jnp.int32)
    valid = bins >= 0
    return polar_to_points(jnp.maximum(bins, 0), valid,
                           cand.intensity, cand.peak.astype(bool), cfg)


def intensity_filter(pc: PointCloud, threshold: float = 50.0,
                     min_range: float = 0.0, max_range: float = 150.0
                     ) -> PointCloud:
    """Mask points by intensity threshold and range window
    (`IntensityFilter`, `utils.cpp:3-19`)."""
    d2 = jnp.sum(pc.xy ** 2, -1)
    keep = (pc.valid & (pc.intensity >= threshold)
            & (d2 > min_range * min_range) & (d2 < max_range * max_range))
    return pc._replace(valid=keep, peak=pc.peak & keep)


def add_noise(pc: PointCloud, key, sigma: float = 0.1) -> PointCloud:
    """Perturb point positions with Gaussian noise (`AddNoise`,
    `utils.cpp:71-74` adds z-noise; in 2-D we jitter xy) — test utility."""
    noise = sigma * jax.random.normal(key, pc.xy.shape, pc.xy.dtype)
    return pc._replace(xy=pc.xy + jnp.where(pc.valid[:, None], noise, 0.0))


def filter_polar_image(image: jax.Array, cfg: CFEARConfig) -> PointCloud:
    """Full filter stage: polar uint8 image (A, R) -> masked point cloud.

    Equivalent of `radarDriver::Process` (`radar_driver.cpp:48-73`): produces
    the k-strongest cloud and its NMS "peaks" subset in one fixed-shape pass.
    """
    f = cfg.filter
    bins, valid = kstrongest_mask(image, f.k_strongest, f.z_min)
    if f.method == "cacfar":
        cf = cacfar_mask(image, cfg)
        valid = valid & jnp.take_along_axis(cf, bins, axis=1)
    peak_img = nms_peak_image(image, f.nms_window)
    peaks = jnp.take_along_axis(peak_img, bins, axis=1) & valid
    intens = jnp.take_along_axis(image, bins, axis=1)
    return polar_to_points(bins, valid, intens, peaks, cfg)
