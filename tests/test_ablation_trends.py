"""Parameter-trend checks on the committed ablation-sweep artifact.

`eval_results/ablation_sweep.csv` is produced by
`tools/run_ablation_sweep.py`: the reference's 9 ablation grids
(`launch/oxford/eval/1..10_*`) over 3 seeds of a 150-frame adversarial
synthetic sequence (moving objects, azimuth dropout, interference bursts,
12 m/s). These tests assert the paper's parameter trends hold on it —
the strongest accuracy evidence available in a zero-egress environment
(see RUNBOOK.md for the real-data path).
"""

import csv
import os

import numpy as np
import pytest

CSV = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "eval_results", "ablation_sweep.csv")


@pytest.fixture(scope="module")
def rows():
    if not os.path.exists(CSV):
        pytest.skip("ablation sweep CSV not generated yet")
    with open(CSV) as f:
        return list(csv.DictReader(f))


def _drift(rows, grid, **filters):
    """Mean t_err_percent over seeds for rows of one grid matching filters."""
    vals = []
    for r in rows:
        if not r["job"].startswith(grid + "/"):
            continue
        if any(r.get(k) != v for k, v in filters.items()):
            continue
        vals.append(float(r["t_err_percent"]))
    assert vals, (grid, filters)
    return float(np.mean(vals))


def test_sweep_complete(rows):
    """All 9 grids x 3 seeds ran and every job produced a drift number."""
    grids = {r["job"].split("/")[0] for r in rows}
    assert grids >= {"baseline", "weight_intensity", "residual_weight",
                     "filter", "resolution", "submap_keyframes",
                     "motion_compensation", "loss_function", "baseline_p2d"}
    seeds = {r["seed"] for r in rows}
    assert len(seeds) >= 3
    assert all(r.get("t_err_percent") for r in rows)


def test_motion_compensation_helps(rows):
    """Paper Tab. V: motion compensation on > off."""
    on = _drift(rows, "motion_compensation", **{"odometry.compensate": "True"})
    off = _drift(rows, "motion_compensation", **{"odometry.compensate": "False"})
    assert on < off, (on, off)


def test_submap_beats_single_scan(rows):
    """Paper Tab. IV: multi-keyframe submaps beat scan-to-scan."""
    s1 = _drift(rows, "submap_keyframes", **{"odometry.submap_scan_size": "1"})
    deep = min(_drift(rows, "submap_keyframes",
                      **{"odometry.submap_scan_size": s})
               for s in ("3", "4", "8"))
    assert deep < s1, (deep, s1)


def test_combined_weighting_beats_uniform(rows):
    """Paper Tab. VI: similarity-weighted residuals beat uniform."""
    uni = _drift(rows, "residual_weight",
                 **{"registration.weight_opt": "Uniform"})
    comb = _drift(rows, "residual_weight",
                  **{"registration.weight_opt": "Combined"})
    assert comb < uni, (comb, uni)


def test_robustness_envelope(rows):
    """Every configuration in every grid stays under 10% drift on the
    adversarial world — no ablation setting collapses the pipeline."""
    worst = max(float(r["t_err_percent"]) for r in rows)
    assert worst < 10.0, worst
    fails = max(int(r["registration_failures"]) for r in rows)
    assert fails <= 3


def test_robust_loss_bounded(rows):
    """Robust losses (Huber/Cauchy) stay within 2x of the best loss choice
    (the paper finds loss choice secondary on nominal data)."""
    best = min(_drift(rows, "loss_function",
                      **{"registration.loss": l, "registration.loss_limit": ll})
               for l in ("None", "Huber", "Cauchy", "Tukey")
               for ll in ("0.1", "1.0"))
    huber = _drift(rows, "loss_function", **{"registration.loss": "Huber",
                                             "registration.loss_limit": "0.1"})
    assert huber <= 2.0 * best, (huber, best)
