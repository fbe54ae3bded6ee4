"""Robustness-envelope checks on the committed simulator-sensitivity sweep.

`eval_results/sim_sensitivity.csv` is produced by
`tools/run_sim_sensitivity.py`: the FIXED CFEAR-3 pipeline over simulator
worlds with each generator knob pushed away from its default (wall
density, texture contrast, speckle scale, scatterer count, dynamic
objects, encoder jitter, receiver saturation, multipath ghosts). These
assertions are the simulator-overfit guard (VERDICT r3 #6): accuracy must
degrade SMOOTHLY across the envelope — a cliff at any knob would mean the
headline drift is tuned to the simulator's own defaults.
"""

import csv
import os

import numpy as np
import pytest

CSV = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "eval_results", "sim_sensitivity.csv")

KNOBS = ("wall_density", "texture_contrast", "speckle_scale", "scatterers",
         "dynamic_objects", "azimuth_jitter", "saturation", "multipath")


@pytest.fixture(scope="module")
def rows():
    if not os.path.exists(CSV):
        pytest.skip("sim sensitivity CSV not generated yet")
    with open(CSV) as f:
        return list(csv.DictReader(f))


def _mean_drift(rows, knob, level=None):
    vals = [float(r["t_err_percent"]) for r in rows
            if r["knob"] == knob and (level is None or r["level"] == level)]
    assert vals, (knob, level)
    return float(np.mean(vals))


def test_sweep_complete(rows):
    assert {r["knob"] for r in rows} >= set(KNOBS) | {"baseline",
                                                      "beyond_envelope"}
    assert len({r["seed"] for r in rows}) >= 2
    # every run produced a finite drift — no knob level crashed the engine
    assert all(np.isfinite(float(r["t_err_percent"])) for r in rows)


def test_beyond_envelope_regimes_documented(rows):
    """The FAILURE regimes outside the envelope are measured and recorded
    (the honest edge of the robustness claim): noise floor >= 2x nominal
    with the fixed z_min detector, deep receiver saturation, and
    feature-starved worlds. These rows are allowed — required, even — to
    be bad; they pin WHERE the cliff lives so envelope drift numbers
    can't be mistaken for universal claims."""
    levels = {r["level"] for r in rows if r["knob"] == "beyond_envelope"}
    assert levels >= {"noise_20", "noise_24", "sat_8m", "scat_60"}


def test_no_cliff_inside_envelope(rows):
    """Each envelope level stays within a bounded factor of baseline:
    smooth degradation, not a collapse. The bound (15x, floor 2.5%) sits
    an order of magnitude BELOW the divergence regime (the measured
    beyond-envelope cliffs run 12-99% — see the beyond_envelope rows),
    while the hard envelope edges (feature-poor worlds, 40 moving
    objects, 1.33x noise floor) legitimately reach 1-2%."""
    base = _mean_drift(rows, "baseline")
    for knob in KNOBS:
        levels = {r["level"] for r in rows if r["knob"] == knob}
        for level in levels:
            d = _mean_drift(rows, knob, level)
            assert d < max(15.0 * base, 2.5), (knob, level, d, base)


def test_harder_levels_degrade_smoothly(rows):
    """Within each knob, the step from one level to the next stays bounded
    (no threshold cliff inside the envelope): consecutive levels may
    degrade, but not by the 10-100x jump that marks a collapse."""
    for knob in KNOBS:
        levels = sorted({r["level"] for r in rows if r["knob"] == knob})
        drifts = [_mean_drift(rows, knob, lv) for lv in levels]
        for a, b in zip(drifts, drifts[1:]):
            assert b < max(6.0 * a, 2.5), (knob, drifts)


def test_failure_counting_stays_sane(rows):
    """The divergence-as-failure gates may fire on hard worlds, but the
    engine must not report wholesale failure on any envelope level."""
    n_frames = 128
    for r in rows:
        assert int(r["registration_failures"]) < n_frames // 4, r


def test_noise_cliff_mitigated_by_adaptive_threshold(rows):
    """The adaptive noise-floor threshold (`filter.z_min_quantile=0.98`)
    must rescue the worlds that collapse with the fixed z_min=60 detector
    (the 12-94% beyond_envelope noise rows) up to ~2x the nominal floor;
    at 3x (SNR ~ 1, noise_36_q98) the failure is physical — that row is
    REQUIRED to stay recorded under beyond_envelope with the flag on."""
    levels = {r["level"] for r in rows if r["knob"] == "mitigated"}
    assert levels >= {"noise_20_q98", "noise_24_q98"}
    assert _mean_drift(rows, "mitigated", "noise_20_q98") < 2.5
    assert _mean_drift(rows, "mitigated", "noise_24_q98") < 6.0
    beyond = {r["level"] for r in rows if r["knob"] == "beyond_envelope"}
    assert "noise_36_q98" in beyond
