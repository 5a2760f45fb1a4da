"""PH1 suite: geometry voxelisation, oracles, and a smoke run.

The quantitative validation of SC1-BM1 / SC2-BM1 against the piston /
O'Neil axial solutions needs production resolution (~12M DOF) and runs on
the TPU (results committed under ``benchmarks/ph1/results/``); these tests
pin the host-side pieces that make those runs meaningful.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "ph1_common",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "ph1", "common.py"),
)
ph1 = importlib.util.module_from_spec(_spec)
sys.modules["ph1_common"] = ph1
_spec.loader.exec_module(ph1)

from fenicsxfus_tpu.analysis.analytical import (  # noqa: E402
    oneil_axial_amplitude,
    piston_axial_amplitude,
)


def test_flat_layer_voxelisation():
    mesh, h = ph1.build_mesh(48, 4)
    c0, rho0, delta0 = ph1.build_media(mesh, 4)
    mids = mesh.cell_midpoints()
    # skin layer [26, 30] mm
    skin = (mids[:, 0] >= 0.026) & (mids[:, 0] < 0.030)
    assert np.all(c0[skin] == 1610.0)
    assert np.all(rho0[skin] == 1090.0)
    # water before the stack
    water = mids[:, 0] < 0.026
    assert np.all(c0[water] == 1500.0)
    assert np.all(delta0[water] == 0.0)
    # trabecular band present
    assert np.any(c0 == 2300.0)


def test_curved_layer_voxelisation():
    mesh, h = ph1.build_mesh(48, 4)
    c0, _, _ = ph1.build_media(mesh, 5)
    mids = mesh.cell_midpoints()
    # the apex cell column (on axis, x≈30-36.5mm) is bone
    on_axis = (np.abs(mids[:, 1]) < h) & (np.abs(mids[:, 2]) < h)
    apex = on_axis & (mids[:, 0] > 0.031) & (mids[:, 0] < 0.036)
    assert np.all(c0[apex] == 2800.0)
    # off-axis at the same x, the curved layer has moved deeper → water
    off = (
        (np.abs(mids[:, 1]) > 0.030)
        & (mids[:, 0] > 0.030)
        & (mids[:, 0] < 0.0365)
    )
    assert np.all(c0[off] == 1500.0)
    # curvature: layer must appear at larger x off-axis
    ring = (np.abs(mids[:, 1] - 0.02) < h / 2) & (np.abs(mids[:, 2]) < h)
    xs_bone = mids[ring & (c0 == 2800.0), 0]
    assert xs_bone.size and xs_bone.min() > 0.0315  # apex shifted deeper


def test_piston_oracle_basics():
    k = 2 * np.pi * ph1.F0 / 1500.0
    a, p0 = ph1.SC1_RADIUS, ph1.P0
    z = np.linspace(1e-4, 0.12, 2000)
    amp = piston_axial_amplitude(z, a, k, p0)
    # far field decays like p0·k a²/(2z)
    far = amp[z > 0.09]
    approx = p0 * k * a * a / (2 * z[z > 0.09])
    assert np.allclose(far, approx, rtol=0.08)
    # last axial maximum at z = (a² − λ²/4)/λ ≈ a²/λ
    lam = 1500.0 / ph1.F0
    z_last = (a * a - lam * lam / 4) / lam
    assert abs(z[np.argmax(amp * (z > 0.02))] - z_last) < 2e-3
    assert np.max(amp) <= 2 * p0 + 1e-9


def test_oneil_oracle_basics():
    k = 2 * np.pi * ph1.F0 / 1500.0
    a, roc, p0 = ph1.SC2_APERTURE, ph1.SC2_ROC, ph1.P0
    z = np.linspace(1e-3, 0.12, 4000)
    amp = oneil_axial_amplitude(z, a, roc, k, p0)
    zpk = z[np.argmax(amp)]
    # peak close to (slightly before) the geometric focus
    assert roc - 0.01 < zpk <= roc + 1e-3
    # focal gain ≈ k·h (h = bowl depth) — classical O'Neil result
    h = roc - np.sqrt(roc**2 - a**2)
    gain = np.max(amp) / p0
    assert abs(gain - k * h) / (k * h) < 0.15
    # finite at the geometric focus (removable singularity)
    assert np.isfinite(oneil_axial_amplitude(np.array([roc]), a, roc, k, p0))[0]


RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "ph1", "results",
)


def test_committed_results_complete_and_water_cases_match_oracles():
    """The committed production artifacts (v5e chip, nx=80) must exist for
    all 14 scenarios, and the water-only baselines must match their
    analytical axial solutions: SC1-BM1 vs the baffled piston, SC2-BM1 vs
    O'Neil (rim-plane shifted)."""
    import json

    missing = [
        (sc, bm)
        for sc in (1, 2)
        for bm in range(1, 8)
        if not os.path.exists(os.path.join(RESULTS, f"sc{sc}_bm{bm}.npz"))
    ]
    if missing:
        pytest.skip(f"production artifacts not present: {missing}")

    c0 = 1500.0
    k = 2 * np.pi * ph1.F0 / c0

    d = np.load(os.path.join(RESULTS, "sc1_bm1.npz"))
    x, amp = d["x"], d["amplitude"]
    ref = piston_axial_amplitude(x, ph1.SC1_RADIUS, k, ph1.P0)
    i_pk = int(np.argmax(amp))
    # last axial maximum position (a^2/lambda ~ 33 mm) within 2 sensor steps
    lam = c0 / ph1.F0
    z_last = ph1.SC1_RADIUS**2 / lam
    assert abs(x[i_pk] - z_last) < 3e-3
    # peak amplitude ~ 2 p0
    assert abs(amp[i_pk] - 2 * ph1.P0) / (2 * ph1.P0) < 0.1
    # far-field decay matches the oracle within 15%
    far = x > 0.08
    assert np.linalg.norm(amp[far] - ref[far]) / np.linalg.norm(ref[far]) < 0.15

    d = np.load(os.path.join(RESULTS, "sc2_bm1.npz"))
    x, amp = d["x"], d["amplitude"]
    a, roc = ph1.SC2_APERTURE, ph1.SC2_ROC
    h = roc - np.sqrt(roc**2 - a**2)
    ref = oneil_axial_amplitude(x + h, a, roc, k, ph1.P0)
    i_pk, i_rf = int(np.argmax(amp)), int(np.argmax(ref))
    assert abs(x[i_pk] - x[i_rf]) < 4e-3  # focal position
    assert abs(amp[i_pk] - ref[i_rf]) / ref[i_rf] < 0.12  # focal gain
    meta = json.loads(str(d["meta"]))
    assert meta["ndofs"] > 10_000_000  # genuinely production resolution


@pytest.mark.parametrize(
    "sc,bm",
    [(1, 1), pytest.param(1, 3, marks=pytest.mark.slow), (2, 2)],
)
def test_ph1_smoke(sc, bm):
    """Tiny run: finite fields, source switches on, sensors recorded."""
    import jax.numpy as jnp

    x, amp = ph1.run(sc, bm, nx=12, final_time=6.0e-6, dtype=jnp.float64)
    assert np.all(np.isfinite(amp))
    assert amp[0] > 0.0  # pressure near the source plane
