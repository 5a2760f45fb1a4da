"""PH1 validation harness (benchmarks/ph1/validate.py).

Gates the 1D impedance-transfer transmission model against closed-form
limits, and a real layered simulation against that model — the independent
physics check used to stamp the committed skull-case artifacts (the
reference validates cross-code inside the Aubry et al. intercomparison,
which is not reachable offline).
"""

import numpy as np
import pytest

from benchmarks.ph1.validate import (
    transmission_1d,
    transmission_check,
    transmission_stack,
)
from benchmarks.ph1.common import MATERIALS, W0


def test_transmission_limits():
    cw, rw, _ = MATERIALS["water"]
    # no layers: perfect transmission
    assert transmission_stack([]) == pytest.approx(1.0)
    # a water layer is transparent at any thickness
    assert transmission_stack([(cw, rw, 0.0, 0.0123)]) == pytest.approx(1.0)
    # lossless half-wave layer is transparent regardless of impedance
    c, rho = 2800.0, 1850.0
    L_half = np.pi * c / W0
    assert transmission_stack([(c, rho, 0.0, L_half)]) == pytest.approx(
        1.0, abs=1e-9
    )
    # lossless quarter-wave layer: |T| = 2 r / (1 + r^2), r = Zw/Z
    L_q = 0.5 * np.pi * c / W0
    r = (cw * rw) / (c * rho)
    expect = 2 * r / (1 + r * r)
    assert transmission_stack([(c, rho, 0.0, L_q)]) == pytest.approx(
        expect, rel=1e-9
    )
    # attenuation only reduces |T|
    t0 = transmission_1d(3)
    assert 0.0 < t0 < 1.0


def test_transmission_vs_simulation_1d():
    """Plane wave through a flat bone-like slab in 1D: the steady
    transmitted amplitude must match the impedance-transfer prediction."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LossySpectralExplicit,
        compute_diffusivity_of_sound,
        create_interval,
        tag_boundaries,
    )

    f0 = 10.0
    w0 = 2 * np.pi * f0
    c_w, rho_w = 1.0, 1.0
    c_b, rho_b, att_dB = 1.9, 1.8, 2.0  # impedance contrast 3.4, mild loss
    L = 1.0
    xlo, xhi = 0.45, 0.53
    n = 160
    mesh = tag_boundaries(
        create_interval(n, 0.0, L),
        {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12},
    )
    mids = mesh.cell_midpoints()[:, 0]
    inb = (mids >= xlo) & (mids < xhi)
    c0 = np.where(inb, c_b, c_w)
    rho0 = np.where(inb, rho_b, rho_w)
    alpha = att_dB / 20 * np.log(10)
    delta = np.where(inb, 2 * alpha * c_b**3 / w0**2, 0.0)
    dt = 0.25 / n / c_b / 16
    m = LossySpectralExplicit(
        mesh, None, 4, c0, rho0, delta, f0, 1.0, c_w, 4, dt,
        dtype=jnp.float64,
    )
    m.init()
    # Timing: the source facet is a reflecting Neumann baffle, so the wave
    # reflected off the slab returns and re-transmits — a cavity bounce
    # that the 1D transfer-matrix does NOT model. Measure the transmitted
    # amplitude in the window AFTER the direct wave has settled (source
    # ramp + a few slab-internal round trips) and BEFORE the second bounce
    # arrives behind the slab.
    xs = np.linspace(xhi + 0.03, xhi + 0.10, 8)
    slab_rt = 2 * (xhi - xlo) / c_b
    arrive = xlo / c_w + (xhi - xlo) / c_b + (xs[-1] - xhi) / c_w
    t_lo = arrive + 4.0 / f0 + 4 * slab_rt  # ramp (4 periods) + ring-down
    t_bounce = arrive + 2 * xlo / c_w  # extra slab->source->slab path
    t_hi = min(t_lo + 2.0 / f0, t_bounce - 0.02)
    assert t_hi - t_lo >= 1.0 / f0  # at least one full period recorded
    m.rk(0.0, t_lo)
    *_, times, ys = m.rk_record(t_lo, t_hi, xs[None, :])
    amp = np.max(np.abs(np.asarray(ys)), axis=0)
    measured = float(np.mean(amp))  # incident amplitude is 1 by p0/s0 scaling
    predicted = transmission_stack(
        [(c_b, rho_b, alpha, xhi - xlo)], w0=w0, Z_outer=c_w * rho_w
    )
    assert abs(measured - predicted) / predicted < 0.08, (measured, predicted)


def test_committed_validation_stamps():
    """The chip-run convergence/stationarity stamps on the PH1 artifacts
    (benchmarks/ph1/validate.py, VERDICT r2 missing #4): water (SC1-BM1)
    must be tightly converged; the skull case (SC1-BM4) within the
    resolution of bone at nx=80, with the independent 1D transmission
    check passing."""
    import json
    import os

    res = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "ph1", "results")
    f1 = os.path.join(res, "validation_sc1_bm1.json")
    f4 = os.path.join(res, "validation_sc1_bm4.json")
    if not (os.path.exists(f1) and os.path.exists(f4)):
        import pytest

        pytest.skip("validation stamps not committed yet")
    with open(f1) as fh:
        v1 = json.load(fh)
    with open(f4) as fh:
        v4 = json.load(fh)
    assert v1["platform"] == "tpu"
    assert v1["convergence"]["profile_l2"] < 0.05
    assert v1["convergence"]["peak_rel"] < 0.01
    assert v1["tf_stationarity"]["profile_l2"] < 0.01
    assert v4["convergence"]["profile_l2"] < 0.15
    assert v4["convergence"]["peak_rel"] < 0.08
    assert v4["tf_stationarity"]["profile_l2"] < 0.06
    assert v4["transmission_1d"]["pass"] is True


def test_transmission_check_plumbing():
    """transmission_check wires profiles through to a stamped dict."""
    x = np.linspace(0.0, 0.12, 121)
    t4 = transmission_1d(4)
    amp_ref = np.ones_like(x)
    amp = np.where(x > 0.037, t4, 1.0)
    out = transmission_check(1, 4, x, amp, x, amp_ref)
    assert out["pass"] and abs(out["measured"] - t4) < 1e-12
    # water case: no stack to check
    assert transmission_check(1, 1, x, amp, x, amp_ref) is None


def test_focal_metrics_water_vs_closed_form():
    """Intercomparison-style focal metrics (focal pressure, focal position,
    -6 dB axial extent) of the committed water artifacts vs the closed-form
    axial solutions (piston / O'Neil two-ray with complex wavenumber for
    the attenuated BM2 cases). The Aubry et al. published per-model tables
    are unreachable offline; for the water benchmarks the closed forms ARE
    the intercomparison's ground truth. Measured deltas at nx=80 (v5e
    artifacts): P within 12%, position within 1.5 mm, extent within 10%."""
    import os

    import numpy as np
    import pytest

    from benchmarks.ph1.validate import focal_comparison

    results = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "ph1", "results",
    )
    gates = {
        # (sc, bm): (dp_rel, dx_mm, dext_rel) — current deltas + margin
        (1, 1): (0.05, 2.0, 0.15),
        (1, 2): (0.12, 1.5, 0.10),
        (2, 1): (0.10, 1.5, 0.05),
        (2, 2): (0.15, 1.5, 0.05),
    }
    for (sc, bm), (gp, gx, ge) in gates.items():
        path = os.path.join(results, f"sc{sc}_bm{bm}.npz")
        if not os.path.exists(path):
            pytest.skip(f"artifact sc{sc}_bm{bm} missing")
        d = np.load(path)
        fc = focal_comparison(sc, bm, d["x"], d["amplitude"])
        assert fc["dp_rel"] < gp, (sc, bm, fc)
        assert fc["dx_mm"] < gx, (sc, bm, fc)
        assert fc["dext_rel"] < ge, (sc, bm, fc)


def test_focal_reference_consistent_with_oracles():
    """At alpha=0 the complex two-ray forms must reduce exactly to the
    package's piston/O'Neil oracles (incl. the removable singularity at the
    geometric focus and the rim-plane coordinate shift)."""
    import numpy as np

    import benchmarks.ph1.common as common
    from benchmarks.ph1.validate import _complex_axial_amplitude
    from fenicsxfus_tpu.analysis.analytical import (
        oneil_axial_amplitude,
        piston_axial_amplitude,
    )

    k = 2 * np.pi * common.F0 / 1500.0
    z = np.linspace(0.0, common.DOMAIN_L, 20001)
    p1 = _complex_axial_amplitude(z, 1, 0.0)
    r1 = piston_axial_amplitude(z, common.SC1_RADIUS, k, common.P0)
    assert np.max(np.abs(p1 - r1)) < 1e-6 * np.max(r1)
    a, roc = common.SC2_APERTURE, common.SC2_ROC
    h = roc - np.sqrt(roc * roc - a * a)
    p2 = _complex_axial_amplitude(z, 2, 0.0)
    r2 = oneil_axial_amplitude(z + h, a, roc, k, common.P0)
    ok = np.abs(1.0 - (z + h) / roc) > 1e-4  # away from the limit point
    assert np.max(np.abs((p2 - r2)[ok])) < 1e-6 * np.max(r2)


def test_harmonic_resolved_h131_artifact():
    """The committed harmonic-resolved 1.1 MHz W-H131-WATER run (p=5,
    84.6M DOF, chip) must pass the focal-approach Fubini harmonic gate
    (VERDICT r3 #7): 2nd-harmonic growth within 35% median / 60% worst,
    3rd within 60% median of the accumulated-Fubini expectation."""
    import os
    import sys

    import pytest

    hitu = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "hitu",
    )
    art = os.path.join(hitu, "results", "w_h131_water_p5_full11MHz.npz")
    if not os.path.exists(art):
        pytest.skip("p=5 1.1 MHz artifact not committed")
    sys.path.insert(0, hitu)
    try:
        from harmonics import analyze

        res = analyze(art)
    finally:
        sys.path.remove(hitu)
    gate = res["gate"]
    assert gate is not None and gate["pass"], gate
    # the run is genuinely at the true reference frequency and resolved
    meta = res["meta"]
    assert abs(meta["f0"] - 1.1e6) < 1e3
    assert meta["degree"] >= 5 and meta["ndofs"] > 50_000_000


def test_published_values_loader_schema():
    """The published-values loader (benchmarks/ph1/validate.py) enforces
    provenance: entries without source/code/metric fields are rejected, a
    missing file or benchmark yields None (closed-form gates remain the
    active validation), and a complete entry produces the delta record."""
    import json as _json
    import tempfile

    from benchmarks.ph1 import validate as V

    orig = V.PUBLISHED_FILE
    try:
        V.PUBLISHED_FILE = "/nonexistent/published.json"
        assert V.published_values(1, 1) is None

        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            _json.dump({"SC1-BM1": {"code": "KWAVE", "focal_p_Pa": 1.0e6}}, f)
            V.PUBLISHED_FILE = f.name
        with pytest.raises(ValueError, match="provenance"):
            V.published_values(1, 1)
        assert V.published_values(1, 2) is None  # absent benchmark -> None

        with open(V.PUBLISHED_FILE, "w") as f:
            _json.dump({"SC1-BM1": {
                "source": "doi:10.1121/10.0013426, Table III",
                "code": "KWAVE", "focal_p_Pa": 1.0e6,
                "focal_x_m": 0.0635, "ext6_m": 0.020}}, f)
        x = np.linspace(0.0, 0.12, 2001)
        amp = 1.0e6 * np.exp(-((x - 0.0635) / 0.009) ** 2)
        rec = V.published_comparison(1, 1, x, amp)
        assert rec is not None
        assert rec["dp_rel"] < 1e-3 and rec["dx_mm"] < 0.1
    finally:
        V.PUBLISHED_FILE = orig
