"""Validation stamps for the PH1 skull benchmarks.

The reference suite IS the Aubry et al. (2022) intercomparison; its own
validation is cross-code. Offline (zero-egress) we validate with three
independent checks and stamp the committed artifacts with the results:

1. **nx-refinement convergence** — the axial steady-state amplitude profile
   at nx and at ~1.4*nx must agree (relative L2 over the profile); a
   converged discretisation is insensitive to h.
2. **tf stationarity** — extending the run by extra source periods must not
   change the trailing-window amplitude: the recorded window really is the
   steady state (VERDICT r2: far sensors behind high-contrast bone layers
   see only ~6 settled periods — unchecked until now).
3. **1D transmission cross-check (bone cases)** — for the flat-layer
   benchmarks (BM3, BM4) the plane-wave normal-incidence transmission
   through the layer stack (product of interface coefficients with
   attenuation, the standard impedance-transfer result) predicts the
   amplitude ratio across the skull. The SC1 piston beam is ~plane near
   the axis, so this is a genuine independent physics gate (loose: lateral
   spreading + reverberation are outside the 1D model).

Run on-chip at production resolution:
    python benchmarks/ph1/validate.py --sc 1 --bm 4 --nx 80 --nx-fine 112
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from benchmarks.ph1 import common  # noqa: E402
from benchmarks.ph1.common import (  # noqa: E402
    BM_BACKGROUND,
    BM_LAYERS,
    F0,
    MATERIALS,
    P0,
    W0,
    axial_points,
    build_model,
    steady_amplitude,
)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


_PROFILE_CACHE = {}


def _run_profile(sc, bm, nx, tf=None, dtype=None):
    import time

    tf = tf or (common.DOMAIN_L / 1500.0 + 8.0 / F0)
    key = (sc, bm, nx, round(tf * 1e9), dtype)
    if key in _PROFILE_CACHE:
        return _PROFILE_CACHE[key]
    model, mesh, h, dt, spp = build_model(sc, bm, nx, dtype=dtype)
    pts = axial_points()
    t0 = time.perf_counter()
    u, v, t, times, ys = model.rk_record(0.0, tf, pts)
    elapsed = time.perf_counter() - t0
    ndofs = model.number_of_dofs()
    print(f"  SC{sc}-BM{bm} nx={nx} tf={tf*1e6:.1f}us: {ndofs/1e6:.2f}M DOFs, "
          f"{elapsed:.1f}s")
    # identical (sc, bm, nx, tf) profiles are requested up to 3x per
    # validate() call (convergence + stationarity + stamp) — cache them
    # so chip time is paid once
    result = (pts[0], steady_amplitude(times, ys), times, ys, ndofs)
    _PROFILE_CACHE[key] = result
    return result


def convergence(sc, bm, nx, nx_fine, dtype=None, tf=None):
    """Relative L2 distance between the axial amplitude profiles at two
    resolutions (excluding the near-source singularity x < 5 mm)."""
    x, amp_c, *_ = _run_profile(sc, bm, nx, tf=tf, dtype=dtype)
    _, amp_f, *_ = _run_profile(sc, bm, nx_fine, tf=tf, dtype=dtype)
    sel = x > 0.005
    rel = np.linalg.norm((amp_c - amp_f)[sel]) / np.linalg.norm(amp_f[sel])
    pk_c, pk_f = float(np.max(amp_c)), float(np.max(amp_f))
    print(f"  convergence SC{sc}-BM{bm} nx {nx}->{nx_fine}: profile L2 "
          f"{rel*100:.2f}%  peak {pk_c/1e3:.1f} -> {pk_f/1e3:.1f} kPa "
          f"({abs(pk_c-pk_f)/pk_f*100:.2f}%)")
    return {"nx": nx, "nx_fine": nx_fine, "profile_l2": float(rel),
            "peak_rel": float(abs(pk_c - pk_f) / pk_f)}


def tf_stationarity(sc, bm, nx, extra_periods=4, dtype=None):
    """Amplitude change when the run is extended by ``extra_periods``."""
    base_tf = common.DOMAIN_L / 1500.0 + 8.0 / F0
    x, amp_a, *_ = _run_profile(sc, bm, nx, tf=base_tf, dtype=dtype)
    _, amp_b, *_ = _run_profile(
        sc, bm, nx, tf=base_tf + extra_periods / F0, dtype=dtype
    )
    sel = x > 0.005
    rel = np.linalg.norm((amp_a - amp_b)[sel]) / np.linalg.norm(amp_b[sel])
    print(f"  tf-stationarity SC{sc}-BM{bm} nx={nx} (+{extra_periods}T): "
          f"profile L2 {rel*100:.2f}%")
    return {"nx": nx, "extra_periods": extra_periods, "profile_l2": float(rel)}


def transmission_stack(stack, w0=W0, Z_outer=None):
    """|T| for a plane wave at normal incidence through ``stack`` =
    [(c, rho, alpha_Np_per_m, thickness), ...] between identical outer
    half-spaces of impedance ``Z_outer`` (default: PH1 water) — the
    impedance-transfer matrix result. Pressure amplitude ratio
    transmitted / incident."""
    if Z_outer is None:
        c_w, rho_w, _ = MATERIALS["water"]
        Z_outer = rho_w * c_w
    Zw = Z_outer
    M = np.eye(2, dtype=complex)
    for c, rho, alpha, L in stack:
        k = w0 / c - 1j * alpha
        Z = rho * c
        cos, sin = np.cos(k * L), np.sin(k * L)
        M = M @ np.array([[cos, 1j * Z * sin], [1j * sin / Z, cos]])
    denom = M[0, 0] * Zw + M[0, 1] + Zw * (M[1, 0] * Zw + M[1, 1])
    return float(abs(2.0 * Zw / denom))


def transmission_1d(bm):
    """Plane-wave normal-incidence amplitude transmission through the flat
    layer stack of benchmark ``bm``, water -> water."""
    layers = BM_LAYERS[bm]
    if not layers:
        return 1.0
    stack = []
    for name, xlo, xhi in layers:
        c, rho, att_dB = MATERIALS[name]
        stack.append((c, rho, att_dB / 20.0 * np.log(10.0), xhi - xlo))
    return transmission_stack(stack)


def transmission_check(sc, bm, x, amp, x_ref, amp_ref, tol=0.35):
    """Compare the measured transmission through the (flat) layer stack
    with the 1D impedance-transfer prediction. ``measured`` is the ratio
    of the benchmark profile to the WATER (BM1) profile averaged over a
    window behind the stack — dividing by the free-field profile removes
    both the piston's axial structure and the standing-wave contamination
    in front of the stack. Loose gate: refraction, lateral spreading and
    reverberation are outside the 1D model."""
    layers = BM_LAYERS[bm]
    if not layers or common.BM_CURVED[bm]:
        return None
    x_out0 = layers[-1][2] + 0.005
    win = (x >= x_out0) & (x <= x_out0 + 0.020)
    ref = np.interp(x[win], x_ref, amp_ref)
    measured = float(np.mean(amp[win] / ref))
    predicted = transmission_1d(bm)
    rel = abs(measured - predicted) / predicted
    print(f"  1D transmission SC{sc}-BM{bm}: measured {measured:.3f}  "
          f"predicted {predicted:.3f}  rel {rel*100:.1f}%")
    return {"measured": measured, "predicted": predicted, "rel": float(rel),
            "tol": tol, "pass": bool(rel < tol)}


def _complex_axial_amplitude(z, sc, alpha_np):
    """On-axis steady amplitude of the SC1 piston / SC2 bowl in a medium
    with attenuation ``alpha_np`` (Np/m), from the exact two-ray form of
    the Rayleigh/O'Neil solutions with complex wavenumber: each of the
    axial (path z) and edge (path r_e) contributions carries its own
    exp(-alpha * path):

        SC1:  |p| = p0 |e^{i k̃ z} - e^{i k̃ R}|,  R = sqrt(z^2 + a^2)
        SC2:  |p| = p0 |e^{i k̃ z} - e^{i k̃ r_e}| / |1 - z/roc|

    At alpha=0 these reduce exactly to ``piston_axial_amplitude`` /
    ``oneil_axial_amplitude`` (the PH1 water ground truth — the Aubry
    et al. intercomparison itself scores the water benchmarks against
    these closed forms; the published per-model tables are not reachable
    offline, so these ARE the literature reference values for BM1/BM2).

    ``z`` is the DOMAIN coordinate (source plane at z=0). For SC2 the
    simulated source is the bowl's rim-plane phased equivalent, so the
    O'Neil apex coordinate is z + h (h = bowl depth) — the same shift the
    committed-artifact gate uses (``tests/test_ph1.py``)."""
    z = np.asarray(z, np.float64)
    cw = MATERIALS["water"][0]
    kt = W0 / cw + 1j * alpha_np
    if sc == 1:
        a = common.SC1_RADIUS
        R = np.sqrt(z * z + a * a)
        return P0 * np.abs(np.exp(1j * kt * z) - np.exp(1j * kt * R))
    a, roc = common.SC2_APERTURE, common.SC2_ROC
    h = roc - np.sqrt(roc * roc - a * a)
    zo = z + h  # O'Neil apex coordinate
    # the removable singularity at the geometric focus (r_e -> zo there):
    # evaluate at roc - eps like ``oneil_axial_amplitude``
    eps = 1e-6 * roc
    zo = np.where(np.abs(1.0 - zo / roc) < 1e-7, roc - eps, zo)
    r_e = np.sqrt((zo - h) ** 2 + a * a)
    denom = np.abs(1.0 - zo / roc)
    return P0 * np.abs(np.exp(1j * kt * zo) - np.exp(1j * kt * r_e)) / denom


def focal_metrics(x, amp, lo=0.005):
    """(focal pressure Pa, focal position m, -6 dB axial extent m) from an
    axial amplitude profile. Peak position refined with a 3-point parabola;
    -6 dB crossings linearly interpolated around the peak (the standard
    intercomparison focal metrics: maximum pressure, its position, and the
    axial full length at half the maximum)."""
    x = np.asarray(x, np.float64)
    amp = np.asarray(amp, np.float64)
    sel = x >= lo
    xs, As = x[sel], amp[sel]
    i = int(np.argmax(As))
    pk, xpk = float(As[i]), float(xs[i])
    if 0 < i < len(xs) - 1:
        y0, y1, y2 = As[i - 1], As[i], As[i + 1]
        d = y0 - 2 * y1 + y2
        if d < 0:
            off = 0.5 * (y0 - y2) / d
            xpk = float(xs[i] + off * (xs[min(i + 1, len(xs) - 1)] - xs[i]))
            pk = float(y1 - 0.25 * (y0 - y2) * off)
    half = 0.5 * pk  # -6 dB in pressure amplitude
    jlo = i
    while jlo > 0 and As[jlo] > half:
        jlo -= 1
    jhi = i
    while jhi < len(As) - 1 and As[jhi] > half:
        jhi += 1
    def _cross(j0, j1):
        a0, a1 = As[j0], As[j1]
        if a1 == a0:
            return xs[j0]
        t = (half - a0) / (a1 - a0)
        return xs[j0] + t * (xs[j1] - xs[j0])
    x_lo = _cross(jlo, jlo + 1) if As[jlo] <= half else float(xs[0])
    x_hi = _cross(jhi - 1, jhi) if As[jhi] <= half else float(xs[-1])
    return pk, xpk, float(x_hi - x_lo)


def focal_reference(sc, bm):
    """Closed-form focal metrics for the water benchmarks (BM1 exact, BM2
    exact two-ray with attenuation). None for the skull cases — their
    published intercomparison tables are not reachable offline; they are
    gated by the 1D transmission model instead."""
    if bm not in (1, 2):
        return None
    att_dB = MATERIALS[BM_BACKGROUND[bm]][2]
    alpha = att_dB / 20.0 * np.log(10.0)
    z = np.linspace(0.0, common.DOMAIN_L, 48001)
    amp = _complex_axial_amplitude(z, sc, alpha)
    pk, xpk, ext = focal_metrics(z, amp)
    return {"focal_p": pk, "focal_x": xpk, "ext6": ext}


PUBLISHED_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "published_values.json"
)


def published_values(sc, bm):
    """Focal metrics reported by the Aubry et al. (2022) intercomparison
    (J. Acoust. Soc. Am. 152, 1003), if a transcription is available.

    The tables themselves are NOT committed: this build environment has no
    network egress, and numbers that cannot be checked against the actual
    paper/ supplementary repository (ucl-bug/transcranial-ultrasound-
    benchmarks) would be fabricated data — worse than the gap.  Instead
    this loader reads ``published_values.json`` next to this file when
    someone with access to the paper drops it in.  Schema (all fields
    required so provenance is never lost):

        {"SC1-BM1": {"source": "doi:10.1121/10.0013426, Table III",
                     "code": "KWAVE",
                     "focal_p_Pa": ..., "focal_x_m": ..., "ext6_m": ...},
         ...}

    Until then the water benchmarks are gated against the EXACT closed
    forms (O'Neil / two-ray piston — the same ground truth the
    intercomparison's water cases are judged against), and the skull cases
    against the 1D impedance-transfer transmission model."""
    if not os.path.exists(PUBLISHED_FILE):
        return None
    with open(PUBLISHED_FILE) as f:
        table = json.load(f)
    ent = table.get(f"SC{sc}-BM{bm}")
    if ent is None:
        return None
    missing = {"source", "code", "focal_p_Pa", "focal_x_m", "ext6_m"} - set(ent)
    if missing:
        raise ValueError(
            f"published_values.json SC{sc}-BM{bm}: missing fields {missing} "
            "(provenance is required; see published_values docstring)"
        )
    return ent


def published_comparison(sc, bm, x, amp):
    """Deltas vs a transcribed intercomparison entry (when available)."""
    ent = published_values(sc, bm)
    if ent is None:
        return None
    pk, xpk, ext = focal_metrics(x, amp)
    out = {
        "published": ent,
        "measured": {"focal_p": pk, "focal_x": xpk, "ext6": ext},
        "dp_rel": float(abs(pk - ent["focal_p_Pa"]) / ent["focal_p_Pa"]),
        "dx_mm": float(abs(xpk - ent["focal_x_m"]) * 1e3),
        "dext_rel": float(abs(ext - ent["ext6_m"]) / ent["ext6_m"]),
    }
    print(
        f"  vs published ({ent['code']}, {ent['source']}): "
        f"dP {out['dp_rel']*100:.2f}%  dx {out['dx_mm']:.2f} mm  "
        f"dext {out['dext_rel']*100:.1f}%"
    )
    return out


def focal_comparison(sc, bm, x, amp):
    """Measured-vs-reference focal metric deltas for a water benchmark."""
    ref = focal_reference(sc, bm)
    if ref is None:
        return None
    pk, xpk, ext = focal_metrics(x, amp)
    out = {
        "measured": {"focal_p": pk, "focal_x": xpk, "ext6": ext},
        "reference": ref,
        "dp_rel": float(abs(pk - ref["focal_p"]) / ref["focal_p"]),
        "dx_mm": float(abs(xpk - ref["focal_x"]) * 1e3),
        "dext_rel": float(abs(ext - ref["ext6"]) / ref["ext6"]),
    }
    print(
        f"  focal SC{sc}-BM{bm}: P {pk/1e3:.1f} kPa (ref "
        f"{ref['focal_p']/1e3:.1f}, {out['dp_rel']*100:.2f}%)  x "
        f"{xpk*1e3:.2f} mm (ref {ref['focal_x']*1e3:.2f}, "
        f"d {out['dx_mm']:.2f} mm)  -6dB ext {ext*1e3:.1f} mm (ref "
        f"{ref['ext6']*1e3:.1f}, {out['dext_rel']*100:.1f}%)"
    )
    return out


def validate(sc, bm, nx, nx_fine, dtype=None, out=None):
    """Full validation stamp: convergence + stationarity + (flat-layer)
    transmission; writes/updates the metadata JSON next to the artifact."""
    import jax

    stamp = {"sc": sc, "bm": bm, "platform": jax.default_backend()}
    stamp["convergence"] = convergence(sc, bm, nx, nx_fine, dtype=dtype)
    stamp["tf_stationarity"] = tf_stationarity(sc, bm, nx, dtype=dtype)
    x, amp, *_ = _run_profile(sc, bm, nx, dtype=dtype)
    fc = focal_comparison(sc, bm, x, amp)
    if fc is not None:
        stamp["focal"] = fc
    pc = published_comparison(sc, bm, x, amp)
    if pc is not None:
        stamp["published"] = pc
    tc = None
    if BM_LAYERS[bm] and not common.BM_CURVED[bm]:
        xw, ampw, *_ = _run_profile(sc, 1, nx, dtype=dtype)
        tc = transmission_check(sc, bm, x, amp, xw, ampw)
    if tc is not None:
        stamp["transmission_1d"] = tc
    out = out or os.path.join(RESULTS, f"validation_sc{sc}_bm{bm}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(stamp, f, indent=1)
    print(f"  wrote {out}")
    return stamp


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sc", type=int, default=1)
    ap.add_argument("--bm", type=int, default=4)
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--nx-fine", type=int, default=112)
    args = ap.parse_args()
    validate(args.sc, args.bm, args.nx, args.nx_fine)
