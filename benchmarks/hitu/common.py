"""HITU focused-bowl benchmark suite (Groth et al. 2021 comparison).

TPU-native reimplementation of the reference's HITU drivers
(``cpp/fenicsx-sf-fastor/benchmarks/HITU/{W-H101,W-H131}-{WATER,LIVER}``
and the lossy variant ``cpp/fenicsx-sf-naive/benchmarks/HITU/V-H131-WATER``):
Sonic Concepts H101 (64 mm aperture, 63.2 mm radius of curvature) and H131
(33 mm aperture, 35 mm ROC) bowl transducers driving Westervelt / lossy
propagation in water or liver at 1.1 MHz.

The reference meshes the curved bowl surface and drives it through facet
tags (meshes read from absolute HPC paths, not distributed with its repo).
Here the bowl is an equivalent *phased flat aperture*: exact-focus delays
plus the spherical-cap obliquity weight 1/cosθ (``models/focused.py``),
validated against the O'Neil (1949) axial solution by
``validate_oneil`` below (results committed under ``results/``).

At the true 1.1 MHz the resolved H101 problem is ~360M DOF (the reference
runs it on an HPC cluster); the default here scales the frequency so a
resolved mesh fits one chip — ``--full`` selects the true parameters for
multi-chip runs.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def _platform() -> str:
    """Provenance tag for committed artifacts (chip vs CPU-reduced runs)."""
    import jax

    return jax.default_backend()

# transducer geometry: (half-aperture a, radius of curvature, domain length)
# H101: 64 mm aperture / 63.2 mm ROC; H131: 33 mm aperture / 35 mm ROC
# (Groth et al. 2021; domain lengths from the reference mains:
#  W-H101-*: 0.12 m, W-H131-*: 0.08 m)
TRANSDUCERS = {
    "H101": {"a": 0.032, "roc": 0.0632, "L": 0.12, "W": 0.07},
    "H131": {"a": 0.0165, "roc": 0.035, "L": 0.08, "W": 0.044},
}

# media: (c0 m/s, rho0 kg/m^3, beta, attenuation dB/m)
# WATER: W-H101-WATER/main.cpp:33-44; LIVER: W-H101-LIVER/main.cpp:33-47
MEDIA = {
    "WATER": {"c0": 1480.0, "rho0": 1000.0, "beta": 3.5, "att_dB": 0.2},
    "LIVER": {"c0": 1590.0, "rho0": 1060.0, "beta": 4.4, "att_dB": 90.0},
}

F0_FULL = 1.1e6  # source frequency (Hz), all reference HITU mains

# source velocities u0 (m/s); p0 = rho c u0 (reference main.cpp:36-37).
# The W- values are the fastor drivers'; V-H131-WATER (lossy) uses the
# sf-naive value 0.2726428.
SOURCE_VELOCITY = {
    ("W", "H101", "WATER"): 0.13984880278551745,
    ("W", "H101", "LIVER"): 0.1853331526917232,
    ("W", "H131", "WATER"): 0.38557513826589934,
    ("W", "H131", "LIVER"): 0.3613169918914827,
    ("V", "H131", "WATER"): 0.2726428,
}


def build_model(kind: str, tx: str, medium: str, nx: int, degree: int = 4,
                f0: float | None = None, cfl: float = 0.4, dtype=None,
                linear: bool = False, nyz: int | None = None):
    """Model for variant ``kind`` ("W" Westervelt / "V" lossy) on transducer
    ``tx`` in ``medium``. ``linear=True`` zeroes β and δ (O'Neil
    validation). Default degree 4 for the scaled single-chip runs; the
    reference uses p=6 at 1.1 MHz."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import create_box, tag_boundaries
    from fenicsxfus_tpu.models.focused import WesterveltSpectralFocused

    dtype = dtype or jnp.float32
    g = TRANSDUCERS[tx]
    m = MEDIA[medium]
    f0 = f0 or F0_FULL
    c0, rho0 = m["c0"], m["rho0"]
    u0 = SOURCE_VELOCITY[(kind, tx, medium)]
    p0 = rho0 * c0 * u0
    w0 = 2 * np.pi * f0
    alphaNp = m["att_dB"] / 20 * np.log(10)
    delta0 = 0.0 if linear else 2 * alphaNp * c0**3 / w0**2
    beta0 = 0.0 if (linear or kind == "V") else m["beta"]

    L, W = g["L"], g["W"]
    h = L / nx
    # nyz: lateral cell count override. Default cubic cells; the p=5
    # harmonic-resolved 1.1 MHz run uses a coarser lateral grid (the v3
    # stage VMEM window budget caps G1/G2 at ~325 for p>=5 on v5e —
    # _pick_be) which is valid for the PRE-FOCAL on-axis harmonic study:
    # there the field's lateral structure is beam-scale, not λ-scale.
    nyz = nyz or max(int(round(W / h)), 2)
    mesh = create_box(
        (nx, nyz, nyz), (0.0, -W / 2, -W / 2), (L, W / 2, W / 2)
    )
    a = g["a"]
    eps = 1e-9

    def src(x):
        return (x[0] < eps) & (np.hypot(x[1], x[2]) <= a)

    tag_boundaries(mesh, {1: src}, default=2)

    # CFL dt rounded to integer steps per period (reference main.cpp:108-111)
    dt_cfl = cfl * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl) + 1
    dt = 1 / f0 / spp

    model = WesterveltSpectralFocused(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
        aperture_radius=a, focal_distance=g["roc"],
        center=np.array([0.0, 0.0, 0.0]), dtype=dtype,
    )
    model.init()
    return model, h, dt, spp


def build_bowl_model(kind: str, tx: str, medium: str, nx: int,
                     degree: int = 4, f0: float | None = None,
                     cfl: float = 0.3, dtype=None, linear: bool = False):
    """Like ``build_model`` but on a TRUE bowl-fitted mesh
    (``core/bowl.py``): the transducer is the set of curved facets of the
    spherical cap, driven with a plain uniform source — no phasing, no
    obliquity weighting; focusing comes from the geometry exactly as in
    the reference's gmsh meshes
    (``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-WATER/main.cpp:33-52``).
    The deformed cells run the general-geometry operator path."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import WesterveltSpectralExplicit
    from fenicsxfus_tpu.core.bowl import create_bowl_box

    dtype = dtype or jnp.float32
    g = TRANSDUCERS[tx]
    m = MEDIA[medium]
    f0 = f0 or F0_FULL
    c0, rho0 = m["c0"], m["rho0"]
    u0 = SOURCE_VELOCITY[(kind, tx, medium)]
    p0 = rho0 * c0 * u0
    w0 = 2 * np.pi * f0
    alphaNp = m["att_dB"] / 20 * np.log(10)
    delta0 = 0.0 if linear else 2 * alphaNp * c0**3 / w0**2
    beta0 = 0.0 if (linear or kind == "V") else m["beta"]

    L, W = g["L"], g["W"]
    h = L / nx
    nyz = max(int(round(W / h)), 2)
    # blend/hold in units of sag / of blend: the round-4 sweep
    # (benchmarks/bowl_blend_sweep.py) found blend=2*sag, hold=0.25*blend
    # halves the slab (20.8% vs 45.8% of cells) at the same spectral
    # stable dt; chip-validated (O'Neil focal gain 0.34%, position
    # 0.75 mm, focal L2 1.6% at nx=64) and 2.08x faster end-to-end on the
    # nx=80 production run (0.377 vs 0.181 GDOF-steps/s, same focal
    # field to 0.4%) — now the production default here. The env knobs
    # keep the sweep reproducible; core create_bowl_box defaults are
    # unchanged (blend=3*sag, hold=blend — the conservative choice).
    sag = g["roc"] - np.sqrt(g["roc"] ** 2 - g["a"] ** 2)
    bm = float(os.environ.get("FUS_BOWL_BLEND_MULT", "2.0"))
    hm = float(os.environ.get("FUS_BOWL_HOLD_MULT", "0.25"))
    blend = bm * sag
    hold = hm * blend
    mesh, focus = create_bowl_box(
        (nx, nyz, nyz), (0.0, -W / 2, -W / 2), (L, W / 2, W / 2),
        g["roc"], g["a"], blend=blend, lateral_hold=hold,
    )

    # CFL accuracy heuristic on the UNIFORM spacing (reference
    # main.cpp:108-111), exactly like the flat-aperture path: stability on
    # the deformed mesh is governed by the MEASURED operator spectrum
    # (clamp below), so also shrinking the heuristic by h_min double-counts
    # the deformation — through round 4 that double-count plus the
    # staircase-corner spectral clamp held the bowl at 211 vs the flat
    # path's 119 steps/period (benchmarks/PERFORMANCE.md)
    dt_cfl = cfl * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl) + 1
    dt = 1 / f0 / spp

    model = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
        dtype=dtype,
    )
    model.init()
    # skewed blend-band cells raise the spectral radius beyond the h_min
    # heuristic — clamp dt with the measured operator spectrum
    from fenicsxfus_tpu import estimate_stable_dt

    dt_star = estimate_stable_dt(model.ops, c0, rho0, rk_order=4)
    if dt_star < dt:
        spp = int(1 / f0 / dt_star) + 1
        dt = 1 / f0 / spp
        model.dt = dt
    return model, h, dt, spp


def validate_bowl_mesh(tx: str = "H101", f0: float = 0.35e6, nx: int = 48,
                       degree: int = 4, out: str | None = None, dtype=None):
    """Linear (β=δ=0) run on the bowl-FITTED mesh vs the O'Neil (1949)
    axial solution — validates the curved-facet transducer geometry
    end-to-end (the phased-aperture counterpart is ``validate_oneil``)."""
    import time

    from fenicsxfus_tpu.analysis.analytical import oneil_axial_amplitude

    model, h, dt, spp = build_bowl_model(
        "W", tx, "WATER", nx, degree=degree, f0=f0, dtype=dtype, linear=True
    )
    g = TRANSDUCERS[tx]
    c0 = MEDIA["WATER"]["c0"]
    rho0 = MEDIA["WATER"]["rho0"]
    p0 = rho0 * c0 * SOURCE_VELOCITY[("W", tx, "WATER")]
    L = g["L"]
    tf = L / c0 + 10.0 / f0
    ndofs = model.number_of_dofs()
    lam = c0 / f0
    print(f"O'Neil bowl-mesh validation {tx}: f0={f0/1e6:.2f} MHz  "
          f"p={degree}  {lam/h:.2f} elems/wavelength  DOFs={ndofs/1e6:.2f}M  "
          f"dt={dt:.3e}")
    pts = axial_points(tx)
    t0 = time.perf_counter()
    u, v, t, times, ys = model.rk_record(0.0, tf, pts)
    elapsed = time.perf_counter() - t0
    amp = steady_amplitude(times, ys, f0)
    x = pts[0]
    k = 2 * np.pi * f0 / c0
    # rim plane at x=0: O'Neil's axial coordinate (from the apex) is
    # x + bowl depth
    h_depth = g["roc"] - np.sqrt(g["roc"] ** 2 - g["a"] ** 2)
    ref = oneil_axial_amplitude(x + h_depth, g["a"], g["roc"], k, p0)
    i_pk = int(np.argmax(amp))
    i_rf = int(np.argmax(ref))
    gain_err = abs(amp[i_pk] - ref[i_rf]) / ref[i_rf]
    pos_err = abs(x[i_pk] - x[i_rf])
    focal = np.abs(x - x[i_rf]) < 7 * lam
    prof_err = np.linalg.norm((amp - ref)[focal]) / np.linalg.norm(ref[focal])
    print(f"  solve {elapsed:.1f} s | focal |p|: model {amp[i_pk]/1e3:.1f} kPa "
          f"@ {x[i_pk]*1e3:.2f} mm, O'Neil {ref[i_rf]/1e3:.1f} kPa "
          f"@ {x[i_rf]*1e3:.2f} mm")
    print(f"  focal-gain error {gain_err*100:.2f}%  position error "
          f"{pos_err*1e3:.2f} mm  focal-region L2 {prof_err*100:.2f}%")
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez_compressed(
            out, x=x, amplitude=amp, oneil=ref,
            meta=json.dumps({"tx": tx, "f0": f0, "nx": nx, "degree": degree,
                             "gain_err": gain_err, "pos_err_mm": pos_err * 1e3,
                             "profile_err": prof_err, "ndofs": int(ndofs),
                             "mesh": "bowl-fitted",
                             "platform": _platform()}),
        )
        print(f"  wrote {out}")
    return gain_err, pos_err, prof_err


def axial_points(tx: str, n: int = 161):
    L = TRANSDUCERS[tx]["L"]
    x = np.linspace(0.0, L, n)
    return np.stack([x, np.zeros_like(x), np.zeros_like(x)])


def steady_amplitude(times, ys, f0, n_periods=2):
    tail = times > times[-1] - n_periods / f0
    return np.max(np.abs(ys[tail]), axis=0)


def run(kind: str, tx: str, medium: str, nx: int = 80, degree: int = 4,
        full: bool = False, f0: float | None = None, out: str | None = None,
        final_time: float | None = None, dtype=None, bowl: bool = False,
        nyz: int | None = None):
    """Run one HITU variant; returns (axial x, steady amplitude).
    ``bowl=True`` runs on the bowl-FITTED mesh (real curved facets,
    general-geometry operator path) instead of the phased flat aperture."""
    import time

    f0 = f0 or (F0_FULL if full else 0.5e6)
    builder = build_bowl_model if bowl else build_model
    if bowl and nyz is not None:
        # the bowl-fitted mesh derives its lateral resolution from the bowl
        # geometry — a user nyz cannot be honoured there (ADVICE r4 #3)
        raise ValueError(
            "nyz is not supported with bowl=True: the bowl-fitted mesh "
            "sets its own lateral grid; drop --nyz or drop --bowl"
        )
    kw = {} if bowl else {"nyz": nyz}
    model, h, dt, spp = builder(
        kind, tx, medium, nx, degree=degree, f0=f0, dtype=dtype, **kw
    )
    m = MEDIA[medium]
    c0 = m["c0"]
    L = TRANSDUCERS[tx]["L"]
    tf = final_time or (L / c0 + 8.0 / f0)
    nsteps = int(round(tf / dt))
    ndofs = model.number_of_dofs()
    lam = c0 / f0
    name = f"{kind}-{tx}-{medium}" + ("-BOWLMESH" if bowl else "")
    print(f"HITU {name}: f0={f0/1e6:.2f} MHz  p={degree}  "
          f"{lam/h:.2f} elems/wavelength  DOFs={ndofs/1e6:.2f}M  "
          f"dt={dt:.3e}  steps={nsteps}  steps/period={spp}")
    pts = axial_points(tx)
    t0 = time.perf_counter()
    u, v, t, times, ys = model.rk_record(0.0, tf, pts)
    elapsed = time.perf_counter() - t0
    amp = steady_amplitude(times, ys, f0)
    x = pts[0]
    i_pk = int(np.argmax(amp))
    print(f"  solve {elapsed:.1f} s ({ndofs*nsteps/elapsed/1e9:.3f} "
          f"GDOF-steps/s) | peak |p| {amp[i_pk]/1e6:.3f} MPa at "
          f"x={x[i_pk]*1e3:.1f} mm (geometric focus "
          f"{TRANSDUCERS[tx]['roc']*1e3:.1f} mm)")
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        # keep enough steady periods and axial stations for harmonic
        # analysis (benchmarks/hitu/harmonics.py): 4 full periods at 31
        # stations ~ 0.5 MB compressed
        keep = times > times[-1] - 4.0 / f0
        sens = np.linspace(0, pts.shape[1] - 1, 31, dtype=int)
        np.savez_compressed(
            out, x=x, amplitude=amp, sensor_x=x[sens],
            times=times[keep], waveforms=ys[keep][:, sens],
            meta=json.dumps({"variant": name, "f0": f0, "nx": nx,
                             "degree": degree, "dt": dt,
                             "ndofs": int(ndofs), "tf": tf,
                             "platform": _platform()}),
        )
        print(f"  wrote {out}")
    return x, amp


def validate_oneil(tx: str = "H101", f0: float = 0.35e6, nx: int = 64,
                   degree: int = 4, out: str | None = None, dtype=None):
    """Linear (β=δ=0) run of the phased-aperture bowl model vs the O'Neil
    (1949) axial solution — the quantitative check of the flat-aperture
    bowl equivalence (round-1 gap: 'focal gain unvalidated')."""
    import time

    from fenicsxfus_tpu.analysis.analytical import oneil_axial_amplitude

    model, h, dt, spp = build_model(
        "W", tx, "WATER", nx, degree=degree, f0=f0, dtype=dtype, linear=True
    )
    g = TRANSDUCERS[tx]
    c0 = MEDIA["WATER"]["c0"]
    rho0 = MEDIA["WATER"]["rho0"]
    u0 = SOURCE_VELOCITY[("W", tx, "WATER")]
    p0 = rho0 * c0 * u0
    L = g["L"]
    tf = L / c0 + 10.0 / f0
    ndofs = model.number_of_dofs()
    lam = c0 / f0
    print(f"O'Neil validation {tx}: f0={f0/1e6:.2f} MHz  p={degree}  "
          f"{lam/h:.2f} elems/wavelength  DOFs={ndofs/1e6:.2f}M")
    pts = axial_points(tx)
    t0 = time.perf_counter()
    u, v, t, times, ys = model.rk_record(0.0, tf, pts)
    elapsed = time.perf_counter() - t0
    amp = steady_amplitude(times, ys, f0)
    x = pts[0]
    k = 2 * np.pi * f0 / c0
    # the aperture plane is the bowl RIM plane: O'Neil's axial coordinate
    # (from the apex) is x + bowl depth (models/focused.py geometry)
    h_depth = g["roc"] - np.sqrt(g["roc"] ** 2 - g["a"] ** 2)
    ref = oneil_axial_amplitude(x + h_depth, g["a"], g["roc"], k, p0)
    i_pk = int(np.argmax(amp))
    i_rf = int(np.argmax(ref))
    gain_err = abs(amp[i_pk] - ref[i_rf]) / ref[i_rf]
    pos_err = abs(x[i_pk] - x[i_rf])
    # profile error over the focal region (±1 focal-spot length)
    focal = np.abs(x - x[i_rf]) < 7 * lam
    prof_err = np.linalg.norm((amp - ref)[focal]) / np.linalg.norm(ref[focal])
    print(f"  solve {elapsed:.1f} s | focal |p|: model {amp[i_pk]/1e3:.1f} kPa "
          f"@ {x[i_pk]*1e3:.2f} mm, O'Neil {ref[i_rf]/1e3:.1f} kPa "
          f"@ {x[i_rf]*1e3:.2f} mm")
    print(f"  focal-gain error {gain_err*100:.2f}%  position error "
          f"{pos_err*1e3:.2f} mm  focal-region L2 {prof_err*100:.2f}%")
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez_compressed(
            out, x=x, amplitude=amp, oneil=ref,
            meta=json.dumps({"tx": tx, "f0": f0, "nx": nx, "degree": degree,
                             "gain_err": gain_err, "pos_err_mm": pos_err * 1e3,
                             "profile_err": prof_err,
                             "ndofs": int(ndofs)}),
        )
        print(f"  wrote {out}")
    return gain_err, pos_err, prof_err


def driver_main(kind: str, tx: str, medium: str):
    """argparse main shared by the thin per-variant drivers."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--full", action="store_true",
                    help="true 1.1 MHz parameters (~360M DOF resolved; "
                    "multi-chip scale, as in the reference)")
    ap.add_argument("--f0", type=float, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--bowl", action="store_true",
                    help="bowl-fitted mesh (real curved transducer facets) "
                    "instead of the phased flat aperture")
    ap.add_argument("--nyz", type=int, default=None,
                    help="lateral cell count (anisotropic cells; see "
                    "build_model docstring)")
    args = ap.parse_args()
    suffix = "_bowlmesh" if args.bowl else ""
    out = args.out or os.path.join(
        RESULTS, f"{kind.lower()}_{tx.lower()}_{medium.lower()}{suffix}.npz"
    )
    run(kind, tx, medium, nx=args.nx, degree=args.degree, full=args.full,
        f0=args.f0, out=out, bowl=args.bowl, nyz=args.nyz)
