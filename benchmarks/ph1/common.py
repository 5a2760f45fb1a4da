"""PH1 transcranial-ultrasound benchmark suite (Aubry et al. 2022).

TPU-native reimplementation of the reference's 14 PH1 drivers
(``cpp/fenicsx-sf-naive/benchmarks/PH1/SC{1,2}-BM{1..7}/main.cpp``):
intercomparison scenarios SC1 (planar 20 mm piston) and SC2 (focused bowl,
64 mm aperture, 64 mm radius of curvature) through benchmarks BM1-BM7
(water → lossy water → flat/curved/layered skull → CT-skull stand-in).

Material constants are copied from the reference drivers (e.g. skin/bone
properties ``SC1-BM4/main.cpp:41-60``). The reference reads pre-generated
fitted hex meshes from absolute HPC paths that are NOT distributed with its
repository; here the geometry is generated: media layers from the published
benchmark spec are voxelised onto the structured lattice as DG-0 cell tags
(cell-centroid classification) — the same representation the grid-based
codes in the intercomparison use. Sources are driven through facet tags
(SC1) or a phased flat aperture equivalent to the bowl (SC2, O'Neil-
validated; see ``tests/test_ph1.py``).

Each driver records the on-axis pressure time series *in-scan* (device
side) and reports the steady-state amplitude profile; reduced-size sensor
outputs are committed under ``benchmarks/ph1/results/``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

# --------------------------------------------------------------------------
# constants from the reference drivers
F0 = 0.5e6  # source frequency (Hz)
P0 = 60000.0  # source amplitude (Pa)
W0 = 2.0 * np.pi * F0
DOMAIN_L = 0.12  # axial length (m)  (main.cpp:45)
DOMAIN_W = 0.07  # transverse width (m) (benchmark spec)
SC1_RADIUS = 0.01  # planar source radius (m)
SC2_APERTURE = 0.032  # bowl half-aperture (m)
SC2_ROC = 0.064  # bowl radius of curvature (m)

# (c0 m/s, rho0 kg/m^3, attenuation dB/m) — reference SC*-BM*/main.cpp
MATERIALS = {
    "water": (1500.0, 1000.0, 0.0),
    "water_att": (1500.0, 1000.0, 100.0),  # SC1-BM2/main.cpp:38-41
    "skin": (1610.0, 1090.0, 20.0),  # SC1-BM4/main.cpp:41-47
    "cortical": (2800.0, 1850.0, 400.0),  # SC1-BM4/main.cpp:49-55
    "trabecular": (2300.0, 1700.0, 800.0),  # SC1-BM4/main.cpp:57-60
    # BM7 runs water-valued properties with 100 dB/m at p=5 in the
    # reference (SC1-BM7/main.cpp:36-44 — bone values commented out)
    "bm7": (1500.0, 1000.0, 100.0),
}

# Layer geometry (published benchmark spec; meshes not in the reference
# repo). Flat layers: (material, x_lo, x_hi). Curved layers: concentric
# spherical shells, centre on the axis at apex + ROC, ROC = 75 mm.
CURVE_ROC = 0.075
BM_LAYERS = {
    1: [],
    2: [],
    3: [("cortical", 0.030, 0.0365)],
    4: [
        ("skin", 0.026, 0.030),
        ("cortical", 0.030, 0.0315),
        ("trabecular", 0.0315, 0.0355),
        ("cortical", 0.0355, 0.037),
    ],
    5: [("cortical", 0.030, 0.0365)],
    6: [
        ("skin", 0.026, 0.030),
        ("cortical", 0.030, 0.0315),
        ("trabecular", 0.0315, 0.0355),
        ("cortical", 0.0355, 0.037),
    ],
    7: [("bm7", 0.030, 0.0365)],
}
BM_CURVED = {1: False, 2: False, 3: False, 4: False, 5: True, 6: True, 7: True}
BM_BACKGROUND = {1: "water", 2: "water_att", 3: "water", 4: "water",
                 5: "water", 6: "water", 7: "water"}
BM_DEGREE = {1: 4, 2: 4, 3: 4, 4: 4, 5: 4, 6: 4, 7: 5}


def build_media(mesh, bm: int):
    """Per-cell (c0, rho0, delta0) DG-0 fields for benchmark ``bm``."""
    from fenicsxfus_tpu import compute_diffusivity_of_sound

    cents = mesh.cell_midpoints()  # [Nc, 3]
    nc = cents.shape[0]

    def mat_fields(name):
        c, rho, att = MATERIALS[name]
        return c, rho, compute_diffusivity_of_sound(W0, c, att)

    c0 = np.empty(nc)
    rho0 = np.empty(nc)
    delta0 = np.empty(nc)
    cb, rb, db = mat_fields(BM_BACKGROUND[bm])
    c0[:] = cb
    rho0[:] = rb
    delta0[:] = db

    layers = BM_LAYERS[bm]
    if not layers:
        return c0, rho0, delta0
    if not BM_CURVED[bm]:
        for name, xlo, xhi in layers:
            mask = (cents[:, 0] >= xlo) & (cents[:, 0] < xhi)
            cm, rm, dm = mat_fields(name)
            c0[mask], rho0[mask], delta0[mask] = cm, rm, dm
    else:
        # concentric shells: outermost apex at layers[0][1], centre at
        # apex + ROC on the axis; shell for (xlo, xhi) has radii
        # [ROC - (xhi - apex), ROC - (xlo - apex)]
        apex = layers[0][1]
        centre = np.array([apex + CURVE_ROC, 0.0, 0.0])
        r = np.linalg.norm(cents - centre[None, :], axis=1)
        for name, xlo, xhi in layers:
            r_out = CURVE_ROC - (xlo - apex)
            r_in = CURVE_ROC - (xhi - apex)
            mask = (r > r_in) & (r <= r_out) & (cents[:, 0] < centre[0])
            cm, rm, dm = mat_fields(name)
            c0[mask], rho0[mask], delta0[mask] = cm, rm, dm
    return c0, rho0, delta0


def build_mesh(nx: int, degree: int):
    """Structured box [0, L] x [-W/2, W/2]^2 with the transverse cell count
    scaled to keep cells near-cubic."""
    from fenicsxfus_tpu import create_box

    h = DOMAIN_L / nx
    nyz = max(int(round(DOMAIN_W / h)), 2)
    mesh = create_box(
        (nx, nyz, nyz),
        (0.0, -DOMAIN_W / 2, -DOMAIN_W / 2),
        (DOMAIN_L, DOMAIN_W / 2, DOMAIN_W / 2),
    )
    return mesh, h


def tag_scenario(mesh, sc: int):
    """Facet tags: tag 1 = source aperture on the x=0 plane (disc of the
    scenario's radius), tag 2 = Sommerfeld ABC on the five outer faces;
    the rest of the x=0 plane is a rigid baffle (natural Neumann)."""
    from fenicsxfus_tpu import tag_boundaries

    a = SC1_RADIUS if sc == 1 else SC2_APERTURE
    W = DOMAIN_W / 2
    eps = 1e-9

    def src(x):
        return (x[0] < eps) & (np.hypot(x[1], x[2]) <= a)

    def abc(x):
        return (
            (x[0] > DOMAIN_L - eps)
            | (np.abs(x[1]) > W - eps)
            | (np.abs(x[2]) > W - eps)
        )

    tag_boundaries(mesh, {1: src, 2: abc})
    return mesh


def build_model(sc: int, bm: int, nx: int, dtype=None, cfl=0.5,
                bowl: bool = False):
    """Assemble the model for scenario ``sc``, benchmark ``bm``.

    ``bowl=True`` (SC2 only) drives a TRUE bowl-fitted mesh
    (``core/bowl.py`` curved facets, hybrid operator path) instead of the
    phased flat aperture — the geometry the reference's gmsh meshes
    express (``cpp/fenicsx-sf-naive/benchmarks/PH1/SC2-BM1/main.cpp``).
    The SC2 blend depth (~26 mm) ends before the first skull layer
    (26-30 mm), so the material layers land on uniform cells."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LinearSpectralExplicit,
        LossySpectralExplicit,
        WesterveltSpectralExplicit,
    )
    from fenicsxfus_tpu.models.focused import WesterveltSpectralFocused

    dtype = dtype or jnp.float32
    degree = BM_DEGREE[bm]
    if bowl and sc != 2:
        raise ValueError("bowl meshes apply to the SC2 (focused) scenario")
    if bowl:
        from fenicsxfus_tpu.core.bowl import create_bowl_box

        h = DOMAIN_L / nx
        nyz = max(int(round(DOMAIN_W / h)), 2)
        mesh, _focus = create_bowl_box(
            (nx, nyz, nyz),
            (0.0, -DOMAIN_W / 2, -DOMAIN_W / 2),
            (DOMAIN_L, DOMAIN_W / 2, DOMAIN_W / 2),
            SC2_ROC, SC2_APERTURE,
        )
        h_cfl = mesh.h_min()
    else:
        mesh, h = build_mesh(nx, degree)
        tag_scenario(mesh, sc)
        h_cfl = h
    c0, rho0, delta0 = build_media(mesh, bm)

    cmax = float(np.max(c0))
    period = 1.0 / F0
    dt = cfl * h_cfl / (cmax * degree**2)
    steps_per_period = int(period / dt) + 1
    dt = period / steps_per_period

    if sc == 1:
        if bm == 1:
            model = LinearSpectralExplicit(
                mesh, None, degree, c0, rho0, F0, P0, 1500.0, 4, dt, dtype=dtype
            )
        else:
            model = LossySpectralExplicit(
                mesh, None, degree, c0, rho0, delta0, F0, P0, 1500.0, 4, dt,
                dtype=dtype,
            )
    elif bowl:
        # real curved transducer facets: plain uniform source, focusing
        # from the geometry (β=0: PH1 is linear/lossy)
        model = WesterveltSpectralExplicit(
            mesh, None, degree, c0, rho0, delta0, 0.0, F0, P0, 1500.0, 4,
            dt, dtype=dtype,
        )
    else:
        # focused bowl as a phased flat aperture (O'Neil-validated)
        model = WesterveltSpectralFocused(
            mesh, None, degree, c0, rho0, delta0, 0.0, F0, P0, 1500.0, 4, dt,
            aperture_radius=SC2_APERTURE, focal_distance=SC2_ROC,
            center=np.array([0.0, 0.0, 0.0]), dtype=dtype,
        )
    model.init()
    if bowl:
        # skewed blend-band cells: clamp dt with the measured spectrum
        from fenicsxfus_tpu import estimate_stable_dt

        dt_star = estimate_stable_dt(model.ops, c0, rho0, rk_order=4)
        if dt_star < dt:
            steps_per_period = int(period / dt_star) + 1
            dt = period / steps_per_period
            model.dt = dt
    return model, mesh, h_cfl, dt, steps_per_period


def axial_points(n=121):
    x = np.linspace(0.0, DOMAIN_L, n)
    return np.stack([x, np.zeros_like(x), np.zeros_like(x)])


def steady_amplitude(times, ys, n_periods=2):
    """Per-sensor steady-state amplitude: max |p| over the trailing
    ``n_periods`` source periods of the recorded series."""
    tail = times > times[-1] - n_periods / F0
    return np.max(np.abs(ys[tail]), axis=0)


def run(sc: int, bm: int, nx: int = 80, out: str | None = None,
        final_time: float | None = None, dtype=None, bowl: bool = False):
    """Run one PH1 scenario/benchmark; returns (axial x, amplitude).
    ``bowl=True``: true curved-facet bowl mesh (SC2 only)."""
    import time

    model, mesh, h, dt, spp = build_model(sc, bm, nx, dtype=dtype, bowl=bowl)
    ndofs = model.number_of_dofs()
    tf = final_time or (DOMAIN_L / 1500.0 + 8.0 / F0)
    nsteps = int(round(tf / dt))
    print(f"PH1 SC{sc}-BM{bm}{' BOWLMESH' if bowl else ''}: "
          f"p={BM_DEGREE[bm]}  h={h*1e3:.2f} mm  "
          f"DOFs={ndofs/1e6:.2f}M  dt={dt:.3e}  steps={nsteps}  "
          f"steps/period={spp}")
    pts = axial_points()
    t0 = time.perf_counter()
    u, v, t, times, ys = model.rk_record(0.0, tf, pts)
    elapsed = time.perf_counter() - t0
    amp = steady_amplitude(times, ys)
    x = pts[0]
    i_pk = int(np.argmax(amp))
    print(f"  solve {elapsed:.1f} s ({ndofs*nsteps/elapsed/1e9:.3f} "
          f"GDOF-steps/s) | peak {amp[i_pk]/1e3:.1f} kPa at x={x[i_pk]*1e3:.1f} mm")
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        # reduced artefact: axial amplitude + last-3-period waveforms at
        # a handful of axial stations
        keep = times > times[-1] - 3.0 / F0
        sens = np.linspace(0, pts.shape[1] - 1, 9, dtype=int)
        np.savez_compressed(
            out, x=x, amplitude=amp, sensor_x=x[sens],
            times=times[keep], waveforms=ys[keep][:, sens],
            meta=json.dumps({"sc": sc, "bm": bm, "nx": nx, "dt": dt,
                             "ndofs": int(ndofs), "tf": tf,
                             "mesh": "bowl-fitted" if bowl else "flat-phased"}),
        )
        print(f"  wrote {out}")
    return x, amp
