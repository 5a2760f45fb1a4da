"""Validation of the 2D cylinder-scattering analytical oracles and a
time-domain scattering simulation against them.

The reference ships the partial-wave series as library classes with no
consumer (``python/src/fenicsxfus/_analytical.py:5-190``); here the series
are (a) checked against their own defining boundary/continuity conditions
and (b) used as the oracle for an end-to-end heterogeneous (DG-0 voxelised
cylinder) time-domain run — exercising the two-medium machinery against an
independent closed-form solution."""

import numpy as np
import pytest

from fenicsxfus_tpu.analysis.analytical import (
    PenetrableExact2D,
    SoundHardExact2D,
    SoundSoftExact2D,
)

W0 = 2 * np.pi * 0.5e6
C0 = 1500.0
K0 = W0 / C0
A = 2 * np.pi / K0  # radius = one wavelength (ka = 2π)


def ring(r, n=64):
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    return np.stack([r * np.cos(th), r * np.sin(th)])


def test_sound_hard_neumann_surface():
    """∂(total)/∂r = 0 on the cylinder surface (the defining BC)."""
    ex = SoundHardExact2D(0.0, W0, K0, A)
    eps = 1e-6 * A
    up = ex.total(ring(A + 2 * eps))
    um = ex.total(ring(A + eps))
    dudr = np.abs(up - um) / eps
    scale = K0 * np.abs(ex.total(ring(2 * A))).max()
    assert dudr.max() / scale < 1e-3


def test_sound_soft_dirichlet_surface():
    """total = 0 on the cylinder surface."""
    ex = SoundSoftExact2D(0.0, W0, K0, A)
    u = ex.total(ring(A * (1 + 1e-9)))
    scale = np.abs(ex.total(ring(2 * A))).max()
    assert np.abs(u).max() / scale < 1e-6


def test_penetrable_interface_continuity():
    """Pressure and normal velocity (1/ρ·∂p/∂r) continuous across r=a."""
    rho0, rho1, c1 = 1000.0, 1300.0, 1.25 * C0
    ex = PenetrableExact2D(0.0, W0, rho0, rho1, C0, c1, A)
    eps = 1e-5 * A
    p_out = ex.total(ring(A + eps))
    p_in = ex.total(ring(A - eps))
    scale = np.abs(p_out).max()
    assert np.abs(p_out - p_in).max() / scale < 1e-3
    # one-sided radial derivatives
    d_out = (ex.total(ring(A + 2 * eps)) - ex.total(ring(A + eps))) / eps
    d_in = (ex.total(ring(A - eps)) - ex.total(ring(A - 2 * eps))) / eps
    vscale = np.abs(d_out / rho0).max()
    assert np.abs(d_out / rho0 - d_in / rho1).max() / vscale < 2e-3


def test_penetrable_no_contrast_is_incident():
    """With ρ1=ρ0, c1=c0 the cylinder vanishes: total == e^{ik x}."""
    ex = PenetrableExact2D(0.0, W0, 1000.0, 1000.0, C0, C0, A)
    pts = ring(1.7 * A)
    u = ex.total(pts)
    assert np.abs(u - np.exp(1j * K0 * pts[0])).max() < 1e-8


@pytest.mark.slow
def test_penetrable_scattering_time_domain():
    """End-to-end: plane wave scattering off a penetrable cylinder
    (voxelised DG-0 two-medium disc), steady-state sensor amplitudes on a
    ring vs |PenetrableExact2D.total|·p0. Lateral walls are Neumann (the
    incident plane wave satisfies them exactly); the measurement window
    closes before scattered-wave wall reflections reach the ring."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_rectangle, tag_boundaries

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = C0, 1000.0
    c1, rho1 = 1.25 * C0, 1300.0
    lam = c0 / f0
    a = lam  # ka = 2π
    Lx, Ly = 8 * lam, 12 * lam
    ctr = np.array([4 * lam, 0.0])
    epw, degree = 6, 4
    nx, ny = int(round(Lx / lam * epw)), int(round(Ly / lam * epw))
    mesh = create_rectangle((nx, ny), (0.0, -Ly / 2), (Lx, Ly / 2))
    tag_boundaries(
        mesh,
        {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > Lx - 1e-9},
    )
    mids = mesh.cell_vertices().mean(axis=1)
    inside = np.hypot(mids[:, 0] - ctr[0], mids[:, 1] - ctr[1]) < a
    c_cell = np.where(inside, c1, c0)
    rho_cell = np.where(inside, rho1, rho0)
    h = lam / epw
    dt_raw = 0.5 * h / (c1 * degree**2)
    spp = int(np.ceil(1.0 / (f0 * dt_raw)))
    dt = 1.0 / (f0 * spp)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c_cell, rho_cell, f0, p0, c0, 4, dt,
        dtype=jnp.float64,
    )
    eqn.init()
    T = 1.0 / f0
    # incident front reaches the ring's far side (5λ) at 5T; 4-period ramp
    # => steady there from ~9T. Scattered wall reflections reach the ring
    # earliest at 3T (first scattering) + 5λ (to wall) + 4λ (back) = 12T.
    t_meas0, tf = 9 * T, 11 * T
    pts = ring(2 * a, n=32) + ctr[:, None]
    u, v, t, times, ys = eqn.rk_record(0.0, tf, pts)
    tail = times > t_meas0
    assert np.count_nonzero(tail) >= int(1.9 * spp)
    amp = np.max(np.abs(ys[tail]), axis=0)
    ex = PenetrableExact2D(0.0, W0, rho0, rho1, c0, c1, a)
    ref = p0 * np.abs(ex.total(ring(2 * a, n=32)))
    err = np.linalg.norm(amp - ref) / np.linalg.norm(ref)
    print(f"scattering ring amplitude rel L2 err: {err:.4f}")
    assert err < 0.08
