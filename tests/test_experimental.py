"""Tests for the experimental solvers (Newmark, S2, sponge, adaptive RK)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu import (
    LinearSpectralAdaptive,
    LinearSpectralNewmark,
    LinearSpectralS2,
    LinearSpectralSponge,
    WesterveltSpectralAdaptive,
    create_interval,
    create_rectangle,
    tag_boundaries,
)
from fenicsxfus_tpu.analysis.analytical import fubini, planewave
from fenicsxfus_tpu.analysis.error import relative_l2_error
from fenicsxfus_tpu.models.experimental import heaviside_window

F0, C0, L = 10.0, 1.0, 1.0


def mesh_1d(epw, degree):
    nx = int(epw * (L * F0 / C0) + 1)
    mesh = create_interval(nx, 0.0, L)
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )
    return mesh, L / nx


@pytest.mark.parametrize("degree, epw", [(4, 4)])
def test_newmark_1d(degree, epw):
    rho0 = 4.0
    p0 = rho0 * C0
    mesh, h = mesh_1d(epw, degree)
    dt = 0.25 * h / (C0 * degree**2)  # Newmark-β needs smaller dt for accuracy
    eqn = LinearSpectralNewmark(
        mesh, None, degree, C0, rho0, F0, p0, C0, dt, dtype=jnp.float64
    )
    eqn.init()
    u, v, w, tf = eqn.newmark(0.0, L / C0 + 16.0 / F0)
    err = relative_l2_error(eqn.ops, u, lambda x: planewave(x[0], tf, C0, F0, p0))
    assert err < 0.05, err  # same gate as the implicit reference solvers


def test_adaptive_linear_1d():
    rho0 = 4.0
    p0 = rho0 * C0
    mesh, h = mesh_1d(4, 4)
    eqn = LinearSpectralAdaptive(
        mesh, None, 4, C0, rho0, F0, p0, C0, dtype=jnp.float64,
        atol=1e-9, rtol=1e-9,
    )
    eqn.init()
    u, v, tf, steps = eqn.rk(0.0, L / C0 + 16.0 / F0)
    assert steps > 0
    err = relative_l2_error(eqn.ops, u, lambda x: planewave(x[0], tf, C0, F0, p0))
    assert err < 1e-3, err


def test_adaptive_westervelt_1d():
    rho0, beta0 = 1.0, 0.01
    p0 = rho0 * C0
    mesh, h = mesh_1d(8, 4)
    eqn = WesterveltSpectralAdaptive(
        mesh, None, 4, C0, rho0, 0.0, beta0, F0, p0, C0, dtype=jnp.float64,
        atol=1e-8, rtol=1e-8,
    )
    eqn.init()
    u, v, tf, steps = eqn.rk(0.0, L / C0 + 8.0 / F0)
    err = relative_l2_error(
        eqn.ops, u, lambda x: fubini(x[0], tf, C0, F0, p0, rho0, beta0)
    )
    assert err < 1e-1, err


def test_s2_windowed_source_2d():
    """The windowed source should only excite the strip |y-center| small."""
    rho0 = 1.0
    p0 = 1.0
    mesh = create_rectangle((20, 10), (0, -0.5), (1.0, 0.5))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )
    eqn = LinearSpectralS2(
        mesh, None, 3, C0, rho0, F0, p0, C0,
        source_profile=heaviside_window(-0.1, 0.1, axis=1), dtype=jnp.float64,
    )
    eqn.init()
    h = 1.0 / 20
    u, v, tf = eqn.rk4(0.0, 0.2, 0.5 * h / (C0 * 9))
    coords = eqn.ops.space.dof_coords
    un = np.abs(np.asarray(u))
    near = un[(np.abs(coords[:, 1]) < 0.08) & (coords[:, 0] < 0.15)]
    far = un[(np.abs(coords[:, 1]) > 0.35) & (coords[:, 0] < 0.15)]
    assert near.max() > 10 * max(far.max(), 1e-12)


def test_sponge_damps_outgoing_wave():
    """With a sponge pad the field in the pad decays; the solver stays stable."""
    rho0 = 1.0
    p0 = 1.0
    # domain [0, 0.2] with sponge beyond 0.12 (reference geometry scale)
    mesh = create_interval(40, 0.0, 0.2)
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 0.2 - 1e-12}
    )
    f0 = 0.5e6
    c0 = 1500.0
    delta0 = 2 * c0 / (2 * np.pi * f0) * 4.0  # strong damping scale
    h = 0.2 / 40
    dt = 0.25 * h / (c0 * 16)
    eqn = LinearSpectralSponge(
        mesh, None, 4, c0, rho0, delta0, f0, p0, c0, sponge_start=0.12,
        dtype=jnp.float64,
    )
    eqn.init()
    u, v, tf = eqn.rk4(0.0, 0.25 / f0 * 200, dt)
    un = np.abs(np.asarray(u))
    coords = eqn.ops.space.dof_coords[:, 0]
    assert np.all(np.isfinite(un))
    inside = un[coords < 0.10].max()
    deep = un[coords > 0.19].max()
    assert deep < 0.5 * inside  # wave decays through the sponge pad


@pytest.mark.slow
def test_focused_source_focal_gain():
    """Phased-aperture focusing (HITU bowl analogue): the field near the
    geometric focus must exceed the source-plane field after the front
    passes (focal gain), and the beam stays on axis."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import create_rectangle
    from fenicsxfus_tpu.models.focused import WesterveltSpectralFocused

    c0, rho0 = 1.0, 1.0
    f0 = 20.0
    p0 = 1.0
    L, W = 1.0, 1.0
    nx = 50
    mesh = create_rectangle((nx, nx), (0, -W / 2), (L, W / 2))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12}, default=2)
    F = 0.5
    dt = 0.5 * (L / nx) / (c0 * 16)
    eqn = WesterveltSpectralFocused(
        mesh, None, 4, c0, rho0, 0.0, 0.0, f0, p0, c0, 4, dt,
        aperture_radius=0.35, focal_distance=F, dtype=jnp.float64,
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, F / c0 + 6.0 / f0)
    un = np.abs(np.asarray(u))
    coords = eqn.ops.space.dof_coords
    on_axis = np.abs(coords[:, 1]) < 0.05
    near_focus = on_axis & (np.abs(coords[:, 0] - F) < 0.1)
    near_source = (coords[:, 0] < 0.1) & (np.abs(coords[:, 1]) < 0.3)
    gain = un[near_focus].max() / un[near_source].max()
    assert gain > 1.5, gain  # clear focal amplification
    off_axis = (np.abs(coords[:, 1]) > 0.4) & (np.abs(coords[:, 0] - F) < 0.1)
    assert un[near_focus].max() > 3 * un[off_axis].max()


@pytest.mark.slow
def test_sponge_on_unstructured_mesh_matches_lattice():
    """Sponge model on a scrambled-vertex (no-lattice) mesh == the
    structured-lattice solution (the linear_planewave2d_3 configuration:
    unstructured mesh + sponge pad). Fields compared via lexicographic
    DOF-coordinate matching."""
    from fenicsxfus_tpu import create_rectangle
    from fenicsxfus_tpu.core.mesh import Mesh

    f0, p0, c0, rho0 = 0.5e6, 1.0, 1500.0, 1.0
    delta0 = 2 * c0 / (2 * np.pi * f0) * 4.0
    Lx, Ly = 0.2, 0.05
    mesh_s = create_rectangle((20, 5), (0, 0), (Lx, Ly))
    rng = np.random.default_rng(3)
    perm = rng.permutation(mesh_s.num_vertices)
    v2 = np.empty_like(mesh_s.vertices)
    v2[perm] = mesh_s.vertices
    mesh_u = Mesh(dim=2, vertices=v2, cells=perm[mesh_s.cells])

    h = Lx / 20
    dt = 0.25 * h / (c0 * 16)
    sols = []
    for mesh in (mesh_s, mesh_u):
        tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > Lx - 1e-12}
        )
        eqn = LinearSpectralSponge(
            mesh, None, 4, c0, rho0, delta0, f0, p0, c0, sponge_start=0.12,
            dtype=jnp.float64,
        )
        eqn.init()
        u, v, tf = eqn.rk4(0.0, 60 * dt, dt)
        coords = eqn.ops.space.dof_coords
        order = np.lexsort((coords[:, 1], coords[:, 0]))
        sols.append(np.asarray(u)[order])
    assert sols[1].shape == sols[0].shape
    scale = max(np.abs(sols[0]).max(), 1e-30)
    assert np.abs(sols[1] - sols[0]).max() / scale < 1e-10
