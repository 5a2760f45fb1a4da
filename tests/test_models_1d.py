"""1D planewave convergence gates — the core correctness tests.

Reproduces the reference's accuracy gates on the same problems with the same
(degree, elements-per-wavelength) pairs and tolerances:

* linear explicit  < 1e-3  (``python/tests/test_linearspectral_1d.py:12-109``)
* linear implicit  < 0.05  (``:112-209``)
* lossy explicit   < 1e-2  (``test_lossyspectral_1d.py``)
* lossy implicit   < 1e-2
* Westervelt       < 1e-1  vs Fubini series (``test_westerveltspectral_1d.py``)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu import (
    LinearSpectralExplicit,
    LinearSpectralImplicit,
    LossySpectralExplicit,
    LossySpectralImplicit,
    WesterveltSpectralExplicit,
    compute_diffusivity_of_sound,
    create_interval,
    tag_boundaries,
)
from fenicsxfus_tpu.analysis.analytical import damped_planewave, fubini, planewave
from fenicsxfus_tpu.analysis.error import relative_l2_error

F0 = 10.0  # source frequency (Hz)
U0 = 1.0  # velocity amplitude (m/s)
C0 = 1.0  # speed of sound (m/s)
L = 1.0  # domain length (m)


def make_mesh(epw: int):
    lmbda = C0 / F0
    nx = int(epw * (L / lmbda) + 1)
    mesh = create_interval(nx, 0.0, L)
    tag_boundaries(
        mesh,
        {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12},
    )
    return mesh, L / nx


@pytest.mark.parametrize("degree, epw", [(3, 8), (4, 4), (5, 2), (6, 2)])
def test_linear_explicit(degree, epw):
    rho0 = 4.0
    p0 = rho0 * C0 * U0
    mesh, h = make_mesh(epw)
    dt = 0.9 * h / (C0 * degree**2)
    tend = L / C0 + 16.0 / F0
    eqn = LinearSpectralExplicit(
        mesh, None, degree, C0, rho0, F0, p0, C0, 4, dt, dtype=jnp.float64
    )
    eqn.init()
    u_n, _, tf = eqn.rk(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u_n, lambda x: planewave(x[0], tf, C0, F0, p0)
    )
    assert err < 1e-3, err


@pytest.mark.parametrize(
    "degree, epw",
    [(3, 8), (4, 4), pytest.param(5, 2, marks=pytest.mark.slow),
     pytest.param(6, 2, marks=pytest.mark.slow)],
)
def test_linear_implicit(degree, epw):
    rho0 = 4.0
    p0 = rho0 * C0 * U0
    mesh, h = make_mesh(epw)
    dt = 0.9 * h / (C0 * degree**2)
    tend = L / C0 + 16.0 / F0
    eqn = LinearSpectralImplicit(
        mesh, None, degree, C0, rho0, F0, p0, C0, 4, dt, dtype=jnp.float64
    )
    eqn.init()
    u_n, _, tf = eqn.dirk(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u_n, lambda x: planewave(x[0], tf, C0, F0, p0)
    )
    assert err < 0.05, err


@pytest.mark.parametrize("degree, epw", [(3, 8), (4, 4), (5, 2), (6, 2)])
def test_lossy_explicit(degree, epw):
    rho0 = 4.0
    p0 = rho0 * C0 * U0
    w0 = 2 * np.pi * F0
    alphadB = 5.0
    alphaNp = alphadB / 20 * np.log(10)
    delta0 = compute_diffusivity_of_sound(w0, C0, alphadB)
    mesh, h = make_mesh(epw)
    dt = 0.5 * h / (C0 * degree**2)
    tend = L / C0 + 16.0 / F0
    eqn = LossySpectralExplicit(
        mesh, None, degree, C0, rho0, delta0, F0, p0, C0, 4, dt, dtype=jnp.float64
    )
    eqn.init()
    u_n, _, tf = eqn.rk(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u_n, lambda x: damped_planewave(x[0], tf, C0, F0, p0, alphaNp)
    )
    assert err < 1e-2, err


@pytest.mark.parametrize("degree, epw", [(4, 4)])
def test_lossy_implicit(degree, epw):
    rho0 = 4.0
    p0 = rho0 * C0 * U0
    w0 = 2 * np.pi * F0
    alphadB = 5.0
    alphaNp = alphadB / 20 * np.log(10)
    delta0 = compute_diffusivity_of_sound(w0, C0, alphadB)
    mesh, h = make_mesh(epw)
    dt = 0.5 * h / (C0 * degree**2)
    tend = L / C0 + 16.0 / F0
    eqn = LossySpectralImplicit(
        mesh, None, degree, C0, rho0, delta0, F0, p0, C0, 4, dt, dtype=jnp.float64
    )
    eqn.init()
    u_n, _, tf = eqn.dirk(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u_n, lambda x: damped_planewave(x[0], tf, C0, F0, p0, alphaNp)
    )
    assert err < 1e-2, err


@pytest.mark.parametrize("degree, epw", [(3, 16), (4, 8), (5, 4), (6, 2)])
def test_westervelt(degree, epw):
    rho0 = 1.0
    beta0 = 0.01
    p0 = rho0 * C0 * U0
    mesh, h = make_mesh(epw)
    dt = 0.9 * h / (C0 * degree**2)
    tend = L / C0 + 8.0 / F0
    eqn = WesterveltSpectralExplicit(
        mesh, None, degree, C0, rho0, 0.0, beta0, F0, p0, C0, 4, dt,
        dtype=jnp.float64,
    )
    eqn.init()
    u_n, _, tf = eqn.rk(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u_n, lambda x: fubini(x[0], tf, C0, F0, p0, rho0, beta0)
    )
    assert err < 1e-1, err


@pytest.mark.parametrize("degree, epw", [(4, 4)])
def test_linear_gauss_explicit(degree, epw):
    """Gauss-quadrature (consistent-mass) variant, reference test_linear_1d.py."""
    from fenicsxfus_tpu import LinearExplicit

    rho0 = 4.0
    p0 = rho0 * C0 * U0
    mesh, h = make_mesh(epw)
    dt = 0.9 * h / (C0 * degree**2)
    tend = L / C0 + 16.0 / F0
    eqn = LinearExplicit(
        mesh, None, degree, C0, rho0, F0, p0, C0, 4, dt, dtype=jnp.float64
    )
    eqn.init()
    u_n, _, tf = eqn.rk(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u_n, lambda x: planewave(x[0], tf, C0, F0, p0)
    )
    assert err < 1e-3, err


def test_westervelt_vs_mendousse():
    """Nonlinear + thermoviscous propagation vs Mendousse's exact Burgers
    solution at the shock-formation distance (the reference's MENDOUSSE
    benchmark, ``python/benchmarks/MENDOUSSE/mendousse.py``)."""
    from fenicsxfus_tpu import compute_diffusivity_of_sound, eval_function
    from fenicsxfus_tpu.analysis.analytical import mendousse

    f0, p0 = 1e6, 5e6
    c0, rho0, beta0 = 1500.0, 1000.0, 4.8
    w0 = 2 * np.pi * f0
    delta0 = compute_diffusivity_of_sound(w0, c0, 25.0)
    xsh = rho0 * c0**3 / beta0 / p0 / w0
    Ld = 0.03
    degree, epw = 4, 6
    nx = int(epw * Ld * f0 / c0 + 1)
    mesh = create_interval(nx, 0.0, Ld)
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > Ld - 1e-12}
    )
    dt = 0.25 * (Ld / nx) / (c0 * degree**2)
    eqn = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
        dtype=jnp.float64,
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, Ld / c0 + 8.0 / f0)
    xs = np.array([xsh])  # sigma = 1
    _, vals = eval_function(eqn.ops, u, xs[None, :])
    exact = float(mendousse(xsh, tf, c0, f0, p0, rho0, beta0, delta0))
    rel = abs(vals[0] - exact) / abs(exact)
    assert rel < 0.1, (vals[0], exact, rel)  # reference Westervelt gate; 0.1% at p=10 (benchmarks/mendousse.py)


def test_implicit_dirk_record():
    """dirk_record == dirk final state, and the recorded series ends at the
    interpolated final field values at the sensor points (implicit
    counterpart of rk_record; reference evaluates sensors by interpolation
    post-run — ``Function.eval``)."""
    from fenicsxfus_tpu import eval_function

    mesh, h = make_mesh(2)
    args = (4, C0, 4.0, F0, 4.0, C0, 2, 2e-3)
    m1 = LinearSpectralImplicit(mesh, None, *args, dtype=jnp.float64).init()
    u_ref, v_ref, _ = m1.dirk(0.0, 0.05)

    m2 = LinearSpectralImplicit(mesh, None, *args, dtype=jnp.float64).init()
    pts = np.linspace(0.1, 0.9, 5)[None, :]
    u, v, t, times, ys = m2.dirk_record(0.0, 0.05, pts)
    assert ys.shape == (len(times), 5)
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(np.asarray(u) - np.asarray(u_ref))) / scale < 1e-12
    _, interp = eval_function(m2.ops, u, pts)
    np.testing.assert_allclose(
        ys[-1], np.asarray(interp), rtol=0, atol=1e-12 * scale
    )
    assert m2.cg_stats["max_iterations"] > 0
