"""Sharded in-scan sensor recording == single-device ``rk_record``.

The reference evaluates sensor points on any rank count
(``cpp/mwe/parallel_eval_line/main.cpp:49-107``); here the sharded slab and
grid solvers record device-side inside the scan and must reproduce the
single-device time series exactly (same sensor plan — nearest-DOF gather
for node-aligned sensors, Lagrange interpolation otherwise — same steps).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu import (
    LinearSpectralExplicit,
    WesterveltSpectralExplicit,
    create_box,
    tag_boundaries,
)
from fenicsxfus_tpu.parallel.grid import ShardedExplicitSolver2D
from fenicsxfus_tpu.parallel.slab import ShardedExplicitSolver


def _make(cls=WesterveltSpectralExplicit, nx=(9, 3, 3)):
    mesh = tag_boundaries(
        create_box(nx, (0, 0, 0), (1.0, 0.4, 0.4)),
        {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12},
    )
    dt = 0.4 / nx[0] / 1.5 / 9
    if cls is WesterveltSpectralExplicit:
        return cls(mesh, None, 3, 1.5, 1.0, 4e-3, 3.5, 10.0, 1.0, 1.5, 4,
                   dt, dtype=jnp.float64)
    return cls(mesh, None, 3, 1.5, 1.0, 10.0, 1.0, 1.5, 4, dt,
               dtype=jnp.float64)


def _axial_points(n=7):
    x = np.linspace(0.05, 0.95, n)
    return np.stack([x, np.full_like(x, 0.2), np.full_like(x, 0.2)])


def _compare_record(solver_factory, tol=1e-11):
    pts = _axial_points()
    m1 = _make()
    m1.init()
    t_end = 40 * m1.dt
    u1, v1, t1, times1, ys1 = m1.rk_record(0.0, t_end, pts)

    m2 = _make()
    m2.init()
    sh = solver_factory(m2)
    u2, v2, t2, times2, ys2 = sh.rk_record(0.0, t_end, pts)

    assert times1.shape == times2.shape
    np.testing.assert_allclose(times1, times2, rtol=0, atol=1e-14)
    scale = np.max(np.abs(np.asarray(ys1))) + 1e-300
    err = np.max(np.abs(np.asarray(ys2) - np.asarray(ys1))) / scale
    assert err < tol, err
    scale_u = np.max(np.abs(np.asarray(u1))) + 1e-300
    assert np.max(np.abs(np.asarray(u2) - np.asarray(u1))) / scale_u < tol


@pytest.mark.parametrize(
    "ndev", [2, pytest.param(4, marks=pytest.mark.slow)]
)
def test_slab_rk_record(ndev):
    # 9 cells over 2/4 devices: uneven partitions with padding slabs
    _compare_record(lambda m: ShardedExplicitSolver(m, ndev=ndev))


def test_grid2d_rk_record():
    _compare_record(lambda m: ShardedExplicitSolver2D(m, (2, 2)))


@pytest.mark.slow
def test_grid3d_rk_record():
    _compare_record(lambda m: ShardedExplicitSolver2D(m, (2, 2, 2)))


def test_slab_record_off_axis_sensors():
    """Sensors scattered across devices and lateral positions (not a single
    axial line): exercises per-device slot packing + host reassembly."""
    rng = np.random.default_rng(5)
    pts = np.stack([
        rng.uniform(0.05, 0.95, 9),
        rng.uniform(0.05, 0.35, 9),
        rng.uniform(0.05, 0.35, 9),
    ])
    m1 = _make()
    m1.init()
    t_end = 25 * m1.dt
    *_, ys1 = m1.rk_record(0.0, t_end, pts)
    m2 = _make()
    m2.init()
    sh = ShardedExplicitSolver(m2, ndev=4)
    *_, ys2 = sh.rk_record(0.0, t_end, pts)
    scale = np.max(np.abs(np.asarray(ys1))) + 1e-300
    assert np.max(np.abs(np.asarray(ys2) - np.asarray(ys1))) / scale < 1e-11


def _make_imp(nx=(8, 3, 3)):
    from fenicsxfus_tpu import LinearSpectralImplicit

    mesh = tag_boundaries(
        create_box(nx, (0, 0, 0), (1.0, 0.4, 0.4)),
        {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12},
    )
    return LinearSpectralImplicit(
        mesh, None, 2, 1.5, 1.0, 10.0, 1.0, 1.5, 2,
        0.4 / nx[0] / 1.5, dtype=jnp.float64, cg_rtol=1e-12,
    )


def _compare_dirk_record(solver_factory, tol=1e-10):
    """Sharded ``dirk_record`` == single-device ``model.dirk_record``
    (series AND surfaced CG stats)."""
    pts = _axial_points(5)
    m1 = _make_imp()
    m1.init()
    t_end = 6 * m1.dt
    *_, times1, ys1 = m1.dirk_record(0.0, t_end, pts)
    m2 = _make_imp()
    m2.init()
    sh = solver_factory(m2)
    u2, v2, t2, times2, ys2 = sh.dirk_record(0.0, t_end, pts)
    np.testing.assert_allclose(times1, times2, rtol=0, atol=1e-14)
    scale = np.max(np.abs(np.asarray(ys1))) + 1e-300
    assert np.max(np.abs(np.asarray(ys2) - np.asarray(ys1))) / scale < tol
    assert m2.cg_stats["max_iterations"] > 0
    assert m2.cg_stats["max_residual2"] < 1e-10


def test_slab_dirk_record():
    from fenicsxfus_tpu.parallel.slab import ShardedImplicitSolver

    _compare_dirk_record(lambda m: ShardedImplicitSolver(m, ndev=4))


def test_grid2d_dirk_record():
    from fenicsxfus_tpu.parallel.grid import ShardedImplicitSolverND

    _compare_dirk_record(lambda m: ShardedImplicitSolverND(m, (2, 2)))


def test_unstructured_dirk_record():
    from fenicsxfus_tpu.core.mesh import Mesh
    from fenicsxfus_tpu.parallel.unstructured import (
        ShardedUnstructuredImplicitSolver,
    )

    def factory(m):
        # rebuild on an unstructured (scrambled) copy of the same mesh
        return ShardedUnstructuredImplicitSolver(m, ndev=4)

    pts = _axial_points(5)
    rng = np.random.default_rng(2)
    base = create_box((7, 3, 3), (0, 0, 0), (1.0, 0.4, 0.4))
    verts = base.vertices.copy()
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    interior = np.all((verts > lo + 1e-12) & (verts < hi - 1e-12), axis=1)
    verts[interior] += 0.02 * (rng.random((int(interior.sum()), 3)) - 0.5)
    mesh = Mesh(dim=3, vertices=verts, cells=np.asarray(base.cells))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )
    from fenicsxfus_tpu import LinearSpectralImplicit

    def make():
        m = LinearSpectralImplicit(
            mesh, None, 2, 1.5, 1.0, 10.0, 1.0, 1.5, 2, 0.05,
            dtype=jnp.float64, cg_rtol=1e-12,
        )
        m.init()
        return m

    m1 = make()
    t_end = 6 * m1.dt
    *_, times1, ys1 = m1.dirk_record(0.0, t_end, pts)
    m2 = make()
    *_, times2, ys2 = factory(m2).dirk_record(0.0, t_end, pts)
    np.testing.assert_allclose(times1, times2, rtol=0, atol=1e-14)
    scale = np.max(np.abs(np.asarray(ys1))) + 1e-300
    assert np.max(np.abs(np.asarray(ys2) - np.asarray(ys1))) / scale < 1e-10


def test_streamed_rejects_nonzero_initial_state():
    """The streamed-setup path starts from zero fields; a nonzero template
    state must raise, not be silently dropped."""
    from fenicsxfus_tpu.parallel.slab import build_sharded

    def factory(local_mesh):
        tag_boundaries(
            local_mesh,
            {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12},
        )
        return LinearSpectralExplicit(
            local_mesh, None, 3, 1.5, 1.0, 10.0, 1.0, 1.5, 4, 1e-3,
            dtype=jnp.float64,
        )

    sol = build_sharded(
        factory, (8, 2, 2), (0, 0, 0), (1.0, 0.4, 0.4), 3, 2, jnp.float64
    )
    sol.model.u_n = jnp.ones_like(sol.model.u_n)
    with pytest.raises(ValueError, match="zero fields"):
        sol.rk(0.0, 2e-3)


def test_unstructured_rk_record():
    """Sharded unstructured recording == single-device rk_record (the
    route multi-chip bowl runs use)."""
    from fenicsxfus_tpu.core.mesh import Mesh, as_unstructured
    from fenicsxfus_tpu.parallel.unstructured import (
        ShardedUnstructuredExplicitSolver,
    )

    rng = np.random.default_rng(0)
    base = create_box((7, 3, 3), (0, 0, 0), (1.0, 0.4, 0.4))
    verts = base.vertices.copy()
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    interior = np.all((verts > lo + 1e-12) & (verts < hi - 1e-12), axis=1)
    verts[interior] += 0.02 * (rng.random((int(interior.sum()), 3)) - 0.5)
    mesh = Mesh(dim=3, vertices=verts, cells=np.asarray(base.cells))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )

    def make():
        m = WesterveltSpectralExplicit(
            mesh, None, 2, 1.5, 1.0, 4e-3, 3.5, 10.0, 1.0, 1.5, 4,
            0.15 / 7 / 1.5 / 4, dtype=jnp.float64,
        )
        m.init()
        return m

    pts = _axial_points(6)
    m1 = make()
    t_end = 30 * m1.dt
    *_, times1, ys1 = m1.rk_record(0.0, t_end, pts)
    m2 = make()
    sh = ShardedUnstructuredExplicitSolver(m2, ndev=4)
    u2, v2, t2, times2, ys2 = sh.rk_record(0.0, t_end, pts)
    np.testing.assert_allclose(times1, times2, rtol=0, atol=1e-14)
    scale = np.max(np.abs(np.asarray(ys1))) + 1e-300
    assert np.max(np.abs(np.asarray(ys2) - np.asarray(ys1))) / scale < 1e-11


@pytest.mark.slow
def test_unstructured_clustered_offnode_sensors():
    """>256 virtual rows on one device: the plan's gather extraction (the
    unrolled dynamic-slice form would blow up compile time) must still
    match the single-device series."""
    from fenicsxfus_tpu.core.mesh import as_unstructured
    from fenicsxfus_tpu.parallel.unstructured import (
        ShardedUnstructuredExplicitSolver,
    )

    base = create_box((9, 3, 3), (0, 0, 0), (1.0, 0.4, 0.4))
    mesh = as_unstructured(base)
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )

    def make():
        m = LinearSpectralExplicit(
            mesh, None, 3, 1.5, 1.0, 10.0, 1.0, 1.5, 4, 0.4 / 9 / 1.5 / 9,
            dtype=jnp.float64,
        )
        return m.init()

    rng = np.random.default_rng(3)
    pts = np.stack([
        rng.uniform(0.11, 0.21, 12),  # clustered: 12 * 64 virtual rows on
        rng.uniform(0.05, 0.35, 12),  # one device's slab
        rng.uniform(0.05, 0.35, 12),
    ])
    m1 = make()
    *_, ys1 = m1.rk_record(0.0, 8 * m1.dt, pts)
    m2 = make()
    sh = ShardedUnstructuredExplicitSolver(m2, ndev=4)
    *_, ys2 = sh.rk_record(0.0, 8 * m2.dt, pts)
    scale = np.max(np.abs(np.asarray(ys1))) + 1e-300
    assert np.max(np.abs(np.asarray(ys2) - np.asarray(ys1))) / scale < 1e-11
