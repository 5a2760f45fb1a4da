"""Sharded (slab-decomposition) solver vs single-device equivalence.

The reference's distributed correctness rests on DOLFINx's ghost-exchange
guarantees (SURVEY §4); here we assert it directly: the shard_map solver on
a virtual 8-device CPU mesh must reproduce the single-device solution to
floating-point accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu import (
    LinearSpectralExplicit,
    LinearSpectralImplicit,
    LinearSpectralSponge,
    LossySpectralExplicit,
    LossySpectralImplicit,
    WesterveltSpectralExplicit,
    create_box,
    create_interval,
    create_rectangle,
    tag_boundaries,
)
from fenicsxfus_tpu.parallel.slab import (
    ShardedExplicitSolver,
    ShardedImplicitSolver,
)


def tagged(mesh, L):
    return tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )


def run_pair(make_model, ndev, t_end=0.05):
    m1 = make_model()
    m1.init()
    u_ref, v_ref, _ = m1.rk(0.0, t_end)

    m2 = make_model()
    m2.init()
    sharded = ShardedExplicitSolver(m2, ndev=ndev)
    u_sh, v_sh, _ = sharded.rk(0.0, t_end)

    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    err_u = np.max(np.abs(np.asarray(u_sh) - np.asarray(u_ref))) / scale
    scale_v = np.max(np.abs(np.asarray(v_ref))) + 1e-300
    err_v = np.max(np.abs(np.asarray(v_sh) - np.asarray(v_ref))) / scale_v
    assert err_u < 1e-11, err_u
    assert err_v < 1e-11, err_v


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_linear_1d(ndev):
    def make():
        mesh = tagged(create_interval(16, 0.0, 1.0), 1.0)
        return LinearSpectralExplicit(
            mesh, None, 4, 1.0, 1.0, 10.0, 1.0, 1.0, 4, 5e-4, dtype=jnp.float64
        )

    run_pair(make, ndev)


@pytest.mark.parametrize("ndev", [4])
def test_sharded_linear_2d(ndev):
    def make():
        mesh = tagged(create_rectangle((8, 5), (0, 0), (1.0, 0.5)), 1.0)
        return LinearSpectralExplicit(
            mesh, None, 3, 1.5, 1.2, 10.0, 1.0, 1.5, 4, 4e-4, dtype=jnp.float64
        )

    run_pair(make, ndev)


@pytest.mark.parametrize(
    "ndev", [2, pytest.param(8, marks=pytest.mark.slow)]
)
def test_sharded_westervelt_3d(ndev):
    def make():
        # 9 cells: uneven on both device counts (exercises the m0=1 padding
        # of the nonlinear mass divide)
        mesh = tagged(create_box((9, 3, 3), (0, 0, 0), (1.0, 0.4, 0.4)), 1.0)
        rng = np.random.default_rng(0)
        c0 = 1.0 + 0.1 * rng.random(mesh.num_cells)  # heterogeneous medium
        return WesterveltSpectralExplicit(
            mesh, None, 3, c0, 1.0, 1e-4, 0.01, 10.0, 1.0, 1.0, 4, 4e-4,
            dtype=jnp.float64,
        )

    run_pair(make, ndev)


def test_sharded_lossy_2d():
    def make():
        mesh = tagged(create_rectangle((8, 4), (0, 0), (1.0, 0.5)), 1.0)
        return LossySpectralExplicit(
            mesh, None, 4, 1.0, 1.0, 1e-3, 10.0, 1.0, 1.0, 4, 3e-4,
            dtype=jnp.float64,
        )

    run_pair(make, 4)


@pytest.mark.parametrize("ncells,ndev", [(9, 4), (13, 8), (5, 8)])
def test_sharded_uneven_partition(ncells, ndev):
    """Cell counts that do NOT divide the device count run with inert
    padding cells on the last slabs (reference partitions are uneven too)."""

    def make():
        mesh = tagged(create_interval(ncells, 0.0, 1.0), 1.0)
        return LinearSpectralExplicit(
            mesh, None, 3, 1.0, 1.0, 10.0, 1.0, 1.0, 4, 5e-4, dtype=jnp.float64
        )

    run_pair(make, ndev)


def run_pair_implicit(make_model, ndev, t_end=0.02):
    m1 = make_model()
    m1.init()
    u_ref, v_ref, _ = m1.dirk(0.0, t_end)

    m2 = make_model()
    m2.init()
    sharded = ShardedImplicitSolver(m2, ndev=ndev)
    u_sh, v_sh, _ = sharded.dirk(0.0, t_end)

    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    err_u = np.max(np.abs(np.asarray(u_sh) - np.asarray(u_ref))) / scale
    assert err_u < 1e-11, err_u
    assert m2.cg_stats["max_iterations"] >= 1
    assert m2.cg_stats["max_iterations"] < m2.cg_maxiter


@pytest.mark.parametrize(
    "ndev", [2, pytest.param(4, marks=pytest.mark.slow)]
)
def test_sharded_implicit_linear_1d(ndev):
    def make():
        mesh = tagged(create_interval(16, 0.0, 1.0), 1.0)
        return LinearSpectralImplicit(
            mesh, None, 4, 1.0, 1.0, 10.0, 1.0, 1.0, 2, 1e-3, dtype=jnp.float64
        )

    run_pair_implicit(make, ndev)


@pytest.mark.slow
def test_sharded_implicit_lossy_2d_uneven():
    def make():
        mesh = tagged(create_rectangle((7, 4), (0, 0), (1.0, 0.5)), 1.0)
        return LossySpectralImplicit(
            mesh, None, 3, 1.0, 1.0, 1e-3, 10.0, 1.0, 1.0, 2, 1e-3,
            dtype=jnp.float64,
        )

    run_pair_implicit(make, 4)


def test_sharded_sponge_2d():
    """Nodal δ(x) stiffness coefficient (tuple-valued const) re-packed per
    device — round-1 ``shard_consts`` silently mishandled this family."""

    def make():
        mesh = tagged(create_rectangle((8, 4), (0, 0), (1.0, 0.5)), 1.0)
        m = LinearSpectralSponge(
            mesh, None, 3, 1.0, 1.0, 1e-2, 10.0, 1.0, 1.0,
            sponge_start=0.6, dtype=jnp.float64,
        )
        m.dt = 4e-4
        m._build()
        return m

    run_pair(make, 4)


@pytest.mark.parametrize("ncells,ndev", [(16, 4), (13, 4)])
def test_streamed_setup_matches_global(ncells, ndev):
    """build_sharded (per-slab model construction, no global DOF vector)
    must reproduce the globally-constructed sharded solver exactly."""
    from fenicsxfus_tpu.parallel.slab import build_sharded

    L = 1.0
    args = dict(degree=3, c0=1.2, rho0=0.9, freq0=10.0, p0=1.0, s0=1.2,
                rk_order=4, dt=5e-4, dtype=jnp.float64)

    def tags(mesh):
        return tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
        )

    # global construction
    gmesh = tags(create_interval(ncells, 0.0, L))
    gm = LinearSpectralExplicit(gmesh, None, **args).init()
    g_sh = ShardedExplicitSolver(gm, ndev=ndev)
    u_ref, v_ref, _ = g_sh.rk(0.0, 0.04)

    # streamed per-slab construction
    def factory(local_mesh):
        tags(local_mesh)
        return LinearSpectralExplicit(local_mesh, None, **args)

    solver = build_sharded(
        factory, (ncells,), (0.0,), (L,), args["degree"], ndev, jnp.float64
    )
    solver.rk(0.0, 0.04)
    u_st, v_st = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-12
    scale_v = np.max(np.abs(np.asarray(v_ref))) + 1e-300
    assert np.max(np.abs(v_st - np.asarray(v_ref))) / scale_v < 1e-12


def test_streamed_setup_westervelt_2d_uneven():
    from fenicsxfus_tpu import WesterveltSpectralExplicit as W
    from fenicsxfus_tpu.parallel.slab import build_sharded

    L, Wd = 1.0, 0.4
    grid = (7, 3)
    args = dict(degree=3, delta0=1e-3, beta0=0.02, freq0=10.0, p0=1.0,
                s0=1.0, rk_order=4, dt=4e-4, dtype=jnp.float64)

    def tags(mesh):
        return tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
        )

    def c0_of(mesh):
        mids = mesh.cell_midpoints()
        return 1.0 + 0.1 * np.sin(3.0 * mids[:, 0]) * np.cos(2.0 * mids[:, 1])

    gmesh = tags(create_rectangle(grid, (0, 0), (L, Wd)))
    gm = W(gmesh, None, c0=c0_of(gmesh), rho0=1.0, **args).init()
    u_ref, v_ref, _ = ShardedExplicitSolver(gm, ndev=4).rk(0.0, 0.03)

    def factory(local_mesh):
        tags(local_mesh)
        return W(local_mesh, None, c0=c0_of(local_mesh), rho0=1.0, **args)

    solver = build_sharded(
        factory, grid, (0.0, 0.0), (L, Wd), args["degree"], 4, jnp.float64
    )
    solver.rk(0.0, 0.03)
    u_st, _ = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-12


def test_streamed_setup_implicit():
    from fenicsxfus_tpu.parallel.slab import build_sharded

    L = 1.0
    ncells, ndev = 10, 4
    args = dict(degree=3, c0=1.0, rho0=1.0, freq0=10.0, p0=1.0, s0=1.0,
                rk_order=2, dt=2e-3, dtype=jnp.float64)

    def tags(mesh):
        return tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
        )

    gmesh = tags(create_interval(ncells, 0.0, L))
    gm = LinearSpectralImplicit(gmesh, None, **args).init()
    u_ref, _, _ = ShardedImplicitSolver(gm, ndev=ndev).dirk(0.0, 0.02)

    def factory(local_mesh):
        tags(local_mesh)
        return LinearSpectralImplicit(local_mesh, None, **args)

    solver = build_sharded(
        factory, (ncells,), (0.0,), (L,), args["degree"], ndev, jnp.float64,
        implicit=True,
    )
    solver.dirk(0.0, 0.02)
    u_st, _ = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-11


def test_sharded_dirk_cg_stats_match_single_device():
    mesh = tagged(create_interval(8, 0.0, 1.0), 1.0)

    def make():
        return LinearSpectralImplicit(
            mesh, None, 3, 1.0, 1.0, 10.0, 1.0, 1.0, 2, 2e-3, dtype=jnp.float64
        )

    m1 = make().init()
    m1.dirk(0.0, 0.01)
    m2 = make().init()
    ShardedImplicitSolver(m2, ndev=4).dirk(0.0, 0.01)
    # CG iterates are identical in exact arithmetic; iteration counts may
    # differ by a hair in floating point
    assert abs(m1.cg_stats["max_iterations"] - m2.cg_stats["max_iterations"]) <= 2
