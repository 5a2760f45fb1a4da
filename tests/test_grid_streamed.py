"""Streamed per-block setup on multi-axis device meshes: build_sharded_grid
must reproduce the globally-constructed solution exactly (the multi-axis
analogue of the slab streamed setup, tests/test_sharding.py)."""

import jax.numpy as jnp
import numpy as np

from fenicsxfus_tpu import (
    LinearSpectralExplicit,
    LinearSpectralImplicit,
    WesterveltSpectralExplicit,
    create_box,
    create_rectangle,
    tag_boundaries,
)
from fenicsxfus_tpu.parallel.grid import build_sharded_grid

L, W = 1.0, 0.8


def _tags(mesh):
    return tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )


def test_streamed_grid_westervelt_2d_uneven():
    """(2, 2) device mesh, heterogeneous DG-0 sound speed, cell counts not
    divisible by the device counts along either axis."""
    grid = (7, 5)
    args = dict(degree=3, delta0=1e-3, beta0=0.02, freq0=10.0, p0=1.0,
                s0=1.0, rk_order=4, dt=4e-4, dtype=jnp.float64)

    def c0_of(mesh):
        mids = mesh.cell_midpoints()
        return 1.0 + 0.1 * np.sin(3.0 * mids[:, 0]) * np.cos(2.0 * mids[:, 1])

    gmesh = _tags(create_rectangle(grid, (0, 0), (L, W)))
    gm = WesterveltSpectralExplicit(
        gmesh, None, c0=c0_of(gmesh), rho0=1.0, **args
    ).init()
    u_ref, _, _ = gm.rk(0.0, 0.03)

    def factory(local_mesh):
        _tags(local_mesh)
        return WesterveltSpectralExplicit(
            local_mesh, None, c0=c0_of(local_mesh), rho0=1.0, **args
        )

    solver = build_sharded_grid(
        factory, grid, (0.0, 0.0), (L, W), args["degree"], (2, 2), jnp.float64
    )
    solver.rk(0.0, 0.03)
    u_st, _ = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-12


def test_streamed_grid_linear_3d_3axis():
    """(2, 2, 2) device mesh: corner DOFs shared by 8 blocks must complete
    through the sequential host exchanges."""
    grid = (4, 4, 3)
    args = dict(degree=2, c0=1.0, rho0=1.1, freq0=8.0, p0=1.0, s0=1.0,
                rk_order=4, dt=6e-4, dtype=jnp.float64)

    gmesh = _tags(create_box(grid, (0, 0, 0), (L, W, 0.6)))
    gm = LinearSpectralExplicit(gmesh, None, **args).init()
    u_ref, _, _ = gm.rk(0.0, 0.02)

    def factory(local_mesh):
        _tags(local_mesh)
        return LinearSpectralExplicit(local_mesh, None, **args)

    solver = build_sharded_grid(
        factory, grid, (0.0, 0.0, 0.0), (L, W, 0.6), args["degree"],
        (2, 2, 2), jnp.float64,
    )
    solver.rk(0.0, 0.02)
    u_st, _ = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-12


def test_streamed_grid_implicit_2d():
    grid = (6, 5)
    args = dict(degree=3, c0=1.0, rho0=1.0, freq0=10.0, p0=1.0, s0=1.0,
                rk_order=2, dt=1e-3, dtype=jnp.float64)

    gmesh = _tags(create_rectangle(grid, (0, 0), (L, W)))
    gm = LinearSpectralImplicit(gmesh, None, **args).init()
    u_ref, _, _ = gm.dirk(0.0, 0.02)

    def factory(local_mesh):
        _tags(local_mesh)
        return LinearSpectralImplicit(local_mesh, None, **args)

    solver = build_sharded_grid(
        factory, grid, (0.0, 0.0), (L, W), args["degree"], (2, 4),
        jnp.float64, implicit=True,
    )
    solver.dirk(0.0, 0.02)
    u_st, _ = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-11
    assert solver.model.cg_stats["max_iterations"] >= 1


def test_streamed_grid_sponge_2d():
    """Sponge (nodal-δ stiffness) through the streamed per-block setup:
    δ is pointwise (not additively assembled), shipped without interface
    exchange; m (with the δ-weighted ABC facet term) streams through the
    SHARD_INV_KEYS sum-then-invert path."""
    from fenicsxfus_tpu import LinearSpectralSponge

    grid = (8, 5)
    Wl = 0.6
    args = dict(degree=3, c0=1.0, rho0=1.0, delta0=1e-2, freq0=10.0, p0=1.0,
                s0=1.0, sponge_start=0.6, dtype=jnp.float64)

    gmesh = _tags(create_rectangle(grid, (0, 0), (L, Wl)))
    gm = LinearSpectralSponge(gmesh, None, **args)
    gm.dt = 4e-4
    gm._build()
    gm.init()
    u_ref, _, _ = gm.rk(0.0, 0.02)

    def factory(local_mesh):
        _tags(local_mesh)
        m = LinearSpectralSponge(local_mesh, None, **args)
        m.dt = 4e-4
        m._build()
        return m

    solver = build_sharded_grid(
        factory, grid, (0.0, 0.0), (L, Wl), args["degree"], (2, 2), jnp.float64
    )
    solver.rk(0.0, 0.02)
    u_st, _ = solver.global_result()
    scale = np.max(np.abs(np.asarray(u_ref))) + 1e-300
    assert np.max(np.abs(u_st - np.asarray(u_ref))) / scale < 1e-11
