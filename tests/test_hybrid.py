"""Hybrid operator path for bowl-deformed structured meshes.

``core/bowl.py`` confines all deformation to the first ``blend_layers``
x-layers of cells; ``ops/operators.py::_setup_hybrid`` exploits that by
splitting K = K_uniform(whole lattice) + K_{G_cell − G_uniform}(slab).
These tests pin hybrid == the general per-cell-geometry path (FUS_HYBRID=0)
bit-level-close, for the operator applies, the assembled diagonals, and a
full model run. Reference analogue: the kernel-equivalence oracle pattern
of ``cpp/fenicsx-sf/tests/test_operators3d/main.cpp:17-167``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import fenicsxfus_tpu as fus
from fenicsxfus_tpu.core.bowl import create_bowl_box
from fenicsxfus_tpu.ops.operators import SEMOperators


def _bowl_mesh(n=(10, 8, 8)):
    mesh, focus = create_bowl_box(n, (0, 0, 0), (1.0, 0.9, 0.9), 0.7, 0.35)
    return mesh, focus


def _ops_pair(monkeypatch, degree=3):
    mesh, _ = _bowl_mesh()
    hyb = SEMOperators(mesh, degree, dtype=jnp.float64)
    monkeypatch.setenv("FUS_HYBRID", "0")
    gen = SEMOperators(mesh, degree, dtype=jnp.float64)
    monkeypatch.delenv("FUS_HYBRID")
    assert hyb.hybrid is not None
    assert gen.hybrid is None and gen.lattice is None
    return hyb, gen


@pytest.mark.parametrize("degree", [2, 3])
def test_hybrid_stiffness_matches_general(degree, monkeypatch):
    hyb, gen = _ops_pair(monkeypatch, degree)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(hyb.ndofs))
    x2 = jnp.asarray(rng.standard_normal(hyb.ndofs))
    cfield = rng.uniform(0.5, 2.0, hyb.num_cells)
    for xs, coeffs in (
        ([x], [1.0]),
        ([x], [cfield]),
        ([x, x2], [cfield, 0.7]),
    ):
        ya = np.asarray(hyb.stiffness_apply(xs, coeffs))
        yb = np.asarray(gen.stiffness_apply(xs, coeffs))
        scale = np.max(np.abs(yb))
        assert np.max(np.abs(ya - yb)) / scale < 1e-12


def test_hybrid_prepacked_coeffs(monkeypatch):
    """stiff_coeff output (the jit-arg form models use) goes through the
    same hybrid apply."""
    hyb, gen = _ops_pair(monkeypatch)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(hyb.ndofs))
    cfield = rng.uniform(0.5, 2.0, hyb.num_cells)
    packed = hyb.stiff_coeff(cfield)
    assert isinstance(packed, dict) and "hyb_u" in packed
    ya = np.asarray(hyb.stiffness_apply([x], [packed]))
    yb = np.asarray(gen.stiffness_apply([x], [cfield]))
    assert np.max(np.abs(ya - yb)) / np.max(np.abs(yb)) < 1e-12


def test_hybrid_diagonals_match_general(monkeypatch):
    hyb, gen = _ops_pair(monkeypatch)
    rng = np.random.default_rng(11)
    cfield = rng.uniform(0.5, 2.0, hyb.num_cells)
    for coeff in (1.0, cfield):
        ma = np.asarray(hyb.assemble_diag(coeff))
        mb = np.asarray(gen.assemble_diag(coeff))
        assert np.max(np.abs(ma - mb)) / np.max(np.abs(mb)) < 1e-12
        ka = np.asarray(hyb.stiffness_diag(coeff))
        kb = np.asarray(gen.stiffness_diag(coeff))
        assert np.max(np.abs(ka - kb)) / np.max(np.abs(kb)) < 1e-12


@pytest.mark.slow
def test_hybrid_model_run_matches_general(monkeypatch):
    """Full linear solve on a bowl mesh: hybrid == general to fp64
    roundoff accumulated over the run."""
    mesh, focus = _bowl_mesh((8, 7, 7))
    c0 = rho0 = p0 = 1.0
    f0 = c0 / 0.3

    def run():
        m = fus.LinearSpectralExplicit(
            mesh, None, 3, c0, rho0, f0, p0, c0, 4,
            0.4 * mesh.h_min() / (c0 * 9), dtype=jnp.float64,
        )
        m.init()
        u, v, t = m.rk(0.0, 60 * m.dt)
        return np.asarray(u)

    u_h = run()
    monkeypatch.setenv("FUS_HYBRID", "0")
    u_g = run()
    scale = np.max(np.abs(u_g)) + 1e-300
    assert np.max(np.abs(u_h - u_g)) / scale < 1e-10


@pytest.mark.parametrize("kind", ["linear", "westervelt"])
def test_hybrid_fused_stage_matches_unfused(kind, monkeypatch):
    """Bowl meshes through the FUSED v3 RK stage (uniform lattice kernel +
    band-correction operand computed in XLA) must match the unfused hybrid
    scan to fp64 roundoff — the production bowl-mesh HITU hot path."""
    mesh, focus = _bowl_mesh((8, 7, 7))
    nc = mesh.num_cells
    rng = np.random.default_rng(11)
    c0 = rng.uniform(0.9, 1.1, nc)
    rho0 = rng.uniform(0.9, 1.1, nc)
    f0 = 1.0 / 0.3
    dt = 0.3 * mesh.h_min() / 9

    def build():
        if kind == "linear":
            m = fus.LinearSpectralExplicit(
                mesh, None, 3, c0, rho0, f0, 1.0, 1.0, 4, dt,
                dtype=jnp.float64,
            )
        else:
            m = fus.WesterveltSpectralExplicit(
                mesh, None, 3, c0, rho0, 4e-3, 3.5, f0, 1.0, 1.0, 4, dt,
                dtype=jnp.float64,
            )
        m.init()
        return m

    monkeypatch.setenv("FUS_PALLAS", "1")  # interpret-mode pallas on CPU
    m_fused = build()
    assert m_fused.ops.hybrid is not None
    assert m_fused._try_build_fused() is not None, "hybrid fused not taken"
    uf, vf, _ = m_fused.rk(0.0, 20 * dt)

    monkeypatch.setenv("FUS_PALLAS", "0")
    m_ref = build()
    assert m_ref._try_build_fused() is None
    ur, vr, _ = m_ref.rk(0.0, 20 * dt)

    for a, b in [(uf, ur), (vf, vr)]:
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-11, err


def test_sharding_rejects_deformed_mesh():
    """The multi-axis grid decomposition assumes uniform geometry — a bowl
    mesh must be rejected loudly. The slab decomposition accepts bowls
    (hybrid sharding) but must refuse when the blend band does not fit
    inside device 0's slab, not silently flatten the geometry."""
    from fenicsxfus_tpu.parallel.grid import GridDecomposition
    from fenicsxfus_tpu.parallel.slab import SlabDecomposition

    mesh, _ = _bowl_mesh((6, 6, 6))
    with pytest.raises(ValueError, match="deformed"):
        GridDecomposition(mesh, 3, (2,), jnp.float64)
    # blend_layers > nxl = 3 here: the band spans both slabs
    with pytest.raises(ValueError, match="blend"):
        SlabDecomposition(mesh, 3, 2, jnp.float64)


def _bowl_mesh_shallow(n=(16, 7, 7)):
    """A bowl whose blend band fits inside device 0's slab at ndev=4."""
    mesh, focus = create_bowl_box(
        n, (0, 0, 0), (1.0, 0.9, 0.9), 0.9, 0.25, blend=0.08,
        lateral_hold=0.08,
    )
    return mesh, focus


@pytest.mark.parametrize("kind", ["linear", "westervelt"])
def test_hybrid_sharded_slab_matches_single_device(kind):
    """Bowl meshes shard through the FAST slab path: the lattice kernel
    runs on every device and the band correction rides the sharded consts
    (real tables on device 0, zeros elsewhere — an exact no-op there).
    Sharded == single-device hybrid to fp64 roundoff, including the halo
    exchange across the band/uniform seam."""
    from fenicsxfus_tpu.parallel.slab import ShardedExplicitSolver

    mesh, _ = _bowl_mesh_shallow()
    nc = mesh.num_cells
    rng = np.random.default_rng(5)
    c0 = rng.uniform(0.9, 1.1, nc)
    rho0 = rng.uniform(0.9, 1.1, nc)
    f0 = 1.0 / 0.3
    dt = 0.3 * mesh.h_min() / 9

    def make():
        if kind == "linear":
            m = fus.LinearSpectralExplicit(
                mesh, None, 3, c0, rho0, f0, 1.0, 1.0, 4, dt,
                dtype=jnp.float64,
            )
        else:
            m = fus.WesterveltSpectralExplicit(
                mesh, None, 3, c0, rho0, 4e-3, 3.5, f0, 1.0, 1.0, 4, dt,
                dtype=jnp.float64,
            )
        m.init()
        assert m.ops.hybrid is not None
        return m

    t_end = 20 * dt
    m_ref = make()
    u_ref, v_ref, _ = m_ref.rk(0.0, t_end)

    sh = ShardedExplicitSolver(make(), ndev=4)
    assert sh.dec.ops.hybrid is not None
    u_sh, v_sh, _ = sh.rk(0.0, t_end)

    for a, b in [(u_sh, u_ref), (v_sh, v_ref)]:
        scale = max(float(np.max(np.abs(np.asarray(b)))), 1e-300)
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) / scale
        assert err < 1e-11, err


def test_hybrid_sharded_recording():
    """Sharded hybrid in-scan recording: beyond-band sensors match the
    single-device series; in-band sensors are rejected loudly (the
    uniform-lattice snap would silently displace them)."""
    from fenicsxfus_tpu.parallel.slab import ShardedExplicitSolver

    mesh, _ = _bowl_mesh_shallow()
    f0 = 1.0 / 0.3
    dt = 0.3 * mesh.h_min() / 9

    def make():
        m = fus.LinearSpectralExplicit(
            mesh, None, 3, 1.0, 1.0, f0, 1.0, 1.0, 4, dt, dtype=jnp.float64
        )
        m.init()
        return m

    xs = np.linspace(0.4, 0.9, 4)
    pts = np.stack([xs, np.full_like(xs, 0.45), np.full_like(xs, 0.45)])
    t_end = 15 * dt
    *_, t1, y1 = make().rk_record(0.0, t_end, pts)
    sh = ShardedExplicitSolver(make(), ndev=4)
    *_, t2, y2 = sh.rk_record(0.0, t_end, pts)
    assert np.allclose(y1, y2, atol=1e-11 * max(1e-300, np.max(np.abs(y1))))

    bad = np.stack([[0.02], [0.45], [0.45]])
    with pytest.raises(ValueError, match="blend band"):
        sh.rk_record(t_end, t_end + 2 * dt, bad)


def test_hybrid_sharded_implicit_matches_single_device():
    """The SDIRK path shards hybrid meshes through the same consts
    plumbing: the CG operator's stiffness action carries the per-device
    band correction; the Jacobi diagonal (assembled globally with the
    band correction) slices per slab."""
    from fenicsxfus_tpu.parallel.slab import ShardedImplicitSolver

    mesh, _ = _bowl_mesh_shallow()
    f0 = 1.0 / 0.3
    dt = 0.6 * mesh.h_min() / 9

    def make():
        m = fus.LinearSpectralImplicit(
            mesh, None, 3, 1.0, 1.0, f0, 1.0, 1.0, 2, dt, dtype=jnp.float64
        )
        m.init()
        assert m.ops.hybrid is not None
        return m

    t_end = 10 * dt
    u_ref, v_ref, _ = make().dirk(0.0, t_end)
    u_sh, v_sh, _ = ShardedImplicitSolver(make(), ndev=4).dirk(0.0, t_end)
    scale = max(float(np.max(np.abs(np.asarray(u_ref)))), 1e-300)
    err = float(np.max(np.abs(np.asarray(u_sh) - np.asarray(u_ref)))) / scale
    assert err < 1e-10, err


def test_sensor_indices_on_bowl_mesh():
    """Sensor snap on the hybrid path must use the uniform-box origin (the
    pulled-back cap shifts vertices.min() by a sagitta ~1.3 cells — every
    sensor silently displaced; caught by the O'Neil gate) and refine
    points inside the deformed band against true node coordinates."""
    mesh, focus = _bowl_mesh((12, 10, 10))
    m = fus.LinearSpectralExplicit(
        mesh, None, 4, 1.0, 1.0, 3.0, 1.0, 1.0, 4, 1e-4, dtype=jnp.float64
    )
    assert m.ops.hybrid is not None
    h = 1.0 / 12
    # beyond the band: exact lattice snap
    xs = np.linspace(0.45, 0.9, 6)
    pts = np.stack([xs, np.full_like(xs, 0.45), np.full_like(xs, 0.45)])
    got = m.ops.dof_coords()[m.sensor_indices(pts)]
    # largest GLL gap at p=4 is 0.327h -> nearest node within 0.17h
    assert np.max(np.abs(got - pts.T)) < 0.17 * h + 1e-12
    # inside the band: nearest TRUE node (deformed coordinates)
    xs = np.array([0.0, 0.05, 0.12])
    pts = np.stack([xs, np.full_like(xs, 0.45), np.full_like(xs, 0.45)])
    idx = m.sensor_indices(pts)
    coords = m.ops.dof_coords()
    got = coords[idx]
    for j in range(pts.shape[1]):
        d_got = np.linalg.norm(got[j] - pts[:, j])
        d_best = np.min(np.linalg.norm(coords - pts[:, j][None, :], axis=1))
        assert d_got < d_best + 1e-12  # exactly the nearest node


@pytest.mark.slow
def test_bowl_mesh_shards_via_unstructured():
    """Deformed lattices scale out through the unstructured partition:
    as_unstructured(bowl mesh) + ShardedUnstructuredExplicitSolver ==
    the single-device hybrid solve (compared through coordinates — the
    two paths number DOFs differently)."""
    from fenicsxfus_tpu.core.mesh import as_unstructured
    from fenicsxfus_tpu.parallel.unstructured import (
        ShardedUnstructuredExplicitSolver,
    )

    mesh, _ = create_bowl_box((8, 6, 6), (0, 0, 0), (1.0, 0.7, 0.7), 0.5, 0.25)
    umesh = as_unstructured(mesh)

    def make(msh):
        m = fus.LinearSpectralExplicit(
            msh, None, 2, 1.0, 1.0, 3.0, 1.0, 1.0, 4,
            0.4 * mesh.h_min() / 4.0, dtype=jnp.float64,
        )
        m.init()
        return m

    m1 = make(mesh)
    assert m1.ops.hybrid is not None
    u1, *_ = m1.rk(0.0, 30 * m1.dt)
    m2 = make(umesh)
    assert m2.ops.hybrid is None
    sh = ShardedUnstructuredExplicitSolver(m2, ndev=4)
    u2, *_ = sh.rk(0.0, 30 * m2.dt)
    c1 = m1.ops.dof_coords()
    c2 = m2.ops.dof_coords()
    from scipy.spatial import cKDTree

    dist, perm = cKDTree(c2).query(c1)
    assert dist.max() < 1e-12
    scale = np.max(np.abs(np.asarray(u1)))
    err = np.max(np.abs(np.asarray(u2)[perm] - np.asarray(u1))) / scale
    assert err < 1e-11, err
