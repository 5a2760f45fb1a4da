"""Kernel-equivalence oracle tests for the matrix-free operators.

Mirrors the reference's operator verification pattern
(``cpp/fenicsx-sf/tests/test_operators3d/main.cpp:17-167``): apply the hand
kernel and an independently-assembled dense operator to the same field and
compare. The dense oracle here is direct numpy assembly from tabulated basis
gradients at the GLL quadrature — a separate code path from the einsum
kernels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu.core.geometry import SYM_PAIRS, volume_factors
from fenicsxfus_tpu.core.gll import diff_matrix, gll_points_weights_01
from fenicsxfus_tpu.core.mesh import (
    create_box,
    create_interval,
    create_rectangle,
    tag_boundaries,
)
from fenicsxfus_tpu.ops.operators import SEMOperators


def distort(mesh, amp=0.15, seed=0):
    """Randomly perturb interior vertices (non-affine cells)."""
    rng = np.random.default_rng(seed)
    v = mesh.vertices
    lo, hi = v.min(axis=0), v.max(axis=0)
    interior = np.all((v > lo + 1e-12) & (v < hi - 1e-12), axis=1)
    h = (hi - lo).max() / max(np.asarray(mesh.grid_shape).max(), 1)
    v[interior] += amp * h * (rng.random((interior.sum(), mesh.dim)) - 0.5)
    mesh.uniform_hint = False  # vertices mutated in place
    mesh.grid_shape_distorted = True
    return mesh


def dense_stiffness_oracle(ops, coeff):
    """Dense global stiffness via direct per-cell numpy assembly."""
    mesh, N, d = ops.mesh, ops.N, ops.d
    _, G = volume_factors(mesh, N)
    D = diff_matrix(N)
    eye = np.eye(N)
    Bs = []
    for a in range(d):
        mats = [D if ax == a else eye for ax in range(d)]
        B = mats[0]
        for m in mats[1:]:
            B = np.einsum("qn,rm->qrnm", B, m).reshape(
                B.shape[0] * m.shape[0], B.shape[1] * m.shape[1]
            )
        Bs.append(B)
    pairs = SYM_PAIRS[d]
    K = np.zeros((ops.ndofs, ops.ndofs))
    dofmap = np.asarray(ops.space.dofmap)
    coeff = np.broadcast_to(np.asarray(coeff, float), (mesh.num_cells,))
    for c in range(mesh.num_cells):
        Ke = np.zeros((N**d, N**d))
        for idx, (a, b) in enumerate(pairs):
            g = G[c, :, idx]
            Ke += np.einsum("qn,q,qm->nm", Bs[a], g, Bs[b])
            if a != b:
                Ke += np.einsum("qn,q,qm->nm", Bs[b], g, Bs[a])
        dm = dofmap[c]
        K[np.ix_(dm, dm)] += coeff[c] * Ke
    return K


def dense_mass_oracle(ops, coeff):
    mesh, N, d = ops.mesh, ops.N, ops.d
    wdetJ, _ = volume_factors(mesh, N)
    m = np.zeros(ops.ndofs)
    dofmap = np.asarray(ops.space.dofmap)
    coeff = np.broadcast_to(np.asarray(coeff, float), (mesh.num_cells,))
    for c in range(mesh.num_cells):
        np.add.at(m, dofmap[c], coeff[c] * wdetJ[c])
    return m


MESHES = {
    1: lambda: create_interval(7),
    2: lambda: create_rectangle((4, 3)),
    3: lambda: create_box((3, 2, 2)),
}


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [2, 4])
@pytest.mark.parametrize("distorted", [False, True])
def test_stiffness_vs_dense(dim, degree, distorted):
    mesh = MESHES[dim]()
    if distorted:
        mesh = distort(mesh)
    rng = np.random.default_rng(1)
    coeff = 0.5 + rng.random(mesh.num_cells)
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    x = rng.standard_normal(ops.ndofs)
    K = dense_stiffness_oracle(ops, coeff)
    y_ref = K @ x
    y = np.asarray(ops.stiffness_apply([jnp.asarray(x)], [jnp.asarray(coeff)]))
    scale = np.linalg.norm(y_ref)
    assert np.linalg.norm(y - y_ref) < 1e-10 * scale


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [3])
def test_mass_diag_vs_dense(dim, degree):
    mesh = distort(MESHES[dim]())
    rng = np.random.default_rng(2)
    coeff = 0.5 + rng.random(mesh.num_cells)
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    m = np.asarray(ops.assemble_diag(jnp.asarray(coeff)))
    m_ref = dense_mass_oracle(ops, coeff)
    assert np.allclose(m, m_ref, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_mass_integrates_volume(dim):
    # sum(m) with unit coefficient = domain volume; GLL mass integrates
    # polynomials of degree <= 2p-1 exactly against 1.
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, 4, dtype=jnp.float64)
    m = np.asarray(ops.assemble_diag(1.0))
    assert abs(m.sum() - 1.0) < 1e-12


@pytest.mark.parametrize(
    "degree", [2, 3, pytest.param(5, marks=pytest.mark.slow)]
)
def test_uniform_fast_path_matches_general(degree):
    mesh = create_box((3, 2, 2))
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    assert ops.K_ref is not None  # uniform mesh detected
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(ops.ndofs))
    coeff = jnp.asarray(0.5 + rng.random(mesh.num_cells))
    y_fast = ops.stiffness_apply([x], [coeff])
    z = ops.gather_combine([x], [coeff])
    y_gen = ops.scatter(ops.stiffness_cells_general(z))
    assert np.allclose(np.asarray(y_fast), np.asarray(y_gen), rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_stiffness_diag(dim):
    mesh = distort(MESHES[dim]())
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    coeff = 0.5 + rng.random(mesh.num_cells)
    K = dense_stiffness_oracle(ops, coeff)
    d = np.asarray(ops.stiffness_diag(jnp.asarray(coeff)))
    assert np.allclose(d, np.diag(K), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_stiffness_diag_lattice_fold(dim):
    """The O(ndofs)-memory lattice fold must match the per-cell assembly
    on a uniform (non-distorted) mesh with a heterogeneous coefficient."""
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    assert ops.lattice is not None
    rng = np.random.default_rng(5)
    coeff = 0.5 + rng.random(mesh.num_cells)
    d_fold = np.asarray(ops.stiffness_diag(coeff))
    K = dense_stiffness_oracle(ops, coeff)
    assert np.allclose(d_fold, np.diag(K), rtol=1e-10, atol=1e-12)


def test_facet_vector_1d_points():
    mesh = create_interval(5)
    tag_boundaries(
        mesh,
        {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12},
    )
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    src = np.asarray(ops.facet_vector(1, 2.0))
    assert abs(src.sum() - 2.0) < 1e-13
    # Only the boundary dof at x=0 is hit
    nz = np.nonzero(src)[0]
    assert len(nz) == 1 and abs(ops.space.dof_coords[nz[0], 0]) < 1e-12


def test_facet_vector_2d_surface_measure():
    # ∫_Γ 1 ds over the x=0 edge of the unit square = 1.
    mesh = create_rectangle((3, 4))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12}, default=2)
    ops = SEMOperators(mesh, 4, dtype=jnp.float64)
    v = np.asarray(ops.facet_vector(1, 1.0))
    assert abs(v.sum() - 1.0) < 1e-12
    nz_coords = ops.space.dof_coords[np.nonzero(v)[0]]
    assert np.all(np.abs(nz_coords[:, 0]) < 1e-12)


def test_facet_vector_3d_surface_measure():
    mesh = create_box((2, 2, 3), hi=(1.0, 2.0, 1.5))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12}, default=2)
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    v = np.asarray(ops.facet_vector(1, 1.0))
    assert abs(v.sum() - 2.0 * 1.5) < 1e-12


def test_quadrature_stiffness_vs_dense():
    """Gauss-rule stiffness action vs a dense oracle assembled with the same
    rule (direct numpy from tabulated basis values/derivatives)."""
    from fenicsxfus_tpu.core.geometry import quadrature_factors
    from fenicsxfus_tpu.ops.quadrature_ops import (
        QuadratureOperators,
        _lagrange_derivative,
        gauss_rule_01,
    )
    from fenicsxfus_tpu.core.gll import lagrange_eval_gll

    mesh = distort(create_rectangle((4, 3)))
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    nq = 6
    qops = QuadratureOperators(ops, nq=nq)
    x1, w1 = gauss_rule_01(nq)
    wdetJ, G = quadrature_factors(mesh, x1, w1)
    N = ops.N
    T = lagrange_eval_gll(N, x1)
    xg, _ = gll_points_weights_01(N)
    dT = _lagrange_derivative(xg, x1)
    B = [np.kron(dT, T), np.kron(T, dT)]  # d/dxi0, d/dxi1 at the Gauss lattice
    pairs = SYM_PAIRS[2]
    rng = np.random.default_rng(7)
    coeff = 0.5 + rng.random(mesh.num_cells)
    K = np.zeros((ops.ndofs, ops.ndofs))
    dofmap = np.asarray(ops.space.dofmap)
    for c in range(mesh.num_cells):
        Ke = np.zeros((N**2, N**2))
        for idx, (a, b) in enumerate(pairs):
            g = G[c, :, idx]
            Ke += np.einsum("qn,q,qm->nm", B[a], g, B[b])
            if a != b:
                Ke += np.einsum("qn,q,qm->nm", B[b], g, B[a])
        dm = dofmap[c]
        K[np.ix_(dm, dm)] += coeff[c] * Ke
    xv = rng.standard_normal(ops.ndofs)
    y_ref = K @ xv
    y_q = np.asarray(qops.stiffness_apply([jnp.asarray(xv)], [jnp.asarray(coeff)]))
    assert np.linalg.norm(y_q - y_ref) < 1e-10 * np.linalg.norm(y_ref)


def test_consistent_mass_integrates_exactly():
    """Gauss mass action on the all-ones vector integrates the coefficient:
    1ᵀ M 1 = ∫ coeff dx (exactly, unlike the lumped GLL mass of degree 2p-1)."""
    from fenicsxfus_tpu.ops.quadrature_ops import QuadratureOperators

    mesh = create_interval(5)
    ops = SEMOperators(mesh, 4, dtype=jnp.float64)
    qops = QuadratureOperators(ops)
    ones = jnp.ones(ops.ndofs, jnp.float64)
    y = qops.mass_apply(ones, 3.0)
    assert abs(float(jnp.sum(y)) - 3.0) < 1e-13
    # consistent mass is NOT diagonal: M@e_i has off-diagonal entries
    e = jnp.zeros(ops.ndofs, jnp.float64).at[2].set(1.0)
    col = np.asarray(qops.mass_apply(e, 1.0))
    assert np.count_nonzero(np.abs(col) > 1e-14) > 1
    # diag() matches action on basis vectors
    d = np.asarray(qops.mass_diag(1.0))
    assert abs(d[2] - col[2]) < 1e-13


@pytest.mark.parametrize("dim,degree", [(2, 3), (3, 2), (3, 4)])
def test_dense_tabulation_matches_sum_factorised(dim, degree):
    """stiffness_cells_dense (shared-B MXU matmuls, the fenicsx-pc rung
    done the TPU way) == the sum-factorised chain on distorted per-cell
    geometry, with and without a nodal quadrature coefficient."""
    from fenicsxfus_tpu.core.gll import diff_matrix
    from fenicsxfus_tpu.ops.operators import (
        stiffness_cells,
        stiffness_cells_dense,
        tabulate_B,
    )

    rng = np.random.default_rng(degree)
    n = (4, 3, 3)[:dim]
    mesh = create_box(n) if dim == 3 else create_rectangle(n[:2])
    verts = mesh.vertices.copy()
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    interior = np.all((verts > lo + 1e-12) & (verts < hi - 1e-12), axis=1)
    verts[interior] += 0.04 * (rng.random((int(interior.sum()), dim)) - 0.5)
    mesh.vertices = verts
    mesh.uniform_hint = False
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    N = ops.N
    z = jnp.asarray(rng.standard_normal((mesh.num_cells,) + (N,) * dim))
    D = jnp.asarray(diff_matrix(N), jnp.float64)
    B = jnp.asarray(tabulate_B(N, dim), jnp.float64)
    y_sf = stiffness_cells(D, ops.G, z, dim)
    y_de = stiffness_cells_dense(B, ops.G, z, dim)
    scale = float(jnp.max(jnp.abs(y_sf)))
    assert float(jnp.max(jnp.abs(y_de - y_sf))) / scale < 1e-12
    q = jnp.asarray(rng.uniform(0.5, 2.0, (mesh.num_cells,) + (N,) * dim))
    y_sf = stiffness_cells(D, ops.G, z, dim, qcoeff=q)
    y_de = stiffness_cells_dense(B, ops.G, z, dim, qcoeff=q)
    assert float(jnp.max(jnp.abs(y_de - y_sf))) / scale < 1e-12
