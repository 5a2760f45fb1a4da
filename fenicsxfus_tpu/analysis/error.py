"""Error norms against analytical solutions.

The reference computes L2 errors by interpolating the exact solution into a
degree+3 Lagrange space and assembling ∫(u−u_e)² dx with UFL
(``python/tests/test_linearspectral_1d.py:95-107``). Here we evaluate the
numerical solution and the exact solution directly at a dense Gauss-Legendre
quadrature of the mesh and integrate — an independent (non-GLL) quadrature,
which makes it a genuine oracle for the solver.
"""

from __future__ import annotations

import numpy as np

from ..core.geometry import _geom_grad_tensor, _geom_tab_1d
from ..core.gll import lagrange_eval_gll


def _gauss_quadrature_data(mesh, N: int, nq: int):
    """Dense-quadrature tabulation: returns (tab [nq**d, N**d],
    wdetJ [Nc, nq**d], coords [Nc, nq**d, dim])."""
    d = mesh.dim
    gp, gw = np.polynomial.legendre.leggauss(nq)
    gp = (gp + 1.0) / 2.0
    gw = gw / 2.0
    # Field basis tabulation at the Gauss lattice
    t1 = lagrange_eval_gll(N, gp)  # [nq, N]
    tab = t1
    for _ in range(d - 1):
        tab = np.einsum("qi,rj->qrij", tab, t1).reshape(
            tab.shape[0] * nq, tab.shape[1] * N
        )
    # Geometry at the Gauss lattice
    dshape = _geom_grad_tensor([gp] * d)  # [nq**d, 2**d, d]
    phi1 = _geom_tab_1d(gp)[0]
    shape = phi1
    for _ in range(d - 1):
        shape = np.einsum("qv,rw->qrvw", shape, phi1).reshape(
            shape.shape[0] * nq, shape.shape[1] * 2
        )
    verts = mesh.cell_vertices()
    J = np.einsum("cva,qvb->cqab", verts, dshape)
    detJ = np.abs(np.linalg.det(J))
    w = gw
    for _ in range(d - 1):
        w = np.multiply.outer(w, gw).reshape(-1)
    wdetJ = w[None, :] * detJ
    coords = np.einsum("qv,cvx->cqx", shape, verts)
    return tab, wdetJ, coords


def relative_l2_error(ops, u, exact_fn, nq: int | None = None) -> float:
    """‖u − u_e‖_L2 / ‖u_e‖_L2 with u_e = exact_fn(x), x shape [dim, npts]."""
    mesh = ops.mesh
    N = ops.N
    nq = nq or (N + 4)
    tab, wdetJ, coords = _gauss_quadrature_data(mesh, N, nq)
    uc = np.asarray(u)[np.asarray(ops.space.dofmap)]  # [Nc, N**d]
    uq = uc @ tab.T  # [Nc, nq**d]
    ue = exact_fn(coords.reshape(-1, mesh.dim).T).reshape(uq.shape)
    num = np.sum(wdetJ * (uq - ue) ** 2)
    den = np.sum(wdetJ * ue**2)
    return float(np.sqrt(num) / np.sqrt(den))


def l2_norm(ops, u, nq: int | None = None) -> float:
    mesh = ops.mesh
    N = ops.N
    nq = nq or (N + 4)
    tab, wdetJ, _ = _gauss_quadrature_data(mesh, N, nq)
    uc = np.asarray(u)[np.asarray(ops.space.dofmap)]
    uq = uc @ tab.T
    return float(np.sqrt(np.sum(wdetJ * uq**2)))
