"""Geometry precompute: scaled Jacobian factors for volume and facet terms.

TPU-native analogue of the reference's geometry precompute
(``cpp/fenicsx-sf/common/precompute.hpp``):

* ``compute_scaled_jacobian_determinant`` (:34-94)  → ``volume_mass_factors``:
  per-cell, per-GLL-point  w_q * |det J|  (the diagonal mass entries in the
  reference frame),
* ``compute_scaled_geometrical_factor`` (:102-213) → ``volume_stiffness_factors``:
  per-cell, per-point symmetric  G = w_q * |det J| * J^{-1} J^{-T}  packed as
  1 (1D) / 3 (2D: 00,01,11) / 6 (3D: 00,01,02,11,12,22) entries,
* facet analogues for the tagged-boundary source/ABC terms (reference builds
  these through FFCx facet kernels, ``cpp/fenicsx-sf/common/Linear.hpp:101-124``).

All host numpy float64; results are shipped to device once.
"""

from __future__ import annotations

import numpy as np

from .gll import gll_points_weights_01

SYM_PAIRS = {
    1: [(0, 0)],
    2: [(0, 0), (0, 1), (1, 1)],
    3: [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)],
}


def _geom_tab_1d(pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Linear geometry basis {1-x, x} values and derivatives at ``pts``."""
    phi = np.stack([1.0 - pts, pts], axis=-1)  # [n, 2]
    dphi = np.broadcast_to(np.array([-1.0, 1.0]), phi.shape).copy()
    return phi, dphi


def _geom_grad_tensor(pts_per_axis: list[np.ndarray]) -> np.ndarray:
    """dshape[q, v, b]: gradient of the 2**d multilinear shape functions at the
    tensor lattice of points; q and v tensor-lex (axis 0 slowest)."""
    d = len(pts_per_axis)
    tabs = [_geom_tab_1d(p) for p in pts_per_axis]
    nq = int(np.prod([len(p) for p in pts_per_axis]))
    out = np.zeros((nq, 2**d, d))
    for b in range(d):
        acc = np.ones((1, 1))
        for a in range(d):
            t = tabs[a][1] if a == b else tabs[a][0]  # [n_a, 2]
            acc = np.einsum("qv,nw->qnvw", acc, t).reshape(
                acc.shape[0] * t.shape[0], acc.shape[1] * 2
            )
        out[:, :, b] = acc
    return out


def _jacobians(verts: np.ndarray, dshape: np.ndarray) -> np.ndarray:
    """J[c, q, a, b] = sum_v verts[c,v,a] * dshape[q,v,b]."""
    return np.einsum("cva,qvb->cqab", verts, dshape)


def volume_factors(mesh, N: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (wdetJ [Nc, N**d], G [Nc, N**d, nsym]) at the GLL lattice."""
    x1, w1 = gll_points_weights_01(N)
    return quadrature_factors(mesh, x1, w1)


def quadrature_factors(
    mesh, x1: np.ndarray, w1: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Geometry factors at an arbitrary tensor-product quadrature rule
    (per-axis points ``x1`` / weights ``w1`` on [0,1]) — used by the
    non-collocated Gauss-quadrature operators (the reference's
    ``fenicsx-pc`` variant decouples quadrature from basis degree,
    ``cpp/fenicsx-pc/common/precompute_op.hpp``)."""
    d = mesh.dim
    verts = mesh.cell_vertices()
    # full tensor-lattice weights
    wfull = w1
    for _ in range(d - 1):
        wfull = np.multiply.outer(wfull, w1).reshape(-1)
    if mesh.num_cells >= 20000:
        # native streaming precompute (the numpy path below materializes
        # [Nc, Nq, d, d] Jacobians — ~10 GB at 1M cells, p=4)
        from ..native import volume_factors as native_factors

        grids = np.meshgrid(*([x1] * d), indexing="ij")
        qpts = np.stack([g.reshape(-1) for g in grids], axis=-1)
        out = native_factors(verts, qpts, wfull)
        if out is not None:
            return out
    dshape = _geom_grad_tensor([x1] * d)  # [nq**d, 2**d, d]
    J = _jacobians(verts, dshape)  # [Nc, Nq, d, d]
    detJ = np.linalg.det(J)
    sign = np.sign(detJ)
    adetJ = np.abs(detJ)
    Jinv = np.linalg.inv(J)
    # weights at the tensor lattice
    w = w1
    for _ in range(d - 1):
        w = np.multiply.outer(w, w1).reshape(-1)
    wdetJ = w[None, :] * adetJ
    C = np.einsum("cqab,cqdb->cqad", Jinv, Jinv)  # J^{-1} J^{-T}
    pairs = SYM_PAIRS[d]
    G = np.stack([wdetJ * C[:, :, a, b] for (a, b) in pairs], axis=-1)
    if np.any(sign <= 0):
        nbad = int(np.sum(sign <= 0))
        if np.all(adetJ > 0):
            pass  # inverted-orientation cells are fine: |detJ| used throughout
        else:
            raise ValueError(f"{nbad} degenerate cells (detJ == 0)")
    return wdetJ, G


def is_uniform_mesh(mesh, rtol: float = 1e-12) -> bool:
    """True if every cell is the same axis-aligned translate (structured
    uniform grid) — enables the shared-element-matrix fast path."""
    if getattr(mesh, "uniform_hint", False):
        return True
    verts = mesh.cell_vertices()
    rel = verts - verts[:, :1, :]
    ref = rel[0]
    scale = max(float(np.max(np.abs(ref))), 1e-300)
    return bool(np.all(np.abs(rel - ref[None]) <= rtol * scale))


def facet_factors(mesh, space, facets: np.ndarray):
    """Assembly data for a set of boundary facets.

    Parameters: ``facets`` [Nf, 2] of (cell, local_face).
    Returns (gdofs [Nf, Nfn] int32, wdetJf [Nf, Nfn], cells [Nf] int32) where
    Nfn = N**(d-1) facet GLL nodes; wdetJf = facet quadrature weight × surface
    measure at each facet node. For d==1 facets are points: Nfn=1, wdetJf=1.
    """
    d = mesh.dim
    N = space.N
    nf = len(facets)
    cells = facets[:, 0].astype(np.int32)
    if nf == 0:
        return (
            np.zeros((0, max(N ** (d - 1), 1)), np.int32),
            np.zeros((0, max(N ** (d - 1), 1))),
            cells,
        )
    nfn = N ** (d - 1) if d > 1 else 1
    gdofs = np.zeros((nf, nfn), dtype=np.int32)
    wdetJf = np.zeros((nf, nfn))
    x1, w1 = gll_points_weights_01(N)
    for face in range(2 * d):
        sel = np.where(facets[:, 1] == face)[0]
        if sel.size == 0:
            continue
        axis, side = divmod(face, 2)
        local = space.face_local_dofs(axis, side)  # [nfn]
        gdofs[sel] = space.dofmap_for_cells(facets[sel, 0])[:, local]
        if d == 1:
            wdetJf[sel] = 1.0
            continue
        # Facet lattice points: fix xi_axis = side, tensor over other axes.
        pts = [x1] * d
        pts[axis] = np.array([0.0 if side == 0 else 1.0])
        dshape = _geom_grad_tensor(pts)  # [nfn, 2**d, d]
        verts = mesh.cell_vertices()[facets[sel, 0]]
        J = _jacobians(verts, dshape)  # [nsel, nfn, d, d]
        tang = [a for a in range(d) if a != axis]
        Jf = J[:, :, :, tang]  # [nsel, nfn, d, d-1]
        JtJ = np.einsum("cqat,cqau->cqtu", Jf, Jf)
        meas = np.sqrt(np.abs(np.linalg.det(JtJ)))
        wf = w1
        for _ in range(d - 2):
            wf = np.multiply.outer(wf, w1).reshape(-1)
        wdetJf[sel] = wf[None, :] * meas
    return gdofs, wdetJf, cells
