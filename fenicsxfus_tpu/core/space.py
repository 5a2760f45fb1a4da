"""Spectral-element function space: dofmaps and assembly index maps.

TPU-native replacement of the reference's DOLFINx function space + its
tensor-product dofmap permutation (``cpp/fenicsx-sf/common/permute.hpp:15-42``):
here element DOFs are *generated* directly in tensor-lexicographic (i0 slowest)
order, so no permutation is ever needed. The space precomputes, once, on host:

* ``dofmap`` [Nc, N**d] int32 — global DOF index of each cell-local GLL node,
* ``scatter_perm`` / ``scatter_segids`` — a sorted segment-sum plan so that
  cell→global accumulation ("scatter_rev add", reference
  ``cpp/fenicsx-sf/common/Linear.hpp:206``) runs as a deterministic,
  TPU-friendly ``jax.ops.segment_sum`` instead of atomic scatter-add,
* ``dof_coords`` [ndofs, dim] — for interpolation of analytical fields.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .gll import gll_points_weights_01


def _geom_basis_1d(pts: np.ndarray) -> np.ndarray:
    """Linear geometry basis {1-x, x} tabulated at ``pts``: [npts, 2]."""
    return np.stack([1.0 - pts, pts], axis=-1)


def cell_node_coords(mesh, N: int) -> np.ndarray:
    """Physical coordinates of the GLL node lattice of every cell.

    Returns [Nc, N**d, dim]; local nodes in tensor-lex order (axis 0 slowest).
    """
    d = mesh.dim
    x1, _ = gll_points_weights_01(N)
    phi = _geom_basis_1d(x1)  # [N, 2]
    # Tensor-product geometry shape functions at each lattice node.
    shape = phi
    for _ in range(d - 1):
        shape = np.einsum("ia,jb->ijab", shape.reshape(shape.shape[0], -1), phi).reshape(
            shape.shape[0] * N, -1
        )
    # shape: [N**d, 2**d] with both indices tensor-lex (axis 0 slowest)
    verts = mesh.cell_vertices()  # [Nc, 2**d, dim]
    return np.einsum("nv,cvx->cnx", shape, verts)


def _structured_dofmap(mesh, p: int) -> tuple[np.ndarray, int]:
    n = mesh.grid_shape
    d = len(n)
    N = p + 1
    gdims = tuple(na * p + 1 for na in n)
    ndofs = int(np.prod(gdims))
    cell_axes = [np.arange(na) for na in n]
    cgrids = np.meshgrid(*cell_axes, indexing="ij")
    c = [g.reshape(-1) for g in cgrids]  # [Nc] per axis
    node_axes = [np.arange(N)] * d
    ngrids = np.meshgrid(*node_axes, indexing="ij")
    i = [g.reshape(-1) for g in ngrids]  # [N**d] per axis
    idx = [c[a][:, None] * p + i[a][None, :] for a in range(d)]
    dofmap = np.ravel_multi_index(idx, gdims)
    return dofmap.astype(np.int32), ndofs


def _generic_dofmap(mesh, p: int) -> tuple[np.ndarray, int, np.ndarray]:
    N = p + 1
    coords = cell_node_coords(mesh, N)  # [Nc, N**d, dim]
    flat = coords.reshape(-1, mesh.dim)
    scale = max(float(np.max(np.abs(flat))), 1.0)
    key = np.round(flat / (1e-10 * scale)).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    dofmap = inv.reshape(coords.shape[0], coords.shape[1]).astype(np.int32)
    return dofmap, int(first.size), flat[first]


@dataclass
class FunctionSpace:
    mesh: "Mesh"  # noqa: F821
    degree: int
    dofmap: np.ndarray  # [Nc, N**d] int32
    ndofs: int
    dof_coords: np.ndarray  # [ndofs, dim]
    scatter_perm: np.ndarray  # [Nc * N**d] int32
    scatter_segids: np.ndarray  # [Nc * N**d] int32 (sorted)

    @property
    def N(self) -> int:
        return self.degree + 1

    @property
    def dim(self) -> int:
        return self.mesh.dim

    @property
    def nodes_per_cell(self) -> int:
        return self.N**self.mesh.dim

    def face_local_dofs(self, axis: int, side: int) -> np.ndarray:
        """Cell-local indices of the GLL sub-lattice on face {xi_axis == side}.

        Returned in tensor-lex order over the remaining axes: [N**(d-1)].
        """
        d, N = self.mesh.dim, self.N
        lattice = np.arange(N**d).reshape((N,) * d)
        sl = [slice(None)] * d
        sl[axis] = 0 if side == 0 else N - 1
        return lattice[tuple(sl)].reshape(-1)


def build_space(mesh, degree: int) -> FunctionSpace:
    N = degree + 1
    if mesh.grid_shape is not None:
        dofmap, ndofs = _structured_dofmap(mesh, degree)
        coords = cell_node_coords(mesh, N).reshape(-1, mesh.dim)
        dof_coords = np.zeros((ndofs, mesh.dim))
        dof_coords[dofmap.reshape(-1)] = coords
    else:
        dofmap, ndofs, dof_coords = _generic_dofmap(mesh, degree)
    flat = dofmap.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    segids = flat[perm].astype(np.int32)
    return FunctionSpace(
        mesh=mesh,
        degree=degree,
        dofmap=dofmap,
        ndofs=ndofs,
        dof_coords=dof_coords,
        scatter_perm=perm,
        scatter_segids=segids,
    )
