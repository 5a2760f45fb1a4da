"""Spectral-element function space: dofmaps and assembly index maps.

TPU-native replacement of the reference's DOLFINx function space + its
tensor-product dofmap permutation (``cpp/fenicsx-sf/common/permute.hpp:15-42``):
here element DOFs are *generated* directly in tensor-lexicographic (i0 slowest)
order, so no permutation is ever needed. The space provides, lazily:

* ``dofmap`` [Nc, N**d] int32 — global DOF index of each cell-local GLL node,
* ``scatter_perm`` / ``scatter_segids`` — a sorted segment-sum plan so that
  cell→global accumulation ("scatter_rev add", reference
  ``cpp/fenicsx-sf/common/Linear.hpp:206``) runs as a deterministic,
  TPU-friendly ``jax.ops.segment_sum`` instead of atomic scatter-add,
* ``dof_coords`` [ndofs, dim] — for interpolation of analytical fields.

Everything heavy is a ``cached_property``: the lattice fast path
(ops/lattice.py) needs none of it, so a 70M-DOF uniform-mesh solver never
pays for gather maps it will not use. ``dofmap_for_cells`` serves facet
assembly with only the boundary cells' maps.
"""

from __future__ import annotations

from functools import cached_property

import numpy as np

from .gll import gll_points_weights_01


def _geom_basis_1d(pts: np.ndarray) -> np.ndarray:
    """Linear geometry basis {1-x, x} tabulated at ``pts``: [npts, 2]."""
    return np.stack([1.0 - pts, pts], axis=-1)


def cell_node_coords(mesh, N: int, cells=None) -> np.ndarray:
    """Physical coordinates of the GLL node lattice of cells (default: all).

    Returns [Nc, N**d, dim]; local nodes in tensor-lex order (axis 0 slowest).
    """
    d = mesh.dim
    x1, _ = gll_points_weights_01(N)
    phi = _geom_basis_1d(x1)  # [N, 2]
    shape = phi
    for _ in range(d - 1):
        shape = np.einsum("ia,jb->ijab", shape.reshape(shape.shape[0], -1), phi).reshape(
            shape.shape[0] * N, -1
        )
    # shape: [N**d, 2**d] with both indices tensor-lex (axis 0 slowest)
    conn = mesh.cells if cells is None else mesh.cells[cells]
    verts = mesh.vertices[conn]  # [nc, 2**d, dim]
    return np.einsum("nv,cvx->cnx", shape, verts)


class FunctionSpace:
    def __init__(self, mesh, degree: int):
        self.mesh = mesh
        self.degree = degree
        self._structured = mesh.grid_shape is not None
        if self._structured:
            self._gdims = tuple(na * degree + 1 for na in mesh.grid_shape)
            self.ndofs = int(np.prod(self._gdims))
        else:
            self.ndofs = None  # resolved with the dofmap

    @property
    def N(self) -> int:
        return self.degree + 1

    @property
    def dim(self) -> int:
        return self.mesh.dim

    @property
    def nodes_per_cell(self) -> int:
        return self.N ** self.mesh.dim

    # ------------------------------------------------------------- helpers
    def _node_lattice_indices(self):
        """Per-axis (cell index, local node) → global lattice index arrays."""
        d = self.dim
        N, p = self.N, self.degree
        node_axes = [np.arange(N)] * d
        ngrids = np.meshgrid(*node_axes, indexing="ij")
        return [g.reshape(-1) for g in ngrids]  # [N**d] per axis

    def dofmap_for_cells(self, cells: np.ndarray) -> np.ndarray:
        """Global DOF indices for a subset of cells: [len(cells), N**d]."""
        if not self._structured:
            return self.dofmap[cells]
        d, p = self.dim, self.degree
        n = self.mesh.grid_shape
        cidx = np.unravel_index(np.asarray(cells, np.int64), n)
        i = self._node_lattice_indices()
        idx = [cidx[a][:, None] * p + i[a][None, :] for a in range(d)]
        return np.ravel_multi_index(idx, self._gdims).astype(np.int32)

    # ------------------------------------------------------- lazy big data
    @cached_property
    def dofmap(self) -> np.ndarray:
        if self._structured:
            return self.dofmap_for_cells(np.arange(self.mesh.num_cells))
        dofmap = self._blocked_dofmap()
        self.ndofs = int(self.block_offsets["end"])
        return dofmap

    def _blocked_dofmap(self) -> np.ndarray:
        """Entity-blocked DOF numbering for unstructured conforming meshes:
        [cell interiors | face interiors | edge interiors | vertices] —
        the layout the row-granular assembly (``ops/blocked.py``) needs.
        Every gather/scatter over this numbering moves whole entity rows."""
        from .conn import (
            edge_canonical_pos,
            extract_connectivity,
            face_canonical_pos,
            local_edges_3d,
            local_faces,
        )

        mesh, N, d = self.mesh, self.N, self.mesh.dim
        m = N - 2
        nc = mesh.num_cells
        conn = extract_connectivity(mesh)
        self.conn = conn
        sizes = {
            "I": nc * m**d,
            "F": conn.num_faces * m ** (d - 1) if d >= 2 else 0,
            "E": conn.num_edges * m if d == 3 else 0,
            "V": mesh.num_vertices,
        }
        off = {"I": 0}
        off["F"] = off["I"] + sizes["I"]
        off["E"] = off["F"] + sizes["F"]
        off["V"] = off["E"] + sizes["E"]
        off["end"] = off["V"] + sizes["V"]
        self.block_offsets = off

        lattice = np.arange(N**d).reshape((N,) * d)
        dofmap = np.empty((nc, N**d), np.int64)
        cells = np.asarray(mesh.cells, np.int64)
        rows = np.arange(nc)

        # interiors
        if m > 0:
            ii = lattice[(slice(1, N - 1),) * d].reshape(-1)
            dofmap[:, ii] = off["I"] + (
                rows[:, None] * m**d + np.arange(m**d)[None, :]
            )
        # faces (3D) / edges-as-faces (2D)
        if d >= 2 and m > 0:
            if d == 3:
                tables = np.stack(
                    [face_canonical_pos(m, o).reshape(-1) for o in range(8)]
                )  # [8, m*m]
            else:
                tables = np.stack(
                    [edge_canonical_pos(m, o) for o in range(2)]
                )  # [2, m]
            for k, (a, s, uv) in enumerate(local_faces(d)):
                sl = [slice(1, N - 1)] * d
                sl[a] = N - 1 if s else 0
                ii = lattice[tuple(sl)].reshape(-1)  # cell-local lex (u, v)
                pos = tables[conn.face_orient[:, k].astype(np.int64)]  # [Nc, m^(d-1)]
                dofmap[:, ii] = (
                    off["F"]
                    + conn.face_ids[:, k][:, None] * m ** (d - 1)
                    + pos
                )
        # edges (3D)
        if d == 3 and m > 0:
            etab = np.stack([edge_canonical_pos(m, o) for o in range(2)])
            for k, (a, fixed) in enumerate(local_edges_3d()):
                sl = [None, None, None]
                sl[a] = slice(1, N - 1)
                for ax, s in fixed:
                    sl[ax] = N - 1 if s else 0
                ii = lattice[tuple(sl)].reshape(-1)
                pos = etab[conn.edge_flip[:, k].astype(np.int64)]
                dofmap[:, ii] = (
                    off["E"] + conn.edge_ids[:, k][:, None] * m + pos
                )
        # vertices
        for v in range(2**d):
            bits = [(v >> (d - 1 - a)) & 1 for a in range(d)]
            ii = int(lattice[tuple((N - 1) if b else 0 for b in bits)])
            dofmap[:, ii] = off["V"] + cells[:, v]
        return dofmap.astype(np.int32)

    @cached_property
    def dof_coords(self) -> np.ndarray:
        coords = cell_node_coords(self.mesh, self.N).reshape(-1, self.mesh.dim)
        out = np.zeros((self.ndofs, self.mesh.dim))
        out[self.dofmap.reshape(-1)] = coords
        return out

    @cached_property
    def _scatter_plan(self):
        flat = self.dofmap.reshape(-1)
        perm = np.argsort(flat, kind="stable").astype(np.int32)
        return perm, flat[perm].astype(np.int32)

    @property
    def scatter_perm(self) -> np.ndarray:
        return self._scatter_plan[0]

    @property
    def scatter_segids(self) -> np.ndarray:
        return self._scatter_plan[1]

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
    sp = FunctionSpace(mesh, degree)
    if sp.ndofs is None:
        _ = sp.dofmap  # generic meshes must resolve ndofs eagerly
    return sp
