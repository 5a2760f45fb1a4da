"""Host-side mesh representation and structured generators.

The framework's mesh analogue of DOLFINx ``mesh`` + ``meshtags`` (reference:
``python/src/fenicsxfus/_linear.py:67-78`` consumes a mesh plus facet tags):
a pure-numpy container holding

* ``vertices`` [Nv, dim],
* ``cells`` [Nc, 2**dim] multilinear cell→vertex connectivity in tensor
  (lexicographic, axis-0 slowest) local order,
* ``facet_tags``: tag → [Nf, 2] array of (cell index, local face) pairs,
  with local face ``2*axis + side`` meaning the facet {xi_axis == side},
* optional ``cell_tags`` [Nc] for cell-wise (DG-0) material regions, the
  analogue of the reference's 2-medium cell tags
  (``python/examples/lossy_planar2d_4_exp/lossy_planar2d_4_exp.py:76-88``).

Structured interval/rectangle/box generators mirror DOLFINx
``create_interval`` / ``create_rectangle`` / ``create_box`` for
quadrilateral/hexahedral cells; boundary facets can be tagged with
coordinate predicates like the reference tests
(``python/tests/test_linearspectral_1d.py:38-52``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Mesh:
    dim: int
    vertices: np.ndarray  # [Nv, dim] float64
    cells: np.ndarray  # [Nc, 2**dim] int64, tensor-lex local vertex order
    facet_tags: dict[int, np.ndarray] = field(default_factory=dict)
    cell_tags: np.ndarray | None = None  # [Nc] int
    # For structured meshes: cells per axis (enables fast paths / slab partition).
    grid_shape: tuple[int, ...] | None = None
    # Set by the structured generators: uniform axis-aligned spacing is
    # guaranteed by construction (skips an O(Nc) host check on 1-core VMs).
    uniform_hint: bool = False

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    def cell_vertices(self) -> np.ndarray:
        """Coordinates of each cell's vertices: [Nc, 2**dim, dim]."""
        return self.vertices[self.cells]

    def cell_midpoints(self) -> np.ndarray:
        """Cell midpoints [Nc, dim] — used to classify cells into DG-0
        material regions (the TPU-native replacement for the reference's
        pre-tagged meshes, e.g. ``PH1/SC1-BM4/main.cpp:120-160``)."""
        return self.cell_vertices().mean(axis=1)

    def h_min(self) -> float:
        """Minimum edge length over all cells (used for the CFL timestep,
        cf. reference ``cpp/.../W-H131-WATER/main.cpp:75-77``)."""
        verts = self.cell_vertices()
        d = self.dim
        h = np.inf
        for a in range(d):
            stride = 2 ** (d - 1 - a)
            for base in range(2**d):
                if (base // stride) % 2 == 0:
                    e = verts[:, base + stride, :] - verts[:, base, :]
                    h = min(h, float(np.min(np.linalg.norm(e, axis=-1))))
        return h


def _lattice_cells(n: tuple[int, ...]) -> np.ndarray:
    """Cell→vertex connectivity for a vertex lattice with n[a] cells per axis."""
    d = len(n)
    vdims = tuple(na + 1 for na in n)
    cells_per_axis = [np.arange(na) for na in n]
    grids = np.meshgrid(*cells_per_axis, indexing="ij")
    c0 = [g.reshape(-1) for g in grids]  # cell lattice coords, axis-0 slowest
    ncells = c0[0].size
    conn = np.zeros((ncells, 2**d), dtype=np.int64)
    for local in range(2**d):
        offs = [(local >> (d - 1 - a)) & 1 for a in range(d)]
        idx = [c0[a] + offs[a] for a in range(d)]
        conn[:, local] = np.ravel_multi_index(idx, vdims)
    return conn


def _structured(
    n: tuple[int, ...], lo: tuple[float, ...], hi: tuple[float, ...]
) -> Mesh:
    d = len(n)
    axes = [np.linspace(lo[a], hi[a], n[a] + 1) for a in range(d)]
    grids = np.meshgrid(*axes, indexing="ij")
    verts = np.stack([g.reshape(-1) for g in grids], axis=-1)
    cells = _lattice_cells(n)
    return Mesh(
        dim=d, vertices=verts, cells=cells, grid_shape=tuple(n), uniform_hint=True
    )


def create_interval(nx: int, a: float = 0.0, b: float = 1.0) -> Mesh:
    return _structured((nx,), (a,), (b,))


def create_rectangle(
    n: tuple[int, int],
    lo: tuple[float, float] = (0.0, 0.0),
    hi: tuple[float, float] = (1.0, 1.0),
) -> Mesh:
    return _structured(n, lo, hi)


def create_box(
    n: tuple[int, int, int],
    lo: tuple[float, float, float] = (0.0, 0.0, 0.0),
    hi: tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Mesh:
    return _structured(n, lo, hi)


def as_unstructured(mesh: Mesh) -> Mesh:
    """A view of ``mesh`` with the structured-lattice metadata stripped, so
    the space builds the blocked entity-class numbering and the mesh can be
    partitioned by ``parallel.unstructured`` (the route for sharding
    DEFORMED lattices — e.g. bowl-fitted meshes, which the grid/slab
    decompositions reject because they assume uniform geometry). Shares
    vertex/cell/tag arrays with the original."""
    return Mesh(
        dim=mesh.dim,
        vertices=mesh.vertices,
        cells=mesh.cells,
        facet_tags=mesh.facet_tags,
        cell_tags=mesh.cell_tags,
        grid_shape=None,
        uniform_hint=False,
    )


def _morton_codes(pts: np.ndarray, bits: int = 21) -> np.ndarray:
    """Z-order (Morton) code of each point, quantised to ``bits`` per axis
    (21*3 = 63 bits fits uint64). Interleaved axis-major, axis 0 most
    significant within each bit level."""
    d = pts.shape[1]
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo
    span[span == 0] = 1.0
    scale = float((1 << bits) - 1)
    q = np.minimum(
        ((pts - lo) / span * scale).astype(np.uint64), np.uint64(2**bits - 1)
    )
    code = np.zeros(len(pts), np.uint64)
    for b in range(bits):
        for a in range(d):
            code |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * d + (d - 1 - a)
            )
    return code


def reorder_locality(mesh: Mesh) -> Mesh:
    """Locality-optimised copy of ``mesh`` for the unstructured operator
    path: cells reordered along a Morton (Z-order) curve of their midpoints,
    vertices renumbered by first touch in the new cell order.

    Spatially adjacent cells then share nearby vertex ids, and — together
    with the first-touch entity relabeling in ``core/conn.py`` — reference
    nearby rows of the face/edge/vertex tables, so the row gathers and
    transpose-gathers of ``ops/blocked.py`` hit nearby (8, 128) physical
    tiles instead of striding the whole table (the reference gets the same
    effect from the mesh partitioner's cache-aware ordering; here it is an
    explicit preprocessing pass). Facet and cell tags are remapped; geometry
    is unchanged, so solutions match up to fp summation order."""
    perm = np.argsort(_morton_codes(mesh.cell_midpoints()), kind="stable")
    cells = mesh.cells[perm]
    # first-touch vertex renumbering (unused vertices keep trailing ids)
    flat = cells.reshape(-1)
    used, first = np.unique(flat, return_index=True)
    nv = mesh.num_vertices
    new_of_old = np.full(nv, -1, np.int64)
    new_of_old[used[np.argsort(first, kind="stable")]] = np.arange(len(used))
    unused = np.flatnonzero(new_of_old < 0)
    new_of_old[unused] = np.arange(len(used), nv)
    old_of_new = np.empty(nv, np.int64)
    old_of_new[new_of_old] = np.arange(nv)
    inv_perm = np.empty(mesh.num_cells, np.int64)
    inv_perm[perm] = np.arange(mesh.num_cells)
    tags = {
        t: np.stack([inv_perm[f[:, 0]], f[:, 1]], axis=1)
        for t, f in mesh.facet_tags.items()
    }
    return Mesh(
        dim=mesh.dim,
        vertices=mesh.vertices[old_of_new],
        cells=new_of_old[cells],
        facet_tags=tags,
        cell_tags=None if mesh.cell_tags is None else mesh.cell_tags[perm],
        grid_shape=None,
        uniform_hint=mesh.uniform_hint,
    )


def boundary_facets(mesh: Mesh) -> np.ndarray:
    """All exterior facets as an [Nf, 2] array of (cell, local_face).

    A facet is exterior iff it is referenced by exactly one cell; interior
    facets appear twice (once from each side). Identified by the sorted
    vertex set of the facet.
    """
    d = mesh.dim
    if mesh.grid_shape is not None:
        return _boundary_facets_structured(mesh)
    facet_list = []
    keys = []
    for face in range(2 * d):
        axis, side = divmod(face, 2)
        locs = _face_local_vertices(d, axis, side)
        fverts = mesh.cells[:, locs]  # [Nc, 2**(d-1)]
        fkey = np.sort(fverts, axis=1)
        keys.append(fkey)
        facet_list.append(
            np.stack(
                [np.arange(mesh.num_cells), np.full(mesh.num_cells, face)], axis=1
            )
        )
    all_keys = np.concatenate(keys, axis=0)
    all_facets = np.concatenate(facet_list, axis=0)
    _, inv, counts = np.unique(
        all_keys, axis=0, return_inverse=True, return_counts=True
    )
    exterior = counts[inv] == 1
    return all_facets[exterior]


def _boundary_facets_structured(mesh: Mesh) -> np.ndarray:
    """Boundary facets of a structured grid directly from cell coordinates
    (avoids the O(Nc log Nc) row-unique of the generic path)."""
    n = mesh.grid_shape
    d = len(n)
    out = []
    cell_axes = [np.arange(na) for na in n]
    for axis in range(d):
        for side in (0, 1):
            idx = [ax.copy() for ax in cell_axes]
            idx[axis] = np.array([0 if side == 0 else n[axis] - 1])
            grids = np.meshgrid(*idx, indexing="ij")
            cells = np.ravel_multi_index([g.reshape(-1) for g in grids], n)
            face = 2 * axis + side
            out.append(
                np.stack([cells, np.full(cells.shape, face)], axis=1)
            )
    return np.concatenate(out, axis=0).astype(np.int64)


def _face_local_vertices(d: int, axis: int, side: int) -> np.ndarray:
    """Local vertex indices (tensor-lex order) of the face {xi_axis == side}."""
    locs = []
    for local in range(2**d):
        offs = [(local >> (d - 1 - a)) & 1 for a in range(d)]
        if offs[axis] == side:
            locs.append(local)
    return np.array(locs, dtype=np.int64)


def facet_midpoints(mesh: Mesh, facets: np.ndarray) -> np.ndarray:
    """Midpoint coordinates of each (cell, face) facet: [Nf, dim]."""
    d = mesh.dim
    out = np.zeros((len(facets), d))
    for face in range(2 * d):
        axis, side = divmod(face, 2)
        sel = facets[:, 1] == face
        if not sel.any():
            continue
        locs = _face_local_vertices(d, axis, side)
        verts = mesh.vertices[mesh.cells[facets[sel, 0]][:, locs]]
        out[sel] = verts.mean(axis=1)
    return out


def tag_boundaries(mesh: Mesh, tags: dict[int, callable], default: int | None = None):
    """Tag exterior facets by midpoint predicates (first matching tag wins).

    ``tags`` maps tag id → predicate(x) with x of shape [Nf, dim] returning a
    boolean mask. Facets matching no predicate get ``default`` (or are left
    untagged). Mirrors the reference's ``locate_entities_boundary`` +
    ``meshtags`` pattern (``python/tests/test_linearspectral_1d.py:38-52``).
    """
    facets = boundary_facets(mesh)
    mids = facet_midpoints(mesh, facets)
    assigned = np.full(len(facets), -1, dtype=np.int64)
    for tag, pred in tags.items():
        mask = np.asarray(pred(mids.T)) & (assigned == -1)
        assigned[mask] = tag
    if default is not None:
        assigned[assigned == -1] = default
    mesh.facet_tags = {
        int(t): facets[assigned == t] for t in np.unique(assigned) if t >= 0
    }
    return mesh
