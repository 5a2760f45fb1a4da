"""Mesh entity connectivity with orientations (unstructured conforming
quad/hex meshes).

Feeds the blocked row-granular assembly (``ops/blocked.py``): global DOFs
are numbered by entity class [cell-interior | face-interior | edge-interior
| vertex] so that every gather/scatter in the operator hot loop moves whole
*rows* — XLA lowers scalar-index gathers on this TPU at ~0.6 GB/s but
row-granular gathers at ~500 GB/s (measured, ``benchmarks/
unstructured_speed.py``). The reference gets the same information from the
DOLFINx topology + its tensor-product dofmap permutation
(``cpp/fenicsx-sf/common/permute.hpp:15-42``); here it is extracted
directly from the vertex connectivity.

Orientations: each shared face/edge has ONE canonical frame chosen from its
global vertex ids (origin at the minimum id; for faces the canonical
u-direction points to the smaller-id neighbour of the origin). Every
(cell, local entity) stores the transform from the cell's local frame to
the canonical frame — faces: dihedral code o = swap·4 + flip_u·2 + flip_v
(flips first, then swap); edges: a flip bit — so cell-side values map to
entity rows with static flips/transposes only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _local_vertex_id(bits) -> int:
    """Tensor-lex local vertex id from per-axis bits (axis 0 slowest)."""
    d = len(bits)
    return sum(int(b) << (d - 1 - a) for a, b in enumerate(bits))


def local_faces(d: int):
    """[(axis, side, other_axes)] for the 2d codim-1 faces: 3D faces with
    other_axes = (u, v) in sorted order, 2D edges with other_axes = (u,)."""
    out = []
    for a in range(d):
        others = tuple(b for b in range(d) if b != a)
        for s in (0, 1):
            out.append((a, s, others))
    return out


def local_edges_3d():
    """[(free_axis, ((axis_b, side_b), (axis_c, side_c)))] for the 12 hex
    edges; fixed axes in sorted order, sides lex."""
    out = []
    for a in range(3):
        b, c = [x for x in range(3) if x != a]
        for sb in (0, 1):
            for sc in (0, 1):
                out.append((a, ((b, sb), (c, sc))))
    return out


@dataclass
class Connectivity:
    dim: int
    num_vertices: int
    # codim-1 faces (3D) / edges (2D): ids [Nc, 2d]; orientation [Nc, 2d]
    # (3D: dihedral code in [0,8); 2D: flip bit)
    num_faces: int = 0
    face_ids: np.ndarray | None = None
    face_orient: np.ndarray | None = None
    # codim-2 edges (3D only): ids [Nc, 12], flip [Nc, 12]
    num_edges: int = 0
    edge_ids: np.ndarray | None = None
    edge_flip: np.ndarray | None = None
    faces_local: list = field(default_factory=list)
    edges_local: list = field(default_factory=list)


def _first_touch(ids: np.ndarray) -> np.ndarray:
    """Relabel dense entity ids by first appearance in cell-major order.

    ``np.unique`` numbers entities lexicographically by their vertex keys,
    i.e. in *vertex*-numbering order; after relabeling, consecutive cells
    reference nearby rows of the entity tables, so the row gathers in
    ``ops/blocked.py`` hit nearby (8, 128) physical tiles. Pure label
    permutation — assembly math is unchanged."""
    flat = ids.reshape(-1)
    _, first = np.unique(flat, return_index=True)  # labels are dense 0..n-1
    rank = np.empty(first.size, flat.dtype)
    rank[np.argsort(first, kind="stable")] = np.arange(first.size, dtype=flat.dtype)
    return rank[flat].reshape(ids.shape)


def _corner_vids(cells, d, fixed_bits, free_axes):
    """Global vertex ids of an entity's corners for every cell:
    [Nc] + [2]*len(free_axes), free-axis bits indexing in the given order."""
    nc = cells.shape[0]
    nfree = len(free_axes)
    out = np.empty((nc,) + (2,) * nfree, cells.dtype)
    for combo in np.ndindex(*((2,) * nfree)):
        bits = [0] * d
        for ax, b in fixed_bits:
            bits[ax] = b
        for ax, b in zip(free_axes, combo):
            bits[ax] = b
        out[(slice(None),) + combo] = cells[:, _local_vertex_id(bits)]
    return out


def extract_connectivity(mesh) -> Connectivity:
    """Entity ids + orientations for a conforming quad/hex mesh."""
    d = mesh.dim
    cells = np.asarray(mesh.cells, np.int64)
    nc = cells.shape[0]
    conn = Connectivity(dim=d, num_vertices=mesh.num_vertices)
    if d == 1:
        return conn

    lf = local_faces(d)
    conn.faces_local = lf
    nlf = len(lf)

    if d == 2:
        keys = np.empty((nc, nlf, 2), np.int64)
        flips = np.empty((nc, nlf), np.int8)
        for k, (a, s, uv) in enumerate(lf):
            ends = _corner_vids(cells, d, [(a, s)], uv)  # [Nc, 2]
            keys[:, k] = np.sort(ends, axis=1)
            flips[:, k] = (ends[:, 0] > ends[:, 1]).astype(np.int8)
        _, ids, counts = np.unique(
            keys.reshape(-1, 2), axis=0, return_inverse=True, return_counts=True
        )
        if counts.max() > 2:
            raise ValueError("non-conforming mesh: edge shared by >2 cells")
        conn.face_ids = _first_touch(ids.reshape(nc, nlf))
        conn.face_orient = flips
        conn.num_faces = int(counts.size)
        return conn

    # ---- 3D faces: canonical frame from corner vids ----------------------
    keys = np.empty((nc, nlf, 4), np.int64)
    orient = np.empty((nc, nlf), np.int8)
    for k, (a, s, uv) in enumerate(lf):
        cv = _corner_vids(cells, d, [(a, s)], uv)  # [Nc, 2, 2] (bu, bv)
        flat = cv.reshape(nc, 4)
        keys[:, k] = np.sort(flat, axis=1)
        # canonical origin: corner with min vid → bits (ou, ov)
        amin = np.argmin(flat, axis=1)  # index in (bu*2 + bv)
        ou = amin // 2
        ov = amin % 2
        rows = np.arange(nc)
        # neighbours of the origin along u and v
        nb_u = cv[rows, 1 - ou, ov]
        nb_v = cv[rows, ou, 1 - ov]
        swap = (nb_v < nb_u).astype(np.int8)  # canonical U runs along local v
        orient[:, k] = swap * 4 + ou.astype(np.int8) * 2 + ov.astype(np.int8)
    _, ids, counts = np.unique(
        keys.reshape(-1, 4), axis=0, return_inverse=True, return_counts=True
    )
    if counts.max() > 2:
        raise ValueError("non-conforming mesh: face shared by >2 cells")
    conn.face_ids = _first_touch(ids.reshape(nc, nlf))
    conn.face_orient = orient
    conn.num_faces = int(counts.size)

    # ---- 3D edges ---------------------------------------------------------
    le = local_edges_3d()
    conn.edges_local = le
    nle = len(le)
    ekeys = np.empty((nc, nle, 2), np.int64)
    eflip = np.empty((nc, nle), np.int8)
    for k, (a, fixed) in enumerate(le):
        ends = _corner_vids(cells, d, list(fixed), (a,))  # [Nc, 2]
        ekeys[:, k] = np.sort(ends, axis=1)
        eflip[:, k] = (ends[:, 0] > ends[:, 1]).astype(np.int8)
    _, eids, _ = np.unique(
        ekeys.reshape(-1, 2), axis=0, return_inverse=True, return_counts=True
    )
    conn.edge_ids = _first_touch(eids.reshape(nc, nle))
    conn.edge_flip = eflip
    conn.num_edges = int(conn.edge_ids.max()) + 1
    return conn


# ---------------------------------------------------------------------------
# Canonical-frame index maps (numpy, used to build the blocked dofmap)


def face_canonical_pos(m: int, o: int):
    """Map from cell-local face-interior index grid (iu, iv) ∈ [0,m)² to the
    canonical interior position id, as a [m, m] int array. ``o`` is the
    dihedral code: flips first (ou=o>>1&1 flips u, ov=o&1 flips v), then
    swap (o>>2)."""
    iu, iv = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    ju = m - 1 - iu if (o >> 1) & 1 else iu
    jv = m - 1 - iv if o & 1 else iv
    if (o >> 2) & 1:
        ju, jv = jv, ju
    return ju * m + jv


def edge_canonical_pos(m: int, flip: int):
    """[m] cell-local edge-interior index → canonical position."""
    i = np.arange(m)
    return (m - 1 - i) if flip else i
