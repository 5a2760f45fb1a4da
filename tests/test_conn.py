"""Entity connectivity + canonical orientations (core/conn.py).

The decisive invariant: for a shared face/edge, mapping each adjacent
cell's local GLL sub-lattice through its canonical transform must produce
the SAME physical coordinates — then cell values routed through entity
rows are consistent by construction.
"""

import numpy as np
import pytest

from fenicsxfus_tpu import create_box, create_rectangle
from fenicsxfus_tpu.core.conn import (
    edge_canonical_pos,
    extract_connectivity,
    face_canonical_pos,
    local_edges_3d,
    local_faces,
)
from fenicsxfus_tpu.core.mesh import Mesh
from fenicsxfus_tpu.core.space import cell_node_coords


def distort(mesh, w=0.07, seed=0):
    rng = np.random.default_rng(seed)
    v = mesh.vertices.copy()
    d = mesh.dim
    for a in range(d):
        v[:, a] += w * np.sin(np.pi * v[:, (a + 1) % d] + 0.3 * a)
    # random vertex RELABELLING (permute ids) to scramble orientations
    perm = rng.permutation(mesh.num_vertices)
    v2 = np.empty_like(v)
    v2[perm] = v
    cells = perm[mesh.cells]
    return Mesh(dim=d, vertices=v2, cells=cells)


def _face_sub_lattice(coords_cells, N, d, a, s, uv):
    """Physical coords of the closed face lattice [Nc, N, N, dim] (3D) or
    [Nc, N, dim] (2D) in local (u, v) order."""
    lat = coords_cells.reshape((-1,) + (N,) * d + (d,))
    sl = [slice(None)] * (d + 2)
    sl[1 + a] = -1 if s else 0
    block = lat[tuple(sl[: d + 2 - 1] + [slice(None)])] if False else lat[
        tuple([slice(None)] + [(-1 if s else 0) if ax == a else slice(None)
                               for ax in range(d)] + [slice(None)])
    ]
    # remaining axes are already in sorted (u, v) order
    return block


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("N", [3, 5])
def test_face_orientation_consistency(dim, N):
    base = create_rectangle((4, 3)) if dim == 2 else create_box((3, 2, 2))
    mesh = distort(base)
    conn = extract_connectivity(mesh)
    coords = cell_node_coords(mesh, N)  # [Nc, N^d, dim]
    lf = local_faces(dim)
    m = N - 2
    # canonical coords per face id, filled from every (cell, local face):
    canon = {}
    for k, (a, s, uv) in enumerate(lf):
        block = _face_sub_lattice(coords, N, dim, a, s, uv)
        interior = block[(slice(None),) + (slice(1, N - 1),) * (dim - 1)]
        for c in range(mesh.num_cells):
            fid = int(conn.face_ids[c, k])
            o = int(conn.face_orient[c, k])
            if dim == 2:
                pos = edge_canonical_pos(m, o)
                mapped = np.empty((m, dim))
                mapped[pos] = interior[c]
            else:
                pos = face_canonical_pos(m, o).reshape(-1)
                mapped = np.empty((m * m, dim))
                mapped[pos] = interior[c].reshape(m * m, dim)
            if fid in canon:
                assert np.allclose(canon[fid], mapped, atol=1e-12), (
                    f"face {fid} mismatch between cells"
                )
            else:
                canon[fid] = mapped
    assert len(canon) == conn.num_faces


@pytest.mark.parametrize("N", [4])
def test_edge_orientation_consistency_3d(N):
    mesh = distort(create_box((3, 2, 2)))
    conn = extract_connectivity(mesh)
    coords = cell_node_coords(mesh, N).reshape(-1, N, N, N, 3)
    m = N - 2
    canon = {}
    for k, (a, fixed) in enumerate(local_edges_3d()):
        sl = [slice(None)] * 3
        for ax, side in fixed:
            sl[ax] = -1 if side else 0
        sl[a] = slice(1, N - 1)
        block = coords[(slice(None),) + tuple(sl)]  # [Nc, m, 3]
        for c in range(mesh.num_cells):
            eid = int(conn.edge_ids[c, k])
            pos = edge_canonical_pos(m, int(conn.edge_flip[c, k]))
            mapped = np.empty((m, 3))
            mapped[pos] = block[c]
            if eid in canon:
                assert np.allclose(canon[eid], mapped, atol=1e-12)
            else:
                canon[eid] = mapped
    assert len(canon) == conn.num_edges


def test_counts_match_euler(N=3):
    # 3x2x2 box: faces = 3*2*2*... check against structured formula
    mesh = create_box((3, 2, 2))
    conn = extract_connectivity(mesh)
    nx, ny, nz = 3, 2, 2
    nf = (nx + 1) * ny * nz + nx * (ny + 1) * nz + nx * ny * (nz + 1)
    ne = (
        nx * (ny + 1) * (nz + 1)
        + (nx + 1) * ny * (nz + 1)
        + (nx + 1) * (ny + 1) * nz
    )
    assert conn.num_faces == nf
    assert conn.num_edges == ne


def test_nonconforming_raises():
    # two cells sharing a face + a third duplicate cell on the same face
    v = np.array([
        [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
        [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
        [2, 0, 0], [2, 0, 1], [2, 1, 0], [2, 1, 1],
        [3, 0, 0], [3, 0, 1], [3, 1, 0], [3, 1, 1],
    ], np.float64)
    c0 = [0, 1, 2, 3, 4, 5, 6, 7]
    c1 = [4, 5, 6, 7, 8, 9, 10, 11]
    c2 = [4, 5, 6, 7, 12, 13, 14, 15]  # also uses face {4,5,6,7}
    mesh = Mesh(dim=3, vertices=v, cells=np.array([c0, c1, c2]))
    with pytest.raises(ValueError, match="non-conforming"):
        extract_connectivity(mesh)
