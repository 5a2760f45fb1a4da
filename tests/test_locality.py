"""Locality preprocessing for the unstructured path: Morton cell reordering
+ first-touch vertex/entity renumbering (core/mesh.py::reorder_locality,
core/conn.py::_first_touch).

The reference relies on the mesh partitioner's cache-aware ordering for
gather locality (``cpp/fenicsx-sf/common/spectral_op.hpp:70-86`` indexes
whatever order DOLFINx produced); on TPU the row gathers of
``ops/blocked.py`` hit (8, 128) physical tiles, so ordering is an explicit
preprocessing pass here. These tests pin (a) the numbering properties and
(b) numbering-invariance of the assembled operator."""

import jax.numpy as jnp
import numpy as np

from fenicsxfus_tpu import (
    create_box,
    create_rectangle,
    reorder_locality,
    tag_boundaries,
)
from fenicsxfus_tpu.core.mesh import Mesh, facet_midpoints
from fenicsxfus_tpu.ops.operators import SEMOperators


def _scrambled_box(n=(4, 3, 3), w=0.05, seed=3):
    """Distorted box with randomly permuted cell order AND vertex ids —
    the worst-case numbering an unstructured mesh read could produce."""
    base = create_box(n)
    rng = np.random.default_rng(seed)
    v = base.vertices.copy()
    for a in range(3):
        v[:, a] += w * np.sin(np.pi * v[:, (a + 1) % 3] + 0.3 * a)
    vperm = rng.permutation(base.num_vertices)
    v2 = np.empty_like(v)
    v2[vperm] = v
    cells = vperm[base.cells][rng.permutation(base.num_cells)]
    return Mesh(dim=3, vertices=v2, cells=cells)


def test_first_touch_entity_numbering():
    """Entity ids appear in increasing order of first touch when cells are
    walked in order (the property the relabel in conn.py guarantees)."""
    mesh = _scrambled_box()
    ops = SEMOperators(mesh, 2, dtype=jnp.float64)
    conn = ops.space.conn
    for ids in (conn.face_ids, conn.edge_ids):
        flat = ids.reshape(-1)
        _, first = np.unique(flat, return_index=True)
        # label k's first occurrence must precede label k+1's
        assert np.all(np.diff(first) > 0)


def test_reorder_morton_improves_adjacency():
    mesh = _scrambled_box(n=(6, 6, 6))
    re = reorder_locality(mesh)
    def mean_jump(m):
        c = m.cell_midpoints()
        return float(np.linalg.norm(np.diff(c, axis=0), axis=1).mean())
    assert mean_jump(re) < 0.5 * mean_jump(mesh)
    # vertices first-touch: first occurrence strictly increasing
    _, first = np.unique(re.cells.reshape(-1), return_index=True)
    assert np.all(np.diff(first) > 0)


def test_reorder_energy_invariant():
    """u^T K u and u^T M u are DOF-numbering invariant: compare the raw
    scrambled mesh against its locality-reordered copy through the full
    blocked operator (fp64)."""
    mesh = _scrambled_box()
    re = reorder_locality(mesh)

    def energy(m):
        ops = SEMOperators(m, 3, dtype=jnp.float64)
        assert ops.blocked is not None
        xyz = np.asarray(ops.space.dof_coords)
        u = jnp.asarray(np.sin(2.1 * xyz[:, 0]) * np.cos(1.3 * xyz[:, 1])
                        + 0.5 * xyz[:, 2] ** 2)
        coeff = jnp.asarray(0.5 + m.cell_midpoints()[:, 0])
        ku = ops.stiffness_apply([u], [coeff])
        mu = ops.assemble_diag(coeff) * u
        return float(jnp.dot(u, ku)), float(jnp.dot(u, mu))

    (k1, m1), (k2, m2) = energy(mesh), energy(re)
    assert abs(k1 - k2) < 1e-10 * abs(k1)
    assert abs(m1 - m2) < 1e-12 * abs(m1)


def test_reorder_preserves_tags():
    mesh = create_rectangle((5, 4))
    v = mesh.vertices.copy()
    v[:, 1] += 0.03 * np.sin(np.pi * v[:, 0])  # keeps the x=0 face planar
    mesh = Mesh(dim=2, vertices=v, cells=mesh.cells)
    tag_boundaries(mesh, {1: lambda x: np.isclose(x[0], 0.0)}, default=2)
    mesh.cell_tags = (mesh.cell_midpoints()[:, 1] > 0.5).astype(np.int64)
    re = reorder_locality(mesh)
    for t in (1, 2):
        a = facet_midpoints(mesh, mesh.facet_tags[t])
        b = facet_midpoints(re, re.facet_tags[t])
        key = lambda m: np.lexsort(m.T)
        assert np.allclose(a[key(a)], b[key(b)])
    assert np.array_equal(
        re.cell_tags, (re.cell_midpoints()[:, 1] > 0.5).astype(np.int64)
    )
