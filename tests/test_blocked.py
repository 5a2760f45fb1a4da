"""Blocked row-granular assembly (ops/blocked.py) vs the scalar oracle.

The blocked path is the production gather/scatter for unstructured
conforming meshes; it must match the gidx/segment-sum oracle exactly on
arbitrary vertex numberings and distorted geometry (the kernel-equivalence
oracle pattern, reference ``cpp/fenicsx-sf/tests/test_operators3d``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu import (
    LinearSpectralExplicit,
    create_box,
    create_rectangle,
    tag_boundaries,
)
from fenicsxfus_tpu.core.mesh import Mesh
from fenicsxfus_tpu.ops.operators import SEMOperators


def distort(mesh, w=0.06, seed=0, relabel=True):
    rng = np.random.default_rng(seed)
    v = mesh.vertices.copy()
    d = mesh.dim
    for a in range(d):
        v[:, a] += w * np.sin(np.pi * v[:, (a + 1) % d] + 0.2 * a)
    cells = mesh.cells
    if relabel:  # scramble vertex ids → every orientation class exercised
        perm = rng.permutation(mesh.num_vertices)
        v2 = np.empty_like(v)
        v2[perm] = v
        cells = perm[mesh.cells]
        v = v2
    return Mesh(dim=d, vertices=v, cells=cells)


MESHES = {
    2: lambda: distort(create_rectangle((5, 4))),
    3: lambda: distort(create_box((4, 3, 2))),
}


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 4])
def test_gather_matches_oracle(dim, degree):
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    assert ops.blocked is not None
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(ops.ndofs))
    xc = np.asarray(ops.blocked.gather(x))
    ref = np.asarray(x)[np.asarray(ops.space.dofmap)].reshape(xc.shape)
    assert np.array_equal(xc, ref)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 4])
def test_scatter_matches_oracle(dim, degree):
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    # integer values: additive assembly must match EXACTLY regardless of
    # summation order
    yc = jnp.asarray(
        rng.integers(-8, 9, (mesh.num_cells,) + (degree + 1,) * dim).astype(
            np.float64
        )
    )
    y = np.asarray(ops.blocked.scatter(yc))
    y_ref = np.asarray(ops.scatter_segsum(yc))
    assert np.array_equal(y, y_ref)


@pytest.mark.parametrize("dim", [2, 3])
def test_stiffness_blocked_vs_oracle(dim):
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(ops.ndofs))
    coeff = jnp.asarray(0.5 + rng.random(mesh.num_cells))
    y_fast = np.asarray(ops.stiffness_apply([x], [coeff]))
    y_ref = np.asarray(ops.stiffness_apply_generic([x], [coeff]))
    scale = np.max(np.abs(y_ref))
    assert np.max(np.abs(y_fast - y_ref)) < 1e-13 * scale


@pytest.mark.parametrize("mode", ["v2", "v3", "v3dot"])
@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 4])
def test_v2_v3_schedules_match_v1(dim, degree, mode, monkeypatch):
    """FUS_BLOCKED=v2 (fused gathers + incidence-table transpose-gather
    scatter) and v3 (the same routed through 128-lane super-row gathers
    with position-mask or one-hot-dot extraction) must match the v1
    schedule bit-for-bit on integer data."""
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(-8, 9, ops.ndofs).astype(np.float64))
    yc = jnp.asarray(
        rng.integers(-8, 9, (mesh.num_cells,) + (degree + 1,) * dim).astype(
            np.float64
        )
    )
    g1 = np.asarray(ops.blocked.gather(x))
    s1 = np.asarray(ops.blocked.scatter(yc))
    if mode == "v3dot":
        mode = "v3"
        monkeypatch.setenv("FUS_V3_EXTRACT", "dot")
    monkeypatch.setenv("FUS_BLOCKED", mode)
    g2 = np.asarray(ops.blocked.gather(x))
    s2 = np.asarray(ops.blocked.scatter(yc))
    assert np.array_equal(g1, g2)
    assert np.array_equal(s1, s2)


def test_solve_on_distorted_mesh_matches_segsum_path(monkeypatch):
    """Full linear solve on a distorted 2D mesh: blocked path == forced
    segment-sum path to roundoff."""

    def make():
        base = create_rectangle((8, 5), (0, 0), (1.0, 0.6))
        v = base.vertices.copy()
        # distortion vanishing on the x-extreme planes (keeps the tags) and
        # a vertex relabelling to scramble orientation classes
        v[:, 1] += 0.02 * np.sin(np.pi * v[:, 0]) * np.sin(np.pi * v[:, 1])
        rng = np.random.default_rng(7)
        perm = rng.permutation(base.num_vertices)
        v2 = np.empty_like(v)
        v2[perm] = v
        mesh = Mesh(dim=2, vertices=v2, cells=perm[base.cells])
        tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > 0.99}
        )
        return LinearSpectralExplicit(
            mesh, None, 3, 1.0, 1.0, 10.0, 1.0, 1.0, 4, 4e-4, dtype=jnp.float64
        )

    m1 = make().init()
    u1, v1, _ = m1.rk(0.0, 0.03)
    monkeypatch.setenv("FUS_BLOCKED", "0")
    m2 = make().init()
    assert m2.ops.blocked is None
    u2, v2, _ = m2.rk(0.0, 0.03)
    scale = float(jnp.max(jnp.abs(u2))) + 1e-300
    assert float(jnp.max(jnp.abs(u1 - u2))) / scale < 1e-12
