"""Lattice fast-path vs generic-path equivalence.

The lattice path (ops/lattice.py) replaces gather/scatter assembly with
banded matmuls on uniform axis-aligned meshes; it must agree with the
generic gather→contract→segment-sum path to machine precision.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu.core.mesh import create_box, create_interval, create_rectangle
from fenicsxfus_tpu.ops.operators import SEMOperators

MESHES = {
    1: lambda: create_interval(6, 0.0, 2.0),
    2: lambda: create_rectangle((5, 3), (0, 0), (1.0, 0.6)),
    3: lambda: create_box((4, 3, 2), (0, 0, 0), (1.0, 0.7, 0.5)),
}


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [2, 4])
def test_lattice_matches_generic_heterogeneous(dim, degree):
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    assert ops.lattice is not None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs))
    coeff = jnp.asarray(0.5 + rng.random(mesh.num_cells))
    y_lat = ops.stiffness_apply([x], [coeff])
    y_gen = ops.stiffness_apply_generic([x], [coeff])
    err = np.max(np.abs(np.asarray(y_lat) - np.asarray(y_gen)))
    assert err < 1e-11 * np.max(np.abs(np.asarray(y_gen))), err


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_lattice_matches_generic_constant(dim):
    mesh = MESHES[dim]()
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(ops.ndofs))
    # constant coefficient as an array → rank-1 broadcast scales
    coeff = jnp.full((mesh.num_cells,), 2.5, jnp.float64)
    y_lat = ops.stiffness_apply([x], [coeff])
    y_gen = ops.stiffness_apply_generic([x], [coeff])
    err = np.max(np.abs(np.asarray(y_lat) - np.asarray(y_gen)))
    assert err < 1e-11 * np.max(np.abs(np.asarray(y_gen))), err


def test_lattice_multifield():
    mesh = MESHES[3]()
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(ops.ndofs))
    v = jnp.asarray(rng.standard_normal(ops.ndofs))
    c1 = jnp.asarray(0.5 + rng.random(mesh.num_cells))
    c2 = jnp.asarray(rng.random(mesh.num_cells))
    y_lat = ops.stiffness_apply([u, v], [c1, c2])
    y_gen = ops.stiffness_apply_generic([u, v], [c1, c2])
    err = np.max(np.abs(np.asarray(y_lat) - np.asarray(y_gen)))
    assert err < 1e-11 * np.max(np.abs(np.asarray(y_gen))), err


def test_lattice_disabled_on_distorted_mesh():
    mesh = MESHES[2]()
    rng = np.random.default_rng(3)
    v = mesh.vertices
    lo, hi = v.min(axis=0), v.max(axis=0)
    interior = np.all((v > lo + 1e-12) & (v < hi - 1e-12), axis=1)
    v[interior] += 0.02 * (rng.random((interior.sum(), 2)) - 0.5)
    mesh.uniform_hint = False
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    assert ops.lattice is None
