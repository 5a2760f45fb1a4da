"""Pallas fused stiffness vs the XLA lattice path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu.core.mesh import create_box
from fenicsxfus_tpu.ops.operators import SEMOperators


@pytest.mark.parametrize("degree", [2, 4])
def test_pallas_matches_lattice(degree, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from fenicsxfus_tpu.ops.pallas_stiffness import PallasLatticeStiffness

    # grid sizes chosen so each axis admits a sublane-aligned window chunk
    # (stride c·p and rows c·N both multiples of 8 ⇒ n divisible by 8 here)
    mesh = create_box((8, 8, 8), (0, 0, 0), (0.9, 0.7, 0.5))
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    coeff = 1.7
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(ops.lattice.gdims)
    y_ref = ops.lattice.apply_scaled([(x, ops.pack_scales(coeff))])
    pk = PallasLatticeStiffness(ops.lattice, tile_rows=128)
    with pltpu.force_tpu_interpret_mode():
        y = pk.apply(x, coeff)
    err = np.max(np.abs(np.asarray(y) - np.asarray(y_ref)))
    assert err < 1e-11 * np.max(np.abs(np.asarray(y_ref))), err


def test_pallas_unusable_mesh_falls_back():
    """Meshes without sublane-aligned window chunks must report unusable
    (the operator then stays on the XLA lattice path)."""
    from fenicsxfus_tpu.ops.pallas_stiffness import PallasLatticeStiffness

    mesh = create_box((4, 3, 2), (0, 0, 0), (1, 1, 1))
    ops = SEMOperators(mesh, 2, dtype=jnp.float64)
    pk = PallasLatticeStiffness(ops.lattice)
    assert not pk.usable()
