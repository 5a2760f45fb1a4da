"""Bowl-mesh cell quality gates (core/bowl.py).

A trilinear cell's det is not trilinear: fade-plane shear over a thin
rim quad can collapse an INTERIOR quadrature point orders of magnitude
below the corner values while corners look healthy — observed 1e-4 of
the uniform cell at H101 nx=48 before the order-preserving rim
redistribution + 2D corner-det repair + targeted N=5 band validity
passes, which cost a 5.6x stable-dt drop through the spectral clamp.
These gates pin the production-relevant quality at the N=5 (p=4)
quadrature lattice for both reference transducers across the
resolutions the benchmarks use (H101's aperture passes within ~1 cell
of the lateral wall — the hard case)."""

import numpy as np
import pytest

from fenicsxfus_tpu.core.bowl import create_bowl_box
from fenicsxfus_tpu.core.geometry import volume_factors
from fenicsxfus_tpu.core.gll import gll_points_weights

TRANSDUCERS = {
    "H101": {"a": 0.032, "roc": 0.0632, "L": 0.12, "W": 0.07},
    "H131": {"a": 0.0165, "roc": 0.035, "L": 0.08, "W": 0.044},
}


def bowl_mesh(tx, nx):
    g = TRANSDUCERS[tx]
    L, W = g["L"], g["W"]
    h = L / nx
    nyz = max(int(round(W / h)), 2)
    mesh, _ = create_bowl_box(
        (nx, nyz, nyz), (0.0, -W / 2, -W / 2), (L, W / 2, W / 2),
        g["roc"], g["a"],
    )
    return mesh, (nx, nyz, nyz)


def q5(mesh, n):
    uni = np.prod(
        (mesh.vertices.max(0) - mesh.vertices.min(0)) / np.asarray(n)
    )
    wd, _ = volume_factors(mesh, 5)
    w1 = np.asarray(gll_points_weights(5)[1]) / 2.0
    wq = (
        w1[:, None, None] * w1[None, :, None] * w1[None, None, :]
    ).reshape(-1)
    det = np.asarray(wd).reshape(mesh.num_cells, -1) / wq[None, :]
    return float(det.min()) / uni


@pytest.mark.parametrize("tx", ["H101", "H131"])
@pytest.mark.parametrize("nx", [28, 48])
def test_n5_quality_floor(tx, nx):
    mesh, n = bowl_mesh(tx, nx)
    assert q5(mesh, n) >= 2e-3
    # edge-length quality independently bounded (CFL heuristic input)
    assert mesh.h_min() / (TRANSDUCERS[tx]["L"] / nx) >= 0.45


@pytest.mark.slow
@pytest.mark.parametrize("tx", ["H101", "H131"])
def test_n5_quality_floor_production(tx):
    mesh, n = bowl_mesh(tx, 96)
    assert q5(mesh, n) >= 2e-3


@pytest.mark.slow
def test_spectral_dt_close_to_heuristic():
    """The measured stable dt on the bowl mesh must stay within 2.5x of
    the h_min CFL heuristic (pre-fix: 5.6x at nx=48) — the step-count
    cost of the curved geometry is bounded."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import estimate_stable_dt
    from fenicsxfus_tpu.ops.operators import SEMOperators

    mesh, n = bowl_mesh("H101", 48)
    c0, p = 1480.0, 4
    dt_h = 0.3 * mesh.h_min() / (c0 * p**2)
    ops = SEMOperators(mesh, p, dtype=jnp.float32)
    dt_s = estimate_stable_dt(ops, c0, 1000.0, rk_order=4)
    assert dt_s > dt_h / 2.5
