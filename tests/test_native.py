"""Native C++ geometry precompute vs the numpy implementation."""

import numpy as np
import pytest

from fenicsxfus_tpu.core.geometry import _geom_grad_tensor
from fenicsxfus_tpu.core.gll import gll_points_weights_01
from fenicsxfus_tpu.core.mesh import create_box, create_interval, create_rectangle
from fenicsxfus_tpu import native


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_native_matches_numpy(dim):
    mesh = {1: create_interval(9), 2: create_rectangle((5, 4)),
            3: create_box((4, 3, 2))}[dim]
    rng = np.random.default_rng(0)
    v = mesh.vertices
    lo, hi = v.min(axis=0), v.max(axis=0)
    interior = np.all((v > lo + 1e-12) & (v < hi - 1e-12), axis=1)
    v[interior] += 0.03 * (rng.random((interior.sum(), dim)) - 0.5)
    mesh.uniform_hint = False

    N = 5
    x1, w1 = gll_points_weights_01(N)
    grids = np.meshgrid(*([x1] * dim), indexing="ij")
    qpts = np.stack([g.reshape(-1) for g in grids], axis=-1)
    w = w1
    for _ in range(dim - 1):
        w = np.multiply.outer(w, w1).reshape(-1)
    out = native.volume_factors(mesh.cell_vertices(), qpts, w)
    assert out is not None
    wdetJ_n, G_n = out

    # numpy oracle
    verts = mesh.cell_vertices()
    dshape = _geom_grad_tensor([x1] * dim)
    J = np.einsum("cva,qvb->cqab", verts, dshape)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)
    wdetJ = w[None, :] * detJ
    C = np.einsum("cqab,cqdb->cqad", Jinv, Jinv)
    from fenicsxfus_tpu.core.geometry import SYM_PAIRS

    G = np.stack([wdetJ * C[:, :, a, b] for (a, b) in SYM_PAIRS[dim]], axis=-1)
    assert np.allclose(wdetJ_n, wdetJ, rtol=1e-13, atol=1e-300)
    assert np.allclose(G_n, G, rtol=1e-12, atol=1e-15)
