"""Bowl-fitted mesh generation + focused-transducer physics.

The reference drives HITU from gmsh bowl meshes
(``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-WATER/main.cpp:33-52``);
``core/bowl.py`` generates the equivalent geometry directly. Gates:

* tagged cap surface area converges to the spherical-cap formula (the rim
  is vertex-fitted: O(h^2), not the O(h) of a stair-step rim),
* the snap/relax pipeline keeps cells valid (detJ > 0) and h_min >= 0.5x
  the uniform spacing (bounded CFL penalty),
* a linear run on the bowl mesh reproduces the O'Neil (1949) axial
  solution: focusing comes from the real curved facets with a plain
  uniform source — no phasing, no obliquity weighting.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import fenicsxfus_tpu as fus
from fenicsxfus_tpu.analysis.analytical import oneil_axial_amplitude
from fenicsxfus_tpu.core.bowl import bowl_cap_area, create_bowl_box
from fenicsxfus_tpu.core.geometry import volume_factors, facet_factors
from fenicsxfus_tpu.core.mesh import create_box
from fenicsxfus_tpu.core.space import FunctionSpace

R, A = 0.9, 0.45


def _cap_err(n):
    mesh, _ = create_bowl_box(n, (0, 0, 0), (1.2, 1.2, 1.2), R, A)
    sp = FunctionSpace(mesh, 3)
    _, w, _ = facet_factors(mesh, sp, mesh.facet_tags[1])
    return abs(float(w.sum()) - bowl_cap_area(R, A)) / bowl_cap_area(R, A), mesh


def test_cap_area_converges():
    e1, _ = _cap_err((8, 20, 20))
    e2, _ = _cap_err((8, 40, 40))
    assert e1 < 0.01
    assert e2 < 0.35 * e1  # ~O(h^2): 4x refinement would give 0.25x


@pytest.mark.slow
def test_cells_valid_and_hmin_bounded():
    n = (16, 32, 32)
    _, mesh = _cap_err(n)
    wdetJ, _ = volume_factors(mesh, 4)  # raises on degenerate cells
    assert float(wdetJ.min()) > 0.0
    uni = create_box(n, (0, 0, 0), (1.2, 1.2, 1.2))
    assert mesh.h_min() / uni.h_min() >= 0.5


@pytest.mark.slow
def test_focus_matches_oneil():
    """Linear bowl run vs the O'Neil axial solution (amplitude profile and
    focal gain). Coarse mesh — generous gates; the production-resolution
    validation runs on the chip (benchmarks/hitu/validate_bowl_mesh.py)."""
    c0, rho0, p0 = 1.0, 1.0, 1.0
    Rb, ab = 0.7, 0.35
    lam = 0.28
    f0 = c0 / lam
    n = (14, 12, 12)
    L = (1.0, 0.9, 0.9)
    mesh, focus = create_bowl_box(n, (0, 0, 0), L, Rb, ab)
    # distorted (skewed) cells raise the operator's spectral radius beyond
    # what the shortest edge alone implies — run at half the uniform CFL
    dt = 0.45 * mesh.h_min() / (c0 * 16)
    m = fus.LinearSpectralExplicit(
        mesh, None, 4, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    )
    m.init()
    t_steady = (focus[0] + 3 * lam) / c0 + 4.0 / f0
    u, v, t = m.rk(0.0, t_steady)
    xs = np.linspace(0.3, 0.9, 25)
    pts = np.stack([xs, np.full_like(xs, L[1] / 2), np.full_like(xs, L[2] / 2)])
    *_, ys = m.rk_record(t, t + 1.0 / f0, pts)
    amp = np.max(np.abs(np.asarray(ys)), axis=0)
    oneil = oneil_axial_amplitude(xs, ab, Rb, 2 * np.pi / lam, p0)
    assert 0.8 < float(np.max(amp)) / float(np.max(oneil)) < 1.25
    l2 = np.linalg.norm(amp - oneil) / np.linalg.norm(oneil)
    assert l2 < 0.15


def test_long_blend_band_is_rescued():
    """A long blend (9 sagittae) used to produce near-degenerate cells
    (min detJ ~3e-10 of uniform — NaN at the nominal CFL); the band
    relaxation must restore validity without touching the cap layer or
    the uniform bulk."""
    n = (14, 12, 12)
    mesh, _ = create_bowl_box(n, (0, 0, 0), (1.0, 0.9, 0.9), 0.7, 0.35,
                              blend=0.84)
    wdetJ, _ = volume_factors(mesh, 2)
    uni = (1.0 / 14) * (0.9 / 12) ** 2
    assert float(wdetJ.min()) * 8.0 / uni > 5e-3
    # the uniform bulk is untouched: vertex planes beyond the blend band
    # sit exactly on the lattice
    v = mesh.vertices.reshape(15, 13, 13, 3)
    for ix in range(mesh.blend_layers + 1, 15):
        assert np.allclose(v[ix, :, :, 0], ix / 14.0, atol=1e-14)
        assert np.allclose(v[ix, :, :, 1], np.linspace(0, 0.9, 13)[:, None],
                           atol=1e-14)
    # and the cap layer keeps the fitted rim (tagged area unchanged)
    from fenicsxfus_tpu.core.space import FunctionSpace as _FS

    sp = _FS(mesh, 2)
    _, w, _ = facet_factors(mesh, sp, mesh.facet_tags[1])
    area_err = abs(float(w.sum()) - bowl_cap_area(0.7, 0.35)) / bowl_cap_area(
        0.7, 0.35
    )
    assert area_err < 0.05
