"""Bowl-fitted structured meshes for focused-transducer (HITU) problems.

The reference drives its HITU benchmarks from gmsh meshes with the curved
bowl surface fitted into the boundary and driven through facet tags
(``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-WATER/main.cpp:33-52``);
those meshes are not distributed with its repo. The TPU-native equivalent
generates the geometry directly: a structured hex box whose x-min face is
deformed onto the spherical cap, so the transducer is a set of REAL curved
facets — the source needs no phasing or obliquity weighting, focusing
comes from the geometry exactly as in the reference, and the general
(per-cell Jacobian) operator path handles the deformed cells.

Construction:

* rim plane at ``x = lo[0]``; the cap (radius of curvature ``R``, aperture
  radius ``a``, centre of curvature — the geometric focus — on the axis at
  ``x = lo[0] + sqrt(R^2 - a^2)``) dips BACKWARD to ``x < lo[0]``,
* vertices with ``x < lo[0] + blend`` are shifted by
  ``s(r) * (1 - (x - lo[0])/blend)`` where ``s(r) <= 0`` is the cap
  sagitta, so the deformation fades linearly into the volume and all
  cells beyond the blend depth stay perfectly uniform,
* facets are tagged BEFORE deformation (tags are topological), so the
  bowl facet set is exactly the x-min face within the aperture radius.

The rim is FITTED: vertices within half a cell of the aperture circle are
snapped radially onto ``r = a`` before tagging, so the tagged surface ends
on the true rim circle and its area converges to the spherical-cap area
``2*pi*R*(R - sqrt(R^2 - a^2))`` at O(h^2) instead of the O(h) of a
stair-step rim.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh, _structured, tag_boundaries

__all__ = ["create_bowl_box", "bowl_cap_area"]


def bowl_cap_area(R: float, a: float) -> float:
    """Area of a spherical cap of curvature radius R and aperture radius a."""
    return 2.0 * np.pi * R * (R - np.sqrt(R * R - a * a))


def _fade(xi: np.ndarray) -> np.ndarray:
    """C1 deformation fade profile: 1 at xi=0, 0 for xi>=1, with ZERO slope
    at both ends (cosine). The zero slope at the cap keeps the first layer
    of cells locally prism-like — a linear fade puts its maximum shear in
    the source-adjacent cells, which at coarse resolution costs ~15% of the
    radiated amplitude (O'Neil gate, tests/test_bowl.py)."""
    x = np.clip(xi, 0.0, 1.0)
    return 0.5 * (1.0 + np.cos(np.pi * x))


def create_bowl_box(
    n,
    lo,
    hi,
    R: float,
    a: float,
    center_yz=None,
    blend: float | None = None,
    lateral_hold: float | None = None,
    tag_source: int = 1,
    tag_other: int | None = 2,
) -> tuple[Mesh, np.ndarray]:
    """Structured box with the x-min face deformed onto a spherical bowl.

    Parameters: ``n``/``lo``/``hi`` as ``create_box``; ``R`` radius of
    curvature, ``a`` aperture radius, ``center_yz`` bowl axis position
    (defaults to the face centre), ``blend`` deformation fade-in depth
    (defaults to three sagittae). Facets on the cap get ``tag_source``;
    every other boundary facet gets ``tag_other`` (None = untagged rigid).

    Returns ``(mesh, focus)`` with ``focus`` the geometric focus
    coordinates [3] (centre of curvature of the cap).
    """
    n = tuple(n)
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    if len(n) != 3:
        raise ValueError("bowl meshes are 3D")
    if not a < R:
        raise ValueError("aperture radius must be < radius of curvature")
    if center_yz is None:
        center_yz = 0.5 * (lo[1:] + hi[1:])
    center_yz = np.asarray(center_yz, float)
    x0 = lo[0]
    xf = float(np.sqrt(R * R - a * a))  # focus distance from the rim plane
    sag = R - xf  # cap depth at the axis
    if blend is None:
        blend = 3.0 * sag
    blend = min(float(blend), 0.9 * (hi[0] - lo[0]))

    mesh = _structured(n, tuple(lo), tuple(hi))

    # rim fitting. The cap facet set is fixed FIRST on the uniform lateral
    # grid (facet-centre radius < a); every vertex on the boundary of that
    # set is then snapped radially onto r = a, so the tagged surface ends
    # on a polygon inscribed in the true rim circle (area error O(h^2))
    # instead of a stair-step (O(h)). The same lateral snap applies to
    # every x-layer — the rim is fitted as a prism through the volume.
    hy = (hi[1] - lo[1]) / n[1]
    hz = (hi[2] - lo[2]) / n[2]
    fy = lo[1] + (np.arange(n[1]) + 0.5) * hy - center_yz[0]
    fz = lo[2] + (np.arange(n[2]) + 0.5) * hz - center_yz[1]
    inside_f = (fy[:, None] ** 2 + fz[None, :] ** 2) < a * a  # [n1, n2]
    # vertex (j,k) adjacency: the up-to-4 surrounding facet cells
    padf = np.zeros((n[1] + 2, n[2] + 2), bool)
    padf[1:-1, 1:-1] = inside_f
    corners = np.stack(
        [padf[:-1, :-1], padf[:-1, 1:], padf[1:, :-1], padf[1:, 1:]]
    )
    boundary_v = corners.any(axis=0) & ~corners.all(axis=0)  # [ny+1, nz+1]

    ny1, nz1 = n[1] + 1, n[2] + 1
    ys = np.linspace(lo[1], hi[1], ny1) - center_yz[0]
    zs = np.linspace(lo[2], hi[2], nz1) - center_yz[1]
    r2d = np.hypot(ys[:, None], zs[None, :])
    mark = boundary_v & (r2d > 1e-12)
    scale2d = np.where(mark, a / np.maximum(r2d, 1e-300), 1.0)

    y2d = ys[:, None] * scale2d  # bowl-centred lateral vertex lattice
    z2d = zs[None, :] * scale2d

    # rim spacing: in diagonal stair regions two grid-adjacent boundary
    # vertices can land on nearly the same rim point, collapsing their
    # shared edge (h_min, and with it the CFL dt, would drop ~4x). Rotate
    # the pair member farther from its grid position ALONG the circle,
    # away from its partner, until the pair is 0.6 h apart — both stay on
    # the rim, so the inscribed polygon (and O(h^2) area) is preserved.
    hmin_lat = min(hy, hz)
    dtheta = 0.6 * hmin_lat / a
    for _ in range(4):
        moved = False
        for off_y in (True, False):
            a_sl = (slice(0, -1), slice(None)) if off_y else (slice(None), slice(0, -1))
            b_sl = (slice(1, None), slice(None)) if off_y else (slice(None), slice(1, None))
            both = mark[a_sl] & mark[b_sl]
            dd = np.hypot(y2d[a_sl] - y2d[b_sl], z2d[a_sl] - z2d[b_sl])
            close = both & (dd < 0.6 * hmin_lat - 1e-12)
            if not close.any():
                continue
            moved = True
            th_a = np.arctan2(z2d[a_sl], y2d[a_sl])
            th_b = np.arctan2(z2d[b_sl], y2d[b_sl])
            gap = np.arctan2(np.sin(th_b - th_a), np.cos(th_b - th_a))
            sgn = np.where(gap >= 0.0, 1.0, -1.0)
            # move the member displaced farther from its own grid point
            a_far = np.abs(r2d[a_sl] - a) > np.abs(r2d[b_sl] - a)
            th_a_new = np.where(close & a_far, th_b - sgn * dtheta, th_a)
            th_b_new = np.where(close & ~a_far, th_a + sgn * dtheta, th_b)
            for sl, th, upd in ((a_sl, th_a_new, close & a_far),
                                (b_sl, th_b_new, close & ~a_far)):
                yv, zv = a * np.cos(th), a * np.sin(th)
                y2d[sl] = np.where(upd, yv, y2d[sl])
                z2d[sl] = np.where(upd, zv, z2d[sl])
        if not moved:
            break

    # local relaxation: a snap can squeeze a neighbouring edge to ~0.1 h,
    # which would shrink h_min (and the explicit CFL dt) ~4x. A few
    # Laplace-smoothing passes over the UNsnapped vertices within a
    # 3-cell band of the rim spread the squeeze over neighbouring rings.
    # Interior vertex motion does not change the tagged polygon (its rim
    # ring is pinned) nor the facet set (tagged by index).
    band = (np.abs(r2d - a) < 3.0 * max(hy, hz)) & ~mark
    band[0, :] = band[-1, :] = False
    band[:, 0] = band[:, -1] = False
    for _ in range(4):
        yn = 0.25 * (y2d[:-2, 1:-1] + y2d[2:, 1:-1]
                     + y2d[1:-1, :-2] + y2d[1:-1, 2:])
        zn = 0.25 * (z2d[:-2, 1:-1] + z2d[2:, 1:-1]
                     + z2d[1:-1, :-2] + z2d[1:-1, 2:])
        b = band[1:-1, 1:-1]
        y2d[1:-1, 1:-1] = np.where(b, yn, y2d[1:-1, 1:-1])
        z2d[1:-1, 1:-1] = np.where(b, zn, z2d[1:-1, 1:-1])

    # Lateral snap FADES with depth (same blend as the x-deformation):
    # vertices at x = x0 get the full rim fit (the tagged cap layer), and
    # beyond the blend depth the lattice is exactly uniform again. This
    # confines every deformed cell to the first ``blend_layers`` x-layers,
    # which is what lets the hybrid operator run the lattice/Pallas fast
    # path on the (uniform) bulk and a per-cell-geometry correction on the
    # blend slab only (ops/operators.py hybrid path).
    # The lateral snap is HELD at full strength for ``lateral_hold`` depth
    # (default: one blend length) and then fades over ``blend``: the wave
    # launches through a rim-fitted prism exactly as if the snap extended
    # through the whole volume (a fade starting AT the cap costs ~13% of
    # the radiated amplitude at 4 elems/wavelength — the rim-adjacent
    # first cells skew and the effective aperture blurs), while the
    # deformation still ends at a fixed depth so the hybrid operator can
    # run the lattice/Pallas fast path on the uniform bulk.
    if lateral_hold is None:
        lateral_hold = blend
    lateral_hold = min(float(lateral_hold), 0.9 * (hi[0] - lo[0]) - blend)
    v = mesh.vertices.copy()
    iy = np.rint((v[:, 1] - lo[1]) / hy).astype(int)
    iz = np.rint((v[:, 2] - lo[2]) / hz).astype(int)
    fade_l = _fade((v[:, 0] - x0 - lateral_hold) / blend)
    dy = y2d[iy, iz] - ys[iy]
    dz = z2d[iy, iz] - zs[iz]
    v[:, 1] += dy * fade_l
    v[:, 2] += dz * fade_l
    mesh.vertices = v
    mesh.uniform_hint = False  # deformed cells: hybrid/general-geometry path
    hx = (hi[0] - lo[0]) / n[0]
    # cells with ix < blend_layers may be deformed; everything beyond is
    # uniform by construction (both deformations fade to zero by
    # ``lateral_hold + blend``)
    mesh.blend_layers = min(
        int(np.ceil((lateral_hold + blend) / hx)) + 1, n[0]
    )
    mesh.uniform_box = (lo.copy(), hi.copy())

    # tag on the x-undeformed mesh (topological facet sets survive the
    # deformation), by lateral facet INDEX so the tagged set is exactly
    # ``inside_f`` regardless of how snapping moved the midpoints
    def on_cap(x):
        j = np.clip(np.floor((x[1] - lo[1]) / hy).astype(int), 0, n[1] - 1)
        k = np.clip(np.floor((x[2] - lo[2]) / hz).astype(int), 0, n[2] - 1)
        tol = 1e-12 * max(1.0, abs(x0))
        return (np.abs(x[0] - x0) < tol) & inside_f[j, k]

    tags = {tag_source: on_cap}
    tag_boundaries(mesh, tags, default=tag_other)

    # deform: pull the near-face vertices back onto the cap
    v = mesh.vertices.copy()
    r = np.hypot(v[:, 1] - center_yz[0], v[:, 2] - center_yz[1])
    s = np.where(r < a, xf - np.sqrt(np.maximum(R * R - r * r, 0.0)), 0.0)
    fade = _fade((v[:, 0] - x0) / blend)
    v[:, 0] += s * fade
    mesh.vertices = v

    # validity: intermediate fade planes can create near-degenerate cells
    # (tangentially rim-rotated vertices linearly interpolated toward their
    # lattice positions may sweep across a neighbour column — observed
    # min detJ ~3e-10 at blend = 9 sagittae, which NaNs the solve at the
    # nominal CFL). Check the band's corner Jacobians; if squeezed, relax
    # the interior band planes (cap layer and the uniform region stay
    # pinned, so the tagged surface and the hybrid split are unaffected),
    # and raise rather than return a mesh that will silently blow up.
    _ensure_band_validity(mesh, n, blend_layers=mesh.blend_layers)

    focus = np.array([x0 + xf, center_yz[0], center_yz[1]])
    return mesh, focus


def _ensure_band_validity(mesh, n, blend_layers: int, floor: float = 0.01):
    """Raise (after attempting band relaxation) if any blend-band cell's
    corner detJ falls below ``floor`` x the uniform cell volume. Healthy
    rim-snapped meshes sit at 0.016-0.10 (the pinned rim + smoothing
    squeeze corners — all physics gates pass there); true interpolation
    degeneracy measures ~1e-10 and NaNs the solve."""
    from .geometry import volume_factors

    nb = min(blend_layers + 1, n[0]) * n[1] * n[2]
    uni_detJ = np.prod(
        (mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0))
        / np.asarray(n)
    )

    def band_quality():
        sub = Mesh(
            dim=3, vertices=mesh.vertices, cells=mesh.cells[:nb]
        )
        try:
            wdetJ, _ = volume_factors(sub, 2)
        except Exception:
            return -1.0
        # N=2 quadrature weights are 1/8 per corner on [0,1]^3
        return float(wdetJ.min()) * 8.0 / uni_detJ

    q = band_quality()
    if q >= floor:
        return
    shape = (n[0] + 1, n[1] + 1, n[2] + 1, 3)
    for _ in range(8):
        v = mesh.vertices.reshape(shape).copy()
        inner = v[1 : min(blend_layers, n[0] - 1) + 1, 1:-1, 1:-1]
        nbavg = (
            v[0 : min(blend_layers, n[0] - 1), 1:-1, 1:-1]
            + v[2 : min(blend_layers, n[0] - 1) + 2, 1:-1, 1:-1]
            + v[1 : min(blend_layers, n[0] - 1) + 1, :-2, 1:-1]
            + v[1 : min(blend_layers, n[0] - 1) + 1, 2:, 1:-1]
            + v[1 : min(blend_layers, n[0] - 1) + 1, 1:-1, :-2]
            + v[1 : min(blend_layers, n[0] - 1) + 1, 1:-1, 2:]
        ) / 6.0
        v[1 : min(blend_layers, n[0] - 1) + 1, 1:-1, 1:-1] = (
            0.5 * inner + 0.5 * nbavg
        )
        mesh.vertices = v.reshape(-1, 3)
        q = band_quality()
        if q >= floor:
            return
    raise ValueError(
        f"bowl mesh blend band has near-degenerate cells (min detJ "
        f"{q:.2e} of uniform after relaxation) — reduce `blend`/"
        "`lateral_hold` or refine the lateral resolution"
    )
