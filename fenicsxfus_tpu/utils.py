"""Utility functions (reference ``python/src/fenicsxfus/utils.py``)."""

from __future__ import annotations

import numpy as np


def compute_diffusivity_of_sound(
    frequency: float, speed: float, attenuationdB: float
) -> float:
    """Convert attenuation in dB/m to the diffusivity-of-sound δ
    (reference ``utils.py:50-55``): δ = 2 α_Np c³ / ω²."""
    attenuationNp = attenuationdB / 20 * np.log(10)
    return 2 * attenuationNp * speed**3 / frequency / frequency


def compute_eval_params(mesh, points: np.ndarray):
    """Locate evaluation points in cells (reference ``utils.py:10-47`` uses a
    DOLFINx BB-tree; here a direct multilinear inverse-map search).

    Parameters: ``points`` [dim, n] (or [3, n] with trailing zeros, matching
    the reference convention). Returns (points_found [n_found, dim],
    cells [n_found], xi [n_found, dim] reference coordinates).
    """
    pts = np.asarray(points, dtype=np.float64).T[:, : mesh.dim]  # [n, dim]
    verts = mesh.cell_vertices()  # [Nc, 2**d, dim]
    lo = verts.min(axis=1)  # [Nc, dim]
    hi = verts.max(axis=1)
    found_pts, found_cells, found_xi = [], [], []
    tol = 1e-10 * max(float(np.max(hi - lo)), 1.0)
    for p in pts:
        inside = np.all((p >= lo - tol) & (p <= hi + tol), axis=1)
        hit = -1
        for c in np.where(inside)[0]:
            xi = _inverse_map(verts[c], p, mesh.dim)
            if xi is not None:
                hit = c
                found_xi.append(xi)
                break
        if hit >= 0:
            found_pts.append(p)
            found_cells.append(hit)
    return (
        np.array(found_pts).reshape(-1, mesh.dim),
        np.array(found_cells, dtype=np.int64),
        np.array(found_xi).reshape(-1, mesh.dim),
    )


def _inverse_map(cell_verts: np.ndarray, p: np.ndarray, d: int, iters: int = 30):
    """Newton inversion of the multilinear cell map; returns xi in [0,1]^d or
    None if the point lies outside this cell."""
    from .core.geometry import _geom_grad_tensor

    xi = np.full(d, 0.5)
    for _ in range(iters):
        phi = np.ones(2**d)
        for a in range(d):
            bit = (np.arange(2**d) >> (d - 1 - a)) & 1
            phi *= np.where(bit == 1, xi[a], 1.0 - xi[a])
        x = phi @ cell_verts
        r = p - x
        if np.linalg.norm(r) < 1e-13 * max(np.max(np.abs(cell_verts)), 1.0):
            break
        dshape = _geom_grad_tensor([np.array([v]) for v in xi])[0]  # [2**d, d]
        J = cell_verts.T @ dshape  # [dim, d]
        xi = xi + np.linalg.solve(J, r)
    if np.all(xi > -1e-8) and np.all(xi < 1 + 1e-8):
        return np.clip(xi, 0.0, 1.0)
    return None


def eval_function(ops, u, points: np.ndarray) -> np.ndarray:
    """Evaluate a nodal field at physical points: the sensor-extraction
    analogue of DOLFINx ``Function.eval`` (reference ``exp2.py`` tail)."""
    from .core.gll import lagrange_eval_gll

    pts, cells, xis = compute_eval_params(ops.mesh, points)
    uc = np.asarray(u)[np.asarray(ops.space.dofmap)[cells]]  # [n, N**d]
    N, d = ops.N, ops.d
    vals = np.zeros(len(cells))
    for i in range(len(cells)):
        tab = [lagrange_eval_gll(N, np.array([xis[i, a]]))[0] for a in range(d)]
        w = tab[0]
        for t in tab[1:]:
            w = np.multiply.outer(w, t).reshape(-1)
        vals[i] = w @ uc[i]
    return pts, vals


def estimate_stable_dt(ops, c0, rho0, rk_order: int = 4, safety: float = 0.85,
                       iters: int = 40, seed: int = 0) -> float:
    """Spectral-radius-based stable timestep for the explicit wave solvers.

    The reference sizes dt from h_min (CFL·h/(c·p²),
    ``cpp/.../W-H131-WATER/main.cpp:108-111``) — adequate on the uniform
    meshes it runs, but on deformed (bowl-fitted) lattices the skewed
    blend-band cells raise the operator's spectral radius beyond what the
    shortest edge implies (measured: CFL 0.4 marginally unstable in fp32
    where 0.3 is fine). This measures the thing that actually matters:
    power-iterate λ_max of M⁻¹K_{c²/ρ} (the first-order system's
    eigenfrequencies are ω = √λ) and return
    ``safety · s_rk / ω_max`` with ``s_rk`` the RK method's
    imaginary-axis stability extent (2√2 for classical RK4).

    Host-side fp64; ~``iters`` operator applies — negligible against the
    thousands of steps it sizes.
    """
    import jax.numpy as jnp

    s_rk = {1: 0.0, 2: 0.0, 3: 1.7320508, 4: 2.8284271}.get(int(rk_order))
    if not s_rk:
        # RK1/RK2 have no imaginary-axis interval; fall back to the RK3
        # extent scaled down (practical damping from the ABC terms keeps
        # the spectrum slightly off-axis)
        s_rk = 1.0
    nc = ops.num_cells
    c_arr = np.broadcast_to(np.asarray(c0, np.float64).reshape(-1), (nc,))
    r_arr = np.broadcast_to(np.asarray(rho0, np.float64).reshape(-1), (nc,))
    kcoef = ops.stiff_coeff(c_arr**2 / r_arr)
    minv = 1.0 / jnp.clip(ops.assemble_diag(1.0 / r_arr), 1e-300)
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.standard_normal(ops.ndofs), minv.dtype)
    lam = 0.0
    for _ in range(iters):
        w = minv * ops.stiffness_apply([z], [kcoef])
        nrm = float(jnp.linalg.norm(w))
        lam = nrm / float(jnp.linalg.norm(z))
        z = w / nrm
    # one Rayleigh refinement
    w = minv * ops.stiffness_apply([z], [kcoef])
    lam = float(jnp.vdot(z, w).real)
    omega = float(np.sqrt(max(lam, 1e-300)))
    return safety * s_rk / omega
