"""Focused (bowl) transducer sources via phased flat-aperture emission.

The reference's HITU benchmarks (H101/H131 bowls, Groth et al. 2021;
``cpp/fenicsx-sf-fastor/benchmarks/HITU/*``) mesh the curved bowl surface
and drive it through facet tags. On a structured box the TPU-native
equivalent is a *phased* flat aperture: per-node emission delays
τ(r) = (√(F²+a²) − √(F²+r²))/c₀ focus the beam at depth F (equivalent to
the bowl in the paraxial sense). Because

    cos(ω(t − τ(x))) = cos(ωτ(x))·cos(ωt) + sin(ωτ(x))·sin(ωt)

the spatially varying phase splits into TWO static facet vectors weighted
by time-dependent scalars — the per-stage source cost stays two fused
AXPYs, exactly like the plain models.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import ExplicitModelBase, _cellwise, source_amplitudes
from .common import source_window


def bowl_delays(coords, center, aperture_radius, focal_distance, c0, axis=0):
    """(mask s(x), delay τ(x)) for a flat phased aperture on the
    {x_axis = const} face focusing at ``focal_distance``."""
    d = coords.shape[0]
    r2 = np.zeros(coords.shape[1])
    for a in range(d):
        if a == axis:
            continue
        r2 += (coords[a] - center[a]) ** 2
    r = np.sqrt(r2)
    mask = (r <= aperture_radius).astype(np.float64)
    F = focal_distance
    tau = (np.sqrt(F**2 + aperture_radius**2) - np.sqrt(F**2 + r2)) / c0
    return mask, tau * mask


class WesterveltSpectralFocused(ExplicitModelBase):
    """Westervelt solver with a phased (focused) source — the HITU bowl
    analogue. With β=δ=0 it reduces to a focused linear solver."""

    STIFF_KEYS = ("coeff_u", "coeff_v")

    def __init__(self, mesh, meshtags, degree, c0, rho0, delta0, beta0, freq0,
                 p0, s0, rk_order, dt, aperture_radius, focal_distance,
                 center=None, dtype=jnp.float32):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, rk_order, dt, dtype)
        nc = mesh.num_cells
        c = _cellwise(c0, nc)
        rho = _cellwise(rho0, nc)
        delta = _cellwise(delta0, nc)
        beta = _cellwise(beta0, nc)
        ops = self.ops
        self.consts = self.base_consts()
        self.consts["m0"] = ops.assemble_diag(1.0 / (rho * c * c)) + ops.facet_vector(
            self.ABC_TAG, delta / (rho * c**3)
        )
        self.consts["d2"] = ops.assemble_diag(2.0 * beta / (rho * rho * c**4))
        self.raw_stiff = {"coeff_u": 1.0 / rho, "coeff_v": delta / (rho * c * c)}
        self.consts["coeff_u"] = ops.stiff_coeff(1.0 / rho)
        self.consts["coeff_v"] = ops.stiff_coeff(delta / (rho * c * c))
        self.consts["abc_diag"] = ops.facet_vector(self.ABC_TAG, 1.0 / (rho * c))

        coords = ops.space.dof_coords.T
        lo = mesh.vertices.min(axis=0)
        hi = mesh.vertices.max(axis=0)
        if center is None:
            center = (hi + lo) / 2.0
        mask, tau = bowl_delays(
            coords, center, aperture_radius, focal_distance, float(np.mean(c))
        )
        w0 = self.w0
        rho_s = float(np.mean(rho))
        delta_s = float(np.mean(delta))
        c_s = float(np.mean(c))
        # phase-split facet vectors (1/ρ and δ/ρc² weighted)
        for name, coeff in [("", 1.0 / rho_s), ("_d", delta_s / (rho_s * c_s**2))]:
            self.consts[f"src_cos{name}"] = ops.facet_vector_nodal(
                self.SOURCE_TAG, coeff * mask * np.cos(w0 * tau)
            )
            self.consts[f"src_sin{name}"] = ops.facet_vector_nodal(
                self.SOURCE_TAG, coeff * mask * np.sin(w0 * tau)
            )
        self._build()

    @staticmethod
    def rhs_pure(ops, consts, t, u, v):
        w0 = consts["w0"]
        amp = consts["p0"] * w0 / consts["s0"]
        win, dwin = source_window(t, consts["freq"], consts["alpha"])
        cos_t, sin_t = jnp.cos(w0 * t), jnp.sin(w0 * t)
        # g(x,t)   = win·amp·(cosτ·cos + sinτ·sin)
        # dg(x,t)  = dwin·amp·(…) + win·amp·w0·(−cosτ·sin + sinτ·cos)
        g_vec = (win * amp) * (
            cos_t * consts["src_cos"] + sin_t * consts["src_sin"]
        )
        dg_vec = (dwin * amp) * (
            cos_t * consts["src_cos_d"] + sin_t * consts["src_sin_d"]
        ) + (win * amp * w0) * (
            -sin_t * consts["src_cos_d"] + cos_t * consts["src_sin_d"]
        )
        m = consts["m0"] - consts["d2"] * u
        b = (
            -ops.stiffness_apply([u, v], [consts["coeff_u"], consts["coeff_v"]])
            + g_vec
            + dg_vec
            - consts["abc_diag"] * v
            + consts["d2"] * (v * v)
        )
        return v, b / m
