"""Linear second-order wave equation solvers (TPU-native).

Physics (reference ``python/src/fenicsxfus/_linear.py``):

    (1/ρ0 c0²) ∂²u/∂t² − ∇·(1/ρ0 ∇u) = 0

rewritten first-order in time (u, v = ∂u/∂t), with a windowed transducer
Neumann source g(t) on facet tag 1 and a first-order Sommerfeld ABC
(1/ρ0 c0) ∂u/∂t on facet tag 2. GLL collocation makes the mass diagonal, so
the explicit solvers never solve a linear system (reference ``:428``); the
implicit SDIRK variant solves (M + τ²K + τ·ABC)·kv = b with matrix-free
CG+Jacobi (reference ``:623-647``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import ExplicitModelBase, ImplicitModelBase, _cellwise


class LinearExplicit(ExplicitModelBase):
    """Explicit-RK linear solver with *Gauss* quadrature — the mass matrix is
    consistent (non-diagonal) so every slope evaluation solves M·kv = b
    (reference ``_linear.py:12-255`` uses an assembled matrix + LU; here the
    mass action stays matrix-free and the solve is CG preconditioned with
    the lumped-mass diagonal)."""

    def __init__(self, mesh, meshtags, degree, c0, rho0, freq0, p0, s0,
                 rk_order, dt, dtype=jnp.float64, nq=None,
                 cg_rtol=1e-10, cg_maxiter=500):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, rk_order, dt, dtype)
        from ..ops.quadrature_ops import QuadratureOperators

        nc = mesh.num_cells
        c = _cellwise(c0, nc)
        rho = _cellwise(rho0, nc)
        ops = self.ops
        self.qops = QuadratureOperators(ops, nq)
        self.cg_rtol, self.cg_maxiter = cg_rtol, cg_maxiter
        self.mass_coeff = jnp.asarray(1.0 / (rho * c * c), dtype)
        self.stiff_coeff = jnp.asarray(1.0 / rho, dtype)
        self.mdiag_inv = 1.0 / self.qops.mass_diag(1.0 / (rho * c * c))
        self.src_vec = ops.facet_vector(self.SOURCE_TAG, 1.0 / rho)
        self.abc_diag = ops.facet_vector(self.ABC_TAG, 1.0 / (rho * c))
        self._build()

    def rhs(self, t, u, v):
        from ..ops.cg import cg_solve

        g, _ = self.source_amplitudes(t)
        b = (
            -self.qops.stiffness_apply([u], [self.stiff_coeff])
            + g * self.src_vec
            - self.abc_diag * v
        )
        kv, _ = cg_solve(
            lambda x: self.qops.mass_apply(x, self.mass_coeff),
            b,
            b * self.mdiag_inv,
            self.mdiag_inv,
            rtol=self.cg_rtol,
            maxiter=self.cg_maxiter,
        )
        return v, kv


class LinearSpectralExplicit(ExplicitModelBase):
    """Explicit-RK linear wave solver (reference ``_linear.py:258-513``)."""

    STIFF_KEYS = ("coeff_u",)
    FUSED_KIND = "linear"
    SHARD_INV_KEYS = ("inv_m",)  # stored as 1/assembled-diagonal

    def __init__(self, mesh, meshtags, degree, c0, rho0, freq0, p0, s0,
                 rk_order, dt, dtype=jnp.float32):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, rk_order, dt, dtype)
        nc = mesh.num_cells
        c = _cellwise(c0, nc)
        rho = _cellwise(rho0, nc)
        ops = self.ops
        self.consts = self.base_consts()
        # LHS lumped mass: ∫ (1/ρc²) u φ dx   (reference a-form :349-353).
        # Inverted on HOST so the reciprocal keeps an assembly-time mirror
        # (the wave-step packing reads it back as numpy; see ops.np_of).
        m_host = ops.np_of(ops.assemble_diag(1.0 / (rho * c * c)))
        inv_host = 1.0 / m_host
        self.consts["inv_m"] = ops._mirror(jnp.asarray(inv_host, dtype), inv_host)
        # RHS pieces (reference L-form :355-361)
        self.raw_stiff = {"coeff_u": 1.0 / rho}
        self.consts["coeff_u"] = ops.stiff_coeff(1.0 / rho)
        self.consts["src_vec"] = ops.facet_vector(self.SOURCE_TAG, 1.0 / rho)
        self.consts["abc_diag"] = ops.facet_vector(self.ABC_TAG, 1.0 / (rho * c))
        self._build()

    @staticmethod
    def rhs_pure(ops, consts, t, u, v):
        from .base import source_amplitudes

        g, _ = source_amplitudes(consts, t)
        b = (
            -ops.stiffness_apply([u], [consts["coeff_u"]])
            + g * consts["src_vec"]
            - consts["abc_diag"] * v
        )
        return v, b * consts["inv_m"]


class LinearSpectralImplicit(ImplicitModelBase):
    """SDIRK linear wave solver (reference ``_linear.py:516-817``)."""

    STIFF_KEYS = ("coeff_u",)
    PAD_ONE_KEYS = ("m",)  # inverted inside the solver — padding must stay finite

    def __init__(self, mesh, meshtags, degree, c0, rho0, freq0, p0, s0,
                 rk_order, dt, dtype=jnp.float64, cg_rtol=1e-8, cg_maxiter=2000):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, rk_order, dt,
                         dtype, cg_rtol, cg_maxiter)
        nc = mesh.num_cells
        c = _cellwise(c0, nc)
        rho = _cellwise(rho0, nc)
        ops = self.ops
        self.consts = self.base_consts()
        self.consts["m"] = ops.assemble_diag(1.0 / (rho * c * c))
        self.raw_stiff = {"coeff_u": 1.0 / rho}
        self.consts["coeff_u"] = ops.stiff_coeff(1.0 / rho)
        self.consts["kdiag"] = ops.stiffness_diag(1.0 / rho)
        self.consts["src_vec"] = ops.facet_vector(self.SOURCE_TAG, 1.0 / rho)
        self.consts["abc_diag"] = ops.facet_vector(self.ABC_TAG, 1.0 / (rho * c))

    @staticmethod
    def lhs_pure(ops, c, tau, x):
        """A x = M x + τ² K x + τ ABC x  (reference a-form :623-631)."""
        return (
            c["m"] * x
            + tau * tau * ops.stiffness_apply([x], [c["coeff_u"]])
            + tau * c["abc_diag"] * x
        )

    @staticmethod
    def lhs_diag_pure(ops, c, tau):
        return c["m"] + tau * tau * c["kdiag"] + tau * c["abc_diag"]

    @staticmethod
    def rhs_stage(ops, c, tau, t, u, v):
        """b = −K(u + τ v) + g·src − ABC·v  (reference L-form :633-639)."""
        from .base import source_amplitudes

        g, _ = source_amplitudes(c, t)
        return (
            -ops.stiffness_apply([u + tau * v], [c["coeff_u"]])
            + g * c["src_vec"]
            - c["abc_diag"] * v
        )
