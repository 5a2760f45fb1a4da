"""Experimental solvers (reference ``python/src/fenicsxfus/_experimental.py``):

* ``LinearSpectralNewmark`` — Newmark-β time stepping (:13-251),
* ``LinearSpectralS2`` — spatially windowed source f(x,t)=s(x)·g(t) (:254-540),
* ``LinearSpectralAdaptive`` (alias ``LinearSpectralSciPy``) — adaptive
  RK45; the reference wraps scipy.integrate.RK45 serially (:543-712), here a
  Dormand-Prince 5(4) controller runs fully inside jit,
* ``LinearSpectralSponge`` — spatially varying δ(x) sponge-layer absorber
  (:715-984),
* ``WesterveltSpectralAdaptive`` (alias ``WesterveltSpectralSciPy``) (:987-1188).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cg import cg_solve
from .base import ExplicitModelBase, SpectralModelBase, _cellwise, source_amplitudes
from .common import step_sizes
from .linear import LinearSpectralExplicit
from .westervelt import WesterveltSpectralExplicit

# --------------------------------------------------------------------------
# Spatial source windows (the reference's commented-out menu,
# ``_experimental.py:383-439``, exposed as first-class profiles)


def heaviside_window(a: float, b: float, axis: int = 1):
    """s(x) = 1 on a <= x_axis <= b, else 0 (the reference's active choice)."""

    def profile(x):
        xi = x[axis]
        return np.where((xi >= a) & (xi <= b), 1.0, 0.0)

    return profile


def tukey_window(a: float, b: float, axis: int = 1):
    """Tapered-cosine: 1 on |x|<=a, cosine roll-off to 0 at |x|=b."""

    def profile(x):
        xi = np.abs(x[axis])
        ramp = 0.5 * (1 + np.cos(np.pi * (xi - a) / (b - a)))
        return np.where(xi <= a, 1.0, np.where(xi <= b, ramp, 0.0))

    return profile


def semicircle_window(r0: float, axis: int = 1):
    def profile(x):
        xi = x[axis]
        return np.where(np.abs(xi) <= r0, np.sqrt(np.maximum(r0**2 - xi**2, 0.0)) / r0, 0.0)

    return profile


def double_heaviside_window(a: float, b: float, c: float, d: float, axis: int = 1):
    def profile(x):
        xi = x[axis]
        return np.where(((xi >= a) & (xi <= b)) | ((xi >= c) & (xi <= d)), 1.0, 0.0)

    return profile


# --------------------------------------------------------------------------


class LinearSpectralS2(ExplicitModelBase):
    """Linear solver with a spatially windowed source s(x)·g(t)
    (reference ``_experimental.py:254-540``; default window = Heaviside on
    x₁ ∈ [−0.011, 0.011] matching :431-439)."""

    STIFF_KEYS = ("coeff_u",)

    def __init__(self, mesh, meshtags, degree, c0, rho0, freq0, p0, s0,
                 source_profile=None, dtype=jnp.float32):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, 4, 0.0, dtype)
        nc = mesh.num_cells
        c = _cellwise(c0, nc)
        rho = _cellwise(rho0, nc)
        ops = self.ops
        profile = source_profile or heaviside_window(-0.011, 0.011)
        prof_nodal = np.asarray(profile(ops.space.dof_coords.T), np.float64)
        self.consts = self.base_consts()
        self.consts["inv_m"] = 1.0 / ops.assemble_diag(1.0 / (rho * c * c))
        self.raw_stiff = {"coeff_u": 1.0 / rho}
        self.consts["coeff_u"] = ops.stiff_coeff(1.0 / rho)
        # ∫_Γ1 (1/ρ) s(x) φ ds — profile folded into the facet vector with
        # the per-cell 1/ρ (NOT a scalar mean; the medium may vary there)
        self.consts["src_vec"] = ops.facet_vector_nodal(
            self.SOURCE_TAG, prof_nodal, cell_coeff=1.0 / rho
        )
        self.consts["abc_diag"] = ops.facet_vector(self.ABC_TAG, 1.0 / (rho * c))
        self._build()

    rhs_pure = staticmethod(LinearSpectralExplicit.rhs_pure)

    def rk4(self, t0: float, tf: float, dt: float):
        self.dt = float(dt)
        self._build()
        return self.rk(t0, tf)


class LinearSpectralNewmark(SpectralModelBase):
    """Newmark-β (γ=1/2, β=1/4) linear solver
    (reference ``_experimental.py:13-251``). Each step solves
    (M + γ·dt·ABC + β·dt²·K) w_{n+1} = b(u_n, v_n, w_n, t_{n+1}) — the
    reference applies a single Jacobi sweep (KSP PREONLY + PC Jacobi,
    :117-120); here a proper matrix-free CG+Jacobi solve."""

    def __init__(self, mesh, meshtags, degree, c0, rho0, freq0, p0, s0, dt,
                 dtype=jnp.float64, cg_rtol=1e-10, cg_maxiter=2000):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, dt, dtype)
        self.gamma = 0.5
        self.beta = 0.25
        self.cg_rtol = cg_rtol
        self.cg_maxiter = cg_maxiter
        nc = mesh.num_cells
        c = _cellwise(c0, nc)
        rho = _cellwise(rho0, nc)
        ops = self.ops
        self.m = ops.assemble_diag(1.0 / (rho * c * c))
        self.coeff_u = jnp.asarray(1.0 / rho, dtype)
        self.kdiag = ops.stiffness_diag(1.0 / rho)
        self.src_vec = ops.facet_vector(self.SOURCE_TAG, 1.0 / rho)
        self.abc_diag = ops.facet_vector(self.ABC_TAG, 1.0 / (rho * c))
        self.w_n = jnp.zeros(ops.ndofs, dtype)

    def init(self):
        super().init()
        self.w_n = jnp.zeros(self.ops.ndofs, self.dtype)
        return self

    def _A(self, dtn, x):
        return (
            self.m * x
            + (self.gamma * dtn) * self.abc_diag * x
            + (self.beta * dtn * dtn)
            * self.ops.stiffness_apply([x], [self.coeff_u])
        )

    def newmark(self, t0: float, tf: float):
        gamma, beta = self.gamma, self.beta
        ops = self.ops
        consts = self.base_consts()

        def step(carry, dtn):
            u0, v0, w0, t = carry
            t1 = t + dtn
            g, _ = source_amplitudes(consts, t1)
            # predictor combination enters the stiffness argument
            upred = u0 + dtn * v0 + 0.5 * dtn * dtn * (1 - 2 * beta) * w0
            b = (
                -self.abc_diag * (v0 + (1 - gamma) * dtn * w0)
                - ops.stiffness_apply([upred], [self.coeff_u])
                + g * self.src_vec
            )
            dinv = 1.0 / (
                self.m
                + (gamma * dtn) * self.abc_diag
                + (beta * dtn * dtn) * self.kdiag
            )
            w1, _ = cg_solve(
                lambda x: self._A(dtn, x), b, w0, dinv,
                rtol=self.cg_rtol, maxiter=self.cg_maxiter,
            )
            v1 = v0 + (1 - gamma) * dtn * w0 + gamma * dtn * w1
            u1 = u0 + dtn * v0 + 0.5 * dtn * dtn * ((1 - 2 * beta) * w0 + 2 * beta * w1)
            return (u1, v1, w1, t1), None

        @jax.jit
        def run(consts_unused, uvw, t0v, xs):
            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                u_, v_, w_, _ = carry
                return step((u_, v_, w_, tn), dtn)

            u, v, w = uvw
            (u, v, w, t), _ = jax.lax.scan(body, (u, v, w, t0v), xs)
            return (u, v, w), t

        from .common import run_segmented

        def run_adapter(consts, uvw, _unused, t0v, dts):
            (u, v, w), t = run(consts, uvw, t0v, dts)
            return (u, v, w), None, t

        dts = np.asarray(step_sizes(t0, tf, self.dt))
        (u, v, w), _, t = run_segmented(
            run_adapter, None, (self.u_n, self.v_n, self.w_n), None, t0, dts,
            self.dtype,
        )
        self.u_n, self.v_n, self.w_n, self.t = u, v, w, float(t)
        return self.u_n, self.v_n, self.w_n, self.t


class LinearSpectralSponge(ExplicitModelBase):
    """Linear solver with a spatially-varying δ(x) sponge-layer absorber
    (reference ``_experimental.py:715-984``): δ ramps linearly from 0 at
    ``sponge_start`` (default 0.12, reference :770-780), damping outgoing
    waves in the pad region. Note the reference's alternative scaling
    (mass 1/ρ, stiffness c²/ρ)."""

    STIFF_KEYS = ("coeff_u",)
    NODAL_STIFF_KEYS = ("delta_scales",)
    SHARD_INV_KEYS = ("inv_m",)  # streamed setup: sum local m, then invert

    def __init__(self, mesh, meshtags, degree, c0, rho0, delta0, freq0, p0, s0,
                 sponge_start: float = 0.12, delta_profile=None,
                 dtype=jnp.float32):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, 4, 0.0, dtype)
        c0, rho0 = float(np.asarray(c0).mean()), float(np.asarray(rho0).mean())
        lmbda = float(s0) / float(freq0)
        ops = self.ops
        coords = ops.space.dof_coords.T
        if delta_profile is None:
            x0 = coords[0]
            slope = float(delta0) / 5.0 / lmbda
            delta = np.where(x0 < sponge_start, 0.0, slope * (x0 - sponge_start))
        else:
            delta = np.asarray(delta_profile(coords), np.float64)
        self.delta_nodal = delta
        nc = mesh.num_cells
        self.consts = self.base_consts()
        # m = ∫ (1/ρ) u φ dx + ∫_Γ2 (δ(x)/ρc) u φ ds
        m = ops.assemble_diag(np.full(nc, 1.0 / rho0)) + ops.facet_vector_nodal(
            self.ABC_TAG, delta / (rho0 * c0)
        )
        self.consts["inv_m"] = 1.0 / m
        self.raw_stiff = {"coeff_u": np.full(nc, c0 * c0 / rho0)}
        self.consts["coeff_u"] = ops.stiff_coeff(np.full(nc, c0 * c0 / rho0))
        self.raw_nodal = {"delta_scales": delta / rho0}
        # unstructured meshes have no lattice: pass the raw nodal array and
        # let stiffness_apply_nodal's gather path evaluate it per cell
        self.consts["delta_scales"] = (
            ops.pack_scales_nodal(delta / rho0)
            if ops.lattice is not None
            else jnp.asarray(delta / rho0, dtype)
        )
        self.consts["src_vec"] = ops.facet_vector(self.SOURCE_TAG, c0 * c0 / rho0)
        self.consts["src_vec_d"] = ops.facet_vector_nodal(
            self.SOURCE_TAG, delta / rho0
        )
        self.consts["abc_diag"] = ops.facet_vector(self.ABC_TAG, c0 / rho0)
        self._build()

    @staticmethod
    def rhs_pure(ops, consts, t, u, v):
        g, dg = source_amplitudes(consts, t)
        b = (
            -ops.stiffness_apply([u], [consts["coeff_u"]])
            - ops.stiffness_apply_nodal([v], [consts["delta_scales"]])
            + g * consts["src_vec"]
            + dg * consts["src_vec_d"]
            - consts["abc_diag"] * v
        )
        return v, b * consts["inv_m"]

    def rk4(self, t0: float, tf: float, dt: float):
        self.dt = float(dt)
        self._build()
        return self.rk(t0, tf)


# --------------------------------------------------------------------------
# Adaptive Dormand-Prince RK5(4) — the in-jit analogue of scipy RK45


_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def adaptive_rk45(rhs, u0, v0, t0, tf, dt0, atol=1e-9, rtol=1e-9, max_steps=1_000_000):
    """Dormand-Prince 5(4) with PI-free step control (scipy-RK45-style
    tolerances, reference ``_experimental.py:676-712``), fully inside jit."""

    def rms(eu, ev, u, v, unew, vnew):
        su = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(unew))
        sv = atol + rtol * jnp.maximum(jnp.abs(v), jnp.abs(vnew))
        n = eu.size + ev.size
        return jnp.sqrt((jnp.sum((eu / su) ** 2) + jnp.sum((ev / sv) ** 2)) / n)

    def attempt(t, u, v, dt):
        kus, kvs = [], []
        for i in range(7):
            du = sum((_DP_A[i][j] * kus[j] for j in range(i)), jnp.zeros_like(u))
            dv = sum((_DP_A[i][j] * kvs[j] for j in range(i)), jnp.zeros_like(v))
            ku, kv = rhs(t + _DP_C[i] * dt, u + dt * du, v + dt * dv)
            kus.append(ku)
            kvs.append(kv)
        u5 = u + dt * sum(_DP_B5[i] * kus[i] for i in range(7))
        v5 = v + dt * sum(_DP_B5[i] * kvs[i] for i in range(7))
        eu = dt * sum((_DP_B5[i] - _DP_B4[i]) * kus[i] for i in range(7))
        ev = dt * sum((_DP_B5[i] - _DP_B4[i]) * kvs[i] for i in range(7))
        return u5, v5, rms(eu, ev, u, v, u5, v5)

    def cond(state):
        t, u, v, dt, steps = state
        return jnp.logical_and(t < tf, steps < max_steps)

    def body(state):
        t, u, v, dt, steps = state
        dt_c = jnp.minimum(dt, tf - t)
        u5, v5, err = attempt(t, u, v, dt_c)
        accept = err <= 1.0
        fac = jnp.clip(0.9 * err ** (-0.2), 0.2, 10.0)
        dt_new = jnp.where(accept, dt_c * fac, dt_c * jnp.maximum(0.2, fac))
        t = jnp.where(accept, t + dt_c, t)
        u = jnp.where(accept, u5, u)
        v = jnp.where(accept, v5, v)
        return t, u, v, dt_new, steps + 1

    state = (
        jnp.asarray(t0, u0.dtype),
        u0,
        v0,
        jnp.asarray(dt0, u0.dtype),
        jnp.asarray(0, jnp.int32),
    )
    t, u, v, dt, steps = jax.lax.while_loop(cond, body, state)
    return u, v, t, steps


class _AdaptiveRKMixin:
    """Shared adaptive-RK driver: ONE cached jitted program with consts /
    t0 / tf as arguments (the round-1 version closed over ``self.rhs`` and
    the times, retracing on every ``rk()`` call and baking device arrays
    into the HLO — against the framework's consts-as-args rule,
    ``models/common.py::make_rk_step``)."""

    _arun = None

    def _adaptive_run(self):
        if self._arun is None:
            ops = self.ops
            rhs_pure = type(self).rhs_pure
            atol, rtol = self.atol, self.rtol

            @jax.jit
            def run(consts, u, v, t0, tf, dt0):
                rhs = lambda t, uu, vv: rhs_pure(ops, consts, t, uu, vv)
                return adaptive_rk45(rhs, u, v, t0, tf, dt0, atol, rtol)

            self._arun = run
        return self._arun

    def rk(self, t0: float, tf: float):
        dt0 = 0.01 * (tf - t0) / 100.0
        u, v, t, steps = self._adaptive_run()(
            self.consts, self.u_n, self.v_n,
            jnp.asarray(t0, self.dtype), jnp.asarray(tf, self.dtype),
            jnp.asarray(dt0, self.dtype),
        )
        self.u_n, self.v_n, self.t = u, v, float(t)
        self.nsteps = int(steps)
        return self.u_n, self.v_n, self.t, self.nsteps


class LinearSpectralAdaptive(_AdaptiveRKMixin, LinearSpectralExplicit):
    """Adaptive-RK linear solver (reference ``LinearSpectralSciPy``,
    ``_experimental.py:543-712``) — runs the whole adaptive loop on device."""

    def __init__(self, mesh, meshtags, degree, c0, rho0, freq0, p0, s0,
                 dtype=jnp.float64, atol=1e-9, rtol=1e-9):
        super().__init__(mesh, meshtags, degree, c0, rho0, freq0, p0, s0,
                         4, 1.0, dtype=dtype)
        self.atol, self.rtol = atol, rtol


class WesterveltSpectralAdaptive(_AdaptiveRKMixin, WesterveltSpectralExplicit):
    """Adaptive-RK Westervelt solver (reference ``WesterveltSpectralSciPy``,
    ``_experimental.py:987-1188``)."""

    def __init__(self, mesh, meshtags, degree, c0, rho0, delta0, beta0, freq0,
                 p0, s0, dtype=jnp.float64, atol=1e-9, rtol=1e-9):
        super().__init__(mesh, meshtags, degree, c0, rho0, delta0, beta0,
                         freq0, p0, s0, 4, 1.0, dtype=dtype)
        self.atol, self.rtol = atol, rtol


# Reference-name aliases (API parity with the reference package exports)
LinearSpectralSciPy = LinearSpectralAdaptive
WesterveltSpectralSciPy = WesterveltSpectralAdaptive
