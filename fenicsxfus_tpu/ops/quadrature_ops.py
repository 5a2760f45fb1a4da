"""Non-collocated (Gauss-quadrature) matrix-free operators.

TPU-native analogue of the reference's dense-tabulation variant
(``cpp/fenicsx-pc/common/precompute_op.hpp``: ``Mass2D/3D`` :38-138,
``Stiffness2D/3D`` :294-486), which decouples the quadrature rule from the
basis degree (e.g. ``Lossy3D<T,4,5>``), and of the Python package's
Gauss-quadrature ``LinearExplicit`` solver (``_linear.py:12-255``) whose
mass matrix is *not* diagonal.

Everything is sum-factorised batched einsum over the cell dimension:
evaluate at the quadrature lattice with the tabulation matrix T [nq, N]
(derivative tabulation dT for gradients), scale by the precomputed geometry
factors, contract back with Tᵀ, segment-sum assemble.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import SYM_PAIRS, quadrature_factors
from ..core.gll import gll_points_weights_01, lagrange_eval_gll

_PRECISION = jax.lax.Precision.HIGHEST


def _einsum(*args):
    return jnp.einsum(*args, precision=_PRECISION)


def gauss_rule_01(nq: int):
    gp, gw = np.polynomial.legendre.leggauss(nq)
    return (gp + 1.0) / 2.0, gw / 2.0


class QuadratureOperators:
    """Mass / stiffness actions with an ``nq``-point Gauss rule per axis.

    Shares the function space (and its gather/scatter plan) with an
    existing ``SEMOperators`` instance.
    """

    def __init__(self, ops, nq: int | None = None):
        self.ops = ops
        self.d = ops.d
        self.N = ops.N
        self.nq = nq or ops.N + 1
        self.dtype = ops.dtype
        x1, w1 = gauss_rule_01(self.nq)
        # basis value + derivative tabulation at the quadrature points
        xg, _ = gll_points_weights_01(self.N)
        T = lagrange_eval_gll(self.N, x1)  # [nq, N]
        dT = _lagrange_derivative(xg, x1)  # [nq, N]
        self.T = jnp.asarray(T, self.dtype)
        self.dT = jnp.asarray(dT, self.dtype)
        wdetJ, G = quadrature_factors(ops.mesh, x1, w1)
        nqd = self.nq**self.d
        self._wdetJ_np = wdetJ
        shape = (-1,) + (self.nq,) * self.d
        self.wdetJ = jnp.asarray(wdetJ.reshape(shape), self.dtype)
        self.G = jnp.asarray(G.reshape(shape + (G.shape[-1],)), self.dtype)
        self._T_np, self._dT_np = T, dT

    # ----------------------------------------------------------- evaluation
    def _fwd(self, z, mats):
        """Evaluate cell dofs at the quadrature lattice with per-axis
        matrices ``mats[a]`` [nq, N]."""
        d = self.d
        if d == 1:
            return _einsum("qi,ci->cq", mats[0], z)
        if d == 2:
            t = _einsum("qi,cij->cqj", mats[0], z)
            return _einsum("rj,cqj->cqr", mats[1], t)
        t = _einsum("qi,cijk->cqjk", mats[0], z)
        t = _einsum("rj,cqjk->cqrk", mats[1], t)
        return _einsum("sk,cqrk->cqrs", mats[2], t)

    def _bwd(self, f, mats):
        """Transpose of ``_fwd``: quadrature lattice → cell dofs."""
        d = self.d
        if d == 1:
            return _einsum("qi,cq->ci", mats[0], f)
        if d == 2:
            t = _einsum("rj,cqr->cqj", mats[1], f)
            return _einsum("qi,cqj->cij", mats[0], t)
        t = _einsum("sk,cqrs->cqrk", mats[2], f)
        t = _einsum("rj,cqrk->cqjk", mats[1], t)
        return _einsum("qi,cqjk->cijk", mats[0], t)

    # ------------------------------------------------------------ operators
    def mass_apply(self, x, coeff) -> jnp.ndarray:
        """Consistent (non-lumped) mass action: M x with DG-0 coefficient."""
        ops = self.ops
        z = ops.gather_combine([x], [coeff])
        f = self._fwd(z, [self.T] * self.d)
        f = f * self.wdetJ
        y = self._bwd(f, [self.T] * self.d)
        return ops.scatter(y)

    def mass_diag(self, coeff) -> jnp.ndarray:
        """Diagonal of the consistent mass (Jacobi preconditioner)."""
        d, N, nq = self.d, self.N, self.nq
        T2 = self._T_np**2  # [nq, N]
        Phi2 = T2
        for _ in range(d - 1):
            Phi2 = np.einsum("qi,rj->qrij", Phi2, T2).reshape(
                Phi2.shape[0] * nq, Phi2.shape[1] * N
            )
        coeff_arr = np.broadcast_to(
            np.asarray(coeff, np.float64).reshape(-1), (self.ops.num_cells,)
        )
        diag_cells = coeff_arr[:, None] * (self._wdetJ_np @ Phi2)
        return self.ops.scatter(
            jnp.asarray(diag_cells.reshape((-1,) + (N,) * d), self.dtype)
        )

    def stiffness_apply(self, xs, coeffs) -> jnp.ndarray:
        """Σ_f K_{coeff_f}(x_f) with the Gauss rule (exact for affine cells,
        reference ``precompute_op.hpp`` Stiffness kernels)."""
        ops = self.ops
        z = ops.gather_combine(xs, coeffs)
        d = self.d
        mats_by_axis = []
        for a in range(d):
            mats_by_axis.append(
                [self.dT if b == a else self.T for b in range(d)]
            )
        grads = [self._fwd(z, mats_by_axis[a]) for a in range(d)]
        pairs = SYM_PAIRS[d]
        sym = {p: i for i, p in enumerate(pairs)}
        y = None
        for a in range(d):
            acc = None
            for b in range(d):
                idx = sym[(min(a, b), max(a, b))]
                term = self.G[..., idx] * grads[b]
                acc = term if acc is None else acc + term
            ya = self._bwd(acc, mats_by_axis[a])
            y = ya if y is None else y + ya
        return ops.scatter(y)


def _lagrange_derivative(nodes: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """dl_i/dx at arbitrary points (barycentric differentiation)."""
    n = len(nodes)
    diff = nodes[:, None] - nodes[None, :]
    np.fill_diagonal(diff, 1.0)
    bw = 1.0 / np.prod(diff, axis=1)
    out = np.zeros((len(pts), n))
    for p, xp in enumerate(pts):
        d = xp - nodes
        onnode = np.isclose(d, 0.0, atol=1e-14)
        if onnode.any():
            q = int(np.argmax(onnode))
            for i in range(n):
                if i != q:
                    out[p, i] = bw[i] / bw[q] / (nodes[q] - nodes[i])
            out[p, q] = -np.sum(out[p])
        else:
            lx = np.prod(d)  # ∏(x−x_j)
            for i in range(n):
                s = np.sum(1.0 / d) - 1.0 / d[i]
                out[p, i] = bw[i] * lx / d[i] * s
    return out
