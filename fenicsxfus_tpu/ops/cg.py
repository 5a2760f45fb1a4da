"""Matrix-free preconditioned conjugate gradients (Jacobi preconditioner).

TPU-native replacement of the reference's PETSc KSP CG + PC Jacobi used by
the implicit DIRK solvers (``python/src/fenicsxfus/_linear.py:644-647``).
Runs entirely inside jit via ``lax.while_loop``; reductions that PETSc would
do with MPI allreduce become XLA reductions (``psum`` under ``shard_map``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cg_solve(A, b, x0, diag_inv, rtol=1e-8, atol=0.0, maxiter=1000, dot=None):
    """Solve A x = b with PCG; ``A`` is a linear callable, ``diag_inv`` the
    inverse diagonal (Jacobi), ``dot`` an optional inner product (used by the
    sharded path to weight replicated interface DOFs).

    Returns ``(x, (iterations, final ‖r‖²))`` — the convergence information
    the reference gets from PETSc KSP (``_linear.py:644-647``); the DIRK
    drivers surface it per segment so a silently maxiter-capped solve inside
    a ``lax.scan`` cannot pass for converged physics."""
    if dot is None:
        dot = lambda a, c: jnp.vdot(a, c)

    r = b - A(x0)
    z = diag_inv * r
    p = z
    rz = dot(r, z)
    bnorm2 = dot(b, b)
    tol2 = jnp.maximum(rtol * rtol * bnorm2, atol * atol)

    def cond(state):
        x, r, p, rz, it = state
        return jnp.logical_and(dot(r, r) > tol2, it < maxiter)

    def body(state):
        x, r, p, rz, it = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = diag_inv * r
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x0, r, p, rz, 0))
    return x, (it, dot(r, r))
