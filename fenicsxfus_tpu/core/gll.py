"""Gauss-Lobatto-Legendre (GLL) quadrature and 1D spectral basis.

Host-side (numpy, float64) precompute of the 1D building blocks of the
spectral element method:

* GLL points/weights on [0, 1] (reference interval used by the cell map),
* the Lagrange basis collocated at the GLL points ("GLL-warped" Lagrange in
  basix terms; cf. reference ``python/src/fenicsxfus/_linear.py:320-324``
  which uses ``basix.LagrangeVariant.gll_warped``),
* the 1D collocation differentiation matrix D[q, i] = dl_i/dx (x_q), the
  analogue of the reference's ``tabulate_1d``
  (``cpp/fenicsx-sf/common/precompute.hpp:218-234``),
* tabulation of the basis at arbitrary points (for interpolation / point
  evaluation / error quadrature).

Everything here is exact-double host precompute; devices only ever see the
resulting small dense matrices.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def gll_points_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Return ``n`` GLL points and weights on [-1, 1] (float64).

    Points are the roots of (1-x^2) P'_{n-1}(x); weights are
    w_i = 2 / (n (n-1) P_{n-1}(x_i)^2).
    """
    if n < 2:
        raise ValueError("GLL rule needs at least 2 points")
    if n == 2:
        return np.array([-1.0, 1.0]), np.array([1.0, 1.0])

    m = n - 1  # Legendre degree
    # Chebyshev-Gauss-Lobatto initial guess, then Newton on (1-x^2) P'_m(x).
    x = -np.cos(np.pi * np.arange(n) / m)
    P = np.zeros((n, n))
    for _ in range(100):
        # Legendre recurrence up to degree m at the current points.
        P[:, 0] = 1.0
        P[:, 1] = x
        for k in range(2, n):
            P[:, k] = ((2 * k - 1) * x * P[:, k - 1] - (k - 1) * P[:, k - 2]) / k
        # Newton update for interior points: roots of P'_m, written via the
        # equivalent fixed point for (x P_m - P_{m-1}) / (n P_m) update.
        x_old = x.copy()
        x = x_old - (x * P[:, m] - P[:, m - 1]) / (n * P[:, m])
        x[0], x[-1] = -1.0, 1.0
        if np.max(np.abs(x - x_old)) < 1e-15:
            break
    # Recompute P_{m} at the converged points for the weights.
    P[:, 0] = 1.0
    P[:, 1] = x
    for k in range(2, n):
        P[:, k] = ((2 * k - 1) * x * P[:, k - 1] - (k - 1) * P[:, k - 2]) / k
    w = 2.0 / (m * n * P[:, m] ** 2)
    return x, w


@functools.lru_cache(maxsize=None)
def gll_points_weights_01(n: int) -> tuple[np.ndarray, np.ndarray]:
    """GLL points/weights mapped to the unit interval [0, 1]."""
    x, w = gll_points_weights(n)
    return (x + 1.0) / 2.0, w / 2.0


def _barycentric_weights(pts: np.ndarray) -> np.ndarray:
    diff = pts[:, None] - pts[None, :]
    np.fill_diagonal(diff, 1.0)
    return 1.0 / np.prod(diff, axis=1)


@functools.lru_cache(maxsize=None)
def diff_matrix(n: int) -> np.ndarray:
    """Collocation differentiation matrix on [0, 1].

    D[q, i] = dl_i/dx evaluated at GLL point x_q, where l_i is the Lagrange
    polynomial through the ``n`` GLL points of [0, 1].
    """
    x, _ = gll_points_weights_01(n)
    bw = _barycentric_weights(x)
    D = np.zeros((n, n))
    for q in range(n):
        for i in range(n):
            if i != q:
                D[q, i] = bw[i] / bw[q] / (x[q] - x[i])
        D[q, q] = -np.sum(D[q, :])
    return D


def lagrange_eval(nodes: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Tabulate Lagrange basis through ``nodes`` at ``pts``: out[p, i] = l_i(pts[p])."""
    nodes = np.asarray(nodes, dtype=np.float64)
    pts = np.atleast_1d(np.asarray(pts, dtype=np.float64))
    bw = _barycentric_weights(nodes)
    out = np.zeros((len(pts), len(nodes)))
    for p, xp in enumerate(pts):
        d = xp - nodes
        onnode = np.isclose(d, 0.0, atol=1e-14)
        if onnode.any():
            out[p, np.argmax(onnode)] = 1.0
        else:
            t = bw / d
            out[p] = t / np.sum(t)
    return out


def lagrange_eval_gll(n: int, pts: np.ndarray) -> np.ndarray:
    """Tabulate the n-point GLL Lagrange basis of [0, 1] at ``pts``."""
    x, _ = gll_points_weights_01(n)
    return lagrange_eval(x, pts)
