"""Unit tests for the 1D GLL building blocks."""

import numpy as np
import pytest

from fenicsxfus_tpu.core.gll import (
    diff_matrix,
    gll_points_weights,
    gll_points_weights_01,
    lagrange_eval_gll,
)


@pytest.mark.parametrize("n", range(2, 12))
def test_weights_sum(n):
    x, w = gll_points_weights(n)
    assert abs(np.sum(w) - 2.0) < 1e-13
    assert abs(x[0] + 1) < 1e-15 and abs(x[-1] - 1) < 1e-15
    assert np.all(np.diff(x) > 0)


@pytest.mark.parametrize("n", range(2, 10))
def test_quadrature_exactness(n):
    # GLL with n points integrates polynomials up to degree 2n-3 exactly.
    x, w = gll_points_weights(n)
    for k in range(0, 2 * n - 2):
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        assert abs(np.dot(w, x**k) - exact) < 1e-12, (n, k)


def test_known_values_n4():
    # Known GLL points for n=4: ±1, ±1/sqrt(5); weights 1/6, 5/6.
    x, w = gll_points_weights(4)
    assert np.allclose(x, [-1, -1 / np.sqrt(5), 1 / np.sqrt(5), 1], atol=1e-14)
    assert np.allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-14)


@pytest.mark.parametrize("n", range(2, 10))
def test_diff_matrix(n):
    # D applied to nodal values of x^k gives k x^{k-1} for k < n.
    x, _ = gll_points_weights_01(n)
    D = diff_matrix(n)
    for k in range(n):
        deriv = D @ (x**k)
        exact = k * x ** max(k - 1, 0) if k > 0 else np.zeros(n)
        assert np.allclose(deriv, exact, atol=1e-10), (n, k)


def test_lagrange_eval_partition_of_unity():
    tab = lagrange_eval_gll(6, np.linspace(0, 1, 33))
    assert np.allclose(tab.sum(axis=1), 1.0, atol=1e-12)
    # Kronecker at nodes
    x, _ = gll_points_weights_01(6)
    assert np.allclose(lagrange_eval_gll(6, x), np.eye(6), atol=1e-12)
