"""1D linear planewave with Newmark-β time stepping.

Reference ``python/examples/linear_planewave1d_1_newmark``
(``_experimental.py:13-251``): γ=1/2, β=1/4 with a matrix-free CG solve per
step; compares against the analytical traveling wave."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralNewmark, create_interval, tag_boundaries
    from fenicsxfus_tpu.analysis.analytical import planewave
    from fenicsxfus_tpu.analysis.error import relative_l2_error

    jax.config.update("jax_enable_x64", True)
    f0, p0 = 10.0, 1.0
    c0, rho0 = 1.0, 1.0
    L = 1.0
    lmbda = c0 / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_interval(nx, 0.0, L)
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )
    h = L / nx
    dt = 0.5 * h / (c0 * degree**2)
    eqn = LinearSpectralNewmark(
        mesh, None, degree, c0, rho0, f0, p0, c0, dt, dtype=jnp.float64
    )
    eqn.init()
    tend = L / c0 + 4.0 / f0
    u, v, w, tf = eqn.newmark(0.0, tend)
    err = relative_l2_error(
        eqn.ops, u, lambda x: planewave(x[0], tf, c0, f0, p0)
    )
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.4f}, "
          f"rel L2 vs analytical = {float(err):.3e}")
    assert err < 5e-2


if __name__ == "__main__":
    main()
