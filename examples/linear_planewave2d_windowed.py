"""2D linear planewave with a spatially-windowed source s(x)·g(t).

Reference ``python/examples/linear_planewave2d_5``: the source is active only
on a window of the x=0 boundary (Heaviside profile), driven through the
``LinearSpectralS2`` model (reference ``_experimental.py:254-540``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4, window="heaviside"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import create_rectangle, tag_boundaries
    from fenicsxfus_tpu.models.experimental import (
        LinearSpectralS2,
        heaviside_window,
        tukey_window,
    )

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    L = 0.12
    a = 0.011  # half-width of the active source strip
    lmbda = c0 / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_rectangle((nx, nx), (0, -L / 2), (L, L / 2))
    eps = 1e-9
    tag_boundaries(mesh, {1: lambda x: x[0] < eps}, default=2)
    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    profile = {
        "heaviside": heaviside_window(-a, a, axis=1),
        "tukey": tukey_window(a / 2, a, axis=1),
    }[window]
    eqn = LinearSpectralS2(
        mesh, None, degree, c0, rho0, f0, p0, c0,
        source_profile=profile, dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk4(0.0, L / c0 + 4.0 / f0, dt)
    un = np.asarray(u)
    coords = eqn.ops.space.dof_coords
    on_axis = np.abs(un[np.abs(coords[:, 1]) < a / 2]).max()
    off_axis = np.abs(un[np.abs(coords[:, 1]) > L / 3]).max()
    print(f"DOFs {eqn.number_of_dofs()}: max|u| on-axis {on_axis:.1f} Pa, "
          f"far off-axis {off_axis:.1f} Pa (windowed beam)")


if __name__ == "__main__":
    main()
