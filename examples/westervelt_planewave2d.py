"""2D Westervelt planewave (reference ``python/examples/westervelt_planewave2d_1_exp``):
finite-amplitude nonlinear steepening with attenuation."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=8, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        WesterveltSpectralExplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        tag_boundaries,
    )

    f0, p0 = 1e6, 1e6  # strong drive -> visible nonlinearity
    c0, rho0, beta0 = 1500.0, 1000.0, 3.5
    delta0 = compute_diffusivity_of_sound(2 * np.pi * f0, c0, 2.0)
    L = 0.06
    nx = int(epw * L * f0 / c0 + 1)
    mesh = create_rectangle((nx, max(nx // 8, 2)), (0, 0), (L, L / 8))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9}
    )
    h = L / nx
    dt = 0.25 * h / (c0 * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
        dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c0 + 4.0 / f0)
    print(f"max|u| = {float(jnp.max(jnp.abs(u))):.3e} Pa")


if __name__ == "__main__":
    main()
