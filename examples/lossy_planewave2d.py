"""2D lossy planewave (reference ``python/examples/lossy_planewave2d_1_exp``):
adds diffusivity-of-sound attenuation to the 2D planewave problem."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LossySpectralExplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        tag_boundaries,
    )

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    alpha_dB = 50.0
    delta0 = compute_diffusivity_of_sound(2 * np.pi * f0, c0, alpha_dB)
    L = 0.12
    nx = int(epw * L * f0 / c0 + 1)
    mesh = create_rectangle((nx, nx), (0, 0), (L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    h = L / nx
    dt = 0.5 * h / (c0 * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LossySpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, f0, p0, c0, 4, dt, dtype=dtype
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c0 + 4.0 / f0)
    print(f"max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa (attenuated from {p0:.0f})")


if __name__ == "__main__":
    main()
