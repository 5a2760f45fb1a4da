"""2D planewave with a sponge-layer absorber pad
(reference ``python/examples/linear_planewave2d_2``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(epw=4, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralSponge, create_rectangle, tag_boundaries

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    L, pad = 0.12, 0.03  # domain + sponge pad
    nx = int(epw * (L + pad) * f0 / c0 + 1)
    ny = int(epw * L * f0 / c0 + 1)
    mesh = create_rectangle((nx, ny), (0, 0), (L + pad, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    h = (L + pad) / nx
    dt = 0.25 * h / (c0 * degree**2)
    delta0 = 2 * c0 / (2 * 3.14159265 * f0) * 8.0
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralSponge(
        mesh, None, degree, c0, rho0, delta0, f0, p0, c0, sponge_start=L,
        dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk4(0.0, (L + pad) / c0 + 2.0 / f0, dt)
    print(f"max|u| = {float(jnp.max(jnp.abs(u))):.3e}")


if __name__ == "__main__":
    main()
