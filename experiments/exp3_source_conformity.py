"""exp3 — conforming vs non-conforming spatial source window (reference
``python/experiments/exp3``): a window aligned with element boundaries vs
one cutting through elements; the non-conforming source excites Gibbs
artifacts in the near field."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # x64 physics validation
    jax.config.update("jax_enable_x64", True)
    from fenicsxfus_tpu import create_rectangle, tag_boundaries
    from fenicsxfus_tpu.models.experimental import LinearSpectralS2, heaviside_window

    f0, c0, rho0 = 10.0, 1.0, 1.0
    L, W = 1.0, 1.0
    ny = 10
    hy = W / ny
    mesh0 = create_rectangle((10, ny), (0, -W / 2), (L, W / 2))
    tag_boundaries(mesh0, {1: lambda x: x[0] < 1e-12}, default=2)
    dt = 0.5 * (L / 10) / (c0 * 16)
    for b, label in [(2 * hy, "conforming (2 cells)"), (2.5 * hy, "non-conforming (2.5 cells)")]:
        mesh = create_rectangle((10, ny), (0, -W / 2), (L, W / 2))
        tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12}, default=2)
        eqn = LinearSpectralS2(
            mesh, None, 4, c0, rho0, f0, 1.0, c0,
            source_profile=heaviside_window(-b, b, axis=1), dtype=jnp.float64,
        )
        eqn.init()
        u, v, tf = eqn.rk4(0.0, 0.5, dt)
        print(f"{label}: max|u| = {float(jnp.max(jnp.abs(u))):.4f}")


if __name__ == "__main__":
    main()
