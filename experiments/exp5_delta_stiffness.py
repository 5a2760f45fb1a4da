"""exp5 — stiffness of the lossy system vs δ magnitude (reference
``python/experiments/exp5``): the diffusive term δ∇²(u_t) adds an
O(δ/h²)-scaled eigenvalue, shrinking the stable explicit dt as δ grows."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # x64 physics validation
    jax.config.update("jax_enable_x64", True)
    from fenicsxfus_tpu import LossySpectralExplicit, create_interval, tag_boundaries

    f0, c0, rho0, L = 10.0, 1.0, 1.0, 1.0
    degree, epw = 4, 4
    nx = int(epw * L * f0 / c0 + 1)
    mesh = create_interval(nx, 0, L)
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12})
    h = L / nx
    dt0 = 0.9 * h / (c0 * degree**2)
    print(f"{'delta':>10} {'dt/dt0 stable':>14}")
    for delta in [0.0, 2e-3, 2e-2, 8e-2]:
        stable_frac = None
        for frac in [1.0, 0.5, 0.25, 0.125, 0.0625]:
            eqn = LossySpectralExplicit(
                mesh, None, degree, c0, rho0, delta, f0, 1.0, c0, 4, frac * dt0,
                dtype=jnp.float64,
            )
            eqn.init()
            u, v, tf = eqn.rk(0.0, 0.8)
            if bool(jnp.all(jnp.isfinite(u))) and float(jnp.max(jnp.abs(u))) < 100:
                stable_frac = frac
                break
        print(f"{delta:10.1e} {stable_frac if stable_frac else '<0.0625':>14}")


if __name__ == "__main__":
    main()
