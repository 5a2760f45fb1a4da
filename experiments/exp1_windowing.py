"""exp1 — effect of the source ramp window (reference ``python/experiments/exp1``):
run the 1D linear problem with and without the 4-period cosine ramp and
compare the spurious startup transient (the window suppresses the broadband
onset)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # x64 physics validation
    jax.config.update("jax_enable_x64", True)
    from fenicsxfus_tpu import LinearSpectralExplicit, create_interval, tag_boundaries
    from fenicsxfus_tpu.analysis.analytical import planewave
    from fenicsxfus_tpu.analysis.error import relative_l2_error

    f0, c0, rho0, L = 10.0, 1.0, 1.0, 1.0
    degree, epw = 4, 4
    nx = int(epw * L * f0 / c0 + 1)
    mesh = create_interval(nx, 0, L)
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12})
    dt = 0.9 * (L / nx) / (c0 * degree**2)

    for alpha, label in [(4.0, "4-period ramp"), (0.02, "~no window")]:
        eqn = LinearSpectralExplicit(
            mesh, None, degree, c0, rho0, f0, 1.0, c0, 4, dt, dtype=jnp.float64
        )
        eqn.alpha = alpha
        eqn.consts["alpha"] = alpha
        eqn.init()
        u, v, tf = eqn.rk(0.0, L / c0 + 16.0 / f0)
        err = relative_l2_error(eqn.ops, u, lambda x: planewave(x[0], tf, c0, f0, 1.0))
        print(f"{label:>16}: rel L2 vs steady planewave = {err:.3e}")


if __name__ == "__main__":
    main()
