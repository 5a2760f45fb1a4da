"""exp4 — temporal convergence of the RK integrators (reference
``python/experiments/exp4``): halve dt repeatedly and verify the observed
order matches the Butcher tableau order."""

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

    f0, c0, rho0, L = 10.0, 1.0, 1.0, 1.0
    degree, nx = 6, 21  # spatial error far below temporal
    mesh = create_interval(nx, 0, L)
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12})
    tend = 0.2
    # reference solution: tiny-dt RK4, computed once
    ref = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, 1.0, c0, 4, 2.5e-5, dtype=jnp.float64
    )
    ref.init()
    u_ref, _, _ = ref.rk(0.0, tend)

    for order in [1, 2, 3, 4]:
        errs = []
        dts = [4e-4 / 2**k for k in range(3)]
        for dt in dts:
            eqn = LinearSpectralExplicit(
                mesh, None, degree, c0, rho0, f0, 1.0, c0, order, dt,
                dtype=jnp.float64,
            )
            eqn.init()
            u, _, _ = eqn.rk(0.0, tend)
            errs.append(float(jnp.linalg.norm(u - u_ref) / jnp.linalg.norm(u_ref)))
        rates = [np.log2(errs[k] / errs[k + 1]) for k in range(len(errs) - 1)]
        print(f"RK{order}: errors {['%.2e' % e for e in errs]}, rates {['%.2f' % r for r in rates]}")


if __name__ == "__main__":
    main()
