"""2D lossy planar-transducer problem, implicit SDIRK.

Reference ``python/examples/lossy_planar2d_1_imp``: strong-attenuation wave
equation marched with SDIRK + matrix-free CG/Jacobi (reference KSP CG,
``_lossy.py:297-628``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4, rk_order=2):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LossySpectralImplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        tag_boundaries,
    )

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    alpha_dB = 100.0
    delta0 = compute_diffusivity_of_sound(2 * np.pi * f0, c0, alpha_dB)
    L = 0.12
    a = 0.01
    lmbda = c0 / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_rectangle((nx, nx), (0, -L / 2), (L, L / 2))
    eps = 1e-9
    tag_boundaries(mesh, {
        1: lambda x: (x[0] < eps) & (np.abs(x[1]) <= a),
        2: lambda x: (x[0] > L - eps) | (np.abs(x[1]) > L / 2 - eps),
    })
    h = L / nx
    # implicit: accuracy-limited step, 4x the explicit CFL
    dt_cfl = 4.0 * 0.9 * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl + 1)
    dt = 1 / f0 / spp
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LossySpectralImplicit(
        mesh, None, degree, c0, rho0, delta0, f0, p0, c0, rk_order, dt,
        dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.dirk(0.0, L / c0 + 4.0 / f0)
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, "
          f"max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa, "
          f"CG worst {eqn.cg_stats['max_iterations']} iters "
          f"(final ||r||^2 {eqn.cg_stats['max_residual2']:.2e})")


if __name__ == "__main__":
    main()
