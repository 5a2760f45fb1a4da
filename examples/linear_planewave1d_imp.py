"""1D linear planewave, SDIRK implicit (reference
``python/examples/linear_planewave1d_1_imp``): same problem as
``linear_planewave1d.py`` but integrated with the implicit solver at a dt
above the explicit CFL limit."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=8, degree=4, rk=2):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralImplicit, create_interval, eval_function, tag_boundaries

    f0 = 0.5e6
    c0, rho0 = 1500.0, 1000.0
    p0 = rho0 * c0 * 0.04
    L = 0.12
    nx = int(epw * L * f0 / c0 + 1)
    mesh = create_interval(nx, 0.0, L)
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    dt = 1.0 / f0 / 20  # 20 steps/period, ~4x the explicit CFL dt
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralImplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, rk, dt, dtype=dtype
    )
    eqn.init()
    u, v, tf = eqn.dirk(0.0, L / c0 + 4.0 / f0)
    xs = np.linspace(0.0, L, 200)
    _, uu = eval_function(eqn.ops, u, xs[None, :])
    st = getattr(eqn, "cg_stats", None)
    extra = f", CG worst iters={st['max_iterations']}" if st else ""
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, "
          f"max|u| = {np.abs(uu).max():.1f} Pa{extra}")
    return xs, uu


if __name__ == "__main__":
    main()
