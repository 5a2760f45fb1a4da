"""2D lossy planewave, implicit SDIRK.

Reference ``python/examples/lossy_planewave2d_1_imp``: viscous wave with the
δ-augmented LHS solved per stage with matrix-free CG+Jacobi
(``_lossy.py:297-628``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(epw=4, degree=4, rk_order=2, out="lossy_planewave2d_imp"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LossySpectralImplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        tag_boundaries,
    )
    from fenicsxfus_tpu.io.xdmf import save_field_npz

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    alpha_dB = 100.0
    w0 = 2.0 * 3.141592653589793 * f0
    import numpy as np

    delta0 = compute_diffusivity_of_sound(w0, c0, alpha_dB)
    L = 0.12
    lmbda = c0 / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_rectangle((nx, nx), (0, 0), (L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    h = L / nx
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
    tend = L / c0 + 4.0 / f0
    u, v, tf = eqn.dirk(0.0, tend)
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, "
          f"max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa, "
          f"CG worst {eqn.cg_stats['max_iterations']} iters")
    save_field_npz(f"{out}.npz", eqn.ops, {"u": u}, t=tf)
    print(f"wrote {out}.npz")


if __name__ == "__main__":
    main()
