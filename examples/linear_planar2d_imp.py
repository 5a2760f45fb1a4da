"""2D linear planar-transducer problem, implicit SDIRK.

Reference ``python/examples/linear_planar2d_1_imp``: same geometry as the
explicit driver, marched with 2-stage SDIRK and matrix-free CG+Jacobi
(reference KSP CG, ``_linear.py:644-647``); prints the surfaced CG stats."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4, rk_order=2, out="linear_planar2d_imp"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralImplicit, create_rectangle, tag_boundaries
    from fenicsxfus_tpu.io.xdmf import save_field_npz, write_xdmf_field

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
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
    # implicit: no CFL stability limit — step at 4x the explicit dt
    # (accuracy-limited, reference imp examples use larger steps too)
    dt_cfl = 4.0 * 0.9 * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl + 1)
    dt = 1 / f0 / spp
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralImplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, rk_order, dt, dtype=dtype
    )
    eqn.init()
    tend = L / c0 + 4.0 / f0
    u, v, tf = eqn.dirk(0.0, tend)
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, "
          f"max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa, "
          f"CG worst {eqn.cg_stats['max_iterations']} iters "
          f"(final ||r||^2 {eqn.cg_stats['max_residual2']:.2e})")
    save_field_npz(f"{out}.npz", eqn.ops, {"u": u}, t=tf)
    write_xdmf_field(f"{out}.xdmf", eqn.ops, u, name="pressure")
    print(f"wrote {out}.npz / {out}.xdmf")


if __name__ == "__main__":
    main()
