"""2D linear planewave (reference ``python/examples/linear_planewave2d_1_exp``):
0.5 MHz planewave in a 0.12 m square, p=4 GLL, RK4 explicit, source on x=0
(tag 1), Sommerfeld ABC elsewhere (tag 2). Writes an XDMF snapshot."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4, out="linear_planewave2d"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_rectangle, tag_boundaries
    from fenicsxfus_tpu.io.xdmf import save_field_npz, write_xdmf_field

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    L = 0.12
    lmbda = c0 / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_rectangle((nx, nx), (0, 0), (L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    h = L / nx
    dt_cfl = 0.9 * h / (c0 * degree**2)
    steps_per_period = int(1 / f0 / dt_cfl + 1)
    dt = 1 / f0 / steps_per_period  # integer steps per period (reference :70-72)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
    )
    eqn.init()
    tend = L / c0 + 4.0 / f0
    u, v, tf = eqn.rk(0.0, tend)
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa")
    save_field_npz(f"{out}.npz", eqn.ops, {"u": u}, t=tf)
    write_xdmf_field(f"{out}.xdmf", eqn.ops, u, name="pressure")
    print(f"wrote {out}.npz / {out}.xdmf")


if __name__ == "__main__":
    main()
