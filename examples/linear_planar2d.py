"""2D linear planar-transducer problem, explicit RK.

Reference ``python/examples/linear_planar2d_1_exp``: a finite-width
transducer strip on the x=0 boundary (the rest of that face is a rigid
baffle), Sommerfeld ABC on the remaining faces. Writes a field movie
(temporal XDMF, the reference's VTX ``.bp`` analogue)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4, out="linear_planar2d"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_rectangle, tag_boundaries
    from fenicsxfus_tpu.io.xdmf import write_movie

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    L = 0.12
    a = 0.01  # transducer half-width (m)
    lmbda = c0 / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_rectangle((nx, nx), (0, -L / 2), (L, L / 2))
    eps = 1e-9

    def src(x):
        return (x[0] < eps) & (np.abs(x[1]) <= a)

    def abc(x):
        return (x[0] > L - eps) | (np.abs(x[1]) > L / 2 - eps)

    tag_boundaries(mesh, {1: src, 2: abc})
    h = L / nx
    dt_cfl = 0.9 * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl + 1)
    dt = 1 / f0 / spp
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
    )
    eqn.init()
    tend = L / c0 + 4.0 / f0
    times = write_movie(eqn, 0.0, tend, f"{out}.xdmf", n_frames=16,
                        name="pressure")
    print(f"DOFs {eqn.number_of_dofs()}, {len(times)} frames to t={eqn.t:.3e}, "
          f"max|u| = {float(jnp.max(jnp.abs(eqn.u_n))):.1f} Pa")
    print(f"wrote {out}.xdmf / {out}.h5")


if __name__ == "__main__":
    main()
