"""3D linear planewave on a hex box (the flagship problem family;
cf. reference ``cpp/fenicsx-sf-naive/examples/linear_planewave3d_*``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=32, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    L = 0.12
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c0 + 2.0 / f0)
    print(f"{eqn.number_of_dofs()/1e6:.1f}M DOFs, max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa")


if __name__ == "__main__":
    main()
