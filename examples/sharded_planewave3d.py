"""Multi-device 3D planewave via slab domain decomposition
(the MPI-scaling analogue; run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual mesh, or on a real multi-chip TPU slice)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=16, degree=3):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries
    from fenicsxfus_tpu.parallel.slab import ShardedExplicitSolver

    ndev = len(jax.devices())
    f0, p0, c0, rho0 = 0.5e6, 60000.0, 1500.0, 1000.0
    L = 0.12
    nx = (nx // ndev) * ndev or ndev
    mesh = create_box((nx, nx // 2 or 1, nx // 2 or 1), (0, 0, 0), (L, L / 2, L / 2))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    dt = 0.9 * (L / nx) / (c0 * degree**2)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    )
    eqn.init()
    solver = ShardedExplicitSolver(eqn, ndev=ndev)
    u, v, tf = solver.rk(0.0, 0.3 * L / c0)
    print(f"{ndev} devices, {eqn.number_of_dofs()} DOFs, max|u| = {float(jnp.max(jnp.abs(u))):.1f}")


if __name__ == "__main__":
    main()
