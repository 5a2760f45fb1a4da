"""Run directly on a committed reference mesh (XDMF/H5 read path;
reference driver ``python/examples/linear_planewave2d_1_exp``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MESH = "/root/reference/python/examples/linear_planewave2d_1_exp/mesh.xdmf"


def main():
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit
    from fenicsxfus_tpu.io.xdmf import read_mesh

    if not os.path.exists(MESH):
        print("reference meshes not mounted; skipping")
        return
    mesh = read_mesh(MESH)
    f0, p0, c0, rho0 = 0.5e6, 60000.0, 1500.0, 1000.0
    degree = 4
    dt = 0.9 * mesh.h_min() / (c0 * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, 0.12 / c0 + 4.0 / f0)
    print(f"{eqn.number_of_dofs()} DOFs on reference mesh; max|u| = {float(jnp.max(jnp.abs(u))):.1f} Pa")


if __name__ == "__main__":
    main()
