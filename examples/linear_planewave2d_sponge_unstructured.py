"""2D linear planewave on an unstructured mesh with a sponge-layer absorber.

Reference ``python/examples/linear_planewave2d_3``: committed unstructured
quad mesh, first-order Sommerfeld ABC plus a spatially-ramped δ(x) sponge
pad (``_experimental.py:715-984``). Reads the reference's own mesh.xdmf."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

MESH = "/root/reference/python/examples/linear_planewave2d_3/mesh.xdmf"


def main(degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import compute_diffusivity_of_sound
    from fenicsxfus_tpu.io.xdmf import read_mesh
    from fenicsxfus_tpu.models.experimental import LinearSpectralSponge

    if not os.path.exists(MESH):
        print("reference meshes not mounted; skipping")
        return
    mesh = read_mesh(MESH)
    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    delta0 = compute_diffusivity_of_sound(2.0 * np.pi * f0, c0, 1.0)
    L = 0.12
    h = mesh.h_min()
    dt_cfl = 0.4 * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl + 1)
    dt = 1 / f0 / spp
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralSponge(
        mesh, None, degree, c0, rho0, delta0, f0, p0, c0,
        sponge_start=L, dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk4(0.0, L / c0 + 4.0 / f0, dt)
    un = np.asarray(u)
    x = eqn.ops.space.dof_coords[:, 0]
    body = np.abs(un[x < L]).max()
    pad_end = np.abs(un[x > x.max() - 0.25 * (x.max() - L)]).max()
    print(f"DOFs {eqn.number_of_dofs()} (unstructured, {mesh.num_cells} cells): "
          f"max|u| body {body:.1f} Pa, sponge tail {pad_end:.1f} Pa (absorbed)")


if __name__ == "__main__":
    main()
