"""2D heterogeneous (water|bone) lossy planar problem.

Reference ``python/examples/lossy_planar2d_4_exp``: two-medium DG-0 material
fields set from cell regions — water for x < x_interface, cortical-bone-like
parameters beyond."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LossySpectralExplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        tag_boundaries,
    )
    from fenicsxfus_tpu.core.mesh import facet_midpoints

    f0, p0 = 0.5e6, 60000.0
    c_water, rho_water = 1500.0, 1000.0
    c_bone, rho_bone = 2800.0, 1850.0
    alpha_bone_dB = 400.0
    L = 0.12
    x_int = 0.06
    nx = int(epw * L * f0 / c_water + 1)
    mesh = create_rectangle((nx, nx), (0, 0), (L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    # DG0 material fields from cell midpoints (the reference sets them from
    # cell tags; midpoint classification is equivalent for this geometry)
    mids = mesh.cell_vertices().mean(axis=1)
    bone = mids[:, 0] >= x_int
    c0 = np.where(bone, c_bone, c_water)
    rho0 = np.where(bone, rho_bone, rho_water)
    delta0 = np.where(
        bone,
        compute_diffusivity_of_sound(2 * np.pi * f0, c_bone, alpha_bone_dB),
        0.0,
    )
    h = L / nx
    dt = 0.35 * h / (c_bone * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LossySpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, f0, p0, c_water, 4, dt,
        dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c_water + 2.0 / f0)
    un = np.asarray(u)
    coords = eqn.ops.space.dof_coords
    in_bone = np.abs(un[coords[:, 0] > x_int + 0.01]).max()
    in_water = np.abs(un[coords[:, 0] < x_int - 0.01]).max()
    print(f"max|u| water: {in_water:.1f} Pa, bone: {in_bone:.1f} Pa (attenuated)")


if __name__ == "__main__":
    main()
