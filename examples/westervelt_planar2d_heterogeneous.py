"""2D Westervelt planar transducer through a bone layer (water|bone|water).

Reference ``python/examples/westervelt_planar2d_4_exp``: nonlinear propagation
with a cortical-bone slab at 0.03 m < x < 0.0365 m — DG-0 material fields
(c, rho, beta, delta) per region, explicit RK4."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=4, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        WesterveltSpectralExplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        tag_boundaries,
    )

    f0, p0 = 0.5e6, 60000.0
    w0 = 2 * np.pi * f0
    c_w, rho_w, beta_w, alpha_w = 1500.0, 1000.0, 100.0, 0.0
    c_b, rho_b, beta_b, alpha_b = 2800.0, 1850.0, 200.0, 400.0
    L = 0.12
    x_b0, x_b1 = 0.03, 0.0365  # bone slab (reference :36-41 region layout)
    a = 0.01
    lmbda = c_w / f0
    nx = int(epw * L / lmbda + 1)
    mesh = create_rectangle((nx, nx), (0, -L / 2), (L, L / 2))
    eps = 1e-9
    tag_boundaries(mesh, {
        1: lambda x: (x[0] < eps) & (np.abs(x[1]) <= a),
        2: lambda x: (x[0] > L - eps) | (np.abs(x[1]) > L / 2 - eps),
    })
    mids = mesh.cell_vertices().mean(axis=1)
    bone = (mids[:, 0] >= x_b0) & (mids[:, 0] <= x_b1)
    c0 = np.where(bone, c_b, c_w)
    rho0 = np.where(bone, rho_b, rho_w)
    beta0 = np.where(bone, beta_b, beta_w)
    delta0 = np.where(
        bone,
        compute_diffusivity_of_sound(w0, c_b, alpha_b),
        compute_diffusivity_of_sound(w0, c_w, alpha_w),
    )
    h = L / nx
    dt = 0.35 * h / (c_b * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c_w, 4, dt,
        dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c_w + 2.0 / f0)
    un = np.asarray(u)
    x = eqn.ops.space.dof_coords[:, 0]
    pre = np.abs(un[x < x_b0 - 0.005]).max()
    post = np.abs(un[x > x_b1 + 0.005]).max()
    print(f"DOFs {eqn.number_of_dofs()}: max|u| before bone {pre:.1f} Pa, "
          f"after {post:.1f} Pa (transmission loss through the slab)")


if __name__ == "__main__":
    main()
