"""2D Westervelt planar-transducer problem, explicit RK.

Reference ``python/examples/westervelt_planar2d_1_exp``: nonlinear
propagation from a finite-width strip source — harmonic generation along
the beam axis."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=6, degree=4, out="westervelt_planar2d"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        WesterveltSpectralExplicit,
        compute_diffusivity_of_sound,
        create_rectangle,
        eval_function,
        tag_boundaries,
    )
    from fenicsxfus_tpu.io.xdmf import save_field_npz

    f0, p0 = 1.0e6, 1.0e6  # 1 MPa drive: visible nonlinearity in 0.12 m
    c0, rho0, beta0 = 1500.0, 1000.0, 3.5
    alpha_dB = 2.0
    w0 = 2.0 * np.pi * f0
    delta0 = compute_diffusivity_of_sound(w0, c0, alpha_dB)
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
    dt_cfl = 0.5 * h / (c0 * degree**2)
    spp = int(1 / f0 / dt_cfl + 1)
    dt = 1 / f0 / spp
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
        dtype=dtype,
    )
    eqn.init()
    tend = L / c0 + 4.0 / f0
    u, v, tf = eqn.rk(0.0, tend)
    # axial sensor profile
    xs = np.linspace(0.005, L - 0.005, 24)
    pts = np.stack([xs, np.zeros_like(xs)])
    _, vals = eval_function(eqn.ops, u, pts)
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, "
          f"max axial |p| = {float(np.max(np.abs(vals)))/1e6:.3f} MPa "
          f"(drive {p0/1e6:.1f} MPa)")
    save_field_npz(f"{out}.npz", eqn.ops, {"u": u}, t=tf)
    print(f"wrote {out}.npz")


if __name__ == "__main__":
    main()
