"""1D Westervelt planewave (reference
``python/examples/westervelt_planewave1d_1_exp``): 1 MHz, 125 kPa drive in
water — the domain spans ~0.86 shock-formation distances, so the waveform
steepens visibly; compare against the Fubini series in the lossless limit."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=3, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        WesterveltSpectralExplicit,
        compute_diffusivity_of_sound,
        create_interval,
        eval_function,
        tag_boundaries,
    )

    f0, p0 = 1e6, 125000.0
    c0, rho0 = 1482.32, 998.2
    beta0, alphadB = 3.5, 2.0
    w0 = 2 * np.pi * f0
    delta0 = compute_diffusivity_of_sound(w0, c0, alphadB)
    L = 0.12
    xsh = rho0 * c0**3 / beta0 / p0 / w0  # shock formation distance
    # steepened harmonics need extra resolution: resolve ~10 harmonics of
    # content at epw elements per (fundamental) wavelength / 4 harmonics
    nx = int(10 * epw * L * f0 / c0 / 4 + 1)
    mesh = create_interval(nx, 0.0, L)
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    h = L / nx
    dt = 0.45 * h / (c0 * degree**2)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
        dtype=dtype,
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c0 + 4.0 / f0)
    xs = np.linspace(0.0, L, 400)
    _, uu = eval_function(eqn.ops, u, xs[None, :])
    print(f"DOFs {eqn.number_of_dofs()}, L/x_sh = {L / xsh:.2f}, "
          f"max|u| = {np.abs(uu).max():.0f} Pa (p0 = {p0:.0f}; "
          f"steepening raises the peak above p0)")
    return xs, uu


if __name__ == "__main__":
    main()
