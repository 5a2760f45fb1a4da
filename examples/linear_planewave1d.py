"""1D linear planewave, explicit RK (reference
``python/examples/linear_planewave1d_1_exp`` and, with ``--hetero``, the
two-medium ``linear_planewave1d_2_exp``): 0.5 MHz source on x=0 (tag 1),
Sommerfeld ABC at x=L (tag 2)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(epw=8, degree=4, rk=2, hetero=False):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LinearSpectralExplicit,
        create_interval,
        eval_function,
        tag_boundaries,
    )

    f0 = 0.5e6
    c_w, rho_w = 1500.0, 1000.0
    p0 = rho_w * c_w * 0.04  # velocity amplitude 0.04 m/s (reference :35-37)
    L = 0.12
    nx = int(epw * L * f0 / c_w + 1)
    mesh = create_interval(nx, 0.0, L)
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9}, default=2)
    if hetero:  # water | bone split at L/2 (reference *_2_exp variant)
        mids = mesh.cell_vertices().mean(axis=1)
        bone = mids[:, 0] >= L / 2
        c0 = np.where(bone, 2800.0, c_w)
        rho0 = np.where(bone, 1850.0, rho_w)
        c_max = 2800.0
    else:
        c0, rho0, c_max = c_w, rho_w, c_w
    h = L / nx
    dt = 0.1 * h / (c_max * degree**2)  # reference CFL=0.1 for the RK2 pair
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c_w, rk, dt, dtype=dtype
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, L / c_w + 4.0 / f0)
    xs = np.linspace(0.0, L, 200)
    _, uu = eval_function(eqn.ops, u, xs[None, :])
    print(f"DOFs {eqn.number_of_dofs()}, t={tf:.3e}, "
          f"max|u| = {np.abs(uu).max():.1f} Pa"
          + (" (heterogeneous water|bone)" if hetero else ""))
    return xs, uu


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hetero", action="store_true")
    ap.add_argument("--epw", type=int, default=8)
    ap.add_argument("--degree", type=int, default=4)
    a = ap.parse_args()
    main(epw=a.epw, degree=a.degree, hetero=a.hetero)
