"""PH1 SC1-BM1: transcranial-ultrasound intercomparison, scenario 1, BM1.

Reference: ``cpp/fenicsx-sf-naive/benchmarks/PH1/SC1-BM1/main.cpp`` — the
Aubry et al. benchmark (0.5 MHz, 60 kPa, water-only, 0.12 m cube, p=4,
linear wave, circular piston source of 2 cm diameter on the x=0 face,
first-order ABC elsewhere). The reference reads a pre-built mesh whose tag-1
facets form the piston disc; here the disc is a nodal source window on a
structured hex box.

Run:  python benchmarks/ph1_sc1_bm1.py [--nx 60] [--periods 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


# persistent XLA compilation cache (big Mosaic programs compile slowly)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main(nx=60, periods=2.0):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import create_box, eval_function, tag_boundaries
    from fenicsxfus_tpu.models.experimental import LinearSpectralS2

    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    L = 0.12
    degree = 4
    a_src = 0.01  # piston radius (2 cm diameter)

    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-9}, default=2
    )

    def piston(x):
        r2 = (x[1] - L / 2) ** 2 + (x[2] - L / 2) ** 2
        return np.where(x[0] < 1e-9, np.where(r2 <= a_src**2, 1.0, 0.0), 0.0)

    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    eqn = LinearSpectralS2(
        mesh, None, degree, c0, rho0, f0, p0, c0, source_profile=piston,
        dtype=dtype,
    )
    eqn.init()
    tend = periods * L / c0  # enough for the front to cross (+ reflections out)
    t0 = time.perf_counter()
    u, v, tf = eqn.rk4(0.0, tend, dt)
    elapsed = time.perf_counter() - t0
    n = eqn.number_of_dofs()
    nsteps = int(np.ceil(tend / dt))
    print(
        f"PH1 SC1-BM1: {n/1e6:.1f}M DOF p={degree}, {nsteps} steps: "
        f"{elapsed:.1f} s ({n*nsteps/elapsed/1e9:.3f} GDOF-steps/s)"
    )
    # axial pressure profile through the focus line
    xs = np.linspace(0.005, L - 0.005, 24)
    pts = np.stack([xs, np.full_like(xs, L / 2), np.full_like(xs, L / 2)])
    p_pts, vals = eval_function(eqn.ops, u, pts)
    print("axial pressure (Pa) at t=%.2e:" % tf)
    for x, val in zip(xs, vals):
        print(f"  x={x:7.4f}  p={val:12.1f}")
    assert np.all(np.isfinite(vals))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=60)
    ap.add_argument("--periods", type=float, default=2.0)
    main(**vars(ap.parse_args()))
