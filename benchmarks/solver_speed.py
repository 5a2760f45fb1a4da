"""End-to-end solver throughput (the ``measure_solver_speed`` analogue).

Reference: ``cpp/*/experiments/measure_solver_speed`` — 3D linear p=4,
70.9M DOF, 101 and 201 RK4 steps; best reference 58.6 s / 117.2 s on a
76-process Icelake node. This driver is `bench.py` parameterized (problem
size, steps, model).

Run:  python benchmarks/solver_speed.py [--nx 104] [--steps 101] [--model westervelt]
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


def main(nx=104, steps=101, model="linear"):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        LinearSpectralExplicit,
        LossySpectralExplicit,
        WesterveltSpectralExplicit,
        compute_diffusivity_of_sound,
        create_box,
        tag_boundaries,
    )

    c0, rho0, f0, p0, L = 1500.0, 1000.0, 0.5e6, 6e4, 0.12
    degree = 4
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9})
    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)
    delta0 = compute_diffusivity_of_sound(2 * np.pi * f0, c0, 0.3)
    if model == "linear":
        eqn = LinearSpectralExplicit(
            mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
        )
    elif model == "lossy":
        eqn = LossySpectralExplicit(
            mesh, None, degree, c0, rho0, delta0, f0, p0, c0, 4, dt,
            dtype=jnp.float32,
        )
    else:
        eqn = WesterveltSpectralExplicit(
            mesh, None, degree, c0, rho0, delta0, 3.5, f0, p0, c0, 4, dt,
            dtype=jnp.float32,
        )
    eqn.init()
    eqn._build()
    n = eqn.number_of_dofs()
    # warm up (compile), then time
    u, v, _ = eqn._solve(eqn.consts, eqn.u_n, eqn.v_n, 0.0, steps * dt, dt)
    _ = float(jnp.sum(u))
    t0 = time.perf_counter()
    u, v, tf = eqn._solve(eqn.consts, eqn.u_n, eqn.v_n, 0.0, steps * dt, dt)
    _ = float(jnp.sum(jnp.abs(u)))
    elapsed = time.perf_counter() - t0
    print(
        f"{model}: {n/1e6:.1f}M DOF, {steps} RK4 steps: {elapsed:.2f} s "
        f"({elapsed/steps*1e3:.1f} ms/step, "
        f"{n*steps/elapsed/1e9:.3f} GDOF-steps/s)"
    )
    print(
        f"reference best (sf-naive, 76-proc node, 70.9M/101): 58.6 s "
        f"= 0.122 GDOF-steps/s"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=104)
    ap.add_argument("--steps", type=int, default=101)
    ap.add_argument("--model", default="linear",
                    choices=["linear", "lossy", "westervelt"])
    main(**vars(ap.parse_args()))
