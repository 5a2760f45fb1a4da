"""Profiler trace of the END-TO-END unstructured (blocked-path) solve.

Round-5 item (VERDICT r4 next #3): the unstructured/lattice end-to-end gap
widened to ~2.7x/DOF when the lattice path got the fused v3 stage + carry
fix.  Before building a fused stage for the blocked path, attribute where
the step time actually goes: blocked gather / contraction / blocked
scatter / elementwise (mass, facet, AXPY) / scan structure.

Runs the SAME distorted-box linear solve as the [P1] harness
(benchmarks/unstructured_solve.py) for a few steps under jax.profiler and
prints the largest device ops.

Run:  python benchmarks/unstructured_trace.py [--nx 24] [--steps 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from trace_profile import summarize_trace  # noqa: E402
from unstructured_solve import distorted_box  # noqa: E402


def main(nx, steps, degree=4):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit

    mesh = distorted_box(nx, degree)
    c0, rho0, f0, p0 = 1.5, 1.0, 10.0, 1.0
    dt = 0.4 * mesh.h_min() / (c0 * degree**2)
    model = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    )
    model.init()
    print(f"unstructured linear: nx={nx} p={degree} "
          f"{model.number_of_dofs()/1e6:.2f}M DOF, blocked="
          f"{os.environ.get('FUS_BLOCKED', 'v2')}")
    model._build()
    solve = model._solve
    consts, u, v = model.consts, model.u_n, model.v_n
    t0 = time.perf_counter()
    u, v, t = solve(consts, u, v, 0.0, steps * dt, dt)
    _ = float(jnp.sum(u))
    print(f"warmup (compile + run) {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    u, v, t = solve(consts, u, v, 0.0, steps * dt, dt)
    _ = float(jnp.sum(u))
    wall = time.perf_counter() - t0
    print(f"{steps} steps in {wall*1e3:.1f} ms -> "
          f"{wall/steps*1e3:.2f} ms/step, "
          f"{model.number_of_dofs()*steps/wall/1e9:.4f} GDOF-RK4-steps/s")

    tracedir = os.path.join("/tmp", f"fus_trace_unstructured_nx{nx}")
    try:
        with jax.profiler.trace(tracedir):
            u, v, t = solve(consts, u, v, 0.0, steps * dt, dt)
            _ = float(jnp.sum(u))
    except Exception as e:
        print(f"  profiler unavailable: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:150]}")
        return 0
    summarize_trace(tracedir, top=25)
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=24)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--degree", type=int, default=4)
    args = ap.parse_args()
    sys.exit(main(args.nx, args.steps, args.degree))
