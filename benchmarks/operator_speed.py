"""Single-operator apply timings across degrees at fixed DOF count.

Reference: ``cpp/fenicsx-sf/experiments/measure_fraction_of_peak_performance``
— min-over-runs stiffness/mass apply at ~38.3M DOF for p = 2..6; best
reference numbers 17-29 ms (stiffness) / 5-7 ms (mass) on a 76-process
Icelake node (BASELINE.md). Here: one TPU chip, lattice/pallas stiffness and
the (pointwise-diagonal) mass.

Run:  python benchmarks/operator_speed.py [--dofs 38e6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(dofs=38.3e6):
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import create_box
    from fenicsxfus_tpu.analysis.timing import timeit_device
    from fenicsxfus_tpu.ops.operators import SEMOperators

    print(f"{'p':>2} {'DOFs':>10} {'stiffness':>12} {'mass':>10} {'GDOF/s (K)':>11}")
    for degree in [2, 3, 4, 5, 6]:
        nx = max(int(round(dofs ** (1 / 3) / degree)), 2)
        mesh = create_box((nx, nx, nx), (0, 0, 0), (0.12, 0.12, 0.12))
        ops = SEMOperators(mesh, degree, dtype=jnp.float32)
        n = ops.ndofs
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n,), jnp.float32)
        coeff = ops.stiff_coeff(1.0)
        m = ops.assemble_diag(1.0)
        # chain K applies inside one jit so the per-call relay sync (~20 ms
        # on this tunnel) amortizes; normalize to avoid overflow
        REP = 10

        def chain(f):
            def run(x0):
                return jax.lax.fori_loop(0, REP, lambda i, y: f(y) * 1e-2, x0)
            return jax.jit(run)

        stiff = chain(lambda y: ops.stiffness_apply([y], [coeff]))
        massmul = chain(lambda y: y * m)
        ts = timeit_device(f"stiffness p={degree}", stiff, x, n=3) / REP
        tm = timeit_device(f"mass p={degree}", massmul, x, n=3) / REP
        print(
            f"{degree:>2} {n/1e6:9.1f}M {ts*1e3:11.2f}m {tm*1e3:9.2f}m "
            f"{n/ts/1e9:11.2f}"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dofs", type=float, default=38.3e6)
    main(**vars(ap.parse_args()))
