"""Single-operator apply timings across degrees at fixed DOF count.

Reference: ``cpp/fenicsx-sf/experiments/measure_fraction_of_peak_performance``
— min-over-runs stiffness/mass apply at ~38.3M DOF for p = 2..6; best
reference numbers 17-29 ms (stiffness) / 5-7 ms (mass) on a 76-process
Icelake node (BASELINE.md). Here: one TPU chip, fused pallas stiffness
(const + heterogeneous DG-0 coefficient) and the (pointwise-diagonal) mass.

Timing methodology: the cost of ONE apply is extracted as the slope between
rep-10 and rep-20 ``fori_loop`` chains. A naive single chain overstates the
kernel by ~3 ms: XLA copies custom-call outputs into the loop carry, and
XLA-compiled elementwise passes only sustain ~93 GB/s on this chip (vs
~370 GB/s for pallas DMA) — the copy is NOT part of the operator. The
operator is spectrally normalised (coeff = 1/ρ(K)) so chained applies
neither overflow nor underflow.

Run:  python benchmarks/operator_speed.py [--dofs 38.3e6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(dofs=38.3e6, degrees=(2, 3, 4, 5, 6)):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenicsxfus_tpu import create_box
    from fenicsxfus_tpu.ops.operators import SEMOperators

    def timeit(f, x, n=3):
        y = f(x)
        _ = float(jnp.sum(y))
        best = 1e9
        for _i in range(n):
            t0 = time.perf_counter()
            y = f(x)
            _ = float(jnp.sum(y))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain(f, rep):
        return jax.jit(
            lambda x0: jax.lax.fori_loop(0, rep, lambda i, y: f(y), x0)
        )

    def slope(f, x):
        return (timeit(chain(f, 20), x) - timeit(chain(f, 10), x)) / 10

    print(
        f"{'p':>2} {'DOFs':>10} {'stiff':>9} {'stiff-het':>10} {'mass':>9} "
        f"{'GDOF/s (K)':>11}"
    )
    for degree in degrees:
        nx = max(int(round(dofs ** (1 / 3) / degree)), 2)
        mesh = create_box((nx, nx, nx), (0, 0, 0), (0.12, 0.12, 0.12))
        ops = SEMOperators(mesh, degree, dtype=jnp.float32)
        pk = ops.pallas2
        n = ops.ndofs
        x = jax.random.normal(jax.random.PRNGKey(0), ops.lattice.gdims, jnp.float32)
        # spectral normalisation so 40 chained applies stay O(1)
        y1 = pk.apply([x], [pk.pack_const(1.0)])
        r = float(jnp.max(jnp.abs(y1)) / jnp.max(jnp.abs(x)))
        Fc = pk.pack_const(1.0 / r)
        het = (1.0 / r) * (1.0 + 0.3 * np.sin(np.arange(mesh.num_cells)))
        Fh = pk.pack_field(het)
        m = ops.assemble_diag(1.0)
        minv = (1.0 / m).reshape(ops.lattice.gdims)

        ts = slope(lambda y: pk.apply([y], [Fc]), x)
        th = slope(lambda y: pk.apply([y], [Fh]), x)
        tm = slope(lambda y: y * minv, x)
        print(
            f"{degree:>2} {n/1e6:9.1f}M {ts*1e3:8.2f}m {th*1e3:9.2f}m "
            f"{tm*1e3:8.2f}m {n/ts/1e9:11.2f}"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dofs", type=float, default=38.3e6)
    ap.add_argument("--degrees", type=str, default="2,3,4,5,6")
    args = ap.parse_args()
    main(dofs=args.dofs, degrees=tuple(int(x) for x in args.degrees.split(",")))
