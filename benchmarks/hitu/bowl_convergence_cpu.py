"""CPU h-convergence of the bowl-FITTED mesh vs the O'Neil axial solution.

The on-chip validation (tpu_queue_r3.sh step F1) runs H101/H131 at the
production 0.35/0.45 MHz; this CPU-sized companion runs H101 at a reduced
200 kHz so the whole sequence fits on the host, and demonstrates that the
curved-facet bowl mesh CONVERGES to O'Neil (1949) under h-refinement —
i.e. the remaining focal-gain error is discretisation, not geometry.

Committed artifacts (benchmarks/hitu/results/oneil_bowlmesh_cpu_nx*.npz):

    nx=20 (0.19M DOF): gain 7.55%  pos 6.75 mm  focal L2 36.3%
    nx=28 (0.48M DOF): gain 2.30%  pos 2.25 mm  focal L2  4.9%
    nx=36 (1.04M DOF): see run output / artifact meta

Reference counterpart: the reference validates its bowl source against
O'Neil in `cpp/fenicsx-sf-fastor/benchmarks/HITU/*/main.cpp` setups only
at production frequency on the cluster; there is no CPU-scale convergence
study there — this is additional evidence, not a parity item.

Usage:  python benchmarks/hitu/bowl_convergence_cpu.py [--nx 20 28 36]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import common  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, nargs="+", default=[20, 28, 36])
    ap.add_argument("--f0", type=float, default=200e3)
    args = ap.parse_args()
    rows = []
    for nx in args.nx:
        out = os.path.join(RESULTS, f"oneil_bowlmesh_cpu_nx{nx}.npz")
        g, p, l2 = common.validate_bowl_mesh(
            "H101", f0=args.f0, nx=nx, out=out, dtype=jnp.float64
        )
        rows.append((nx, g, p, l2))
    print("\nh-convergence (H101 bowl-fitted mesh, %.0f kHz):" % (args.f0 / 1e3))
    for nx, g, p, l2 in rows:
        print(f"  nx={nx:3d}: gain {g*100:5.2f}%  pos {p*1e3:5.2f} mm  "
              f"focal L2 {l2*100:5.2f}%")
