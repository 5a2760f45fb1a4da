"""Setup-phase timings: mesh → geometry precompute → assembled vectors.

Reference analogue: ``cpp/*/experiments/measure_vector_assembly_speed``
(m0/m1/b0 term-by-term). In this design the mass diagonal, facet vectors
and packed stiffness coefficients are assembled ONCE at setup (host side)
— the per-stage reassembly the reference times is fused into the device
kernels — so what matters operationally is the one-time setup cost at
production size. The native C++ geometry kernel (``native/geometry.cpp``)
streams detJ·w / packed-G for ≥20k cells.

Run:  python benchmarks/setup_speed.py [--nx 104] [--degree 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=104, degree=4):
    import numpy as np

    t = {}

    def clock(name):
        t[name] = time.perf_counter()

    clock("t0")
    from fenicsxfus_tpu import create_box, tag_boundaries
    from fenicsxfus_tpu.ops.operators import SEMOperators

    L = 0.12
    clock("imports")
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    clock("mesh")
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9})
    clock("tags")
    import jax.numpy as jnp

    ops = SEMOperators(mesh, degree, dtype=jnp.float32)
    clock("operators")  # includes geometry precompute + dofmap + lattice
    m = ops.assemble_diag(1.0)
    clock("mass_diag")
    src = ops.facet_vector(1, 1.0)
    abc = ops.facet_vector(2, 1.0)
    clock("facet_vectors")
    coeff = ops.stiff_coeff(1.0)
    clock("stiff_coeff")

    n = ops.ndofs
    names = ["imports", "mesh", "tags", "operators", "mass_diag",
             "facet_vectors", "stiff_coeff"]
    print(f"setup timings, 3D p={degree}, {nx}^3 cells, {n/1e6:.1f}M DOF "
          f"({mesh.num_cells/1e3:.0f}k cells)")
    prev = "t0"
    total = 0.0
    for name in names:
        dt_s = t[name] - t[prev]
        total += dt_s
        print(f"  {name:>14}: {dt_s:8.2f} s")
        prev = name
    print(f"  {'TOTAL':>14}: {total:8.2f} s")
    assert np.all(np.isfinite(np.asarray(m)))
    assert float(jnp.max(src)) > 0 and float(jnp.max(abc)) > 0
    assert coeff is not None


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=104)
    ap.add_argument("--degree", type=int, default=4)
    args = ap.parse_args()
    main(nx=args.nx, degree=args.degree)
