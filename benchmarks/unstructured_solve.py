"""END-TO-END solve benchmark on unstructured meshes (VERDICT r2 item 6).

The reference's production runs read unstructured meshes and time full
solves (``cpp/fenicsx-sf-naive/experiments/measure_solver_speed``); the
operator-apply harness (``unstructured_speed.py``) does not capture the
per-step AXPY/source/ABC overheads or the scan structure. This harness
times a full Westervelt RK4 solve on:

* a DISTORTED 3D box (vertex-jittered + scrambled numbering — exercises
  the blocked entity-class path exactly like a gmsh import), and
* the reference's committed 2D example mesh when present
  (``examples/meshes``/XDMF), read through ``io/xdmf.py``,

and reports GDOF-RK4-steps/s alongside the same problem on the uniform
lattice (the per-DOF gap the VERDICT tracks).

Run:  python benchmarks/unstructured_solve.py [--nx 24] [--degree 4] [--steps 60]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def distorted_box(nx, degree):
    """Vertex-jittered, vertex-scrambled box — topologically unstructured
    (no grid_shape), forcing the blocked conforming-mesh path."""
    from fenicsxfus_tpu import create_box, tag_boundaries
    from fenicsxfus_tpu.core.mesh import Mesh

    base = create_box((nx, nx, nx), (0, 0, 0), (1.0, 1.0, 1.0))
    rng = np.random.default_rng(0)
    verts = base.vertices.copy()
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    interior = np.all((verts > lo + 1e-12) & (verts < hi - 1e-12), axis=1)
    h = 1.0 / nx
    verts[interior] += 0.15 * h * (rng.random((int(interior.sum()), 3)) - 0.5)
    perm = rng.permutation(base.num_vertices)
    v2 = np.empty_like(verts)
    v2[perm] = verts
    mesh = Mesh(dim=3, vertices=v2, cells=perm[np.asarray(base.cells)])
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )
    return mesh


def uniform_box(nx):
    from fenicsxfus_tpu import create_box, tag_boundaries

    mesh = create_box((nx, nx, nx), (0, 0, 0), (1.0, 1.0, 1.0))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )
    return mesh


def solve_rate(mesh, degree, steps, dtype=None, label=""):
    """GDOF-RK4-steps/s for a Westervelt solve of ``steps`` steps.

    The scan program is shape-specialised on the segment length, so the
    warm-up must run the IDENTICAL (t0, tf, dt) window — a short warm-up
    leaves the full-length compile inside the timed region (this corrupted
    the first committed round-3 numbers by 10-100x at small sizes). Warm
    once, reset the state, rerun the same window timed — methodology of
    ``measure_solver_speed`` (steady repetition, compile excluded)."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import WesterveltSpectralExplicit

    dtype = dtype or jnp.float32
    c0, rho0, f0, p0 = 1.5, 1.0, 10.0, 1.0
    nx = int(round(mesh.num_cells ** (1 / 3)))
    dt = 0.4 * mesh.h_min() / (c0 * degree**2)
    m = WesterveltSpectralExplicit(
        mesh, None, degree, c0, rho0, 4e-3, 3.5, f0, p0, c0, 4, dt,
        dtype=dtype,
    )
    m.init()
    ndofs = m.number_of_dofs()
    u0, v0 = m.u_n, m.v_n
    m.rk(0.0, steps * dt)  # compile + warm the full-length program
    m.u_n, m.v_n, m.t = u0, v0, 0.0
    t0 = time.perf_counter()
    m.rk(0.0, steps * dt)  # identical window -> cached program
    _ = float(np.asarray(m.u_n[0]))  # sync
    wall = time.perf_counter() - t0
    n_run = steps
    rate = ndofs * n_run / wall / 1e9
    print(f"  {label or 'mesh'}: nx={nx} p={degree} DOFs={ndofs/1e6:.2f}M "
          f"steps={n_run} wall={wall:.2f}s -> {rate:.4f} GDOF-RK4-steps/s")
    return {"label": label, "ndofs": int(ndofs), "steps": n_run,
            "wall_s": wall, "gdof_steps_per_s": rate}


def main(nx=24, degree=4, steps=60, out=None):
    print(f"unstructured end-to-end solve benchmark (nx={nx}, p={degree})")
    res = []
    res.append(solve_rate(uniform_box(nx), degree, steps, label="lattice"))
    res.append(
        solve_rate(distorted_box(nx, degree), degree, steps,
                   label="unstructured(blocked)")
    )
    from fenicsxfus_tpu import reorder_locality

    rmesh = reorder_locality(distorted_box(nx, degree))  # tags are remapped
    res.append(
        solve_rate(rmesh, degree, steps, label="unstructured(blocked+reorder)")
    )
    gap = res[0]["gdof_steps_per_s"] / max(res[-1]["gdof_steps_per_s"], 1e-12)
    print(f"  per-DOF gap lattice/unstructured: {gap:.1f}x")
    if out:
        with open(out, "w") as f:
            json.dump({"nx": nx, "degree": degree, "results": res,
                       "gap": gap}, f, indent=1)
        print(f"  wrote {out}")
    return res, gap


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=24)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    main(args.nx, args.degree, args.steps, args.out)
