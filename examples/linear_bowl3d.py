"""Focused bowl transducer on a TRUE curved-facet mesh (H101-like).

The reference drives its HITU benchmarks from gmsh meshes with the bowl
surface fitted into the boundary
(``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-WATER/main.cpp:33-52``);
here ``create_bowl_box`` generates the equivalent geometry natively and the
hybrid operator runs the lattice/Pallas fast path on the uniform bulk with
a per-cell correction on the blend slab only. The run reports the focal
gain against the O'Neil (1949) axial solution.

Run:  python examples/linear_bowl3d.py [--nx 48] [--degree 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=48, degree=4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenicsxfus_tpu import LinearSpectralExplicit, create_bowl_box
    from fenicsxfus_tpu.analysis.analytical import oneil_axial_amplitude

    # H101-like geometry at a reduced frequency so the default nx resolves it
    f0, p0 = 0.25e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    a, roc = 0.032, 0.0632
    L, W = 0.12, 0.07
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    h = L / nx
    nyz = max(int(round(W / h)), 2)
    mesh, focus = create_bowl_box(
        (nx, nyz, nyz), (0.0, -W / 2, -W / 2), (L, W / 2, W / 2), roc, a
    )
    # 0.3: skewed blend-band cells raise the spectral radius beyond what
    # h_min implies — 0.4 is marginally unstable in fp32 at coarse nx
    dt = 0.3 * mesh.h_min() / (c0 * degree**2)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
    )
    eqn.init()
    lam = c0 / f0
    print(f"bowl mesh: {eqn.number_of_dofs()/1e6:.2f}M DOFs  "
          f"{lam/h:.1f} elems/wavelength  hybrid={'on' if eqn.ops.hybrid else 'off'}")
    t1 = (focus[0] + 3 * lam) / c0 + 6.0 / f0
    eqn.rk(0.0, t1)
    xs = np.linspace(0.02, 0.11, 61)
    pts = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)])
    *_, times, ys = eqn.rk_record(t1, t1 + 1.0 / f0, pts)
    amp = np.max(np.abs(np.asarray(ys)), axis=0)
    k = 2 * np.pi * f0 / c0
    depth = roc - np.sqrt(roc**2 - a**2)
    ref = oneil_axial_amplitude(xs + depth, a, roc, k, p0)
    i_pk, i_rf = int(np.argmax(amp)), int(np.argmax(ref))
    print(f"focal |p|: model {amp[i_pk]/1e3:.1f} kPa @ {xs[i_pk]*1e3:.1f} mm, "
          f"O'Neil {ref[i_rf]/1e3:.1f} kPa @ {xs[i_rf]*1e3:.1f} mm "
          f"(gain err {abs(amp[i_pk]-ref[i_rf])/ref[i_rf]*100:.1f}%)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--degree", type=int, default=4)
    args = ap.parse_args()
    main(args.nx, args.degree)
