"""Bowl blend/hold tuning sweep: band size vs stable-dt clamp (CPU).

The hybrid bowl production cost splits into (a) the per-step band
correction, proportional to the blend-slab cell fraction, and (b) the
stability clamp from skewed blend cells (H101 nx=80 round 4: 45% of
cells in the slab AND 212 vs 119 steps/period — the worst of both).
Both are controlled by ``create_bowl_box``'s ``blend`` (fade depth) and
``lateral_hold`` (depth at which the rim snap is held before fading):

* larger blend -> gentler shear per cell -> better dt, bigger slab;
* larger hold -> longer fully-snapped prism region -> bigger slab; the
  hold exists to keep the effective aperture sharp (O'Neil gates).

This sweep builds H101 meshes at nx=64 for a (blend, hold) grid and
reports slab fraction, h_min, and the spectral stable-dt ratio vs the
uniform-lattice CFL — the data for choosing a production default. A
cost proxy ``steps x (1 + k*frac)`` with k=2 (band correction measured
2-3x a lattice cell per apply at p=4) ranks the configs.

Run: python benchmarks/bowl_blend_sweep.py [--nx 64]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main(nx):
    import jax.numpy as jnp

    from fenicsxfus_tpu import (
        WesterveltSpectralExplicit,
        estimate_stable_dt,
    )
    from fenicsxfus_tpu.core.bowl import create_bowl_box

    # H101 geometry at the production domain (benchmarks/hitu/common.py)
    a, roc, L, W = 0.032, 0.0632, 0.12, 0.07
    c0, rho0 = 1480.0, 1000.0
    degree = 4
    h = L / nx
    nyz = max(int(round(W / h)), 2)
    sag = roc - np.sqrt(roc**2 - a**2)
    dt_uniform = h / (c0 * degree**2)  # CFL=1 reference scale

    print(f"H101 nx={nx} p={degree}: h={h*1e3:.2f} mm sag={sag*1e3:.2f} mm "
          f"uniform-CFL dt scale {dt_uniform:.3e}")
    print(f"{'blend/sag':>9} {'hold/blend':>10} {'slab%':>6} {'layers':>6} "
          f"{'hmin/h':>7} {'dt*/dtu':>8} {'cost-proxy':>10}")
    rows = []
    for mb in (2.0, 3.0, 4.0, 5.0):
        for mh in (0.25, 0.5, 1.0):
            blend = mb * sag
            hold = mh * blend
            try:
                mesh, _ = create_bowl_box(
                    (nx, nyz, nyz), (0.0, -W / 2, -W / 2),
                    (L, W / 2, W / 2), roc, a,
                    blend=blend, lateral_hold=hold,
                )
            except Exception as e:
                print(f"{mb:9.2f} {mh:10.2f}   build failed: "
                      f"{type(e).__name__}: {str(e)[:60]}")
                continue
            m = WesterveltSpectralExplicit(
                mesh, None, degree, c0, rho0, 4e-3, 3.5, 0.5e6, 6e4, c0,
                4, 1e-9, dtype=jnp.float32,
            )
            m.init()
            hyb = m.ops.hybrid
            frac = hyb["nb"] / mesh.num_cells if hyb else 0.0
            layers = mesh.blend_layers
            dt_star = estimate_stable_dt(m.ops, c0, rho0, rk_order=4)
            ratio = dt_star / dt_uniform
            # per-step cost proxy: (1/dt) x (1 + k*frac), k=2
            proxy = (1.0 / ratio) * (1.0 + 2.0 * frac)
            rows.append((mb, mh, frac, layers, ratio, proxy))
            print(f"{mb:9.2f} {mh:10.2f} {frac*100:5.1f}% {layers:6d} "
                  f"{mesh.h_min()/h:7.3f} {ratio:8.3f} {proxy:10.3f}")
    if rows:
        best = min(rows, key=lambda r: r[-1])
        print(f"\nbest proxy: blend={best[0]}*sag hold={best[1]}*blend "
              f"(slab {best[2]*100:.1f}%, dt ratio {best[4]:.3f})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    args = ap.parse_args()
    main(args.nx)
