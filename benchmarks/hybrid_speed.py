"""Hybrid (bowl-fitted) stiffness apply vs pure lattice apply at production
scale — where does the bowl-mesh solve's per-step penalty come from?

The hybrid split (``ops/operators.py::_setup_hybrid``) is
K = K_uniform(whole lattice) + K_corr(blend slab); the budget in
PERFORMANCE.md predicts the apply should land within ~1.5-2x the pure
lattice apply. This harness measures, with the slope-between-chains
methodology of ``operator_speed.py``:

  lattice   — stiffness apply on a uniform box of the same grid
  hybrid    — full hybrid apply on the bowl-fitted mesh
  band      — the band correction alone (gather + per-cell dense-tab + fold)

Run:  python benchmarks/hybrid_speed.py [--nx 80]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "hitu"))


def main(nx=80, degree=4):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import common as hitu
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

    model, h, dt, spp = hitu.build_bowl_model(
        "W", "H101", "WATER", nx, degree=degree, f0=0.5e6, linear=True
    )
    ops = model.ops
    hy = ops.hybrid
    nd = ops.ndofs
    print(f"bowl-fitted H101 nx={nx} p={degree}: ndofs={nd/1e6:.2f}M "
          f"blend slab: {hy['bx']} x-layers, {hy['nb']} cells "
          f"({hy['nb']/ops.num_cells*100:.1f}% of cells)")

    c_hyb = ops.stiff_coeff(1.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(nd), ops.dtype)

    def normalise(f):
        # normalise by the operator's measured 2-norm growth on x
        y = f(x)
        s = 1.0 / float(jnp.linalg.norm(y) / (jnp.linalg.norm(x) + 1e-30))
        return lambda z: s * f(z)

    hyb = normalise(lambda z: ops.stiffness_apply([z], [c_hyb]))
    t_hyb = slope(hyb, x)

    band = normalise(
        lambda z: ops._band_correction([z], [c_hyb["hyb_b"]], c_hyb["hyb_G"])
    )
    t_band = slope(band, x)

    # pure lattice baseline: uniform box with the same grid shape
    gs = model.mesh.grid_shape
    lo, hi = model.mesh.uniform_box
    box = create_box(tuple(gs), tuple(lo), tuple(hi))
    ops_u = SEMOperators(box, degree, dtype=ops.dtype)
    c_u = ops_u.stiff_coeff(1.0)
    lat = normalise(lambda z: ops_u.stiffness_apply([z], [c_u]))
    t_lat = slope(lat, x)

    print(f"{'path':>10} {'ms/apply':>10} {'ns/DOF':>8} {'vs lattice':>11}")
    for name, t in (("lattice", t_lat), ("hybrid", t_hyb), ("band", t_band)):
        print(f"{name:>10} {t*1e3:10.2f} {t/nd*1e9:8.3f} {t/t_lat:11.2f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--degree", type=int, default=4)
    a = ap.parse_args()
    main(a.nx, a.degree)
