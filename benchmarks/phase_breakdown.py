"""Per-phase RK4 cost breakdown on one chip (measure_bottlenecks analogue).

Reference: ``cpp/fenicsx/experiments/measure_bottlenecks`` times the RK loop
phase-by-phase (rk_timings.txt: f1 = 62.5 s of 66 s; f1_timings.txt: RHS
assembly = 97% of f1). Here the step is ONE fused kernel per stage, so the
decomposition is: full RK4 step, the fused-stage slope evaluation, the bare
stiffness apply inside it, the pointwise (mass-divide + AXPY) traffic, and —
for contrast — the unfused XLA rhs evaluation the fused stage replaced.

Run:  python benchmarks/phase_breakdown.py [--nx 104] [--kind westervelt]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=104, kind="linear", nsteps=20):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenicsxfus_tpu import (
        LinearSpectralExplicit,
        LossySpectralExplicit,
        WesterveltSpectralExplicit,
        create_box,
        tag_boundaries,
    )

    c0, rho0, f0, p0 = 1500.0, 1000.0, 0.5e6, 60000.0
    L = 0.12
    degree = 4
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9})
    dt = 0.9 * (L / nx) / (c0 * degree**2)
    cls, extra = {
        "linear": (LinearSpectralExplicit, ()),
        "lossy": (LossySpectralExplicit, (4e-3,)),
        "westervelt": (WesterveltSpectralExplicit, (4e-3, 3.5)),
    }[kind]
    model = cls(mesh, None, degree, c0, rho0, *extra, f0, p0, c0, 4, dt,
                dtype=jnp.float32)
    model.init()
    model._build()
    n = model.number_of_dofs()
    ops, consts = model.ops, model.consts
    u, v = model.u_n, model.v_n

    def sync(y):
        # scalar readback: block_until_ready returns early on the axon relay
        return float(jnp.sum(jax.tree.leaves(y)[0].ravel()[:1]))

    def best(f, reps=3):
        f()
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            b = min(b, time.perf_counter() - t0)
        return b

    # full RK4 steps (slope between 2x and 1x nsteps removes launch overhead)
    solve = model._solve
    t_a = best(lambda: sync(solve(consts, u, v, 0.0, nsteps * dt, dt)))
    t_b = best(lambda: sync(solve(consts, u, v, 0.0, 2 * nsteps * dt, dt)))
    step = (t_b - t_a) / nsteps

    # bare stiffness apply (the volume operator inside the stage)
    pk = ops.pallas2
    x = u.reshape(ops.lattice.gdims)
    # spectral normalisation so chained applies stay O(1) (fp32)
    xr = jax.random.normal(jax.random.PRNGKey(0), ops.lattice.gdims, jnp.float32)
    y1 = pk.apply([xr], [pk.pack_const(1.0)])
    r = float(jnp.max(jnp.abs(y1)) / jnp.max(jnp.abs(xr)))
    Fc = pk.pack_const(1.0 / r)
    x = xr
    ap10 = jax.jit(lambda y: jax.lax.fori_loop(
        0, 10, lambda i, z: pk.apply([z], [Fc]), y))
    ap20 = jax.jit(lambda y: jax.lax.fori_loop(
        0, 20, lambda i, z: pk.apply([z], [Fc]), y))
    stiff = (best(lambda: sync(ap20(x))) - best(lambda: sync(ap10(x)))) / 10

    # pointwise traffic (mass divide + one AXPY, the non-operator stage work)
    m = 1.0 + jnp.abs(u)
    pw10 = jax.jit(lambda y: jax.lax.fori_loop(
        0, 10, lambda i, z: z / m + 0.5 * z, y))
    pw20 = jax.jit(lambda y: jax.lax.fori_loop(
        0, 20, lambda i, z: z / m + 0.5 * z, y))
    pointw = (best(lambda: sync(pw20(u))) - best(lambda: sync(pw10(u)))) / 10

    # unfused XLA rhs (what the fused stage replaced)
    rhs = type(model).rhs_pure
    rh10 = jax.jit(lambda y, w: jax.lax.fori_loop(
        0, 10, lambda i, s: rhs(ops, consts, 0.0, s[0], s[1]), (y, w)))
    rh20 = jax.jit(lambda y, w: jax.lax.fori_loop(
        0, 20, lambda i, s: rhs(ops, consts, 0.0, s[0], s[1]), (y, w)))
    try:
        unfused = (best(lambda: sync(rh20(u, v))) - best(lambda: sync(rh10(u, v)))) / 10
    except Exception:
        unfused = float("nan")

    stage = step / 4
    print(f"kind={kind} DOFs={n/1e6:.1f}M degree={degree} fp32")
    print(f"RK4 step            {step*1e3:8.2f} ms   ({n*1.0/step/1e9:.2f} GDOF-steps/s)")
    print(f"  fused stage (=/4) {stage*1e3:8.2f} ms")
    print(f"  stiffness apply   {stiff*1e3:8.2f} ms   ({stiff/stage*100:.0f}% of stage)")
    print(f"  pointwise pass    {pointw*1e3:8.2f} ms   (mass divide + AXPY)")
    print(f"  unfused XLA rhs   {unfused*1e3:8.2f} ms   (what fusion replaced)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=104)
    ap.add_argument("--kind", default="linear")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    main(nx=args.nx, kind=args.kind, nsteps=args.steps)
