"""Marginal HBM-pass cost of the fused v3 RK stage.

The four stages of the fused RK4 step read different numbers of state
fields (stage i reads u0, v0 plus i previous slopes; the final stage also
writes two outputs instead of one) but do IDENTICAL compute. Timing each
stage call in isolation therefore measures the marginal cost of one extra
field-sized HBM stream through the kernel — the number that decides
whether fusing stages pairwise (or 4-way) to eliminate inter-stage kv
round-trips is worth the kernel complexity.

Reference methodology: min-over-runs single-operator timing as in
``cpp/fenicsx-sf/experiments/measure_fraction_of_peak_performance/
main.cpp:112-121``; the chained fori slope removes launch overhead.

Run: python benchmarks/stage_attrib.py [--nx 104]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=104, reps=3):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries
    from fenicsxfus_tpu.models.common import explicit_tables
    from fenicsxfus_tpu.ops.pallas_stage import KIND_DENSE, KIND_FACET
    from fenicsxfus_tpu.ops.pallas_stage_v3 import FusedRKStageV3

    c0, rho0, f0, p0 = 1500.0, 1000.0, 0.5e6, 60000.0
    L, degree = 0.12, 4
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9})
    dt = 0.9 * (L / nx) / (c0 * degree**2)
    model = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    )
    model.init()
    model._build()
    assert model._try_fused_step() is not None  # packs facet consts
    pk = model.ops.pallas2
    kind = "linear"
    keys = type(model).STIFF_KEYS
    Fs = [model.consts[k] for k in keys]
    hetero = [F["F0"].shape[0] != 1 for F in Fs]
    extras = (
        [model.consts[k] for k in KIND_DENSE[kind]],
        [model.consts[k + "__pf"] for k in KIND_FACET[kind]],
    )
    stage = FusedRKStageV3(
        pk, kind, hetero, explicit_tables(4), jnp.float32
    )
    gd = pk.gdims
    n = model.number_of_dofs()
    fieldMB = n * 4 / 1e6
    u0 = model.u_n.reshape(gd)
    v0 = jnp.ones(gd, jnp.float32) * 1e-6
    kv_f = jnp.ones(gd, jnp.float32) * 1e-6
    # alpha/beta tiny so chained stage outputs stay bounded
    scal_ns = jnp.asarray([[1e-12, 0.0, 0.0]], jnp.float32)

    # Pass Fs/extras/scal as jit ARGUMENTS (not closure constants): closed-over
    # arrays embed as HLO constants and blow past the remote-compile relay's
    # request-size limit (HTTP 413) — same fix as the hybrid G tensor (cb02c37).
    def s0(u, v, F, ex, sc):
        return stage._stage_call(u, v, None, None, [], sc, F, ex, False)

    def s1(u, v, k, F, ex, sc):
        return stage._stage_call(u, v, k, None, [], sc, F, ex, False)

    def s2(u, v, k, kk, F, ex, sc):
        return stage._stage_call(u, v, k, kk, [], sc, F, ex, False)

    def chain(body, nit):
        def f(u, v, F, ex, sc, kf):
            return jax.lax.fori_loop(
                0, nit, lambda i, kv: body(u, v, kv, kf, F, ex, sc), v
            )

        return jax.jit(f, static_argnames=())

    def sync(y):
        return float(jnp.sum(jax.tree.leaves(y)[0].ravel()[:1]))

    def best(f, *a):
        sync(f(*a))
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*a))
            b = min(b, time.perf_counter() - t0)
        return b

    def slope(body):
        f10, f20 = chain(body, 10), chain(body, 20)
        a = (u0, v0, Fs, extras, scal_ns, kv_f)
        return (best(f20, *a) - best(f10, *a)) / 10

    t0_ = slope(lambda u, v, kv, kf, F, ex, sc: s0(u, kv, F, ex, sc))         # R2 W1
    t1_ = slope(lambda u, v, kv, kf, F, ex, sc: s1(u, v, kv, F, ex, sc))      # R3 W1
    t2_ = slope(lambda u, v, kv, kf, F, ex, sc: s2(u, kv, v, kf, F, ex, sc))  # R4 W1

    print(f"DOFs={n/1e6:.1f}M field={fieldMB:.0f}MB degree={degree} fp32")
    print(f"stage0 (R2 W1, 3 passes)  {t0_*1e3:7.2f} ms")
    print(f"stage1 (R3 W1, 4 passes)  {t1_*1e3:7.2f} ms")
    print(f"stage2 (R4 W1, 5 passes)  {t2_*1e3:7.2f} ms")
    d1, d2 = t1_ - t0_, t2_ - t1_
    print(f"marginal pass cost        {d1*1e3:7.2f} / {d2*1e3:.2f} ms "
          f"({fieldMB/1e3/max(d1,1e-9):.0f} / {fieldMB/1e3/max(d2,1e-9):.0f} GB/s)")
    # projection: RK4 step = 19 passes today (3+4+5+7); pair fusion = 10,
    # 4-way wavefront = 4 (+ geometry)
    dpp = (d1 + d2) / 2
    step = 4 * (t0_ + dpp * 1.75)  # avg stage = 4.75 passes
    print(f"per-step model (19 passes){step*1e3:7.2f} ms "
          f"-> pair(10): {(step - 9*dpp)*1e3:.2f} ms, "
          f"4-way(4+2): {(step - 13*dpp)*1e3:.2f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=104)
    args = ap.parse_args()
    main(nx=args.nx)
