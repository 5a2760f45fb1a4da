"""Isolated timing of the wavefront-fused RK4 step kernel vs the v3 stages.

The wave step measured only ~parity with the v3 per-stage path at the
72.5M-DOF headline (2.469 vs 2.458 GDOF-steps/s) where the stream model
predicted ~1.4x. This harness separates the hypotheses:

* kernel-bound: chained ``wave._step_call`` time ~= in-scan per-step time;
* block-size-bound: the wave's VMEM rings force be=1 at 417^3 while the
  v3 apply runs be=4 — measure the wave at a smaller shape where be=2/4
  fit and compare against v3 at the same shape;
* stream model wrong: compare measured ms/step against the 19-pass /
  ~5.6-pass models from benchmarks/stage_attrib.py.

Run: python benchmarks/wave_attrib.py [--nx 104] [--be 0 (auto)]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main(nx, be_forced, reps=3, chain=10):
    if be_forced:
        os.environ["FUS_WAVE_BE"] = str(be_forced)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries
    from fenicsxfus_tpu.models.common import explicit_tables
    from fenicsxfus_tpu.ops.pallas_stage import KIND_DENSE, KIND_FACET
    from fenicsxfus_tpu.ops.pallas_step_wave import (
        FusedRKStepWave,
        _wave_pick_be,
        try_separate_field,
    )

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
    assert model._try_fused_step() is not None
    pk = model.ops.pallas2
    kind = "linear"
    keys = type(model).STIFF_KEYS
    Fs = [model.consts[k] for k in keys]
    hetero = [F["F0"].shape[0] != 1 for F in Fs]
    extras = (
        [model.consts[k] for k in KIND_DENSE[kind]],
        [model.consts[k + "__pf"] for k in KIND_FACET[kind]],
    )
    wave = FusedRKStepWave(pk, kind, hetero, explicit_tables(4), jnp.float32)
    sep = try_separate_field(np.asarray(model.consts["inv_m"]), pk.gdims)
    if sep is not None:
        wave.sep_invm = True
        extras = (
            [jnp.asarray(sep[0], jnp.float32), jnp.asarray(sep[1], jnp.float32)],
            extras[1],
        )
    nde, nf = len(KIND_DENSE[kind]), len(Fs)
    be = _wave_pick_be(pk, nde, nf, any(hetero), wave.sep_invm)
    n = model.number_of_dofs()
    print(f"gdims={pk.gdims} dofs={n/1e6:.1f}M sep={wave.sep_invm} be={be}")
    if be is None:
        print("no block size fits; aborting")
        return 1

    W = 2 + (len(KIND_FACET[kind]) - 1) + 1 + 3 + 4
    scal4 = jnp.zeros((4, W), jnp.float32)
    gd = pk.gdims

    def chained(u, v, sc, F, ex):
        def body(i, uv):
            uu, vv = wave._step_call(uv[0], uv[1], sc, F, ex)
            return (uu.reshape(gd), vv.reshape(gd))

        return jax.lax.fori_loop(0, chain, body, (u, v))

    # the REAL model step (incl. per-step source coefficients) — as built
    # by make_step — driven by lax.scan exactly like make_scan_from_step,
    # and by fori_loop: separates scan-carry overhead from kernel cost.
    real_step = model._make_step()
    dts = jnp.full((chain,), jnp.float32(model.dt))
    # fused steps declare carry_shape and return 3D-shaped u/v — the carry
    # must be initialized in that shape or lax.scan rejects the mismatched
    # carry types (mirrors make_scan_from_step; ADVICE r4 #1)
    cshape = getattr(real_step, "carry_shape", None) or (-1,)

    def scan_real(consts, u, v):
        (u, v, t), _ = jax.lax.scan(
            lambda c, d: real_step(consts, c, d),
            (u.reshape(cshape), v.reshape(cshape), jnp.float32(0.0)),
            dts,
        )
        return u, v, t

    def fori_real(consts, u, v):
        def body(i, carry):
            out, _ = real_step(consts, carry, jnp.float32(model.dt))
            return out

        return jax.lax.fori_loop(
            0, chain, body, (u.reshape(cshape), v.reshape(cshape), jnp.float32(0.0))
        )

    u0 = jnp.zeros(gd, jnp.float32)
    v0 = jnp.full(gd, 1e-6, jnp.float32)

    def sync(y):
        return float(jnp.sum(jax.tree.leaves(y)[0].ravel()[:1]))

    def bench(label, f, *a):
        t0 = time.perf_counter()
        sync(f(*a))
        print(f"  {label}: compile+first {time.perf_counter()-t0:.1f}s")
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*a))
            best = min(best, time.perf_counter() - t0)
        ms = best / chain * 1e3
        print(
            f"  {label}: {ms:.2f} ms/step "
            f"-> {n / (ms * 1e-3) / 1e9:.3f} GDOF-steps/s"
        )
        return ms

    bench("raw kernel fori", jax.jit(chained), u0, v0, scal4, Fs, extras)
    bench("real step scan ", jax.jit(scan_real), model.consts, u0, v0)
    bench("real step fori ", jax.jit(fori_real), model.consts, u0, v0)
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=104)
    ap.add_argument("--be", type=int, default=0)
    args = ap.parse_args()
    sys.exit(main(args.nx, args.be))
