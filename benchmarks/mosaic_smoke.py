"""On-chip Mosaic lowering smoke for every production kernel family.

CI runs all Pallas tests interpret-mode on CPU (tests/test_pallas*.py), so
Mosaic-only breakage (tile-size limits, VMEM budgets, unsupported ops in
the real lowering) is invisible until a production run dies (VERDICT r3
weak #9). This script compiles AND runs a couple of steps of each fused
kernel family at a small-but-representative shape on the real backend, and
asserts the intended kernel class was actually selected (a silent fallback
to the XLA path would otherwise look like a pass).

Families:  v3 bare apply (const + DG-0), v3 fused stage (linear / lossy /
westervelt, homog + het), wavefront step (sep + dense inv_m), hybrid
(bowl-deformed) fused stage.

Run:  python benchmarks/mosaic_smoke.py [--nx 32]
Add --full-compile to ALSO lower+compile (not run) the wave step and v3
apply at the 417^3 headline shape — the VMEM-fit check without the run.

PRODUCTION TIER (VERDICT r4 next #2):  --production runs compile + 2 real
steps of every bench-ladder path at the PRODUCTION shape (default nx=104,
72.5M DOF) — v3 stage, wave step, XLA fallback, and the full-shape
pallas-vs-XLA self-check (the exact op whose in-bench failure zeroed
BENCH_r04).  Each tier executes in its OWN SUBPROCESS so tiers never share
HBM (the r4 failure mode), mirroring the bench ladder's isolation.  The
predicted peak HBM per tier (ops/hbm.py) is printed first; a tier that
does not fit the model is still run — an empirical pass/fail beats the
model.
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

t0 = time.perf_counter()
RESULTS = []


def check(name, fn):
    start = time.perf_counter()
    try:
        fn()
        dt = time.perf_counter() - start
        RESULTS.append((name, "PASS", dt, ""))
        print(f"[{time.perf_counter()-t0:7.1f}s] PASS {name} ({dt:.1f}s)",
              flush=True)
    except Exception as e:
        dt = time.perf_counter() - start
        msg = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
        RESULTS.append((name, "FAIL", dt, msg))
        print(f"[{time.perf_counter()-t0:7.1f}s] FAIL {name} ({dt:.1f}s): {msg}",
              flush=True)


def main(nx, full_compile):
    import numpy as np
    import jax

    # honor an explicit JAX_PLATFORMS=cpu (the axon TPU plugin force-
    # prepends itself at import, same workaround as __graft_entry__) —
    # NEVER run this against the chip while another process holds it: the
    # single-client tunnel makes the second process crash the worker.
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass
    import jax.numpy as jnp

    import fenicsxfus_tpu as fus
    from fenicsxfus_tpu.ops.pallas_stage_v3 import FusedRKStageV3
    from fenicsxfus_tpu.ops.pallas_step_wave import FusedRKStepWave

    c0, rho0, f0, p0 = 1500.0, 1000.0, 0.5e6, 60000.0
    L, degree = 0.12, 4
    dt = 0.3 * (L / nx) / (c0 * degree**2)

    def box(het=False):
        mesh = fus.create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
        fus.tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9}
        )
        if het:
            nc = mesh.num_cells
            cf = c0 * (1.0 + 0.1 * np.sin(np.arange(nc)))
            return mesh, cf
        return mesh, c0

    def spy_run(model, cls):
        calls = []
        orig = cls._step_call if hasattr(cls, "_step_call") else cls._stage_call
        attr = "_step_call" if hasattr(cls, "_step_call") else "_stage_call"

        def probe(self, *a, **k):
            calls.append(type(self).__name__)
            return orig(self, *a, **k)

        setattr(cls, attr, probe)
        try:
            u, v, t = model.rk(0.0, 2.1 * model.dt)
            assert np.all(np.isfinite(np.asarray(u)))
            assert calls, f"{cls.__name__} not selected"
        finally:
            setattr(cls, attr, orig)

    # --- v3 bare apply, const + DG-0
    def apply_case(het):
        mesh, cf = box(het)
        ops = fus.SEMOperators(mesh, degree, dtype=jnp.float32)
        pk = ops.pallas2
        assert pk is not None, "pallas path inactive"
        x = jnp.ones(ops.lattice.gdims, jnp.float32)
        F = pk.pack_field(np.broadcast_to(np.asarray(cf, np.float64),
                                          (mesh.num_cells,))) if het \
            else pk.pack_const(1.0)
        y = pk.apply([x], [F])
        assert bool(jnp.all(jnp.isfinite(y)))

    check("apply/const", lambda: apply_case(False))
    check("apply/het", lambda: apply_case(True))

    # --- fused v3 stages per model kind (homog + het linear)
    def linear_case(het, wave=False):
        os.environ["FUS_STEP_WAVE"] = "1" if wave else "0"
        mesh, cf = box(het)
        m = fus.LinearSpectralExplicit(
            mesh, None, degree, cf, rho0, f0, p0, c0, 4, dt,
            dtype=jnp.float32,
        ).init()
        spy_run(m, FusedRKStepWave if wave else FusedRKStageV3)

    check("stage-v3/linear", lambda: linear_case(False))
    check("stage-v3/linear-het", lambda: linear_case(True))
    check("wave/linear(sep inv_m)", lambda: linear_case(False, wave=True))
    check("wave/linear-het(dense inv_m)", lambda: linear_case(True, wave=True))
    os.environ["FUS_STEP_WAVE"] = "0"

    def lossy_case():
        mesh, _ = box()
        m = fus.LossySpectralExplicit(
            mesh, None, degree, c0, rho0, 4e-3, f0, p0, c0, 4, dt,
            dtype=jnp.float32,
        ).init()
        spy_run(m, FusedRKStageV3)

    def westervelt_case():
        mesh, _ = box()
        m = fus.WesterveltSpectralExplicit(
            mesh, None, degree, c0, rho0, 4e-3, 3.5, f0, p0, c0, 4, dt,
            dtype=jnp.float32,
        ).init()
        spy_run(m, FusedRKStageV3)

    check("stage-v3/lossy", lossy_case)
    check("stage-v3/westervelt", westervelt_case)

    # --- hybrid (bowl-deformed) fused stage
    def hybrid_case():
        bmesh, _ = fus.create_bowl_box(
            (nx, nx // 2, nx // 2), (0, 0, 0), (L, L / 2, L / 2),
            0.9 * L, 0.15 * L, blend=0.3 * L, lateral_hold=0.2 * L,
        )
        m = fus.WesterveltSpectralExplicit(
            bmesh, None, 2, c0, rho0, 4e-3, 3.5, f0, p0, c0, 4, dt / 4,
            dtype=jnp.float32,
        ).init()
        assert m.ops.hybrid is not None
        spy_run(m, FusedRKStageV3)

    check("stage-v3/hybrid-bowl", hybrid_case)

    if full_compile:
        # headline-shape compile-only of the wave step (VMEM-fit check)
        def wave_full():
            import subprocess

            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "wave_vmem_probe.py"), "104"],
                capture_output=True, text=True, timeout=900,
            )
            assert r.returncode == 0, r.stdout[-800:] + r.stderr[-400:]

        check("wave/417^3 compile-only", wave_full)

    print()
    width = max(len(n) for n, *_ in RESULTS)
    for name, st, dt, msg in RESULTS:
        print(f"{name:<{width}}  {st}  {dt:6.1f}s  {msg}")
    nfail = sum(1 for _, st, *_ in RESULTS if st == "FAIL")
    print(f"\n{len(RESULTS) - nfail}/{len(RESULTS)} passed "
          f"({jax.devices()[0].platform} backend)")
    return 1 if nfail else 0


PROD_TIERS = ("v3", "wave", "xla", "selfcheck")


def production_tier(tier, nx):
    """Run ONE production-shape tier in-process (called in a child)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import fenicsxfus_tpu as fus

    c0, rho0, f0, p0 = 1500.0, 1000.0, 0.5e6, 60000.0
    L, degree = 0.12, 4
    dt = 0.9 * (L / nx) / (c0 * degree**2)

    t_start = time.perf_counter()

    def say(msg):
        print(f"[tier {time.perf_counter()-t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    mesh = fus.create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    fus.tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9}
    )

    if tier == "selfcheck":
        # Exact-shape agreement of the fused pallas apply vs the XLA
        # lattice path — the op that raised inside bench r4.  Two full
        # programs coexist here by design; this tier owning a whole
        # process is what makes that affordable.
        ops = fus.SEMOperators(mesh, degree, dtype=jnp.float32)
        pk = ops.pallas2
        assert pk is not None, "pallas path inactive"
        say("built ops; pallas apply")
        xs = jax.random.normal(jax.random.PRNGKey(0), ops.lattice.gdims,
                               jnp.float32)
        y_p = pk.apply([xs], [pk.pack_const(1.0)])
        y_p_max = float(jnp.max(jnp.abs(y_p)))
        say(f"pallas apply done (max {y_p_max:.3e}); XLA lattice apply")
        y_x = ops.lattice.apply_scaled([(xs, ops.pack_scales(1.0))])
        rel = float(jnp.max(jnp.abs(y_p - y_x)) / jnp.max(jnp.abs(y_x)))
        say(f"selfcheck rel={rel:.2e}")
        assert np.isfinite(rel) and rel <= 1e-4, f"selfcheck rel={rel:.2e}"
        print(f"PASS selfcheck nx={nx} rel={rel:.2e}")
        return 0

    os.environ["FUS_STEP_WAVE"] = "1" if tier == "wave" else "0"
    if tier == "xla":
        os.environ["FUS_PALLAS"] = "0"
    say(f"building model ({tier})")
    model = fus.LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    ).init()
    say(f"built ({model.number_of_dofs()/1e6:.1f}M DOF); compile + 2 steps")
    # assert the intended kernel class actually ran (a silent fallback to
    # another path would otherwise look like a pass) — same spy as the
    # small-shape tiers
    calls = []
    spy_cls = None
    if tier in ("v3", "wave"):
        from fenicsxfus_tpu.ops.pallas_stage_v3 import FusedRKStageV3
        from fenicsxfus_tpu.ops.pallas_step_wave import FusedRKStepWave

        spy_cls = FusedRKStepWave if tier == "wave" else FusedRKStageV3
        attr = "_step_call" if hasattr(spy_cls, "_step_call") else "_stage_call"
        orig = getattr(spy_cls, attr)

        def probe(self, *a, **k):
            calls.append(type(self).__name__)
            return orig(self, *a, **k)

        setattr(spy_cls, attr, probe)
    try:
        u, v, t = model.rk(0.0, 2.1 * model.dt)
    finally:
        if spy_cls is not None:
            setattr(spy_cls, attr, orig)
    s = float(jnp.sum(jnp.abs(u)))
    assert np.isfinite(s), f"non-finite field after 2 steps ({tier})"
    if spy_cls is not None:
        assert any(c == spy_cls.__name__ for c in calls), (
            f"{tier} tier: {spy_cls.__name__} not selected (got {set(calls)})"
        )
    say("done")
    print(f"PASS {tier} nx={nx}")
    return 0


def production(nx):
    """Orchestrate all production tiers, one subprocess each."""
    import subprocess

    from fenicsxfus_tpu.ops.hbm import report

    print(f"Predicted peak HBM per bench-ladder path (ops/hbm.py):")
    print(report(rungs=((nx, "v3"), (nx, "wave"), (nx, "xla"))))
    print(flush=True)

    tier_timeout = float(os.environ.get("FUS_SMOKE_TIER_TIMEOUT", "900"))
    only = os.environ.get("FUS_SMOKE_TIERS", "")
    tiers = [t for t in PROD_TIERS if not only or t in only.split(",")]
    results = []
    for tier in tiers:
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--production-tier", tier, "--nx", str(nx)],
                capture_output=True, text=True, timeout=tier_timeout,
            )
            ok = r.returncode == 0 and f"PASS" in r.stdout
            msg = "" if ok else (r.stderr.strip().splitlines() or ["?"])[-1][:160]
        except subprocess.TimeoutExpired:
            ok, msg = False, f"timeout >{tier_timeout:.0f}s"
        dt = time.perf_counter() - t0
        results.append((tier, ok, dt, msg))
        print(f"{'PASS' if ok else 'FAIL'} production/{tier} nx={nx} "
              f"({dt:.0f}s) {msg}", flush=True)
    nfail = sum(1 for _, ok, *_ in results if not ok)
    print(f"\nproduction tier: {len(results)-nfail}/{len(results)} passed")
    return 1 if nfail else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=None,
                    help="box resolution (default 32; 104 with --production)")
    ap.add_argument("--full-compile", action="store_true")
    ap.add_argument("--production", action="store_true",
                    help="run every bench-ladder path at the production "
                         "shape, one subprocess per tier")
    ap.add_argument("--production-tier", choices=PROD_TIERS,
                    help="(internal) run ONE production tier in-process")
    args = ap.parse_args()
    if args.production_tier:
        sys.exit(production_tier(args.production_tier, args.nx or 104))
    if args.production:
        sys.exit(production(args.nx or 104))
    sys.exit(main(args.nx or 32, args.full_compile))
