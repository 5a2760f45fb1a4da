"""Headline benchmark: 3D linear p=4 RK4 solve throughput on one TPU chip.

Reproduces the reference's ``measure_solver_speed`` experiment
(``cpp/fenicsx-sf-naive/experiments/measure_solver_speed``): 3D linear wave,
p=4 hex mesh, ~70.9M DOF, 101 RK4 steps. Reference best: 58.6 s on a 76-proc
Icelake node ≈ 0.122 GDOF·RK4-steps/s/node (BASELINE.md). We report
GDOF·RK4-updates/s on one TPU chip; vs_baseline is the node-for-chip ratio.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The fused Pallas path (stiffness kernels + fully-fused RK stage) is the
# default on TPU; FUS_PALLAS=0 / FUS_FUSED=0 select the XLA fallbacks.

METRIC = "GDOF-RK4-updates/sec/chip (3D linear p=4, 72.5M DOF, 101 steps, fp32)"


def _fail_json(reason: str) -> None:
    """Emit a parseable one-line record instead of a traceback so a transient
    backend outage never erases a round's perf evidence (VERDICT r2 weak #1)."""
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0.0,
                "unit": "GDOF-steps/s",
                "vs_baseline": 0.0,
                "error": reason,
            }
        )
    )


def _probe_backend(timeout_s: float):
    """Check backend init in a SUBPROCESS so a wedged relay (the axon client
    retries forever inside jax.devices(), hanging the process) is bounded by
    a kill, not trusted to raise. Returns (ok, detail)."""
    import subprocess

    code = "import jax; print(jax.devices()[0].platform)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init hang >{timeout_s:.0f}s (relay wedged?)"
    if r.returncode == 0 and r.stdout.strip():
        return True, r.stdout.strip().splitlines()[-1]
    tail = (r.stderr.strip().splitlines() or [f"rc={r.returncode}"])[-1]
    return False, f"backend init failed: {tail}"


def ensure_backend() -> None:
    """Bounded retry/backoff on backend availability; on exhaustion print a
    structured failure JSON and exit 0 so the driver records it."""
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "5"))
    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT", "120"))
    backoff_s = float(os.environ.get("BENCH_INIT_BACKOFF", "90"))
    detail = "no probe run"
    for attempt in range(retries):
        ok, detail = _probe_backend(timeout_s)
        if ok:
            return
        print(
            f"[bench] backend probe {attempt + 1}/{retries} failed: {detail}",
            file=sys.stderr,
            flush=True,
        )
        if attempt < retries - 1:
            time.sleep(backoff_s)
    _fail_json(f"backend unavailable after {retries} probes: {detail}")
    sys.exit(0)


def main():
    # Persistent XLA compilation cache: the fused 72.5M-DOF program takes
    # ~10+ min to compile on this 1-core host VM; cached reruns skip it.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

    ensure_backend()

    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries

    # Problem size: (p*nx+1)^3 DOFs. nx=104 → 417^3 = 72.5M DOF (matches the
    # reference's 70.9M problem). Override with BENCH_NX for quick runs.
    nx = int(os.environ.get("BENCH_NX", "104"))
    degree = 4
    nsteps = int(os.environ.get("BENCH_STEPS", "101"))
    dtype = jnp.float32

    c0, rho0 = 1500.0, 1000.0
    f0 = 0.5e6
    p0 = 60000.0
    L = 0.12  # reference PH1/solver-speed domain scale (m)

    import time as _t

    _t0 = _t.perf_counter()

    def _log(msg):
        if os.environ.get("BENCH_VERBOSE"):
            print(f"[{_t.perf_counter()-_t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    _log("creating mesh")
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    _log("tagging boundaries")
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9}
    )
    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)

    _log("building model")
    model = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
    )
    _log("model built")
    model.init()
    ndofs = model.number_of_dofs()

    # Runtime self-check: the fused pallas kernels must agree with the XLA
    # lattice path on this exact problem shape, else fall back (a tile-size
    # bug once silently corrupted 20% of one axis at G=513).
    ops = model.ops
    pk = ops.pallas2
    if pk is not None:
        try:
            xs = jax.random.normal(jax.random.PRNGKey(0), ops.lattice.gdims, dtype)
            y_p = pk.apply([xs], [pk.pack_const(1.0)])
            y_x = ops.lattice.apply_scaled([(xs, ops.pack_scales(1.0))])
            rel = float(jnp.max(jnp.abs(y_p - y_x)) / jnp.max(jnp.abs(y_x)))
            ok = np.isfinite(rel) and rel <= 1e-4
        except Exception as e:  # compile/runtime failure == failed check
            _log(f"pallas self-check raised {type(e).__name__}: {e}")
            rel, ok = float("nan"), False
        if not ok:
            _log(f"pallas self-check FAILED (rel {rel:.2e}); using XLA path")
            os.environ["FUS_PALLAS"] = "0"
            model = LinearSpectralExplicit(
                mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
            )
            model.init()
        else:
            _log(f"pallas self-check ok (rel {rel:.2e})")

    # Build the jitted scan once, warm up, then time the full nsteps run.
    model._build()
    solve = model._solve
    consts = model.consts
    u, v = model.u_n, model.v_n

    # warmup with the SAME dts shape (scan length is baked into the
    # compiled program — a different length would retrace). A scalar
    # readback forces real completion: block_until_ready returns early on
    # the axon relay backend.
    _log("warmup solve (compile)")
    try:
        uw, vw, _ = solve(consts, u, v, 0.0, nsteps * dt, dt)
        _log("warmup dispatched; forcing readback")
        _ = float(jnp.sum(uw))
    except Exception as e:
        # the fused stage/step kernel compiles here (a different program from
        # the self-checked bare apply) — degrade one rung at a time: first
        # drop the opt-in wavefront step back to the v3 per-stage kernels,
        # then (only if that also fails) fall back to the XLA scan.
        _log(f"fused warmup raised {type(e).__name__}: {e}")
        ladder = []
        if os.environ.get("FUS_STEP_WAVE", "") == "1":
            ladder.append(("FUS_STEP_WAVE", "0", "v3 per-stage fallback"))
        ladder.append(("FUS_PALLAS", "0", "XLA fallback"))
        for var, val, label in ladder:
            _log(label)
            os.environ[var] = val
            model = LinearSpectralExplicit(
                mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
            )
            model.init()
            model._build()
            solve = model._solve
            consts = model.consts
            u, v = model.u_n, model.v_n
            try:
                uw, vw, _ = solve(consts, u, v, 0.0, nsteps * dt, dt)
                _ = float(jnp.sum(uw))
                break
            except Exception as e2:
                _log(f"{label} warmup raised {type(e2).__name__}: {e2}")
        else:
            raise
    _log("warmup complete")

    t0 = time.perf_counter()
    uf, vf, tf = solve(consts, u, v, 0.0, nsteps * dt, dt)
    checksum = float(jnp.sum(jnp.abs(uf)))
    elapsed = time.perf_counter() - t0

    assert np.isfinite(checksum)
    value = ndofs * nsteps / elapsed / 1e9
    baseline = 0.122  # GDOF·RK4-steps/s per 76-proc Icelake node (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "GDOF-RK4-updates/sec/chip (3D linear p=4, "
                f"{ndofs/1e6:.1f}M DOF, {nsteps} steps, fp32)",
                "value": round(value, 4),
                "unit": "GDOF-steps/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
