"""Headline benchmark: 3D linear p=4 RK4 solve throughput on one TPU chip.

Reproduces the reference's ``measure_solver_speed`` experiment
(``cpp/fenicsx-sf-naive/experiments/measure_solver_speed``): 3D linear wave,
p=4 hex mesh, ~70.9M DOF, 101 RK4 steps. Reference best: 58.6 s on a 76-proc
Icelake node ≈ 0.122 GDOF·RK4-steps/s/node (BASELINE.md). We report
GDOF·RK4-updates/s on one TPU chip; vs_baseline is the node-for-chip ratio.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Survivability design (round 5 — VERDICT r4 "Next round" #1):
every measurement rung runs in its OWN SUBPROCESS.  BENCH_r04 emitted a
structured record but the value was 0.0 because all ladder rungs shared one
process: after the full-shape rung failed, its device buffers stayed pinned
(locals + exception ``__traceback__``) and every subsequent rung died
RESOURCE_EXHAUSTED.  A child process that exits returns ALL of its HBM, so
the fallback rungs start clean.  The parent only sequences the ladder,
enforces the internal wall-clock deadline (BENCH_DEADLINE, default 450 s —
under any plausible driver kill), and re-emits the winning child's JSON.

The exact-shape pallas-vs-XLA self-check is NOT run here any more (it
compiled a second full-72.5M-DOF XLA program while the pallas model was
resident — the proximate OOM trigger in r4); it lives in
``benchmarks/mosaic_smoke.py`` (production-shape tier) where it has a
process to itself.  The wavefront step (1.12× at best, VMEM-brittle) is
also off by default for the driver bench; FUS_STEP_WAVE=1 re-enables it.

Ladder (first rung to produce a finite value wins):
  A. nx=104 (72.5M DOF), fused pallas v3 per-stage path
  B. nx=64  (17.0M DOF), fused pallas v3 per-stage path  [degraded label]
  C. nx=64  (17.0M DOF), pure-XLA lattice path           [degraded label]
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE = 0.122  # GDOF·RK4-steps/s per 76-proc Icelake node (BASELINE.md)

T0 = time.monotonic()
DEADLINE = float(os.environ.get("BENCH_DEADLINE", "450"))

_lock = threading.Lock()
_state = {"stage": "start", "phases": [], "result": None}


def _elapsed() -> float:
    return time.monotonic() - T0


def _remaining() -> float:
    return DEADLINE - _elapsed()


def _mark(stage: str) -> None:
    with _lock:
        _state["phases"].append([_state["stage"], round(_elapsed(), 1)])
        _state["stage"] = stage
    if os.environ.get("BENCH_VERBOSE"):
        print(f"[{_elapsed():7.1f}s] {stage}", file=sys.stderr, flush=True)


def _metric(ndofs_m: float, nsteps: int) -> str:
    return (
        "GDOF-RK4-updates/sec/chip (3D linear p=4, "
        f"{ndofs_m:.1f}M DOF, {nsteps} steps, fp32)"
    )


# DOF count for an nx^3 box at p=4: (4*nx+1)^3 (closed GLL lattice).
def _ndofs(nx: int) -> int:
    return (4 * nx + 1) ** 3


def _emit(obj: dict) -> bool:
    """Print the single JSON result line exactly once."""
    with _lock:
        if _state["result"] is not None:
            return False
        _state["result"] = obj
    print(json.dumps(obj), flush=True)
    return True


def _fail_json(reason: str, nx: int, nsteps: int) -> None:
    """Emit a parseable one-line record instead of a traceback so neither a
    backend outage (VERDICT r2) nor a deadline-busting compile (VERDICT r3)
    nor an OOM cascade (VERDICT r4) erases a round's perf evidence.  The
    metric label reflects the shape actually attempted (ADVICE r4 #2)."""
    with _lock:
        stage = _state["stage"]
        phases = list(_state["phases"])
    _emit(
        {
            "metric": _metric(_ndofs(nx) / 1e6, nsteps),
            "value": 0.0,
            "unit": "GDOF-steps/s",
            "vs_baseline": 0.0,
            "error": reason,
            "stage": stage,
            "phases": phases,
            "elapsed_s": round(_elapsed(), 1),
        }
    )


def _watchdog(nx: int, nsteps: int) -> None:
    """Hard internal deadline: independent of whatever the main thread is
    stuck in, print the structured failure and exit 0.  os._exit is
    deliberate — a blocked subprocess.run in the main thread cannot be
    interrupted, only abandoned (children get SIGKILLed by their own
    timeouts or die with the process group)."""
    while True:
        rem = _remaining()
        if rem <= 0:
            break
        time.sleep(min(rem, 2.0))
    if _state["result"] is None:
        _fail_json(
            f"internal deadline {DEADLINE:.0f}s expired during stage "
            f"'{_state['stage']}'",
            nx,
            nsteps,
        )
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _probe_backend(timeout_s: float):
    """Check backend init in a SUBPROCESS so a wedged relay (the axon client
    retries forever inside jax.devices(), hanging the process) is bounded by
    a kill, not trusted to raise. Returns (ok, detail)."""
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


def ensure_backend(nx: int, nsteps: int) -> bool:
    """Bounded retry/backoff on backend availability; on exhaustion print a
    structured failure JSON.  Returns True when the backend answered."""
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "5"))
    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT", "90"))
    backoff_s = float(os.environ.get("BENCH_INIT_BACKOFF", "45"))
    detail = "no probe run"
    for attempt in range(retries):
        budget = min(timeout_s, _remaining() - 30.0)
        if budget <= 0.5:
            break
        ok, detail = _probe_backend(budget)
        if ok:
            return True
        print(
            f"[bench] backend probe {attempt + 1}/{retries} failed: {detail}",
            file=sys.stderr,
            flush=True,
        )
        if attempt < retries - 1 and _remaining() > backoff_s + timeout_s:
            time.sleep(backoff_s)
    _fail_json(f"backend unavailable after probes: {detail}", nx, nsteps)
    return False


# ---------------------------------------------------------------------------
# Child: one rung = build + warmup-compile + timed run, in a fresh process.
# Invoked as `python bench.py --rung <nx> <nsteps>`; env selects the path.
# ---------------------------------------------------------------------------


def _rung_child(nx: int, nsteps: int) -> None:
    t_start = time.monotonic()

    def say(msg):
        print(f"[rung {time.monotonic()-t_start:6.1f}s] {msg}", file=sys.stderr, flush=True)

    say("importing jax")
    import jax.numpy as jnp
    import numpy as np

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries

    degree = 4
    dtype = jnp.float32
    c0, rho0 = 1500.0, 1000.0
    f0, p0 = 0.5e6, 60000.0
    L = 0.12  # reference PH1/solver-speed domain scale (m)
    say("building mesh")
    mesh = create_box((nx, nx, nx), (0, 0, 0), (L, L, L))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9})
    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)
    say("model init")
    model = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
    )
    model.init()
    ndofs = model.number_of_dofs()
    say(f"built nx={nx}: {ndofs/1e6:.1f}M DOF; model._build")

    model._build()
    solve = model._solve
    consts = model.consts
    u, v = model.u_n, model.v_n

    # Warmup with the SAME dts shape (scan length is baked into the compiled
    # program).  A scalar readback forces real completion: block_until_ready
    # returns early on the axon relay backend.
    say("warmup (compile + first solve)")
    uw, vw, _ = solve(consts, u, v, 0.0, nsteps * dt, dt)
    _ = float(jnp.sum(uw))
    say("warmup done; timed run")

    t0 = time.perf_counter()
    uf, vf, tf = solve(consts, u, v, 0.0, nsteps * dt, dt)
    checksum = float(jnp.sum(jnp.abs(uf)))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)
    value = ndofs * nsteps / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": _metric(ndofs / 1e6, nsteps),
                "value": round(value, 4),
                "unit": "GDOF-steps/s",
                "vs_baseline": round(value / BASELINE, 2),
            }
        ),
        flush=True,
    )


def _parse_child_json(stdout: str):
    """Last stdout line that parses as a dict with a finite 'value' wins."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "value" in obj:
            return obj
    return None


def _run_rung(nx: int, nsteps: int, env_overrides: dict, timeout_s: float):
    """Run one rung in a child process.  Returns (result_dict | None, note).
    Process exit returns all of the rung's device memory — the property the
    in-process ladder lacked (BENCH_r04 OOM cascade)."""
    env = dict(os.environ)
    env.update(env_overrides)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--rung", str(nx), str(nsteps)],
            timeout=max(timeout_s, 1.0),
            capture_output=True,
            text=True,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout >{timeout_s:.0f}s"
    if os.environ.get("BENCH_VERBOSE") and r.stderr:
        print(r.stderr, file=sys.stderr, flush=True)
    obj = _parse_child_json(r.stdout)
    if obj is not None and obj.get("value", 0) > 0:
        return obj, "ok"
    tail_lines = (r.stderr.strip().splitlines() or [f"rc={r.returncode}"])
    # Last line carrying an exception name beats a bare traceback frame.
    tail = tail_lines[-1]
    for cand in reversed(tail_lines):
        if "Error" in cand or "error" in cand.lower():
            tail = cand.strip()
            break
    return None, f"rc={r.returncode}: {tail[:300]}"


# Phase cost estimates, cold, on the 1-core host VM + v5e relay (2026-08-20
# measurements; no compile cache survives across processes on this backend —
# verified: JAX_COMPILATION_CACHE_DIR stays empty under axon, and a second
# process pays full compile again).  Generous so a modest slowdown still
# fits; a pathological one hits the child timeout, frees its HBM by exit,
# and the ladder moves on.
EST_FULL_RUNG = 320.0  # nx=104: build ~110 s + compile ~60 s + 2 runs ~60 s
EST_SMALL_RUNG = 150.0  # nx=64
MARGIN = 20.0  # parent needs this much to emit + run the next probe


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--rung":
        _rung_child(int(sys.argv[2]), int(sys.argv[3]))
        return

    nx = int(os.environ.get("BENCH_NX", "104"))
    nx_fb = int(os.environ.get("BENCH_NX_FALLBACK", "64"))
    nsteps = int(os.environ.get("BENCH_STEPS", "101"))

    threading.Thread(target=_watchdog, args=(nx, nsteps), daemon=True).start()

    _mark("backend probe")
    if not ensure_backend(nx, nsteps):
        return

    # The wavefront step is off for the driver bench unless explicitly
    # requested: 1.12× at best and VMEM-brittle (VERDICT r4 weak #4).
    base_env = {"FUS_STEP_WAVE": os.environ.get("FUS_STEP_WAVE", "0")}

    ladder = [
        (nx, base_env, EST_FULL_RUNG, None),
        (nx_fb, base_env, EST_SMALL_RUNG, "degraded rung"),
        (nx_fb, {**base_env, "FUS_PALLAS": "0"}, EST_SMALL_RUNG, "degraded rung (XLA path)"),
    ]

    notes = []
    for rung_nx, env_over, est, label in ladder:
        budget = _remaining() - MARGIN
        if budget < 60.0:
            notes.append(f"nx={rung_nx} skipped (budget {budget:.0f}s)")
            break
        timeout_s = min(est, budget)
        _mark(f"rung nx={rung_nx} ({label or 'primary'}, timeout {timeout_s:.0f}s)")
        res, note = _run_rung(rung_nx, nsteps, env_over, timeout_s)
        if res is not None:
            if label:
                res["note"] = "; ".join(notes + [label]) if notes else label
            elif notes:
                res["note"] = "; ".join(notes)
            _emit(res)
            return
        notes.append(f"nx={rung_nx} failed ({note})")
        _mark(f"rung nx={rung_nx} failed: {note[:120]}")

    _fail_json("all rungs failed: " + " | ".join(notes), nx, nsteps)


if __name__ == "__main__":
    main()
