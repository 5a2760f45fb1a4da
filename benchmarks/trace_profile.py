"""One-shot profiler trace of the fused RK step at the headline shape.

VERDICT r3 #9: the 0.81 ms/pass and per-stage fixed-cost numbers came
from slope fits, never from a real profiler. This captures a
jax.profiler trace of (a) the per-stage v3 path and (b) the wavefront
step for a few steps at nx=104 and prints the trace location + a summary
of the largest on-device ops parsed from the trace protos, so the fit
numbers can be reconciled without TensorBoard.

The axon relay backend may not support device tracing; in that case the
script reports that honestly and exits 0 (host-side trace only is not
useful for kernel attribution).

Run: python benchmarks/trace_profile.py [--nx 104] [--steps 6]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def summarize_trace(tracedir, top=15):
    """Best-effort parse of the trace-viewer JSON (trace.json.gz) for
    device-lane event durations."""
    hits = glob.glob(
        os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
    )
    if not hits:
        print(f"  no trace.json.gz under {tracedir} (backend likely does "
              "not export device traces)")
        return False
    with gzip.open(hits[0], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    if not events:
        print("  trace has no duration events")
        return False
    # aggregate by name
    agg = {}
    for e in events:
        agg.setdefault(e["name"], [0.0, 0])
        agg[e["name"]][0] += e["dur"] / 1e3  # ms
        agg[e["name"]][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"  top ops by total time ({hits[0]}):")
    for name, (ms, n) in rows:
        print(f"    {ms:9.2f} ms  x{n:<5d} {name[:90]}")
    return True


def main(nx, steps, wave):
    os.environ["FUS_STEP_WAVE"] = "1" if wave else "0"
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries

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
    solve = model._solve
    # warm up (compile outside the trace)
    u, v, t = solve(model.consts, model.u_n, model.v_n, 0.0, steps * dt, dt)
    _ = float(jnp.sum(u))

    label = "wave" if wave else "v3"
    tracedir = os.path.join("/tmp", f"fus_trace_{label}_nx{nx}")
    print(f"tracing {label} path, {steps} steps at nx={nx} -> {tracedir}")
    try:
        with jax.profiler.trace(tracedir):
            u, v, t = solve(model.consts, u, v, 0.0, steps * dt, dt)
            _ = float(jnp.sum(u))
    except Exception as e:
        print(f"  profiler unavailable on this backend: "
              f"{type(e).__name__}: {str(e).splitlines()[0][:150]}")
        return 0
    ok = summarize_trace(tracedir)
    print("trace capture", "OK" if ok else "EMPTY (relay backend limitation)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=104)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--wave", action="store_true")
    args = ap.parse_args()
    sys.exit(main(args.nx, args.steps, args.wave))
