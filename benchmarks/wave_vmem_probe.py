"""Compile-only VMEM probe of the wavefront-fused RK4 step at a given nx.

The wave kernel's block-size picker (``_wave_pick_be``) works from an
analytic footprint model; this harness compiles (without running) the
kernel at the exact production shape and surfaces Mosaic/XLA's REAL VMEM
request, so the model can be calibrated instead of guessed at.

Run: python benchmarks/wave_vmem_probe.py [nx] [be]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import time

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-t0:7.1f}s] {msg}", flush=True)


def main(nx, be_forced):
    if be_forced:
        os.environ["FUS_WAVE_BE"] = str(be_forced)
    import jax
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries
    from fenicsxfus_tpu.models.common import explicit_tables
    from fenicsxfus_tpu.ops.pallas_stage import KIND_DENSE, KIND_FACET
    from fenicsxfus_tpu.ops.pallas_step_wave import (
        FusedRKStepWave,
        _wave_pick_be,
        _wave_vmem_bytes,
        try_separate_field,
    )

    c0, rho0, f0, p0 = 1500.0, 1000.0, 0.5e6, 60000.0
    L, degree = 0.12, 4
    log(f"building model nx={nx}")
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
    import numpy as _np

    sep = try_separate_field(_np.asarray(model.consts["inv_m"]), pk.gdims)
    if sep is not None:
        wave.sep_invm = True
        extras = (
            [
                jnp.asarray(sep[0], jnp.float32),
                jnp.asarray(sep[1], jnp.float32),
            ],
            extras[1],
        )
    nde, nf = len(KIND_DENSE[kind]), len(Fs)
    be = _wave_pick_be(pk, nde, nf, any(hetero), wave.sep_invm)
    est = _wave_vmem_bytes(
        pk.gdims, be or 1, pk.p, nde, nf, any(hetero), wave.sep_invm
    )
    log(
        f"gdims={pk.gdims} sep={wave.sep_invm} picked be={be} "
        f"model-estimate={est/2**20:.1f} MiB"
    )
    if be is None:
        log("picker says no block size fits; forcing be=1 for the probe")
        os.environ["FUS_WAVE_BE"] = "1"

    W = 2 + (len(KIND_FACET[kind]) - 1) + 1 + 3 + 4
    scal4 = jnp.zeros((4, W), jnp.float32)
    gd = pk.gdims

    def f(u, v, sc, F, ex):
        return wave._step_call(u, v, sc, F, ex)

    import numpy as np

    u0 = jnp.zeros(gd, jnp.float32)
    v0 = jnp.zeros(gd, jnp.float32)
    log("lowering")
    lowered = jax.jit(f, donate_argnums=(0, 1)).lower(u0, v0, scal4, Fs, extras)
    log("compiling")
    try:
        compiled = lowered.compile()
    except Exception as e:
        msg = str(e)
        log("COMPILE FAILED")
        # keep the summary lines (request/limit), drop the allocation dump
        for line in msg.splitlines():
            low = line.lower()
            if "vmem" in low or "exceed" in low or "bytes" in low[:60]:
                print(line, flush=True)
        print("---- first 30 lines ----", flush=True)
        print("\n".join(msg.splitlines()[:30]), flush=True)
        return 1
    log("compile OK")
    mem = compiled.memory_analysis()
    log(f"memory_analysis: {mem}")
    return 0


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 104
    be = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(main(nx, be))
