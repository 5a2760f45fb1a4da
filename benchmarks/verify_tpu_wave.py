"""TPU drive of the wavefront-fused RK4 step (ops/pallas_step_wave.py).

A/B on the chip: run the identical 3D linear problem through the default
per-stage v3 path and through FUS_STEP_WAVE=1, compare final fields
(must agree to fp32 roundoff), and check the planewave analytical gate
like ``verify_tpu_v3.py``. Reference driver being fused:
``cpp/fenicsx-sf/common/Linear.hpp:228-314``.

Run: python benchmarks/verify_tpu_wave.py [nx]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax.numpy as jnp
import numpy as np


def run(nx, wave):
    os.environ["FUS_STEP_WAVE"] = "1" if wave else "0"
    from fenicsxfus_tpu import LinearSpectralExplicit, create_box, tag_boundaries
    from fenicsxfus_tpu.analysis.analytical import planewave
    from fenicsxfus_tpu.analysis.error import relative_l2_error
    from fenicsxfus_tpu.ops.pallas_step_wave import FusedRKStepWave

    calls = []
    orig = FusedRKStepWave._step_call

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    FusedRKStepWave._step_call = spy

    c0, rho0, f0, p0 = 1500.0, 1000.0, 0.5e6, 6e4
    L = 0.06
    mesh = create_box((nx, nx // 4, nx // 4), (0, 0, 0), (L, L / 4, L / 4))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-9, 2: lambda x: x[0] > L - 1e-9})
    degree = 4
    h = L / nx
    dt = 0.9 * h / (c0 * degree**2)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float32
    )
    eqn.init()
    tf = L / c0 + 4.0 / f0
    u, v, t = eqn.rk(0.0, tf)
    err = relative_l2_error(eqn.ops, u, lambda x: planewave(x[0], tf, c0, f0, p0))
    FusedRKStepWave._step_call = orig
    return np.asarray(u), float(err), bool(calls)


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    u_ref, err_ref, sel_ref = run(nx, wave=False)
    u_wave, err_wave, sel_wave = run(nx, wave=True)
    assert not sel_ref and sel_wave, (
        f"selection wrong: ref used wave={sel_ref}, wave run used wave={sel_wave}"
    )
    rel = float(
        np.max(np.abs(u_wave - u_ref)) / max(np.max(np.abs(u_ref)), 1e-30)
    )
    print(f"planewave rel-L2: v3={err_ref:.3e}  wave={err_wave:.3e}")
    print(f"wave vs v3 max-rel field diff: {rel:.3e}")
    # The two paths sum the same quantities in different orders, so their
    # fp32 fields drift apart with step count: bit-identical at nx=40
    # (~860 steps, chip 2026-08-19), 9.8e-5 at nx=104 (~2230 steps, chip
    # 2026-08-20) while the PHYSICS error of both was identical to 4
    # digits (6.980e-3 vs 6.981e-3). Gate: mutual diff at roundoff scale
    # (50x below the analytical error) and physics within tolerance.
    ok = rel < max(5e-5, 0.02 * err_wave) and err_wave < 5e-2
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)
