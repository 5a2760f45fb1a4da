"""Long-run fp32 drift vs an fp64 oracle (VERDICT r3 weak #6).

Production runs march 7488+ RK4 steps in fp32 (the committed 1.1 MHz H131
artifact); the round-3 record characterized fp32 drift only to 400 steps
(3e-3 relative). This harness marches a reduced CW problem — the same
physics family, windowed source + ABC, steady periodic state — in fp32 and
fp64 side by side on CPU and records the relative L2 divergence at
checkpoints out past the production step count, plus each run's error
against the analytical planewave (so discretization error and dtype drift
are visible separately).

The drift mechanism (rounding accumulation in the RK axpys and operator
applies over ~1e4 steps of a bounded-amplitude periodic state) is
dimension-independent; the reduced 2D channel is exactly a 1D plane wave.
TPU caveat: the b4 split-bf16 MXU path adds a per-apply error of 5.0e-6
(measured, ops/pallas_lattice.py) on top of fp32 rounding — same order as
fp32 eps accumulation, so the CPU fp32 curve is representative within ~2x.

Run: python benchmarks/fp32_drift.py [--steps 8000] [--model linear|westervelt]
Writes benchmarks/fp32_drift.txt.
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def build(model_kind, dtype):
    import jax
    import jax.numpy as jnp

    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    import fenicsxfus_tpu as fus

    f0, p0, c0, rho0 = 10.0, 4.0, 1.0, 4.0
    nx = 41
    mesh = fus.create_rectangle((nx, 6), (0, 0), (1.0, 0.15))
    fus.tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
    )
    dt = 0.9 * (1.0 / nx) / (c0 * 16)
    if model_kind == "westervelt":
        # modest nonlinearity + attenuation: the production H131 physics.
        # beta chosen so the shock distance rho0 c0^3/(beta w0 p0) ~ 3.2
        # domain lengths — nonlinear steepening without shock blow-up.
        delta0, beta0 = 2e-4, 0.005
        m = fus.WesterveltSpectralExplicit(
            mesh, None, 4, c0, rho0, delta0, beta0, f0, p0, c0, 4, dt,
            dtype=dtype,
        )
    else:
        m = fus.LinearSpectralExplicit(
            mesh, None, 4, c0, rho0, f0, p0, c0, 4, dt, dtype=dtype
        )
    m.init()
    return m, dt


def main(steps, model_kind, out):
    import jax.numpy as jnp

    from fenicsxfus_tpu.analysis.analytical import planewave
    from fenicsxfus_tpu.analysis.error import relative_l2_error

    checkpoints = sorted(
        {c for c in (250, 500, 1000, 2000, 4000, 7488, steps) if c <= steps}
    )
    m64, dt = build(model_kind, jnp.float64)
    m32, _ = build(model_kind, jnp.float32)
    c0, f0, p0 = 1.0, 10.0, 4.0

    rows = []
    t_prev = 0.0
    for nstep in checkpoints:
        tf = nstep * dt
        m64.rk(t_prev, tf)
        m32.rk(t_prev, tf)
        t_prev = tf
        assert m32.u_n.dtype == jnp.float32  # x64 mode must not promote
        assert m64.u_n.dtype == jnp.float64
        if not np.all(np.isfinite(np.asarray(m64.u_n))):
            raise RuntimeError(
                f"fp64 field non-finite at step {nstep} — the reduced "
                "problem blew up; drift numbers would be meaningless"
            )
        u64 = np.asarray(m64.u_n, np.float64)
        u32 = np.asarray(m32.u_n, np.float64)
        scale = max(float(np.max(np.abs(u64))), 1e-300)
        drift_max = float(np.max(np.abs(u32 - u64))) / scale
        drift_l2 = float(
            np.linalg.norm(u32 - u64) / max(np.linalg.norm(u64), 1e-300)
        )
        if model_kind == "linear" and tf > 1.0 / c0 + 0.5:
            err64 = float(relative_l2_error(
                m64.ops, m64.u_n, lambda x: planewave(x[0], tf, c0, f0, p0)
            ))
            err32 = float(relative_l2_error(
                m32.ops, jnp.asarray(u32), lambda x: planewave(x[0], tf, c0, f0, p0)
            ))
        else:
            err64 = err32 = float("nan")
        rows.append((nstep, drift_l2, drift_max, err64, err32))
        print(
            f"steps {nstep:6d}: drift L2 {drift_l2:.3e} max {drift_max:.3e}"
            + ("" if np.isnan(err64) else
               f"  analytic err fp64 {err64:.3e} fp32 {err32:.3e}"),
            flush=True,
        )

    with open(out, "w") as f:
        f.write(
            "# fp32 vs fp64 drift, reduced CW problem "
            f"({model_kind}, 2D channel 41x6 p=4, CPU, {steps} steps)\n"
            "# produced by benchmarks/fp32_drift.py; gates in "
            "tests/test_fp32_drift.py\n"
            "# steps  drift_l2  drift_max  analytic_err_fp64  analytic_err_fp32\n"
        )
        for r in rows:
            f.write(
                f"{r[0]:7d}  {r[1]:.4e}  {r[2]:.4e}  {r[3]:.4e}  {r[4]:.4e}\n"
            )
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--model", default="linear",
                    choices=("linear", "westervelt"))
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "fp32_drift.txt"
        ),
    )
    args = ap.parse_args()
    main(args.steps, args.model, args.out)
