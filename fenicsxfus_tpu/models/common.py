"""Shared time-integration machinery for the wave models.

Butcher tables (explicit RK 1-4 and SDIRK 1-4) match the reference exactly
(``python/src/fenicsxfus/_linear.py:40-65`` explicit, ``:543-585`` DIRK).
The whole time loop is a single jitted ``lax.scan`` over per-step dt values;
each step unrolls the RK stages so XLA fuses operator application, diagonal
mass inverse and AXPY stage updates into one compiled program — the
TPU-native version of the reference's per-stage PETSc vector kernel loop
(``cpp/fenicsx-sf/common/Linear.hpp:228-314``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def explicit_tables(order: int):
    """Explicit RK tables: forward Euler, Ralston 2/3, classical RK4.

    These schemes use only the previous stage slope, encoded as a vector
    ``a`` (stage shift multiplies k_{i-1}) exactly like the reference.

    Returned as tuples of PYTHON floats: a np.float64 scalar coefficient
    would promote fp32 fields to fp64 inside jit when x64 is enabled,
    breaking the scan carry dtype.
    """
    if order == 1:
        return (0.0,), (1.0,), (0.0,)
    if order == 2:
        return (0.0, 2 / 3), (1 / 4, 3 / 4), (0.0, 2 / 3)
    if order == 3:
        return (0.0, 1 / 2, 3 / 4), (2 / 9, 1 / 3, 4 / 9), (0.0, 1 / 2, 3 / 4)
    if order == 4:
        return (
            (0.0, 0.5, 0.5, 1.0),
            (1 / 6, 1 / 3, 1 / 3, 1 / 6),
            (0.0, 0.5, 0.5, 1.0),
        )
    raise ValueError(f"unsupported explicit RK order {order}")


def dirk_tables(order: int):
    """SDIRK tables: backward Euler, Crouzeix 2/3-stage, 4-stage.

    ``A`` is a nested tuple (index ``A[i][j]``); Python floats for the same
    weak-promotion reason as ``explicit_tables``.
    """
    if order == 1:
        return ((1.0,),), (1.0,), (1.0,)
    if order == 2:
        return (
            ((1 / 4, 0.0), (1 / 2, 1 / 4)),
            (1 / 2, 1 / 2),
            (1 / 4, 3 / 4),
        )
    if order == 3:
        q = float(2 * np.cos(np.pi / 18) / np.sqrt(3))
        return (
            (
                ((1 + q) / 2, 0.0, 0.0),
                (-q / 2, (1 + q) / 2, 0.0),
                (1 + q, -(1 + 2 * q), (1 + q) / 2),
            ),
            (1 / (6 * q**2), 1 - 1 / (3 * q**2), 1 / (6 * q**2)),
            ((1 + q) / 2, 1 / 2, (1 - q) / 2),
        )
    if order == 4:
        return (
            (
                (1 / 2, 0.0, 0.0, 0.0),
                (1 / 6, 1 / 2, 0.0, 0.0),
                (-1 / 2, 1 / 2, 1 / 2, 0.0),
                (3 / 2, -3 / 2, 1 / 2, 1 / 2),
            ),
            (3 / 2, -3 / 2, 1 / 2, 1 / 2),
            (1 / 2, 2 / 3, 1 / 2, 1.0),
        )
    raise ValueError(f"unsupported DIRK order {order}")


def step_sizes(t0: float, tf: float, dt: float) -> np.ndarray:
    """Per-step dt values reproducing the reference loop
    ``while t < tf: dt = min(dt, tf - t)`` (``_linear.py:475-476``)."""
    span = tf - t0
    n_full = int(np.floor(span / dt + 1e-12))
    rem = span - n_full * dt
    dts = [dt] * n_full
    if rem > 1e-12 * max(abs(span), 1.0):
        dts.append(rem)
    return np.array(dts if dts else [0.0])


def source_window(t, freq: float, alpha: float = 4.0):
    """Cosine ramp window over ``alpha`` source periods and its derivative
    (reference ``_lossy.py:169-180``)."""
    T = 1.0 / freq
    ramp = 0.5 * (1.0 - jnp.cos(freq * jnp.pi * t / alpha))
    dramp = 0.5 * jnp.pi * freq / alpha * jnp.sin(freq * jnp.pi * t / alpha)
    on = t < T * alpha
    return jnp.where(on, ramp, 1.0), jnp.where(on, dramp, 0.0)


def make_scan_from_step(step, dtype):
    """Wrap a ``step(consts, (u, v, t), dt) -> ((u, v, t'), None)`` function
    into the jitted, segmented time loop
    ``solve(consts, u, v, t0, tf, dt) -> (u, v, t)``.

    If the step declares ``carry_shape`` (the fused pallas steps do), u/v
    are carried through the scan in that 3D lattice shape and flattened
    once per launch: a flat [n] carry forces a physical 1D<->3D retiling
    copy per step on TPU (different tiled layouts) — measured ~11 ms/step
    at the 72.5M-DOF headline (benchmarks/wave_attrib.py)."""
    carry_shape = getattr(step, "carry_shape", None)

    @jax.jit
    def run(consts, u, v, t0, xs):
        if carry_shape is not None:
            u = u.reshape(carry_shape)
            v = v.reshape(carry_shape)

        def body(carry, x):
            dtn, tn = x
            u_, v_, _ = carry
            # the carried t is REPLACED by the host-precomputed fp64 step
            # time each step: accumulating t in the model dtype loses
            # ~eps·|t| per step, which over ~1e4 CW steps is an O(0.5 rad)
            # source-phase error — the dominant fp32 long-run drift term
            # (benchmarks/fp32_drift.py).
            return step(consts, (u_, v_, tn), dtn)

        (u, v, t), _ = jax.lax.scan(body, (u, v, t0), xs)
        return u.reshape(-1), v.reshape(-1), t

    def solve(consts, u, v, t0: float, tf: float, dt: float):
        dts = np.asarray(step_sizes(t0, tf, dt))
        return run_segmented(run, consts, u, v, t0, dts, dtype)

    return solve


def make_recording_scan(step, dtype, extract):
    """Like ``make_scan_from_step`` but records point-sensor time series
    *inside* the scan (device-side, no per-step host round trips — the
    reference extracts sensors only after the run,
    ``python/benchmarks/MENDOUSSE/mendousse.py`` tail):
    ``solve(consts, u, v, t0, tf, dt) -> (u, v, t, ys)`` with ``ys`` of
    shape [n_steps, n_sensors] sampling ``extract(u)`` after every full
    step. ``extract`` must be TPU-cheap — see
    ``ExplicitModelBase._sensor_extractor`` (a raw per-step scalar gather
    from the full field measured 37x slower than the step itself)."""
    carry_shape = getattr(step, "carry_shape", None)

    @jax.jit
    def run(consts, u, v, t0, xs):
        if carry_shape is not None:
            # 3D carry: see make_scan_from_step
            u = u.reshape(carry_shape)
            v = v.reshape(carry_shape)

        def body(carry, x):
            dtn, tn = x
            u_, v_, _ = carry
            out, _ = step(consts, (u_, v_, tn), dtn)
            return out, extract(out[0])

        (u, v, t), ys = jax.lax.scan(body, (u, v, t0), xs)
        return u.reshape(-1), v.reshape(-1), t, ys

    def solve(consts, u, v, t0, tf, dt):
        dts = np.asarray(step_sizes(t0, tf, dt))
        return run_segmented(
            run, consts, u, v, t0, dts, dtype, collect_ys=True
        )

    return solve


def make_rk_step(rhs, order: int):
    """Reference explicit-RK step (a-vector tables):
    ``step(consts, (u, v, t), dt) -> ((u, v, t+dt), None)``.

    ``rhs(consts, t, u, v) -> (ku, kv)`` is the model's slope function with
    its device data passed as the ``consts`` pytree. Consts are jit
    *arguments* (not closure constants) on purpose: closed-over arrays get
    baked into the serialized HLO, which breaks remote-compile backends at
    large problem sizes.
    """
    a, b, c = explicit_tables(order)

    def step(consts, carry, dtn):
        u0, v0, t = carry
        ku = jnp.zeros_like(u0)
        kv = jnp.zeros_like(v0)
        u_acc, v_acc = u0, v0
        for i in range(len(b)):
            un = u0 + (a[i] * dtn) * ku
            vn = v0 + (a[i] * dtn) * kv
            tn = t + c[i] * dtn
            ku, kv = rhs(consts, tn, un, vn)
            u_acc = u_acc + (b[i] * dtn) * ku
            v_acc = v_acc + (b[i] * dtn) * kv
        return (u_acc, v_acc, t + dtn), None

    return step


def make_rk_scan(rhs, order: int, dtype):
    """``solve(consts, u, v, t0, tf, dt) -> (u, v, t)`` for ``rhs`` —
    see ``make_rk_step``."""
    return make_scan_from_step(make_rk_step(rhs, order), dtype)


def run_segmented(run, consts, u, v, t0, dts, dtype, collect_ys=False):
    """Execute a step loop in bounded launches.

    Very long single scans (≳5000 steps / many minutes of continuous
    execution) crash the axon TPU worker ("TPU worker process crashed or
    restarted"); splitting into fixed-size segments keeps each program
    execution short. Segment size is fixed so at most two programs compile
    (the main size and one remainder); a scalar sync between segments
    bounds the dispatch queue. Tunable via FUS_MAX_STEPS_PER_LAUNCH.

    With ``collect_ys`` the runner returns a fourth output (per-step scan
    outputs, concatenated across segments on host).

    The scan xs handed to ``run`` is the PAIR ``(dts, ts)`` where ``ts``
    holds each step's START time, precomputed here in float64 — scan
    bodies substitute ts[i] for the carried t so the source phase never
    accumulates model-dtype rounding (the dominant fp32 long-run drift
    term, ~0.5 rad over 7.5k steps; ``benchmarks/fp32_drift.py``)."""
    import os

    K = int(os.environ.get("FUS_MAX_STEPS_PER_LAUNCH", "500"))
    dts64 = np.asarray(dts, np.float64)
    ts64 = float(t0) + np.concatenate([[0.0], np.cumsum(dts64)[:-1]])
    t = jnp.asarray(t0, dtype)
    i = 0
    n = len(dts)
    ys_parts = []
    while i < n:
        seg = (
            jnp.asarray(dts[i : i + K], dtype),
            jnp.asarray(ts64[i : i + K], dtype),
        )
        out = run(consts, u, v, t, seg)
        if collect_ys:
            u, v, t, ys = out
            ys_parts.append(np.asarray(ys))
        else:
            u, v, t = out
        i += K
        if i < n:
            _ = float(t)  # sync: keep each launch's execution bounded
    if collect_ys:
        return u, v, t, np.concatenate(ys_parts, axis=0)
    return u, v, t
