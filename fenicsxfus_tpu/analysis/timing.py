"""Named wall-clock timers (reference: ``dolfinx::common::Timer`` scopes +
``list_timings`` tables, ``cpp/fenicsx-sf/experiments/
measure_fraction_of_peak_performance/main.cpp:112-121``).

Includes a device-honest ``sync`` hook: on the axon TPU relay,
``block_until_ready`` can return before execution finishes, so timed device
work must force a scalar readback.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_records: dict[str, list[float]] = defaultdict(list)


def sync(x) -> None:
    """Force completion of device work feeding ``x`` (scalar readback)."""
    import jax.numpy as jnp

    if hasattr(x, "dtype"):
        float(jnp.sum(x) if getattr(x, "ndim", 0) else x)


@contextmanager
def Timer(name: str, result=None):
    """Time a scope; pass the output array as ``result`` to include device
    execution (not just dispatch) in the measurement."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if result is not None:
            sync(result)
        _records[name].append(time.perf_counter() - t0)


def timeit_device(name: str, fn, *args, n: int = 10, warmup: int = 1) -> float:
    """min-of-n device timing with forced readback (reference records the
    min over runs in ``operator_timings_min.txt``)."""
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    _records[name].append(best)
    return best


def list_timings(reduction=min, clear: bool = False) -> str:
    """Formatted table of recorded timings (wall, reduced over repeats)."""
    lines = [f"{'name':<48} {'reps':>5} {'wall (s)':>12}"]
    for name in sorted(_records):
        vals = _records[name]
        lines.append(f"{name:<48} {len(vals):>5} {reduction(vals):>12.6f}")
    out = "\n".join(lines)
    if clear:
        _records.clear()
    return out


def reset_timings() -> None:
    _records.clear()
