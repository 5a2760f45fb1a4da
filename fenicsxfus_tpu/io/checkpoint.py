"""Checkpoint / resume for time-stepped runs.

The reference has no checkpointing (SURVEY §5: "the RK loop state is
(u_, v_, t) — trivially checkpointable, but the reference never does").
Long pod-scale FUS runs need it, so here it is: the solver state plus
enough metadata to validate compatibility on restore.
"""

from __future__ import annotations

import numpy as np


def save_checkpoint(path: str, model, extra: dict | None = None) -> None:
    """Snapshot a model's time-stepping state (u_n, v_n, t [, w_n])."""
    data = {
        "u_n": np.asarray(model.u_n),
        "v_n": np.asarray(model.v_n),
        "t": float(model.t),
        "ndofs": model.ops.ndofs,
        "degree": model.degree,
        "dim": model.mesh.dim,
        "model": type(model).__name__,
    }
    if hasattr(model, "w_n"):  # Newmark carries the acceleration
        data["w_n"] = np.asarray(model.w_n)
    for k, v in (extra or {}).items():
        data[f"extra_{k}"] = v
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, model) -> float:
    """Restore state into a compatible model; returns the checkpoint time."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    if int(data["ndofs"]) != model.ops.ndofs:
        raise ValueError(
            f"checkpoint has {int(data['ndofs'])} dofs, model has {model.ops.ndofs}"
        )
    if str(data["model"]) != type(model).__name__:
        raise ValueError(
            f"checkpoint from {data['model']}, restoring into {type(model).__name__}"
        )
    model.u_n = jnp.asarray(data["u_n"], model.dtype)
    model.v_n = jnp.asarray(data["v_n"], model.dtype)
    model.t = float(data["t"])
    if "w_n" in data and hasattr(model, "w_n"):
        model.w_n = jnp.asarray(data["w_n"], model.dtype)
    return model.t
