"""Wavefront-fused RK4 step (ops/pallas_step_wave.py) vs the reference scan.

One pallas launch per time step, all four stages lagged along the axis-0
block walk with kv slopes in VMEM rings — must reproduce the unfused
a-vector RK step (reference driver ``cpp/fenicsx-sf/common/
Linear.hpp:228-314``) to fp64 roundoff, like the per-stage kernels do
(``test_pallas._fused_vs_reference``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu.core.mesh import create_box, tag_boundaries

from test_pallas import _fused_vs_reference


def _wave_vs_reference(model_cls, kwargs, hetero, monkeypatch):
    monkeypatch.setenv("FUS_STEP_WAVE", "1")
    _fused_vs_reference(model_cls, kwargs, hetero, monkeypatch)


@pytest.mark.parametrize(
    "hetero", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_wave_step_linear(hetero, monkeypatch):
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit

    _wave_vs_reference(LinearSpectralExplicit, {}, hetero, monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("hetero", [False, True])
def test_wave_step_lossy(hetero, monkeypatch):
    from fenicsxfus_tpu.models.lossy import LossySpectralExplicit

    _wave_vs_reference(
        LossySpectralExplicit, {"delta0": 4e-3}, hetero, monkeypatch
    )


@pytest.mark.parametrize(
    "hetero", [True, pytest.param(False, marks=pytest.mark.slow)]
)
def test_wave_step_westervelt(hetero, monkeypatch):
    from fenicsxfus_tpu.models.westervelt import WesterveltSpectralExplicit

    _wave_vs_reference(
        WesterveltSpectralExplicit,
        {"delta0": 4e-3, "beta0": 3.5},
        hetero,
        monkeypatch,
    )


@pytest.mark.slow
def test_wave_step_is_selected(monkeypatch):
    """FUS_STEP_WAVE=1 actually routes through the wavefront class (guards
    against the selection silently falling back to v3)."""
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit
    from fenicsxfus_tpu.ops.pallas_step_wave import FusedRKStepWave

    monkeypatch.setenv("FUS_PALLAS", "1")
    monkeypatch.setenv("FUS_STEP_WAVE", "1")
    L = 1.0
    mesh = create_box((6, 4, 4), (0, 0, 0), (L, 0.5, 0.5))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )
    m = LinearSpectralExplicit(
        mesh, None, 3, 1500.0, 1000.0, 0.5e6, 6e4, 1500.0, 4, 1e-8,
        dtype=jnp.float64,
    )
    calls = []
    orig = FusedRKStepWave._step_call

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(FusedRKStepWave, "_step_call", spy)
    m.rk(0.0, 3e-8)
    assert calls, "wavefront step was not selected"


@pytest.mark.slow
def test_wave_step_non_rk4_falls_back(monkeypatch):
    """rk_order != 4 keeps the per-stage v3 path (wave is RK4-only)."""
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit
    from fenicsxfus_tpu.ops.pallas_step_wave import FusedRKStepWave

    monkeypatch.setenv("FUS_PALLAS", "1")
    monkeypatch.setenv("FUS_STEP_WAVE", "1")
    L = 1.0
    mesh = create_box((6, 4, 4), (0, 0, 0), (L, 0.5, 0.5))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )
    m = LinearSpectralExplicit(
        mesh, None, 3, 1500.0, 1000.0, 0.5e6, 6e4, 1500.0, 3, 1e-8,
        dtype=jnp.float64,
    )

    def boom(self, *a, **k):  # pragma: no cover
        raise AssertionError("wave selected for rk_order=3")

    monkeypatch.setattr(FusedRKStepWave, "_step_call", boom)
    u, v, t = m.rk(0.0, 3e-8)
    assert np.all(np.isfinite(np.asarray(u)))


def test_separate_field_dtype_scaled_tol():
    """try_separate_field accepts dtype-quantized rank-1 fields and rejects
    physical perturbations >>100 ulp (ADVICE r3: tol must not silently admit
    near-separable fields; but the assembled inv_m is stored in the MODEL
    dtype, so the bound has to scale with that dtype's eps, not float64's)."""
    from fenicsxfus_tpu.ops.pallas_step_wave import try_separate_field

    rng = np.random.default_rng(7)
    a = rng.random(17) + 1.0
    P = rng.random((9, 9)) + 1.0
    M64 = a[:, None, None] * P[None]
    M32 = M64.astype(np.float32)
    assert try_separate_field(M32, (17, 9, 9)) is not None
    assert try_separate_field(M64, (17, 9, 9)) is not None
    pert32 = M32 * (1.0 + 1e-4 * rng.standard_normal(M32.shape)).astype(
        np.float32
    )
    assert try_separate_field(pert32, (17, 9, 9)) is None
    pert64 = M64 * (1.0 + 1e-10 * rng.standard_normal(M64.shape))
    assert try_separate_field(pert64, (17, 9, 9)) is None
    # reconstruction: sep0 x sepP reproduces the field to dtype roundoff
    sep = try_separate_field(M32, (17, 9, 9))
    rec = sep[0][:, None, None] * sep[1]
    assert np.max(np.abs(rec - M64) / np.max(M64)) < 1e-5
