"""Pallas fused stiffness + fused RK stage vs the XLA paths (interpret on CPU).

The fused kernels are the TPU production path (default on), so their
equivalence gates mirror the reference's kernel-vs-generated-assembly
oracle tests (``cpp/fenicsx-sf/tests/test_operators3d/main.cpp:17-167``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu.core.mesh import create_box, tag_boundaries
from fenicsxfus_tpu.ops.operators import SEMOperators
from fenicsxfus_tpu.ops.pallas_lattice import LatticePallasStiffness


@pytest.mark.slow
@pytest.mark.parametrize("degree", [2, 3, 4])
def test_pallas_matches_lattice_const(degree, monkeypatch):
    monkeypatch.setenv("FUS_V3", "0")  # pin the legacy two-kernel path
    # deliberately awkward grid: ragged chunk plans, non-divisible tiles
    mesh = create_box((9, 5, 7), (0, 0, 0), (0.9, 0.7, 0.5))
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(ops.lattice.gdims)
    y_ref = ops.lattice.apply_scaled([(x, ops.pack_scales(1.7))])
    pk = LatticePallasStiffness(ops.lattice, tile_cols=64, interpret=True)
    y = pk.apply([x], [pk.pack_const(1.7)])
    err = np.max(np.abs(np.asarray(y) - np.asarray(y_ref)))
    assert err < 1e-11 * np.max(np.abs(np.asarray(y_ref))), err


@pytest.mark.parametrize(
    "n_fields", [pytest.param(1, marks=pytest.mark.slow), 2]
)
def test_pallas_matches_lattice_heterogeneous(n_fields, monkeypatch):
    """DG-0 field coefficients run the same fused kernels (VERDICT r1 #2)."""
    monkeypatch.setenv("FUS_V3", "0")  # pin the legacy two-kernel path
    degree = 3
    mesh = create_box((6, 4, 5), (0, 0, 0), (1.2, 0.8, 1.0))
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    lat = ops.lattice
    pk = LatticePallasStiffness(lat, tile_cols=96, interpret=True)
    coeffs = [rng.uniform(0.5, 2.0, mesh.num_cells) for _ in range(n_fields)]
    xs = [
        jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(lat.gdims)
        for _ in range(n_fields)
    ]
    y_ref = lat.apply_scaled(
        [(x, lat.scales_field(c)) for x, c in zip(xs, coeffs)]
    )
    y = pk.apply(xs, [pk.pack_field(c) for c in coeffs])
    err = np.max(np.abs(np.asarray(y) - np.asarray(y_ref)))
    assert err < 1e-11 * np.max(np.abs(np.asarray(y_ref))), err


def _fused_vs_reference(model_cls, kwargs, hetero, monkeypatch):
    """Run a few RK steps through the fused pallas stage and through the
    reference (unfused) scan; they must agree to fp64 roundoff."""
    import fenicsxfus_tpu.models.base as base_mod

    L = 1.0
    mesh = create_box((6, 4, 4), (0, 0, 0), (L, 0.5, 0.5))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )
    nc = mesh.num_cells
    rng = np.random.default_rng(2)
    c0 = rng.uniform(1400, 1600, nc) if hetero else 1500.0
    rho0 = rng.uniform(900, 1100, nc) if hetero else 1000.0
    dt = 1e-8
    common = dict(degree=3, freq0=0.5e6, p0=6e4, s0=1500.0, rk_order=4, dt=dt)
    args = dict(mesh=mesh, meshtags=None, c0=c0, rho0=rho0,
                dtype=jnp.float64, **common, **kwargs)

    monkeypatch.setenv("FUS_PALLAS", "1")  # interpret-mode pallas on CPU
    m_fused = model_cls(**args)
    assert m_fused._try_build_fused() is not None, "fused path not taken"
    uf, vf, _ = m_fused.rk(0.0, 5 * dt)

    monkeypatch.setenv("FUS_PALLAS", "0")
    m_ref = model_cls(**args)
    ur, vr, _ = m_ref.rk(0.0, 5 * dt)

    for a, b in [(uf, ur), (vf, vr)]:
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-12, err


@pytest.mark.parametrize(
    "hetero", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_fused_stage_linear(hetero, monkeypatch):
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit

    _fused_vs_reference(LinearSpectralExplicit, {}, hetero, monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("hetero", [False, True])
def test_fused_stage_lossy(hetero, monkeypatch):
    from fenicsxfus_tpu.models.lossy import LossySpectralExplicit

    _fused_vs_reference(
        LossySpectralExplicit, {"delta0": 4e-3}, hetero, monkeypatch
    )


@pytest.mark.slow
@pytest.mark.parametrize("hetero", [False, True])
def test_fused_stage_westervelt(hetero, monkeypatch):
    from fenicsxfus_tpu.models.westervelt import WesterveltSpectralExplicit

    _fused_vs_reference(
        WesterveltSpectralExplicit,
        {"delta0": 4e-3, "beta0": 3.5},
        hetero,
        monkeypatch,
    )


@pytest.mark.slow
@pytest.mark.parametrize("hetero", [False, True])
def test_fused_stage_focused(hetero, monkeypatch):
    """Phased-aperture (bowl) source: 4 phase-split facet vectors through
    the fused stage — the HITU/PH1-SC2 hot path."""
    from fenicsxfus_tpu.models.focused import WesterveltSpectralFocused

    L = 1.0
    mesh = create_box((6, 4, 4), (0, 0, 0), (L, 0.5, 0.5))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12}, default=2)
    nc = mesh.num_cells
    rng = np.random.default_rng(3)
    c0 = rng.uniform(1400, 1600, nc) if hetero else 1500.0
    rho0 = rng.uniform(900, 1100, nc) if hetero else 1000.0
    dt = 1e-8
    args = dict(mesh=mesh, meshtags=None, degree=3, c0=c0, rho0=rho0,
                delta0=4e-3, beta0=3.5, freq0=0.5e6, p0=6e4, s0=1500.0,
                rk_order=4, dt=dt, aperture_radius=0.2, focal_distance=0.6,
                center=np.array([0.0, 0.25, 0.25]), dtype=jnp.float64)

    monkeypatch.setenv("FUS_PALLAS", "1")
    m_fused = WesterveltSpectralFocused(**args)
    assert m_fused._try_build_fused() is not None, "fused path not taken"
    uf, vf, _ = m_fused.rk(0.0, 5 * dt)
    monkeypatch.setenv("FUS_PALLAS", "0")
    m_ref = WesterveltSpectralFocused(**args)
    ur, vr, _ = m_ref.rk(0.0, 5 * dt)
    for a, b in [(uf, ur), (vf, vr)]:
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-12, err


@pytest.mark.slow
@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_stage_rk_orders(order, monkeypatch):
    """The closed-form step update must match the reference a-vector loop
    for every explicit table, not just RK4."""
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit

    L = 1.0
    mesh = create_box((4, 4, 4), (0, 0, 0), (L, 0.5, 0.5))
    tag_boundaries(
        mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12}
    )
    dt = 1e-8
    args = dict(mesh=mesh, meshtags=None, degree=2, c0=1500.0, rho0=1000.0,
                freq0=0.5e6, p0=6e4, s0=1500.0, rk_order=order, dt=dt,
                dtype=jnp.float64)
    monkeypatch.setenv("FUS_PALLAS", "1")
    m_fused = LinearSpectralExplicit(**args)
    assert m_fused._try_build_fused() is not None
    uf, vf, _ = m_fused.rk(0.0, 3 * dt)
    monkeypatch.setenv("FUS_PALLAS", "0")
    m_ref = LinearSpectralExplicit(**args)
    ur, vr, _ = m_ref.rk(0.0, 3 * dt)
    for a, b in [(uf, ur), (vf, vr)]:
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


@pytest.mark.slow
def test_fused_stage_all_face_abc(monkeypatch):
    """ABC on all five non-source faces (the PH1/HITU layout) exercises the
    packed-facet y-row/z-column correction paths, not just the x-planes."""
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit

    L = 1.0
    mesh = create_box((5, 4, 4), (0, 0, 0), (L, 0.5, 0.5))
    tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12}, default=2)
    dt = 1e-8
    args = dict(mesh=mesh, meshtags=None, degree=3, c0=1500.0, rho0=1000.0,
                freq0=0.5e6, p0=6e4, s0=1500.0, rk_order=4, dt=dt,
                dtype=jnp.float64)
    monkeypatch.setenv("FUS_PALLAS", "1")
    m_fused = LinearSpectralExplicit(**args)
    assert m_fused._try_build_fused() is not None
    uf, vf, _ = m_fused.rk(0.0, 5 * dt)
    monkeypatch.setenv("FUS_PALLAS", "0")
    m_ref = LinearSpectralExplicit(**args)
    ur, vr, _ = m_ref.rk(0.0, 5 * dt)
    for a, b in [(uf, ur), (vf, vr)]:
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-12


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["linear", "lossy", "westervelt"])
def test_fused_stage_v2_legacy(kind, monkeypatch):
    """Legacy two-kernel v2 stage (FUS_STAGE_V3=0) == reference scan on
    heterogeneous media. The default-path tests above exercise v3."""
    from fenicsxfus_tpu.models.linear import LinearSpectralExplicit
    from fenicsxfus_tpu.models.lossy import LossySpectralExplicit
    from fenicsxfus_tpu.models.westervelt import WesterveltSpectralExplicit

    monkeypatch.setenv("FUS_STAGE_V3", "0")
    monkeypatch.setenv("FUS_V3", "0")
    cls, kwargs = {
        "linear": (LinearSpectralExplicit, {}),
        "lossy": (LossySpectralExplicit, {"delta0": 4e-3}),
        "westervelt": (
            WesterveltSpectralExplicit, {"delta0": 4e-3, "beta0": 3.5}
        ),
    }[kind]
    _fused_vs_reference(cls, kwargs, True, monkeypatch)


@pytest.mark.slow
def test_fused_stage_v2_all_face_abc(monkeypatch):
    """v2 stage with ABC on all five non-source faces (PH1/HITU layout)."""
    monkeypatch.setenv("FUS_STAGE_V3", "0")
    monkeypatch.setenv("FUS_V3", "0")
    test_fused_stage_all_face_abc(monkeypatch)


@pytest.mark.parametrize(
    "degree,grid",
    [
        pytest.param(2, (9, 5, 7), marks=pytest.mark.slow),
        pytest.param(3, (6, 4, 5), marks=pytest.mark.slow),
        pytest.param(4, (8, 5, 6), marks=pytest.mark.slow),
    ],
)
def test_pallas_v3_single_pass(degree, grid, monkeypatch):
    """v3 single-kernel apply (ops/pallas_v3.py) == XLA lattice path, const
    and heterogeneous, across be in {1, 2, 4} (n0 = 9/6/8)."""
    monkeypatch.setenv("FUS_V3", "1")
    mesh = create_box(grid, (0, 0, 0), (0.9, 0.7, 0.5))
    ops = SEMOperators(mesh, degree, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    lat = ops.lattice
    pk = LatticePallasStiffness(lat, tile_cols=64, interpret=True)
    x = jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(lat.gdims)
    y_ref = lat.apply_scaled([(x, ops.pack_scales(1.7))])
    y = pk.apply([x], [pk.pack_const(1.7)])
    tol = 1e-11 * np.max(np.abs(np.asarray(y_ref)))
    assert np.max(np.abs(np.asarray(y) - np.asarray(y_ref))) < tol
    coeffs = [rng.uniform(0.5, 2.0, mesh.num_cells) for _ in range(2)]
    xs = [
        jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(lat.gdims)
        for _ in range(2)
    ]
    y_ref2 = lat.apply_scaled(
        [(xx, lat.scales_field(c)) for xx, c in zip(xs, coeffs)]
    )
    y2 = pk.apply(xs, [pk.pack_field(c) for c in coeffs])
    tol2 = 1e-11 * np.max(np.abs(np.asarray(y_ref2)))
    assert np.max(np.abs(np.asarray(y2) - np.asarray(y_ref2))) < tol2


@pytest.mark.parametrize(
    "prec,tol",
    [
        pytest.param("b3", 5e-3, marks=pytest.mark.slow),
        pytest.param("b4", 5e-5, marks=pytest.mark.slow),
    ],
)
def test_pallas_bsplit_precision(prec, tol, monkeypatch):
    """Split-bf16 MXU emulation (FUS_PRECISION=b3/b4): fewer passes than
    HIGHEST (3/4 vs 6) at a bounded, measured accuracy cost per apply
    (b3 ~1e-3 from the dropped Bl·xl term under stiffness-row cancellation,
    b4 ~5e-6). fp32 fields, fp64 lattice reference."""
    monkeypatch.setenv("FUS_PRECISION", prec)
    mesh = create_box((8, 5, 6), (0, 0, 0), (0.9, 0.7, 0.5))
    ops = SEMOperators(mesh, 4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    lat = ops.lattice
    pk = LatticePallasStiffness(lat, tile_cols=64, interpret=True)
    x = jnp.asarray(rng.standard_normal(ops.ndofs), jnp.float32).reshape(lat.gdims)
    y_ref = lat.apply_scaled([(x, ops.pack_scales(1.7))])
    y = pk.apply([x], [pk.pack_const(1.7)])
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < tol, rel
    # heterogeneous coefficients run the same dots
    c = rng.uniform(0.5, 2.0, mesh.num_cells)
    y2 = pk.apply([x], [pk.pack_field(c)])
    y2_ref = lat.apply_scaled([(x, lat.scales_field(c))])
    rel2 = float(jnp.max(jnp.abs(y2 - y2_ref)) / jnp.max(jnp.abs(y2_ref)))
    assert rel2 < tol, rel2


@pytest.mark.slow
def test_pallas_v3_loop_variant(monkeypatch):
    """FUS_V3_UNROLL=1 (unrolled element body) == the fori default, apply
    and full fused stage (default flipped to fori in round 3 after the
    on-chip validation; the unrolled variant stays as the opt-out)."""
    monkeypatch.setenv("FUS_V3_UNROLL", "1")
    mesh = create_box((8, 5, 6), (0, 0, 0), (0.9, 0.7, 0.5))
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    lat = ops.lattice
    pk = LatticePallasStiffness(lat, tile_cols=64, interpret=True)
    x = jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(lat.gdims)
    c = rng.uniform(0.5, 2.0, mesh.num_cells)
    y = pk.apply([x], [pk.pack_field(c)])
    y_ref = lat.apply_scaled([(x, lat.scales_field(c))])
    assert np.max(np.abs(np.asarray(y - y_ref))) < 1e-11 * np.max(
        np.abs(np.asarray(y_ref))
    )
    from fenicsxfus_tpu.models.westervelt import WesterveltSpectralExplicit

    _fused_vs_reference(
        WesterveltSpectralExplicit, {"delta0": 4e-3, "beta0": 3.5}, True,
        monkeypatch,
    )


@pytest.mark.slow
def test_pallas_v3_rowbatch(monkeypatch):
    """FUS_V3_ROWS=1 (row-batched axes-1/2: one quadrant-stacked dot per
    chunk for the element's p rows, _axis_rows_apply) == the per-row
    default, apply and full fused stage, const + heterogeneous, fp64
    HIGHEST and fp32 b4."""
    monkeypatch.setenv("FUS_V3_ROWS", "1")
    mesh = create_box((8, 5, 6), (0, 0, 0), (0.9, 0.7, 0.5))
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    lat = ops.lattice
    pk = LatticePallasStiffness(lat, tile_cols=64, interpret=True)
    x = jnp.asarray(rng.standard_normal(ops.ndofs)).reshape(lat.gdims)
    y = pk.apply([x], [pk.pack_const(1.7)])
    y_ref = lat.apply_scaled([(x, ops.pack_scales(1.7))])
    assert np.max(np.abs(np.asarray(y - y_ref))) < 1e-11 * np.max(
        np.abs(np.asarray(y_ref))
    )
    c = rng.uniform(0.5, 2.0, mesh.num_cells)
    y2 = pk.apply([x], [pk.pack_field(c)])
    y2_ref = lat.apply_scaled([(x, lat.scales_field(c))])
    assert np.max(np.abs(np.asarray(y2 - y2_ref))) < 1e-11 * np.max(
        np.abs(np.asarray(y2_ref))
    )
    # quadrant-stacked b4 dots == the separate-dot b4 path (bit-identical
    # decomposition, bounded vs the fp64 reference)
    monkeypatch.setenv("FUS_PRECISION", "b4")
    ops32 = SEMOperators(mesh, 4, dtype=jnp.float32)
    lat32 = ops32.lattice
    pk32 = LatticePallasStiffness(lat32, tile_cols=64, interpret=True)
    x32 = jnp.asarray(
        rng.standard_normal(ops32.ndofs), jnp.float32
    ).reshape(lat32.gdims)
    yb = pk32.apply([x32], [pk32.pack_const(1.7)])
    yb_ref = lat32.apply_scaled([(x32, ops32.pack_scales(1.7))])
    rel = float(jnp.max(jnp.abs(yb - yb_ref)) / jnp.max(jnp.abs(yb_ref)))
    assert rel < 5e-5, rel
    monkeypatch.delenv("FUS_PRECISION")
    from fenicsxfus_tpu.models.westervelt import WesterveltSpectralExplicit

    _fused_vs_reference(
        WesterveltSpectralExplicit, {"delta0": 4e-3, "beta0": 3.5}, True,
        monkeypatch,
    )


def test_chunk_plan_invariants():
    """Chunk plans must tile the cell axis exactly, with every FULL chunk
    keeping both MXU matmul dims in one 128-tile (contraction width
    cells*p+1 <= 128, output rows cells*(p+1) <= 128) — the conditions
    _chunk_cells was swept for on v5e. Tail chunks may be any size >= 1
    (p=5/nx=67 leaves a 3-cell tail; flagged round 3, timed round 4 at
    2.42 ms het vs 1.91 const — no anomaly)."""
    from fenicsxfus_tpu.ops.pallas_lattice import _chunk_cells, _chunk_plan

    for p in range(2, 9):
        cc = _chunk_cells(p)
        m = cc * p
        assert m + 1 <= 128
        assert cc * (p + 1) <= 128
        for n_cells in (1, 2, 3, cc, cc + 1, 2 * cc + 3, 67, 104):
            plan = _chunk_plan(n_cells, p)
            covered = 0
            for lo, c in plan:
                assert lo == covered and c >= 1
                assert c <= cc
                covered += c
            assert covered == n_cells
