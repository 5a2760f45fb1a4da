"""In-scan sensor recording interpolates off-node sensors exactly.

The round-2 recording snapped every sensor to its nearest DOF node — exact
for the node-aligned sensors the benchmark drivers use, but a silent phase
error of ~2pi*offset/lambda for anything else. The reference evaluates
sensor points by interpolation on any rank count (DOLFINx ``Function.eval``;
``cpp/mwe/parallel_eval_line/main.cpp:49-107``). These tests pin the
recorded series at off-node points to ``eval_function`` ground truth and
check node-aligned sensors still collapse to the proven snap gather.
"""

import jax.numpy as jnp
import numpy as np

from fenicsxfus_tpu import (
    LinearSpectralExplicit,
    LinearSpectralImplicit,
    create_box,
    eval_function,
    tag_boundaries,
)
from fenicsxfus_tpu.core.gll import gll_points_weights_01


def _mesh(nx=(6, 3, 3)):
    return tag_boundaries(
        create_box(nx, (0, 0, 0), (1.0, 0.4, 0.4)),
        {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12},
    )


def _offnode_points():
    # deliberately between GLL nodes in every axis
    x = np.array([0.23, 0.41, 0.77])
    return np.stack([x, np.full_like(x, 0.17), np.full_like(x, 0.23)])


def _make_explicit():
    m = LinearSpectralExplicit(
        _mesh(), None, 3, 1.5, 1.0, 10.0, 1.0, 1.5, 4, 0.4 / 6 / 1.5 / 9,
        dtype=jnp.float64,
    )
    return m.init()


def _make_implicit():
    m = LinearSpectralImplicit(
        _mesh(), None, 3, 1.5, 1.0, 10.0, 1.0, 1.5, 2, 0.4 / 6 / 1.5 / 4,
        dtype=jnp.float64, cg_rtol=1e-13,
    )
    return m.init()


def _ground_truth(make, march, pts, nsteps):
    """March step-by-step, evaluating the field at ``pts`` after each step
    with the independent (numpy Newton inverse-map) ``eval_function``."""
    m = make()
    vals = []
    for k in range(nsteps):
        u, _, _ = march(m, k * m.dt, (k + 1) * m.dt)
        vals.append(np.asarray(eval_function(m.ops, u, pts)[1]))
    return np.stack(vals)


def test_rk_record_interp_matches_eval():
    pts = _offnode_points()
    m = _make_explicit()
    nsteps = 6
    *_, ys = m.rk_record(0.0, nsteps * m.dt, pts)
    ref = _ground_truth(_make_explicit, lambda mm, a, b: mm.rk(a, b), pts, nsteps)
    scale = np.max(np.abs(ref)) + 1e-300
    assert np.max(np.abs(np.asarray(ys) - ref)) / scale < 1e-11


def test_dirk_record_interp_matches_eval():
    pts = _offnode_points()
    m = _make_implicit()
    nsteps = 5
    *_, ys = m.dirk_record(0.0, nsteps * m.dt, pts)
    ref = _ground_truth(
        _make_implicit, lambda mm, a, b: mm.dirk(a, b), pts, nsteps
    )
    scale = np.max(np.abs(ref)) + 1e-300
    assert np.max(np.abs(np.asarray(ys) - ref)) / scale < 1e-10


def test_node_aligned_sensors_keep_snap_path():
    """Sensors placed exactly on GLL nodes must produce one-hot weight rows
    and collapse to the nearest-DOF gather (same cache key => the production
    drivers' compiled programs are unchanged)."""
    m = _make_explicit()
    gll, _ = gll_points_weights_01(4)  # degree 3
    hx, hy = 1.0 / 6, 0.4 / 3
    x = np.array([(1 + gll[2]) * hx, (3 + gll[1]) * hx, 4 * hx])
    pts = np.stack([x, np.full_like(x, hy), np.full_like(x, 2 * hy)])
    key, _ = m._record_plan(pts)
    assert key == m.sensor_indices(pts).tobytes()


def test_offnode_interp_beats_snap_phase_error():
    """The recorded off-node waveform must match the interpolated field, not
    the nearest node's value (the two differ by a finite phase offset)."""
    pts = _offnode_points()
    m = _make_explicit()
    nsteps = 30
    *_, ys = m.rk_record(0.0, nsteps * m.dt, pts)
    m2 = _make_explicit()
    idx = m2.sensor_indices(pts)
    u, _, _ = m2.rk(0.0, nsteps * m2.dt)
    snapped = np.asarray(u)[idx]
    interp = np.asarray(eval_function(m2.ops, u, pts)[1])
    assert np.max(np.abs(snapped - interp)) > 0  # genuinely off-node
    err_interp = np.abs(np.asarray(ys)[-1] - interp)
    err_snap = np.abs(np.asarray(ys)[-1] - snapped)
    assert np.all(err_interp <= err_snap + 1e-15)
    assert np.max(err_interp) < 1e-11 * (np.max(np.abs(interp)) + 1e-300)
