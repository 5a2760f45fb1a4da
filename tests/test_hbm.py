"""Invariants on the analytic HBM footprint model (ops/hbm.py).

The model exists because the axon backend exposes no memory_stats(): it is
the only pre-flight answer to "will this bench rung fit the chip".  Its
empirical validation is benchmarks/mosaic_smoke.py --production (real runs
at nx=104); these tests pin the arithmetic and the budget conclusions the
round-5 bench design rests on.
"""

import numpy as np

from fenicsxfus_tpu.ops import hbm


def test_field_bytes_matches_dof_count():
    # 72.5M DOF headline shape: (4*104+1)^3 fp32
    assert hbm.ndofs_box(104, 4) == 417**3
    assert hbm.field_bytes(104, 4, np.float32) == 417**3 * 4


def test_every_single_ladder_rung_fits_the_chip():
    """With subprocess isolation, the budget is the WORST single rung —
    each of the three ladder rungs must fit v5e HBM on its own."""
    for nx, path in ((104, "v3"), (104, "wave"), (104, "xla"),
                     (64, "v3"), (64, "xla")):
        b = hbm.rung_hbm_bytes(nx, path=path)
        assert hbm.fits_chip(b), (nx, path, b / 2**30)
    assert hbm.fits_chip(hbm.ladder_worst_bytes())


def test_r4_failure_state_exceeds_the_chip():
    """BENCH_r04's OOM cascade held THREE resident sets at once in one
    process (live pallas model + full-shape XLA self-check program + the
    XLA-fallback rebuild, with the failed rung pinned by its traceback).
    The model reproduces the conclusion: that sum does not fit, while each
    component alone does — which is exactly why the round-5 ladder runs
    one rung per process."""
    v3 = hbm.rung_hbm_bytes(104, path="v3")
    xla = hbm.rung_hbm_bytes(104, path="xla")
    assert hbm.fits_chip(v3) and hbm.fits_chip(xla)
    assert not hbm.fits_chip(v3 + xla + xla)


def test_monotone_in_nx_and_path():
    assert hbm.rung_hbm_bytes(104) > hbm.rung_hbm_bytes(64)
    assert hbm.rung_hbm_bytes(104, path="xla") > hbm.rung_hbm_bytes(104, path="v3")


def test_report_renders():
    r = hbm.report()
    assert "fits" in r and "GiB" in r
