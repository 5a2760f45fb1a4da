"""The driver contract: entry() jits single-chip; dryrun_multichip(n) jits
the full sharded step on an n-device mesh. Keep these green — the round
driver compile-checks both."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)
@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
