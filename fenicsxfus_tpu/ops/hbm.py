"""Device-memory (HBM) footprint model for the production solve paths.

BENCH_r04 died RESOURCE_EXHAUSTED because the in-process degrade ladder
accumulated the resident sets of successive rungs (failed rungs' buffers
stayed pinned by locals and exception tracebacks).  Round 5 isolates every
rung in a subprocess, so the budget question becomes: does the WORST single
rung fit the chip?  This module answers that analytically — the axon relay
backend exposes no ``memory_stats()`` (verified: returns None), so the
model is validated empirically instead by the production-shape smoke tier
(``benchmarks/mosaic_smoke.py --production``) which runs every bench-ladder
path at nx=104 on the real chip.

The unit of account is one FIELD = one ndofs-sized dtype array
((p·nx+1)^3 · itemsize bytes).  Counts are from reading the step
implementations (ops/pallas_stage_v3.py, ops/pallas_step_wave.py,
models/common.py scan driver), padded with a safety factor for XLA
temporaries the count cannot see (fusion buffers, layout copies).

Reference scope: the reference sizes its runs by MPI-rank memory the same
way — ``cpp/fenicsx-sf/experiments/measure_fraction_of_peak_performance/
main.cpp:112-121`` picks N for a target DOF count per node.
"""

from __future__ import annotations

import numpy as np

# v5e (lite0) HBM per chip.  Leave headroom for the runtime's own
# reservations; the usable fraction is deliberately conservative.
HBM_BYTES_V5E = 16 * 1024**3
USABLE_FRACTION = 0.85

# Peak concurrently-live ndofs-sized arrays per solve path, linear model.
#
#   persistent: model.u_n, model.v_n                                (2)
#   consts:     inv_m, src_vec, abc_diag (dense copies)             (3)
#   scan:       carry u, v                                          (2)
#   v3 stage:   kv1..kv3 slopes + final-stage out u1,v1 (u0/v0
#               donated) + one undonated stage input copy           (6)
#   wave step:  ring-buffer stage state lives in VMEM, but the step
#               keeps u,v in/out plus 2 HBM spill planespaces       (6)
#   xla:        unfused scan: per-stage b, ku, kv, axpy temporaries
#               and the banded-matmul intermediates XLA materialises
#               (measured-by-failure: the XLA rebuild at nx=104 with
#               a dead pallas rung resident OOMed in r4)            (10)
#
# SAFETY multiplies the count for invisible XLA temporaries.
PATH_FIELDS = {"v3": 13, "wave": 13, "xla": 17}
SAFETY = 1.35


def ndofs_box(nx: int, degree: int) -> int:
    """Closed GLL lattice on an nx^3 box."""
    return (degree * nx + 1) ** 3


def field_bytes(nx: int, degree: int, dtype=np.float32) -> int:
    return ndofs_box(nx, degree) * np.dtype(dtype).itemsize


def rung_hbm_bytes(nx: int, degree: int = 4, dtype=np.float32,
                   path: str = "v3") -> int:
    """Predicted peak HBM resident set of ONE bench rung (one process)."""
    return int(PATH_FIELDS[path] * SAFETY * field_bytes(nx, degree, dtype))


def ladder_worst_bytes(rungs=((104, "v3"), (64, "v3"), (64, "xla")),
                       degree: int = 4, dtype=np.float32) -> int:
    """Worst single rung of the bench ladder.  With subprocess isolation
    the rungs never coexist, so max — not sum — is the budget."""
    return max(rung_hbm_bytes(nx, degree, dtype, path) for nx, path in rungs)


def fits_chip(nbytes: int, hbm_bytes: int = HBM_BYTES_V5E) -> bool:
    return nbytes <= USABLE_FRACTION * hbm_bytes


def report(rungs=((104, "v3"), (64, "v3"), (64, "xla")),
           degree: int = 4, dtype=np.float32) -> str:
    lines = []
    for nx, path in rungs:
        b = rung_hbm_bytes(nx, degree, dtype, path)
        lines.append(
            f"  nx={nx:<4} path={path:<5} {ndofs_box(nx, degree)/1e6:7.1f}M DOF  "
            f"predicted peak {b/2**30:5.2f} GiB  "
            f"{'fits' if fits_chip(b) else 'DOES NOT FIT'} "
            f"(budget {USABLE_FRACTION*HBM_BYTES_V5E/2**30:.1f} GiB)"
        )
    return "\n".join(lines)
