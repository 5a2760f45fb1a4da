#!/bin/bash
# Round-3 TPU queue, part D: the fused-hybrid bowl production measurement
# (93cca74), hybrid-apply attribution, honest unstructured reruns
# (warmup-fixed harness, fe8d1f0), bowl O'Neil nx=96, final bench sanity.
# Started by a watcher when part C drains. Single-client tunnel: strictly
# serial. Every item's timeout is capped at the time remaining to the hard
# cutoff (15:10 UTC) so the driver's round-end bench.py finds a free TPU.
set -x
R=/tmp/tpu_results_r3.txt
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo

CUTOFF=$(date -d "today 15:10" +%s 2>/dev/null || echo 0)
# seconds left to the cutoff minus a 2 min drain margin
tleft() { echo $(( CUTOFF - $(date +%s) - 120 )); }
# cap <want>: min(want, tleft); items skip when less than 5 min remains
cap() { local w=$1 l=$(tleft); echo $(( l < w ? l : w )); }
runnable() { [ "$(tleft)" -gt 300 ]; }

echo "=== $(date) r3 queue PART D start ===" >> $R

if runnable; then
echo "--- [O] bowl-mesh H101 production RERUN on the fused hybrid stage (93cca74)" >> $R
timeout $(cap 4800) python -u -c "
import sys; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.run('W','H101','WATER', nx=80, bowl=True,
      out='benchmarks/hitu/results/w_h101_water_bowlmesh_fused.npz')
" >> $R 2>&1
echo "O rc=$?" >> $R
fi

if runnable; then
echo "--- [M] hybrid apply attribution (lattice vs hybrid vs band) nx=80" >> $R
timeout $(cap 3600) python -u benchmarks/hybrid_speed.py --nx 80 >> $R 2>&1
echo "M rc=$?" >> $R
fi

if runnable; then
echo "--- [P1] unstructured end-to-end RERUN (warmup-fixed harness)" >> $R
timeout $(cap 5000) python -u benchmarks/unstructured_solve.py >> $R 2>&1
echo "P1 rc=$?" >> $R
fi

if runnable; then
echo "--- [P2] blocked v1/v2/v3 apply A/B RERUN (widened slope timer)" >> $R
timeout $(cap 3000) python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v1 rc=$?" >> $R
FUS_BLOCKED=v2 timeout $(cap 3000) python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v2 rc=$?" >> $R
FUS_BLOCKED=v3 timeout $(cap 3000) python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v3 rc=$?" >> $R
FUS_BLOCKED=v3 FUS_V3_EXTRACT=dot timeout $(cap 3000) python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v3dot rc=$?" >> $R
FUS_BLOCKED=v3 FUS_V3_LANES=32 timeout $(cap 3000) python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v3L32 rc=$?" >> $R
fi

if runnable; then
echo "--- [L] bowl-mesh O'Neil chip validation nx=96 (413-fixed rerun)" >> $R
timeout $(cap 7200) python -u -c "
import sys; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.validate_bowl_mesh('H101', f0=0.35e6, nx=96, out='benchmarks/hitu/results/oneil_bowlmesh_h101.npz')
c.validate_bowl_mesh('H131', f0=0.45e6, nx=96, out='benchmarks/hitu/results/oneil_bowlmesh_h131.npz')
" >> $R 2>&1
echo "L rc=$?" >> $R
fi

if runnable; then
echo "--- [N] final headline sanity at round-3 defaults" >> $R
timeout $(cap 2400) python -u bench.py >> $R 2>&1
echo "N rc=$?" >> $R
fi

echo "=== $(date) r3 queue PART D done ===" >> $R
