#!/bin/bash
# Round-3 TPU queue, part D: items unblocked by the hyb_G HLO-constant fix
# (cb02c37) plus hybrid-apply attribution. Started by a watcher when part C
# drains. Single-client tunnel: strictly serial. Every item checks a hard
# wall-clock cutoff (15:10 UTC) so the driver's round-end bench.py finds a
# free TPU.
set -x
R=/tmp/tpu_results_r3.txt
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo

CUTOFF=$(date -d "today 15:10" +%s 2>/dev/null || echo 0)
past_cutoff() { [ "$(date +%s)" -ge "$CUTOFF" ]; }

echo "=== $(date) r3 queue PART D start ===" >> $R

if ! past_cutoff; then
echo "--- [O] bowl-mesh H101 production RERUN on the fused hybrid stage (93cca74)" >> $R
timeout 4800 python -u -c "
import sys; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.run('W','H101','WATER', nx=80, bowl=True,
      out='benchmarks/hitu/results/w_h101_water_bowlmesh_fused.npz')
" >> $R 2>&1
echo "O rc=$?" >> $R
fi

if ! past_cutoff; then
echo "--- [M] hybrid apply attribution (lattice vs hybrid vs band) nx=80" >> $R
timeout 3600 python -u benchmarks/hybrid_speed.py --nx 80 >> $R 2>&1
echo "M rc=$?" >> $R
fi

if ! past_cutoff; then
echo "--- [P1] unstructured end-to-end RERUN (warmup-fixed harness)" >> $R
timeout 5000 python -u benchmarks/unstructured_solve.py >> $R 2>&1
echo "P1 rc=$?" >> $R
fi

if ! past_cutoff; then
echo "--- [P2] blocked v1/v2/v3 apply A/B RERUN (widened slope timer)" >> $R
timeout 3000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v1 rc=$?" >> $R
FUS_BLOCKED=v2 timeout 3000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v2 rc=$?" >> $R
FUS_BLOCKED=v3 timeout 3000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v3 rc=$?" >> $R
FUS_BLOCKED=v3 FUS_V3_EXTRACT=dot timeout 3000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v3dot rc=$?" >> $R
FUS_BLOCKED=v3 FUS_V3_LANES=32 timeout 3000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
echo "P2-v3L32 rc=$?" >> $R
fi

if ! past_cutoff; then
echo "--- [L] bowl-mesh O'Neil chip validation nx=96 (413-fixed rerun)" >> $R
timeout 7200 python -u -c "
import sys; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.validate_bowl_mesh('H101', f0=0.35e6, nx=96, out='benchmarks/hitu/results/oneil_bowlmesh_h101.npz')
c.validate_bowl_mesh('H131', f0=0.45e6, nx=96, out='benchmarks/hitu/results/oneil_bowlmesh_h131.npz')
" >> $R 2>&1
echo "L rc=$?" >> $R
fi

if ! past_cutoff; then
echo "--- [N] final headline sanity at round-3 defaults" >> $R
timeout 2400 python -u bench.py >> $R 2>&1
echo "N rc=$?" >> $R
fi

echo "=== $(date) r3 queue PART D done ===" >> $R
