#!/bin/bash
# Round-3 TPU measurement queue (single-client tunnel: strictly serial).
# Run the moment the axon relay returns. Results appended to
# /tmp/tpu_results_r3.txt as each step lands; committed results go into
# benchmarks/*.txt + benchmarks/{ph1,hitu}/results/ afterwards.
#
# Pending validations (VERDICT r2 item 1 + 3):
#   A. re-verify headline >= 2.38 GDOF-RK4-steps/s (driver-capturable)
#   B. FUS_V3_LOOP=1 on silicon -> flip default if runtime ~= unrolled
#   C. FUS_PRECISION=b4 gate + headline (expect ~1/3 off stiffness time)
#   D. operator timings p=2..6 (complete operator_timings_v5e.txt)
#   E. phase_breakdown at nx=104
#   F. HITU bowl-mesh: O'Neil validation + W/V production artifacts
#   G. PH1 validation stamps (convergence + tf-stationarity + 1D transmission)
#   H. unstructured end-to-end solve benchmark
set -x
R=/tmp/tpu_results_r3.txt
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo

echo "=== $(date) r3 queue start ===" >> $R

echo "--- [A1] small gate, default (unrolled, HIGHEST)" >> $R
( time timeout 2400 python benchmarks/verify_tpu_v3.py ) >> $R 2>&1
echo "--- [B1] small gate, FUS_V3_LOOP=1" >> $R
( time FUS_V3_LOOP=1 timeout 2400 python benchmarks/verify_tpu_v3.py ) >> $R 2>&1
echo "--- [C1] small gate, b4" >> $R
FUS_PRECISION=b4 timeout 2400 python benchmarks/verify_tpu_v3.py >> $R 2>&1

echo "--- [A2] headline nx=104 default" >> $R
( time BENCH_VERBOSE=1 timeout 4000 python bench.py ) >> $R 2>&1
echo "--- [B2] headline nx=104 FUS_V3_LOOP=1" >> $R
( time FUS_V3_LOOP=1 BENCH_VERBOSE=1 timeout 4000 python bench.py ) >> $R 2>&1
echo "--- [C2] headline nx=104 b4" >> $R
( time FUS_PRECISION=b4 BENCH_VERBOSE=1 timeout 4000 python bench.py ) >> $R 2>&1

echo "--- [D] operator timings p=2..6 (HIGHEST + b4 at p=4)" >> $R
timeout 6000 python -u benchmarks/operator_speed.py --degrees 2,3,4,5,6 >> $R 2>&1
FUS_PRECISION=b4 timeout 4000 python -u benchmarks/operator_speed.py --degrees 4 >> $R 2>&1

echo "--- [E] phase breakdown nx=104" >> $R
timeout 4000 python -u benchmarks/phase_breakdown.py >> $R 2>&1

echo "--- [F1] HITU bowl-mesh O'Neil validation (H101 + H131)" >> $R
timeout 6000 python -u -c "
import sys; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.validate_bowl_mesh('H101', f0=0.35e6, nx=96, out='benchmarks/hitu/results/oneil_bowlmesh_h101.npz')
c.validate_bowl_mesh('H131', f0=0.45e6, nx=96, out='benchmarks/hitu/results/oneil_bowlmesh_h131.npz')
" >> $R 2>&1
echo "--- [F2] HITU production artifacts (H131 W/V + bowl-mesh H101)" >> $R
timeout 8000 python -u -c "
import sys, os; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.run('W','H131','WATER', nx=80, out='benchmarks/hitu/results/w_h131_water.npz')
c.run('W','H131','LIVER', nx=80, out='benchmarks/hitu/results/w_h131_liver.npz')
c.run('V','H131','WATER', nx=80, out='benchmarks/hitu/results/v_h131_water.npz')
c.run('W','H101','WATER', nx=80, bowl=True, out='benchmarks/hitu/results/w_h101_water_bowlmesh.npz')
" >> $R 2>&1

echo "--- [F3] HITU H131 at the TRUE 1.1 MHz (reference scale; ~86M DOF" >> $R
echo "    at p=4, 2.75 elems/lambda - fits one chip)" >> $R
timeout 8000 python -u -c "
import sys; sys.path.insert(0,'benchmarks/hitu')
import common as c
c.run('W','H131','WATER', nx=164, full=True,
      out='benchmarks/hitu/results/w_h131_water_full11MHz.npz')
" >> $R 2>&1

echo "--- [G] PH1 validation stamps (SC1-BM1 water + SC1-BM4 bone)" >> $R
timeout 10000 python -u -c "
from benchmarks.ph1.validate import validate
validate(1, 1, 80, 112)
validate(1, 4, 80, 112)
" >> $R 2>&1

echo "--- [H] unstructured end-to-end solve benchmark" >> $R
timeout 6000 python -u benchmarks/unstructured_solve.py >> $R 2>&1

echo "--- [I] blocked v1 vs v2 vs v3 (transpose-gather / super-row) A/B" >> $R
timeout 4000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
FUS_BLOCKED=v2 timeout 4000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
FUS_BLOCKED=v3 timeout 4000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
FUS_BLOCKED=v3 FUS_V3_LANES=256 timeout 4000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
FUS_BLOCKED=v3 FUS_V3_LANES=512 timeout 4000 python -u benchmarks/unstructured_speed.py >> $R 2>&1
FUS_BLOCKED=v3 timeout 4000 python -u benchmarks/unstructured_solve.py >> $R 2>&1

echo "--- [J] numbering-locality A/B (shuffled vs Morton+first-touch)" >> $R
timeout 4000 python -u benchmarks/unstructured_speed.py --shuffle >> $R 2>&1
timeout 4000 python -u benchmarks/unstructured_speed.py --shuffle --reorder >> $R 2>&1

echo "=== $(date) r3 queue done ===" >> $R
