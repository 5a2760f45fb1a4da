"""PH1 SC1-BM7: planar 20 mm piston, CT-skull stand-in (water-valued lossy medium, p=5)

Reference driver: ``cpp/fenicsx-sf-naive/benchmarks/PH1/SC1-BM7/main.cpp``.
Run:  python benchmarks/ph1/sc1_bm7.py [--nx 80] [--out results/...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import run  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    run(1, 7, nx=args.nx, out=args.out)
