"""PH1 SC2-BM3: focused bowl (64 mm aperture, ROC 64 mm), flat cortical-bone layer (6.5 mm at 30 mm)

Reference driver: ``cpp/fenicsx-sf-naive/benchmarks/PH1/SC2-BM3/main.cpp``.
Run:  python benchmarks/ph1/sc2_bm3.py [--nx 80] [--out results/...] [--bowl]
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
    ap.add_argument("--bowl", action="store_true",
                    help="true curved-facet bowl mesh (core/bowl.py) "
                    "instead of the phased flat aperture")
    args = ap.parse_args()
    run(2, 3, nx=args.nx, out=args.out, bowl=args.bowl)
