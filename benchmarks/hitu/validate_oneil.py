"""Validate the phased-aperture bowl model against the O'Neil (1949)
axial solution (linear, β=δ=0) — quantitative bowl-equivalence check for
the HITU/PH1-SC2 focused sources.

Run:  python benchmarks/hitu/validate_oneil.py [--tx H101] [--f0 3.5e5] [--nx 64]

Committed results: ``results/oneil_*.npz`` (see README for the measured
focal-gain / position errors on the v5e chip).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import RESULTS, validate_oneil

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tx", type=str, default="H101", choices=["H101", "H131"])
    ap.add_argument("--f0", type=float, default=0.35e6)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--degree", type=int, default=4)
    args = ap.parse_args()
    out = os.path.join(RESULTS, f"oneil_{args.tx.lower()}_{args.f0/1e6:.2f}mhz.npz")
    validate_oneil(args.tx, f0=args.f0, nx=args.nx, degree=args.degree, out=out)
