"""Run the full PH1 suite (SC1/SC2 × BM1–BM7) at production resolution on
the chip and write reduced sensor artifacts under ``results/``.

Run:  python benchmarks/ph1/run_all.py [--nx 80] [--only SC1-BM1,SC2-BM3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import common as ph1  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated SCs-BMb selectors")
    args = ap.parse_args()
    only = None
    if args.only:
        only = {tuple(int(x[2:]) for x in s.split("-")) for s in args.only.split(",")}
    for sc in (1, 2):
        for bm in range(1, 8):
            if only and (sc, bm) not in only:
                continue
            out = os.path.join(RESULTS, f"sc{sc}_bm{bm}.npz")
            try:
                ph1.run(sc, bm, nx=args.nx, out=out)
            except Exception as e:  # keep the sweep going
                print(f"SC{sc}-BM{bm} FAILED: {e}")
