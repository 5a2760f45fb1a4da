"""Validate the bowl-FITTED mesh transducer (``core/bowl.py``) against the
O'Neil (1949) axial solution (linear, β=δ=0): the curved-facet geometry
counterpart of ``validate_oneil.py`` (which validates the phased flat
aperture). The reference meshes the same geometry with gmsh
(``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-WATER/main.cpp:33-52``).

Run:  python benchmarks/hitu/validate_bowl_mesh.py [--tx H101] [--f0 3.5e5] [--nx 48]

Committed results: ``results/oneil_bowlmesh_*.npz``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import RESULTS, validate_bowl_mesh

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tx", type=str, default="H101", choices=["H101", "H131"])
    ap.add_argument("--f0", type=float, default=0.35e6)
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--degree", type=int, default=4)
    args = ap.parse_args()
    out = os.path.join(
        RESULTS, f"oneil_bowlmesh_{args.tx.lower()}_{args.f0/1e6:.2f}mhz.npz"
    )
    validate_bowl_mesh(args.tx, f0=args.f0, nx=args.nx, degree=args.degree,
                       out=out)
