"""HITU V-H131-WATER: lossy focused-bowl benchmark.

Reference: ``cpp/fenicsx-sf-naive/benchmarks/HITU/V-H131-WATER/main.cpp``.
See ``common.py`` for the scenario constants and the phased-aperture
bowl model (O'Neil-validated).

Run:  python benchmarks/hitu/v_h131_water.py [--nx 80] [--degree 4] [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import driver_main

if __name__ == "__main__":
    driver_main("V", "H131", "WATER")
