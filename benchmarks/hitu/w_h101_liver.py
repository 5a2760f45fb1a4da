"""HITU W-H101-LIVER: Westervelt focused-bowl benchmark.

Reference: ``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-LIVER/main.cpp``.
See ``common.py`` for the scenario constants and the phased-aperture
bowl model (O'Neil-validated).

Run:  python benchmarks/hitu/w_h101_liver.py [--nx 80] [--degree 4] [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import driver_main

if __name__ == "__main__":
    driver_main("W", "H101", "LIVER")
