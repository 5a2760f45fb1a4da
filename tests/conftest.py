"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Accuracy gates (L2 vs analytical over thousands of RK steps) need fp64,
which TPU lacks natively — so the test suite validates numerics on CPU
(with 8 virtual devices for the sharding tests) while TPU runs use fp32
(the reference itself runs float in its performance experiments,
``cpp/fenicsx-sf/experiments/measure_fraction_of_peak_performance/main.cpp:17``).
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which is single-client and fp64-emulated — tests must not race
# the benchmark for it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Something in pytest startup imports jax before this conftest runs, so the
# JAX_PLATFORMS env var is already snapshotted — override via config (works
# any time before first backend use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
