"""TPU drive of the v3 fused RK stage: 3D channel == 1D plane wave, fp32."""
import os, sys, time
os.environ["FUS_PALLAS"] = "1"
os.environ["FUS_STAGE_V3"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import fenicsxfus_tpu as fus
from fenicsxfus_tpu.analysis.analytical import planewave
from fenicsxfus_tpu.analysis.error import relative_l2_error

print("devices:", jax.devices(), flush=True)
f0, p0, c0, rho0 = 10.0, 4.0, 1.0, 4.0
L = 1.0
nx = 40  # 4 elem/wavelength at degree 4
mesh = fus.create_box((nx, 12, 12), (0, 0, 0), (L, 0.3, 0.3))
fus.tag_boundaries(mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > L - 1e-12})
dt = 0.9 * (L / nx) / (c0 * 16)
eqn = fus.LinearSpectralExplicit(mesh, None, 4, c0, rho0, f0, p0, c0, 4, dt,
                                 dtype=jnp.float32)
assert eqn._try_build_fused() is not None, "v3 fused path not taken"
eqn.init()
t0 = time.perf_counter()
u, v, tf = eqn.rk(0.0, L / c0 + 16.0 / f0)
print(f"run wall {time.perf_counter()-t0:.1f}s  ndofs={eqn.number_of_dofs()}", flush=True)
err = relative_l2_error(eqn.ops, u, lambda x: planewave(x[0], tf, c0, f0, p0))
print("3D->1D planewave rel-L2 err (fp32, v3 stage):", err)
assert err < 5e-3, err
print("VERIFY-TPU-V3 OK")
