"""Per-cell spectral-radius survey of the bowl-mesh deformation band.

VERDICT r4 next #6: the tuned bowl band runs per-step at ~parity with the
flat-aperture path, so the WHOLE remaining gap (1.77x) is the spectral dt
clamp.  The round-4 sweep found the clamp insensitive to blend/hold —
meaning a few specific cells (not the fade depth) set lambda_max.  This
script finds them: per-cell lambda_max(diag(M_c)^-1 K_c) for every
deformation-band cell (cell-local operators are decoupled, so one batched
power iteration covers all cells), binned by x-layer and lateral radius,
against the uniform-cell value.

Pure host numpy (fp64) — no chip needed.

Run:  python benchmarks/bowl_spectrum.py [--nx 64] [--tx H101] [--degree 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
# FORCE CPU (setdefault is not enough: the ambient env pins
# JAX_PLATFORMS=axon, and a second client racing the single-client TPU
# tunnel starves whatever measurement session holds it)
os.environ["JAX_PLATFORMS"] = "cpu"


def percell_lambda(G_np, wdetJ_np, D, d=3, iters=60, seed=0, mass=None):
    """Batched power iteration of diag(m_c)^-1 K_c per cell.

    G_np [nb, Nq, 6] metric factors, wdetJ_np [nb, Nq] quadrature weights
    (collocated GLL: Nq = N^d), D [N, N] 1D differentiation matrix.
    ``mass`` [nb, Nq] overrides the cell-local lumped mass — pass the
    GLOBAL assembled diagonal sliced per cell for the tight localization
    (cell-local mass wildly overestimates sliver cells whose nodes carry
    normal-size mass from their neighbours)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from fenicsxfus_tpu.ops.operators import stiffness_cells

    nb, nq = wdetJ_np.shape
    N = D.shape[0]
    m = np.maximum(wdetJ_np if mass is None else mass, 1e-300)
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((nb, nq))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    Dj = jnp.asarray(D)
    Gj = jnp.asarray(G_np)

    @jax.jit
    def step(zj):
        w = stiffness_cells(Dj, Gj, zj.reshape((nb,) + (N,) * d), d)
        w = w.reshape(nb, nq) / m
        lam = jnp.linalg.norm(w, axis=1) / jnp.linalg.norm(zj, axis=1)
        return w / jnp.linalg.norm(w, axis=1, keepdims=True), lam

    zj = jnp.asarray(z)
    lam = None
    for _ in range(iters):
        zj, lam = step(zj)
    return np.asarray(lam)


def main(nx, tx, degree):
    import jax

    try:  # the axon plugin force-prepends itself at import; override
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "hitu"))
    from common import TRANSDUCERS

    from fenicsxfus_tpu.core.bowl import create_bowl_box
    from fenicsxfus_tpu.core.geometry import volume_factors
    from fenicsxfus_tpu.core.gll import diff_matrix

    g = TRANSDUCERS[tx]
    L, W = g["L"], g["W"]
    h = L / nx
    nyz = max(int(round(W / h)), 2)
    sag = g["roc"] - np.sqrt(g["roc"] ** 2 - g["a"] ** 2)
    bm = float(os.environ.get("FUS_BOWL_BLEND_MULT", "2.0"))
    hm = float(os.environ.get("FUS_BOWL_HOLD_MULT", "0.25"))
    blend = bm * sag
    import time as _t

    _t0 = _t.time()
    mesh, _ = create_bowl_box(
        (nx, nyz, nyz), (0, -W / 2, -W / 2), (L, W / 2, W / 2),
        g["roc"], g["a"], blend=blend, lateral_hold=hm * blend,
    )
    print(f"create_bowl_box: {_t.time()-_t0:.1f}s", flush=True)
    bl = mesh.blend_layers
    nb = bl * nyz * nyz
    print(f"{tx} nx={nx} p={degree}: {mesh.num_cells} cells, "
          f"blend_layers={bl} -> band {nb} cells "
          f"({nb/mesh.num_cells*100:.1f}%), sag={sag*1e3:.2f}mm "
          f"blend={blend*1e3:.2f}mm")

    N = degree + 1
    D = diff_matrix(N)

    # geometry factors for the BAND ONLY (plus one uniform cell) — a shim
    # mesh restricted to those cells keeps the Jacobian compute O(band),
    # not O(mesh) (the full-mesh pass ran >25 min on this 1-core host)
    class _Shim:
        dim = 3

        def __init__(self, cv):
            self._cv = cv
            self.num_cells = cv.shape[0]

        def cell_vertices(self):
            return self._cv

    import time as _time

    t0 = _time.time()
    cv = mesh.cell_vertices()  # [Nc, 8, 3]
    sel = np.concatenate([np.arange(nb), [mesh.num_cells - 1]])
    wdetJ_all, G_all = volume_factors(_Shim(cv[sel]), N)
    print(f"geometry factors for {nb}+1 cells: {_time.time()-t0:.1f}s")
    Gt = G_all.reshape((len(sel),) + (N,) * 3 + (6,))
    # GLOBAL assembled mass, sliced per band cell: m_global at each node
    # of the cell (coeff 1 — the water c^2/rho scaling cancels in ratios)
    t0 = _time.time()
    from fenicsxfus_tpu.core.space import build_space

    space = build_space(mesh, degree)
    m_glob = np.zeros(space.ndofs)
    # assemble in chunks to bound host memory (wdetJ only — G not needed)
    chunk = 32768
    for s in range(0, mesh.num_cells, chunk):
        e = min(s + chunk, mesh.num_cells)
        dmap = np.asarray(space.dofmap_for_cells(np.arange(s, e)))
        wd, _ = volume_factors(_Shim(cv[s:e]), N)
        np.add.at(m_glob, dmap.reshape(-1), wd.reshape(-1))
    dof_band = np.asarray(space.dofmap_for_cells(np.arange(nb)))
    mass_band = m_glob[dof_band]
    print(f"global mass assembly: {_time.time()-t0:.1f}s")

    t0 = _time.time()
    lam_band = percell_lambda(Gt[:nb], wdetJ_all[:nb], D, mass=mass_band)
    print(f"band power iteration: {_time.time()-t0:.1f}s")

    # uniform-cell baseline: the last cell (beyond the band), global mass
    dof_u = np.asarray(space.dofmap_for_cells(
        np.array([mesh.num_cells - 1])))
    lam_u = percell_lambda(Gt[-1:], wdetJ_all[-1:], D,
                           mass=m_glob[dof_u])[0]

    rel = lam_band / lam_u
    print(f"uniform-cell lambda {lam_u:.4e}; band lambda/uniform: "
          f"max {rel.max():.3f}  p99 {np.percentile(rel, 99):.3f}  "
          f"median {np.median(rel):.3f}")
    print(f"implied dt clamp (sqrt of lambda ratio): {np.sqrt(rel.max()):.3f}x")

    r3 = rel.reshape(bl, nyz, nyz)
    ys = (np.arange(nyz) + 0.5) * h - W / 2
    rr = np.sqrt(ys[:, None] ** 2 + ys[None, :] ** 2)
    print("\nper-x-layer: max and p99 of lambda/uniform, radius of worst cell")
    for ix in range(bl):
        sl = r3[ix]
        j = np.unravel_index(np.argmax(sl), sl.shape)
        print(f"  layer {ix:2d}: max {sl.max():7.3f}  p99 "
              f"{np.percentile(sl, 99):7.3f}  at r={rr[j]*1e3:5.1f} mm "
              f"(aperture a={g['a']*1e3:.1f} mm)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--tx", type=str, default="H101")
    ap.add_argument("--degree", type=int, default=4)
    args = ap.parse_args()
    sys.exit(main(args.nx, args.tx, args.degree))
