"""Unstructured-mesh operator path timings (the `fenicsx` baseline rung).

The reference's production benchmarks all read unstructured meshes
(``cpp/fenicsx-sf/benchmarks/HITU/W-H131-WATER/main.cpp:56-63``); this
framework solves them through the gather → sum-factorised einsum →
segment-sum path. This harness quantifies that path per component on the
TPU (round-1 gap: "no benchmark quantifies it") and compares per-DOF cost
against the lattice fast path:

* gather      x[gidx]                      [Nc, N^d] take
* contract    per-cell sum-factorised einsum chain (MXU)
* scatter     static-perm take + sorted segment-sum
* total       stiffness_apply_generic
* csr         gather-based transpose assembly (padded-CSR alternative)

Run:  python benchmarks/unstructured_speed.py [--nx 28] [--degree 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_slope_timer():
    """Per-apply cost as the slope between rep-10 and rep-50 fori_loop
    chains (same methodology as operator_speed.py — a single launch through
    the relay costs ~30 ms of dispatch latency that must cancel out).

    The rep spread must keep the slope well above the relay's launch
    jitter: at the small sizes this harness runs (~1 ms/apply), a 10-vs-20
    spread left the 10 ms signal inside the +-5-10 ms dispatch noise and
    produced NEGATIVE timings in the first committed round-3 table; 10-vs-50
    puts ~40 ms of compute between the endpoints."""
    import jax
    import jax.numpy as jnp

    def timeit(f, x, n=5):
        y = f(x)
        _ = float(jnp.sum(y.reshape(-1)[:8]))
        best = 1e9
        for _i in range(n):
            t0 = time.perf_counter()
            y = f(x)
            _ = float(jnp.sum(y.reshape(-1)[:8]))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain(f, rep):
        return jax.jit(
            lambda x0: jax.lax.fori_loop(0, rep, lambda i, y: f(y), x0)
        )

    def slope(f, x):
        return (timeit(chain(f, 50), x) - timeit(chain(f, 10), x)) / 40

    return slope


def build_csr_plan(dofmap, ndofs):
    """Padded-CSR transpose of the scatter: inv_idx [ndofs, K] indexing the
    flattened cell values (+1 zero pad slot at the end)."""
    import numpy as np

    flat = dofmap.reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_dofs = flat[order]
    counts = np.bincount(sorted_dofs, minlength=ndofs)
    K = int(counts.max())
    starts = np.zeros(ndofs + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pad_slot = flat.size
    inv = np.full((ndofs, K), pad_slot, np.int32)
    for k in range(K):
        sel = counts > k
        inv[sel, k] = order[starts[:-1][sel] + k]
    return inv, K


# persistent XLA compilation cache (big Mosaic programs compile slowly)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main(nx=28, degree=4, with_segsum=False, shuffle=False, reorder=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenicsxfus_tpu import create_box, reorder_locality
    from fenicsxfus_tpu.core.mesh import Mesh
    from fenicsxfus_tpu.ops.operators import SEMOperators

    # distorted box: smooth coordinate warp kills the uniform fast path but
    # keeps element quality (reference test pattern, test_operators3d)
    base = create_box((nx, nx, nx), (0, 0, 0), (1.0, 1.0, 1.0))
    v = base.vertices.copy()
    w = 0.05
    v[:, 0] += w * np.sin(np.pi * v[:, 1]) * np.sin(np.pi * v[:, 2])
    v[:, 1] += w * np.sin(np.pi * v[:, 2]) * np.sin(np.pi * v[:, 0])
    v[:, 2] += w * np.sin(np.pi * v[:, 0]) * np.sin(np.pi * v[:, 1])
    cells = base.cells
    if shuffle:
        # worst-case numbering a mesh read could produce: random cell order
        # AND random vertex ids (--shuffle vs --shuffle --reorder A/Bs the
        # locality preprocessing, core/mesh.py::reorder_locality)
        rng = np.random.default_rng(7)
        vperm = rng.permutation(base.num_vertices)
        v2 = np.empty_like(v)
        v2[vperm] = v
        v, cells = v2, vperm[cells][rng.permutation(base.num_cells)]
    mesh = Mesh(dim=3, vertices=v, cells=cells)
    if reorder:
        mesh = reorder_locality(mesh)
    print(f"numbering: shuffle={shuffle} reorder={reorder}")

    ops = SEMOperators(mesh, degree, dtype=jnp.float32)
    assert ops.lattice is None and not ops.uniform
    n = ops.ndofs
    nc = mesh.num_cells
    print(f"distorted box: {nc} cells, p={degree}, {n/1e6:.2f}M DOF")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    coeff = jnp.asarray(0.5 + rng.random(nc), jnp.float32)

    gidx, perm, segids = ops.gidx, ops.perm, ops.segids
    slope = make_slope_timer()

    def scatter(yc):
        flat = yc.reshape(-1)[perm]
        return jax.ops.segment_sum(
            flat, segids, num_segments=n, indices_are_sorted=True
        )

    inv, K = build_csr_plan(np.asarray(ops.space.dofmap), n)
    inv_j = jnp.asarray(inv)

    def scatter_csr(yc):
        padded = jnp.concatenate([yc.reshape(-1), jnp.zeros(1, yc.dtype)])
        return padded[inv_j].sum(axis=1)

    # shape-preserving composites (fori_loop-chainable):
    z0 = jnp.asarray(rng.standard_normal((nc,) + (degree + 1,) * 3), jnp.float32)
    scale = None

    def normalised(f, x0):
        fj = jax.jit(f)  # eager op-by-op dispatch compiles ~100 one-op
        y = fj(x0)       # programs through the relay (~minutes) — jit it
        r = float(jnp.max(jnp.abs(y)) / jnp.max(jnp.abs(x0)))
        return lambda y_: f(y_) * (1.0 / r)

    total_blocked = normalised(lambda y: ops.stiffness_apply([y], [coeff]), x)
    contract = normalised(ops._stiffness_cells, z0)
    from fenicsxfus_tpu.ops.operators import (
        stiffness_cells,
        stiffness_cells_dense,
    )

    contract_sf = normalised(
        lambda z: stiffness_cells(ops.D, ops.G, z, 3), z0
    )
    contract_de = normalised(
        lambda z: stiffness_cells_dense(ops.B_tab, ops.G, z, 3), z0
    )
    if with_segsum:
        total = normalised(
            lambda y: ops.stiffness_apply_generic([y], [coeff]), x
        )
        roundtrip = normalised(lambda y: scatter(y[gidx]), x)
        roundtrip_csr = normalised(lambda y: scatter_csr(y[gidx]), x)
        roundtrip_blk = normalised(
            lambda y: ops.blocked.scatter(ops.blocked.gather(y)), x
        )

    if with_segsum:
        err = float(
            jnp.max(jnp.abs(scatter_csr(z0) - scatter(z0)))
            / jnp.max(jnp.abs(scatter(z0)))
        )
        assert err < 1e-5, err

    ttb = slope(total_blocked, x)
    tc = slope(contract, z0)
    tcsf = slope(contract_sf, z0)
    tcde = slope(contract_de, z0)
    print(f"  contract (default)  {tc*1e3:8.2f} ms ({n/tc/1e9:6.2f} GDOF/s)")
    print(f"  contract sum-fact   {tcsf*1e3:8.2f} ms ({n/tcsf/1e9:6.2f} GDOF/s)")
    print(f"  contract dense-tab  {tcde*1e3:8.2f} ms ({n/tcde/1e9:6.2f} GDOF/s)")
    tt = None
    if with_segsum:
        tt = slope(total, x)
        trt = slope(roundtrip, x)
        tcsr = slope(roundtrip_csr, x)
        trb = slope(roundtrip_blk, x)
        print(f"  gather+scatter      {trt*1e3:8.2f} ms ({n/trt/1e9:6.2f} GDOF/s)")
        print(f"  gather+csr-gather   {tcsr*1e3:8.2f} ms ({n/tcsr/1e9:6.2f} GDOF/s) [K={K}]")
        print(f"  blocked g+s         {trb*1e3:8.2f} ms ({n/trb/1e9:6.2f} GDOF/s)")
        print(f"  total (segsum)      {tt*1e3:8.2f} ms ({n/tt/1e9:6.2f} GDOF/s)")
    print(f"  total (blocked)     {ttb*1e3:8.2f} ms ({n/ttb/1e9:6.2f} GDOF/s)")

    # lattice path per-DOF comparison at the same size
    lat_mesh = create_box((nx, nx, nx), (0, 0, 0), (1.0, 1.0, 1.0))
    lops = SEMOperators(lat_mesh, degree, dtype=jnp.float32)
    pk = lops.pallas2
    xl = jnp.asarray(rng.standard_normal(lops.ndofs), jnp.float32).reshape(
        lops.lattice.gdims
    )
    if pk is not None:
        Fc = pk.pack_const(1.0)
        lat_f = normalised(lambda y: pk.apply([y], [Fc]), xl)
    else:
        sc = lops.pack_scales(1.0)
        lat_f = normalised(lambda y: lops.lattice.apply_scaled([(y, sc)]), xl)
    tl = slope(lat_f, xl)
    seg = f"  (segsum {tt/tl*lops.ndofs/n:.1f}x)" if tt else ""
    print(f"  lattice (same size) {tl*1e3:8.2f} ms ({lops.ndofs/tl/1e9:6.2f} GDOF/s)"
          f"  -> blocked/lattice per-DOF ratio {ttb/tl*lops.ndofs/n:.1f}x{seg}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=28)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--with-segsum", action="store_true",
                    help="also time the (very slow) scalar-gather oracle")
    ap.add_argument("--shuffle", action="store_true",
                    help="randomly permute cell order + vertex ids first")
    ap.add_argument("--reorder", action="store_true",
                    help="apply reorder_locality (Morton + first-touch)")
    main(**vars(ap.parse_args()))
