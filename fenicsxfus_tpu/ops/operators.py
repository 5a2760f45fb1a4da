"""Matrix-free spectral-element operators as batched TPU tensor contractions.

TPU-native redesign of the reference's operator layer
(``cpp/fenicsx-sf/common/spectral_op.hpp``):

* ``MassSpectral3D`` (:30-107): with collocated GLL quadrature every
  mass-type volume/facet term is *diagonal*, so instead of a per-cell
  gather→scale→scatter kernel we assemble, once, a global diagonal vector
  (``assemble_diag`` / ``facet_vector``) and apply it as a fused elementwise
  multiply — zero gather traffic per RK stage.
* ``StiffnessSpectral3D`` (:133-243): the sum-factorised action becomes a
  batched einsum chain over all cells at once —
  gather → D-contractions per axis → symmetric-G pointwise transform →
  transposed D-contractions → deterministic segment-sum assembly
  (replacing MPI ``scatter_rev(+)``, ``common/Linear.hpp:206``).
* A uniform-mesh fast path precomputes the single reference element matrix
  K_ref [N**d, N**d] and applies the whole stiffness as ONE large MXU matmul
  ``[Nc, N**d] @ K_ref^T`` (the TPU-appropriate version of the reference's
  dense-tabulation variant ``cpp/fenicsx-pc/common/precompute_op.hpp``).

Because DG-0 coefficients are constant per cell they commute with the
element-local contractions, so multi-term stiffness sums (e.g. the lossy
RHS −K_{1/ρ}(u) − K_{δ/ρc²}(v), reference ``_lossy.py:117-128``) collapse to
a single operator application on the coefficient-combined gathered field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import (
    facet_factors,
    is_uniform_mesh,
    volume_factors,
)
from ..core.gll import diff_matrix
from ..core.space import build_space

_PRECISION = jax.lax.Precision.HIGHEST


def _einsum(*args):
    return jnp.einsum(*args, precision=_PRECISION)


class SEMOperators:
    """All device-resident operator data for one function space.

    Parameters
    ----------
    mesh : core.mesh.Mesh
    degree : polynomial degree p (GLL basis has N = p+1 nodes per axis)
    dtype : device dtype for fields and operator data (float32 on TPU,
        float64 for CPU validation runs)
    """

    def __init__(self, mesh, degree: int, dtype=jnp.float32):
        self.mesh = mesh
        self.degree = degree
        self.dtype = dtype
        self.space = build_space(mesh, degree)
        sp = self.space
        d, N = mesh.dim, sp.N
        self.d, self.N = d, N
        self.ndofs = sp.ndofs
        self.num_cells = mesh.num_cells

        self.uniform = is_uniform_mesh(mesh)
        self.hybrid = None
        self._geom = None  # lazy (wdetJ_np, G_np); see _compute_geom
        self.D = jnp.asarray(diff_matrix(N), dtype)
        self.lattice = None

        import os as _os

        blend_layers = int(getattr(mesh, "blend_layers", 0) or 0)
        if self.uniform:
            self._compute_geom()
        elif (
            mesh.grid_shape is not None
            and blend_layers
            and d == 3
            and getattr(mesh, "uniform_box", None) is not None
            and _os.environ.get("FUS_HYBRID", "") != "0"
        ):
            # HYBRID path (bowl-fitted / locally-deformed structured meshes,
            # core/bowl.py): the mesh is topologically a lattice whose first
            # ``blend_layers`` x-layers of cells are deformed and whose bulk
            # is exactly uniform. The stiffness splits as
            #   K = K_uniform(whole lattice) + K_{G_cell - G_uniform}(slab)
            # (stiffness_cells is linear in G), so the hot path stays the
            # index-free lattice/Pallas fast path and the correction runs a
            # batched per-cell kernel on the slab only — gather/scatter on
            # the slab are 0/1 window/fold MXU matmuls, no index traffic.
            self._setup_hybrid(blend_layers)
        else:
            self._compute_geom()

        # Lattice fast path (gather-free; see ops/lattice.py): available on
        # axis-aligned uniform structured meshes — G has no off-diagonal
        # coupling there.
        if self.uniform and mesh.grid_shape is not None and d >= 1:
            G = self._G_np
            diag_idx = {1: [0], 2: [0, 2], 3: [0, 3, 5]}[d]
            off = np.delete(G[0], diag_idx, axis=-1)
            if off.size == 0 or np.max(np.abs(off)) < 1e-12 * np.max(np.abs(G[0])):
                from .lattice import LatticeStiffness

                lo = mesh.vertices.min(axis=0)
                hi = mesh.vertices.max(axis=0)
                h = [(hi[a] - lo[a]) / mesh.grid_shape[a] for a in range(d)]
                self.lattice = LatticeStiffness(mesh.grid_shape, degree, h, dtype)
        self._scales_cache: dict[int, object] = {}

        self._facet_cache: dict[int, tuple] = {}
        # Host mirrors of one-time assembled device constants (facet vectors,
        # lumped-mass diagonals).  These are assembled on HOST and uploaded;
        # the fused-stage setup later needs them back as numpy to pack the
        # per-face planes — and a device→host readback of a ~300 MB field
        # over the axon relay costs 30 s–4 min (round-5 ctor profile: the
        # two facet readbacks alone were 58 s of a 67 s constructor, and the
        # dominant share of BENCH rung setup).  Entries pin the device array
        # itself so the id() key cannot be recycled while the entry lives.
        self._np_mirror: dict[int, tuple] = {}

    def _mirror(self, dev, host: np.ndarray):
        self._np_mirror[id(dev)] = (dev, host)
        return dev

    def np_of(self, dev) -> np.ndarray:
        """Host copy of a device constant: the pinned assembly-time mirror
        when one exists, else an (expensive, relay-bound) readback."""
        ent = self._np_mirror.get(id(dev))
        if ent is not None and ent[0] is dev:
            return ent[1]
        return np.asarray(dev)

    # --------------------------------------------------- geometry (lazy)

    def _compute_geom(self):
        """(wdetJ_np, G_np) with a [1, ...] broadcast leading axis on
        uniform meshes. On the HYBRID path this materializes the FULL
        per-cell factors — O(Nc·Nq) host memory, oracle/debug only; the
        production hybrid apply never touches it."""
        if self._geom is None:
            mesh, d, N = self.mesh, self.d, self.N
            if self.uniform:
                from ..core.mesh import Mesh as _Mesh

                sub = _Mesh(
                    dim=d,
                    vertices=mesh.vertices[mesh.cells[0]],
                    cells=np.arange(2**d, dtype=np.int64)[None, :],
                )
                self._geom = volume_factors(sub, N)  # [1, Nq], [1, Nq, nsym]
            else:
                self._geom = volume_factors(mesh, N)  # [Nc, ...]
        return self._geom

    @property
    def _wdetJ_np(self):
        return self._compute_geom()[0]

    @property
    def _G_np(self):
        return self._compute_geom()[1]

    @property
    def wdetJ(self):
        if not hasattr(self, "_wdetJ_dev"):
            # ensure_compile_time_eval: may first be touched inside a jit
            # trace — caching a traced constant would leak a tracer into
            # later traces (same rationale as ``gidx`` below).
            with jax.ensure_compile_time_eval():
                w = self._wdetJ_np
                self._wdetJ_dev = jnp.asarray(
                    w.reshape((-1,) + (self.N,) * self.d), self.dtype
                )
        return self._wdetJ_dev

    @property
    def G(self):
        if not hasattr(self, "_G_dev"):
            with jax.ensure_compile_time_eval():
                G = self._G_np
                self._G_dev = jnp.asarray(
                    G.reshape((-1,) + (self.N,) * self.d + (G.shape[-1],)),
                    self.dtype,
                )
        return self._G_dev

    # ----------------------------------------------------- hybrid (bowl)

    def _setup_hybrid(self, blend_layers: int):
        """Precompute the hybrid split: uniform lattice operator for the
        whole grid + per-cell geometry CORRECTION factors for the deformed
        slab (first ``blend_layers`` x-layers of cells), plus the 0/1
        window/fold matrices that move slab data between the global lattice
        and per-cell layout as MXU matmuls."""
        from ..core.mesh import Mesh as _Mesh
        from .lattice import LatticeStiffness

        mesh, d, N = self.mesh, self.d, self.N
        p = self.degree
        gs = mesh.grid_shape
        lo_u, hi_u = mesh.uniform_box
        h = [(hi_u[a] - lo_u[a]) / gs[a] for a in range(d)]
        self.lattice = LatticeStiffness(gs, p, h, self.dtype)

        bx = min(int(blend_layers), gs[0])
        nb = bx * int(np.prod(gs[1:]))  # slab cells are the FIRST nb cells
        sub = _Mesh(dim=d, vertices=mesh.vertices, cells=mesh.cells[:nb])
        wdetJ_b, G_b = volume_factors(sub, N)  # [Nb, Nq(, nsym)]
        uverts = np.stack(
            np.meshgrid(*[[0.0, h[a]] for a in range(d)], indexing="ij"),
            axis=-1,
        ).reshape(-1, d)
        uni = _Mesh(
            dim=d,
            vertices=lo_u[None, :] + uverts,
            cells=np.arange(2**d, dtype=np.int64)[None, :],
        )
        wdetJ_u, G_u = volume_factors(uni, N)  # [1, Nq(, nsym)]

        # window/fold 0/1 matrices: E_a[i, b*N + j] = 1 iff b*p + j == i.
        # windows (gather) = x_slab contracted with E along each axis;
        # fold (scatter-add) = the exact transposes.
        def E(nblocks, extent):
            m_ = np.zeros((extent, nblocks * N))
            b = np.repeat(np.arange(nblocks), N)
            j = np.tile(np.arange(N), nblocks)
            m_[b * p + j, np.arange(nblocks * N)] = 1.0
            return jnp.asarray(m_, self.dtype)

        blocks = (bx,) + tuple(gs[1:])
        extents = (bx * p + 1,) + tuple(gs[a] * p + 1 for a in range(1, d))
        self.hybrid = {
            "bx": bx,
            "nb": nb,
            "blocks": blocks,
            "slab_x": bx * p + 1,
            "Es": [E(blocks[a], extents[a]) for a in range(d)],
            "G_corr": jnp.asarray(
                (G_b - G_u).reshape((nb,) + (N,) * d + (G_b.shape[-1],)),
                self.dtype,
            ),
            # host copies for the one-time diagonal assemblies
            "wdetJ_corr_np": wdetJ_b - wdetJ_u,
            "G_corr_np": G_b - G_u,
        }

    def _band_gather(self, x):
        """Global vector → slab cell array [Nb, N, N, N] via three window
        matmuls (row-granular, index-free)."""
        return self._band_gather_rows(
            x.reshape(self.lattice.gdims)[: self.hybrid["slab_x"]]
        )

    def _band_gather_rows(self, t):
        """Slab lattice rows [slab_x, G1, G2] → slab cell array
        [Nb, N, N, N] (three window matmuls, row-granular, index-free)."""
        hy = self.hybrid
        N = self.N
        E0, E1, E2 = hy["Es"]
        b0, b1, b2 = hy["blocks"]
        t = _einsum("ia,ijk->ajk", E0.astype(t.dtype), t)
        t = _einsum("jb,ajk->abk", E1.astype(t.dtype), t)
        t = _einsum("kc,abk->abc", E2.astype(t.dtype), t)
        t = t.reshape(b0, N, b1, N, b2, N).transpose(0, 2, 4, 1, 3, 5)
        return t.reshape(hy["nb"], N, N, N)

    def _band_scatter(self, yc):
        """Slab cell array → additive contribution on the global lattice
        (zeros beyond the slab) — the transpose of ``_band_gather``."""
        t = self._band_scatter_rows(yc)
        y3 = jnp.zeros(self.lattice.gdims, t.dtype)
        return y3.at[: self.hybrid["slab_x"]].set(t).reshape(-1)

    def _band_scatter_rows(self, yc):
        """Slab cell array → slab lattice rows [slab_x, G1, G2] — the
        transpose of ``_band_gather_rows``."""
        hy = self.hybrid
        N = self.N
        E0, E1, E2 = hy["Es"]
        b0, b1, b2 = hy["blocks"]
        dt = yc.dtype
        t = yc.reshape(b0, b1, b2, N, N, N).transpose(0, 3, 1, 4, 2, 5)
        t = t.reshape(b0 * N, b1 * N, b2 * N)
        t = _einsum("kc,abc->abk", E2.astype(dt), t)
        t = _einsum("jb,abk->ajk", E1.astype(dt), t)
        return _einsum("ia,ajk->ijk", E0.astype(dt), t)

    def band_correction_rows(self, field_rows, band_coeffs, G):
        """K_{coeff·(G_cell − G_uniform)} on the slab rows only:
        ``field_rows`` are the stage fields pre-sliced to [slab_x, G1, G2]
        (fused-stage path, where un/vn are formed outside the kernel from
        u0/v0/k's); returns the additive correction on the same rows."""
        z = None
        for t, cb in zip(field_rows, band_coeffs):
            zc = cb.reshape(-1, 1, 1, 1).astype(t.dtype) \
                * self._band_gather_rows(t)
            z = zc if z is None else z + zc
        if self._use_dense_tab():
            yc = stiffness_cells_dense(self.B_tab, G, z, self.d)
        else:
            yc = stiffness_cells(self.D, G, z, self.d)
        return self._band_scatter_rows(yc)

    def _band_correction(self, xs, band_coeffs, G=None):
        """y += K_{coeff·(G_cell − G_uniform)}(x) over the deformed slab.

        ``G`` is the per-cell correction tensor; production callers pass it
        through the prepared coeff dict (a traced jit argument) so the
        [Nb, N^d, nsym] array never gets baked into the HLO as a literal
        constant — at production sizes that constant alone exceeded the
        remote-compile request limit (HTTP 413)."""
        if G is None:
            G = self.hybrid["G_corr"]
        z = None
        for x, cb in zip(xs, band_coeffs):
            zc = cb.reshape(-1, 1, 1, 1).astype(x.dtype) * self._band_gather(x)
            z = zc if z is None else z + zc
        if self._use_dense_tab():
            yc = stiffness_cells_dense(self.B_tab, G, z, self.d)
        else:
            yc = stiffness_cells(self.D, G, z, self.d)
        return self._band_scatter(yc)

    def _hybrid_coeff(self, coeff):
        """Split a DG-0 coefficient into (packed-uniform-part, band part)."""
        if isinstance(coeff, dict) and "hyb_u" in coeff:
            return coeff
        arr = np.asarray(coeff, np.float64)
        full = np.broadcast_to(arr.reshape(-1), (self.num_cells,)) \
            if arr.ndim else np.full(self.num_cells, float(arr))
        pk = self.pallas2
        if pk is not None:
            u = self._pack_pallas(pk, full)
        else:
            u = self.pack_scales(full)
        return {
            "hyb_u": u,
            "hyb_b": jnp.asarray(full[: self.hybrid["nb"]], self.dtype),
            # ride the consts pytree into jit as an argument (not an HLO
            # constant); the same device buffer is shared across coeffs
            "hyb_G": self.hybrid["G_corr"],
        }

    # ------------------------------------------------- lazy gather/scatter maps
    # The lattice fast path never touches these; building them eagerly would
    # cost minutes of host time (argsort over Nc·N^d) at 70M DOF.

    @property
    def gidx(self):
        if not hasattr(self, "_gidx"):
            # ensure_compile_time_eval: these may first be touched inside a
            # jit trace — caching a traced constant would leak a tracer into
            # later traces.
            with jax.ensure_compile_time_eval():
                self._gidx = jnp.asarray(
                    self.space.dofmap.reshape(
                        (self.num_cells,) + (self.N,) * self.d
                    )
                )
        return self._gidx

    @property
    def perm(self):
        if not hasattr(self, "_perm"):
            with jax.ensure_compile_time_eval():
                self._perm = jnp.asarray(self.space.scatter_perm)
        return self._perm

    @property
    def segids(self):
        if not hasattr(self, "_segids"):
            with jax.ensure_compile_time_eval():
                self._segids = jnp.asarray(self.space.scatter_segids)
        return self._segids

    @property
    def K_ref(self):
        """Dense element stiffness (uniform meshes): the MXU-matmul analogue
        of the reference's dense-tabulation variant (``fenicsx-pc``).
        Superseded by the lattice path on axis-aligned meshes."""
        if not hasattr(self, "_K_ref"):
            if self.uniform:
                K = _reference_stiffness_matrix(self.N, self.d, self._G_np[0])
                with jax.ensure_compile_time_eval():
                    self._K_ref = jnp.asarray(K, self.dtype)
            else:
                self._K_ref = None
        return self._K_ref

    # ---------------------------------------------------------------- helpers

    def _cells_shape(self, x):
        return (self.num_cells,) + (self.N,) * self.d

    def complete(self, y: jnp.ndarray) -> jnp.ndarray:
        """Finish a locally-assembled global vector. Identity on a single
        device; the sharded solver overrides this with the neighbour halo
        exchange (the ``scatter_rev(+)`` analogue)."""
        return y

    @property
    def blocked(self):
        """Row-granular assembly for unstructured conforming meshes
        (``ops/blocked.py``) — ~100x the scalar-gather path on TPU.
        FUS_BLOCKED=0 forces the segment-sum path."""
        if not hasattr(self, "_blocked_obj"):
            import os

            self._blocked_obj = None
            if (
                getattr(self.space, "conn", None) is not None
                and os.environ.get("FUS_BLOCKED", "") != "0"
            ):
                from .blocked import BlockedAssembly

                self._blocked_obj = BlockedAssembly(self.space)
        return self._blocked_obj

    def scatter(self, ycells: jnp.ndarray) -> jnp.ndarray:
        """Deterministic cell→global additive assembly (row-granular
        blocked path on unstructured meshes; sorted segment-sum plan
        otherwise)."""
        if self.blocked is not None:
            return self.complete(self.blocked.scatter(ycells))
        return self.scatter_segsum(ycells)

    def scatter_segsum(self, ycells: jnp.ndarray) -> jnp.ndarray:
        """Sorted segment-sum assembly (oracle for the blocked path)."""
        flat = ycells.reshape(-1)[self.perm]
        y = jax.ops.segment_sum(
            flat, self.segids, num_segments=self.ndofs, indices_are_sorted=True
        )
        return self.complete(y)

    def gather(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.blocked is not None:
            return self.blocked.gather(x)
        return x[self.gidx]

    # -------------------------------------------------------- diagonal (mass)

    def assemble_diag(self, cell_coeff) -> jnp.ndarray:
        """Assembled diagonal of the coefficient-weighted mass matrix:
        m[i] = Σ_{cells c ∋ i} coeff_c · w_i · |detJ|_c(i).

        Reference: lumped mass via GLL quadrature, ``_linear.py:348-353``.
        On the lattice path this is an index-free host fold.
        """
        if self.lattice is not None and not isinstance(cell_coeff, jax.core.Tracer):
            m = self.lattice.mass_diag(np.asarray(cell_coeff))
            if self.hybrid is not None:
                m = m.reshape(-1) + self._diag_band_np(
                    cell_coeff, self.hybrid["wdetJ_corr_np"]
                )
            npdt = np.float32 if np.dtype(self.dtype) == np.float32 else np.float64
            host = np.asarray(m, npdt).reshape(-1)
            return self._mirror(jnp.asarray(host), host)
        coeff = _as_cell_array(cell_coeff, self.num_cells, self.dtype)
        shape = (-1,) + (1,) * self.d
        return self.scatter(coeff.reshape(shape) * self.wdetJ)

    def _diag_band_np(self, cell_coeff, percell_np) -> np.ndarray:
        """Host scatter-add of a per-slab-cell diagonal correction
        (hybrid path one-time setup; ``percell_np`` [Nb, N^d])."""
        nb = self.hybrid["nb"]
        coeff = np.broadcast_to(
            np.asarray(cell_coeff, np.float64).reshape(-1), (self.num_cells,)
        )[:nb]
        dof_b = np.asarray(self.space.dofmap_for_cells(np.arange(nb)))
        out = np.zeros(self.ndofs)
        np.add.at(
            out,
            dof_b.reshape(-1),
            (coeff[:, None] * percell_np.reshape(nb, -1)).reshape(-1),
        )
        return out

    # --------------------------------------------------------------- stiffness

    def gather_combine(self, xs, coeffs) -> jnp.ndarray:
        """Gather fields and combine with per-cell DG0 coefficients:
        z_c = Σ_f coeff[f, c] · x_f[dofmap[c]].   [Nc, N, ...]
        """
        z = None
        shape = (-1,) + (1,) * self.d
        for x, coeff in zip(xs, coeffs):
            c = _as_cell_array(coeff, self.num_cells, self.dtype)
            term = c.reshape(shape) * self.gather(x)
            z = term if z is None else z + term
        return z

    def pack_scales(self, coeff):
        """Precompute the lattice-path scale data for one coefficient
        (host-side). Constant coefficients get rank-1 (broadcast) scales;
        fields get full mixed-rep tensors. NOTE: no identity-based caching —
        ``id()`` of temporaries gets recycled and silently aliases fields."""
        arr = np.asarray(coeff, np.float64)
        if arr.ndim == 0:
            return self.lattice.scales_const(float(arr))
        if arr.size == self.num_cells and np.ptp(arr) == 0:
            return self.lattice.scales_const(float(arr.reshape(-1)[0]))
        return tuple(self.lattice.scales_field(arr))

    def stiff_coeff(self, coeff):
        """Prepare a DG-0 stiffness coefficient for use inside jit: on the
        pallas fast path pack the per-axis F tensors, on the XLA lattice
        path the mixed-rep scale tensors (host-side — packing cannot happen
        on traced values once consts flow as jit arguments); otherwise
        return the device coefficient array."""
        if self.hybrid is not None:
            return self._hybrid_coeff(coeff)
        pk = self.pallas2
        if pk is not None:
            return self._pack_pallas(pk, coeff)
        if self.lattice is not None:
            return self.pack_scales(np.asarray(coeff, np.float64))
        return _as_cell_array(jnp.asarray(np.asarray(coeff)), self.num_cells, self.dtype)

    def _pack_pallas(self, pk, coeff):
        arr = np.asarray(coeff, np.float64)
        if arr.ndim == 0:
            return pk.pack_const(float(arr))
        if arr.size == self.num_cells and np.ptp(arr) == 0:
            return pk.pack_const(float(arr.reshape(-1)[0]))
        return pk.pack_field(arr)

    def _is_packed(self, coeff) -> bool:
        """Packed lattice scales are a tuple/list (per-axis); packed pallas
        coefficients are dicts of per-axis F tensors; raw DG-0 coefficients
        are scalars or single arrays."""
        return isinstance(coeff, (tuple, list, dict))

    def stiffness_apply(self, xs, coeffs) -> jnp.ndarray:
        """y = Σ_f K_{coeff_f}(x_f)  where K_c(u)·φ_i = ∫ c ∇u·∇φ_i dx.

        ``xs``: sequence of global vectors [ndofs]; ``coeffs``: matching
        sequence of per-cell coefficients ([Nc] array or scalar), or
        prepacked lattice scales (sharded path). Reference kernels:
        ``spectral_op.hpp:173-243`` (sum-factorised) and
        ``precompute_op.hpp:294-486`` (dense tabulation).
        """
        if self.hybrid is not None:
            cs = [self._hybrid_coeff(c) for c in coeffs]
            us = [c["hyb_u"] for c in cs]
            bs = [c["hyb_b"] for c in cs]
            pk = self.pallas2
            if pk is not None:
                y = pk.apply(xs, us).reshape(-1)
            else:
                pairs = [
                    (x.reshape(self.lattice.gdims), u)
                    for x, u in zip(xs, us)
                ]
                y = self.lattice.apply_scaled(pairs).reshape(-1)
            y = y + self._band_correction(xs, bs, cs[0].get("hyb_G"))
            return self.complete(y)
        pk = self.pallas2
        if pk is not None:
            Fs = [
                c if isinstance(c, dict) else self._pack_pallas(pk, c)
                for c in coeffs
            ]
            y = pk.apply(xs, Fs).reshape(-1)
            return self.complete(y)
        if self.lattice is not None:
            pairs = []
            for x, coeff in zip(xs, coeffs):
                scales = coeff if self._is_packed(coeff) else self.pack_scales(coeff)
                pairs.append((x.reshape(self.lattice.gdims), scales))
            y = self.lattice.apply_scaled(pairs).reshape(-1)
            return self.complete(y)
        z = self.gather_combine(xs, coeffs)
        if self.K_ref is not None:
            nd = self.N**self.d
            y = _einsum(
                "cn,mn->cm", z.reshape(self.num_cells, nd), self.K_ref
            )
        else:
            y = self._stiffness_cells(z)
        return self.scatter(y)

    @property
    def pallas2(self):
        """Fused Pallas stiffness (3D uniform lattice), DEFAULT ON on TPU.

        The round-1 opt-in gating ("long scans crashed the TPU worker") was
        root-caused to this environment's relay, not the kernels: the axon
        worker restarts after ~10 min of *cumulative device execution* with
        pure-XLA programs as well (reproduced with both single long scans
        and segmented launches); ``run_segmented`` bounds per-launch
        execution, which is the correct mitigation regardless of kernel
        path. Env overrides: FUS_PALLAS=0 disables; FUS_PALLAS=1 forces on
        (interpret mode off-TPU, used by the equivalence tests)."""
        if not hasattr(self, "_pallas2_obj"):
            import os

            import jax as _jax

            flag = os.environ.get("FUS_PALLAS", "")
            on_tpu = _jax.default_backend() == "tpu"
            enable = (
                self.lattice is not None
                and self.d == 3
                and flag != "0"
                and (on_tpu or flag == "1")
            )
            if enable:
                from .pallas_lattice import LatticePallasStiffness

                tc = int(os.environ.get("FUS_TILE_COLS", "512"))
                pk = LatticePallasStiffness(
                    self.lattice, tile_cols=tc, interpret=not on_tpu
                )
                self._pallas2_obj = pk if pk.usable() else None
            else:
                self._pallas2_obj = None
        return self._pallas2_obj

    def stiffness_apply_generic(self, xs, coeffs) -> jnp.ndarray:
        """Force the scalar-gather→sum-factorised→segment-sum path (oracle
        for the blocked row-granular assembly, the lattice/pallas fast
        paths AND the dense-tabulation kernel — deliberately pinned to
        ``stiffness_cells`` so oracle and production never share one)."""
        z = None
        shape = (-1,) + (1,) * self.d
        for x, coeff in zip(xs, coeffs):
            c = _as_cell_array(coeff, self.num_cells, self.dtype)
            term = c.reshape(shape) * x[self.gidx]
            z = term if z is None else z + term
        y = stiffness_cells(self.D, self.G, z, self.d)
        return self.scatter_segsum(y)

    def pack_scales_nodal(self, coeff_nodal):
        """Lattice scales for a nodal (per-DOF) coefficient (sponge layers)."""
        return self.lattice.scales_nodal(np.asarray(coeff_nodal))

    def stiffness_apply_nodal(self, xs, nodal_coeffs) -> jnp.ndarray:
        """y = Σ_f K_{c_f(x)}(x_f) with coefficients given at the GLL nodes
        and evaluated at the (collocated) quadrature points — the spatially
        varying sponge-layer term ∫ δ(x) ∇v·∇φ dx
        (reference ``_experimental.py:898-918``)."""
        if self.lattice is not None:
            pairs = []
            for x, cn in zip(xs, nodal_coeffs):
                scales = cn if self._is_packed(cn) else self.pack_scales_nodal(cn)
                pairs.append((x.reshape(self.lattice.gdims), scales))
            y = self.lattice.apply_scaled(pairs).reshape(-1)
            return self.complete(y)
        y = None
        for x, cn in zip(xs, nodal_coeffs):
            q = self.gather(cn)  # coefficient at the quadrature lattice
            yc = self._stiffness_cells(self.gather(x), qcoeff=q)
            y = yc if y is None else y + yc
        return self.scatter(y)

    def stiffness_cells_general(self, z: jnp.ndarray) -> jnp.ndarray:
        return self._stiffness_cells(z)

    @property
    def B_tab(self):
        """Shared dense gradient tabulation [d, N^d, N^d] (lazy; the
        lattice/pallas fast paths never touch it)."""
        if not hasattr(self, "_B_tab"):
            with jax.ensure_compile_time_eval():
                self._B_tab = jnp.asarray(
                    tabulate_B(self.N, self.d), self.dtype
                )
        return self._B_tab

    def _use_dense_tab(self) -> bool:
        import os

        return self.d >= 2 and os.environ.get("FUS_DENSE_TAB", "1") != "0"

    def _stiffness_cells(self, z: jnp.ndarray, qcoeff=None) -> jnp.ndarray:
        """Per-cell stiffness action on gathered fields: dense-tabulation
        MXU matmuls by default (``stiffness_cells_dense``; FUS_DENSE_TAB=0
        pins the sum-factorised chain). ``qcoeff`` optionally scales the
        flux at each quadrature point (nodal-coefficient variant)."""
        if self._use_dense_tab():
            return stiffness_cells_dense(self.B_tab, self.G, z, self.d, qcoeff)
        return stiffness_cells(self.D, self.G, z, self.d, qcoeff)

    def stiffness_diag(self, cell_coeff) -> jnp.ndarray:
        """Assembled diagonal of the stiffness matrix (Jacobi preconditioner
        for the implicit DIRK path; reference uses PETSc PC Jacobi,
        ``_linear.py:644-647``). On the lattice path this is a streamed
        index-free host fold (O(ndofs) memory — the round-1 version
        materialized [Nc, N^d], a wall at 10⁷+ DOF)."""
        if self.lattice is not None and not isinstance(cell_coeff, jax.core.Tracer):
            kd = self.lattice.stiffness_diag(np.asarray(cell_coeff))
            if self.hybrid is not None:
                N = self.N
                nb = self.hybrid["nb"]
                diag_b = _stiffness_diag_cells_np(
                    self.hybrid["G_corr_np"].reshape(
                        (nb,) + (N,) * self.d + (-1,)
                    ),
                    N,
                    self.d,
                    nb,
                )
                kd = kd.reshape(-1) + self._diag_band_np(
                    cell_coeff, diag_b
                )
            return jnp.asarray(kd, self.dtype)
        d, N = self.d, self.N
        G = self._G_np.reshape((-1,) + (N,) * d + (self._G_np.shape[-1],))
        diag = _stiffness_diag_cells_np(G, N, d, self.num_cells)
        coeff = np.asarray(
            _as_cell_array(cell_coeff, self.num_cells, jnp.float64)
        ).reshape((-1,) + (1,) * d)
        out = self.scatter(jnp.asarray(coeff * diag, self.dtype))
        return out

    # ------------------------------------------------------------------ facets

    def facet_data(self, tag: int):
        if tag not in self._facet_cache:
            facets = self.mesh.facet_tags.get(tag, np.zeros((0, 2), np.int64))
            gdofs, wdetJf, cells = facet_factors(self.mesh, self.space, facets)
            self._facet_cache[tag] = (
                gdofs.reshape(-1),
                wdetJf.reshape(-1),
                cells,
            )
        return self._facet_cache[tag]

    def facet_vector(self, tag: int, cell_coeff) -> jnp.ndarray:
        """Assembled vector of ∫_{Γ_tag} coeff φ_i ds  (GLL-collocated, so
        boundary mass terms are diagonal too). Used for the transducer source
        vector (tag 1) and the Sommerfeld ABC diagonal (tag 2); reference
        forms ``_linear.py:355-361``."""
        gdofs, w, cells = self.facet_data(tag)
        npdt = np.float32 if np.dtype(self.dtype) == np.float32 else np.float64
        coeff = np.broadcast_to(
            np.asarray(cell_coeff, npdt).reshape(-1), (self.num_cells,)
        )
        vals = np.asarray(w, npdt) * (
            np.repeat(coeff[cells], w.shape[0] // max(len(cells), 1))
            if len(cells)
            else np.zeros(0, npdt)
        )
        # Host assembly: XLA lowers scalar scatter-add near-serially on TPU
        # (minutes for ~1M updates); numpy does it in milliseconds, and facet
        # vectors are one-time setup data. Built in the device dtype to avoid
        # float64 traffic on this single-core host.
        out = np.zeros(self.ndofs, npdt)
        np.add.at(out, np.asarray(gdofs), vals)
        return self._mirror(jnp.asarray(out), out)

    def facet_vector_nodal(self, tag: int, nodal_coeff, cell_coeff=None) -> jnp.ndarray:
        """Assembled ∫_{Γ_tag} c_cell · s(x) φ_i ds with a per-DOF profile
        ``s`` and an optional DG-0 material coefficient ``cell_coeff`` —
        spatially windowed sources s(x)·g(t) (reference ``LinearSpectralS2``,
        ``_experimental.py:431-439``), the sponge δ(x)-weighted facet
        mass (``:898-905``), and phased-aperture sources in heterogeneous
        media (the reference keeps per-cell 1/ρ etc. inside its facet forms,
        ``_lossy.py:107-128`` — a scalar mean is wrong when the medium varies
        at the boundary)."""
        gdofs, w, cells = self.facet_data(tag)
        npdt = np.float32 if np.dtype(self.dtype) == np.float32 else np.float64
        gd = np.asarray(gdofs)
        vals = np.asarray(w, npdt) * np.asarray(nodal_coeff, npdt)[gd]
        if cell_coeff is not None:
            coeff = np.broadcast_to(
                np.asarray(cell_coeff, npdt).reshape(-1), (self.num_cells,)
            )
            if len(cells):
                vals = vals * np.repeat(coeff[cells], w.shape[0] // len(cells))
        out = np.zeros(self.ndofs, npdt)
        np.add.at(out, gd, vals)
        return self._mirror(jnp.asarray(out), out)

    # ------------------------------------------------------------ interpolation

    def dof_coords(self) -> np.ndarray:
        return self.space.dof_coords

    def interpolate(self, fn) -> jnp.ndarray:
        """Nodal interpolation of ``fn(x)`` (x: [dim, ndofs]) onto the space —
        GLL Lagrange interpolation is pointwise at the nodes."""
        vals = fn(self.space.dof_coords.T)
        return jnp.asarray(vals, self.dtype)


def _as_cell_array(coeff, num_cells: int, dtype):
    if np.isscalar(coeff) or getattr(coeff, "ndim", 1) == 0:
        return jnp.full((num_cells,), coeff, dtype)
    arr = jnp.asarray(coeff, dtype)
    assert arr.shape == (num_cells,), f"DG0 coefficient must be [{num_cells}]"
    return arr


def tabulate_B(N: int, d: int) -> np.ndarray:
    """Dense gradient tabulation B[a, q, n] = ∂_a φ_n(ξ_q) on the GLL
    lattice (Kronecker of the 1D differentiation matrix along axis ``a``
    with identities elsewhere) — the reference's precomputed-basis
    tabulation (``cpp/fenicsx-pc/common/precompute_op.hpp:18-33``)."""
    Dm = diff_matrix(N)
    eye = np.eye(N)
    Bs = []
    for a in range(d):
        mats = [Dm if ax == a else eye for ax in range(d)]
        B = mats[0]
        for m in mats[1:]:
            B = np.einsum("qn,rm->qrnm", B, m).reshape(
                B.shape[0] * m.shape[0], B.shape[1] * m.shape[1]
            )
        Bs.append(B)
    return np.stack(Bs)  # [d, N^d, N^d]


def stiffness_cells_dense(B, G, z: jnp.ndarray, d: int, qcoeff=None) -> jnp.ndarray:
    """Per-cell stiffness action via the DENSE shared gradient tabulation:
    y_c = Bᵀ (G_c ∘ (B x_c)). Mathematically identical to the
    sum-factorised ``stiffness_cells`` but shaped for the MXU: the
    contractions are [Nc, N^d] @ [N^d, d·N^d] matmuls with K = N^d
    (125 at p=4) instead of K = N (5) — the sum-factorised chain runs the
    systolic array at ~N/128 utilisation, so ~5x more FLOPs through
    ~25x wider passes is a large net win on unstructured cells. This is
    the reference's dense-tabulation rung (``fenicsx-pc``,
    ``precompute_op.hpp:294-486``) reshaped for TPU; SURVEY §7.2 calls
    this exact trade. ``G``: [Nc or 1, (N,)*d, nsym]."""
    from ..core.geometry import SYM_PAIRS

    nc = z.shape[0]
    nd = z.reshape(nc, -1).shape[1]
    Gf = G.reshape(G.shape[0], nd, G.shape[-1])
    du = _einsum("aqn,cn->caq", B, z.reshape(nc, nd))  # [Nc, d, Nq]
    pairs = SYM_PAIRS[d]
    sym = {p: i for i, p in enumerate(pairs)}
    gs = []
    for a in range(d):
        g = None
        for b in range(d):
            t = Gf[..., sym[(a, b) if a <= b else (b, a)]] * du[:, b]
            g = t if g is None else g + t
        if qcoeff is not None:
            g = g * qcoeff.reshape(-1, nd)
        gs.append(g)
    gq = jnp.stack(gs, axis=1)  # [Nc, d, Nq]
    y = _einsum("aqn,caq->cn", B, gq)
    return y.reshape(z.shape)


def stiffness_cells(D, G, z: jnp.ndarray, d: int, qcoeff=None) -> jnp.ndarray:
    """Functional sum-factorised per-cell stiffness action (reference
    ``cpp/fenicsx-sf/common/spectral_op.hpp:173-243``): forward
    D-contractions per axis, symmetric-G quadrature transform, transposed
    D-contractions. ``G``: [Nc or 1, (N,)*d, nsym]. Module-level so the
    sharded unstructured path (``parallel/unstructured.py``) can apply it
    with per-device *traced* geometry."""
    s = (lambda g: g * qcoeff) if qcoeff is not None else (lambda g: g)
    if d == 1:
        du = _einsum("qi,ci->cq", D, z)
        g = s(G[..., 0] * du)
        return _einsum("qi,cq->ci", D, g)
    if d == 2:
        d0 = _einsum("qi,cij->cqj", D, z)
        d1 = _einsum("qj,cij->ciq", D, z)
        g0 = s(G[..., 0] * d0 + G[..., 1] * d1)
        g1 = s(G[..., 1] * d0 + G[..., 2] * d1)
        return _einsum("qi,cqj->cij", D, g0) + _einsum("qj,ciq->cij", D, g1)
    d0 = _einsum("qi,cijk->cqjk", D, z)
    d1 = _einsum("qj,cijk->ciqk", D, z)
    d2 = _einsum("qk,cijk->cijq", D, z)
    g0 = s(G[..., 0] * d0 + G[..., 1] * d1 + G[..., 2] * d2)
    g1 = s(G[..., 1] * d0 + G[..., 3] * d1 + G[..., 4] * d2)
    g2 = s(G[..., 2] * d0 + G[..., 4] * d1 + G[..., 5] * d2)
    return (
        _einsum("qi,cqjk->cijk", D, g0)
        + _einsum("qj,ciqk->cijk", D, g1)
        + _einsum("qk,cijq->cijk", D, g2)
    )


def _stiffness_diag_cells_np(G, N: int, d: int, num_cells: int) -> np.ndarray:
    """Per-cell diagonal entries of the stiffness matrix on the host:
    diag[c, i] = Σ_q Σ_ab B_a[q,i] G[c,q,ab] B_b[q,i] for the GLL-collocated
    basis (B_a is the Kronecker derivative along axis a, whose rows reduce
    to D along axis a and identity elsewhere). ``G`` broadcasts over a
    leading axis of 1 (uniform) or ``num_cells``."""
    from ..core.geometry import SYM_PAIRS

    Dnp = diff_matrix(N)
    pairs = SYM_PAIRS[d]
    sym = {p: i for i, p in enumerate(pairs)}
    diag = np.zeros((num_cells,) + (N,) * d)
    D2 = Dnp**2  # [q, n]
    for a in range(d):
        Gaa = G[..., sym[(a, a)]]
        diag += np.moveaxis(
            np.tensordot(np.moveaxis(Gaa, 1 + a, -1), D2, axes=([-1], [0])),
            -1,
            1 + a,
        )
    ddiag = np.diag(Dnp)
    for a in range(d):
        for b in range(a + 1, d):
            Gab = G[..., sym[(a, b)]]
            diag += 2.0 * Gab * np.expand_dims(
                ddiag, tuple(i for i in range(d) if i != a)
            ) * np.expand_dims(ddiag, tuple(i for i in range(d) if i != b))
    return diag


def _reference_stiffness_matrix(N: int, d: int, G0: np.ndarray) -> np.ndarray:
    """Dense element stiffness K_ref[n, m] = Σ_q Σ_ab B_a[q,n] G[q,ab] B_b[q,m]
    for the (shared) geometry factors ``G0`` [Nq, nsym] of a uniform mesh."""
    from ..core.geometry import SYM_PAIRS

    Dm = diff_matrix(N)
    eye = np.eye(N)
    # B[a]: [Nq, nd] derivative along reference axis a at the GLL lattice.
    Bs = []
    for a in range(d):
        mats = [Dm if ax == a else eye for ax in range(d)]
        B = mats[0]
        for m in mats[1:]:
            B = np.einsum("qn,rm->qrnm", B, m).reshape(
                B.shape[0] * m.shape[0], B.shape[1] * m.shape[1]
            )
        Bs.append(B)
    pairs = SYM_PAIRS[d]
    K = np.zeros((N**d, N**d))
    for idx, (a, b) in enumerate(pairs):
        g = G0[:, idx]
        K += np.einsum("qn,q,qm->nm", Bs[a], g, Bs[b])
        if a != b:
            K += np.einsum("qn,q,qm->nm", Bs[b], g, Bs[a])
    return K
