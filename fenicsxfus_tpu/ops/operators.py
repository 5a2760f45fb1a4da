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
        if self.uniform:
            # Geometry is identical for every cell: precompute on one cell and
            # broadcast ([1, Nq] leading axis) — O(1) memory instead of O(Nc).
            from ..core.mesh import Mesh as _Mesh

            sub = _Mesh(
                dim=d,
                vertices=mesh.vertices[mesh.cells[0]],
                cells=np.arange(2**d, dtype=np.int64)[None, :],
            )
            wdetJ, G = volume_factors(sub, N)  # [1, Nq], [1, Nq, nsym]
        else:
            wdetJ, G = volume_factors(mesh, N)  # [Nc, Nq], [Nc, Nq, nsym]
        self._wdetJ_np = wdetJ
        self._G_np = G
        self.wdetJ = jnp.asarray(wdetJ.reshape((-1,) + (N,) * d), dtype)
        self.G = jnp.asarray(G.reshape((-1,) + (N,) * d + (G.shape[-1],)), dtype)
        self.D = jnp.asarray(diff_matrix(N), dtype)

        # Lattice fast path (gather-free; see ops/lattice.py): available on
        # axis-aligned uniform structured meshes — G has no off-diagonal
        # coupling there.
        self.lattice = None
        if self.uniform and mesh.grid_shape is not None and d >= 1:
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
            return jnp.asarray(m, self.dtype)
        coeff = _as_cell_array(cell_coeff, self.num_cells, self.dtype)
        shape = (-1,) + (1,) * self.d
        return self.scatter(coeff.reshape(shape) * self.wdetJ)

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
        """Force the scalar-gather→contract→segment-sum path (oracle for the
        blocked row-granular assembly and the lattice/pallas fast paths)."""
        z = None
        shape = (-1,) + (1,) * self.d
        for x, coeff in zip(xs, coeffs):
            c = _as_cell_array(coeff, self.num_cells, self.dtype)
            term = c.reshape(shape) * x[self.gidx]
            z = term if z is None else z + term
        y = self._stiffness_cells(z)
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

    def _stiffness_cells(self, z: jnp.ndarray, qcoeff=None) -> jnp.ndarray:
        """Sum-factorised per-cell stiffness action on gathered fields.
        ``qcoeff`` optionally scales the flux at each quadrature point
        (nodal-coefficient variant)."""
        return stiffness_cells(self.D, self.G, z, self.d, qcoeff)

    def stiffness_diag(self, cell_coeff) -> jnp.ndarray:
        """Assembled diagonal of the stiffness matrix (Jacobi preconditioner
        for the implicit DIRK path; reference uses PETSc PC Jacobi,
        ``_linear.py:644-647``). On the lattice path this is a streamed
        index-free host fold (O(ndofs) memory — the round-1 version
        materialized [Nc, N^d], a wall at 10⁷+ DOF)."""
        if self.lattice is not None and not isinstance(cell_coeff, jax.core.Tracer):
            kd = self.lattice.stiffness_diag(np.asarray(cell_coeff))
            return jnp.asarray(kd, self.dtype)
        d, N = self.d, self.N
        Dnp = diff_matrix(N)
        # leading axis is 1 (uniform-mesh broadcast) or num_cells
        G = self._G_np.reshape((-1,) + (N,) * d + (self._G_np.shape[-1],))
        from ..core.geometry import SYM_PAIRS

        pairs = SYM_PAIRS[d]
        sym = {p: i for i, p in enumerate(pairs)}
        diag = np.zeros((self.num_cells,) + (N,) * d)
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
        return jnp.asarray(out)

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
        return jnp.asarray(out)

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
