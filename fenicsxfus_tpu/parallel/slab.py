"""SPMD slab domain decomposition over a TPU device mesh.

TPU-native replacement of the reference's MPI layer (SURVEY §2.3): the
reference partitions the mesh at read time and exchanges ghost DOFs with
DOLFINx ``scatter_fwd`` / ``scatter_rev(+)`` around every operator apply
(``cpp/fenicsx-sf/common/Linear.hpp:196-206``). Here:

* the structured mesh is split into contiguous slabs along axis 0, one per
  device on a 1D ``jax.sharding.Mesh`` axis ``"x"``;
* interface DOF planes are *replicated* on both neighbours. All mass-type
  diagonal vectors are assembled consistently once, so every pointwise
  update keeps the replicas identical — the reference's per-stage
  ``scatter_fwd`` (owner→ghost forward push) is not needed at all;
* the only per-stage communication is completing the stiffness assembly:
  after the local segment-sum each device ``ppermute``s its two interface
  planes to its neighbours and adds the received partial sums — the
  ``scatter_rev(std::plus)`` analogue, riding ICI;
* global reductions (the CG inner products of the sharded DIRK path —
  PETSc's per-Krylov-iteration MPI allreduce, ``_linear.py:644-647``)
  become ``psum`` of an interface-weighted local dot.

Cell counts need NOT divide the device count: the last slabs are padded
with inert cells (zero stiffness coefficient, zero fields, dot-weight 0)
so every device runs the identical SPMD program — the analogue of the
reference's uneven mesh partitions.

Because every device's local slab has identical topology (same local mesh),
the gather/scatter index maps, differentiation matrices and element
stiffness are *replicated closure constants* — only the DG-0 coefficients
and the diagonal vectors are sharded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh import Mesh
from ..models.common import explicit_tables, step_sizes
from ..ops.operators import SEMOperators

AXIS = "x"


def _check_sensors_outside_band(dec, pts):
    """Closed-form sensor location assumes uniform node coordinates; on a
    hybrid (bowl-deformed) decomposition they are deformed inside the
    blend band — a sensor there would be silently displaced. Reject
    loudly (production bowl sensors sit on the axis beyond the band, or
    record single-device where sensor_indices refines in-band)."""
    hyb = getattr(getattr(dec, "ops", None), "hybrid", None)
    if hyb is None:
        return
    band_x = dec.lo[0] + hyb["bx"] * dec.hx
    if np.any(pts[0] < band_x - 1e-12):
        raise ValueError(
            f"sharded hybrid recording: sensor(s) at x < {band_x:.6g} "
            "fall inside the deformed blend band, where the "
            "uniform-lattice snap is wrong; move them beyond the band "
            "or record on a single device"
        )


def lattice_interp_nodes(dec, points):
    """Closed-form interpolating sensor tables on the uniform lattice of a
    slab/grid decomposition: global GLL node coords [dim, n, K] of each
    sensor's owning cell (K = (p+1)^dim) and Lagrange weights [n, K]. A
    node-aligned sensor's weight row is exactly one-hot. Works on the
    streamed path (no global mesh object needed) — the multi-device
    analogue of ``SpectralModelBase.sensor_interp_tables``; the reference
    interpolates on any rank count (``cpp/mwe/parallel_eval_line``)."""
    from ..core.gll import lagrange_eval_gll

    pts = np.asarray(points, np.float64)
    _check_sensors_outside_band(dec, pts)
    p = dec.degree
    d = len(dec.grid)
    n = pts.shape[1]
    axes_nodes, axes_w = [], []
    for a in range(d):
        h = (dec.hi[a] - dec.lo[a]) / dec.grid[a]
        s = (pts[a] - dec.lo[a]) / h
        cell = np.clip(np.floor(s).astype(np.int64), 0, dec.grid[a] - 1)
        xi = np.clip(s - cell, 0.0, 1.0)
        axes_nodes.append(cell[:, None] * p + np.arange(p + 1)[None, :])
        axes_w.append(lagrange_eval_gll(p + 1, xi))
    sub = np.indices((p + 1,) * d).reshape(d, -1)  # [d, K], axis 0 slowest
    coords = np.stack([axes_nodes[a][:, sub[a]] for a in range(d)])
    w = axes_w[0]
    for a in range(1, d):
        w = (w[:, :, None] * axes_w[a][:, None, :]).reshape(n, -1)
    return coords, w


def collapse_onehot(coords, wts, tol=1e-9):
    """(virtual-sensor node coords, weights-or-None): sensors that all sit
    on lattice nodes collapse to their single node (the proven snap gather
    path, zero behavior change for the production drivers); anything
    off-node expands every sensor into its cell's K nodes as independent
    virtual sensors — a replicated interface node is identical on any
    holder, so per-NODE ownership suffices and no cell-ownership logic is
    needed. The weighted sum happens in host reassembly
    (``weighted_sensor_rows``)."""
    d, n, K = coords.shape
    amax = np.abs(wts).max(axis=1)
    if np.all(amax >= 1.0 - tol):
        k = np.abs(wts).argmax(axis=1)
        return coords[:, np.arange(n), k], None
    return coords.reshape(d, n * K), wts


def weighted_sensor_rows(vals, wts):
    """Host reassembly: [steps, n*K] virtual-sensor rows → [steps, n]
    interpolated sensor values (identity when ``wts`` is None)."""
    if wts is None:
        return vals
    n, K = wts.shape
    return (vals.reshape(vals.shape[0], n, K) * wts).sum(axis=-1)


class HaloSEMOperators(SEMOperators):
    """SEMOperators on the local slab whose assembly ``complete`` hook adds
    the neighbour halo exchange (must run inside shard_map). Applies to both
    the lattice fast path and the generic segment-sum path."""

    def configure_halo(self, ndev: int, plane_rows: int, row_size: int):
        self._ndev = ndev
        self._plane_rows = plane_rows  # local lattice rows along axis 0
        self._row_size = row_size  # dofs per lattice plane

    def complete(self, y):
        nd, rows, rs = self._ndev, self._plane_rows, self._row_size
        if nd == 1:
            return y
        y2 = y.reshape(rows, rs)
        fwd = [(i, i + 1) for i in range(nd - 1)]
        bwd = [(i + 1, i) for i in range(nd - 1)]
        # Partial sums on my right interface belong also to my right
        # neighbour's left plane, and vice versa. Non-participating edge
        # devices receive zeros from ppermute.
        from_left = jax.lax.ppermute(y2[-1], AXIS, fwd)
        from_right = jax.lax.ppermute(y2[0], AXIS, bwd)
        y2 = y2.at[0].add(from_left).at[-1].add(from_right)
        return y2.reshape(-1)


class SlabDecomposition:
    """Slab partition of a *uniform structured* mesh for one function space.

    Builds: the shared local operators, global↔stacked dof-vector reshapes,
    per-device coefficient slices, and the interface/padding dot weights.
    """

    def __init__(self, mesh: Mesh, degree: int, ndev: int, dtype):
        import os

        if mesh.grid_shape is None:
            raise ValueError("slab decomposition needs a structured mesh")
        hyb_src = None
        if getattr(mesh, "uniform_hint", True) is False:
            if (
                mesh.dim == 3
                and getattr(mesh, "blend_layers", 0)
                and getattr(mesh, "uniform_box", None) is not None
                and os.environ.get("FUS_HYBRID", "") != "0"
            ):
                # bowl-deformed lattice (core/bowl.py): all deformation
                # lives in the first blend_layers x-layers, so the slab
                # partition can keep the fast path — see _hybridize
                hyb_src = mesh
            else:
                raise ValueError(
                    "slab decomposition requires a uniform lattice or a "
                    "bowl-deformed one (blend_layers + uniform_box set); "
                    "this mesh is generally deformed — shard it with "
                    "as_unstructured(mesh) + "
                    "ShardedUnstructuredExplicitSolver, or run "
                    "single-device"
                )
        if hyb_src is not None:
            # the bowl cap dips BACKWARD past the box (vertices.min would
            # see the sagitta); the slab geometry is the UNIFORM box
            lo, hi = (np.asarray(a, float) for a in mesh.uniform_box)
        else:
            lo = mesh.vertices.min(axis=0)
            hi = mesh.vertices.max(axis=0)
        self._setup(mesh.grid_shape, lo, hi, degree, ndev, dtype)
        if hyb_src is not None:
            self._hybridize(hyb_src)

    @classmethod
    def from_grid(cls, grid, lo, hi, degree: int, ndev: int, dtype):
        """Mesh-free construction (streamed setup path — never builds the
        global mesh, host memory O(local))."""
        self = object.__new__(cls)
        self._setup(tuple(grid), np.asarray(lo, float), np.asarray(hi, float),
                    degree, ndev, dtype)
        return self

    def _setup(self, n, lo, hi, degree: int, ndev: int, dtype):
        d = len(n)
        self.grid = tuple(n)
        self.lo = np.asarray(lo, float)
        self.hi = np.asarray(hi, float)
        self.degree = degree
        self.ndev = ndev
        self.dtype = dtype
        p = degree
        # Uneven partitions: pad axis 0 to the next multiple of ndev with
        # inert cells (reference partitions are uneven too; SPMD needs
        # identical local shapes instead).
        nxl = -(-n[0] // ndev)  # ceil
        self.nxl = nxl
        self.pad_cells = nxl * ndev - n[0]
        gdims = tuple(na * p + 1 for na in n)
        self.gdims = gdims
        self.G0 = gdims[0]  # true lattice rows along axis 0
        self.G0_pad = nxl * ndev * p + 1
        self.Lx = nxl * p + 1  # local lattice rows (incl. both interfaces)
        self.row_size = int(np.prod(gdims[1:])) if d > 1 else 1
        self.cells_row = int(np.prod(n[1:])) if d > 1 else 1
        self.cells_per_dev = nxl * self.cells_row

        # Local mesh = first slab (uniform mesh ⇒ same geometry everywhere).
        self.hx = (self.hi[0] - self.lo[0]) / n[0]
        lo_l, hi_l = self.lo.copy(), self.hi.copy()
        hi_l[0] = self.lo[0] + nxl * self.hx
        from ..core.mesh import _structured

        local = _structured((nxl,) + tuple(n[1:]), tuple(lo_l), tuple(hi_l))
        self.local_mesh = local
        self.ops = HaloSEMOperators(local, degree, dtype)
        self.ops.configure_halo(ndev, self.Lx, self.row_size)
        self.local_ndofs = self.ops.ndofs
        assert self.local_ndofs == self.Lx * self.row_size

        self.jmesh = JMesh(
            np.array(jax.devices()[:ndev]).reshape(ndev), (AXIS,)
        )
        self.sharding = NamedSharding(self.jmesh, P(AXIS))
        self.rep_sharding = NamedSharding(self.jmesh, P())

    def _hybridize(self, mesh):
        """Rebuild the local operators hybrid-aware for a bowl-deformed
        lattice (``core/bowl.py``): all deformation is confined to the
        first ``blend_layers`` x-layers of cells, so the slab partition
        keeps the lattice/Pallas fast path on EVERY device and the
        per-cell geometry correction K_{coeff·(G_cell − G_uni)} runs as
        per-device DATA — real tables on device 0, zeros elsewhere (where
        the correction is then an exact no-op). Every device runs the
        identical SPMD program; the blend band must fit inside device 0's
        slab. Reference analogue: its partitioner distributes the gmsh
        bowl meshes like any other mesh
        (``cpp/fenicsx-sf/tests/test_operators3d/main.cpp:31``)."""
        n = self.grid
        bx = int(mesh.blend_layers)
        if bx > self.nxl:
            raise ValueError(
                f"hybrid slab sharding needs the blend band "
                f"(blend_layers={bx} x-layers) inside device 0's slab "
                f"({self.nxl} layers); use <= {max(1, n[0] // bx)} devices "
                "or shard via as_unstructured(mesh)"
            )
        gv = mesh.vertices.reshape(tuple(na + 1 for na in n) + (3,))
        local = self.local_mesh
        lmesh = Mesh(
            dim=3,
            vertices=gv[: self.nxl + 1].reshape(-1, 3),
            cells=local.cells,
            grid_shape=local.grid_shape,
            uniform_hint=False,
        )
        lmesh.blend_layers = bx
        hi_l = self.hi.copy()
        hi_l[0] = self.lo[0] + self.nxl * self.hx
        lmesh.uniform_box = (self.lo.copy(), hi_l)
        self.local_mesh = lmesh
        self.ops = HaloSEMOperators(lmesh, self.degree, self.dtype)
        if self.ops.hybrid is None:  # pragma: no cover - guarded above
            raise RuntimeError("hybrid local operators failed to build")
        self.ops.configure_halo(self.ndev, self.Lx, self.row_size)
        self.local_ndofs = self.ops.ndofs
        assert self.local_ndofs == self.Lx * self.row_size
        self._hyb_G_stacked = None  # built once on first _pack_stiff_coeff

    # ---- global <-> stacked dof vectors ----------------------------------
    def to_stacked(self, vec, pad_value: float = 0.0) -> jnp.ndarray:
        """Global dof vector [ndofs] → stacked slabs [ndev, local_ndofs]
        (interface planes duplicated, padding rows set to ``pad_value``),
        placed with the slab sharding."""
        arr = np.asarray(vec).reshape(self.G0, self.row_size)
        if self.G0_pad > self.G0:
            pad = np.full(
                (self.G0_pad - self.G0, self.row_size), pad_value, arr.dtype
            )
            arr = np.concatenate([arr, pad], axis=0)
        p = self.Lx - 1  # lattice rows per device minus shared plane
        slabs = [arr[d * p : d * p + self.Lx].reshape(-1) for d in range(self.ndev)]
        return jax.device_put(
            jnp.asarray(np.stack(slabs), self.dtype), self.sharding
        )

    def from_stacked(self, stacked) -> np.ndarray:
        """Stacked slabs → global vector (drop duplicated interface planes
        and the padding rows)."""
        s = np.asarray(stacked).reshape(self.ndev, self.Lx, self.row_size)
        rows = [s[0]] + [s[d, 1:] for d in range(1, self.ndev)]
        full = np.concatenate(rows, axis=0)
        return full[: self.G0].reshape(-1)

    def locate_sensors(self, points):
        """Snap sensor ``points`` [dim, n] to the global GLL lattice and
        map to (device, local lattice coords): ``dev`` [n] and ``loc``
        [dim, n] with axis-0 given as the LOCAL row on that device.
        Closed-form (grid + GLL nodes) — works on the streamed path where
        no global mesh object exists. Sensors on a replicated interface
        plane are assigned to the lower device (replicas are identical)."""
        from ..core.gll import gll_points_weights_01

        pts = np.asarray(points, np.float64)
        _check_sensors_outside_band(self, pts)
        p = self.degree
        gll, _ = gll_points_weights_01(p + 1)
        d = len(self.grid)
        coords = []
        for a in range(d):
            h = (self.hi[a] - self.lo[a]) / self.grid[a]
            xi = (pts[a] - self.lo[a]) / h
            cell = np.clip(np.floor(xi).astype(np.int64), 0, self.grid[a] - 1)
            loc = np.clip(xi - cell, 0.0, 1.0)
            node = np.argmin(np.abs(loc[:, None] - gll[None, :]), axis=1)
            coords.append(cell * p + node)
        return self._nodes_to_dev_loc(np.stack(coords))

    def _nodes_to_dev_loc(self, coords):
        """Global lattice node coords [dim, m] → (owning device [m], local
        coords [dim, m]); interface-plane rows go to the upper holder (the
        replicas are identical)."""
        dev = np.minimum(coords[0] // (self.Lx - 1), self.ndev - 1)
        r0 = coords[0] - dev * (self.Lx - 1)
        return dev, np.stack([r0] + [coords[a] for a in range(1, len(coords))])

    def dot_weights(self) -> jnp.ndarray:
        """Stacked per-DOF weights [ndev, local_ndofs] making
        Σ_dev Σ_i w·a·b a true global inner product: replicated interface
        planes weigh 1/2 on each holder, padding rows weigh 0."""
        p = self.Lx - 1
        w = np.ones((self.ndev, self.Lx, self.row_size))
        for d in range(self.ndev):
            if d > 0:
                w[d, 0] *= 0.5
            if d < self.ndev - 1:
                w[d, -1] *= 0.5
            # zero padding rows (global row index >= true G0)
            g0 = d * p
            for r in range(self.Lx):
                if g0 + r >= self.G0:
                    w[d, r] = 0.0
        return jax.device_put(
            jnp.asarray(w.reshape(self.ndev, -1), self.dtype), self.sharding
        )

    def _pad_cells_axis0(self, arr_cells: np.ndarray, pad_value=0.0):
        """[Nc] cell array → padded [ndev*cells_per_dev] along axis 0."""
        a = np.asarray(arr_cells).reshape(-1, self.cells_row)
        if self.pad_cells:
            pad = np.full((self.pad_cells, self.cells_row), pad_value, a.dtype)
            a = np.concatenate([a, pad], axis=0)
        return a.reshape(-1)

    def shard_consts(
        self,
        consts: dict,
        global_ndofs: int,
        global_ncells: int,
        stiff_keys=(),
        raw_stiff=None,
        nodal_stiff_keys=(),
        raw_nodal=None,
        pad_one=(),
    ):
        """Split a model's consts dict: dof-vectors → stacked slabs,
        cell-vectors → per-device slices, scalars pass through replicated.

        Entries named in ``stiff_keys`` are stiffness DG-0 coefficients and
        entries in ``nodal_stiff_keys`` are nodal (per-DOF) coefficients
        (sponge layers): both are re-packed per device from the *raw*
        coefficient (``raw_stiff`` / ``raw_nodal``) into the local fast-path
        format, because packing cannot happen on traced values inside
        shard_map. Keys in ``pad_one`` pad with 1.0 instead of 0.0 (LHS
        diagonals that are inverted inside the solver — padding must stay
        finite)."""
        raw_stiff = raw_stiff or {}
        raw_nodal = raw_nodal or {}
        out = {}
        for k, val in consts.items():
            if k in stiff_keys:
                # repack the raw DG-0 coefficient per device (the consts
                # entry may already be packed global-lattice scales)
                coeff = np.broadcast_to(
                    np.asarray(raw_stiff[k], np.float64).reshape(-1),
                    (global_ncells,),
                )
                out[k] = self._pack_stiff_coeff(coeff)
                continue
            if k in nodal_stiff_keys:
                out[k] = self._pack_nodal_coeff(
                    np.asarray(raw_nodal[k], np.float64).reshape(-1)
                )
                continue
            if np.isscalar(val) or getattr(val, "ndim", 0) == 0:
                out[k] = val
            elif isinstance(val, (tuple, list, dict)):
                raise ValueError(
                    f"const {k!r} is a packed/structured value; declare it in "
                    "the model's STIFF_KEYS (DG-0 coefficients, raw values in "
                    "model.raw_stiff) or NODAL_STIFF_KEYS (per-DOF "
                    "coefficients, raw values in model.raw_nodal) so the "
                    "sharded solver can re-pack it per device"
                )
            elif val.shape == (global_ndofs,):
                out[k] = self.to_stacked(
                    val, pad_value=1.0 if k in pad_one else 0.0
                )
            elif val.shape == (global_ncells,):
                arr = self._pad_cells_axis0(np.asarray(val)).reshape(
                    self.ndev, self.cells_per_dev
                )
                out[k] = jax.device_put(jnp.asarray(arr, val.dtype), self.sharding)
            else:
                raise ValueError(f"const {k}: unexpected shape {val.shape}")
        return out

    def _pack_stiff_coeff(self, coeff):
        """Per-device packed stiffness coefficients, stacked [ndev, ...] and
        sharded. The fold is over *local* cells only — the halo exchange
        completes the interface-plane sums at run time. Packs whichever
        format the local operators route to (pallas F dicts on TPU, XLA
        mixed-rep scale tensors otherwise). Padding cells get coefficient 0,
        so they contribute nothing."""
        per_dev = self._pad_cells_axis0(np.asarray(coeff, np.float64)).reshape(
            self.ndev, self.cells_per_dev
        )
        if self.ops.hybrid is not None:
            return self._pack_hybrid_coeff(per_dev)
        pk = self.ops.pallas2
        if pk is not None:
            packed = [pk.pack_field(per_dev[d]) for d in range(self.ndev)]
            return {
                k: jax.device_put(
                    jnp.stack([packed[d][k] for d in range(self.ndev)]),
                    self.sharding,
                )
                for k in packed[0]
            }
        if self.ops.lattice is None:
            return jax.device_put(
                jnp.asarray(per_dev, self.dtype), self.sharding
            )
        packed = [self.ops.lattice.scales_field(per_dev[d]) for d in range(self.ndev)]
        stacked = tuple(
            jax.device_put(
                jnp.stack([packed[d][a] for d in range(self.ndev)]), self.sharding
            )
            for a in range(len(packed[0]))
        )
        return stacked

    def _pack_hybrid_coeff(self, per_dev):
        """Per-device HYBRID stiffness coefficients (bowl-deformed slabs,
        see ``_hybridize``): the uniform part packs exactly like the
        lattice path from each device's slab cells; the band data is real
        on device 0 and zero elsewhere (the correction is linear in both
        the coefficient and the G tensor, so zeros make it an exact
        no-op). The stacked G-correction tensor is built once and the
        same buffer is shared across every coefficient key."""
        hy = self.ops.hybrid
        nb = int(hy["nb"])
        pk = self.ops.pallas2
        if pk is not None:
            packed = [pk.pack_field(per_dev[d]) for d in range(self.ndev)]
            hyb_u = {
                k: jax.device_put(
                    jnp.stack([packed[d][k] for d in range(self.ndev)]),
                    self.sharding,
                )
                for k in packed[0]
            }
        else:
            packed = [
                tuple(self.ops.lattice.scales_field(per_dev[d]))
                for d in range(self.ndev)
            ]
            hyb_u = tuple(
                jax.device_put(
                    jnp.stack([packed[d][a] for d in range(self.ndev)]),
                    self.sharding,
                )
                for a in range(len(packed[0]))
            )
        b = np.zeros((self.ndev, nb), np.float64)
        b[0] = per_dev[0][:nb]
        if getattr(self, "_hyb_G_stacked", None) is None:
            Gc = np.asarray(hy["G_corr_np"], np.float64)
            N = self.ops.N
            G0 = Gc.reshape((nb,) + (N,) * 3 + (Gc.shape[-1],))
            Gs = np.zeros((self.ndev,) + G0.shape, np.float64)
            Gs[0] = G0
            self._hyb_G_stacked = jax.device_put(
                jnp.asarray(Gs, self.dtype), self.sharding
            )
        return {
            "hyb_u": hyb_u,
            "hyb_b": jax.device_put(jnp.asarray(b, self.dtype), self.sharding),
            "hyb_G": self._hyb_G_stacked,
        }

    def _pack_nodal_coeff(self, nodal):
        """Per-device packed *nodal* stiffness coefficient (sponge δ(x)):
        slice the global lattice rows per slab (zero on padding rows) and
        pack with the local lattice's ``scales_nodal``."""
        if self.ops.lattice is None:
            raise ValueError(
                "nodal stiffness coefficients need the lattice fast path"
            )
        arr = np.asarray(nodal, np.float64).reshape(self.G0, self.row_size)
        if self.G0_pad > self.G0:
            pad = np.zeros((self.G0_pad - self.G0, self.row_size))
            arr = np.concatenate([arr, pad], axis=0)
        p = self.Lx - 1
        packed = []
        for d in range(self.ndev):
            local = arr[d * p : d * p + self.Lx]
            packed.append(self.ops.lattice.scales_nodal(local.reshape(-1)))
        return tuple(
            jax.device_put(
                jnp.stack([packed[d][a] for d in range(self.ndev)]), self.sharding
            )
            for a in range(len(packed[0]))
        )


def _model_shard_kwargs(model):
    return dict(
        stiff_keys=getattr(type(model), "STIFF_KEYS", ()),
        raw_stiff=getattr(model, "raw_stiff", None),
        nodal_stiff_keys=getattr(type(model), "NODAL_STIFF_KEYS", ()),
        raw_nodal=getattr(model, "raw_nodal", None),
        pad_one=getattr(type(model), "PAD_ONE_KEYS", ()),
    )


def _check_streamed_initial_zero(model):
    """The streamed-setup path never materializes global field vectors, so
    the solver starts from zero fields (matching every reference driver).
    A nonzero ``model.u_n``/``v_n`` (the template model's LOCAL state)
    cannot be honored — raise instead of silently dropping it."""
    for name in ("u_n", "v_n"):
        arr = getattr(model, name, None)
        if arr is not None and bool(np.any(np.asarray(arr))):
            raise ValueError(
                f"streamed-setup solver starts from zero fields, but the "
                f"template model has nonzero {name}; set the state via the "
                "solver's stacked arrays (solver._u_st/_v_st, shaped "
                "[ndev, local_ndofs]) or use the non-streamed solver"
            )


def _local_consts(consts):
    """Inside shard_map the leading device axis has local size 1 — strip it
    from every sharded array (scalars pass through)."""
    return jax.tree.map(
        lambda x: x[0] if getattr(x, "ndim", 0) > 1 else x, consts
    )


class ShardedExplicitSolver:
    """Run any explicit model's pure physics over a device mesh.

    Usage::

        model = LinearSpectralExplicit(mesh, ...)   # global setup
        sharded = ShardedExplicitSolver(model, ndev=8)
        u, v, t = sharded.rk(t0, tf)                # == model.rk(t0, tf)
    """

    def __init__(self, model, ndev: int | None = None):
        ndev = ndev or len(jax.devices())
        self.model = model
        self.dec = SlabDecomposition(
            model.mesh, model.degree, ndev, model.dtype
        )
        self.consts = self.dec.shard_consts(
            model.consts,
            model.ops.ndofs,
            model.mesh.num_cells,
            **_model_shard_kwargs(model),
        )
        self.rhs_pure = type(model).rhs_pure
        self._run = None

    def _local_step_fn(self):
        a, b, c = explicit_tables(self.model.rk_order)
        rhs = self.rhs_pure
        ops = self.dec.ops

        def local_step(consts, carry, dtn):
            u0, v0, t = carry
            ku = jnp.zeros_like(u0)
            kv = jnp.zeros_like(v0)
            u_acc, v_acc = u0, v0
            for i in range(len(b)):
                un = u0 + (a[i] * dtn) * ku
                vn = v0 + (a[i] * dtn) * kv
                tn = t + c[i] * dtn
                ku, kv = rhs(ops, consts, tn, un, vn)
                u_acc = u_acc + (b[i] * dtn) * ku
                v_acc = v_acc + (b[i] * dtn) * kv
            return (u_acc, v_acc, t + dtn), None

        return local_step

    def _consts_spec(self):
        return jax.tree.map(
            lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(),
            self.consts,
        )

    def _build(self):
        dec = self.dec
        local_step = self._local_step_fn()

        def local_run(consts, u, v, t0, xs):
            consts = _local_consts(consts)
            u, v = u[0], v[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                return local_step(consts, (carry[0], carry[1], tn), dtn)

            (u, v, t), _ = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t

        shmapped = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(AXIS), P(AXIS), P()),
            # pallas_call outputs carry no varying-mesh-axes annotation;
            # strict vma checking would reject the fused kernels on TPU
            check_vma=False,
        )
        self._run = jax.jit(shmapped)

    def _initial_stacked(self):
        """Stacked (u, v): from the model's global state, or — on the
        streamed-setup path, where no global vector exists — sharded zeros
        carried across calls."""
        dec, model = self.dec, self.model
        if getattr(self, "_streamed", False):
            if not hasattr(self, "_u_st"):
                _check_streamed_initial_zero(model)
                z = jax.device_put(
                    jnp.zeros((dec.ndev, dec.local_ndofs), model.dtype),
                    dec.sharding,
                )
                self._u_st, self._v_st = z, z
            return self._u_st, self._v_st
        return dec.to_stacked(model.u_n), dec.to_stacked(model.v_n)

    def _store_stacked(self, us, vs, t):
        dec, model = self.dec, self.model
        if getattr(self, "_streamed", False):
            self._u_st, self._v_st = us, vs
            model.t = t
            return us, vs, t
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t
        return model.u_n, model.v_n, t

    def global_result(self):
        """Materialize the global (u, v) on host — for analysis at sizes
        where that is affordable (streamed-setup path)."""
        return (
            self.dec.from_stacked(self._u_st),
            self.dec.from_stacked(self._v_st),
        )

    def rk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        model = self.model
        u, v = self._initial_stacked()
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t = run_segmented(
            self._run, self.consts, u, v, t0, dts, model.dtype
        )
        t = t0 + float(np.sum(dts))
        return self._store_stacked(us, vs, t)

    # -- in-scan sensor recording (sharded) --------------------------------

    def _sensor_plan(self, points):
        """Static recording plan: per-device padded local gather tables +
        the (device, slot, wts) host reassembly map. Node-aligned sensors
        keep the proven snap gather; off-node sensors interpolate via
        virtual-node expansion (``collapse_onehot``) instead of the silent
        snap-to-node phase error the round-2 recording had. The in-scan
        extraction slices a shared bounding box (full local rows x the
        lateral extent of the sensor set) before the tiny gather — a raw
        scalar gather from the full field lowers near-serially on TPU
        (measured 37x the step cost,
        ``models/base.py::_sensor_extractor``)."""
        dec = self.dec
        coords, wts = lattice_interp_nodes(dec, points)
        nodes, wts = collapse_onehot(coords, wts)
        dev, loc = dec._nodes_to_dev_loc(nodes)
        d = loc.shape[0]
        lo_box = [0] + [int(loc[a].min()) for a in range(1, d)]
        hi_box = [dec.Lx] + [int(loc[a].max()) + 1 for a in range(1, d)]
        box = tuple(h - l for l, h in zip(lo_box, hi_box))
        n = dev.size
        m = max(int(np.max(np.bincount(dev, minlength=dec.ndev))), 1)
        loc_tab = np.zeros((dec.ndev, m), np.int32)
        slot = np.zeros(n, np.int64)
        counts = np.zeros(dec.ndev, np.int64)
        for j in range(n):
            dd = int(dev[j])
            flat = np.ravel_multi_index(
                tuple(int(loc[a][j]) - lo_box[a] for a in range(d)), box
            )
            loc_tab[dd, counts[dd]] = flat
            slot[j] = counts[dd]
            counts[dd] += 1
        gd_local = (dec.Lx,) + tuple(dec.gdims[1:])
        sl = tuple(slice(l, h) for l, h in zip(lo_box, hi_box))

        def extract(u_local, tab):
            return u_local.reshape(gd_local)[sl].reshape(-1)[tab]

        tab_sharded = jax.device_put(jnp.asarray(loc_tab), dec.sharding)
        return extract, tab_sharded, dev, slot, wts

    def _build_rec(self, extract):
        dec = self.dec
        local_step = self._local_step_fn()

        def local_run(consts, tab, u, v, t0, xs):
            consts = _local_consts(consts)
            u, v, tab = u[0], v[0], tab[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                out, _ = local_step(consts, (carry[0], carry[1], tn), dtn)
                return out, extract(out[0], tab)

            (u, v, t), ys = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t, ys[:, None]

        return jax.jit(jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(AXIS), P(AXIS), P(AXIS),
                      P(), P()),
            out_specs=(P(AXIS), P(AXIS), P(), P(None, AXIS)),
            check_vma=False,
        ))

    def rk_record(self, t0: float, tf: float, points):
        """Time-march like ``rk`` while recording u(t) at sensor ``points``
        every step, device-side inside the sharded scan — the multi-chip
        analogue of the reference's distributed point evaluation
        (``cpp/mwe/parallel_eval_line/main.cpp:49-107``). Returns
        (u, v, t, times [n_steps], ys [n_steps, n_sensors]); identical
        series to the single-device ``model.rk_record``."""
        from ..models.common import run_segmented

        extract, tab, dev, slot, wts = self._sensor_plan(points)
        key = (bytes(np.asarray(tab).tobytes()), dev.tobytes())
        cache = getattr(self, "_rec_runs", None)
        if cache is None:
            cache = self._rec_runs = {}
        run = cache.get(key)
        if run is None:
            rec = self._build_rec(extract)
            run = lambda consts, u, v, t, seg: rec(consts, tab, u, v, t, seg)  # noqa: E731
            cache[key] = run
        model = self.model
        u, v = self._initial_stacked()
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, ys = run_segmented(
            run, self.consts, u, v, t0, dts, model.dtype, collect_ys=True
        )
        t = t0 + float(np.sum(dts))
        u, v, t = self._store_stacked(us, vs, t)
        times = t0 + np.cumsum(dts)
        return u, v, t, times, weighted_sensor_rows(
            np.asarray(ys)[:, dev, slot], wts
        )


class ShardedImplicitSolver:
    """Run an implicit (SDIRK) model's physics over a device mesh.

    The per-Krylov-iteration global reductions of the reference's PETSc CG
    (MPI allreduce per dot product, ``_linear.py:644-647``) become ``psum``
    of interface-weighted local dots; the stiffness action inside the CG
    operator completes with the same ppermute halo exchange as the explicit
    path. Produces iterates identical to the single-device CG in exact
    arithmetic.

    Usage::

        model = LinearSpectralImplicit(mesh, ...)   # global setup
        sharded = ShardedImplicitSolver(model, ndev=8)
        u, v, t = sharded.dirk(t0, tf)              # == model.dirk(t0, tf)
    """

    def __init__(self, model, ndev: int | None = None):
        ndev = ndev or len(jax.devices())
        self.model = model
        self.dec = SlabDecomposition(
            model.mesh, model.degree, ndev, model.dtype
        )
        kw = _model_shard_kwargs(model)
        kw["pad_one"] = tuple(kw["pad_one"]) or ("m",)
        self.consts = self.dec.shard_consts(
            model.consts, model.ops.ndofs, model.mesh.num_cells, **kw
        )
        self.weights = self.dec.dot_weights()
        self._run = None

    def _local_step_fn(self):
        from ..ops.cg import cg_solve

        dec, model = self.dec, self.model
        ops = dec.ops
        cls = type(model)
        A_tab, b_tab, c_tab = model.A_tab, model.b_tab, model.c_tab
        n = len(b_tab)
        rtol, maxiter = model.cg_rtol, model.cg_maxiter

        def local_step(consts, w, carry, dtn):
            u0, v0, t = carry
            tau = dtn * A_tab[0][0]
            dinv = 1.0 / cls.lhs_diag_pure(ops, consts, tau)
            dot = lambda x, y: jax.lax.psum(jnp.sum(w * x * y), AXIS)
            kus, kvs = [], []
            u_acc, v_acc = u0, v0
            it_max = jnp.zeros((), jnp.int32)
            res_max = jnp.zeros((), v0.dtype)
            for i in range(n):
                un, vn = u0, v0
                for j in range(i):
                    un = un + (A_tab[i][j] * dtn) * kus[j]
                    vn = vn + (A_tab[i][j] * dtn) * kvs[j]
                tn = t + c_tab[i] * dtn
                b = cls.rhs_stage(ops, consts, tau, tn, un, vn)
                x0 = kvs[-1] if kvs else jnp.zeros_like(v0)
                kv, (it, res2) = cg_solve(
                    lambda x: cls.lhs_pure(ops, consts, tau, x), b, x0, dinv,
                    rtol=rtol, maxiter=maxiter, dot=dot,
                )
                it_max = jnp.maximum(it_max, it)
                res_max = jnp.maximum(res_max, res2.astype(v0.dtype))
                ku = vn + tau * kv
                kus.append(ku)
                kvs.append(kv)
                u_acc = u_acc + (b_tab[i] * dtn) * ku
                v_acc = v_acc + (b_tab[i] * dtn) * kv
            stats = jnp.stack([it_max.astype(v0.dtype), res_max])
            return (u_acc, v_acc, t + dtn), stats

        return local_step

    def _build(self):
        dec = self.dec
        local_step = self._local_step_fn()

        def local_run(consts, w, u, v, t0, xs):
            consts = _local_consts(consts)
            u, v, w = u[0], v[0], w[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                return local_step(consts, w, (carry[0], carry[1], tn), dtn)

            (u, v, t), stats = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t, stats

        shmapped = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(AXIS), P(AXIS), P(AXIS),
                      P(), P()),
            out_specs=(P(AXIS), P(AXIS), P(), P()),
            check_vma=False,
        )
        self._run = jax.jit(shmapped)

    def _build_rec(self, extract):
        dec = self.dec
        local_step = self._local_step_fn()

        def local_run(consts, w, tab, u, v, t0, xs):
            consts = _local_consts(consts)
            u, v, w, tab = u[0], v[0], w[0], tab[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                out, stats = local_step(
                    consts, w, (carry[0], carry[1], tn), dtn
                )
                # one row per step: [CG it_max, res_max, sensor values...]
                # (stats are psum-replicated — identical on every device)
                return out, jnp.concatenate([stats, extract(out[0], tab)])

            (u, v, t), rows = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t, rows[:, None]

        return jax.jit(jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS), P(), P()),
            out_specs=(P(AXIS), P(AXIS), P(), P(None, AXIS)),
            check_vma=False,
        ))

    def dirk_record(self, t0: float, tf: float, points):
        """``dirk`` + device-side per-step sensor recording — the implicit
        counterpart of ``rk_record`` (same plan/extraction); CG stats ride
        the same per-step row. Identical series to the single-device
        ``model.dirk_record``."""
        from ..models.common import run_segmented

        extract, tab, dev, slot, wts = self._sensor_plan(points)
        key = (bytes(np.asarray(tab).tobytes()), dev.tobytes())
        cache = getattr(self, "_rec_runs", None)
        if cache is None:
            cache = self._rec_runs = {}
        run = cache.get(key)
        if run is None:
            rec = self._build_rec(extract)
            run = lambda consts, u, v, t, seg: rec(  # noqa: E731
                consts, self.weights, tab, u, v, t, seg
            )
            cache[key] = run
        model = self.model
        u, v = self._initial_stacked()
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, rows = run_segmented(
            run, self.consts, u, v, t0, dts, model.dtype, collect_ys=True
        )
        rows = np.asarray(rows)  # [steps, ndev, 2 + m]
        model.cg_stats = {
            "max_iterations": int(np.max(rows[:, 0, 0])),
            "max_residual2": float(np.max(rows[:, 0, 1])),
        }
        u, v, t = self._store_stacked(us, vs, t0 + float(np.sum(dts)))
        times = t0 + np.cumsum(dts)
        return u, v, t, times, weighted_sensor_rows(
            rows[:, dev, 2 + slot], wts
        )

    _initial_stacked = ShardedExplicitSolver._initial_stacked
    _store_stacked = ShardedExplicitSolver._store_stacked
    _consts_spec = ShardedExplicitSolver._consts_spec
    _sensor_plan = ShardedExplicitSolver._sensor_plan
    global_result = ShardedExplicitSolver.global_result

    def dirk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        dec, model = self.dec, self.model
        u, v = self._initial_stacked()
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, stats = run_segmented(
            lambda c, uu, vv, tt, seg: self._run(c, self.weights, uu, vv, tt, seg),
            self.consts, u, v, t0, dts, model.dtype, collect_ys=True,
        )
        # stats are replicated across devices; scan output keeps [steps, 2]
        st = np.asarray(stats).reshape(-1, 2)
        model.cg_stats = {
            "max_iterations": int(np.max(st[:, 0])),
            "max_residual2": float(np.max(st[:, 1])),
        }
        return self._store_stacked(us, vs, t0 + float(np.sum(dts)))


# ---------------------------------------------------------------------------
# Streamed per-device setup (no global DOF vector ever materialized)


def _finalize_local_consts(raw, inv_keys, pad_one, true_rows, Lx, row_size,
                           dtype):
    """Additive raw local consts [Lx, rs] → final storage values: reinvert
    INV keys (0 stays 0), set padding rows of PAD_ONE keys to 1."""
    out = {}
    for k, v in raw.items():
        a = v
        if k in inv_keys:
            a = np.where(a != 0.0, 1.0 / np.where(a == 0.0, 1.0, a), 0.0)
        if k in pad_one and true_rows < Lx:
            a = a.copy()
            a[true_rows:] = 1.0
        out[k] = np.asarray(a, dtype).reshape(-1)
    return out


def build_sharded(model_factory, grid, lo, hi, degree, ndev, dtype,
                  implicit: bool = False, solver_kwargs=None):
    """Build a sharded solver with host peak memory O(ndofs/ndev): the
    model is constructed once per slab on its local mesh — the reference's
    'every MPI rank constructs its partition' pattern
    (``cpp/fenicsx-sf/.../main.cpp:56-63`` partitioned read) — and each
    shard is placed on its device as it is produced. No global mesh, no
    global DOF vector.

    ``model_factory(local_mesh) -> model``: construct the model on the
    given (coordinate-positioned) slab mesh — tag boundaries with position
    predicates (interface x-planes must match NO predicate) and derive
    DG-0 coefficients from ``local_mesh.cell_midpoints()``. Uneven
    partitions: trailing slabs get a shorter (or no) mesh; their consts are
    padded with inert values automatically.

    Models declare ``SHARD_INV_KEYS`` for consts stored as reciprocals of
    additively-assembled diagonals (e.g. ``inv_m``); every other [ndofs]
    const is treated as additively assembled and interface-plane summed
    (the ``scatter_rev(+)`` of setup data).

    Returns a ``ShardedExplicitSolver`` / ``ShardedImplicitSolver`` whose
    state starts as sharded zeros; use ``.rk_stacked`` / ``.dirk`` wrappers
    or the plain ``rk``/``dirk`` (which materialize the global result —
    fine below pod scale)."""
    from ..core.mesh import _structured

    solver_kwargs = solver_kwargs or {}
    dec = SlabDecomposition.from_grid(grid, lo, hi, degree, ndev, dtype)
    n0 = grid[0]
    nxl, Lx, rs = dec.nxl, dec.Lx, dec.row_size
    p = degree
    devices = list(dec.jmesh.devices.reshape(-1))

    template = None
    cls = None
    inv_keys = pad_one = stiff_keys = nodal_keys = ()
    scalar_consts = {}
    shards: dict[str, list] = {}
    packed_shards: dict[str, list] = {}

    prev = None  # (dev_index, raw dict [Lx, rs], true_rows, raw_stiff, raw_nodal)

    def ship(dev_idx, raw, true_rows, raw_stiff, raw_nodal):
        final = _finalize_local_consts(
            raw, inv_keys, pad_one, true_rows, Lx, rs, dtype
        )
        for k, v in final.items():
            shards.setdefault(k, []).append(
                jax.device_put(jnp.asarray(v)[None], devices[dev_idx])
            )
        for k, coeff in raw_stiff.items():
            packed = dec._pack_one_stiff(coeff)
            leaves, treedef = jax.tree.flatten(packed)
            entry = packed_shards.setdefault(k, {"treedef": treedef, "leaves": []})
            placed = [
                jax.device_put(leaf[None], devices[dev_idx]) for leaf in leaves
            ]
            entry["leaves"].append(placed)
        for k, nodal in raw_nodal.items():
            packed = dec.ops.lattice.scales_nodal(nodal.reshape(-1))
            leaves, treedef = jax.tree.flatten(tuple(packed))
            entry = packed_shards.setdefault(k, {"treedef": treedef, "leaves": []})
            placed = [
                jax.device_put(leaf[None], devices[dev_idx]) for leaf in leaves
            ]
            entry["leaves"].append(placed)

    for d_idx in range(ndev):
        c_lo = d_idx * nxl
        c_hi = min((d_idx + 1) * nxl, n0)
        tc = max(c_hi - c_lo, 0)
        raw = {}
        raw_stiff = {}
        raw_nodal = {}
        true_rows = tc * p + 1 if tc > 0 else 0
        if tc > 0:
            l0 = dec.lo.copy()
            h0 = dec.hi.copy()
            l0[0] = dec.lo[0] + c_lo * dec.hx
            h0[0] = dec.lo[0] + c_hi * dec.hx
            lmesh = _structured((tc,) + tuple(grid[1:]), tuple(l0), tuple(h0))
            model = model_factory(lmesh)
            if template is None:
                template = model
                cls = type(model)
                inv_keys = tuple(getattr(cls, "SHARD_INV_KEYS", ()))
                pad_one = tuple(getattr(cls, "PAD_ONE_KEYS", ()))
                stiff_keys = tuple(getattr(cls, "STIFF_KEYS", ()))
                nodal_keys = tuple(getattr(cls, "NODAL_STIFF_KEYS", ()))
                if implicit:
                    pad_one = pad_one or ("m",)
            ndl = model.ops.ndofs
            for k, v in model.consts.items():
                if k in stiff_keys:
                    coeff = np.broadcast_to(
                        np.asarray(model.raw_stiff[k], np.float64).reshape(-1),
                        (tc * dec.cells_row,),
                    )
                    full = np.zeros(dec.cells_per_dev)
                    full[: coeff.size] = coeff
                    raw_stiff[k] = full
                    continue
                if k in nodal_keys:
                    nod = np.asarray(
                        model.raw_nodal[k], np.float64
                    ).reshape(true_rows, rs)
                    full = np.zeros((Lx, rs))
                    full[:true_rows] = nod
                    raw_nodal[k] = full
                    continue
                if np.isscalar(v) or getattr(v, "ndim", 0) == 0:
                    scalar_consts[k] = v
                    continue
                arr = np.asarray(v, np.float64)
                if arr.size != ndl:
                    raise ValueError(
                        f"const {k}: shape {arr.shape} not a dof vector; "
                        "declare STIFF_KEYS/NODAL_STIFF_KEYS"
                    )
                a = arr.reshape(true_rows, rs)
                if k in inv_keys:
                    a = np.where(a != 0.0, 1.0 / np.where(a == 0.0, 1.0, a), 0.0)
                full = np.zeros((Lx, rs))
                full[:true_rows] = a
                raw[k] = full
        else:
            if template is None:
                raise ValueError("first slab has no cells — reduce ndev")
            for k in dof_key_template:
                raw[k] = np.zeros((Lx, rs))
            for k in stiff_keys:
                raw_stiff[k] = np.zeros(dec.cells_per_dev)
            for k in nodal_keys:
                raw_nodal[k] = np.zeros((Lx, rs))
        if d_idx == 0:
            dof_key_template = list(raw.keys())

        # patch the shared interface plane with the previous slab (additive)
        if prev is not None:
            praw = prev[1]
            for k in raw:
                s = praw[k][-1] + raw[k][0]
                praw[k][-1] = s
                raw[k][0] = s
            ship(*prev)
        prev = (d_idx, raw, true_rows, raw_stiff, raw_nodal)
    ship(*prev)

    # assemble the sharded consts
    consts = dict(scalar_consts)
    for k, pieces in shards.items():
        consts[k] = jax.make_array_from_single_device_arrays(
            (ndev, Lx * rs), dec.sharding, pieces
        )
    for k, entry in packed_shards.items():
        leaves_by_pos = list(zip(*entry["leaves"]))
        glob_leaves = []
        for pos_pieces in leaves_by_pos:
            shp = (ndev,) + tuple(pos_pieces[0].shape[1:])
            glob_leaves.append(
                jax.make_array_from_single_device_arrays(
                    shp, NamedSharding(dec.jmesh, P(AXIS)), list(pos_pieces)
                )
            )
        consts[k] = jax.tree.unflatten(entry["treedef"], glob_leaves)

    solver_cls = ShardedImplicitSolver if implicit else ShardedExplicitSolver
    solver = object.__new__(solver_cls)
    solver.model = template
    solver.dec = dec
    solver.consts = consts
    if implicit:
        solver.weights = dec.dot_weights()
    else:
        solver.rhs_pure = cls.rhs_pure
    solver._run = None
    solver._streamed = True
    return solver


def _pack_one_stiff(self, coeff):
    """Pack ONE device's [cells_per_dev] DG-0 stiffness coefficient into the
    local fast-path format (pallas F dict on TPU, XLA scale tuple else)."""
    pk = self.ops.pallas2
    arr = np.asarray(coeff, np.float64).reshape(-1)
    if pk is not None:
        return {k: jnp.asarray(v) for k, v in pk.pack_field(arr).items()}
    if self.ops.lattice is None:
        return jnp.asarray(arr, self.dtype)
    return tuple(self.ops.lattice.scales_field(arr))


SlabDecomposition._pack_one_stiff = _pack_one_stiff
