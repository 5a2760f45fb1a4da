"""Multi-axis SPMD domain decomposition over a 2D/3D device mesh.

Generalizes the 1D slab decomposition (``parallel/slab.py``) to a
(d0 × d1[ × d2]) ``jax.sharding.Mesh``: the structured mesh is split into
contiguous blocks along the leading mesh axes — the arbitrary-partition
analogue of the reference's mesh partitioner
(``cpp/fenicsx-sf/tests/test_operators3d/main.cpp:31``
``create_cell_partitioner``), needed when the domain is not elongated
along one axis.

Same replicated-interface design as the slabs: interface DOF planes are
replicated on all touching devices; per-stage communication is completing
the additive stiffness assembly. Edge columns / corner points of the block
partition are shared by 4 / 8 devices — completion runs as SEQUENTIAL
per-axis ppermute exchanges (each exchange operates on the sums produced
by the previous one), which routes every diagonal-neighbour contribution
through a multi-hop axis-aligned path, so no dedicated corner exchange is
needed.

Cell counts need not divide the device counts (per-axis inert padding, as
in the 1D slabs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.common import explicit_tables, step_sizes
from ..ops.operators import SEMOperators

AXES = ("x", "y", "z")


class HaloNDSEMOperators(SEMOperators):
    """Local-block operators whose assembly ``complete`` hook exchanges
    interface planes along every partition axis (sequentially — later
    exchanges carry the edge/corner sums)."""

    def configure_halo(self, dshape, Ls, rest):
        self._dshape = tuple(dshape)
        self._Ls = tuple(Ls)
        self._rest = rest

    def complete(self, y):
        dshape, Ls, rest = self._dshape, self._Ls, self._rest
        y3 = y.reshape(Ls + (rest,))
        for ax, (dn, axis_name) in enumerate(zip(dshape, AXES)):
            if dn <= 1:
                continue
            fwd = [(i, i + 1) for i in range(dn - 1)]
            bwd = [(i + 1, i) for i in range(dn - 1)]
            lo = (slice(None),) * ax + (0,)
            hi = (slice(None),) * ax + (-1,)
            from_prev = jax.lax.ppermute(y3[hi], axis_name, fwd)
            from_next = jax.lax.ppermute(y3[lo], axis_name, bwd)
            y3 = y3.at[lo].add(from_prev).at[hi].add(from_next)
        return y3.reshape(-1)


class GridDecomposition:
    """Block partition of a uniform structured mesh over a (d0, d1[, d2])
    device grid (leading axes of the mesh)."""

    def __init__(self, mesh, degree: int, dshape, dtype):
        if mesh.grid_shape is None:
            raise ValueError("grid decomposition needs a structured mesh")
        if getattr(mesh, "uniform_hint", True) is False:
            # deformed (e.g. bowl-fitted, core/bowl.py) lattices: the grid
            # decomposition assumes uniform geometry everywhere — sharding
            # one would silently drop the deformation. Use the unstructured
            # sharded solver (parallel/unstructured.py) or single-device.
            raise ValueError(
                "grid decomposition requires a uniform lattice; this mesh "
                "is deformed (uniform_hint=False) — shard it with "
                "as_unstructured(mesh) + ShardedUnstructuredExplicitSolver, "
                "or run single-device (hybrid fast path)"
            )
        self._setup(
            mesh.grid_shape,
            mesh.vertices.min(axis=0),
            mesh.vertices.max(axis=0),
            degree,
            dshape,
            dtype,
        )

    @classmethod
    def from_grid(cls, grid, lo, hi, degree: int, dshape, dtype):
        """Mesh-free construction (streamed setup path — never builds the
        global mesh, host memory O(local))."""
        self = object.__new__(cls)
        self._setup(tuple(grid), np.asarray(lo, float), np.asarray(hi, float),
                    degree, dshape, dtype)
        return self

    def _setup(self, n, lo, hi, degree: int, dshape, dtype):
        dim = len(n)
        dshape = tuple(dshape)
        na = len(dshape)
        if na > dim:
            raise ValueError("more device-mesh axes than mesh axes")
        self.na = na
        self.dshape = dshape
        self.ndev = int(np.prod(dshape))
        self.dtype = dtype
        p = degree
        self.nxl = [-(-n[a] // dshape[a]) for a in range(na)]
        self.grid = tuple(n)
        gdims = tuple(nn * p + 1 for nn in n)
        self.gdims = gdims
        self.Ls = tuple(self.nxl[a] * p + 1 for a in range(na))
        self.Gs = tuple(gdims[a] for a in range(na))
        self.rest = int(np.prod(gdims[na:])) if dim > na else 1
        self.cells_rest = int(np.prod(n[na:])) if dim > na else 1
        self.cells_per_dev = int(np.prod(self.nxl)) * self.cells_rest

        lo = np.asarray(lo, float)
        hi = np.asarray(hi, float)
        self.lo, self.hi = lo, hi
        self.degree = degree
        self.h = [(hi[a] - lo[a]) / n[a] for a in range(na)]
        lo_l, hi_l = lo.copy(), hi.copy()
        for a in range(na):
            hi_l[a] = lo[a] + self.nxl[a] * self.h[a]
        from ..core.mesh import _structured

        local = _structured(
            tuple(self.nxl) + tuple(n[na:]), tuple(lo_l), tuple(hi_l)
        )
        self.local_mesh = local
        self.ops = HaloNDSEMOperators(local, degree, dtype)
        self.ops.configure_halo(dshape, self.Ls, self.rest)
        self.local_ndofs = self.ops.ndofs
        assert self.local_ndofs == int(np.prod(self.Ls)) * self.rest

        self.axis_names = AXES[:na]
        self.jmesh = JMesh(
            np.array(jax.devices()[: self.ndev]).reshape(dshape),
            self.axis_names,
        )
        # stacked arrays [ndev, ...]: leading axis sharded over ALL mesh
        # axes (row-major device order matches the block order below)
        self.sharding = NamedSharding(self.jmesh, P(self.axis_names))

    # ---- global <-> stacked --------------------------------------------
    def _padded_gdims(self):
        p = (self.Ls[0] - 1) // self.nxl[0]
        return tuple(
            self.nxl[a] * self.dshape[a] * p + 1 for a in range(self.na)
        )

    def _pad_global(self, arr, pad_value):
        """[G0, .., G_{na-1}, rest] → per-axis padded array."""
        Gp = self._padded_gdims()
        out = np.full(Gp + (self.rest,), pad_value, arr.dtype)
        out[tuple(slice(0, g) for g in self.Gs)] = arr
        return out

    def _block_slices(self, didx):
        return tuple(
            slice(didx[a] * (self.Ls[a] - 1),
                  didx[a] * (self.Ls[a] - 1) + self.Ls[a])
            for a in range(self.na)
        )

    def to_stacked(self, vec, pad_value: float = 0.0) -> jnp.ndarray:
        arr = np.asarray(vec).reshape(self.Gs + (self.rest,))
        arr = self._pad_global(arr, pad_value)
        blocks = [
            arr[self._block_slices(didx)].reshape(-1)
            for didx in np.ndindex(*self.dshape)
        ]
        return jax.device_put(
            jnp.asarray(np.stack(blocks), self.dtype), self.sharding
        )

    def from_stacked(self, stacked) -> np.ndarray:
        s = np.asarray(stacked).reshape(
            self.dshape + tuple(self.Ls) + (self.rest,)
        )
        Gp = self._padded_gdims()
        full = np.zeros(Gp + (self.rest,), s.dtype)
        for didx in np.ndindex(*self.dshape):
            full[self._block_slices(didx)] = s[didx]
        return full[tuple(slice(0, g) for g in self.Gs)].reshape(-1)

    def locate_sensors(self, points):
        """Snap sensor ``points`` [dim, n] to the global GLL lattice and
        map to (device, local lattice coords): ``dev`` [n] linear device
        index (row-major over ``dshape``) and ``loc`` [dim, n] with the
        sharded axes given as LOCAL coordinates on that device. Sensors on
        replicated interface planes go to the lowest-index holder."""
        from ..core.gll import gll_points_weights_01

        pts = np.asarray(points, np.float64)
        p = self.degree
        gll, _ = gll_points_weights_01(p + 1)
        dim = len(self.grid)
        coords = []
        for a in range(dim):
            h = (self.hi[a] - self.lo[a]) / self.grid[a]
            xi = (pts[a] - self.lo[a]) / h
            cell = np.clip(np.floor(xi).astype(np.int64), 0, self.grid[a] - 1)
            loc = np.clip(xi - cell, 0.0, 1.0)
            node = np.argmin(np.abs(loc[:, None] - gll[None, :]), axis=1)
            coords.append(cell * p + node)
        return self._nodes_to_dev_loc(np.stack(coords))

    def _nodes_to_dev_loc(self, coords):
        """Global lattice node coords [dim, m] → (linear device index [m],
        local coords [dim, m]); replicated interface-plane rows go to the
        upper holder along each sharded axis (replicas are identical)."""
        dev_coords, loc_coords = [], []
        for a in range(self.na):
            da = np.minimum(coords[a] // (self.Ls[a] - 1), self.dshape[a] - 1)
            dev_coords.append(da)
            loc_coords.append(coords[a] - da * (self.Ls[a] - 1))
        dev = np.ravel_multi_index(tuple(dev_coords), self.dshape)
        return dev, np.stack(loc_coords + [coords[a] for a in range(self.na, len(coords))])

    def _pad_cells(self, arr_cells, pad_value=0.0):
        """Global cell array [Nc] → per-device blocks [ndev, cells_per_dev]."""
        n = self.grid
        na = self.na
        a = np.asarray(arr_cells).reshape(tuple(n[:na]) + (self.cells_rest,))
        np_shape = tuple(self.nxl[x] * self.dshape[x] for x in range(na))
        full = np.full(np_shape + (self.cells_rest,), pad_value, a.dtype)
        full[tuple(slice(0, n[x]) for x in range(na))] = a
        blocks = []
        for didx in np.ndindex(*self.dshape):
            sl = tuple(
                slice(didx[x] * self.nxl[x], (didx[x] + 1) * self.nxl[x])
                for x in range(na)
            )
            blocks.append(full[sl].reshape(-1))
        return np.stack(blocks)

    def dot_weights(self) -> jnp.ndarray:
        """[ndev, local_ndofs] weights: 1/(number of replicas) per DOF
        (1/2 per shared plane, multiplicative at edges/corners), 0 on
        padding."""
        w_all = []
        for didx in np.ndindex(*self.dshape):
            w = np.ones(tuple(self.Ls) + (self.rest,))
            for a in range(self.na):
                lo = (slice(None),) * a + (0,)
                hi = (slice(None),) * a + (-1,)
                if didx[a] > 0:
                    w[lo] *= 0.5
                if didx[a] < self.dshape[a] - 1:
                    w[hi] *= 0.5
                # zero padding rows beyond the true extent
                for r in range(self.Ls[a]):
                    if didx[a] * (self.Ls[a] - 1) + r >= self.Gs[a]:
                        w[(slice(None),) * a + (r,)] = 0.0
            w_all.append(w.reshape(-1))
        return jax.device_put(
            jnp.asarray(np.stack(w_all), self.dtype), self.sharding
        )

    def _pack_nodal_coeff(self, nodal):
        """Per-device packed *nodal* stiffness coefficient (sponge δ(x)) —
        the multi-axis analogue of ``slab._pack_nodal_coeff``: embed the
        global DOF field in the per-axis padded box (zeros on padding rows,
        so padded cells contribute no stiffness), slice each block, pack
        with the local lattice's ``scales_nodal``.  δ is pointwise, so
        replicated interface planes simply carry equal values — no
        interface summation (unlike assembled diagonals).
        Reference: the sponge runs under any MPI partition,
        ``python/src/fenicsxfus/_experimental.py:715-824``."""
        if self.ops.lattice is None:
            raise ValueError(
                "nodal stiffness coefficients need the lattice fast path"
            )
        arr = np.asarray(nodal, np.float64).reshape(self.Gs + (self.rest,))
        arr = self._pad_global(arr, 0.0)
        packed = [
            self.ops.lattice.scales_nodal(
                arr[self._block_slices(didx)].reshape(-1)
            )
            for didx in np.ndindex(*self.dshape)
        ]
        return tuple(
            jax.device_put(
                jnp.stack([pk[a] for pk in packed]), self.sharding
            )
            for a in range(len(packed[0]))
        )

    def shard_consts(self, consts, global_ndofs, global_ncells,
                     stiff_keys=(), raw_stiff=None, nodal_stiff_keys=(),
                     raw_nodal=None, pad_one=()):
        raw_stiff = raw_stiff or {}
        raw_nodal = raw_nodal or {}
        out = {}
        for k, val in consts.items():
            if k in stiff_keys:
                coeff = np.broadcast_to(
                    np.asarray(raw_stiff[k], np.float64).reshape(-1),
                    (global_ncells,),
                )
                per_dev = self._pad_cells(coeff)
                pk = self.ops.pallas2
                if pk is not None:
                    packed = [pk.pack_field(per_dev[q]) for q in range(self.ndev)]
                    out[k] = {
                        kk: jax.device_put(
                            jnp.stack([packed[q][kk] for q in range(self.ndev)]),
                            self.sharding,
                        )
                        for kk in packed[0]
                    }
                elif self.ops.lattice is not None:
                    packed = [
                        self.ops.lattice.scales_field(per_dev[q])
                        for q in range(self.ndev)
                    ]
                    out[k] = tuple(
                        jax.device_put(
                            jnp.stack([packed[q][a] for q in range(self.ndev)]),
                            self.sharding,
                        )
                        for a in range(len(packed[0]))
                    )
                else:
                    out[k] = jax.device_put(
                        jnp.asarray(per_dev, self.dtype), self.sharding
                    )
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
                    f"const {k!r}: declare in STIFF_KEYS so the grid "
                    "decomposition can re-pack it per device"
                )
            elif val.shape == (global_ndofs,):
                out[k] = self.to_stacked(
                    val, pad_value=1.0 if k in pad_one else 0.0
                )
            elif val.shape == (global_ncells,):
                out[k] = jax.device_put(
                    jnp.asarray(self._pad_cells(np.asarray(val)), val.dtype),
                    self.sharding,
                )
            else:
                raise ValueError(f"const {k}: unexpected shape {val.shape}")
        return out


def _local_consts(consts):
    return jax.tree.map(
        lambda x: x[0] if getattr(x, "ndim", 0) > 1 else x, consts
    )


def _model_shard_kwargs(model):
    return dict(
        stiff_keys=getattr(type(model), "STIFF_KEYS", ()),
        raw_stiff=getattr(model, "raw_stiff", None),
        nodal_stiff_keys=getattr(type(model), "NODAL_STIFF_KEYS", ()),
        raw_nodal=getattr(model, "raw_nodal", None),
        pad_one=getattr(type(model), "PAD_ONE_KEYS", ()),
    )


class ShardedExplicitSolver2D:
    """Explicit-RK solver over a multi-axis device mesh — the 2D/3D
    counterpart of ``slab.ShardedExplicitSolver``."""

    def __init__(self, model, dshape):
        self.model = model
        self.dec = GridDecomposition(model.mesh, model.degree, dshape, model.dtype)
        self.consts = self.dec.shard_consts(
            model.consts, model.ops.ndofs, model.mesh.num_cells,
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
        names = self.dec.axis_names
        return jax.tree.map(
            lambda x: P(names) if getattr(x, "ndim", 0) >= 1 else P(),
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

        names = dec.axis_names
        sharded = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(names), P(names), P(), P()),
            out_specs=(P(names), P(names), P()),
            check_vma=False,
        )
        self._run = jax.jit(sharded)

    def rk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        model = self.model
        u, v = _initial_stacked(self)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t = run_segmented(
            self._run, self.consts, u, v, t0, dts, model.dtype
        )
        return _store_stacked(self, us, vs, t0 + float(np.sum(dts)))

    # -- in-scan sensor recording (sharded) --------------------------------

    def _sensor_plan(self, points):
        """Static recording plan (see ``slab.ShardedExplicitSolver``): the
        extraction box spans the full local extent of every SHARDED axis
        (identical shape on all devices — SPMD) and the sensors' lateral
        extent on the unsharded axes."""
        from .slab import collapse_onehot, lattice_interp_nodes

        dec = self.dec
        coords, wts = lattice_interp_nodes(dec, points)
        nodes, wts = collapse_onehot(coords, wts)
        dev, loc = dec._nodes_to_dev_loc(nodes)
        dim = loc.shape[0]
        na = dec.na
        gd_local = tuple(dec.Ls) + tuple(dec.gdims[na:])
        lo_box = [0] * na + [int(loc[a].min()) for a in range(na, dim)]
        hi_box = list(dec.Ls) + [int(loc[a].max()) + 1 for a in range(na, dim)]
        box = tuple(h - l for l, h in zip(lo_box, hi_box))
        n = dev.size
        m = max(int(np.max(np.bincount(dev, minlength=dec.ndev))), 1)
        loc_tab = np.zeros((dec.ndev, m), np.int32)
        slot = np.zeros(n, np.int64)
        counts = np.zeros(dec.ndev, np.int64)
        for j in range(n):
            dd = int(dev[j])
            flat = np.ravel_multi_index(
                tuple(int(loc[a][j]) - lo_box[a] for a in range(dim)), box
            )
            loc_tab[dd, counts[dd]] = flat
            slot[j] = counts[dd]
            counts[dd] += 1
        sl = tuple(slice(l, h) for l, h in zip(lo_box, hi_box))

        def extract(u_local, tab):
            return u_local.reshape(gd_local)[sl].reshape(-1)[tab]

        tab_sharded = jax.device_put(jnp.asarray(loc_tab), dec.sharding)
        return extract, tab_sharded, dev, slot, wts

    def _build_rec(self, extract):
        dec = self.dec
        local_step = self._local_step_fn()
        names = dec.axis_names

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
            in_specs=(self._consts_spec(), P(names), P(names), P(names),
                      P(), P()),
            out_specs=(P(names), P(names), P(), P(None, names)),
            check_vma=False,
        ))

    def rk_record(self, t0: float, tf: float, points):
        """``rk`` + device-side per-step sensor recording over the
        multi-axis device mesh; identical series to the single-device
        ``model.rk_record`` (reference distributed point evaluation:
        ``cpp/mwe/parallel_eval_line/main.cpp:49-107``)."""
        from ..models.common import run_segmented

        from .slab import weighted_sensor_rows

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
        u, v = _initial_stacked(self)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, ys = run_segmented(
            run, self.consts, u, v, t0, dts, model.dtype, collect_ys=True
        )
        u, v, t = _store_stacked(self, us, vs, t0 + float(np.sum(dts)))
        times = t0 + np.cumsum(dts)
        return u, v, t, times, weighted_sensor_rows(
            np.asarray(ys)[:, dev, slot], wts
        )

    def global_result(self):
        """Materialize the global (u, v) on host (streamed-setup path)."""
        return (
            self.dec.from_stacked(self._u_st),
            self.dec.from_stacked(self._v_st),
        )


def _initial_stacked(solver):
    """Stacked (u, v): from the model's global state, or — on the streamed
    setup path, where no global vector exists — sharded zeros carried
    across calls."""
    dec, model = solver.dec, solver.model
    if getattr(solver, "_streamed", False):
        if not hasattr(solver, "_u_st"):
            from .slab import _check_streamed_initial_zero

            _check_streamed_initial_zero(model)
            z = jax.device_put(
                jnp.zeros((dec.ndev, dec.local_ndofs), model.dtype),
                dec.sharding,
            )
            solver._u_st, solver._v_st = z, z
        return solver._u_st, solver._v_st
    return dec.to_stacked(model.u_n), dec.to_stacked(model.v_n)


def _store_stacked(solver, us, vs, t):
    dec, model = solver.dec, solver.model
    if getattr(solver, "_streamed", False):
        solver._u_st, solver._v_st = us, vs
        model.t = t
        return us, vs, t
    model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
    model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
    model.t = t
    return model.u_n, model.v_n, t


class ShardedImplicitSolverND:
    """SDIRK solver over a multi-axis device mesh (psum-weighted CG dots;
    see ``slab.ShardedImplicitSolver`` for the 1D variant)."""

    def __init__(self, model, dshape):
        self.model = model
        self.dec = GridDecomposition(model.mesh, model.degree, dshape, model.dtype)
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
        names = dec.axis_names

        def psum_all(x):
            for nm in names:
                x = jax.lax.psum(x, nm)
            return x

        def local_step(consts, w, carry, dtn):
            u0, v0, t = carry
            tau = dtn * A_tab[0][0]
            dinv = 1.0 / cls.lhs_diag_pure(ops, consts, tau)
            dot = lambda x, y: psum_all(jnp.sum(w * x * y))
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
        names = dec.axis_names

        def local_run(consts, w, u, v, t0, xs):
            consts = _local_consts(consts)
            u, v, w = u[0], v[0], w[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                return local_step(consts, w, (carry[0], carry[1], tn), dtn)

            (u, v, t), stats = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t, stats

        sharded = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(names), P(names), P(names),
                      P(), P()),
            out_specs=(P(names), P(names), P(), P()),
            check_vma=False,
        )
        self._run = jax.jit(sharded)

    def _build_rec(self, extract):
        dec = self.dec
        local_step = self._local_step_fn()
        names = dec.axis_names

        def local_run(consts, w, tab, u, v, t0, xs):
            consts = _local_consts(consts)
            u, v, w, tab = u[0], v[0], w[0], tab[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                out, stats = local_step(
                    consts, w, (carry[0], carry[1], tn), dtn
                )
                # [CG it_max, res_max, sensors...] — stats psum-replicated
                return out, jnp.concatenate([stats, extract(out[0], tab)])

            (u, v, t), rows = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t, rows[:, None]

        return jax.jit(jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(self._consts_spec(), P(names), P(names), P(names),
                      P(names), P(), P()),
            out_specs=(P(names), P(names), P(), P(None, names)),
            check_vma=False,
        ))

    def dirk_record(self, t0: float, tf: float, points):
        """``dirk`` + device-side per-step sensor recording over the
        multi-axis device mesh (implicit counterpart of ``rk_record``)."""
        from ..models.common import run_segmented

        from .slab import weighted_sensor_rows

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
        u, v = _initial_stacked(self)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, rows = run_segmented(
            run, self.consts, u, v, t0, dts, model.dtype, collect_ys=True
        )
        rows = np.asarray(rows)  # [steps, ndev, 2 + m]
        model.cg_stats = {
            "max_iterations": int(np.max(rows[:, 0, 0])),
            "max_residual2": float(np.max(rows[:, 0, 1])),
        }
        u, v, t = _store_stacked(self, us, vs, t0 + float(np.sum(dts)))
        times = t0 + np.cumsum(dts)
        return u, v, t, times, weighted_sensor_rows(
            rows[:, dev, 2 + slot], wts
        )

    _consts_spec = ShardedExplicitSolver2D._consts_spec
    _sensor_plan = ShardedExplicitSolver2D._sensor_plan

    def dirk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        model = self.model
        u, v = _initial_stacked(self)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, stats = run_segmented(
            lambda c, uu, vv, tt, seg: self._run(c, self.weights, uu, vv, tt, seg),
            self.consts, u, v, t0, dts, model.dtype, collect_ys=True,
        )
        st = np.asarray(stats).reshape(-1, 2)
        model.cg_stats = {
            "max_iterations": int(np.max(st[:, 0])),
            "max_residual2": float(np.max(st[:, 1])),
        }
        return _store_stacked(self, us, vs, t0 + float(np.sum(dts)))

    global_result = ShardedExplicitSolver2D.global_result


# ---------------------------------------------------------------------------
# Streamed per-block setup (no global DOF vector ever materialized)


def _finalize_block_consts(raw, inv_keys, pad_one, true_rows, Ls, dtype):
    """Additive raw local consts [L0,..,rest] → final storage values:
    reinvert INV keys (0 stays 0), set per-axis padding regions of PAD_ONE
    keys to 1."""
    out = {}
    for k, v in raw.items():
        a = v
        if k in inv_keys:
            a = np.where(a != 0.0, 1.0 / np.where(a == 0.0, 1.0, a), 0.0)
        if k in pad_one and any(tr < L for tr, L in zip(true_rows, Ls)):
            a = a.copy()
            for ax, (tr, L) in enumerate(zip(true_rows, Ls)):
                if tr < L:
                    a[(slice(None),) * ax + (slice(tr, None),)] = 1.0
        out[k] = np.asarray(a, dtype).reshape(-1)
    return out


def build_sharded_grid(model_factory, grid, lo, hi, degree, dshape, dtype,
                       implicit: bool = False):
    """Build a multi-axis sharded solver with bounded host memory: the
    model is constructed once per device block on its local mesh — the
    reference's 'every MPI rank constructs its partition' pattern
    (``cpp/fenicsx-sf/.../main.cpp:56-63`` partitioned read) — and each
    block's consts are placed on its device as soon as its interface
    exchanges complete. Peak host memory is TWO axis-0 row-slabs of raw
    consts, O(2·ndofs/d0) — never the global vectors (the multi-axis
    analogue of ``slab.build_sharded``).

    Interface completion runs on host with the same sequential-per-axis
    ordering as the device halo: within a row-slab, the fastest partition
    axis exchanges first and slower axes then carry the edge/corner sums;
    the axis-0 exchange between consecutive row-slabs (both already
    internally complete) finishes points shared by up to 2^na devices.

    ``model_factory(local_mesh) -> model``: tag boundaries with position
    predicates (interface planes must match NO predicate) and derive DG-0
    coefficients from ``local_mesh.cell_midpoints()``. Models declare
    ``SHARD_INV_KEYS`` for consts stored as reciprocals of additively
    assembled diagonals; every other [ndofs] const is interface-summed.
    """
    from ..core.mesh import _structured

    dec = GridDecomposition.from_grid(grid, lo, hi, degree, dshape, dtype)
    na, dshape = dec.na, dec.dshape
    p = degree
    n = dec.grid
    Ls, rest = dec.Ls, dec.rest
    local_shape = tuple(Ls) + (rest,)
    devices = dec.jmesh.devices.reshape(dshape)

    template = None
    cls = None
    inv_keys = pad_one = stiff_keys = nodal_keys = ()
    dof_key_template: list = []
    scalar_consts = {}
    shards: dict[str, list] = {}
    packed_shards: dict[str, dict] = {}

    def make_block(didx):
        """Construct one block's raw (additive) consts embedded in the
        padded [L0,..,rest] box."""
        tc = [
            max(min((didx[a] + 1) * dec.nxl[a], n[a]) - didx[a] * dec.nxl[a], 0)
            for a in range(na)
        ]
        true_rows = [t * p + 1 if t > 0 else 0 for t in tc]
        raw = {}
        raw_stiff = {}
        raw_nodal_blk = {}
        if min(tc) > 0:
            l0 = dec.lo.copy()
            h0 = dec.hi.copy()
            for a in range(na):
                l0[a] = dec.lo[a] + didx[a] * dec.nxl[a] * dec.h[a]
                h0[a] = l0[a] + tc[a] * dec.h[a]
            lmesh = _structured(tuple(tc) + tuple(n[na:]), tuple(l0), tuple(h0))
            model = model_factory(lmesh)
            nonlocal template, cls, inv_keys, pad_one, stiff_keys, nodal_keys
            nonlocal dof_key_template
            if template is None:
                template = model
                cls = type(model)
                inv_keys = tuple(getattr(cls, "SHARD_INV_KEYS", ()))
                pad_one = tuple(getattr(cls, "PAD_ONE_KEYS", ()))
                stiff_keys = tuple(getattr(cls, "STIFF_KEYS", ()))
                nodal_keys = tuple(getattr(cls, "NODAL_STIFF_KEYS", ()))
                if implicit:
                    pad_one = pad_one or ("m",)
            for k in nodal_keys:
                # nodal (per-DOF) stiffness coefficient: pointwise δ(x),
                # NOT additively assembled — embed in the padded box
                # (zeros on padding) and ship without interface exchange
                # (replicated planes carry equal pointwise values)
                a = np.asarray(
                    model.raw_nodal[k], np.float64
                ).reshape(tuple(true_rows) + (rest,))
                full = np.zeros(local_shape)
                full[tuple(slice(0, tr) for tr in true_rows)] = a
                raw_nodal_blk[k] = full
            for k, v in model.consts.items():
                if k in nodal_keys:
                    continue
                if k in stiff_keys:
                    coeff = np.broadcast_to(
                        np.asarray(model.raw_stiff[k], np.float64).reshape(-1),
                        (int(np.prod(tc)) * dec.cells_rest,),
                    ).reshape(tuple(tc) + (dec.cells_rest,))
                    full = np.zeros(tuple(dec.nxl) + (dec.cells_rest,))
                    full[tuple(slice(0, t) for t in tc)] = coeff
                    raw_stiff[k] = full.reshape(-1)
                    continue
                if np.isscalar(v) or getattr(v, "ndim", 0) == 0:
                    scalar_consts[k] = v
                    continue
                arr = np.asarray(v, np.float64)
                if arr.size != model.ops.ndofs:
                    raise ValueError(
                        f"const {k}: shape {arr.shape} not a dof vector; "
                        "declare STIFF_KEYS"
                    )
                a = arr.reshape(tuple(true_rows) + (rest,))
                if k in inv_keys:
                    a = np.where(a != 0.0, 1.0 / np.where(a == 0.0, 1.0, a), 0.0)
                full = np.zeros(local_shape)
                full[tuple(slice(0, tr) for tr in true_rows)] = a
                raw[k] = full
        else:
            if template is None:
                raise ValueError("first block has no cells — reduce dshape")
            for k in dof_key_template:
                raw[k] = np.zeros(local_shape)
            for k in stiff_keys:
                raw_stiff[k] = np.zeros(dec.cells_per_dev)
            for k in nodal_keys:
                raw_nodal_blk[k] = np.zeros(local_shape)
        if not dof_key_template:
            dof_key_template = list(raw.keys())
        return {"raw": raw, "stiff": raw_stiff, "nodal": raw_nodal_blk,
                "true_rows": true_rows}

    def exchange(rec_lo, rec_hi, ax):
        """Additive plane exchange between neighbours along tensor axis
        ``ax`` (both get the sum)."""
        hi = (slice(None),) * ax + (-1,)
        lo = (slice(None),) * ax + (0,)
        for k in rec_lo["raw"]:
            s = rec_lo["raw"][k][hi] + rec_hi["raw"][k][lo]
            rec_lo["raw"][k][hi] = s
            rec_hi["raw"][k][lo] = s

    def ship(didx, rec):
        final = _finalize_block_consts(
            rec["raw"], inv_keys, pad_one, rec["true_rows"], Ls, dtype
        )
        dev = devices[didx]
        for k, v in final.items():
            shards.setdefault(k, []).append(
                jax.device_put(jnp.asarray(v)[None], dev)
            )
        for k, coeff in rec["stiff"].items():
            packed = dec._pack_one_stiff(coeff)
            leaves, treedef = jax.tree.flatten(packed)
            entry = packed_shards.setdefault(
                k, {"treedef": treedef, "leaves": []}
            )
            entry["leaves"].append(
                [jax.device_put(leaf[None], dev) for leaf in leaves]
            )
        for k, field in rec["nodal"].items():
            packed = dec.ops.lattice.scales_nodal(field.reshape(-1))
            leaves, treedef = jax.tree.flatten(packed)
            entry = packed_shards.setdefault(
                k, {"treedef": treedef, "leaves": []}
            )
            entry["leaves"].append(
                [jax.device_put(leaf[None], dev) for leaf in leaves]
            )

    tail = tuple(dshape[1:])
    prev_row = None
    for i in range(dshape[0]):
        row = {}
        for jk in np.ndindex(*tail) if tail else [()]:
            row[jk] = make_block((i,) + jk)
        # within-row completion: fastest axis first, slower axes carry sums
        for a in range(na - 1, 0, -1):
            for jk in row:
                if jk[a - 1] == 0:
                    continue
                nb = jk[: a - 1] + (jk[a - 1] - 1,) + jk[a:]
                exchange(row[nb], row[jk], a)
        if prev_row is not None:
            for jk in row:
                exchange(prev_row[jk], row[jk], 0)
            for jk in prev_row:
                ship((i - 1,) + jk, prev_row[jk])
        prev_row = row
    for jk in prev_row:
        ship((dshape[0] - 1,) + jk, prev_row[jk])

    consts = dict(scalar_consts)
    for k, pieces in shards.items():
        consts[k] = jax.make_array_from_single_device_arrays(
            (dec.ndev, dec.local_ndofs), dec.sharding, pieces
        )
    for k, entry in packed_shards.items():
        glob_leaves = []
        for pos_pieces in zip(*entry["leaves"]):
            shp = (dec.ndev,) + tuple(pos_pieces[0].shape[1:])
            glob_leaves.append(
                jax.make_array_from_single_device_arrays(
                    shp, dec.sharding, list(pos_pieces)
                )
            )
        consts[k] = jax.tree.unflatten(entry["treedef"], glob_leaves)

    solver_cls = ShardedImplicitSolverND if implicit else ShardedExplicitSolver2D
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


def _import_pack_one_stiff():
    from .slab import _pack_one_stiff

    GridDecomposition._pack_one_stiff = _pack_one_stiff


_import_pack_one_stiff()
