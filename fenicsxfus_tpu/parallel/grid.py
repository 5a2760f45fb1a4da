"""Multi-axis SPMD domain decomposition over a 2D device mesh.

Generalizes the 1D slab decomposition (``parallel/slab.py``) to a
(d0 × d1) ``jax.sharding.Mesh``: the structured mesh is split into
contiguous blocks along axes 0 AND 1 — the arbitrary-partition analogue of
the reference's mesh partitioner (``cpp/fenicsx-sf/tests/test_operators3d/
main.cpp:31`` ``create_cell_partitioner``), needed when the domain is not
elongated along one axis.

Same replicated-interface design as the slabs: interface DOF planes are
replicated on all touching devices; per-stage communication is completing
the additive stiffness assembly. With two partition axes the corner
columns are shared by FOUR devices — completion runs as two *sequential*
ppermute exchanges (axis-0 planes first, then axis-1 planes of the
already-summed values), which routes the diagonal-neighbour contributions
through the two-hop path, so no dedicated corner exchange is needed.

Cell counts need not divide the device counts (per-axis inert padding,
as in the 1D slabs).
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

AX0, AX1 = "x", "y"


class Halo2DSEMOperators(SEMOperators):
    """Local-block operators whose assembly ``complete`` hook exchanges
    interface planes along BOTH partition axes (sequentially — the second
    exchange carries the corner sums)."""

    def configure_halo(self, d0, d1, L0, L1, rest):
        self._d0, self._d1 = d0, d1
        self._L0, self._L1, self._rest = L0, L1, rest

    def complete(self, y):
        d0, d1 = self._d0, self._d1
        L0, L1, rest = self._L0, self._L1, self._rest
        y3 = y.reshape(L0, L1, rest)
        if d0 > 1:
            fwd = [(i, i + 1) for i in range(d0 - 1)]
            bwd = [(i + 1, i) for i in range(d0 - 1)]
            from_left = jax.lax.ppermute(y3[-1], AX0, fwd)
            from_right = jax.lax.ppermute(y3[0], AX0, bwd)
            y3 = y3.at[0].add(from_left).at[-1].add(from_right)
        if d1 > 1:
            fwd = [(i, i + 1) for i in range(d1 - 1)]
            bwd = [(i + 1, i) for i in range(d1 - 1)]
            from_down = jax.lax.ppermute(y3[:, -1], AX1, fwd)
            from_up = jax.lax.ppermute(y3[:, 0], AX1, bwd)
            y3 = y3.at[:, 0].add(from_down).at[:, -1].add(from_up)
        return y3.reshape(-1)


class GridDecomposition:
    """Block partition of a uniform structured mesh over a (d0, d1) device
    grid (axes 0 and 1 of the mesh)."""

    def __init__(self, mesh, degree: int, dshape, dtype):
        if mesh.grid_shape is None:
            raise ValueError("grid decomposition needs a structured mesh")
        n = mesh.grid_shape
        dim = len(n)
        if dim < 2:
            raise ValueError("2D device meshes need a >=2D problem")
        d0, d1 = dshape
        self.d0, self.d1 = d0, d1
        self.ndev = d0 * d1
        self.dtype = dtype
        p = degree
        self.nxl = [-(-n[0] // d0), -(-n[1] // d1)]  # per-axis ceil
        self.grid = tuple(n)
        gdims = tuple(na * p + 1 for na in n)
        self.gdims = gdims
        self.L0 = self.nxl[0] * p + 1
        self.L1 = self.nxl[1] * p + 1
        self.G0, self.G1 = gdims[0], gdims[1]
        self.rest = int(np.prod(gdims[2:])) if dim > 2 else 1
        self.cells_rest = int(np.prod(n[2:])) if dim > 2 else 1
        self.cells_per_dev = self.nxl[0] * self.nxl[1] * self.cells_rest

        lo = mesh.vertices.min(axis=0)
        hi = mesh.vertices.max(axis=0)
        h0 = (hi[0] - lo[0]) / n[0]
        h1 = (hi[1] - lo[1]) / n[1]
        lo_l, hi_l = lo.copy(), hi.copy()
        hi_l[0] = lo[0] + self.nxl[0] * h0
        hi_l[1] = lo[1] + self.nxl[1] * h1
        from ..core.mesh import _structured

        local = _structured(
            (self.nxl[0], self.nxl[1]) + tuple(n[2:]), tuple(lo_l), tuple(hi_l)
        )
        self.local_mesh = local
        self.ops = Halo2DSEMOperators(local, degree, dtype)
        self.ops.configure_halo(d0, d1, self.L0, self.L1, self.rest)
        self.local_ndofs = self.ops.ndofs
        assert self.local_ndofs == self.L0 * self.L1 * self.rest

        self.jmesh = JMesh(
            np.array(jax.devices()[: self.ndev]).reshape(d0, d1), (AX0, AX1)
        )
        # stacked arrays [d0*d1, ...]: leading axis sharded over BOTH mesh
        # axes (row-major device order matches the block order below)
        self.sharding = NamedSharding(self.jmesh, P((AX0, AX1)))

    # ---- global <-> stacked --------------------------------------------
    def _pad_global(self, arr3, pad_value):
        """[G0, G1, rest] → padded [G0p, G1p, rest]."""
        p = (self.L0 - 1) // self.nxl[0]
        G0p = self.nxl[0] * self.d0 * p + 1
        G1p = self.nxl[1] * self.d1 * p + 1
        out = np.full((G0p, G1p, self.rest), pad_value, arr3.dtype)
        out[: self.G0, : self.G1] = arr3
        return out

    def to_stacked(self, vec, pad_value: float = 0.0) -> jnp.ndarray:
        arr = np.asarray(vec).reshape(self.G0, self.G1, self.rest)
        arr = self._pad_global(arr, pad_value)
        s0, s1 = self.L0 - 1, self.L1 - 1
        blocks = []
        for i in range(self.d0):
            for j in range(self.d1):
                blocks.append(
                    arr[i * s0 : i * s0 + self.L0, j * s1 : j * s1 + self.L1]
                    .reshape(-1)
                )
        return jax.device_put(
            jnp.asarray(np.stack(blocks), self.dtype), self.sharding
        )

    def from_stacked(self, stacked) -> np.ndarray:
        s = np.asarray(stacked).reshape(
            self.d0, self.d1, self.L0, self.L1, self.rest
        )
        rows = []
        for i in range(self.d0):
            cols = []
            for j in range(self.d1):
                blk = s[i, j]
                if i > 0:
                    blk = blk[1:]
                if j > 0:
                    blk = blk[:, 1:]
                cols.append(blk)
            rows.append(np.concatenate(cols, axis=1))
        full = np.concatenate(rows, axis=0)
        return full[: self.G0, : self.G1].reshape(-1)

    def _pad_cells(self, arr_cells, pad_value=0.0):
        """Global cell array [Nc] → per-device blocks
        [ndev, cells_per_dev] (axis-0/1 padding with ``pad_value``)."""
        n = self.grid
        a = np.asarray(arr_cells).reshape(n[0], n[1], self.cells_rest)
        n0p = self.nxl[0] * self.d0
        n1p = self.nxl[1] * self.d1
        full = np.full((n0p, n1p, self.cells_rest), pad_value, a.dtype)
        full[: n[0], : n[1]] = a
        blocks = []
        for i in range(self.d0):
            for j in range(self.d1):
                blocks.append(
                    full[
                        i * self.nxl[0] : (i + 1) * self.nxl[0],
                        j * self.nxl[1] : (j + 1) * self.nxl[1],
                    ].reshape(-1)
                )
        return np.stack(blocks)

    def dot_weights(self) -> jnp.ndarray:
        """[ndev, local_ndofs] weights: 1/(number of replicas) per DOF
        (1/2 on partition planes, 1/4 on corner columns), 0 on padding."""
        w = np.ones((self.d0, self.d1, self.L0, self.L1, self.rest))
        s0, s1 = self.L0 - 1, self.L1 - 1
        for i in range(self.d0):
            for j in range(self.d1):
                if i > 0:
                    w[i, j, 0] *= 0.5
                if i < self.d0 - 1:
                    w[i, j, -1] *= 0.5
                if j > 0:
                    w[i, j, :, 0] *= 0.5
                if j < self.d1 - 1:
                    w[i, j, :, -1] *= 0.5
                for r in range(self.L0):
                    if i * s0 + r >= self.G0:
                        w[i, j, r] = 0.0
                for c in range(self.L1):
                    if j * s1 + c >= self.G1:
                        w[i, j, :, c] = 0.0
        return jax.device_put(
            jnp.asarray(w.reshape(self.ndev, -1), self.dtype), self.sharding
        )

    def shard_consts(self, consts, global_ndofs, global_ncells,
                     stiff_keys=(), raw_stiff=None, nodal_stiff_keys=(),
                     raw_nodal=None, pad_one=()):
        raw_stiff = raw_stiff or {}
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
                raise NotImplementedError(
                    "nodal stiffness coefficients on 2D device meshes: use "
                    "the 1D slab decomposition"
                )
            if np.isscalar(val) or getattr(val, "ndim", 0) == 0:
                out[k] = val
            elif isinstance(val, (tuple, list, dict)):
                raise ValueError(
                    f"const {k!r}: declare in STIFF_KEYS so the 2D "
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


class ShardedExplicitSolver2D:
    """Explicit-RK solver over a (d0, d1) device mesh — the multi-axis
    counterpart of ``slab.ShardedExplicitSolver``."""

    def __init__(self, model, dshape):
        self.model = model
        self.dec = GridDecomposition(model.mesh, model.degree, dshape, model.dtype)
        self.consts = self.dec.shard_consts(
            model.consts,
            model.ops.ndofs,
            model.mesh.num_cells,
            stiff_keys=getattr(type(model), "STIFF_KEYS", ()),
            raw_stiff=getattr(model, "raw_stiff", None),
            nodal_stiff_keys=getattr(type(model), "NODAL_STIFF_KEYS", ()),
            raw_nodal=getattr(model, "raw_nodal", None),
            pad_one=getattr(type(model), "PAD_ONE_KEYS", ()),
        )
        self.rhs_pure = type(model).rhs_pure
        self._run = None

    def _build(self):
        dec = self.dec
        a, b, c = explicit_tables(self.model.rk_order)
        rhs = self.rhs_pure
        ops = dec.ops

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

        def local_run(consts, u, v, t0, dts):
            consts = _local_consts(consts)
            u, v = u[0], v[0]
            (u, v, t), _ = jax.lax.scan(
                partial(local_step, consts), (u, v, t0), dts
            )
            return u[None], v[None], t

        spec_consts = jax.tree.map(
            lambda x: P((AX0, AX1)) if getattr(x, "ndim", 0) >= 1 else P(),
            self.consts,
        )
        sharded = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(spec_consts, P((AX0, AX1)), P((AX0, AX1)), P(), P()),
            out_specs=(P((AX0, AX1)), P((AX0, AX1)), P()),
            check_vma=False,
        )
        self._run = jax.jit(sharded)

    def rk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        dec, model = self.dec, self.model
        u = dec.to_stacked(model.u_n)
        v = dec.to_stacked(model.v_n)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t = run_segmented(
            self._run, self.consts, u, v, t0, dts, model.dtype
        )
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t0 + float(np.sum(dts))
        return model.u_n, model.v_n, model.t
