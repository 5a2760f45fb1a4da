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
  ``scatter_rev(std::plus)`` analogue, riding ICI.

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
    and per-device coefficient slices.
    """

    def __init__(self, mesh: Mesh, degree: int, ndev: int, dtype):
        if mesh.grid_shape is None:
            raise ValueError("slab decomposition needs a structured mesh")
        n = mesh.grid_shape
        d = len(n)
        if n[0] % ndev != 0:
            raise ValueError(f"cells along axis 0 ({n[0]}) not divisible by {ndev}")
        self.ndev = ndev
        self.dtype = dtype
        p = degree
        nxl = n[0] // ndev
        self.nxl = nxl
        gdims = tuple(na * p + 1 for na in n)
        self.gdims = gdims
        self.Lx = nxl * p + 1  # local lattice rows (incl. both interfaces)
        self.row_size = int(np.prod(gdims[1:])) if d > 1 else 1
        self.cells_per_dev = mesh.num_cells // ndev

        # Local mesh = first slab (uniform mesh ⇒ same geometry everywhere).
        hx = (mesh.vertices[:, 0].max() - mesh.vertices[:, 0].min()) / n[0]
        lo = mesh.vertices.min(axis=0)
        hi = mesh.vertices.max(axis=0)
        lo_l, hi_l = lo.copy(), hi.copy()
        hi_l[0] = lo[0] + nxl * hx
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

    # ---- global <-> stacked dof vectors ----------------------------------
    def to_stacked(self, vec) -> jnp.ndarray:
        """Global dof vector [ndofs] → stacked slabs [ndev, local_ndofs]
        (interface planes duplicated), placed with the slab sharding."""
        arr = np.asarray(vec).reshape(self.gdims[0], self.row_size)
        p = self.Lx - 1  # lattice rows per device minus shared plane
        slabs = [arr[d * p : d * p + self.Lx].reshape(-1) for d in range(self.ndev)]
        return jax.device_put(
            jnp.asarray(np.stack(slabs), self.dtype), self.sharding
        )

    def from_stacked(self, stacked) -> np.ndarray:
        """Stacked slabs → global vector (drop duplicated interface planes)."""
        s = np.asarray(stacked).reshape(self.ndev, self.Lx, self.row_size)
        rows = [s[0]] + [s[d, 1:] for d in range(1, self.ndev)]
        return np.concatenate(rows, axis=0).reshape(-1)

    def shard_consts(
        self,
        consts: dict,
        global_ndofs: int,
        global_ncells: int,
        stiff_keys=(),
        raw_stiff=None,
    ):
        """Split a model's consts dict: dof-vectors → stacked slabs,
        cell-vectors → per-device slices, scalars pass through replicated.

        Entries named in ``stiff_keys`` are stiffness DG-0 coefficients: on
        the lattice fast path they are pre-packed into per-device mixed-rep
        scale tensors (host-side), because packing cannot happen on traced
        values inside shard_map."""
        raw_stiff = raw_stiff or {}
        out = {}
        for k, val in consts.items():
            if k in stiff_keys:
                # repack the raw DG-0 coefficient per device (the consts
                # entry may already be packed global-lattice scales)
                coeff = np.broadcast_to(
                    np.asarray(raw_stiff[k], np.float64).reshape(-1),
                    (global_ncells,),
                )
                if self.ops.lattice is not None:
                    out[k] = self._pack_stiff_coeff(coeff, global_ncells)
                else:
                    arr = coeff.reshape(self.ndev, self.cells_per_dev)
                    out[k] = jax.device_put(
                        jnp.asarray(arr, self.dtype), self.sharding
                    )
                continue
            if np.isscalar(val) or getattr(val, "ndim", 0) == 0:
                out[k] = val
            elif val.shape == (global_ndofs,):
                out[k] = self.to_stacked(val)
            elif val.shape == (global_ncells,):
                arr = np.asarray(val).reshape(self.ndev, self.cells_per_dev)
                out[k] = jax.device_put(jnp.asarray(arr, val.dtype), self.sharding)
            else:
                raise ValueError(f"const {k}: unexpected shape {val.shape}")
        return out

    def _pack_stiff_coeff(self, coeff, global_ncells: int):
        """Per-device packed stiffness coefficients, stacked [ndev, ...] and
        sharded. The fold is over *local* cells only — the halo exchange
        completes the interface-plane sums at run time. Packs whichever
        format the local operators route to (pallas F dicts on TPU, XLA
        mixed-rep scale tensors otherwise)."""
        arr = np.asarray(coeff, np.float64).reshape(-1)
        assert arr.size == global_ncells
        per_dev = arr.reshape(self.ndev, self.cells_per_dev)
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
        packed = [self.ops.lattice.scales_field(per_dev[d]) for d in range(self.ndev)]
        stacked = tuple(
            jax.device_put(
                jnp.stack([packed[d][a] for d in range(self.ndev)]), self.sharding
            )
            for a in range(len(packed[0]))
        )
        return stacked


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
            stiff_keys=getattr(type(model), "STIFF_KEYS", ()),
            raw_stiff=getattr(model, "raw_stiff", None),
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
            # inside shard_map: leading device axis has local size 1
            consts = jax.tree.map(
                lambda x: x[0] if getattr(x, "ndim", 0) > 1 else x, consts
            )
            u, v = u[0], v[0]
            (u, v, t), _ = jax.lax.scan(
                partial(local_step, consts), (u, v, t0), dts
            )
            return u[None], v[None], t

        spec_consts = jax.tree.map(
            lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(),
            self.consts,
        )
        shmapped = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(spec_consts, P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(AXIS), P(AXIS), P()),
            # pallas_call outputs carry no varying-mesh-axes annotation;
            # strict vma checking would reject the fused kernels on TPU
            check_vma=False,
        )
        self._run = jax.jit(shmapped)

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
        t = t0 + float(np.sum(dts))
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t
        return model.u_n, model.v_n, t
