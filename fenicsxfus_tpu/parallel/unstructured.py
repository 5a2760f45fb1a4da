"""SPMD domain decomposition for UNSTRUCTURED conforming quad/hex meshes.

The reference partitions ANY mesh at read time and runs every solver
distributed (``cpp/fenicsx-sf/tests/test_operators3d/main.cpp:31``
``create_cell_partitioner``; ghost exchange
``cpp/fenicsx-sf/common/Linear.hpp:196-206``). The lattice decompositions
(``parallel/slab.py``, ``parallel/grid.py``) cover structured meshes; this
module closes the gap for unstructured/deformed meshes using the blocked
entity-class numbering (``ops/blocked.py``).

Design (TPU-first, not an MPI translation):

* Cells are partitioned into contiguous chunks by centroid along the
  longest bounding-box axis (a geometric partitioner — the analogue of the
  reference's cell partitioner, adequate for wave-propagation domains).
* Each device gets a LOCAL blocked vector
  ``[cell interiors | face rows | edge rows | vertex rows]`` over the
  entities its cells touch, padded to the max counts across devices (+1
  dummy row per class) so the SPMD program is shape-uniform. All
  per-device index tables, orientation masks, and geometry factors flow as
  *traced arguments* through ``shard_map`` — one compiled program, N
  different index sets.
* Entities touched by >1 device are replicated; after the per-device
  row-granular scatter, their rows are completed with ONE ``psum`` over a
  compact global shared-row buffer (scatter → psum → gather-back). Unlike
  neighbour ``ppermute`` halo exchange this handles ANY sharing pattern
  (vertices touched by many parts) in a single collective — the
  ``scatter_rev(+)`` analogue for arbitrary partitions.
* Padding cells replicate a real cell's indices with their coefficients
  zeroed, so their contributions vanish identically; padding rows never
  receive contributions and are excluded from result extraction and dot
  weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.conn import (
    edge_canonical_pos,
    face_canonical_pos,
    local_edges_3d,
    local_faces,
)
from ..core.geometry import volume_factors
from ..core.gll import diff_matrix
from ..core.space import build_space
from ..models.common import explicit_tables, step_sizes
from ..ops.blocked import (
    VPAD,
    _incidence,
    _mode,
    _padw,
    _place_matrix,
    wide_gather,
)
from ..ops.operators import stiffness_cells, stiffness_cells_dense

AXIS = "x"
_PREC = jax.lax.Precision.HIGHEST  # 0/1 placement matmuls must not truncate


def _mm(a, b):
    return jnp.dot(a, b, precision=_PREC, preferred_element_type=a.dtype)


class UnstructuredDecomposition:
    """Partition an unstructured conforming mesh over ``ndev`` devices.

    Builds the static gather/scatter structure (placement matrices,
    orientation-code sets — decided from GLOBAL mesh properties so the SPMD
    program is identical on every device) and the per-device traced tables
    (index maps, orientation masks, shared-row exchange lists, geometry).
    """

    def __init__(self, mesh, degree: int, ndev: int, dtype, space=None,
                 partition: str = "auto"):
        self.mesh = mesh
        self.degree = degree
        self.ndev = int(ndev)
        self.dtype = dtype
        space = space or build_space(mesh, degree)
        _ = space.dofmap  # force blocked numbering (sets conn/offsets/ndofs)
        if getattr(space, "conn", None) is None:
            raise ValueError(
                "unstructured decomposition needs the blocked numbering "
                "(2D/3D conforming mesh); 1D/structured meshes use "
                "parallel.slab / parallel.grid"
            )
        self.space = space
        conn = space.conn
        d, N = mesh.dim, space.N
        m = N - 2
        self.d, self.N, self.m = d, N, m
        self.ndofs = space.ndofs
        off = space.block_offsets
        nc = mesh.num_cells
        ndev = self.ndev

        # ---- cell partition: contiguous chunks along a 1D cell order -------
        # Two candidate orders (the reference delegates this choice to its
        # mesh partitioner, test_operators3d/main.cpp:31): sort by centroid
        # along the longest bounding-box axis (slab-like — minimal interface
        # for elongated wave domains) or along a Morton space-filling curve
        # (compact parts — smaller interface for cube-ish domains). "auto"
        # picks whichever replicates fewer vertices across devices: the
        # shared-entity count IS the psum-completion payload, so this is a
        # direct collective-traffic minimisation, decided once at setup.
        cents = mesh.vertices[np.asarray(mesh.cells)].mean(axis=1)
        ext = mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)
        nc_loc = -(-nc // ndev)
        self.nc_loc = nc_loc
        cells_arr = np.asarray(mesh.cells)

        def _shared_vertices(order_):
            touch = np.zeros(mesh.num_vertices, np.int32)
            for q in range(ndev):
                u = np.unique(cells_arr[order_[q * nc_loc : (q + 1) * nc_loc]])
                touch[u] += 1
            return int(np.count_nonzero(touch >= 2))

        if partition not in ("auto", "axis", "morton"):
            raise ValueError(f"unknown partition mode {partition!r}")
        cand = {}
        if partition in ("auto", "axis"):
            cand["axis"] = np.argsort(
                cents[:, int(np.argmax(ext))], kind="stable"
            )
        if partition in ("auto", "morton"):
            from ..core.mesh import _morton_codes

            cand["morton"] = np.argsort(_morton_codes(cents), kind="stable")
        if partition == "auto":
            if ndev == 1:
                partition = "axis"
            else:
                ns = {k: _shared_vertices(v) for k, v in cand.items()}
                partition = (
                    "axis" if ns["axis"] <= ns["morton"] else "morton"
                )
        self.partition_mode = partition
        order = cand[partition]
        cell_ids = np.empty((ndev, nc_loc), np.int64)
        valid = np.zeros((ndev, nc_loc), bool)
        for q in range(ndev):
            chunk = order[q * nc_loc : (q + 1) * nc_loc]
            n_q = len(chunk)
            pad_src = chunk[-1] if n_q else order[-1]
            cell_ids[q, :n_q] = chunk
            cell_ids[q, n_q:] = pad_src
            valid[q, :n_q] = True
        self.cell_ids = cell_ids
        self.cell_valid = valid

        # ---- per-device local entity numbering -----------------------------
        def per_dev_entities(gtab):
            """gtab [Nc, n_per_cell] global ids → per-device sorted unique
            global ids + local index tables."""
            uniqs, locs = [], []
            for q in range(ndev):
                g = gtab[cell_ids[q]]
                u = np.unique(g)
                uniqs.append(u)
                locs.append(np.searchsorted(u, g).astype(np.int32))
            return uniqs, locs

        tables = {}
        self._shared = {}  # class -> (n_shared_global,)
        nlf = len(local_faces(d)) if (d >= 2 and m > 0) else 0
        nle = len(local_edges_3d()) if (d == 3 and m > 0) else 0
        self.nlf, self.nle = nlf, nle

        def shared_lists(uniqs, n_global, n_loc_max):
            touch = np.zeros(n_global, np.int32)
            for u in uniqs:
                touch[u] += 1
            shared_g = np.nonzero(touch >= 2)[0]
            slot_of = np.full(n_global, -1, np.int64)
            slot_of[shared_g] = np.arange(len(shared_g))
            ns = len(shared_g)
            ns_max = max(
                (int(np.count_nonzero(slot_of[u] >= 0)) for u in uniqs),
                default=0,
            )
            locs = np.full((ndev, max(ns_max, 1)), n_loc_max, np.int32)
            slots = np.full((ndev, max(ns_max, 1)), ns, np.int32)
            for q, u in enumerate(uniqs):
                sl = slot_of[u]
                idx = np.nonzero(sl >= 0)[0]
                locs[q, : len(idx)] = idx
                slots[q, : len(idx)] = sl[idx]
            return ns, locs, slots

        if nlf:
            f_uniq, f_loc = per_dev_entities(np.asarray(conn.face_ids))
            self.nf_max = max(len(u) for u in f_uniq)
            tables["fids"] = np.stack(f_loc)  # [ndev, nc_loc, nlf]
            self.nsf, sfl, sfs = shared_lists(
                f_uniq, conn.num_faces, self.nf_max
            )
            tables["sfl"], tables["sfs"] = sfl, sfs
            self._f_uniq = f_uniq
        else:
            self.nf_max = 0
            self.nsf = 0
        if nle:
            e_uniq, e_loc = per_dev_entities(np.asarray(conn.edge_ids))
            self.ne_max = max(len(u) for u in e_uniq)
            tables["eids"] = np.stack(e_loc)
            self.nse, sel, ses = shared_lists(
                e_uniq, conn.num_edges, self.ne_max
            )
            tables["sel"], tables["ses"] = sel, ses
            self._e_uniq = e_uniq
        else:
            self.ne_max = 0
            self.nse = 0
        v_uniq, v_loc = per_dev_entities(np.asarray(mesh.cells, np.int64))
        self.nv_max = max(len(u) for u in v_uniq)
        tables["vids"] = np.stack(v_loc)
        self.nsv, svl, svs = shared_lists(v_uniq, mesh.num_vertices, self.nv_max)
        tables["svl"], tables["svs"] = svl, svs
        self._v_uniq = v_uniq
        # rows crossing the psum completion per apply (collective payload)
        self.shared_payload = (
            self.nsf * (m ** (d - 1) if (d >= 2 and m > 0) else 0)
            + self.nse * m
            + self.nsv
        )

        # per-device incidence tables for the v2/v3 transpose-gather
        # scatter (ops/blocked.py::_incidence over LOCAL entity ids,
        # K padded uniform across devices so the SPMD program is
        # shape-identical). Built eagerly — small int tables.
        def dev_incidence(loc_ids, n_rows):
            incs = [
                _incidence(loc_ids[q], n_rows) for q in range(ndev)
            ]
            K = max(i.shape[1] for i in incs)
            ns_nc = loc_ids.shape[2] * loc_ids.shape[1]  # pad target row
            return np.stack([
                np.pad(i, ((0, 0), (0, K - i.shape[1])),
                       constant_values=ns_nc)
                for i in incs
            ])

        if nlf:
            tables["incF"] = dev_incidence(tables["fids"], self.nf_max + 1)
        if nle:
            tables["incE"] = dev_incidence(tables["eids"], self.ne_max + 1)
        tables["incV"] = dev_incidence(tables["vids"], self.nv_max + 1)
        # v3 super-row widths (FUS_V3_LANES read at build time, like
        # ops/blocked.py; the idw/pos splits are derived in-trace from the
        # traced id tables — cheap fused int ops)
        import os as _os

        lanes = int(_os.environ.get("FUS_V3_LANES", "128"))
        self._R = {
            "F": max(1, lanes // _padw(m ** (d - 1))) if nlf else 1,
            "E": max(1, lanes // _padw(m)) if nle else 1,
            "V": max(1, lanes // VPAD),
        }

        # ---- local blocked vector layout (uniform across devices) ---------
        mf = m ** (d - 1) if d >= 2 else 0
        self.mf = mf
        loff = {"I": 0}
        loff["F"] = loff["I"] + nc_loc * m**d
        loff["E"] = loff["F"] + ((self.nf_max + 1) * mf if nlf else 0)
        loff["V"] = loff["E"] + ((self.ne_max + 1) * m if nle else 0)
        loff["end"] = loff["V"] + self.nv_max + 1
        self.loff = loff
        self.local_ndofs = loff["end"]

        # ---- global-dof map + authoritative mask ---------------------------
        map_idx = np.full((ndev, self.local_ndofs), -1, np.int64)
        auth = np.zeros((ndev, self.local_ndofs), bool)
        md = m**d
        for q in range(ndev):
            if md:
                gi = (
                    off["I"]
                    + cell_ids[q][:, None] * md
                    + np.arange(md)[None, :]
                ).reshape(-1)
                map_idx[q, : loff["F"]] = gi
                auth[q, : loff["F"]] = np.repeat(valid[q], md)
            if nlf:
                u = self._f_uniq[q]
                gi = (off["F"] + u[:, None] * mf + np.arange(mf)[None, :])
                sl = slice(loff["F"], loff["F"] + len(u) * mf)
                map_idx[q, sl] = gi.reshape(-1)
                auth[q, sl] = True
            if nle:
                u = self._e_uniq[q]
                gi = off["E"] + u[:, None] * m + np.arange(m)[None, :]
                sl = slice(loff["E"], loff["E"] + len(u) * m)
                map_idx[q, sl] = gi.reshape(-1)
                auth[q, sl] = True
            u = self._v_uniq[q]
            sl = slice(loff["V"], loff["V"] + len(u))
            map_idx[q, sl] = off["V"] + u
            auth[q, sl] = True
        self.map_idx = map_idx
        self.auth = auth

        # ---- static gather/scatter structure -------------------------------
        lattice = np.arange(N**d).reshape((N,) * d)
        nd = N**d
        self.nd = nd
        gblocks = []
        self._multi = {}  # (kind, k) -> [(code, T [w, w])]
        mask_arrays = {}  # key -> [ndev, nc_loc, 1]
        if md:
            ii = lattice[(slice(1, N - 1),) * d].reshape(-1)
            gblocks.append(_place_matrix(md, ii, nd))
        if nlf:
            wf = _padw(mf)
            self.wf = wf
            for k, (a, s, uv) in enumerate(local_faces(d)):
                sl = [slice(1, N - 1)] * d
                sl[a] = N - 1 if s else 0
                cols = lattice[tuple(sl)].reshape(-1)
                o_all = np.asarray(conn.face_orient[:, k])
                codes = sorted(int(c) for c in np.unique(o_all))
                if len(codes) == 1:
                    pos = (
                        face_canonical_pos(m, codes[0]).reshape(-1)
                        if d == 3
                        else edge_canonical_pos(m, codes[0])
                    )
                    gblocks.append(_place_matrix(wf, cols, nd, perm=pos))
                else:
                    gblocks.append(_place_matrix(wf, cols, nd))
                    Ts = []
                    for o in codes:
                        pos = (
                            face_canonical_pos(m, o).reshape(-1)
                            if d == 3
                            else edge_canonical_pos(m, o)
                        )
                        T = np.zeros((wf, wf))
                        T[pos.astype(int), np.arange(len(pos))] = 1.0
                        Ts.append((o, jnp.asarray(T)))
                        mask_arrays[f"fm{k}c{o}"] = (
                            (o_all[cell_ids] == o).astype(np.float64)[..., None]
                        )
                    self._multi[("f", k)] = Ts
        if nle:
            we = _padw(m)
            self.we = we
            for k, (a, fixed) in enumerate(local_edges_3d()):
                sl = [None, None, None]
                sl[a] = slice(1, N - 1)
                for ax, s in fixed:
                    sl[ax] = N - 1 if s else 0
                cols = lattice[tuple(sl)].reshape(-1)
                o_all = np.asarray(conn.edge_flip[:, k])
                codes = sorted(int(c) for c in np.unique(o_all))
                if len(codes) == 1:
                    gblocks.append(
                        _place_matrix(
                            we, cols, nd, perm=edge_canonical_pos(m, codes[0])
                        )
                    )
                else:
                    gblocks.append(_place_matrix(we, cols, nd))
                    Ts = []
                    for o in codes:
                        pos = edge_canonical_pos(m, o)
                        T = np.zeros((we, we))
                        T[pos.astype(int), np.arange(len(pos))] = 1.0
                        Ts.append((o, jnp.asarray(T)))
                        mask_arrays[f"em{k}c{o}"] = (
                            (o_all[cell_ids] == o).astype(np.float64)[..., None]
                        )
                    self._multi[("e", k)] = Ts
        for v in range(2**d):
            bits = [(v >> (d - 1 - a)) & 1 for a in range(d)]
            col = int(lattice[tuple((N - 1) if b else 0 for b in bits)])
            gblocks.append(_place_matrix(VPAD, [col], nd))
        self.G_place = jnp.asarray(np.concatenate(gblocks, axis=0))
        self._block_widths = [g.shape[0] for g in gblocks]
        self.D = jnp.asarray(diff_matrix(N), dtype)
        from ..ops.operators import tabulate_B

        self.B_tab = jnp.asarray(tabulate_B(N, self.d), dtype)

        # ---- per-device geometry factors -----------------------------------
        _, G_glob = volume_factors(mesh, N)  # [Nc, Nq, nsym]
        nsym = G_glob.shape[-1]
        tables["G"] = G_glob[cell_ids].reshape(
            (ndev, nc_loc) + (N,) * d + (nsym,)
        )

        # ---- device mesh + stacked tables ----------------------------------
        self.jmesh = JMesh(np.array(jax.devices()[:ndev]), (AXIS,))
        self.sharding = NamedSharding(self.jmesh, P(AXIS))
        tables.update(mask_arrays)
        self.tables = {
            k: jax.device_put(
                jnp.asarray(
                    v,
                    (
                        dtype
                        if np.asarray(v).dtype.kind == "f"
                        else jnp.int32
                    ),
                ),
                self.sharding,
            )
            for k, v in tables.items()
        }

    # =================================================================== SPMD
    # All methods below run INSIDE shard_map on local (per-device) values.

    def _orient(self, t, kind, k, rows, transpose=False):
        Ts = self._multi.get((kind, k))
        if Ts is None:
            return rows
        dt = rows.dtype
        out = None
        for code, T in Ts:
            mask = t[f"{'fm' if kind == 'f' else 'em'}{k}c{code}"].astype(dt)
            piece = mask * _mm(rows, (T.T if transpose else T).astype(dt))
            out = piece if out is None else out + piece
        return out

    def _entity_views(self, x):
        d, m, mf = self.d, self.m, self.mf
        loff = self.loff
        xF = xE = None
        if self.nlf:
            tbl = x[loff["F"] : loff["E"]].reshape(-1, mf)
            xF = jnp.pad(tbl, ((0, 0), (0, self.wf - mf)))
        if self.nle:
            tbl = x[loff["E"] : loff["V"]].reshape(-1, m)
            xE = jnp.pad(tbl, ((0, 0), (0, self.we - m)))
        xV = jnp.pad(x[loff["V"] :][:, None], ((0, 0), (0, VPAD - 1)))
        return xF, xE, xV

    def _rows_v3(self, tbl, ids, key):
        """ONE fused slot-major super-row gather for all local slots
        (``ops/blocked.py`` v3 schedule on traced per-device id tables:
        the idw/pos split is derived in-trace — cheap fused int ops)."""
        R = self._R[key]
        flat = ids.T.reshape(-1)
        rows = wide_gather(tbl, flat // R, (flat % R)[:, None], R)
        return rows.reshape(ids.shape[1], ids.shape[0], -1)

    def gather_local(self, t, x):
        """Local blocked vector [local_ndofs] → cell array [nc_loc, (N,)*d]."""
        d, N, m = self.d, self.N, self.m
        xF, xE, xV = self._entity_views(x)
        v3 = _mode() == "v3"
        pieces = []
        if m > 0:
            pieces.append(x[: self.loff["F"]].reshape(self.nc_loc, m**d))
        if self.nlf:
            rF = self._rows_v3(xF, t["fids"], "F") if v3 else None
            for k in range(self.nlf):
                rows = rF[k] if v3 else xF[t["fids"][:, k]]
                pieces.append(self._orient(t, "f", k, rows))
        if self.nle:
            rE = self._rows_v3(xE, t["eids"], "E") if v3 else None
            for k in range(self.nle):
                rows = rE[k] if v3 else xE[t["eids"][:, k]]
                pieces.append(self._orient(t, "e", k, rows))
        rV = self._rows_v3(xV, t["vids"], "V") if v3 else None
        for v in range(2**d):
            pieces.append(rV[v] if v3 else xV[t["vids"][:, v]])
        big = jnp.concatenate(pieces, axis=1)
        xc = _mm(big, self.G_place.astype(x.dtype))
        return xc.reshape((self.nc_loc,) + (N,) * d)

    @staticmethod
    def _complete(rows, loc, slot, nslots):
        """psum-complete shared entity rows: local contributions →
        compact global buffer → all-reduce → written back. The
        ``scatter_rev(+)`` analogue for arbitrary sharing patterns."""
        buf = jnp.zeros((nslots + 1, rows.shape[1]), rows.dtype)
        buf = buf.at[slot].add(rows[loc])
        buf = jax.lax.psum(buf, AXIS)
        return rows.at[loc].set(buf[slot])

    def _assemble(self, ps, ids, inc, key, v3):
        """Per-slot pieces → per-entity rows: v3 transpose-gathers through
        super-rows from the stacked pieces (+ a zeros pad row, the
        incidence padding target); otherwise per-slot ``.at[].add``."""
        dt = ps[0].dtype
        if v3:
            rows = jnp.concatenate(
                ps + [jnp.zeros((1, ps[0].shape[1]), dt)], axis=0
            )
            R = self._R[key]
            out = None
            for j in range(inc.shape[1]):
                ext = wide_gather(
                    rows, inc[:, j] // R, (inc[:, j] % R)[:, None], R
                )
                out = ext if out is None else out + ext
            return out
        n_rows = {"F": self.nf_max, "E": self.ne_max, "V": self.nv_max}[key]
        y = jnp.zeros((n_rows + 1, ps[0].shape[1]), dt)
        for k, piece in enumerate(ps):
            y = y.at[ids[:, k]].add(piece)
        return y

    def scatter_local(self, t, yc):
        """Cell array → additively assembled local blocked vector, with
        shared-row completion (the distributed assembly)."""
        d, N, m, mf = self.d, self.N, self.m, self.mf
        yc2 = yc.reshape(self.nc_loc, self.nd)
        dt = yc2.dtype
        big = _mm(yc2, self.G_place.astype(dt).T)
        splits = np.cumsum(self._block_widths)[:-1]
        chunks = jnp.split(big, splits, axis=1)
        v3 = _mode() == "v3"
        i = 0
        parts = []
        if m > 0:
            parts.append(chunks[i].reshape(-1))
            i += 1
        if self.nlf:
            ps = []
            for k in range(self.nlf):
                ps.append(self._orient(t, "f", k, chunks[i], transpose=True))
                i += 1
            yF = self._assemble(ps, t["fids"], t.get("incF"), "F", v3)
            yF = self._complete(yF, t["sfl"], t["sfs"], self.nsf)
            parts.append(yF[:, :mf].reshape(-1))
        if self.nle:
            ps = []
            for k in range(self.nle):
                ps.append(self._orient(t, "e", k, chunks[i], transpose=True))
                i += 1
            yE = self._assemble(ps, t["eids"], t.get("incE"), "E", v3)
            yE = self._complete(yE, t["sel"], t["ses"], self.nse)
            parts.append(yE[:, :m].reshape(-1))
        ps = [chunks[i + v] for v in range(2**d)]
        i += 2**d
        yV = self._assemble(ps, t["vids"], t.get("incV"), "V", v3)
        yV = self._complete(yV, t["svl"], t["svs"], self.nsv)
        parts.append(yV[:, 0])
        return jnp.concatenate(parts)

    # ============================================================== host side

    def to_stacked(self, vec, pad_value: float = 0.0) -> jnp.ndarray:
        v = np.asarray(vec)
        out = np.full((self.ndev, self.local_ndofs), pad_value, v.dtype)
        ok = self.map_idx >= 0
        out[ok] = v[self.map_idx[ok]]
        return jax.device_put(jnp.asarray(out, self.dtype), self.sharding)

    def from_stacked(self, stacked) -> np.ndarray:
        s = np.asarray(stacked).reshape(self.ndev, self.local_ndofs)
        out = np.zeros(self.ndofs, s.dtype)
        a = self.auth
        out[self.map_idx[a]] = s[a]
        return out

    def locate_dofs(self, gdofs):
        """Global DOF indices → (device, local slot); replicated rows
        resolve to their first authoritative holder (replicas are kept
        identical by the completion exchange)."""
        dev_a, slot_a = np.nonzero(self.auth)
        g_a = self.map_idx[dev_a, slot_a]
        order = np.argsort(g_a, kind="stable")
        g_sorted = g_a[order]
        pos = np.searchsorted(g_sorted, gdofs)
        ok = (pos < len(g_sorted)) & (
            g_sorted[np.minimum(pos, len(g_sorted) - 1)] == gdofs
        )
        if not np.all(ok):
            raise ValueError("sensor DOF has no authoritative row")
        sel = order[pos]
        return dev_a[sel], slot_a[sel]

    def dot_weights(self) -> jnp.ndarray:
        """1/(replica count) at authoritative rows, 0 elsewhere — makes
        Σ_dev Σ_local w·x·y the true global dot product."""
        cnt = np.bincount(
            self.map_idx[self.auth], minlength=self.ndofs
        ).astype(np.float64)
        w = np.zeros((self.ndev, self.local_ndofs))
        a = self.auth
        w[a] = 1.0 / cnt[self.map_idx[a]]
        return jax.device_put(jnp.asarray(w, self.dtype), self.sharding)

    def shard_cell_coeff(self, coeff) -> jnp.ndarray:
        """Global DG-0 coefficient ([Nc] or scalar) → [ndev, nc_loc] with
        padding cells zeroed (kills their contributions identically)."""
        arr = np.broadcast_to(
            np.asarray(coeff, np.float64).reshape(-1), (self.mesh.num_cells,)
        )
        local = arr[self.cell_ids] * self.cell_valid
        return jax.device_put(jnp.asarray(local, self.dtype), self.sharding)

    def shard_consts(self, consts, stiff_keys=(), raw_stiff=None,
                     pad_one=()) -> dict:
        raw_stiff = raw_stiff or {}
        out = {}
        for k, val in consts.items():
            if k in stiff_keys:
                out[k] = self.shard_cell_coeff(raw_stiff[k])
            elif np.isscalar(val) or getattr(val, "ndim", 0) == 0:
                out[k] = val
            elif val.shape == (self.ndofs,):
                out[k] = self.to_stacked(
                    val, pad_value=1.0 if k in pad_one else 0.0
                )
            elif val.shape == (self.mesh.num_cells,):
                out[k] = self.shard_cell_coeff(val)
            else:
                raise ValueError(f"const {k}: unexpected shape {val.shape}")
        return out


class LocalUnstructuredOps:
    """The per-device operator view handed to ``rhs_pure`` inside the traced
    SPMD program: same interface as ``SEMOperators.stiffness_apply`` but
    indices/geometry are traced per-device tables."""

    def __init__(self, dec: UnstructuredDecomposition, tables):
        self.dec = dec
        self.t = tables

    def stiffness_apply(self, xs, coeffs):
        import os

        dec = self.dec
        z = None
        shape = (-1,) + (1,) * dec.d
        for x, c in zip(xs, coeffs):
            zc = c.reshape(shape).astype(x.dtype) * dec.gather_local(self.t, x)
            z = zc if z is None else z + zc
        if dec.d >= 2 and os.environ.get("FUS_DENSE_TAB", "1") != "0":
            # dense shared-B tabulation: K = N^d MXU contractions (see
            # ops/operators.py::stiffness_cells_dense)
            yc = stiffness_cells_dense(dec.B_tab, self.t["G"], z, dec.d)
        else:
            yc = stiffness_cells(dec.D, self.t["G"], z, dec.d)
        return dec.scatter_local(self.t, yc)


def _local(tree):
    return jax.tree.map(
        lambda x: x[0] if getattr(x, "ndim", 0) > 1 else x, tree
    )


def _specs(tree):
    return jax.tree.map(
        lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(), tree
    )


def _model_kwargs(model):
    return dict(
        stiff_keys=getattr(type(model), "STIFF_KEYS", ()),
        raw_stiff=getattr(model, "raw_stiff", None),
        pad_one=getattr(type(model), "PAD_ONE_KEYS", ()),
    )


class ShardedUnstructuredExplicitSolver:
    """Explicit-RK solver over a 1D device mesh for unstructured meshes —
    the arbitrary-mesh counterpart of ``slab.ShardedExplicitSolver``."""

    def __init__(self, model, ndev: int, partition: str = "auto"):
        self.model = model
        self.dec = UnstructuredDecomposition(
            model.mesh, model.degree, ndev, model.dtype,
            space=model.ops.space, partition=partition,
        )
        self.consts = self.dec.shard_consts(
            model.consts, **_model_kwargs(model)
        )
        self._run = None

    def _build(self):
        dec, model = self.dec, self.model
        a, b, c = explicit_tables(model.rk_order)
        rhs = type(model).rhs_pure

        def local_step(consts, ops, carry, dtn):
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

        def local_run(consts, tables, u, v, t0, xs):
            consts = _local(consts)
            tables = _local(tables)
            ops = LocalUnstructuredOps(dec, tables)
            u, v = u[0], v[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                return local_step(
                    consts, ops, (carry[0], carry[1], tn), dtn
                )

            (u, v, t), _ = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t

        sharded = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(
                _specs(self.consts),
                _specs(dec.tables),
                P(AXIS),
                P(AXIS),
                P(),
                P(),
            ),
            out_specs=(P(AXIS), P(AXIS), P()),
            check_vma=False,
        )
        self._run = jax.jit(sharded)

    def rk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        model, dec = self.model, self.dec
        u = dec.to_stacked(model.u_n)
        v = dec.to_stacked(model.v_n)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t = run_segmented(
            lambda cst, uu, vv, tt, seg: self._run(
                cst, dec.tables, uu, vv, tt, seg
            ),
            self.consts, u, v, t0, dts, model.dtype,
        )
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t0 + float(np.sum(dts))
        return model.u_n, model.v_n, model.t

    # -- in-scan sensor recording (sharded) --------------------------------

    def _sensor_plan(self, points):
        """(extract, sharded slot table, dev, slot, wts) — per-device padded
        slot tables; extraction uses per-sensor dynamic slices (the blocked
        numbering has no lattice box to window, and m tiny 1-element
        dynamic slices lower far better than one scattered gather on TPU).
        Node-aligned sensors keep the single-dof gather; off-node sensors
        expand into their owning cell's N**d dof rows as independent
        virtual sensors (each row has a replica on SOME device, identical
        everywhere) and interpolate in host reassembly
        (``slab.weighted_sensor_rows``)."""
        dec = self.dec
        rows, wts = self.model.sensor_interp_tables(points)
        amax = np.abs(wts).max(axis=1)
        if np.all(amax >= 1.0 - 1e-9):
            gdofs = rows[np.arange(len(rows)), np.abs(wts).argmax(axis=1)]
            wts = None
        else:
            gdofs = rows.reshape(-1)
        dev, slot = dec.locate_dofs(np.asarray(gdofs))
        n = dev.size
        m = max(int(np.max(np.bincount(dev, minlength=dec.ndev))), 1)
        tab = np.zeros((dec.ndev, m), np.int32)
        dslot = np.zeros(n, np.int64)
        counts = np.zeros(dec.ndev, np.int64)
        for j in range(n):
            dd = int(dev[j])
            tab[dd, counts[dd]] = slot[j]
            dslot[j] = counts[dd]
            counts[dd] += 1

        if m <= 256:

            def extract(u_local, tab_local):
                return jnp.stack([
                    jax.lax.dynamic_slice(u_local, (tab_local[j],), (1,))[0]
                    for j in range(m)
                ])
        else:
            # interp-expanded sensor sets (n * N**d virtual rows) would
            # unroll thousands of slices — one gather bounds the program
            def extract(u_local, tab_local):
                return u_local[tab_local]

        tab_sharded = jax.device_put(jnp.asarray(tab), dec.sharding)
        return extract, tab_sharded, dev, dslot, wts

    def rk_record(self, t0: float, tf: float, points):
        """``rk`` + device-side per-step sensor recording; identical series
        to the single-device ``model.rk_record`` (multi-chip analogue of
        ``cpp/mwe/parallel_eval_line/main.cpp:49-107``)."""
        from ..models.common import run_segmented

        extract, tab, dev, slot, wts = self._sensor_plan(points)
        a, b, c = explicit_tables(self.model.rk_order)
        dec, model = self.dec, self.model
        rhs = type(model).rhs_pure

        key = (bytes(np.asarray(tab).tobytes()), dev.tobytes())
        cache = getattr(self, "_rec_runs", None)
        if cache is None:
            cache = self._rec_runs = {}
        run = cache.get(key)
        if run is None:

            def local_step(consts, ops, carry, dtn):
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

            def local_run(consts, tables, tabl, u, v, t0v, xs):
                consts = _local(consts)
                tables = _local(tables)
                ops = LocalUnstructuredOps(dec, tables)
                u, v, tabl = u[0], v[0], tabl[0]

                def body(carry, x):
                    dtn, tn = x  # exact host-precomputed step start time
                    out, _ = local_step(
                        consts, ops, (carry[0], carry[1], tn), dtn
                    )
                    return out, extract(out[0], tabl)

                (u, v, t), ys = jax.lax.scan(body, (u, v, t0v), xs)
                return u[None], v[None], t, ys[:, None]

            rec = jax.jit(jax.shard_map(
                local_run,
                mesh=dec.jmesh,
                in_specs=(
                    _specs(self.consts), _specs(dec.tables),
                    P(AXIS), P(AXIS), P(AXIS), P(), P(),
                ),
                out_specs=(P(AXIS), P(AXIS), P(), P(None, AXIS)),
                check_vma=False,
            ))
            run = lambda cst, uu, vv, tt, seg: rec(  # noqa: E731
                cst, dec.tables, tab, uu, vv, tt, seg
            )
            cache[key] = run

        u = dec.to_stacked(model.u_n)
        v = dec.to_stacked(model.v_n)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, ys = run_segmented(
            run, self.consts, u, v, t0, dts, model.dtype, collect_ys=True
        )
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t0 + float(np.sum(dts))
        times = t0 + np.cumsum(dts)
        from .slab import weighted_sensor_rows

        return (model.u_n, model.v_n, model.t, times,
                weighted_sensor_rows(np.asarray(ys)[:, dev, slot], wts))


class ShardedUnstructuredImplicitSolver:
    """SDIRK solver for unstructured meshes over a 1D device mesh
    (psum-weighted CG dots, as in ``slab.ShardedImplicitSolver``)."""

    def __init__(self, model, ndev: int, partition: str = "auto"):
        self.model = model
        self.dec = UnstructuredDecomposition(
            model.mesh, model.degree, ndev, model.dtype,
            space=model.ops.space, partition=partition,
        )
        kw = _model_kwargs(model)
        kw["pad_one"] = tuple(kw["pad_one"]) or ("m",)
        self.consts = self.dec.shard_consts(model.consts, **kw)
        self.weights = self.dec.dot_weights()
        self._run = None

    def _local_step_fn(self):
        from ..ops.cg import cg_solve

        model = self.model
        cls = type(model)
        A_tab, b_tab, c_tab = model.A_tab, model.b_tab, model.c_tab
        n = len(b_tab)
        rtol, maxiter = model.cg_rtol, model.cg_maxiter

        def local_step(consts, ops, w, carry, dtn):
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
                bb = cls.rhs_stage(ops, consts, tau, tn, un, vn)
                x0 = kvs[-1] if kvs else jnp.zeros_like(v0)
                kv, (it, res2) = cg_solve(
                    lambda x: cls.lhs_pure(ops, consts, tau, x), bb, x0,
                    dinv, rtol=rtol, maxiter=maxiter, dot=dot,
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

        def local_run(consts, tables, w, u, v, t0, xs):
            consts = _local(consts)
            tables = _local(tables)
            ops = LocalUnstructuredOps(dec, tables)
            u, v, w = u[0], v[0], w[0]

            def body(carry, x):
                dtn, tn = x  # exact host-precomputed step start time
                return local_step(
                    consts, ops, w, (carry[0], carry[1], tn), dtn
                )

            (u, v, t), stats = jax.lax.scan(body, (u, v, t0), xs)
            return u[None], v[None], t, stats

        sharded = jax.shard_map(
            local_run,
            mesh=dec.jmesh,
            in_specs=(
                _specs(self.consts),
                _specs(dec.tables),
                P(AXIS),
                P(AXIS),
                P(AXIS),
                P(),
                P(),
            ),
            out_specs=(P(AXIS), P(AXIS), P(), P()),
            check_vma=False,
        )
        self._run = jax.jit(sharded)

    _sensor_plan = ShardedUnstructuredExplicitSolver._sensor_plan

    def dirk_record(self, t0: float, tf: float, points):
        """``dirk`` + device-side per-step sensor recording (implicit
        counterpart of the explicit solver's ``rk_record``; CG stats ride
        the same per-step row — identical series to the single-device
        ``model.dirk_record``)."""
        from ..models.common import run_segmented

        extract, tab, dev, slot, wts = self._sensor_plan(points)
        dec, model = self.dec, self.model
        local_step = self._local_step_fn()

        key = (bytes(np.asarray(tab).tobytes()), dev.tobytes())
        cache = getattr(self, "_rec_runs", None)
        if cache is None:
            cache = self._rec_runs = {}
        run = cache.get(key)
        if run is None:

            def local_run(consts, tables, w, tabl, u, v, t0v, xs):
                consts = _local(consts)
                tables = _local(tables)
                ops = LocalUnstructuredOps(dec, tables)
                u, v, w, tabl = u[0], v[0], w[0], tabl[0]

                def body(carry, x):
                    dtn, tn = x  # exact host-precomputed step start time
                    out, stats = local_step(
                        consts, ops, w, (carry[0], carry[1], tn), dtn
                    )
                    # [CG it_max, res_max, sensors...] — stats replicated
                    return out, jnp.concatenate([stats, extract(out[0], tabl)])

                (u, v, t), rows = jax.lax.scan(body, (u, v, t0v), xs)
                return u[None], v[None], t, rows[:, None]

            rec = jax.jit(jax.shard_map(
                local_run,
                mesh=dec.jmesh,
                in_specs=(
                    _specs(self.consts), _specs(dec.tables),
                    P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(),
                ),
                out_specs=(P(AXIS), P(AXIS), P(), P(None, AXIS)),
                check_vma=False,
            ))
            run = lambda cst, uu, vv, tt, seg: rec(  # noqa: E731
                cst, dec.tables, self.weights, tab, uu, vv, tt, seg
            )
            cache[key] = run

        u = dec.to_stacked(model.u_n)
        v = dec.to_stacked(model.v_n)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, rows = run_segmented(
            run, self.consts, u, v, t0, dts, model.dtype, collect_ys=True
        )
        rows = np.asarray(rows)  # [steps, ndev, 2 + m]
        model.cg_stats = {
            "max_iterations": int(np.max(rows[:, 0, 0])),
            "max_residual2": float(np.max(rows[:, 0, 1])),
        }
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t0 + float(np.sum(dts))
        times = t0 + np.cumsum(dts)
        from .slab import weighted_sensor_rows

        return (model.u_n, model.v_n, model.t, times,
                weighted_sensor_rows(rows[:, dev, 2 + slot], wts))

    def dirk(self, t0: float, tf: float):
        from ..models.common import run_segmented

        if self._run is None:
            self._build()
        model, dec = self.model, self.dec
        u = dec.to_stacked(model.u_n)
        v = dec.to_stacked(model.v_n)
        dts = np.asarray(step_sizes(t0, tf, model.dt))
        us, vs, t, stats = run_segmented(
            lambda cst, uu, vv, tt, seg: self._run(
                cst, dec.tables, self.weights, uu, vv, tt, seg
            ),
            self.consts, u, v, t0, dts, model.dtype, collect_ys=True,
        )
        st = np.asarray(stats).reshape(-1, 2)
        model.cg_stats = {
            "max_iterations": int(np.max(st[:, 0])),
            "max_residual2": float(np.max(st[:, 1])),
        }
        model.u_n = jnp.asarray(dec.from_stacked(us), model.dtype)
        model.v_n = jnp.asarray(dec.from_stacked(vs), model.dtype)
        model.t = t0 + float(np.sum(dts))
        return model.u_n, model.v_n, model.t
