"""Row-granular gather/scatter for unstructured conforming quad/hex meshes.

The TPU equivalent of the reference's sum-factorised ("sf") rung for
unstructured meshes (``cpp/fenicsx-sf/common/spectral_op.hpp:70-86``
gather → kernel → scatter-add). Two measured TPU facts drive the design:

* XLA lowers scalar-index gathers at ~0.6 GB/s but row-granular
  gathers/scatter-adds at 70-500+ GB/s (``benchmarks/unstructured_speed.py``);
* any array whose last two dims are small is physically tiled to (8, 128)
  — a [Nc, 3, 3] face block costs 90 MB at 22k cells. Everything here
  therefore stays strictly 2D [rows, cols], and all intra-row index motion
  (orientation transforms, placement into the tensor-lex cell layout) is
  done with tiny constant 0/1 matrices on the MXU.

Global DOFs are numbered by entity class

    [ cell interiors | face interiors | edge interiors | vertices ]

(``FunctionSpace`` blocked numbering, built from ``core/conn.py``):

* gather   = per-local-entity row gathers from lane-padded entity tables
  + one placement matmul per entity class into the [Nc, N^d] cell array;
* scatter  = the exact transpose: extraction matmuls + row scatter-adds.

Orientations select among a handful of permutation matrices with one-hot
cell masks — no data-dependent indexing anywhere in the hot loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST  # 0/1 matmuls must not truncate to bf16


def _mode() -> str:
    """FUS_BLOCKED schedule select (read at trace time):

    v1  per-slot row gathers; scatter via ``.at[].add`` per slot.
    v2  ONE fused slot-major row gather per entity class; scatter via
        transpose-gathers from precomputed incidence tables (no scatter-add).
    v3  v2, but every dynamic row motion is a *wide* gather: entity tables
        are viewed as 128-lane super-rows (R = 128/w narrow rows each,
        zero-copy reshape) and the wanted narrow row is extracted with a
        position mask over R static slices. Row-granular gather throughput
        on this chip is width-bound (~3 GB/s effective at 16 lanes vs
        70-2600 GB/s wide, ``benchmarks/unstructured_timings_v5e.txt``), so
        trading 128/w-times the gather traffic for full-width rows wins
        whenever w < 128. Same math, bit-identical results.

    On-chip A/B (v5e, distorted 21952-cell box, p=4, 1.44M DOF; two
    independent runs each, ``benchmarks/unstructured_timings_v5e.txt``):
    total apply v1 7.64/8.33 ms, v2 7.40/7.55 ms, v3 17.89/18.01 ms —
    v2 is the consistent winner (the transpose-gather scatter removes the
    serialized ``.at[].add`` passes; v3's 8-16x gather-traffic inflation
    costs more than the wide rows save at w=20-25). Default is v2.

    One further data point: v3 + ``FUS_V3_EXTRACT=dot`` (one-hot-matmul
    super-row extraction) measured 6.10 ms total in a single run — the
    fastest of the session — but with only one measurement vs v2's two
    consistent runs it stays opt-in until replicated."""
    return os.environ.get("FUS_BLOCKED", "v2")


def _incidence(ids: np.ndarray, n_entities: int) -> np.ndarray:
    """[n_entities, K] table: row j of entity e is the flat (slot-major)
    piece-row index ``k * nc + c`` of the j-th incident (local slot k,
    cell c); padded with ``ns * nc`` (a zeros row) up to the max incidence
    K. Entity assembly then is K row gathers + adds — no scatter."""
    nc, ns = ids.shape
    flat = ids.T.reshape(-1).astype(np.int64)  # slot-major == piece stacking
    order = np.argsort(flat, kind="stable")
    sorted_ids = flat[order]
    counts = np.bincount(flat, minlength=n_entities)
    K = int(counts.max()) if len(counts) else 0
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(order)) - starts[sorted_ids]
    inc = np.full((n_entities, K), ns * nc, np.int64)
    inc[sorted_ids, pos] = order
    return inc

VPAD = 8  # minimum lane-padded row width for entity tables


def _padw(w: int) -> int:
    return max(-(-w // 8) * 8, VPAD)


def _widen(t, R):
    """[n, w] → [ceil(n/R), R·w] super-row view (zero row padding)."""
    if R == 1:
        return t
    n, w = t.shape
    pad = (-n) % R
    if pad:
        t = jnp.pad(t, ((0, pad), (0, 0)))
    return t.reshape(-1, R * w)


def wide_gather(t, idw, pos, R):
    """Gather narrow rows of ``t`` [n, w] by R·w-lane super-rows: fetch
    wide row ``idw``, extract the narrow row at ``pos``. Wide-row gather
    throughput is what the chip sustains; the extraction is exact (one
    selector is 1, the others pick 0). Shared by the single-device v3
    schedule and the sharded unstructured path.

    Two extraction schedules (FUS_V3_EXTRACT, read at trace time):

    mask  R static slices, each position-masked then summed — R fused
          VPU passes over the gathered wide rows.
    dot   one batched one-hot contraction einsum('nr,nrw->nw') — a
          single pass over the wide rows if XLA fuses the reshape;
          queued for on-chip A/B against mask (the first v3 chip run
          measured the extraction, not the gather, as the cost)."""
    w = t.shape[1]
    wide = _widen(t, R)[idw]
    if R == 1:
        return wide
    if os.environ.get("FUS_V3_EXTRACT", "mask") == "dot":
        sel = (pos == jnp.arange(R, dtype=pos.dtype)[None, :]).astype(t.dtype)
        return jnp.einsum(
            "nr,nrw->nw", sel, wide.reshape(wide.shape[0], R, w),
            precision=_PREC,
        )
    out = None
    for p in range(R):
        piece = jnp.where(pos == p, wide[:, p * w : (p + 1) * w], 0)
        out = piece if out is None else out + piece
    return out


def _place_matrix(width: int, cols, ncols: int, perm=None) -> np.ndarray:
    """[width, ncols] 0/1 matrix placing row entry ``perm[q]`` (default q)
    at column ``cols[q]``."""
    M = np.zeros((width, ncols), np.float64)
    for q, c in enumerate(cols):
        src = q if perm is None else int(perm[q])
        M[src, c] = 1.0
    return M


class BlockedAssembly:
    """gather/scatter between blocked global vectors and [Nc, N^d] cell
    arrays. Built once per (mesh, degree); all index/placement data are
    compile-time constants."""

    def __init__(self, space):
        self.space = space
        mesh = space.mesh
        d, N = mesh.dim, space.N
        self.d, self.N = d, N
        m = N - 2
        self.m = m
        self.nc = mesh.num_cells
        self.nd = N**d
        conn = space.conn
        self.conn = conn
        self.off = space.block_offsets
        nc, nd = self.nc, self.nd

        lattice = np.arange(nd).reshape((N,) * d)

        def face_cols(a, s):
            sl = [slice(1, N - 1)] * d
            sl[a] = N - 1 if s else 0
            return lattice[tuple(sl)].reshape(-1)

        def edge_cols(a, fixed):
            sl = [None] * d
            sl[a] = slice(1, N - 1)
            for ax, s in fixed:
                sl[ax] = N - 1 if s else 0
            return lattice[tuple(sl)].reshape(-1)

        with jax.ensure_compile_time_eval():
            self.cells_j = jnp.asarray(np.asarray(mesh.cells, np.int32))
            # interior placement [m^d, nd]
            if m > 0:
                ii = lattice[(slice(1, N - 1),) * d].reshape(-1)
                self.P_I = jnp.asarray(_place_matrix(m**d, ii, nd))
            # faces / edges: loop extents for the hot path (the placement
            # matrices live combined in G below; multi-orientation column
            # perms in _multi_T)
            self.face_data = []
            self.edge_data = []
            if d >= 2 and m > 0:
                self.fids_j = jnp.asarray(conn.face_ids.astype(np.int32))
                self.face_data = list(range(conn.face_ids.shape[1]))
            if d == 3 and m > 0:
                self.eids_j = jnp.asarray(conn.edge_ids.astype(np.int32))
                self.edge_data = list(range(conn.edge_ids.shape[1]))
            # vertices: [VPAD, nd] placing table column 0 at the corner
            self.vert_P = []
            for v in range(2**d):
                bits = [(v >> (d - 1 - a)) & 1 for a in range(d)]
                col = int(lattice[tuple((N - 1) if b else 0 for b in bits)])
                self.vert_P.append(
                    jnp.asarray(_place_matrix(VPAD, [col], nd))
                )
            # one combined placement matrix G [K_total, nd]: block-rows =
            # interior P_I, per-face/edge single-code placement (or plain
            # placement for multi-code entries, whose orientation select is
            # applied to the rows first), per-vertex placement. ONE matmul
            # per direction instead of ~26 (each reading/writing a full
            # [Nc, ~128]-physical pass).
            self._multi_T = {}  # (kind, k) -> [(mask, T [w, w])]
            mf = m ** (d - 1)
            gblocks = []
            if m > 0:
                gblocks.append(np.asarray(self.P_I))
            from ..core.conn import local_edges_3d as _le3, local_faces as _lf

            if d >= 2 and m > 0:
                from ..core.conn import edge_canonical_pos as _ecp
                from ..core.conn import face_canonical_pos as _fcp

                for k, (a, s, uv) in enumerate(_lf(d)):
                    cols = face_cols(a, s)
                    o_arr = conn.face_orient[:, k]
                    codes = sorted(int(c) for c in np.unique(o_arr))
                    wf = _padw(mf)
                    if len(codes) == 1:
                        pos = (
                            _fcp(m, codes[0]).reshape(-1)
                            if d == 3
                            else _ecp(m, codes[0])
                        )
                        gblocks.append(_place_matrix(wf, cols, nd, perm=pos))
                    else:
                        gblocks.append(_place_matrix(wf, cols, nd))
                        Ts = []
                        for o in codes:
                            pos = (
                                _fcp(m, o).reshape(-1) if d == 3 else _ecp(m, o)
                            )
                            T = np.zeros((wf, wf))
                            for q in range(len(pos)):
                                T[int(pos[q]), q] = 1.0
                            Ts.append((
                                jnp.asarray(
                                    (o_arr == o).astype(np.float64).reshape(nc, 1)
                                ),
                                jnp.asarray(T),
                            ))
                        self._multi_T[("f", k)] = Ts
            if d == 3 and m > 0:
                from ..core.conn import edge_canonical_pos as _ecp

                we = _padw(m)
                for k, (a, fixed) in enumerate(_le3()):
                    cols = edge_cols(a, fixed)
                    fl = conn.edge_flip[:, k]
                    codes = sorted(int(c) for c in np.unique(fl))
                    if len(codes) == 1:
                        gblocks.append(_place_matrix(
                            we, cols, nd, perm=_ecp(m, codes[0])
                        ))
                    else:
                        gblocks.append(_place_matrix(we, cols, nd))
                        Ts = []
                        for o in codes:
                            pos = _ecp(m, o)
                            T = np.zeros((we, we))
                            for q in range(len(pos)):
                                T[int(pos[q]), q] = 1.0
                            Ts.append((
                                jnp.asarray(
                                    (fl == o).astype(np.float64).reshape(nc, 1)
                                ),
                                jnp.asarray(T),
                            ))
                        self._multi_T[("e", k)] = Ts
            for P in self.vert_P:
                gblocks.append(np.asarray(P))
            self.G = jnp.asarray(np.concatenate(gblocks, axis=0))
            self._block_widths = [g.shape[0] for g in gblocks]
            # v2 transpose-gather tables (cheap numpy; built eagerly so the
            # FUS_BLOCKED flag can select at apply time)
            # v3 super-row indices sit beside the v2 flat/incidence tables:
            # narrow row r of a w-wide table lives in L-lane wide row
            # r//R at position r%R (R = L//w narrow rows per super-row;
            # L = FUS_V3_LANES, default one 128-lane tile — read at BUILD
            # time; wider super-rows trade more gather bytes for higher
            # per-row throughput, sweep on chip via queue step I).
            # Gather side indexes the entity tables; scatter side indexes
            # the stacked-pieces array (via the incidence tables).
            lanes = int(os.environ.get("FUS_V3_LANES", "128"))
            self._v3 = {}  # class -> (R, idw_j, pos_j) gather side
            self._v3s = {}  # class -> (R, incW_j, posW_j) scatter side

            def _v2v3_tables(key, ids, n_entities, w):
                flat = ids.T.reshape(-1).astype(np.int64)
                inc = _incidence(ids, n_entities)
                R = max(1, lanes // w)
                self._v3[key] = (
                    R,
                    jnp.asarray((flat // R).astype(np.int32)),
                    jnp.asarray((flat % R).astype(np.int32)[:, None]),
                )
                self._v3s[key] = (
                    R,
                    jnp.asarray((inc // R).astype(np.int32)),
                    jnp.asarray((inc % R).astype(np.int32)),
                )
                return jnp.asarray(flat.astype(np.int32)), jnp.asarray(
                    inc.astype(np.int32)
                )

            if self.face_data:
                self.fids_flat_j, self.incF_j = _v2v3_tables(
                    "F", conn.face_ids, conn.num_faces, _padw(m ** (d - 1))
                )
            if self.edge_data:
                self.eids_flat_j, self.incE_j = _v2v3_tables(
                    "E", conn.edge_ids, conn.num_edges, _padw(m)
                )
            self.cells_flat_j, self.incV_j = _v2v3_tables(
                "V", np.asarray(mesh.cells), mesh.num_vertices, VPAD
            )

            # CLASS-BATCHED orientation transforms (round 5): the per-
            # (slot, code) masked matmuls of ``_oriented`` compile to
            # ~200-400 HLO ops per class on a scrambled mesh (up to 8 face
            # codes x 6 slots x ~4 ops, twice per apply) — the traced
            # unstructured step ran 2915 device ops and was DISPATCH bound
            # (benchmarks/unstructured_trace.py).  The same math in TWO
            # MXU-shaped einsums per class: rows [r, w] x T-stack
            # [w, ncode·w] -> [r, ncode, w], then a one-hot code-select
            # contraction.  Bit-identical (inactive one-hot terms are exact
            # zeros; the dot products are unchanged).  Slots whose
            # orientation is uniform across cells keep their permutation
            # folded into the placement matrix G (code 0 = identity).
            def _cls_orient(kind, nslots, orient_arr, canon_pos, w):
                Ts = [np.eye(w)]
                code_of = {}
                sel_idx = np.zeros((nslots, nc), np.int64)
                for k in range(nslots):
                    if (kind, k) not in self._multi_T:
                        continue  # perm folded into G — identity here
                    col = orient_arr[:, k]
                    for o in sorted(int(c) for c in np.unique(col)):
                        if o not in code_of:
                            pos = canon_pos(o)
                            T = np.zeros((w, w))
                            for q in range(len(pos)):
                                T[int(pos[q]), q] = 1.0
                            code_of[o] = len(Ts)
                            Ts.append(T)
                    sel_idx[k] = np.vectorize(code_of.__getitem__)(col)
                if not code_of:
                    return None
                ncode = len(Ts)
                sel = np.zeros((nslots * nc, ncode), np.float32)
                sel[np.arange(nslots * nc), sel_idx.reshape(-1)] = 1.0
                return (
                    jnp.asarray(np.stack(Ts)),
                    jnp.asarray(sel),
                )

            self._cls_T = {}
            if self.face_data:
                from ..core.conn import edge_canonical_pos as _ecp2
                from ..core.conn import face_canonical_pos as _fcp2

                wf = _padw(m ** (d - 1))
                canon = (
                    (lambda o: _fcp2(m, o).reshape(-1))
                    if d == 3
                    else (lambda o: _ecp2(m, o))
                )
                ent = _cls_orient(
                    "f", len(self.face_data), conn.face_orient, canon, wf
                )
                if ent is not None:
                    self._cls_T["f"] = ent
            if self.edge_data:
                from ..core.conn import edge_canonical_pos as _ecp3

                we = _padw(m)
                ent = _cls_orient(
                    "e", len(self.edge_data), conn.edge_flip,
                    lambda o: _ecp3(m, o), we,
                )
                if ent is not None:
                    self._cls_T["e"] = ent

    # ------------------------------------------------------------- tables
    def _entity_tables(self, x):
        """Lane-padded 2D entity tables (xF [Nf, wf], xE [Ne, we],
        xV [Nv, VPAD]) from a blocked global vector."""
        d, m = self.d, self.m
        off = self.off
        xF = xE = None
        if d >= 2 and m > 0:
            mf = m ** (d - 1)
            t = x[off["F"] : off["E"]].reshape(-1, mf)
            xF = jnp.pad(t, ((0, 0), (0, _padw(mf) - mf)))
        if d == 3 and m > 0:
            t = x[off["E"] : off["V"]].reshape(-1, m)
            xE = jnp.pad(t, ((0, 0), (0, _padw(m) - m)))
        xV = jnp.pad(x[off["V"] :][:, None], ((0, 0), (0, VPAD - 1)))
        return xF, xE, xV

    @staticmethod
    def _mm(a, b):
        return jnp.dot(a, b, precision=_PREC, preferred_element_type=a.dtype)

    def _oriented_class(self, rows, kind, transpose=False):
        """Orientation transform for a WHOLE entity class at once
        (``rows`` [ns, nc, w]): two einsums replace the per-(slot, code)
        masked-matmul loop of ``_oriented`` — same dot products, exact
        zeros for inactive codes, ~200 fewer HLO ops per class per apply.
        Identity when no slot of the class is multi-oriented."""
        ent = self._cls_T.get(kind)
        if ent is None:
            return rows
        Tst, sel = ent
        dt = rows.dtype
        ns, nc, w = rows.shape
        r2 = rows.reshape(ns * nc, w)
        T = (jnp.swapaxes(Tst, 1, 2) if transpose else Tst).astype(dt)
        tmp = jnp.einsum("rv,cvw->rcw", r2, T, precision=_PREC)
        out = jnp.einsum("rcw,rc->rw", tmp, sel.astype(dt), precision=_PREC)
        return out.reshape(ns, nc, w)

    def _oriented(self, rows, kind, k, transpose=False):
        """Apply the (rare) multi-orientation column permutation to gathered
        rows (or its transpose on the scatter side); identity when the
        entity's orientation is uniform across cells."""
        Ts = self._multi_T.get((kind, k))
        if Ts is None:
            return rows
        dt = rows.dtype
        out = None
        for mask, T in Ts:
            piece = self._mm(rows, (T.T if transpose else T).astype(dt))
            piece = mask.astype(dt) * piece
            out = piece if out is None else out + piece
        return out

    # -------------------------------------------------------------- gather
    def gather(self, x: jnp.ndarray) -> jnp.ndarray:
        """Blocked global vector [ndofs] → cell array [Nc, N, .., N]:
        entity-row gathers → ONE combined placement matmul."""
        d, N, m, nc, nd = self.d, self.N, self.m, self.nc, self.nd
        off = self.off
        xF, xE, xV = self._entity_tables(x)
        pieces = []
        if m > 0:
            pieces.append(x[off["I"] : off["F"]].reshape(nc, m**d))
        mode = _mode()
        if mode in ("v2", "v3"):
            # ONE row gather per entity class (slot-major), sliced per slot;
            # v3 routes the gather through 128-lane super-rows
            def _rows(t, flat, key, ns):
                if mode == "v3":
                    R, idw, pos = self._v3[key]
                    return wide_gather(t, idw, pos, R).reshape(
                        ns, nc, -1
                    )
                return t[flat].reshape(ns, nc, -1)

            if self.face_data:
                rows = _rows(xF, self.fids_flat_j, "F", len(self.face_data))
                pieces.extend(self._oriented_class(rows, "f"))
            if self.edge_data:
                rows = _rows(xE, self.eids_flat_j, "E", len(self.edge_data))
                pieces.extend(self._oriented_class(rows, "e"))
            rows = _rows(xV, self.cells_flat_j, "V", 2**d)
            for v in range(2**d):
                pieces.append(rows[v])
        else:
            for k in range(len(self.face_data)):
                pieces.append(
                    self._oriented(xF[self.fids_j[:, k]], "f", k)
                )
            for k in range(len(self.edge_data)):
                pieces.append(
                    self._oriented(xE[self.eids_j[:, k]], "e", k)
                )
            for v in range(2**d):
                pieces.append(xV[self.cells_j[:, v]])
        big = jnp.concatenate(pieces, axis=1)
        xc = self._mm(big, self.G.astype(x.dtype))
        return xc.reshape((nc,) + (N,) * d)

    # ------------------------------------------------------------- scatter
    def scatter(self, yc: jnp.ndarray) -> jnp.ndarray:
        """Cell array [Nc, N^d] → additively assembled blocked global
        vector [ndofs] — the exact transpose of ``gather``."""
        d, N, m, nc, nd = self.d, self.N, self.m, self.nc, self.nd
        off = self.off
        yc2 = yc.reshape(nc, nd)
        dt = yc2.dtype
        big = self._mm(yc2, self.G.astype(dt).T)
        splits = np.cumsum(self._block_widths)[:-1]
        chunks = jnp.split(big, splits, axis=1)
        i = 0
        parts = []
        if m > 0:
            parts.append(chunks[i].reshape(-1))
            i += 1
        else:
            parts.append(jnp.zeros((0,), dt))
        mode = _mode()
        v2 = mode in ("v2", "v3")

        def _assemble_v2(pieces, inc_j, key):
            """Transpose-gather: stack per-slot pieces (+ a zeros pad row,
            the incidence padding target), then K row gathers + adds per
            entity — no scatter-add. v3 routes each gather through
            128-lane super-rows."""
            rows = jnp.concatenate(
                pieces + [jnp.zeros((1, pieces[0].shape[1]), dt)], axis=0
            )
            if mode == "v3":
                R, incW, posW = self._v3s[key]
                out = None
                for j in range(incW.shape[1]):
                    ext = wide_gather(
                        rows, incW[:, j], posW[:, j : j + 1], R
                    )
                    out = ext if out is None else out + ext
                return out
            out = rows[inc_j[:, 0]]
            for j in range(1, inc_j.shape[1]):
                out = out + rows[inc_j[:, j]]
            return out

        if self.face_data:
            mf = m ** (d - 1)
            nf = (off["E"] - off["F"]) // mf
            nsf = len(self.face_data)
            ps = list(
                self._oriented_class(
                    jnp.stack(chunks[i : i + nsf]), "f", transpose=True
                )
            )
            i += nsf
            if v2:
                yF = _assemble_v2(ps, self.incF_j, 'F')
            else:
                yF = jnp.zeros((nf, _padw(mf)), dt)
                for k, piece in enumerate(ps):
                    yF = yF.at[self.fids_j[:, k]].add(piece)
            parts.append(yF[:, :mf].reshape(-1))
        if self.edge_data:
            ne = (off["V"] - off["E"]) // m
            nse = len(self.edge_data)
            ps = list(
                self._oriented_class(
                    jnp.stack(chunks[i : i + nse]), "e", transpose=True
                )
            )
            i += nse
            if v2:
                yE = _assemble_v2(ps, self.incE_j, 'E')
            else:
                yE = jnp.zeros((ne, _padw(m)), dt)
                for k, piece in enumerate(ps):
                    yE = yE.at[self.eids_j[:, k]].add(piece)
            parts.append(yE[:, :m].reshape(-1))
        nv = self.space.mesh.num_vertices
        ps = [chunks[i + v] for v in range(2**d)]
        i += 2**d
        if v2:
            yV = _assemble_v2(ps, self.incV_j, 'V')
        else:
            yV = jnp.zeros((nv, VPAD), dt)
            for v, piece in enumerate(ps):
                yV = yV.at[self.cells_j[:, v]].add(piece)
        parts.append(yV[:, 0])
        return jnp.concatenate(parts)
