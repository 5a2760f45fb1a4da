"""Shared base for the spectral wave models.

Handles what every model in the reference package repeats per class
(``python/src/fenicsxfus/_linear.py``, ``_lossy.py``, ``_westervelt.py``):
material coefficients (scalar or cell-wise DG-0), the windowed transducer
source g(t) and its derivative on facet tag 1, the Sommerfeld ABC on facet
tag 2, and the explicit-RK / DIRK drivers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.operators import SEMOperators
from .common import dirk_tables, source_window, step_sizes


def _cellwise(val, num_cells):
    """DG-0 coefficient as a float64 numpy [Nc] array."""
    arr = np.asarray(val, dtype=np.float64)
    if arr.ndim == 0:
        return np.full(num_cells, float(arr))
    assert arr.shape == (num_cells,)
    return arr


def source_amplitudes(consts: dict, t):
    """g(t), dg/dt(t) for the windowed CW transducer drive — pure function of
    the scalar consts (reference ``_lossy.py:169-189``)."""
    win, dwin = source_window(t, consts["freq"], consts["alpha"])
    p0, w0, s0 = consts["p0"], consts["w0"], consts["s0"]
    amp = p0 * w0 / s0
    g = win * amp * jnp.cos(w0 * t)
    dg = dwin * amp * jnp.cos(w0 * t) - win * p0 * w0**2 / s0 * jnp.sin(w0 * t)
    return g, dg


class SpectralModelBase:
    """Common state: operators, coefficients, source, u_n/v_n storage."""

    SOURCE_TAG = 1
    ABC_TAG = 2

    def __init__(self, mesh, meshtags, degree, freq0, p0, s0, dt, dtype):
        if meshtags is not None:
            mesh.facet_tags = dict(meshtags)
        self.mesh = mesh
        self.degree = degree
        self.dtype = dtype
        self.freq = float(freq0)
        self.w0 = 2.0 * np.pi * self.freq
        self.p0 = float(p0)
        self.s0 = float(s0)
        self.T = 1.0 / self.freq
        self.alpha = 4.0  # source window length in periods (reference default)
        self.dt = float(dt)
        self.ops = SEMOperators(mesh, degree, dtype)
        self.u_n = jnp.zeros(self.ops.ndofs, dtype)
        self.v_n = jnp.zeros(self.ops.ndofs, dtype)
        self.t = 0.0

    # -- source -----------------------------------------------------------
    def base_consts(self) -> dict:
        """Scalar constants every model's pure slope function needs."""
        return {
            "freq": self.freq,
            "w0": self.w0,
            "p0": self.p0,
            "s0": self.s0,
            "alpha": self.alpha,
        }

    def source_amplitudes(self, t):
        """g(t), dg/dt(t): windowed CW drive (reference ``_lossy.py:169-189``)."""
        return source_amplitudes(self.base_consts(), t)

    def init(self):
        """Zero initial conditions (reference ``init()``)."""
        self.u_n = jnp.zeros(self.ops.ndofs, self.dtype)
        self.v_n = jnp.zeros(self.ops.ndofs, self.dtype)
        return self

    def number_of_dofs(self) -> int:
        return self.ops.ndofs


    def sensor_indices(self, points) -> np.ndarray:
        """Nearest-DOF indices for sensor ``points`` [dim, n]. On the
        structured meshes used by the benchmark drivers the sensors are
        placed on lattice nodes, so this is exact. Lattice meshes snap in
        O(n) closed form per axis; unstructured meshes use a KD-tree (the
        round-1 brute-force distance scan cost ~30 s per call at 2M DOF on
        this single-core host — longer than the runs it instrumented)."""
        pts = np.asarray(points, np.float64)
        lat = getattr(self.ops, "lattice", None)
        mesh = self.mesh
        if lat is not None and mesh.grid_shape is not None:
            from ..core.gll import gll_points_weights_01

            hyb = getattr(self.ops, "hybrid", None)
            # hybrid (bowl-deformed) lattices: the closed-form snap must use
            # the UNIFORM box origin, not vertices.min() — the pulled-back
            # cap shifts the min by a full sagitta (~1.3 cells), silently
            # displacing every sensor (caught by the O'Neil gate).
            lo = (
                np.asarray(mesh.uniform_box[0])
                if hyb is not None
                else mesh.vertices.min(axis=0)
            )
            gll, _ = gll_points_weights_01(lat.N)
            d = mesh.dim
            per_axis = []
            for a in range(d):
                xi = (pts[a] - lo[a]) / lat.h[a]
                cell = np.clip(np.floor(xi).astype(np.int64), 0, lat.grid[a] - 1)
                loc = np.clip(xi - cell, 0.0, 1.0)
                node = np.argmin(np.abs(loc[:, None] - gll[None, :]), axis=1)
                per_axis.append(cell * lat.p + node)
            idx = np.ravel_multi_index(per_axis, lat.gdims)
            if hyb is not None:
                # inside the deformed band the logical lattice positions
                # are not the physical node positions — refine those points
                # against the TRUE node coordinates of the band cells only
                # (O(band) memory; never materializes global dof_coords)
                depth = lo[0] + hyb["bx"] * lat.h[0]
                inside = pts[0] < depth
                if inside.any():
                    from ..core.space import cell_node_coords

                    nb = hyb["nb"]
                    dofs_b = np.asarray(
                        self.ops.space.dofmap_for_cells(np.arange(nb))
                    ).reshape(-1)
                    coords_b = cell_node_coords(
                        mesh, lat.N, cells=np.arange(nb)
                    ).reshape(-1, mesh.dim)
                    sub = pts[:, inside].T
                    try:
                        from scipy.spatial import cKDTree

                        q = cKDTree(coords_b).query(sub)[1]
                    except ImportError:
                        q = np.array([
                            np.argmin(np.sum((coords_b - s) ** 2, axis=1))
                            for s in sub
                        ])
                    idx[inside] = dofs_b[q]
            return idx
        try:
            from scipy.spatial import cKDTree

            tree = cKDTree(self.ops.dof_coords())
            return tree.query(pts.T)[1].astype(np.int64)
        except ImportError:
            coords = self.ops.dof_coords()  # [ndofs, dim]
            idx = np.empty(pts.shape[1], np.int64)
            for j in range(pts.shape[1]):
                d2 = np.sum((coords - pts[:, j][None, :]) ** 2, axis=1)
                idx[j] = int(np.argmin(d2))
            return idx

    def _locate_sensors(self, points):
        """(cells, xi) for sensor points on any mesh type: closed form on
        uniform lattices, Newton inverse-map (``compute_eval_params``)
        elsewhere — including the deformed band of hybrid bowl lattices,
        where logical lattice positions are not physical positions."""
        from ..utils import compute_eval_params

        pts = np.asarray(points, np.float64)
        n = pts.shape[1]
        lat = getattr(self.ops, "lattice", None)
        mesh = self.mesh
        if lat is not None and mesh.grid_shape is not None:
            hyb = getattr(self.ops, "hybrid", None)
            lo = (
                np.asarray(mesh.uniform_box[0])
                if hyb is not None
                else mesh.vertices.min(axis=0)
            )
            d = mesh.dim
            cell_ax, xi_ax = [], []
            for a in range(d):
                s = (pts[a] - lo[a]) / lat.h[a]
                c = np.clip(np.floor(s).astype(np.int64), 0, lat.grid[a] - 1)
                cell_ax.append(c)
                xi_ax.append(np.clip(s - c, 0.0, 1.0))
            cells = np.ravel_multi_index(cell_ax, lat.grid)
            xis = np.stack(xi_ax, axis=1)
            if hyb is not None:
                depth = lo[0] + hyb["bx"] * lat.h[0]
                inside = pts[0] < depth
                if inside.any():
                    _, fc, fx = compute_eval_params(mesh, pts[:, inside])
                    if len(fc) != int(inside.sum()):
                        raise ValueError("sensor point outside the mesh")
                    cells[inside] = fc
                    xis[inside] = fx
            return cells, xis
        _, fc, fx = compute_eval_params(mesh, pts)
        if len(fc) != n:
            raise ValueError(
                f"{n - len(fc)} sensor point(s) lie outside the mesh"
            )
        return fc, fx

    def sensor_interp_tables(self, points):
        """Interpolating sensor-extraction tables: (rows [n, N**d] flat DOF
        indices, wts [n, N**d]). True ``Function.eval`` semantics for
        off-node sensors (the reference interpolates,
        ``cpp/mwe/parallel_eval_line/main.cpp:49-107``); the weight row of a
        node-aligned sensor is exactly one-hot, which ``_record_plan``
        detects to fall back to the cheaper proven nearest-DOF gather."""
        from ..core.gll import lagrange_eval_gll

        cells, xis = self._locate_sensors(points)
        rows = np.asarray(
            self.ops.space.dofmap_for_cells(cells), np.int64
        ).reshape(len(cells), -1)
        N = self.ops.N
        w = lagrange_eval_gll(N, xis[:, 0])
        for a in range(1, xis.shape[1]):
            t = lagrange_eval_gll(N, xis[:, a])
            w = (w[:, :, None] * t[:, None, :]).reshape(len(cells), -1)
        return rows, w

    def _record_plan(self, points):
        """(cache key, per-step extractor) for in-scan recording. Sensors
        that all sit on DOF nodes (every benchmark driver) keep the proven
        nearest-DOF gather; anything off-node gets exact interpolation
        instead of the silent snap-to-node phase error (~2pi*offset/lambda
        per sensor) the round-2 recording had."""
        rows, wts = self.sensor_interp_tables(points)
        amax = np.abs(wts).max(axis=1)
        if np.all(amax >= 1.0 - 1e-9):
            idx = rows[np.arange(len(rows)), np.abs(wts).argmax(axis=1)]
            return idx.tobytes(), self._sensor_extractor(idx)
        key = rows.tobytes() + wts.tobytes()
        return key, self._sensor_extractor_interp(rows, wts)

    def _sensor_extractor_interp(self, rows: np.ndarray, wts: np.ndarray):
        """Interpolating extraction with the same static bounding-box slice
        as ``_sensor_extractor`` (a raw scalar gather from the full field
        lowers near-serially on TPU)."""
        import jax.numpy as _jnp

        wj = _jnp.asarray(wts, self.dtype)
        lat = getattr(self.ops, "lattice", None)
        if lat is None:
            rj = _jnp.asarray(rows.astype(np.int32))
            return lambda u: (u.reshape(-1)[rj] * wj).sum(axis=-1)
        gdims = lat.gdims
        i3 = np.unravel_index(rows.reshape(-1), gdims)
        lo = [int(i.min()) for i in i3]
        hi = [int(i.max()) + 1 for i in i3]
        box = tuple(h - lo_a for lo_a, h in zip(lo, hi))
        flat_box = np.ravel_multi_index(
            [i - lo_a for i, lo_a in zip(i3, lo)], box
        )
        flat_box = _jnp.asarray(flat_box.astype(np.int32).reshape(rows.shape))
        sl = tuple(slice(lo_a, h) for lo_a, h in zip(lo, hi))

        def extract(u):
            return (u.reshape(gdims)[sl].reshape(-1)[flat_box] * wj).sum(-1)

        return extract

    def _sensor_extractor(self, idx: np.ndarray):
        """TPU-cheap per-step sensor extraction: slice the static bounding
        box of the sensor lattice coordinates first (an axial sensor line is
        a [G0, 1, 1] column), then gather within the tiny box. A raw scalar
        gather from the full field lowers near-serially on TPU — measured
        37x slower than the whole fused RK4 step it instruments."""
        import jax.numpy as _jnp

        lat = getattr(self.ops, "lattice", None)
        if lat is None:
            idxj = _jnp.asarray(np.asarray(idx, np.int32))
            return lambda u: u.reshape(-1)[idxj]
        gdims = lat.gdims
        i3 = np.unravel_index(np.asarray(idx, np.int64), gdims)
        lo = [int(i.min()) for i in i3]
        hi = [int(i.max()) + 1 for i in i3]
        box = tuple(h - lo_a for lo_a, h in zip(lo, hi))
        flat_box = np.ravel_multi_index(
            [i - lo_a for i, lo_a in zip(i3, lo)], box
        )
        flat_box = _jnp.asarray(flat_box.astype(np.int32))
        sl = tuple(slice(lo_a, h) for lo_a, h in zip(lo, hi))

        def extract(u):
            return u.reshape(gdims)[sl].reshape(-1)[flat_box]

        return extract


class ExplicitModelBase(SpectralModelBase):
    """Explicit-RK models: subclasses define ``rhs(t, u, v) -> (ku, kv)``."""

    def __init__(self, mesh, meshtags, degree, freq0, p0, s0, rk_order, dt, dtype):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, dt, dtype)
        self.rk_order = int(rk_order)
        # ``consts``: every device array / scalar the pure slope function
        # needs. Kept in one dict so the sharded solver (parallel/slab.py)
        # can re-slice them per device and run the *identical* physics.
        self.consts: dict = {}
        self._solve = None  # built lazily after subclass setup

    def _make_step(self):
        """The per-step function: the fused pallas stage when available,
        else the reference a-vector RK step over ``rhs_pure``."""
        from .common import make_rk_step

        fused = self._try_fused_step()
        if fused is not None:
            return fused
        ops = self.ops
        if hasattr(type(self), "rhs_pure"):
            rhs_pure = type(self).rhs_pure
            rhs = lambda consts, t, u, v: rhs_pure(ops, consts, t, u, v)  # noqa: E731
        else:
            # models with instance-level rhs (e.g. the Gauss-quadrature
            # LinearExplicit): consts stay closed over — acceptable at the
            # small scales these are used at
            rhs = lambda consts, t, u, v: self.rhs(t, u, v)  # noqa: E731
        return make_rk_step(rhs, self.rk_order)

    def _build(self):
        from .common import make_scan_from_step

        self._solve = make_scan_from_step(self._make_step(), self.dtype)

    def _try_build_fused(self):
        """Fused solve, or None (kept for tests/introspection)."""
        from .common import make_scan_from_step

        step = self._try_fused_step()
        return None if step is None else make_scan_from_step(step, self.dtype)

    def _try_fused_step(self):
        """Fully-fused Pallas RK stage (see ``ops/pallas_stage.py``): used
        when the model declares ``FUSED_KIND`` on its own class, the pallas
        lattice path is active, and all required consts are packed.
        FUS_FUSED=0 forces the reference (unfused) scan."""
        import os

        kind = type(self).__dict__.get("FUSED_KIND")
        pk = getattr(self.ops, "pallas2", None)
        if not kind or pk is None or os.environ.get("FUS_FUSED", "") == "0":
            return None
        hyb = getattr(self.ops, "hybrid", None)
        if hyb is not None and (
            os.environ.get("FUS_STAGE_V3", "1") == "0"
            or os.environ.get("FUS_HYBRID_FUSED", "1") == "0"
        ):
            # hybrid (bowl-deformed) meshes fuse only via the v3 stage's
            # band operand; the legacy A/B stage pair has no injection
            # point — fall back to the unfused scan there (or when the
            # hybrid fusion is explicitly disabled).
            return None
        from ..ops.pallas_stage import (
            KIND_DENSE,
            KIND_FACET,
            FusedRKStage,
            pack_facet_vector,
        )
        from .common import explicit_tables, make_scan_from_step

        keys = type(self).STIFF_KEYS
        dense_keys = KIND_DENSE[kind]
        facet_keys = KIND_FACET[kind]
        Fs = [self.consts.get(k) for k in keys]
        if not all(isinstance(F, dict) for F in Fs):
            return None
        if hyb is not None:
            # prepared hybrid coeffs: {"hyb_u": packed uniform part,
            # "hyb_b": slab DG-0 coeff, "hyb_G": G-correction tensor}
            if not all("hyb_u" in F and isinstance(F["hyb_u"], dict)
                       for F in Fs):
                return None
            Fs = [F["hyb_u"] for F in Fs]
        if not all(k in self.consts for k in dense_keys + facet_keys):
            return None
        # pack the facet vectors once (host-side); any interior support
        # means the model isn't in the pure boundary-term family → unfused
        for k in facet_keys:
            pf_key = k + "__pf"
            if pf_key not in self.consts:
                # ops.np_of: assembly-time host mirror — a plain np.asarray
                # here reads ~300 MB back over the relay (30 s–4 min each;
                # the dominant cost of bench rung setup before round 5)
                packed = pack_facet_vector(
                    self.ops.np_of(self.consts[k]), pk.gdims
                )
                if packed is None:
                    return None
                self.consts[pf_key] = {
                    n: jnp.asarray(v, self.dtype) for n, v in packed.items()
                }
        hetero = [F["F0"].shape[0] != 1 for F in Fs]
        # v3 single-pass stage is the production path: 2.38 vs 2.01
        # GDOF-RK4-steps/s at the 72.5M-DOF headline. FUS_STAGE_V3=0 pins
        # the legacy two-kernel stage.
        stage_cls = FusedRKStage
        if os.environ.get("FUS_STAGE_V3", "1") != "0":
            from ..ops.pallas_stage_v3 import FusedRKStageV3

            stage_cls = FusedRKStageV3
        # wavefront step (ONE kernel per RK4 step, ops/pallas_step_wave.py):
        # opt-in via FUS_STEP_WAVE=1 pending on-chip validation. Four-stage
        # tables and non-hybrid meshes only; falls back to v3 otherwise.
        sep_invm = False
        if (
            stage_cls is not FusedRKStage
            and hyb is None
            and self.rk_order == 4
            and os.environ.get("FUS_STEP_WAVE", "") == "1"
        ):
            from ..ops.pallas_step_wave import (
                FusedRKStepWave,
                try_separate_field,
            )

            wave = FusedRKStepWave(
                pk, kind, hetero, explicit_tables(self.rk_order), self.dtype
            )
            # inv_m is rank-1 (1D GLL mass products) on uniform homogeneous
            # lattices — pass it as (row-scale, plane) so the wave kernel
            # skips its dense ring+window (the VMEM that decides 417^3 fit)
            if dense_keys == ("inv_m",):
                sep = try_separate_field(
                    self.ops.np_of(self.consts["inv_m"]), pk.gdims
                )
                if sep is not None:
                    self.consts["inv_m__sep0"] = jnp.asarray(
                        sep[0], self.dtype
                    )
                    self.consts["inv_m__sepP"] = jnp.asarray(
                        sep[1], self.dtype
                    )
                    wave.sep_invm = sep_invm = True
            if wave.usable():
                stage_cls = FusedRKStepWave
        stage = stage_cls(
            pk, kind, hetero, explicit_tables(self.rk_order), self.dtype
        )
        from ..ops.pallas_stage_v3 import FusedRKStageV3 as _V3
        from ..ops.pallas_step_wave import FusedRKStepWave as _Wave

        if isinstance(stage, _V3) and not isinstance(stage, _Wave):
            # the v3 stage's VMEM window budget can be exceeded outright
            # (p>=5 on ~550^2 planes): fall back to the unfused scan
            # instead of letting Mosaic OOM at compile time
            if not stage.usable(band=hyb is not None):
                return None

        if isinstance(stage, _Wave) and sep_invm:
            stage.sep_invm = True
            dense_get = lambda c: [c["inv_m__sep0"], c["inv_m__sepP"]]  # noqa: E731
        else:
            dense_get = lambda c: [c[k] for k in dense_keys]  # noqa: E731
        if hyb is None:
            return stage.make_step(
                lambda c: [c[k] for k in keys],
                lambda c: (
                    dense_get(c),
                    [c[k + "__pf"] for k in facet_keys],
                ),
            )

        # hybrid (bowl-deformed) mesh: the v3 stage applies the packed
        # UNIFORM-lattice coefficients in-kernel and adds the deformed-slab
        # correction K_{coeff·(G_cell − G_uni)} computed here in XLA from
        # the slab rows of the stage fields (same recurrence as
        # FusedRKStage._stage_fields)
        ops_ = self.ops
        sx = hyb["slab_x"]
        nfields = len(keys)
        dtype = self.dtype
        gdims = pk.gdims

        def band_fn(c, u0, v0, kvp, kvpp, alpha, beta):
            un = u0[:sx] + alpha * v0[:sx]
            if kvpp is not None:
                un = un + beta * kvpp[:sx]
            vn = v0[:sx] + alpha * kvp[:sx] if kvp is not None else v0[:sx]
            cs = [c[k] for k in keys]
            rows = ops_.band_correction_rows(
                [un, vn][:nfields],
                [cc["hyb_b"] for cc in cs],
                cs[0]["hyb_G"],
            )
            return jnp.zeros(gdims, dtype).at[:sx].set(rows)

        return stage.make_step(
            lambda c: [c[k]["hyb_u"] for k in keys],
            lambda c: (
                [c[k] for k in dense_keys],
                [c[k + "__pf"] for k in facet_keys],
            ),
            band_fn=band_fn,
        )

    def rhs(self, t, u, v):
        return type(self).rhs_pure(self.ops, self.consts, t, u, v)

    def f0(self, t, u, v):
        return v

    def f1(self, t, u, v):
        return self.rhs(t, u, v)[1]

    def rk(self, t0: float, tf: float):
        if self._solve is None:
            self._build()
        u, v, t = self._solve(self.consts, self.u_n, self.v_n, t0, tf, self.dt)
        self.u_n, self.v_n, self.t = u, v, float(t)
        return self.u_n, self.v_n, self.t

    # -- in-scan sensor recording ------------------------------------------

    def rk_record(self, t0: float, tf: float, points):
        """Time-march like ``rk`` while recording u(t) at sensor ``points``
        every step, device-side inside the scan (reference workflow records
        nothing in-run and evaluates only the final state; sensor *time
        series* are what PH1/MENDOUSSE actually analyse). Returns
        (u, v, t, times [n_steps], ys [n_steps, n_sensors])."""
        from .common import make_recording_scan, step_sizes

        # cache the compiled recording scan per sensor set: rebuilding the
        # jit closure per call recompiles the whole fused program (~40 s at
        # production sizes) — 30x the cost of actually running it
        key, extractor = self._record_plan(points)
        cache = getattr(self, "_rec_solves", None)
        if cache is None:
            cache = self._rec_solves = {}
        solve = cache.get(key)
        if solve is None:
            solve = make_recording_scan(self._make_step(), self.dtype, extractor)
            cache[key] = solve
        u, v, t, ys = solve(self.consts, self.u_n, self.v_n, t0, tf, self.dt)
        dts = step_sizes(t0, tf, self.dt)
        times = t0 + np.cumsum(dts)
        self.u_n, self.v_n, self.t = u, v, float(t)
        return u, v, float(t), times, ys


class ImplicitModelBase(SpectralModelBase):
    """SDIRK models: subclasses provide pure static functions over a
    ``consts`` pytree (passed as jit arguments, same rationale as the
    explicit models):

    * ``lhs_pure(ops, consts, tau, x) -> A x``   (A = M + τ-terms)
    * ``lhs_diag_pure(ops, consts, tau)``        (diag(A), Jacobi)
    * ``rhs_stage(ops, consts, tau, t, u, v) -> b``

    The instance methods ``lhs``/``lhs_diag``/``rhs`` remain as thin
    wrappers for direct use.
    """

    def __init__(self, mesh, meshtags, degree, freq0, p0, s0, rk_order, dt, dtype,
                 cg_rtol=1e-8, cg_maxiter=2000):
        super().__init__(mesh, meshtags, degree, freq0, p0, s0, dt, dtype)
        self.rk_order = int(rk_order)
        self.A_tab, self.b_tab, self.c_tab = dirk_tables(self.rk_order)
        self.cg_rtol = cg_rtol
        self.cg_maxiter = cg_maxiter
        self.consts: dict = {}
        self._run = None

    def lhs(self, tau, x):
        return type(self).lhs_pure(self.ops, self.consts, tau, x)

    def lhs_diag(self, tau):
        return type(self).lhs_diag_pure(self.ops, self.consts, tau)

    def rhs(self, tau, t, u, v):
        return type(self).rhs_stage(self.ops, self.consts, tau, t, u, v)

    def _build_run(self):
        import jax

        from ..ops.cg import cg_solve

        A_tab, b_tab, c_tab = self.A_tab, self.b_tab, self.c_tab
        n = len(b_tab)
        ops = self.ops
        cls = type(self)
        rtol, maxiter = self.cg_rtol, self.cg_maxiter

        def step(consts, carry, dtn):
            u0, v0, t = carry
            tau = dtn * A_tab[0][0]
            dinv = 1.0 / cls.lhs_diag_pure(ops, consts, tau)
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
                    rtol=rtol, maxiter=maxiter,
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

        extract = getattr(self, "_rec_extract", None)

        @jax.jit
        def run(consts, u, v, t0v, xs):
            def body(carry, x):
                dtn, tn = x  # tn: exact host-precomputed step start time
                u_, v_, _ = carry
                out, stats = step(consts, (u_, v_, tn), dtn)
                if extract is not None:
                    # one row per step: [it_max, res_max, sensors...] — the
                    # segmented runner collects a single array
                    y = extract(out[0]).astype(stats.dtype)
                    return out, jnp.concatenate([stats, y])
                return out, stats

            (u, v, t), ys = jax.lax.scan(body, (u, v, t0v), xs)
            return u, v, t, ys

        return run

    def dirk(self, t0: float, tf: float):
        """Time-march with SDIRK; surfaces worst-case CG iterations/residual
        over the run as ``self.cg_stats`` (the PETSc-KSP-convergence analogue
        the round-1 driver silently dropped) and warns if any stage solve hit
        ``cg_maxiter``."""
        import warnings

        from .common import run_segmented

        if self._run is None:
            self._run = self._build_run()
        dts = np.asarray(step_sizes(t0, tf, self.dt))
        u, v, t, stats = run_segmented(
            self._run, self.consts, self.u_n, self.v_n, t0, dts, self.dtype,
            collect_ys=True,
        )
        it_max = int(np.max(stats[:, 0]))
        res_max = float(np.max(stats[:, 1]))
        self.cg_stats = {"max_iterations": it_max, "max_residual2": res_max}
        if it_max >= self.cg_maxiter:
            warnings.warn(
                f"DIRK stage CG hit maxiter={self.cg_maxiter} "
                f"(worst final ||r||^2 = {res_max:.3e}) — solution suspect",
                stacklevel=2,
            )
        self.u_n, self.v_n, self.t = u, v, float(t)
        return self.u_n, self.v_n, self.t

    def dirk_record(self, t0: float, tf: float, points):
        """``dirk`` + device-side per-step sensor recording (the implicit
        counterpart of ``ExplicitModelBase.rk_record``). Returns
        (u, v, t, times [n_steps], ys [n_steps, n_sensors])."""
        from .common import run_segmented

        key, extractor = self._record_plan(points)
        cache = getattr(self, "_rec_runs", None)
        if cache is None:
            cache = self._rec_runs = {}
        run = cache.get(key)
        if run is None:
            self._rec_extract = extractor
            run = self._build_run()
            del self._rec_extract
            cache[key] = run
        dts = np.asarray(step_sizes(t0, tf, self.dt))
        u, v, t, rows = run_segmented(
            run, self.consts, self.u_n, self.v_n, t0, dts, self.dtype,
            collect_ys=True,
        )
        rows = np.asarray(rows)
        self.cg_stats = {
            "max_iterations": int(np.max(rows[:, 0])),
            "max_residual2": float(np.max(rows[:, 1])),
        }
        times = t0 + np.cumsum(dts)
        self.u_n, self.v_n, self.t = u, v, float(t)
        return u, v, float(t), times, rows[:, 2:]
