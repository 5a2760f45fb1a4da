"""Fused Pallas lattice stiffness, v2: banded K1 matmuls + in-kernel fold.

Replaces ``ops/pallas_stiffness.py`` (v1) as the TPU hot path. What changed
and why (measured on v5e; see ``benchmarks/operator_timings_v5e.txt``):

* v1 did the textbook sum-factorised chain (B, scale, Bᵀ) with tiny window
  matmuls (M=40, K=33 at p=4) — <10% MXU utilisation — and left the
  perpendicular scaling + 3-axis accumulation to XLA as extra full-volume
  HBM passes. It measured ~20-24 ms per apply at 38.3M DOF.
* v2 exploits that the GLL weight along the contraction axis is constant
  per node index, so the forward/backward derivative pair contracts into
  ONE local matrix  K1 = Dᵀ·diag(w₁)·D  [N, N] applied per cell window,
  and the coefficient separates as  S_a[(c,k), ⊥] = w₁[k]·F_a[c, ⊥]  with
  F_a the coefficient folded over the perpendicular axes — **cell**
  resolution along axis a. This holds for constant AND heterogeneous DG-0
  coefficients, so heterogeneous media get the fused path too (reference
  multi-region setup: ``cpp/fenicsx-sf-fastor/benchmarks/HITU/W-H101-LIVER/
  main.cpp:79-111``).
* chunks of ~120/p cells make the banded matmul [cc·N, cc·p+1] — M≈150,
  K≈121 at p=4 — near-full MXU tiles; the overlap-add fold and the F
  scaling happen on values in VMEM (reshape/concat, no strided ref ops —
  strided VMEM ref slices crashed the TPU worker in v1 tuning).
* two kernels per apply instead of three-plus-XLA-glue:
  - kernel A: axis 0 on the [G0, R] view, grid over column tiles;
  - kernel B: axes 1 and 2 on [1, G1, G2] blocks, grid over G0, which
    accumulates A's partial result in place (input/output aliased).
  Total HBM traffic ≈ 5 field passes (vs ~14 in v1).

The reference operator this replaces: ``cpp/fenicsx-sf/common/
spectral_op.hpp:173-243`` (StiffnessSpectral3D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.gll import diff_matrix, gll_points_weights_01

# v5e has far more physical VMEM than the 16MB default scoped limit; the
# [1, G1, G2]-block kernels need ~17-24MB at the 72.5M-DOF benchmark size.
_VMEM_LIMIT = 120 * 1024 * 1024


def _k1_matrix(p: int) -> np.ndarray:
    """Local 1D pre-contracted operator K1 = Dᵀ diag(w) D on the unit cell."""
    N = p + 1
    D = diff_matrix(N)
    _, w = gll_points_weights_01(N)
    return D.T @ (w[:, None] * D)


def _banded_k1(cells: int, p: int) -> np.ndarray:
    """Banded unfold∘K1 matrix [cells·N, cells·p+1]: row (c, k) holds
    K1[k, :] at columns c·p .. c·p+p (windows overlap one lattice node)."""
    N = p + 1
    K1 = _k1_matrix(p)
    W = cells * p + 1
    B = np.zeros((cells * N, W))
    for c in range(cells):
        B[c * N : (c + 1) * N, c * p : c * p + N] = K1
    return B


def _pad_plane(G1, G2, itemsize=4):
    """One (G1, G2) fp32 plane as stored in VMEM: (8, 128) tile padding.
    At the 417^3 headline, 417x417 pads to 424x512 — a 1.25x tax; at
    541x541 (the p=6 H131 shape) 544x640 = 1.19x. Raw-size VMEM models
    that skip this under-approve block sizes (wave probe r3; v3 stage
    OOM at p=6, r4: 172.4M actual vs 128M capacity)."""
    return -(-G1 // 8) * 8 * -(-G2 // 128) * 128 * itemsize


def _chunk_cells(p: int, cap: int | None = None) -> int:
    """Cells per full chunk, returned as cells = m/p for the largest lattice
    span m with m % p == 0 and m % 8 == 0 (8-aligned value slices) such that
    BOTH matmul dims fit a single MXU tile: contraction width m+1 ≤ 128 AND
    output rows cells·N = m + m/p ≤ 128. Swept on v5e at p=4/38.3M DOF:
    m=96 (both single-tile) 3.70 ms vs m=120 (rows spill to 2 tiles)
    3.97 ms vs m=240 4.81 ms. FUS_CHUNK_CAP overrides for sweeps."""
    import os

    env = os.environ.get("FUS_CHUNK_CAP")
    if cap is None:
        cap = int(env) if env else min(120, (128 * p) // (p + 1))
    best = p  # at least one cell
    for m in range(p, cap + 1, p):
        if m % 8 == 0 and (env or (m + m // p) <= 128):
            best = m
    return max(best // p, 1)


def _chunk_plan(n_cells: int, p: int):
    """[(cell_lo, cells_in_chunk), ...] covering the axis."""
    cc = min(_chunk_cells(p), n_cells)
    plan = []
    lo = 0
    while lo < n_cells:
        c = min(cc, n_cells - lo)
        plan.append((lo, c))
        lo += c
    return plan


def _fold_value(z, p: int):
    """Overlap-add fold of per-cell blocks, on a kernel value.

    ``z``: [na, N, T] (contraction on the leading axes) → [na·p+1, T].
    Row (c, k) of the window representation lands on lattice row c·p+k;
    k = p of cell c coincides with k = 0 of cell c+1.
    """
    na, N, T = z.shape[0], z.shape[1], z.shape[2]
    main = z[:, : N - 1, :].reshape(na * (N - 1), T)
    brow = z[:, N - 1, :]  # [na, T]
    y_main = jnp.concatenate([main, brow[na - 1 :, :]], axis=0)
    shift = jnp.concatenate(
        [jnp.zeros((1, T), z.dtype), brow[: na - 1, :]], axis=0
    )
    zb = jnp.concatenate(
        [shift[:, None, :], jnp.zeros((na, N - 2, T), z.dtype)], axis=1
    ).reshape(na * (N - 1), T)
    y_extra = jnp.concatenate([zb, jnp.zeros((1, T), z.dtype)], axis=0)
    return y_main + y_extra


class LatticePallasStiffness:
    """Fused 3D lattice stiffness y = Σ_f Σ_a fold(K1·unfold(x_f))∘S_a^f.

    Coefficients are passed as packed per-axis F tensors (``pack_const`` /
    ``pack_field``); both spatially constant and DG-0 heterogeneous media
    run the same fused kernels.
    """

    def __init__(self, lattice, tile_cols: int = 512, interpret: bool = False):
        assert lattice.d == 3, "pallas v2 path is 3D"
        self.lat = lattice
        self.p = lattice.p
        self.N = lattice.N
        self.grid = lattice.grid
        self.gdims = lattice.gdims
        self.tile_cols = tile_cols
        self.interpret = interpret
        self.plans = [_chunk_plan(self.grid[a], self.p) for a in range(3)]
        import os

        self._b0_env = os.environ.get("FUS_B0")
        # distinct chunk sizes per axis → one banded K1 operand per size
        self._bk_np = {}
        for plan in self.plans:
            for _, c in plan:
                if c not in self._bk_np:
                    self._bk_np[c] = _banded_k1(c, self.p)

    # ------------------------------------------------------------- packing

    def usable(self, vmem_budget_bytes: int = 6 << 20) -> bool:
        """Kernel B holds [G1, G2] x/out planes plus the window-rep z in
        VMEM; refuse shapes that would blow the budget."""
        G0, G1, G2 = self.gdims
        itemsize = np.dtype(self.lat.dtype).itemsize
        plane = G1 * G2 * itemsize
        zmax = max(G1 * self.N // self.p + self.N, G2 * self.N // self.p + self.N)
        need = plane * 3 + zmax * max(G1, G2) * itemsize * 2
        return need <= vmem_budget_bytes

    def pack_const(self, coeff: float):
        """Per-axis F tensors for a spatially constant coefficient."""
        lat = self.lat
        c = float(coeff)
        wg = [np.asarray(lat._wg[a]) for a in range(3)]
        G0, G1, G2 = self.gdims
        # F0 is stored 3D [n0 or 1, G1, G2]: kernel A works on the native
        # [G0, G1, G2] layout (a flattened [G0, G1*G2] view forced XLA to
        # materialise full-field re-tiling copies around the kernel —
        # ~40% of the apply time in the device trace)
        F0 = (c * lat._geo[0]) * np.outer(wg[1], wg[2]).reshape(1, G1, G2)
        F1 = (c * lat._geo[1]) * (
            wg[0][:, None, None] * wg[2][None, None, :]
        )  # [G0, 1, G2]
        # F2 is stored TRANSPOSED on the trailing axes ([G0, n2, G1]): the
        # axis-2 kernel contracts the lane dim directly into a [cells·N, G1]
        # result (Mosaic cannot split lane dims), so its scale/fold runs in
        # the transposed layout.
        F2 = (c * lat._geo[2]) * (
            wg[0][:, None, None] * wg[1][None, None, :]
        )  # [G0, 1, G1]
        dt = self.lat.dtype
        return {
            "F0": jnp.asarray(F0, dt),
            "F1": jnp.asarray(F1, dt),
            "F2": jnp.asarray(F2, dt),
        }

    def pack_field(self, coeff_cells: np.ndarray):
        """Per-axis F tensors for a DG-0 coefficient field: the coefficient
        folded (weighted) over the perpendicular axes, cell-resolved along
        the contraction axis — ~1/p of a field per axis vs the full
        mixed-rep scale tensors of the XLA path."""
        lat = self.lat
        c = np.asarray(coeff_cells, np.float64).reshape(self.grid)
        outs = []
        for a in range(3):
            t = c.copy()
            for b in range(3):
                if b != a:
                    t = lat._fold_weighted(t, b)
            outs.append(lat._geo[a] * t)  # cell axis a, lattice elsewhere
        F0 = outs[0]  # [n0, G1, G2] (3D: see pack_const)
        F1 = outs[1]  # [G0, n1, G2]
        F2 = np.swapaxes(outs[2], 1, 2)  # [G0, n2, G1] (transposed, see pack_const)
        dt = self.lat.dtype
        return {
            "F0": jnp.asarray(F0, dt),
            "F1": jnp.asarray(F1, dt),
            "F2": jnp.asarray(F2, dt),
        }

    # ------------------------------------------------------------- kernels

    def _prec(self):
        import os

        from .lattice import _precision

        # "b3": manual 3-pass bf16 emulation of Precision.HIGH (Mosaic only
        # lowers DEFAULT/HIGHEST). z = B_hi·x_hi + B_hi·x_lo + B_lo·x_hi with
        # fp32 accumulation — per-MAC error ~2^-16 vs HIGHEST's ~2^-24 at
        # half the MXU passes. Accuracy-gated on the planewave oracle before
        # use; the XLA lattice fallback keeps jax Precision semantics.
        name = os.environ.get("FUS_PRECISION", "").lower()
        if name in ("b3", "b4"):
            return name
        if not name and not self.interpret:
            import jax

            if jax.default_backend() == "tpu":
                # TPU default (round 3, hardware-gated): b4's per-apply
                # error is 5.0e-6 — three orders below discretization —
                # and the apply is MXU-pass-bound, so 4 passes instead of
                # HIGHEST's 6 buys ~1/3 off the dominant term
                # (benchmarks/PERFORMANCE.md). Planewave gate on silicon:
                # 3.5e-3 (HIGHEST: 1.5e-3; gate 5e-3). FUS_PRECISION=
                # highest opts back out.
                return "b4"
        return _precision()

    def _axis_chunk_apply(self, x, plan, bk_by_cells, F, hetero, prec, last_axis):
        """Shared chunk loop: contract/scale along the leading (or last)
        axis of a 2D value ``x`` and return the folded result.

        ``x``: [Ga, T] (last_axis=False) or [T, Ga] (last_axis=True). The
        last-axis variant contracts the lane dim into a [cells·N, T]
        (transposed) intermediate — Mosaic cannot split lane dims — so its
        result comes back TRANSPOSED [Ga', T] and ``F`` is [na or 1, T] in
        both variants.
        """
        N, p = self.N, self.p

        def dot_bsplit(bk, xw, dims, passes):
            """Split-bf16 emulation (see ``_prec``): 3 passes drop Bl·xl
            (per-MAC ~2^-16); 4 passes include it (~2^-18)."""
            f32, bf16 = x.dtype, jnp.bfloat16
            bh = bk.astype(bf16)
            bl = (bk - bh.astype(f32)).astype(bf16)
            xh = xw.astype(bf16)
            xl = (xw - xh.astype(f32)).astype(bf16)
            kw = dict(preferred_element_type=f32)
            z = (
                jax.lax.dot_general(bh, xh, dims, **kw)
                + jax.lax.dot_general(bh, xl, dims, **kw)
                + jax.lax.dot_general(bl, xh, dims, **kw)
            )
            if passes >= 4:
                z = z + jax.lax.dot_general(bl, xl, dims, **kw)
            return z

        zs = []
        for lo_c, cells in plan:
            lo = lo_c * p
            W = cells * p + 1
            bk = bk_by_cells[cells]
            if last_axis:
                xw = x[:, lo : lo + W]
                dims = (((1,), (1,)), ((), ()))
            else:
                xw = x[lo : lo + W, :]
                dims = (((1,), (0,)), ((), ()))
            if prec in ("b3", "b4"):
                z = dot_bsplit(bk, xw, dims, int(prec[1]))  # [cells*N, T]
            else:
                z = jax.lax.dot_general(
                    bk, xw, dims, precision=prec,
                    preferred_element_type=x.dtype,
                )  # [cells*N, T]
            z = z.reshape(cells, N, z.shape[-1])
            s = F[lo_c : lo_c + cells, :] if hetero else F[0:1, :]
            z = z * s[:, None, :]
            zs.append(z)
        z = jnp.concatenate(zs, axis=0)  # [na, N, T]
        return _fold_value(z, p)

    def _axis_rows_apply(
        self, planes, plan, bk_by_cells, F_rows, hetero, prec, last_axis
    ):
        """Row-batched variant of ``_axis_chunk_apply``: contract P planes
        in ONE MXU dot per chunk by stacking them along the non-contracted
        dim, and fold the bf16-split passes into the same dot by quadrant
        stacking ([bh;bl] x [xh|xl] -> the four products as quadrants).

        The per-row path issues chunks*P*passes small dots per element per
        axis with ~23% lane padding waste at production sizes; this issues
        chunks dots with ~4% waste. Numerically identical to P separate
        ``_axis_chunk_apply`` calls: same per-product fp32 accumulation,
        same add order.

        ``planes``: P values, [G1, G2] each; ``F_rows``: the P matching
        per-row F slices. Returns the P folded results (transposed for the
        last-axis variant, exactly as ``_axis_chunk_apply``).
        """
        N, p = self.N, self.p
        P = len(planes)
        cat = 0 if last_axis else 1
        X = jnp.concatenate(planes, axis=cat)
        S = jnp.concatenate(F_rows, axis=1)
        f32, bf16 = X.dtype, jnp.bfloat16

        zs = []
        for lo_c, cells in plan:
            lo = lo_c * p
            W = cells * p + 1
            bk = bk_by_cells[cells]
            M = bk.shape[0]
            if last_axis:
                xw = X[:, lo : lo + W]
                dims = (((1,), (1,)), ((), ()))
            else:
                xw = X[lo : lo + W, :]
                dims = (((1,), (0,)), ((), ()))
            if prec in ("b3", "b4"):
                bh = bk.astype(bf16)
                bl = (bk - bh.astype(f32)).astype(bf16)
                xh = xw.astype(bf16)
                xl = (xw - xh.astype(f32)).astype(bf16)
                Bq = jnp.concatenate([bh, bl], axis=0)
                Xq = jnp.concatenate([xh, xl], axis=cat)
                zq = jax.lax.dot_general(
                    Bq, Xq, dims, preferred_element_type=f32
                )
                T = zq.shape[1] // 2
                z = (zq[:M, :T] + zq[:M, T:]) + zq[M:, :T]
                if prec == "b4":
                    z = z + zq[M:, T:]
            else:
                z = jax.lax.dot_general(
                    bk, xw, dims, precision=prec,
                    preferred_element_type=X.dtype,
                )
            z = z.reshape(cells, N, z.shape[-1])
            s = S[lo_c : lo_c + cells, :] if hetero else S[0:1, :]
            zs.append(z * s[:, None, :])
        Y = _fold_value(jnp.concatenate(zs, axis=0), p)
        Tn = Y.shape[1] // P
        return [Y[:, k * Tn : (k + 1) * Tn] for k in range(P)]

    def pick_b0(self, n_field_blocks: int, budget_bytes: int = 48 << 20) -> int:
        """Planes per kernel-B grid step. One-plane steps leave the grid
        ~400 steps long at the 72.5M-DOF benchmark size, and per-step
        latency (~5 µs: DMA issue + semaphores) dominates the ~0.7 MB
        plane DMAs; multi-plane blocks amortise it. Bounded so that all
        double-buffered field blocks fit the VMEM budget."""
        if self._b0_env:
            return max(int(self._b0_env), 1)
        G0, G1, G2 = self.gdims
        plane = G1 * G2 * np.dtype(self.lat.dtype).itemsize
        for b0 in (8, 4, 2):
            if n_field_blocks * b0 * plane * 2 <= budget_bytes:
                return b0
        return 1

    @functools.cached_property
    def _bk_ops(self):
        """Banded K1 operands, ordered by cell count (stable order). May be
        first touched inside a jit trace — force compile-time constants so a
        traced value never gets cached (same rationale as SEMOperators.gidx)."""
        keys = sorted(self._bk_np)
        with jax.ensure_compile_time_eval():
            ops = [jnp.asarray(self._bk_np[k], self.lat.dtype) for k in keys]
        return keys, ops

    def _kernel_axis0(self, n_fields, hetero, bg1):
        """Axis-0 contraction on the NATIVE [G0, G1, G2] layout: grid over
        G1 tiles, per-slice 2D banded matmuls inside the block (no HBM
        reshape of the field)."""
        plan = self.plans[0]
        prec = self._prec()
        bk_keys, _ = self._bk_ops
        nbk = len(bk_keys)

        def kernel(*refs):
            bks = {
                bk_keys[i]: refs[2 * n_fields + i][:, :] for i in range(nbk)
            }
            out_ref = refs[-1]
            for g1 in range(bg1):
                acc = None
                for f in range(n_fields):
                    x2 = refs[f][:, g1, :]
                    F2 = refs[n_fields + f][:, g1, :]
                    y = self._axis_chunk_apply(
                        x2, plan, bks, F2, hetero[f], prec, last_axis=False
                    )
                    acc = y if acc is None else acc + y
                out_ref[:, g1, :] = acc

        return kernel

    def pick_bg1(self, n_field_blocks: int, budget_bytes: int = 48 << 20) -> int:
        """G1-slices per kernel-A grid step (same rationale as pick_b0)."""
        import os

        env = os.environ.get("FUS_BG1") or self._b0_env
        if env:
            return max(int(env), 1)
        G0, G1, G2 = self.gdims
        slice_bytes = G0 * G2 * np.dtype(self.lat.dtype).itemsize
        for bg1 in (8, 4, 2):
            if n_field_blocks * bg1 * slice_bytes * 2 <= budget_bytes:
                return bg1
        return 1

    def _kernel_axes12(self, n_fields, hetero, b0):
        plan1, plan2 = self.plans[1], self.plans[2]
        prec = self._prec()
        bk_keys, _ = self._bk_ops
        nbk = len(bk_keys)

        def kernel(*refs):
            for ip in range(b0):
                i = 0
                xs = [refs[i + f][ip, :, :] for f in range(n_fields)]
                i += n_fields
                F1s = [refs[i + f][ip, :, :] for f in range(n_fields)]
                i += n_fields
                F2s = [refs[i + f][ip, :, :] for f in range(n_fields)]
                i += n_fields
                bks = {bk_keys[j]: refs[i + j][:, :] for j in range(nbk)}
                i += nbk
                yA = refs[i][ip, :, :]
                out_ref = refs[-1]
                acc = yA
                y2t = None
                for f in range(n_fields):
                    # axis 1: contract rows of [G1, G2]
                    acc = acc + self._axis_chunk_apply(
                        xs[f], plan1, bks, F1s[f], hetero[f], prec,
                        last_axis=False,
                    )
                    # axis 2: lane-dim contraction → transposed result
                    # [G2, G1] (F2 is packed transposed); one transpose
                    # per plane at the end
                    y2 = self._axis_chunk_apply(
                        xs[f], plan2, bks, F2s[f], hetero[f], prec,
                        last_axis=True,
                    )
                    y2t = y2 if y2t is None else y2t + y2
                out_ref[ip, :, :] = acc + y2t.T

        return kernel

    # --------------------------------------------------------------- apply

    def apply(self, xs, Fs):
        """y = Σ_f K_{coeff_f}(x_f); xs lattice-shaped [G0, G1, G2] (or flat
        [ndofs]); Fs = packed dicts from ``pack_const``/``pack_field``."""
        import os

        # v3 (single-pass, ops/pallas_v3.py) is the production path:
        # measured 2.41 ms vs v2's 3.04 ms at 38.3M DOF p=4 fp32 on v5e.
        # FUS_V3=0 pins the legacy two-kernel path below.
        if os.environ.get("FUS_V3", "1") != "0":
            from .pallas_v3 import apply_v3

            return apply_v3(self, xs, Fs)
        G0, G1, G2 = self.gdims
        n_fields = len(xs)
        dtype = self.lat.dtype
        xs = [x.reshape(self.gdims) for x in xs]
        hetero = tuple(F["F0"].shape[0] != 1 for F in Fs)
        bk_keys, bk_ops = self._bk_ops

        # ---- kernel A: axis 0 on the native [G0, G1, G2] layout, grid
        # over G1 tiles (no HBM reshape)
        bg1 = self.pick_bg1(n_fields + 1)
        grid_a = ((G1 + bg1 - 1) // bg1,)
        in_specs = []
        args = []
        for f in range(n_fields):
            in_specs.append(
                pl.BlockSpec(
                    (G0, bg1, G2), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(xs[f])
        for f in range(n_fields):
            nF = Fs[f]["F0"].shape[0]
            in_specs.append(
                pl.BlockSpec(
                    (nF, bg1, G2), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(Fs[f]["F0"])
        for bk in bk_ops:
            in_specs.append(
                pl.BlockSpec(bk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            args.append(bk)
        yA = pl.pallas_call(
            self._kernel_axis0(n_fields, hetero, bg1),
            grid=grid_a,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (G0, bg1, G2), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(self.gdims, dtype),
            interpret=self.interpret,
            compiler_params=None if self.interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*args)

        # ---- kernel B: axes 1+2 on [b0, G1, G2] blocks, accumulate into yA
        b0 = self.pick_b0(n_fields + 2)
        in_specs = []
        args = []
        for f in range(n_fields):
            in_specs.append(
                pl.BlockSpec(
                    (b0, G1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(xs[f])
        for f in range(n_fields):
            n1 = Fs[f]["F1"].shape[1]
            in_specs.append(
                pl.BlockSpec(
                    (b0, n1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(Fs[f]["F1"])
        for f in range(n_fields):
            n2 = Fs[f]["F2"].shape[1]  # stored transposed: [G0, n2, G1]
            in_specs.append(
                pl.BlockSpec(
                    (b0, n2, G1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(Fs[f]["F2"])
        for bk in bk_ops:
            in_specs.append(
                pl.BlockSpec(bk.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
            )
            args.append(bk)
        # aliased accumulator: kernel B adds axes-1/2 contributions in place
        ya_idx = len(args)
        in_specs.append(
            pl.BlockSpec((b0, G1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(yA)  # already [G0, G1, G2] from the 3D kernel A
        y = pl.pallas_call(
            self._kernel_axes12(n_fields, hetero, b0),
            grid=((G0 + b0 - 1) // b0,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (b0, G1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(self.gdims, dtype),
            input_output_aliases={ya_idx: 0},
            interpret=self.interpret,
            compiler_params=None if self.interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*args)
        return y
