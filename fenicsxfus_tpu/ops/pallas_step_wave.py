"""Wavefront-fused explicit RK4 step: ONE pallas kernel per time step.

The v3 stage (``pallas_stage_v3.py``) already fuses each slope evaluation
into a single kernel, but the four stages of an RK4 step still round-trip
state through HBM: stage i re-reads (u0, v0, kv_{i-1}, kv_{i-2}) and
writes kv_i — 19 field-sized passes per step (3+4+5+7). The measured
marginal cost of one pass at the 72.5M-DOF headline is 0.81 ms
(``benchmarks/stage_attrib.py``), so the streams, not the MXU, bound the
step.

This kernel runs all four stages in one launch as a **software wavefront**
along the axis-0 block walk: at grid step b, stage s processes block
position q = b − s. Each stage's output block is finished exactly one
step before the next stage's window needs it (the axis-0 stiffness stencil
reaches one element past the block, i.e. into position q+1 — computed by
the earlier stage in the SAME grid step). The kv slopes therefore never
exist in HBM: they live in VMEM ring buffers of depth 4/3/2 (their maximum
live span in positions), as do the trailing u0/v0/dense blocks the lagged
stages re-read.

HBM traffic per RK4 step ≈ read u0, v0, the dense epilogue fields once +
write u1, v1 once (≈ 5-7 passes vs 19) — the remaining cost is the four
stages' compute, which is unchanged.

Reference scope: the full RK4 driver ``cpp/fenicsx-sf/common/
Linear.hpp:228-314`` with the f1 slope of ``Westervelt.hpp:216-281`` —
one launch per ``while t < tf`` iteration instead of 8+ kernel/assembly
calls per stage.

Restrictions (callers fall back to the v3 per-stage kernels):
* four-stage tables only (classical RK4 — the production default);
* no hybrid (bowl-deformed) band correction: the band is computed in XLA
  from the stage fields, which here never leave the kernel;
* single device (same as every fused stage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lattice import _VMEM_LIMIT, _k1_matrix, _pad_plane
from .pallas_stage import (
    KIND_DENSE,
    KIND_FACET,
    _epilogue,
    _facet_corrections,
)
from .pallas_stage_v3 import FusedRKStageV3

# ring depths = maximum live span of each array in block positions:
# u0/v0/dense are read by all four lagged stages (positions b-3..b);
# kv0 is written at position q and last read (as the final update's
# "prev" slope) three positions later; kv1 spans 3; kv2 spans 2.
_DEPTH_STATE = 4
_DEPTH_KV = (4, 3, 2)


# Mosaic's register-allocator spill slots for the 4-stage fori body,
# measured on v5e at the 417^3 headline shape (benchmarks/wave_vmem_probe.py:
# 18.05 MiB reported as "register allocator spill slots"). Treated as a
# shape-independent constant plus a strip/temporary allowance.
_SPILL_BYTES = 19 << 20
_STRIP_BYTES = 4 << 20
# the one-kernel-per-step program IS the whole device launch — let it use
# essentially all of VMEM (v5e capacity 128 MiB)
_WAVE_VMEM_LIMIT = 127 * 1024 * 1024


def _wave_vmem_bytes(gdims, be, p, nde, nf, hetero_any, sep=False, itemsize=4):
    """Estimate of the kernel's real VMEM footprint at block size ``be``,
    calibrated against the v5e compile report at 417^3/be=1 (140.8 MiB
    actual vs 140.2 modeled). ``sep`` = inv_m passed as a separable
    (row-scale, plane) pair instead of a dense field."""
    G0, G1, G2 = gdims
    pp = _pad_plane(G1, G2, itemsize)
    bep = be * p
    nde_eff = 0 if sep else nde
    rings = (
        (2 * _DEPTH_STATE + sum(_DEPTH_KV) + nde_eff * _DEPTH_STATE)
        * bep
        * pp
    )
    carry = 4 * pp
    # double-buffered windows: u0/v0 in + u1/v1 out, 2 strided boundary
    # planes, stiffness F0 (hetero = 4 lagged blocks), dense fields (or the
    # constant separable plane), 2 facet xp planes
    windows = (2 + 2) * bep * 2 * pp + 2 * 2 * pp
    windows += 4 * nf * 2 * (be * pp) if hetero_any else nf * 2 * pp
    windows += (2 * pp) if sep else nde * bep * 2 * pp
    windows += 2 * 2 * 2 * pp
    return rings + carry + windows + _STRIP_BYTES + _SPILL_BYTES


def _wave_pick_be(pk, nde, nf, hetero_any, sep=False, budget=125 << 20):
    import os

    n0 = pk.grid[0]
    forced = os.environ.get("FUS_WAVE_BE", "")
    if forced:
        be = int(forced)
        return be if n0 % be == 0 else None
    for be in (4, 2, 1):
        if n0 % be:
            continue
        if (
            _wave_vmem_bytes(pk.gdims, be, pk.p, nde, nf, hetero_any, sep)
            <= budget
        ):
            return be
    return None


def try_separate_field(arr, gdims, tol=None):
    """Host-side rank-1 test of a lattice field: ``arr[i,j,k] ==
    a[i] * P[j,k]``. On a uniform box with homogeneous rho the assembled
    inverse lumped mass has exactly this tensor-product structure
    (1D GLL weight products; reference assembles it per cell,
    ``cpp/fenicsx-sf/common/spectral_op.hpp``), which lets the wave kernel
    drop a 13+7 MiB dense ring+window for a 2 MiB constant plane — the
    difference between fitting in v5e VMEM at 417^3 and not.

    Returns ``(a, P)`` as float64 ndarrays (``a``: (G0,), ``P``:
    (1, G1, G2)) or None.

    The tolerance scales with the STORAGE dtype of ``arr``: the assembled
    inv_m is quantized to the model dtype (fp32 on TPU — ``mass_diag``
    folds in fp32 there), so a genuinely tensor-product field deviates
    from rank-1 by a few ulp of that dtype, not of float64. tol defaults
    to 100·eps(arr.dtype): 1.2e-5 for fp32 fields, 2.2e-14 for fp64 —
    tight enough that a physical perturbation ≫100 ulp (ADVICE r3's
    concern) is rejected, loose enough that pure quantization is not.
    The residual is evaluated in row blocks so the transient footprint is
    a few hundred planes, not three full-field float64 copies (~1.7 GB at
    the 72.5M-DOF headline on the 1-core host VM — ADVICE r3)."""
    import numpy as np

    src = np.asarray(arr)
    if tol is None:
        eps = np.finfo(src.dtype).eps if src.dtype.kind == "f" else np.finfo(
            np.float64
        ).eps
        tol = 100.0 * float(eps)
    M = src.astype(np.float64, copy=False).reshape(gdims[0], -1)
    if not np.all(np.isfinite(M)):
        return None
    i0 = int(np.argmax(np.abs(M).sum(axis=1)))
    P = M[i0]
    scale = float(P[int(np.argmax(np.abs(P)))])
    if scale == 0.0:
        return None
    P = P / scale
    denom = P @ P
    a = (M @ P) / denom
    mmax = float(np.max(np.abs(M)))
    blk = max(1, (64 << 20) // max(M.shape[1] * 8, 1))  # ~64 MB per block
    err = 0.0
    for r0 in range(0, M.shape[0], blk):
        sub = M[r0 : r0 + blk] - a[r0 : r0 + blk, None] * P[None, :]
        err = max(err, float(np.max(np.abs(sub))))
        if err > tol * mmax:
            return None
    return a, P.reshape(1, gdims[1], gdims[2])


class FusedRKStepWave(FusedRKStageV3):
    """One-kernel-per-step RK4 driver (see module docstring). Reuses the
    v3 stage's packing/table layout; only ``make_step`` and the kernel
    construction differ."""

    #: inv_m arrives as a separable (row-scale, plane) pair instead of a
    #: dense field (set by the model builder after try_separate_field)
    sep_invm = False

    def usable(self) -> bool:
        if self.nstage != 4:
            return False
        nde = len(KIND_DENSE[self.kind])
        return (
            _wave_pick_be(
                self.pk, nde, self.nf, any(self.hetero), self.sep_invm
            )
            is not None
        )

    # ------------------------------------------------------------- the call

    def _step_call(self, u0, v0, scal4, Fs, extras):
        """One RK4 step: (u0, v0) -> (u1, v1). ``scal4`` is the [4, W]
        per-stage coefficient table (v3 layout per row, zero-padded; row 3
        carries the final-update tail)."""
        pk = self.pk
        G0, G1, G2 = pk.gdims
        p, N = pk.p, pk.N
        n0 = pk.grid[0]
        nf = self.nf
        dtype = self.dtype
        hetero = self.hetero
        bk_keys, bk_ops = pk._bk_ops
        nbk = len(bk_keys)
        prec = pk._prec()
        plan1, plan2 = pk.plans[1], pk.plans[2]
        K1 = _k1_matrix(p)
        kind = self.kind
        nde = len(KIND_DENSE[kind])
        nfa = len(KIND_FACET[kind])
        dense, facets = extras
        gd = pk.gdims
        sep = self.sep_invm
        nde_k = 0 if sep else nde  # dense fields carried as rings

        be = _wave_pick_be(pk, nde, nf, any(hetero), sep)
        assert be is not None, "wave step: VMEM budget exceeded"
        bep = be * p
        B = n0 // be  # tail position index; block positions 0..B-1 full
        nb_f0 = (n0 + be - 1) // be
        S = 4

        u0 = u0.reshape(gd)
        v0 = v0.reshape(gd)
        u0b = u0[::bep]
        v0b = v0[::bep]
        if sep:
            sep0, sepP = dense  # (G0,) row scales + (1, G1, G2) plane
        else:
            dense = [e.reshape(gd) for e in dense]

        # per-stage state roles: which kv rings feed kvp/kvpp
        #   s=0: (u0, v0); s=1: +kv0; s=2: +kv1, kv0; s=3: +kv2, kv1
        kvp_of = {1: 0, 2: 1, 3: 2}
        kvpp_of = {2: 0, 3: 1}

        def kernel(*refs):
            b = pl.program_id(0)
            i = 0
            u0_r = refs[i]; v0_r = refs[i + 1]; i += 2
            u0b_r = refs[i]; v0b_r = refs[i + 1]; i += 2
            scal_r = refs[i]; i += 1
            # F0: homogeneous = one shared block; hetero = 4 lagged blocks
            F0s = []
            for f in range(nf):
                if hetero[f]:
                    F0s.append([refs[i + s] for s in range(S)]); i += S
                else:
                    F0s.append(refs[i]); i += 1
            F1s = [[refs[i + s * nf + f] for f in range(nf)] for s in range(S)]
            i += S * nf
            F2s = [[refs[i + s * nf + f] for f in range(nf)] for s in range(S)]
            i += S * nf
            bks = {bk_keys[j]: refs[i + j][:, :] for j in range(nbk)}; i += nbk
            if sep:
                sepP_r = refs[i]; sep0_r = refs[i + 1]; i += 2
                dense_r = []
            else:
                dense_r = [refs[i + j] for j in range(nde)]; i += nde
            fv = []  # per facet field: (xp, [ye_s0..3], [ze_s0..3])
            for _j in range(nfa):
                xp = refs[i]; i += 1
                yes = [refs[i + s] for s in range(S)]; i += S
                zes = [refs[i + s] for s in range(S)]; i += S
                fv.append((xp, yes, zes))
            out_u, out_v = refs[i], refs[i + 1]; i += 2
            # scratch
            ring_u = refs[i]; ring_v = refs[i + 1]; i += 2
            ring_kv = [refs[i + j] for j in range(3)]; i += 3
            ring_de = [refs[i + j] for j in range(nde_k)]; i += nde_k
            carry = refs[i]

            def rem(a, d):
                return jax.lax.rem(a, jnp.asarray(d, a.dtype))

            def ld(ref, r):
                idx = (pl.ds(r, 1),) + (slice(None),) * (len(ref.shape) - 1)
                return ref[idx][0]

            def st(ref, r, val):
                idx = (pl.ds(r, 1),) + (slice(None),) * (len(ref.shape) - 1)
                ref[idx] = val[None]

            def axes12(s, f, plane_2d, r):
                y = pk._axis_chunk_apply(
                    plane_2d, plan1, bks, ld(F1s[s][f], r), hetero[f], prec,
                    last_axis=False,
                )
                y2 = pk._axis_chunk_apply(
                    plane_2d, plan2, bks, ld(F2s[s][f], r), hetero[f], prec,
                    last_axis=True,
                )
                return y + y2.T

            # ---- step-entry ring copies (positions advance with b): the
            # operand block (position min(b, B)) enters the state rings at
            # slot b % 4 BEFORE any stage reads — stage s reads slots
            # (b-s)%4 .. (b-s+1)%4, none of which is the slot being
            # overwritten (its old content is position b-4, dead since the
            # final stage consumed it at step b-1).
            @pl.when(b <= B)
            def _():
                slot = rem(b, _DEPTH_STATE) * bep
                ring_u[pl.ds(slot, bep)] = u0_r[:, :, :]
                ring_v[pl.ds(slot, bep)] = v0_r[:, :, :]
                for j in range(nde_k):
                    ring_de[j][pl.ds(slot, bep)] = dense_r[j][:, :, :]

            # ---- the four lagged stages, in order
            for s in range(S):
                q = b - s
                has_kvp = s >= 1
                has_kvpp = s >= 2
                final = s == S - 1
                alpha, beta = scal_r[s, 0], scal_r[s, 1]

                def ring_row(ring, depth, qq, r):
                    return ld(ring, rem(qq, depth) * bep + r)

                def state_row(r, *, s=s, q=q):
                    """[u0, v0 (, kvp, kvpp)] at lattice row ``r`` of
                    position ``q`` (row index block-relative)."""
                    if s == 0:
                        rows = [ld(u0_r, r), ld(v0_r, r)]
                    else:
                        rows = [
                            ring_row(ring_u, _DEPTH_STATE, q, r),
                            ring_row(ring_v, _DEPTH_STATE, q, r),
                        ]
                    if s >= 1:
                        k = kvp_of[s]
                        rows.append(ring_row(ring_kv[k], _DEPTH_KV[k], q, r))
                    if s >= 2:
                        k = kvpp_of[s]
                        rows.append(ring_row(ring_kv[k], _DEPTH_KV[k], q, r))
                    return rows

                def bnd_rows(*, s=s, q=q):
                    """Same state list at row 0 of position q+1 (the
                    element-boundary row of the block's last element)."""
                    if s == 0:
                        rows = [u0b_r[0, :, :], v0b_r[0, :, :]]
                    else:
                        rows = [
                            ring_row(ring_u, _DEPTH_STATE, q + 1, 0),
                            ring_row(ring_v, _DEPTH_STATE, q + 1, 0),
                        ]
                    if s >= 1:
                        k = kvp_of[s]
                        rows.append(
                            ring_row(ring_kv[k], _DEPTH_KV[k], q + 1, 0)
                        )
                    if s >= 2:
                        k = kvpp_of[s]
                        rows.append(
                            ring_row(ring_kv[k], _DEPTH_KV[k], q + 1, 0)
                        )
                    return rows

                def emit(r, srows, un_r, vn_r, acc,
                         *, s=s, q=q, final=final):
                    g0 = q * bep + r
                    coefs = (
                        [scal_r[s, 2 + j] for j in range(nfa - 1)] + ["abc"]
                    )
                    fvals = [
                        (xp[:, :, :], ld(yes[s], r), ld(zes[s], r))
                        for (xp, yes, zes) in fv
                    ]
                    corr = _facet_corrections(fvals, coefs, vn_r, g0, G0)
                    if sep:
                        # inv_m[g0, :, :] == sep0[g0] * sepP — one SMEM
                        # scalar + the VMEM-resident constant plane
                        dvals = [sep0_r[g0] * sepP_r[0, :, :]]
                    else:
                        dvals = [
                            ring_row(ring_de[j], _DEPTH_STATE, q, r)
                            for j in range(nde)
                        ]
                    kv = _epilogue(kind, acc, un_r, vn_r, dvals, corr)
                    if not final:
                        st(
                            ring_kv[s],
                            rem(q, _DEPTH_KV[s]) * bep + r,
                            kv,
                        )
                        return
                    # final stage: step update straight into the outputs.
                    # srows = [u0, v0, kv2, kv1] at row r; kv0 from its ring.
                    kv0 = ring_row(ring_kv[0], _DEPTH_KV[0], q, r)
                    kvs = [kv0, srows[3], srows[2], kv]
                    ns = len(kvs)
                    off = 2 + (nfa - 1)
                    u1 = srows[0] + scal_r[s, off] * srows[1]
                    for j in range(ns - 1):
                        u1 = u1 + scal_r[s, off + 1 + j] * kvs[j]
                    v1 = srows[1]
                    for i_s in range(ns):
                        v1 = v1 + scal_r[s, off + 1 + (ns - 1) + i_s] * kvs[i_s]
                    st(out_u, r, u1)
                    st(out_v, r, v1)

                @pl.when(b == s)
                def _(*, s=s):
                    carry[s, :, :] = jnp.zeros((G1, G2), dtype)

                @pl.when(jnp.logical_and(b >= s, q < B))
                def _(*, s=s, q=q, state_row=state_row, bnd_rows=bnd_rows,
                      emit=emit, has_kvp=has_kvp, has_kvpp=has_kvpp,
                      alpha=alpha, beta=beta):
                    ns_state = 2 + has_kvp + has_kvpp
                    bnd_cache = bnd_rows()

                    def element(e, boundary):
                        st_rows = []
                        for j in range(N):
                            r = e * p + j
                            if j < p:
                                st_rows.append(state_row(r))
                            else:
                                rm = jnp.minimum(r, bep - 1)
                                inner = state_row(rm)
                                st_rows.append([
                                    jnp.where(
                                        e == be - 1, bnd_cache[k], inner[k]
                                    )
                                    for k in range(ns_state)
                                ])
                        rows = [
                            self._stage_fields(
                                sr[0], sr[1],
                                sr[2] if has_kvp else None,
                                sr[3] if has_kvpp else None,
                                alpha, beta,
                            )
                            for sr in st_rows
                        ]
                        fields = [
                            [un for un, _ in rows], [vn for _, vn in rows]
                        ]
                        z_rows = []
                        for k in range(N):
                            acc = None
                            for f in range(nf):
                                zk = None
                                for j in range(N):
                                    w = float(K1[k, j])
                                    t = w * fields[f][j]
                                    zk = t if zk is None else zk + t
                                if hetero[f]:
                                    sc = ld(F0s[f][s], e)
                                else:
                                    sc = F0s[f][0, :, :]
                                zk = zk * sc
                                acc = zk if acc is None else acc + zk
                            z_rows.append(acc)
                        for k in range(p):
                            r = e * p + k
                            y0 = z_rows[k]
                            if k == 0:
                                y0 = y0 + boundary
                            un_r, vn_r = rows[k]
                            acc12 = None
                            for f in range(nf):
                                t = axes12(s, f, fields[f][k], r)
                                acc12 = t if acc12 is None else acc12 + t
                            emit(r, st_rows[k], un_r, vn_r, y0 + acc12)
                        return z_rows[p]

                    carry[s, :, :] = jax.lax.fori_loop(
                        0, be, element, carry[s, :, :]
                    )

                @pl.when(b == s + B)
                def _(*, s=s, q=q, state_row=state_row, emit=emit,
                      has_kvp=has_kvp, has_kvpp=has_kvpp,
                      alpha=alpha, beta=beta):
                    # tail position: the single global last lattice row
                    srows0 = state_row(0)
                    un_r, vn_r = self._stage_fields(
                        srows0[0], srows0[1],
                        srows0[2] if has_kvp else None,
                        srows0[3] if has_kvpp else None,
                        alpha, beta,
                    )
                    fields0 = (un_r,) if nf == 1 else (un_r, vn_r)
                    acc12 = None
                    for f in range(nf):
                        t = axes12(s, f, fields0[f], 0)
                        acc12 = t if acc12 is None else acc12 + t
                    emit(0, srows0, un_r, vn_r, carry[s, :, :] + acc12)

        # ---- operands
        args, specs = [], []

        def blk_at(lag):
            return pl.BlockSpec(
                (bep, G1, G2),
                lambda b, lag=lag: (jnp.clip(b - lag, 0, B), 0, 0),
                memory_space=pltpu.VMEM,
            )

        # u0, v0 (donated into u1, v1)
        args += [u0, v0]
        specs += [blk_at(0), blk_at(0)]
        # strided boundary planes for the leading stage
        bnd_spec = pl.BlockSpec(
            (1, G1, G2),
            lambda b: (jnp.minimum(b + 1, B), 0, 0),
            memory_space=pltpu.VMEM,
        )
        args += [u0b, v0b]
        specs += [bnd_spec, bnd_spec]
        args.append(scal4)
        specs.append(
            pl.BlockSpec(
                scal4.shape, lambda b: (0, 0), memory_space=pltpu.SMEM
            )
        )
        for f in range(nf):
            F0 = Fs[f]["F0"]
            if hetero[f]:
                for s in range(S):
                    args.append(F0)
                    specs.append(
                        pl.BlockSpec(
                            (be, G1, G2),
                            lambda b, s=s: (
                                jnp.clip(b - s, 0, nb_f0 - 1), 0, 0,
                            ),
                            memory_space=pltpu.VMEM,
                        )
                    )
            else:
                args.append(F0)
                specs.append(
                    pl.BlockSpec(
                        (1, G1, G2), lambda b: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
        for s in range(S):
            for f in range(nf):
                F1 = Fs[f]["F1"]
                args.append(F1)
                specs.append(
                    pl.BlockSpec(
                        (bep, F1.shape[1], G2),
                        lambda b, s=s: (jnp.clip(b - s, 0, B), 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
        for s in range(S):
            for f in range(nf):
                F2 = Fs[f]["F2"]
                args.append(F2)
                specs.append(
                    pl.BlockSpec(
                        (bep, F2.shape[1], G1),
                        lambda b, s=s: (jnp.clip(b - s, 0, B), 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
        for bk in bk_ops:
            args.append(bk)
            specs.append(
                pl.BlockSpec(bk.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
            )
        if sep:
            args.append(sepP)
            specs.append(
                pl.BlockSpec(
                    (1, G1, G2), lambda b: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(sep0)
            specs.append(
                pl.BlockSpec(
                    (G0,), lambda b: (0,), memory_space=pltpu.SMEM
                )
            )
        else:
            for e in dense:
                args.append(e)
                specs.append(blk_at(0))
        for fp in facets:
            args.append(fp["xp"])
            specs.append(
                pl.BlockSpec(
                    (2, G1, G2), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
                )
            )
            for s in range(S):
                args.append(fp["ye"])
                specs.append(
                    pl.BlockSpec(
                        (bep, 2, G2),
                        lambda b, s=s: (jnp.clip(b - s, 0, B), 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
            for s in range(S):
                args.append(fp["ze"])
                specs.append(
                    pl.BlockSpec(
                        (bep, G1, 2),
                        lambda b, s=s: (jnp.clip(b - s, 0, B), 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
        out_shape = (
            jax.ShapeDtypeStruct(gd, dtype),
            jax.ShapeDtypeStruct(gd, dtype),
        )
        out_specs = (blk_at(S - 1), blk_at(S - 1))
        scratch = (
            [pltpu.VMEM((_DEPTH_STATE * bep, G1, G2), dtype)] * 2
            + [
                pltpu.VMEM((_DEPTH_KV[j] * bep, G1, G2), dtype)
                for j in range(3)
            ]
            + [pltpu.VMEM((_DEPTH_STATE * bep, G1, G2), dtype)] * nde_k
            + [pltpu.VMEM((S, G1, G2), dtype)]
        )
        return pl.pallas_call(
            kernel,
            grid=(B + S,),
            in_specs=specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={0: 0, 1: 1},
            scratch_shapes=scratch,
            interpret=pk.interpret,
            compiler_params=None
            if pk.interpret
            else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_WAVE_VMEM_LIMIT,
            ),
        )(*args)

    # ---------------------------------------------------------------- step

    def make_step(self, consts_to_Fs, consts_to_extras, band_fn=None):
        assert band_fn is None, "wave step has no band injection point"
        assert self.nstage == 4
        import numpy as np

        from .pallas_stage import source_coefs

        a_t, b_t, c_t = self.a_tab, self.b_tab, self.c_tab
        n = self.nstage
        dtype = self.dtype
        kind = self.kind
        nfa = len(KIND_FACET[kind])
        W = 2 + (nfa - 1) + 1 + (n - 1) + n  # final-row width

        def step(consts, carry, dtn):
            u0, v0, t = carry
            Fs = consts_to_Fs(consts)
            extras = consts_to_extras(consts)
            rows = []
            for i in range(n):
                alpha = a_t[i] * dtn
                beta = (a_t[i] * a_t[i - 1] if i >= 1 else 0.0) * dtn * dtn
                srcs = source_coefs(kind, consts, t + c_t[i] * dtn)
                parts = [alpha, beta] + srcs
                if i == n - 1:
                    cu = [
                        b_t[j + 1] * a_t[j + 1] * dtn * dtn
                        for j in range(n - 1)
                    ]
                    db = [b_t[j] * dtn for j in range(n)]
                    parts += [float(np.sum(b_t)) * dtn] + cu + db
                row = jnp.stack([jnp.asarray(pp, dtype) for pp in parts])
                rows.append(
                    jnp.pad(row, (0, W - row.shape[0]))
                    if row.shape[0] < W
                    else row
                )
            scal4 = jnp.stack(rows)
            u1, v1 = self._step_call(u0, v0, scal4, Fs, extras)
            return (u1.reshape(self.pk.gdims), v1.reshape(self.pk.gdims), t + dtn), None

        # 3D carry: see pallas_stage_v3.make_step
        step.carry_shape = tuple(self.pk.gdims)
        return step
