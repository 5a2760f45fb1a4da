"""Single-pass fused explicit-RK stage (v3): ONE kernel per stage.

The v2 stage (``pallas_stage.py``) runs kernel A (axis-0 partial, written to
HBM) then kernel B (axes 1/2 + epilogue), so each stage pays the axis-0
partial's round trip plus a second read of every state field. This version
applies the ``pallas_v3`` structure to the whole slope evaluation:

* grid walks element-aligned plane blocks along axis 0 (sequential,
  ``dimension_semantics="arbitrary"``);
* the stage fields un/vn are rebuilt per *window row* from (u0, v0,
  kv_{i-1}, kv_{i-2}) in VMEM — the one-row block overlap of the axis-0
  window comes from strided ``[::be·p]`` boundary operands of each state
  field (index map one block ahead);
* axis 0 = banded K1 plane combinations on the VPU with the packed F0
  scale; the element-boundary row partial is carried across grid steps in a
  scratch plane;
* axes 1/2 = per-plane banded matmuls on the MXU (v2 kernel B);
* the epilogue (facet source/ABC corrections, (non)linear lumped-mass
  divide, final-stage step update into donated buffers) is unchanged from
  v2 — it runs per plane on values already in VMEM.

HBM traffic per stage ≈ read the state fields once + write kv (or u1/v1) —
the axis-0 partial never exists in HBM.

Same reference scope as v2: the f1 slope evaluation of
``cpp/fenicsx-sf/common/Westervelt.hpp:216-281`` and the RK4 driver
``Linear.hpp:228-314``, fused into one launch per stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lattice import _VMEM_LIMIT, _k1_matrix
from .pallas_stage import (
    KIND_DENSE,
    KIND_FACET,
    FusedRKStage,
    _epilogue,
    _facet_corrections,
)


def _pick_be(n0: int, p: int, n_field_ops: int, gdims):
    """Elements per block: total field-sized windows (double-buffered, at
    their PADDED VMEM footprint — (8, 128) tiles) must fit a ~60MB budget
    (the 120MB scoped-VMEM limit minus matmul temps, bk operands, the
    carry plane and F windows). Returns None when even be=1 does not fit
    — callers fall back to the unfused scan. The unconditional ``return
    1`` this replaces OOM'd Mosaic at p=6 on 541² planes (round 4:
    172.4M requested of 128M capacity)."""
    import os

    from .pallas_lattice import _pad_plane

    env = os.environ.get("FUS_BE")
    G0, G1, G2 = gdims
    plane = _pad_plane(G1, G2)
    if env:
        be = min(max(int(env), 1), n0)
        while n0 % be:
            be -= 1
        return be
    for be in (4, 2, 1):
        if n0 % be:
            continue
        if n_field_ops * be * p * plane * 2 <= 60 << 20:
            return be
    return None


class FusedRKStageV3(FusedRKStage):
    """Drop-in replacement for ``FusedRKStage`` building one pallas call per
    stage instead of the kernel A/B pair. Reuses its table/scal layout,
    packing helpers and ``make_step`` driver."""

    def usable(self, band: bool = False) -> bool:
        """True iff the WORST stage (the final one: full state + prev
        slopes + dense fields + two outputs) fits the VMEM window budget.
        Callers fall back to the unfused scan otherwise (p>=5 Westervelt
        on ~550^2 planes is the known no-fit case on v5e)."""
        nde = len(KIND_DENSE[self.kind])
        ns_state = 2 + min(2, self.nstage - 1)
        n_prev = max(0, self.nstage - 3)
        worst = ns_state + n_prev + nde + 2 + (1 if band else 0)
        return (
            _pick_be(self.pk.grid[0], self.pk.p, worst, self.pk.gdims)
            is not None
        )

    # ------------------------------------------------------------ the call

    def _stage_call(self, u0, v0, kvp, kvpp, prev_kvs, scal, Fs, extras,
                    final, band=None):
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

        state = [u0, v0] + [z for z in (kvp, kvpp) if z is not None]
        ns_state = len(state)
        has_kvp = kvp is not None
        has_kvpp = kvpp is not None
        n_prev = len(prev_kvs)

        has_band = band is not None
        n_field_ops = (
            ns_state + n_prev + nde + (2 if final else 1) + int(has_band)
        )
        be = _pick_be(n0, p, n_field_ops, gd)
        if be is None:
            raise ValueError(
                f"v3 stage VMEM: no block size fits gdims={gd} p={p} with "
                f"{n_field_ops} double-buffered field windows; use the "
                "unfused scan (FUS_FUSED=0) or reduce the lateral grid"
            )
        bep = be * p
        B = n0 // be
        nb_f0 = (n0 + be - 1) // be

        state = [x.reshape(gd) for x in state]
        state_b = [x[::bep] for x in state]  # block-boundary planes [B+1,...]
        prev_kvs = [x.reshape(gd) for x in prev_kvs]
        import os as _os

        # row-batched axes-1/2 (see pallas_v3 / _axis_rows_apply)
        rowbatch = _os.environ.get("FUS_V3_ROWS", "") == "1"

        def kernel(*refs):
            b = pl.program_id(0)
            i = 0
            sm = [refs[i + j] for j in range(ns_state)]; i += ns_state
            sb = [refs[i + j] for j in range(ns_state)]; i += ns_state
            prev = [refs[i + j] for j in range(n_prev)]; i += n_prev
            scal_r = refs[i]; i += 1
            F0s = [refs[i + f] for f in range(nf)]; i += nf
            F1s = [refs[i + f] for f in range(nf)]; i += nf
            F2s = [refs[i + f] for f in range(nf)]; i += nf
            bks = {bk_keys[j]: refs[i + j][:, :] for j in range(nbk)}; i += nbk
            dense_r = [refs[i + j] for j in range(nde)]; i += nde
            band_r = None
            if has_band:
                band_r = refs[i]; i += 1
            fv = []
            for _j in range(nfa):
                fv.append((refs[i], refs[i + 1], refs[i + 2]))
                i += 3
            if final:
                out_u, out_v = refs[i], refs[i + 1]
                carry = refs[i + 2]
            else:
                out_kv = refs[i]
                carry = refs[i + 1]
            alpha, beta = scal_r[0, 0], scal_r[0, 1]

            def ld(ref, r):
                """Plane r of a [rows, ...] block ref (dynamic r)."""
                idx = (pl.ds(r, 1),) + (slice(None),) * (len(ref.shape) - 1)
                return ref[idx][0]

            def axes12(f, plane_2d, r):
                y = pk._axis_chunk_apply(
                    plane_2d, plan1, bks, ld(F1s[f], r), hetero[f], prec,
                    last_axis=False,
                )
                y2 = pk._axis_chunk_apply(
                    plane_2d, plan2, bks, ld(F2s[f], r), hetero[f], prec,
                    last_axis=True,
                )
                return y + y2.T

            def emit(r, srows, un_r, vn_r, acc):
                """Epilogue for output row r: facet corrections, mass
                divide, and (final stage) the step update."""
                if has_band:
                    # hybrid (bowl-deformed) mesh: add the deformed-slab
                    # stiffness correction computed outside the kernel
                    acc = acc + ld(band_r, r)
                g0 = b * bep + r
                coefs = [scal_r[0, 2 + j] for j in range(nfa - 1)] + ["abc"]
                fvals = [
                    (xp[:, :, :], ld(ye, r), ld(ze, r))
                    for (xp, ye, ze) in fv
                ]
                corr = _facet_corrections(fvals, coefs, vn_r, g0, G0)
                dvals = [ld(d, r) for d in dense_r]
                kv = _epilogue(kind, acc, un_r, vn_r, dvals, corr)
                if not final:
                    out_kv[pl.ds(r, 1), :, :] = kv[None, :, :]
                    return
                kvs = (
                    [ld(pr, r) for pr in prev]
                    + ([srows[3]] if has_kvpp else [])
                    + ([srows[2]] if has_kvp else [])
                    + [kv]
                )
                ns = len(kvs)
                off = 2 + (nfa - 1)
                u1 = srows[0] + scal_r[0, off] * srows[1]
                for j in range(ns - 1):
                    u1 = u1 + scal_r[0, off + 1 + j] * kvs[j]
                v1 = srows[1]
                for i_s in range(ns):
                    v1 = v1 + scal_r[0, off + 1 + (ns - 1) + i_s] * kvs[i_s]
                out_u[pl.ds(r, 1), :, :] = u1[None, :, :]
                out_v[pl.ds(r, 1), :, :] = v1[None, :, :]

            @pl.when(b == 0)
            def _():
                carry[:, :] = jnp.zeros((G1, G2), dtype)

            @pl.when(b < B)
            def _():
                # One fori_loop iteration per element: the body is traced
                # once (the unrolled original compiled ~be× the Mosaic
                # program — 15+ min at production sizes).
                def element(e, boundary):
                    # state rows of the element's N+1-row window, loaded
                    # once; row e·p+p comes from the next element or (last
                    # element) the next block's strided boundary operand
                    st_rows = []
                    for j in range(N):
                        r = e * p + j
                        if j < p:
                            st_rows.append(
                                [ld(sm[q], r) for q in range(ns_state)]
                            )
                        else:
                            rm = jnp.minimum(r, bep - 1)
                            st_rows.append([
                                jnp.where(
                                    e == be - 1,
                                    sb[q][0, :, :],
                                    ld(sm[q], rm),
                                )
                                for q in range(ns_state)
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
                    fields = [[un for un, _ in rows], [vn for _, vn in rows]]
                    z_rows = []
                    for k in range(N):
                        acc = None
                        for f in range(nf):
                            zk = None
                            for j in range(N):
                                w = float(K1[k, j])
                                t = w * fields[f][j]
                                zk = t if zk is None else zk + t
                            s = (
                                ld(F0s[f], e)
                                if hetero[f]
                                else F0s[f][0, :, :]
                            )
                            zk = zk * s
                            acc = zk if acc is None else acc + zk
                        z_rows.append(acc)
                    if rowbatch:
                        rs = [e * p + k for k in range(p)]
                        accs = None
                        for f in range(nf):
                            ys = pk._axis_rows_apply(
                                [fields[f][k] for k in range(p)], plan1,
                                bks, [ld(F1s[f], r) for r in rs],
                                hetero[f], prec, last_axis=False,
                            )
                            y2s = pk._axis_rows_apply(
                                [fields[f][k] for k in range(p)], plan2,
                                bks, [ld(F2s[f], r) for r in rs],
                                hetero[f], prec, last_axis=True,
                            )
                            ts = [y + y2.T for y, y2 in zip(ys, y2s)]
                            accs = (
                                ts if accs is None
                                else [a + t for a, t in zip(accs, ts)]
                            )
                        for k in range(p):
                            y0 = z_rows[k]
                            if k == 0:
                                y0 = y0 + boundary
                            un_r, vn_r = rows[k]
                            emit(
                                e * p + k, st_rows[k], un_r, vn_r,
                                y0 + accs[k],
                            )
                        return z_rows[p]
                    for k in range(p):
                        r = e * p + k
                        y0 = z_rows[k]
                        if k == 0:
                            y0 = y0 + boundary
                        un_r, vn_r = rows[k]
                        acc12 = None
                        for f in range(nf):
                            t = axes12(f, fields[f][k], r)
                            acc12 = t if acc12 is None else acc12 + t
                        emit(r, st_rows[k], un_r, vn_r, y0 + acc12)
                    return z_rows[p]

                import os as _os

                # default: fori body (round 3, hardware-validated; ~be×
                # smaller program kills the per-shape compile tax).
                # FUS_V3_UNROLL=1 opts back into the unrolled body.
                if _os.environ.get("FUS_V3_UNROLL", "") == "1":
                    bnd = carry[:, :]
                    for e in range(be):
                        bnd = element(e, bnd)
                    carry[:, :] = bnd
                else:
                    carry[:, :] = jax.lax.fori_loop(
                        0, be, element, carry[:, :]
                    )

            @pl.when(b == B)
            def _():
                srows0 = [sm[q][0, :, :] for q in range(ns_state)]
                un_r, vn_r = self._stage_fields(
                    srows0[0], srows0[1],
                    srows0[2] if has_kvp else None,
                    srows0[3] if has_kvpp else None,
                    alpha, beta,
                )
                fields0 = (un_r,) if nf == 1 else (un_r, vn_r)
                acc12 = None
                for f in range(nf):
                    t = axes12(f, fields0[f], 0)
                    acc12 = t if acc12 is None else acc12 + t
                emit(0, srows0, un_r, vn_r, carry[:, :] + acc12)

        # ---- operands
        args, specs = [], []
        blk = pl.BlockSpec(
            (bep, G1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        for x in state:
            args.append(x)
            specs.append(blk)
        for x in state_b:
            args.append(x)
            specs.append(
                pl.BlockSpec(
                    (1, G1, G2),
                    lambda b: (jnp.minimum(b + 1, B), 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        for x in prev_kvs:
            args.append(x)
            specs.append(blk)
        args.append(scal)
        specs.append(
            pl.BlockSpec((1, scal.shape[1]), lambda b: (0, 0), memory_space=pltpu.SMEM)
        )
        for f in range(nf):
            F0 = Fs[f]["F0"]
            args.append(F0)
            if hetero[f]:
                specs.append(
                    pl.BlockSpec(
                        (be, G1, G2),
                        lambda b: (jnp.minimum(b, nb_f0 - 1), 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
            else:
                specs.append(
                    pl.BlockSpec(
                        (1, G1, G2), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
                    )
                )
        for f in range(nf):
            n1 = Fs[f]["F1"].shape[1]
            args.append(Fs[f]["F1"])
            specs.append(
                pl.BlockSpec((bep, n1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            )
        for f in range(nf):
            n2 = Fs[f]["F2"].shape[1]
            args.append(Fs[f]["F2"])
            specs.append(
                pl.BlockSpec((bep, n2, G1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            )
        for bk in bk_ops:
            args.append(bk)
            specs.append(
                pl.BlockSpec(bk.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
            )
        for e in dense:
            args.append(e.reshape(gd))
            specs.append(blk)
        if has_band:
            args.append(band)
            specs.append(blk)
        for fp in facets:
            args.append(fp["xp"])
            specs.append(
                pl.BlockSpec((2, G1, G2), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(fp["ye"])
            specs.append(
                pl.BlockSpec((bep, 2, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(fp["ze"])
            specs.append(
                pl.BlockSpec((bep, G1, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            )
        if final:
            out_shape = (
                jax.ShapeDtypeStruct(gd, dtype),
                jax.ShapeDtypeStruct(gd, dtype),
            )
            out_specs = (blk, blk)
            aliases = {0: 0, 1: 1}  # donate u0/v0 into u1/v1
        else:
            out_shape = jax.ShapeDtypeStruct(gd, dtype)
            out_specs = blk
            aliases = {}
        return pl.pallas_call(
            kernel,
            grid=(B + 1,),
            in_specs=specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            scratch_shapes=[pltpu.VMEM((G1, G2), dtype)],
            interpret=pk.interpret,
            compiler_params=None
            if pk.interpret
            else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM_LIMIT
            ),
        )(*args)

    # --------------------------------------------------- make_step override

    def make_step(self, consts_to_Fs, consts_to_extras, band_fn=None):
        """Same driver as v2 but each stage is ONE fused pallas call.

        ``band_fn(consts, u0, v0, kvp, kvpp, alpha, beta) -> [G0,G1,G2]``
        (optional) supplies the hybrid (bowl-deformed) slab stiffness
        correction per stage, computed in XLA from the same stage-field
        recurrence the kernel uses internally; the kernel adds it to the
        assembled stiffness before the epilogue."""
        import numpy as np

        from .pallas_stage import source_coefs

        a_t, b_t, c_t = self.a_tab, self.b_tab, self.c_tab
        n = self.nstage
        dtype = self.dtype
        kind = self.kind

        def step(consts, carry, dtn):
            u0, v0, t = carry
            Fs = consts_to_Fs(consts)
            extras = consts_to_extras(consts)
            kvs = []
            out = None
            for i in range(n):
                kvp = kvs[i - 1] if i >= 1 else None
                kvpp = kvs[i - 2] if i >= 2 else None
                alpha = a_t[i] * dtn
                beta = (a_t[i] * a_t[i - 1] if i >= 1 else 0.0) * dtn * dtn
                srcs = source_coefs(kind, consts, t + c_t[i] * dtn)
                final = i == n - 1
                if final:
                    cu = [b_t[j + 1] * a_t[j + 1] * dtn * dtn for j in range(n - 1)]
                    db = [b_t[j] * dtn for j in range(n)]
                    parts = (
                        [alpha, beta] + srcs
                        + [float(np.sum(b_t)) * dtn] + cu + db
                    )
                else:
                    parts = [alpha, beta] + srcs
                scal = jnp.stack(
                    [jnp.asarray(pp, dtype) for pp in parts]
                ).reshape(1, -1)
                kvp_a = kvp.reshape(self.pk.gdims) if kvp is not None else None
                kvpp_a = kvpp.reshape(self.pk.gdims) if kvpp is not None else None
                u0a = u0.reshape(self.pk.gdims)
                v0a = v0.reshape(self.pk.gdims)
                band = (
                    band_fn(consts, u0a, v0a, kvp_a, kvpp_a, alpha, beta)
                    if band_fn is not None
                    else None
                )
                if final:
                    u1, v1 = self._stage_call(
                        u0a, v0a, kvp_a, kvpp_a, kvs[: max(0, i - 2)],
                        scal, Fs, extras, final=True, band=band,
                    )
                    out = (u1, v1, t + dtn)
                else:
                    kv = self._stage_call(
                        u0a, v0a, kvp_a, kvpp_a, [], scal, Fs, extras,
                        final=False, band=band,
                    )
                    kvs.append(kv)
            return out, None

        # the scan carries u/v in the kernel's 3D lattice shape:
        # a flat [n] carry forces a physical retiling copy per
        # step on TPU (1D and 3D layouts differ) — measured ~11
        # ms/step at 417^3 (benchmarks/wave_attrib.py)
        step.carry_shape = tuple(self.pk.gdims)
        return step
