"""Single-pass Pallas lattice stiffness (v3): one kernel, ~2 field passes.

The v2 path (``pallas_lattice.py``) splits the apply into kernel A (axis 0)
and kernel B (axes 1+2), costing ~5 full-field HBM passes (x read twice, the
axis-0 partial written + read back, y written). v3 fuses everything into ONE
kernel that walks element-aligned plane blocks along axis 0:

* **axis 0 on the VPU.** Within a block of ``be`` elements, output row
  (c, k) is ``Σ_j K1[k, j]·x[c·p+j]`` scaled by the packed F0 plane of cell
  c — a banded linear combination of resident planes with *scalar*
  compile-time weights; no matmul, no extra HBM traffic.
* **the one-row block overlap** (the axis-0 window of a block's last element
  ends on the FIRST row of the next block) is fed as a second, strided
  operand ``xb = x[::be·p]`` whose index map points one block ahead —
  regular BlockSpec pipelining, no manual DMA (Mosaic cannot slice HBM
  memrefs whose trailing dims aren't tile-aligned).
* **the element-boundary output row** (c, p) = (c+1, 0) sums two cells;
  across blocks the partial is carried in a scratch plane — TPU grids run
  sequentially (``dimension_semantics="arbitrary"``) and scratch persists
  across steps.
* **axes 1+2 on the MXU**, per plane, exactly as v2 kernel B
  (``_axis_chunk_apply`` with the banded K1 operands).
* The final lattice row n0·p is the first row of the last (padded) grid
  block: its axis-0 value is complete in the carry, its axes-1/2 need only
  its own plane; the padding rows beyond it are never written.

HBM traffic per apply ≈ x once + the strided boundary planes (~2/be·p) +
Fs + y once — ~2.2 passes constant-coefficient vs ~5 for v2.

Replaces the same reference operator: ``cpp/fenicsx-sf/common/
spectral_op.hpp:173-243`` (StiffnessSpectral3D).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lattice import _VMEM_LIMIT, _k1_matrix


def _pick_be(n0: int, p: int, n_fields: int, gdims) -> int:
    """Elements per block: largest of (4, 2, 1) dividing n0 whose blocks
    (double-buffered in and out) fit a ~48MB budget."""
    env = os.environ.get("FUS_BE")
    if env:
        be = min(max(int(env), 1), n0)
        while n0 % be:  # blocks must tile the element axis exactly
            be -= 1
        return be
    G0, G1, G2 = gdims
    plane = G1 * G2 * 4
    for be in (4, 2, 1):
        if n0 % be:
            continue
        need = 2 * plane * (n_fields + 1) * be * p
        if need <= 48 << 20:
            return be
    return 1


def apply_v3(pk, xs, Fs):
    """y = Σ_f K_{coeff_f}(x_f) in one fused kernel.

    ``pk``: a ``LatticePallasStiffness`` (plans, banded operands, packing);
    ``xs``: lattice-shaped fields; ``Fs``: packed dicts from
    ``pack_const``/``pack_field``.
    """
    G0, G1, G2 = pk.gdims
    p, N = pk.p, pk.N
    n0 = pk.grid[0]
    nf = len(xs)
    dtype = pk.lat.dtype
    xs = [x.reshape(pk.gdims) for x in xs]
    hetero = tuple(F["F0"].shape[0] != 1 for F in Fs)
    bk_keys, bk_ops = pk._bk_ops
    nbk = len(bk_keys)
    prec = pk._prec()
    plan1, plan2 = pk.plans[1], pk.plans[2]
    K1 = _k1_matrix(p)  # [N, N] scalar weights, closed over as immediates

    be = _pick_be(n0, p, nf, pk.gdims)
    bep = be * p
    B = n0 // be  # element blocks; grid step B handles the final row
    nb_f0 = (n0 + be - 1) // be
    xbs = [x[::bep] for x in xs]  # [B+1, G1, G2] block-boundary planes
    interp = pk.interpret
    # row-batched axes-1/2 (one quadrant-stacked dot per chunk for the
    # element's p rows — see _axis_rows_apply); opt-in until gated on chip
    rowbatch = os.environ.get("FUS_V3_ROWS", "") == "1"

    def kernel(*refs):
        b = pl.program_id(0)
        i = 0
        xm = [refs[i + f] for f in range(nf)]; i += nf  # main blocks
        xb = [refs[i + f] for f in range(nf)]; i += nf  # next-boundary plane
        F0s = [refs[i + f] for f in range(nf)]; i += nf
        F1s = [refs[i + f] for f in range(nf)]; i += nf
        F2s = [refs[i + f] for f in range(nf)]; i += nf
        bks = {bk_keys[j]: refs[i + j][:, :] for j in range(nbk)}; i += nbk
        out_ref = refs[i]
        carry = refs[i + 1]

        def ld(ref, r):
            """Plane r of a [rows, G1, G2] block ref (dynamic r)."""
            return ref[pl.ds(r, 1), :, :][0, :, :]

        def axes12(f, plane_2d, r):
            """axes-1/2 contribution of one [G1, G2] plane (v2 kernel B)."""
            y = pk._axis_chunk_apply(
                plane_2d, plan1, bks, ld(F1s[f], r), hetero[f], prec,
                last_axis=False,
            )
            y2 = pk._axis_chunk_apply(
                plane_2d, plan2, bks, ld(F2s[f], r), hetero[f], prec,
                last_axis=True,
            )
            return y + y2.T

        @pl.when(b == 0)
        def _():
            # scratch starts as garbage (possibly NaN) — zero the carry
            carry[:, :] = jnp.zeros((G1, G2), dtype)

        @pl.when(b < B)
        def _():
            # One fori_loop iteration per element (the per-element body is
            # traced/compiled ONCE — the unrolled original compiled ~be×
            # the Mosaic program, 15+ min at production sizes).
            def element(e, boundary):
                # the element's N+1 window rows per field, loaded once and
                # reused by the k-loop below. Row e·p+p belongs to the next
                # element (or, for the block's last element, to the next
                # BLOCK via the strided boundary operand).
                rows = []
                for f in range(nf):
                    rf = [ld(xm[f], e * p + j) for j in range(p)]
                    last_main = ld(xm[f], jnp.minimum(e * p + p, bep - 1))
                    rf.append(
                        jnp.where(e == be - 1, xb[f][0, :, :], last_main)
                    )
                    rows.append(rf)
                z_rows = []
                for k in range(N):
                    acc = None
                    for f in range(nf):
                        zk = None
                        for j in range(N):
                            w = float(K1[k, j])
                            t = w * rows[f][j]
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
                    accs = None
                    for f in range(nf):
                        rs = [e * p + k for k in range(p)]
                        ys = pk._axis_rows_apply(
                            [rows[f][k] for k in range(p)], plan1, bks,
                            [ld(F1s[f], r) for r in rs], hetero[f], prec,
                            last_axis=False,
                        )
                        y2s = pk._axis_rows_apply(
                            [rows[f][k] for k in range(p)], plan2, bks,
                            [ld(F2s[f], r) for r in rs], hetero[f], prec,
                            last_axis=True,
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
                        out_ref[pl.ds(e * p + k, 1), :, :] = (
                            y0 + accs[k]
                        )[None, :, :]
                    return z_rows[p]
                for k in range(p):  # rows e*p+k, k<p: owned by this block
                    r = e * p + k
                    y0 = z_rows[k]
                    if k == 0:
                        y0 = y0 + boundary
                    acc12 = None
                    for f in range(nf):
                        t = axes12(f, rows[f][k], r)
                        acc12 = t if acc12 is None else acc12 + t
                    out_ref[pl.ds(r, 1), :, :] = (y0 + acc12)[None, :, :]
                return z_rows[p]  # k == p: shared with the next element

            # default: fori body (round 3, hardware-validated — runtime
            # within noise of unrolled, ~be× smaller Mosaic program so new
            # production shapes skip the 15-20 min compile tax).
            # FUS_V3_UNROLL=1 opts back into the unrolled body.
            if os.environ.get("FUS_V3_UNROLL", "") == "1":
                bnd = carry[:, :]
                for e in range(be):
                    bnd = element(e, bnd)
                carry[:, :] = bnd
            else:
                carry[:, :] = jax.lax.fori_loop(0, be, element, carry[:, :])

        @pl.when(b == B)
        def _():
            # final lattice row n0*p = first row of this (padded) block:
            # axis-0 is complete in the carry, axes-1/2 need only its plane
            acc12 = None
            for f in range(nf):
                t = axes12(f, xm[f][0, :, :], 0)
                acc12 = t if acc12 is None else acc12 + t
            out_ref[0, :, :] = carry[:, :] + acc12

    # ---- operand list
    args, in_specs = [], []
    for f in range(nf):
        args.append(xs[f])
        in_specs.append(
            pl.BlockSpec((bep, G1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    for f in range(nf):
        args.append(xbs[f])
        in_specs.append(
            pl.BlockSpec(
                (1, G1, G2),
                lambda b: (jnp.minimum(b + 1, B), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    for f in range(nf):
        F0 = Fs[f]["F0"]
        if hetero[f]:
            in_specs.append(
                pl.BlockSpec(
                    (be, G1, G2),
                    lambda b: (jnp.minimum(b, nb_f0 - 1), 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (1, G1, G2), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
                )
            )
        args.append(F0)
    for f in range(nf):
        n1 = Fs[f]["F1"].shape[1]
        args.append(Fs[f]["F1"])
        in_specs.append(
            pl.BlockSpec((bep, n1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    for f in range(nf):
        n2 = Fs[f]["F2"].shape[1]
        args.append(Fs[f]["F2"])
        in_specs.append(
            pl.BlockSpec((bep, n2, G1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    for bk in bk_ops:
        args.append(bk)
        in_specs.append(
            pl.BlockSpec(bk.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        )

    return pl.pallas_call(
        kernel,
        grid=(B + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bep, G1, G2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(pk.gdims, dtype),
        scratch_shapes=[pltpu.VMEM((G1, G2), dtype)],
        interpret=interp,
        compiler_params=None
        if interp
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*args)
