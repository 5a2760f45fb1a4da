"""Fused Pallas stiffness kernels for the uniform-lattice fast path.

The XLA lattice path (ops/lattice.py) materializes the unfold → D-contract →
scale → Dᵀ-contract → fold chain in HBM (~6 full-volume passes per axis,
measured ~10 ms/axis at 57M DOF). These kernels fuse the whole per-axis
chain in VMEM: each grid block reads its input tile once and writes its
output tile once — the entire contraction-axis extent lives in the block,
so the overlapping cell-window fold never crosses block boundaries and no
cross-block accumulation is needed.

Key algebraic simplification: for a rank-1 (constant-coefficient) scale the
perpendicular weight factors are constant along the contraction axis, so
they commute with Dᵀ and are applied OUTSIDE the kernel as one broadcast
multiply (fused by XLA into the axis-sum). Each kernel therefore computes
only  y_a = fold(Bᵀ(s_along ∘ B · unfold(x)))  along its axis.

Window contractions are MXU matmuls [q=cc·N, w] with K = w = cc·p+1 near
the 128-lane sweet spot. Heterogeneous (per-cell) media fall back to the
XLA lattice path. Equivalence: ``tests/test_pallas.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lattice import _banded_derivative


def _make_kernel_first(rows, nb, stride, width, prec):
    """Contract along the FIRST axis of a [G, TR] tile."""

    def kernel(x_ref, b_ref, bt_ref, s_ref, out_ref):
        x = x_ref[:, :]
        B = b_ref[:, :]
        Bt = bt_ref[:, :]
        out_ref[:, :] = jnp.zeros_like(x)
        for wdw in range(nb):
            lo = wdw * stride
            xw = x[lo : lo + width, :]
            u = jnp.dot(B, xw, precision=prec, preferred_element_type=x.dtype)
            su = u * s_ref[0, wdw * rows : (wdw + 1) * rows][:, None]
            yw = jnp.dot(Bt, su, precision=prec, preferred_element_type=x.dtype)
            out_ref[lo : lo + width, :] += yw

    return kernel


def _make_kernel_first_batched(rows, nb, stride, width, prec):
    """Same, on the MIDDLE axis of a [1, G, TR] tile (batch grid over axis 0)."""

    def kernel(x_ref, b_ref, bt_ref, s_ref, out_ref):
        x = x_ref[0, :, :]
        B = b_ref[:, :]
        Bt = bt_ref[:, :]
        out_ref[0, :, :] = jnp.zeros_like(x)
        for wdw in range(nb):
            lo = wdw * stride
            xw = x[lo : lo + width, :]
            u = jnp.dot(B, xw, precision=prec, preferred_element_type=x.dtype)
            su = u * s_ref[0, wdw * rows : (wdw + 1) * rows][:, None]
            yw = jnp.dot(Bt, su, precision=prec, preferred_element_type=x.dtype)
            out_ref[0, lo : lo + width, :] += yw

    return kernel


def _make_kernel_last(rows, nb, stride, width, prec):
    """Contract along the LAST axis of a [TR, G] tile. Takes the transposed
    matrices (Bᵀ [width, rows] and B [rows, width]) as right-operands."""

    def kernel(x_ref, bT_ref, b_ref, s_ref, out_ref):
        x = x_ref[:, :]
        BT = bT_ref[:, :]  # [width, rows]
        Bb = b_ref[:, :]  # [rows, width]
        out_ref[:, :] = jnp.zeros_like(x)
        for wdw in range(nb):
            lo = wdw * stride
            xw = x[:, lo : lo + width]
            u = jnp.dot(xw, BT, precision=prec, preferred_element_type=x.dtype)
            su = u * s_ref[0, wdw * rows : (wdw + 1) * rows]
            yw = jnp.dot(su, Bb, precision=prec, preferred_element_type=x.dtype)
            out_ref[:, lo : lo + width] += yw

    return kernel


class PallasLatticeStiffness:
    """Fused stiffness apply on a uniform axis-aligned 3D lattice with a
    spatially constant coefficient."""

    def __init__(self, lattice, tile_rows: int = 512, precision=None):
        from .lattice import _precision as _lat_precision

        precision = precision or _lat_precision()
        assert lattice.d == 3, "pallas path implemented for 3D"
        self.lat = lattice
        self.tile_rows = tile_rows
        self.precision = precision

    def _pallas_chunk(self, a: int) -> int:
        """Window chunk for the in-kernel matmuls. Measured on v5e: small
        windows (K=cc·p+1≈33) slightly beat near-128 K despite the MXU
        padding — the kernel is not MXU-throughput-bound at these sizes.
        The window stride cc·p must be sublane-aligned (multiple of 8) or
        Mosaic rejects the strided VMEM slices; returns None if no valid
        chunk exists (caller falls back to the XLA path)."""
        n, p, N = self.lat.grid[a], self.lat.p, self.lat.N

        def ok(c):
            # stride AND output-row count must be sublane-aligned: a config
            # with rows=30 (cc=6, p=4) crashed the TPU worker outright.
            return (
                n % c == 0
                and (c * p) % 8 == 0
                and (c * N) % 8 == 0
                and c * p + 1 <= 160
            )

        best = None
        for c in range(1, n + 1):
            if ok(c) and c * p + 1 <= 40:
                best = c
        if best is None:
            for c in range(1, n + 1):
                if ok(c):
                    best = c
                    break
        return best

    def usable(self) -> bool:
        return all(self._pallas_chunk(a) is not None for a in range(3))

    def _axis_parts(self, a: int, dtype):
        lat = self.lat
        cc = self._pallas_chunk(a)
        stride, width = cc * lat.p, cc * lat.p + 1
        nb = lat.grid[a] // cc
        B = _banded_derivative(cc, lat.p)
        s_along = lat._geo[a] * np.tile(np.tile(lat._w1, cc), nb)
        return (
            jnp.asarray(B, dtype),
            jnp.asarray(np.ascontiguousarray(B.T), dtype),
            nb,
            stride,
            width,
            jnp.asarray(s_along, dtype),
        )

    def _sperp(self, a: int, dtype):
        """Perpendicular rank-1 scale as a broadcastable 3D factor."""
        lat = self.lat
        shape = [1, 1, 1]
        out = 1.0
        for b in range(3):
            if b == a:
                continue
            v = np.asarray(lat._wg[b])
            sh = [1, 1, 1]
            sh[b] = v.size
            out = out * jnp.asarray(v.reshape(sh), dtype)
        return out

    def apply(self, x, coeff: float):
        """y = K_coeff x;  x lattice-shaped [G0, G1, G2]."""
        lat = self.lat
        dtype = x.dtype
        G0, G1, G2 = lat.gdims

        # axis 0: [G0, R] tiles
        B, Bt, nb, stride, width, s_al = self._axis_parts(0, dtype)
        R = G1 * G2
        TR = self.tile_rows
        pad = (-R) % TR
        x0 = x.reshape(G0, R)
        if pad:
            x0 = jnp.pad(x0, ((0, 0), (0, pad)))
        rows = B.shape[0]
        y0 = pl.pallas_call(
            _make_kernel_first(rows, nb, stride, width, self.precision),
            grid=((R + pad) // TR,),
            in_specs=[
                pl.BlockSpec((G0, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, rows), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb * rows), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G0, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G0, R + pad), dtype),
        )(x0, B, Bt, s_al[None, :])
        y0 = (y0[:, :R] if pad else y0).reshape(lat.gdims)
        y = coeff * self._sperp(0, dtype) * y0

        # axis 1: batch over axis 0, [1, G1, TR] tiles over axis 2
        B, Bt, nb, stride, width, s_al = self._axis_parts(1, dtype)
        pad2 = (-G2) % 128
        R2 = G2 + pad2
        x1 = jnp.pad(x, ((0, 0), (0, 0), (0, pad2))) if pad2 else x
        # TR2 must DIVIDE R2: the grid is R2//TR2 blocks, and a remainder
        # would silently never be written (caused 6% relative error at
        # G2=513 where R2=640, TR2=512 dropped columns 512:640).
        TR2 = min(self.tile_rows, R2)
        while R2 % TR2 != 0:
            TR2 -= 128
        rows = B.shape[0]
        y1 = pl.pallas_call(
            _make_kernel_first_batched(rows, nb, stride, width, self.precision),
            grid=(G0, R2 // TR2),
            in_specs=[
                pl.BlockSpec(
                    (1, G1, TR2), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((rows, width), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, rows), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb * rows), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, G1, TR2), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G0, G1, R2), dtype),
        )(x1, B, Bt, s_al[None, :])
        y1 = y1[:, :, :G2] if pad2 else y1
        y = y + coeff * self._sperp(1, dtype) * y1

        # axis 2: [TR, G2] tiles over flattened (G0, G1)
        B, Bt, nb, stride, width, s_al = self._axis_parts(2, dtype)
        R = G0 * G1
        TRr = self.tile_rows
        padr = (-R) % TRr
        x2 = x.reshape(R, G2)
        if padr:
            x2 = jnp.pad(x2, ((0, padr), (0, 0)))
        rows = B.shape[0]
        y2 = pl.pallas_call(
            _make_kernel_last(rows, nb, stride, width, self.precision),
            grid=((R + padr) // TRr,),
            in_specs=[
                pl.BlockSpec((TRr, G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, rows), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb * rows), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TRr, G2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R + padr, G2), dtype),
        )(x2, Bt, B, s_al[None, :])
        y2 = (y2[:R] if padr else y2).reshape(lat.gdims)
        y = y + coeff * self._sperp(2, dtype) * y2
        return y
