"""Lattice fast path: gather-free stiffness on uniform structured meshes.

Why this exists: XLA lowers scalar-index gathers / segment-sums on TPU to
near-serial code (~0.5 GB/s measured vs ~450 GB/s HBM), so the generic
gather → per-cell contract → scatter-add assembly (reference pattern,
``cpp/fenicsx-sf/common/spectral_op.hpp:70-86``) is catastrophically slow on
TPU even though the math is right. On a *uniform axis-aligned* tensor
lattice the whole assembly is index-free:

* DOFs live on the global lattice [G0, G1, G2], Ga = na·p + 1;
* cell-unfold + 1D reference derivative along axis a is ONE dense banded
  matrix  B_a [na·N, Ga]  (rows = (cell, node), B_a[(c,k), c·p+k'] = D[k,k'])
  applied along that axis — an MXU matmul, no gather;
* the quadrature triple-sum over the *other* axes collapses onto the global
  lattice because GLL collocation makes their evaluation the identity: the
  per-axis geometry/coefficient weights fold into a scale tensor S_a in the
  mixed representation [G0, .., na·N, .., G2];
* the test-function contraction is B_aᵀ — the same matmul transposed, which
  also performs the scatter-add fold.

    K u = Σ_a  B_aᵀ ( S_a ∘ (B_a u) )        (axis-aligned ⇒ G_ab = 0, a≠b)

Heterogeneous DG-0 coefficients fold into S_a at setup (full tensors);
constant coefficients keep S_a as a rank-1 outer product (broadcast, no
extra HBM traffic). Equivalence with the generic path is asserted by
``tests/test_lattice.py``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.gll import diff_matrix, gll_points_weights_01

_PRECISION = None  # set lazily to avoid importing jax.lax at module import


def _precision():
    """Contraction precision for the lattice path. Default HIGHEST: the TPU
    default (single-pass bf16) drifts the solution ~10× worse over long RK
    runs (measured, see ops docstrings). Overridable via FUS_PRECISION for
    experiments: default|high|highest."""
    import os

    import jax

    name = os.environ.get("FUS_PRECISION", "highest").upper()
    return getattr(jax.lax.Precision, name, jax.lax.Precision.HIGHEST)


def _banded_derivative(n_cells: int, p: int) -> np.ndarray:
    """B [n_cells*N, G]: reference-space derivative + cell unfold along one
    axis. Row (c, k) holds D[k, :] at columns c*p .. c*p+p."""
    N = p + 1
    D = diff_matrix(N)
    G = n_cells * p + 1
    B = np.zeros((n_cells * N, G))
    for c in range(n_cells):
        B[c * N : (c + 1) * N, c * p : c * p + N] = D
    return B


def _folded_weights(n_cells: int, p: int) -> np.ndarray:
    """Assembled 1D GLL weights on the global lattice [G] (interface nodes
    accumulate the endpoint weight from both neighbouring cells)."""
    N = p + 1
    _, w = gll_points_weights_01(N)
    G = n_cells * p + 1
    out = np.zeros(G)
    for c in range(n_cells):
        out[c * p : c * p + N] += w
    return out


class LatticeStiffness:
    """Stiffness action on a uniform axis-aligned structured mesh.

    Parameters
    ----------
    grid : cells per axis, e.g. (nx, ny, nz)
    degree : polynomial degree p
    h : cell extents per axis
    dtype : device dtype
    """

    def __init__(self, grid, degree: int, h, dtype):
        self.grid = tuple(int(g) for g in grid)
        self.d = len(self.grid)
        self.p = degree
        self.N = degree + 1
        self.h = tuple(float(x) for x in h)
        self.dtype = dtype
        self.gdims = tuple(g * degree + 1 for g in self.grid)
        self.B = [
            jnp.asarray(_banded_derivative(self.grid[a], degree), dtype)
            for a in range(self.d)
        ]
        # per-axis 1D ingredients for the scale tensors
        _, w1 = gll_points_weights_01(self.N)
        self._w1 = w1
        self._wg = [_folded_weights(self.grid[a], degree) for a in range(self.d)]
        # detJ / h_a^2 factor per axis: prod(h) / h_a^2
        vol = float(np.prod(self.h))
        self._geo = [vol / (self.h[a] ** 2) for a in range(self.d)]

    # ------------------------------------------------------------- scales
    def scales_const(self, coeff: float):
        """Rank-1 scale factors for a spatially constant coefficient:
        returns per-axis lists of 1D vectors to broadcast-multiply."""
        out = []
        for a in range(self.d):
            vecs = []
            for b in range(self.d):
                if b == a:
                    v = np.tile(self._w1, self.grid[a])  # [na*N]
                else:
                    v = self._wg[b]  # [Gb]
                vecs.append(v)
            out.append((float(coeff) * self._geo[a], vecs))
        return out

    def scales_field(self, coeff_cells: np.ndarray):
        """Full scale tensor per axis for a DG-0 coefficient field.

        S_a[.., (c_a,k_a), ..] = geo_a * w_k * fold_{b≠a}(coeff ⊗ w_b)
        Shape: gdims with axis a replaced by n_a*N.
        """
        c = np.asarray(coeff_cells, np.float64).reshape(self.grid)
        N, p = self.N, self.p
        out = []
        for a in range(self.d):
            # start from coeff on the cell grid, expand axis a to (na*N)
            t = np.repeat(c, N, axis=a)  # cell value at each (cell, node)
            wa = np.tile(self._w1, self.grid[a])
            shape = [1] * self.d
            shape[a] = self.grid[a] * N
            t = t * wa.reshape(shape)
            # fold the other axes onto the global lattice with weights
            for b in range(self.d):
                if b == a:
                    continue
                t = self._fold_weighted(t, b)
            out.append(jnp.asarray(self._geo[a] * t, self.dtype))
        return out

    def _fold_weighted(self, t: np.ndarray, axis: int, w=None) -> np.ndarray:
        """Cell-axis → weighted global lattice fold along ``axis``:
        out[g] = Σ_{cells c ∋ g} w_{local(g,c)} · t[c].  ``w`` defaults to the
        1D GLL weights; ``stiffness_diag`` passes Σ_q w_q D[q,·]² instead."""
        n, p, N = self.grid[axis], self.p, self.N
        w = (self._w1 if w is None else np.asarray(w)).astype(t.dtype)
        tm = np.moveaxis(t, axis, 0)  # [n, ...]
        G = n * p + 1
        out = np.zeros((G,) + tm.shape[1:], t.dtype)
        for k in range(N):
            out[k::p][:n] += w[k] * tm  # node k of each cell sits at c*p+k
        return np.moveaxis(out, 0, axis)

    def scales_nodal(self, coeff_lattice: np.ndarray):
        """Scale tensors for a coefficient given at the GLL *nodes* (e.g. the
        sponge layer's δ(x), reference ``_experimental.py:770-780``): the
        coefficient is evaluated at each quadrature point, so it factors out
        of the cross-axis folds (collocation ⇒ same value in every sharing
        cell) and multiplies the mixed-rep weight pattern pointwise."""
        c = np.asarray(coeff_lattice, np.float64).reshape(self.gdims)
        out = []
        for a in range(self.d):
            t = self._unfold(c, a)  # [.., na*N, ..]
            wa = np.tile(self._w1, self.grid[a])
            shape = [1] * self.d
            shape[a] = self.grid[a] * self.N
            t = t * wa.reshape(shape)
            for b in range(self.d):
                if b == a:
                    continue
                shape = [1] * self.d
                shape[b] = self.gdims[b]
                t = t * self._wg[b].reshape(shape)
            out.append(jnp.asarray(self._geo[a] * t, self.dtype))
        return tuple(out)

    def _unfold(self, t: np.ndarray, axis: int) -> np.ndarray:
        """Global lattice → (cell, node) expansion along ``axis`` (the
        overlapping-window inverse of ``_fold_weighted`` without weights)."""
        n, p, N = self.grid[axis], self.p, self.N
        tm = np.moveaxis(t, axis, 0)
        out = np.zeros((n * N,) + tm.shape[1:])
        for k in range(N):
            out[k::N] = tm[k::p][:n]
        return np.moveaxis(out, 0, axis)

    def mass_diag_nodal(self, coeff_lattice) -> np.ndarray:
        """Lumped mass with a nodal coefficient: m[g] = coeff[g] · m_unit[g]
        (collocation ⇒ the nodal value factors out of the cell sum)."""
        base = self.mass_diag(1.0)
        return np.asarray(coeff_lattice, np.float64).reshape(-1) * base

    def mass_diag(self, coeff_cells) -> np.ndarray:
        """Assembled lumped-mass diagonal on the lattice (host, numpy):
        m[g] = Σ_{cells c ∋ g} coeff_c · w_i w_j w_k · detJ.  Returns the
        flat [ndofs] vector — the index-free analogue of the scatter-based
        ``SEMOperators.assemble_diag``. Folds run in the device dtype when
        it is float32 (this host has ONE throttled core; float64
        intermediates double the cost for no benefit on fp32 devices)."""
        npdt = np.float32 if np.dtype(self.dtype) == np.float32 else np.float64
        arr = np.asarray(coeff_cells, npdt)
        if arr.ndim == 0:
            arr = np.full(self.grid, arr, npdt)
        t = arr.reshape(self.grid) * npdt(np.prod(self.h))
        for a in range(self.d):
            t = self._fold_weighted(t, a)
        return t.reshape(-1)

    def stiffness_diag(self, coeff_cells) -> np.ndarray:
        """Assembled stiffness diagonal on the lattice (host, numpy):
        per cell diag(K)_((i,j,k)) = Σ_a geo_a · d2[i_a] · Π_{b≠a} w_{i_b}
        with d2[n] = Σ_q w_q D[q,n]² (axis-aligned ⇒ no off-diagonal G).
        Index-free analogue of ``SEMOperators.stiffness_diag``'s per-cell
        assembly — O(ndofs) memory instead of O(Nc·N^d), which makes the
        implicit (DIRK/Newmark) setup viable at 10⁷+ DOF."""
        npdt = np.float32 if np.dtype(self.dtype) == np.float32 else np.float64
        arr = np.asarray(coeff_cells, npdt)
        if arr.ndim == 0:
            arr = np.full(self.grid, arr, npdt)
        arr = arr.reshape(self.grid)
        D = diff_matrix(self.N)
        d2 = (self._w1[:, None] * D**2).sum(axis=0)  # [N]
        out = np.zeros(self.gdims, npdt)
        for a in range(self.d):
            t = arr * npdt(self._geo[a])
            for b in range(self.d):
                t = self._fold_weighted(t, b, w=(d2 if b == a else None))
            out += t
        return out.reshape(-1)

    # -------------------------------------------------------------- apply
    #
    # Per axis:  y_a = fold_a( Bᵀ ∘ ( S_a ∘ (B ∘ unfold_a(x)) ) )
    # where unfold/fold are pure reshape/slice/concat ops over *chunks* of
    # ``chunk`` cells (overlapping by one lattice plane) and B is the dense
    # banded derivative of one chunk: [chunk·N, chunk·p+1]. The chunk size
    # trades FLOPs (O(chunk) per point) against MXU efficiency (contraction
    # dim K = chunk·p+1); both extremes were measured slower end-to-end
    # (chunk=1: transpose-bound; chunk=n: O(G) FLOPs/point at HIGHEST
    # precision). NO index gathers anywhere — XLA lowers scalar gathers
    # near-serially on TPU (~1000× off roofline, measured).
    #
    # Contraction precision is pinned HIGHEST: with the TPU default
    # (single-pass bf16) the solution drifts to ~3e-2 relative error over a
    # few hundred RK4 steps (measured); HIGHEST holds ~3e-3 vs fp64.

    def _chunk(self, axis: int) -> int:
        """Cells per chunk along ``axis`` (largest divisor with K ≤ cap)."""
        n, p = self.grid[axis], self.p
        cap = getattr(self, "chunk_cap", 128)
        best = 1
        for c in range(1, n + 1):
            if n % c == 0 and c * p + 1 <= cap:
                best = c
        return best

    def _chunk_mat(self, axis: int) -> np.ndarray:
        cc = self._chunk(axis)
        return _banded_derivative(cc, self.p)  # [cc·N, cc·p+1]

    # All of these are written WITHOUT moveaxis: axis-general moveaxis forced
    # full-volume physical transposes on TPU (measured to dominate the
    # apply); slicing/reshape on an in-place axis is layout-preserving, and
    # the contraction uses a batched dot_general that keeps the axis order.

    def _axslice(self, ndim, axis, sl):
        out = [slice(None)] * ndim
        out[axis] = sl
        return tuple(out)

    def _unfold_j(self, x, axis, stride, width):
        """[.., G_a, ..] → [.., nb·width, ..]: nb = (G_a-1)//stride
        overlapping windows (window w starts at lattice index w·stride)."""
        nd = x.ndim
        G = x.shape[axis]
        nb = (G - 1) // stride
        pre, post = x.shape[:axis], x.shape[axis + 1 :]
        main = x[self._axslice(nd, axis, slice(0, G - 1))].reshape(
            pre + (nb, stride) + post
        )
        # right closure: window w's last entry = window w+1's first, except
        # the final window which takes the last lattice plane.
        sl = [slice(None)] * (nd + 1)
        sl[axis], sl[axis + 1] = slice(1, None), slice(0, 1)
        first_of_next = main[tuple(sl)]
        last_plane = x[self._axslice(nd, axis, slice(G - 1, G))].reshape(
            pre + (1, 1) + post
        )
        right = jnp.concatenate([first_of_next, last_plane], axis=axis)
        cells = jnp.concatenate([main, right], axis=axis + 1)
        return cells.reshape(pre + (nb * width,) + post)

    def _fold_j(self, y, axis, stride, width):
        """Adjoint of ``_unfold_j``: overlapping windows → lattice add."""
        nd = y.ndim
        nb = y.shape[axis] // width
        pre, post = y.shape[:axis], y.shape[axis + 1 :]
        cells = y.reshape(pre + (nb, width) + post)

        def sl2(s):  # slice on the window-node axis (axis+1)
            out = [slice(None)] * (nd + 1)
            out[axis + 1] = s
            return tuple(out)

        zero_plane = jnp.zeros(pre + (1,) + post, y.dtype)
        y_main = jnp.concatenate(
            [
                cells[sl2(slice(0, stride))].reshape(pre + (nb * stride,) + post),
                zero_plane,
            ],
            axis=axis,
        )
        zz = jnp.zeros(pre + (nb, stride) + post, y.dtype)
        zz = zz.at[sl2(slice(stride - 1, stride))].set(
            cells[sl2(slice(stride, width))]
        )
        y_last = jnp.concatenate(
            [zero_plane, zz.reshape(pre + (nb * stride,) + post)], axis=axis
        )
        return y_main + y_last

    _EINSUM_FWD = {
        (1, 0): "bw,qw->bq",
        (2, 0): "bwz,qw->bqz",
        (2, 1): "xbw,qw->xbq",
        (3, 0): "bwyz,qw->bqyz",
        (3, 1): "xbwz,qw->xbqz",
        (3, 2): "xybw,qw->xybq",
    }

    def _bcontract(self, x, mat, axis, rows_in):
        """Apply ``mat`` [rows_out, rows_in] blockwise along ``axis``,
        preserving axis order (batched dot_general, no transposes)."""
        nb = x.shape[axis] // rows_in
        pre, post = x.shape[:axis], x.shape[axis + 1 :]
        xb = x.reshape(pre + (nb, rows_in) + post)
        eq = self._EINSUM_FWD[(self.d, axis)]
        out = jnp.einsum(eq, xb, mat, precision=_precision())
        return out.reshape(pre + (nb * mat.shape[0],) + post)

    def apply_scaled(self, xs_and_scales):
        """y = Σ_f Σ_a fold_a(B_aᵀ(S_a^f ∘ B_a(unfold_a(x_f)))).

        ``xs_and_scales``: list of (x_lattice, scales) where scales is either
        the output of ``scales_const`` or ``scales_field``.
        """
        y = None
        for a in range(self.d):
            cc = self._chunk(a)
            stride = cc * self.p
            width = stride + 1
            Bc = jnp.asarray(self._chunk_mat(a), self.dtype)  # [cc·N, width]
            acc = None
            for x, scales in xs_and_scales:
                win = self._unfold_j(x, a, stride, width)
                u = self._bcontract(win, Bc, a, width)
                s = scales[a]
                if isinstance(s, tuple):  # (scalar, [vec per axis]) rank-1
                    fac, vecs = s
                    su = u * fac
                    for b in range(self.d):
                        v = jnp.asarray(vecs[b], self.dtype)
                        shape = [1] * self.d
                        shape[b] = v.shape[0]
                        su = su * v.reshape(shape)
                else:
                    su = u * s
                acc = su if acc is None else acc + su
            back = self._bcontract(acc, Bc.T, a, cc * self.N)
            ya = self._fold_j(back, a, stride, width)
            y = ya if y is None else y + ya
        return y

