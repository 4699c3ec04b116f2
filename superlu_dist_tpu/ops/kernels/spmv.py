"""Device sparse mat-vec for iterative refinement.

Analog of the comm-plan SpMV ``pdgsmv`` (reference: SRC/double/pdgsmv.c:1-383).
On a single chip this is a COO gather + segment-sum; the distributed variant
(parallel/) psums partial row sums across the mesh column axis, replacing the
reference's index-exchange communication plan (pdgsmv_comm_t).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def _coo_bucket(nnz: int) -> int:
    """Bucket-pad the COO stream length (2^k·{1,1.25,1.5,1.75}) so spmv /
    fused-refine programs are shape-canonical across matrices and hit the
    persistent compile cache (padding rows target the dropped segment n
    with value 0)."""
    x = max(int(nnz), 8)
    k = max(0, int(np.floor(np.log2(x))))
    for base in (1.0, 1.25, 1.5, 1.75, 2.0):
        cand = int(np.ceil((2 ** k) * base))
        if cand >= x:
            return cand
    return 2 ** (k + 1)


def coo_arrays(A: sp.spmatrix, dtype):
    """Host → device COO triple for :func:`spmv` (bucket-padded; padding
    entries use row index n, which ``segment_sum(num_segments=n)`` drops,
    and value 0)."""
    C = sp.coo_matrix(A)
    pad = _coo_bucket(C.nnz) - C.nnz
    n = A.shape[0]
    return (jnp.asarray(np.concatenate(
                [C.row, np.full(pad, n)]), dtype=jnp.int32),
            jnp.asarray(np.concatenate(
                [C.col, np.zeros(pad)]), dtype=jnp.int32),
            jnp.asarray(np.concatenate(
                [C.data, np.zeros(pad, C.data.dtype)]), dtype=dtype))


@functools.partial(jax.jit, static_argnums=(4,))
def spmv(rows, cols, vals, x, n_rows: int):
    """y = A @ x with A in COO; x: (n, k) multi-RHS."""
    contrib = vals[:, None] * x[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=n_rows)


@functools.partial(jax.jit, static_argnums=(4,))
def spmv_t(rows, cols, vals, x, n_cols: int):
    """y = A^T @ x (conjugation handled by the caller for CONJ mode)."""
    contrib = vals[:, None] * x[rows]
    return jax.ops.segment_sum(contrib, cols, num_segments=n_cols)


@functools.partial(jax.jit, static_argnums=(4,))
def abs_spmv_t(rows, cols, vals, x, n_cols: int):
    """y = |A|^T @ x — backward-error denominator for transpose solves."""
    contrib = jnp.abs(vals)[:, None] * x[rows]
    return jax.ops.segment_sum(contrib, cols, num_segments=n_cols)


@functools.partial(jax.jit, static_argnums=(4,))
def abs_spmv(rows, cols, vals, x, n_rows: int):
    """y = |A| @ x — used for the componentwise backward-error denominator
    (|A|·|x| + |b|, reference: pdgsrfs.c:189-231)."""
    contrib = jnp.abs(vals)[:, None] * x[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=n_rows)


# ---------------------------------------------------------------------------
# planar-complex variants (TPU has no complex dtype: values as (re, im))
# ---------------------------------------------------------------------------


def coo_arrays_planar(A: sp.spmatrix, real_dtype):
    """Host → device COO with planar complex values: (rows, cols, (vr, vi))
    (bucket-padded like :func:`coo_arrays`)."""
    C = sp.coo_matrix(A)
    pad = _coo_bucket(C.nnz) - C.nnz
    n = A.shape[0]
    z = np.zeros(pad)
    return (jnp.asarray(np.concatenate(
                [C.row, np.full(pad, n)]), dtype=jnp.int32),
            jnp.asarray(np.concatenate([C.col, z]), dtype=jnp.int32),
            (jnp.asarray(np.concatenate([C.data.real, z]),
                         dtype=real_dtype),
             jnp.asarray(np.concatenate([C.data.imag, z]),
                         dtype=real_dtype)))


@functools.partial(jax.jit, static_argnums=(5,))
def spmv_planar(rows, cols, vr, vi, x2, n_rows: int):
    """y = A @ x, planar: x2 is (2, n, k); returns (2, n_rows, k)."""
    xr, xi = x2[0][cols], x2[1][cols]
    cr = vr[:, None] * xr - vi[:, None] * xi
    ci = vr[:, None] * xi + vi[:, None] * xr
    return jnp.stack([
        jax.ops.segment_sum(cr, rows, num_segments=n_rows),
        jax.ops.segment_sum(ci, rows, num_segments=n_rows)])


@functools.partial(jax.jit, static_argnums=(5,))
def spmv_t_planar(rows, cols, vr, vi, x2, n_cols: int):
    """y = Aᵀ @ x planar (caller conjugates for Aᴴ)."""
    xr, xi = x2[0][rows], x2[1][rows]
    cr = vr[:, None] * xr - vi[:, None] * xi
    ci = vr[:, None] * xi + vi[:, None] * xr
    return jnp.stack([
        jax.ops.segment_sum(cr, cols, num_segments=n_cols),
        jax.ops.segment_sum(ci, cols, num_segments=n_cols)])


@functools.partial(jax.jit, static_argnums=(4,))
def abs_spmv_planar(rows, cols, vabs, xabs, n_rows: int):
    """y = |A| @ |x| with precomputed |values| (planar berr denominator)."""
    return jax.ops.segment_sum(vabs[:, None] * xabs[cols], rows,
                               num_segments=n_rows)


@functools.partial(jax.jit, static_argnums=(4,))
def abs_spmv_t_planar(rows, cols, vabs, xabs, n_cols: int):
    return jax.ops.segment_sum(vabs[:, None] * xabs[rows], cols,
                               num_segments=n_cols)
