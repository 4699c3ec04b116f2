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


def coo_arrays(A: sp.spmatrix, dtype):
    """Host → device COO triple for :func:`spmv`."""
    C = sp.coo_matrix(A)
    return (jnp.asarray(C.row, dtype=jnp.int32),
            jnp.asarray(C.col, dtype=jnp.int32),
            jnp.asarray(C.data, dtype=dtype))


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
    """Host → device COO with planar complex values: (rows, cols, (vr, vi))."""
    C = sp.coo_matrix(A)
    return (jnp.asarray(C.row, dtype=jnp.int32),
            jnp.asarray(C.col, dtype=jnp.int32),
            (jnp.asarray(C.data.real, dtype=real_dtype),
             jnp.asarray(C.data.imag, dtype=real_dtype)))


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
