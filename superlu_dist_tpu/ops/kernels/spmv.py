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
