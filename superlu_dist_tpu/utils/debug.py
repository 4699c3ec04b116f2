"""Debug / inspection utilities.

Analogs of the reference's dutil_dist.c helpers (reference:
SRC/double/dutil_dist.c:26-1000 dPrint_*, CheckZeroDiagonal,
distCheckArray; env-gated LU dump via WRITELU/LUFILE): reconstruct dense
L/U from the block pool, dump/compare factors, and sanity checks.
"""

from __future__ import annotations

import numpy as np


def lu_to_dense(lu):
    """Reconstruct dense (L, U) from a factored SparseLU (small matrices;
    debugging only). L unit-lower, U upper, of the permuted system
    Pc·Pr·Dr·A·Dc·Pcᵀ."""
    plan = lu.plan
    bs, nb, n = plan.bs, plan.nb, plan.n_pad
    pool = np.asarray(lu.pool)
    M = np.zeros((n, n), dtype=pool.dtype)
    for s in range(plan.nslots):
        I, J = int(plan.slot_row[s]), int(plan.slot_col[s])
        M[I * bs:(I + 1) * bs, J * bs:(J + 1) * bs] = pool[s]
    L = np.tril(M, -1) + np.eye(n, dtype=M.dtype)
    U = np.triu(M)
    return L[: plan.n, : plan.n], U[: plan.n, : plan.n]


def check_factorization(lu, A3=None, tol=1e-3) -> float:
    """‖L·U − A3‖ / ‖A3‖ for the permuted system (CheckLU analog, env
    CHECKLU in the reference). Returns the relative error."""
    import scipy.sparse as sp
    if A3 is None:
        A3 = lu._A_orig.multiply(lu.row_scale[:, None]) \
            .multiply(lu.col_scale[None, :]).tocsc()
        A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
        A3 = lu._expand_A(sp.csc_matrix(A3))   # etree-aligned blocking
    L, U = lu_to_dense(lu)
    R = L @ U - sp.csc_matrix(A3).toarray()
    rel = float(np.abs(R).max() / max(np.abs(A3.data).max(), 1e-300))
    return rel


def check_zero_diagonal(lu, tol=0.0):
    """Indices of (near-)zero diagonal entries of U (CheckZeroDiagonal
    analog, superlu_defs.h:1205)."""
    d = np.abs(lu.diag_u())
    return np.flatnonzero(d <= tol * max(1.0, d.max()))


def dump_lu(lu, path):
    """Persist the factored state (WRITELU/LUFILE analog)."""
    np.savez_compressed(
        path,
        pool=np.asarray(lu.pool), linv=np.asarray(lu.linv),
        uinv=np.asarray(lu.uinv), rowperm=lu.rowperm, colperm=lu.colperm,
        row_scale=lu.row_scale, col_scale=lu.col_scale,
        slot_row=lu.plan.slot_row, slot_col=lu.plan.slot_col, n=lu.n,
        bs=lu.plan.bs)


def compare_lu(path_a, path_b, rtol=1e-6) -> bool:
    """Compare two dumped factorizations (distCheckArray analog)."""
    a, b = np.load(path_a), np.load(path_b)
    for k in ("pool", "rowperm", "colperm"):
        if a[k].shape != b[k].shape:
            return False
        if k == "pool":
            if not np.allclose(a[k], b[k], rtol=rtol, atol=rtol):
                return False
        elif not np.array_equal(a[k], b[k]):
            return False
    return True
