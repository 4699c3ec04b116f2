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


def print_block(lu, I: int, J: int, file=None) -> None:
    """Pretty-print one B×B block of the factor (dPrint_Dense_Matrix-style
    inspection, reference: SRC/double/dutil_dist.c dPrint_* helpers)."""
    import sys
    plan = lu.plan
    out = file or sys.stdout
    srow = np.asarray(plan.slot_row)
    scol = np.asarray(plan.slot_col)
    hit = np.flatnonzero((srow == I) & (scol == J))
    if not len(hit):
        print(f"block ({I},{J}): structurally zero", file=out)
        return
    pool = np.asarray(lu.pool)
    if pool.ndim == 4:     # planar complex
        blk = pool[hit[0], 0] + 1j * pool[hit[0], 1]
    else:
        blk = pool[hit[0]]
    print(f"block ({I},{J}) slot {int(hit[0])}:", file=out)
    with np.printoptions(precision=4, suppress=True, linewidth=120):
        print(blk, file=out)


def lu_summary(lu) -> str:
    """One-paragraph structural summary of a factorization (the
    PStatPrint-adjacent dQuerySpace role): dimensions, block structure,
    schedule shape, memory."""
    plan = lu.plan
    lev = np.asarray(plan.step_level)
    counts = np.bincount(lev, minlength=plan.n_flevels)
    lines = [
        f"n={lu.n} (padded {plan.n_pad}, expansion "
        f"{'on' if getattr(lu, '_expand', None) is not None else 'off'})",
        f"block size {plan.bs}, {plan.nb} block columns, "
        f"{plan.nslots} stored blocks ({plan.a_blocks} from A)",
        f"elimination levels {plan.n_flevels} "
        f"(serial {int(np.sum(counts == 1))}, "
        f"mean steps/level {plan.nb / plan.n_flevels:.2f}, "
        f"max {int(counts.max())})",
        f"solve levels L={plan.lsol_nlvl} U={plan.usol_nlvl}",
        f"pool {plan.pool_bytes(np.asarray(lu.pool).dtype) / 2**20:.1f} "
        f"MiB, model flops {plan.factor_flops:.3e}",
    ]
    return "\n".join(lines)


def dump_pattern(lu, path) -> None:
    """Write the filled block pattern as a PBM bitmap (block row/col
    occupancy) for eyeballing fill — the dPrint_CompCol role at block
    granularity."""
    plan = lu.plan
    nb = plan.nb
    grid = np.zeros((nb, nb), dtype=np.uint8)
    grid[np.asarray(plan.slot_row), np.asarray(plan.slot_col)] = 1
    with open(path, "w") as f:
        f.write(f"P1\n{nb} {nb}\n")
        for r in range(nb):
            f.write(" ".join("1" if v else "0" for v in grid[r]) + "\n")
