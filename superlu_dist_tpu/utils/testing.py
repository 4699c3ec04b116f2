"""Test utilities: synthetic matrices, residual/error metrics.

Mirrors the reference's acceptance machinery:
- ``pdcompute_resid`` residual test value (reference: TEST/pdcompute_resid.c:1-155)
- ``pdinf_norm_error`` (reference: SRC/double/dutil_dist.c:573-660)
- fixture matrices: the reference ships g4/g20/big/cg20 (EXAMPLE/README:49-52);
  we read them from the reference checkout when present and otherwise generate
  equivalent synthetic problems (2D/3D Laplacians, random sparse).
"""

from __future__ import annotations

import os

import numpy as np
import scipy.sparse as sp

REFERENCE_EXAMPLE_DIR = os.environ.get(
    "SLU_TPU_REFERENCE_EXAMPLES", "/root/reference/EXAMPLE")

#: acceptance threshold for the residual test value
#: (reference: TEST/pdtest.c:44 ``#define THRESH 20.0``)
THRESH = 20.0


def laplacian_2d(k: int, dtype=np.float64) -> sp.csc_matrix:
    """k×k 5-point Laplacian (the g20 fixture is the 20×20 grid case)."""
    T = sp.diags([-1.0, 4.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.identity(k)
    A = sp.kron(I, T) + sp.kron(sp.diags([-1.0, -1.0], [-1, 1],
                                         shape=(k, k)), I)
    return sp.csc_matrix(A, dtype=dtype)


def laplacian_3d(k: int, dtype=np.float64) -> sp.csc_matrix:
    T = sp.diags([-1.0, 6.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.identity(k)
    A = (sp.kron(sp.kron(I, I), T)
         + sp.kron(sp.kron(I, sp.diags([-1.0, -1.0], [-1, 1], shape=(k, k))), I)
         + sp.kron(sp.kron(sp.diags([-1.0, -1.0], [-1, 1], shape=(k, k)), I), I))
    return sp.csc_matrix(A, dtype=dtype)


def random_sparse(n: int, density: float = 0.01, seed: int = 0,
                  complex_: bool = False, diag_dominant: bool = True
                  ) -> sp.csc_matrix:
    """Random square sparse matrix with a nonzero (optionally dominant) diagonal."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csc",
                  dtype=np.float64)
    A.data = rng.standard_normal(A.nnz)
    if complex_:
        A = A.astype(np.complex128)
        A.data += 1j * rng.standard_normal(A.nnz)
    d = np.abs(A).sum(axis=1).A.ravel() if hasattr(np.abs(A).sum(axis=1), "A") \
        else np.asarray(np.abs(A).sum(axis=1)).ravel()
    shift = (d + 1.0) if diag_dominant else rng.standard_normal(n)
    A = sp.csc_matrix(A + sp.diags(shift.astype(A.dtype)))
    return A


def unsymmetric_pattern(n: int, seed: int = 0) -> sp.csc_matrix:
    """Strongly unsymmetric matrix exercising the row-permutation path:
    small diagonal, large off-diagonal entries (MC64 must fix the diagonal)."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=min(0.05, 20.0 / n), random_state=rng,
                  format="lil", dtype=np.float64)
    A.setdiag(rng.standard_normal(n) * 1e-3)
    perm = rng.permutation(n)
    for i in range(n):
        A[i, perm[i]] = 10.0 + rng.random()
    return sp.csc_matrix(A)


def reference_matrix(name: str):
    """Load a fixture matrix from the reference checkout, or None if absent."""
    path = os.path.join(REFERENCE_EXAMPLE_DIR, name)
    if not os.path.exists(path):
        return None
    from .io import read_matrix
    return read_matrix(path)


def compute_resid(A, x, b, work_dtype=np.float64) -> float:
    """Residual test value ‖b−Ax‖∞ / (‖A‖∞·‖x‖∞·n·eps) — must be < THRESH.

    Mirrors ``pdcompute_resid`` (reference: TEST/pdcompute_resid.c:83-151).
    ``work_dtype`` sets eps: the working precision of the solve being tested
    (float32 for an unrefined single-precision factorization).
    """
    A = sp.csc_matrix(A)
    x = np.asarray(x, dtype=np.result_type(A.dtype, np.float64))
    b = np.asarray(b, dtype=x.dtype)
    n = A.shape[0]
    wd = np.dtype(work_dtype)
    if wd.kind == "c":
        wd = np.dtype(np.float32) if wd.itemsize == 8 else np.dtype(np.float64)
    eps = np.finfo(wd).eps
    anorm = np.max(np.abs(A).sum(axis=1))
    r = b - A @ x
    rnorm = np.max(np.abs(r))
    xnorm = np.max(np.abs(x))
    if anorm == 0 or xnorm == 0:
        return np.inf if rnorm > 0 else 0.0
    return float(rnorm / (anorm * xnorm * n * eps))


def inf_norm_error(x, xtrue) -> float:
    """Relative ∞-norm error (reference: dutil_dist.c:573-660 pdinf_norm_error)."""
    x = np.asarray(x)
    xtrue = np.asarray(xtrue)
    return float(np.max(np.abs(x - xtrue)) / np.max(np.abs(xtrue)))


def backward_error(A, x, b) -> float:
    """Componentwise backward error max_i |r|_i / (|A|·|x| + |b|)_i
    (the ``berr`` of pdgsrfs.c:189-231)."""
    A = sp.csc_matrix(A)
    x = np.asarray(x)
    b = np.asarray(b)
    r = np.abs(b - A @ x)
    denom = np.abs(A) @ np.abs(x) + np.abs(b)
    safe = denom > 0
    out = np.zeros_like(r, dtype=np.float64)
    out[safe] = r[safe] / denom[safe]
    out[~safe] = np.where(r[~safe] > 0, np.inf, 0.0)
    return float(np.max(out)) if out.size else 0.0


def langs(norm: str, A) -> float:
    """Matrix norms — analog of ``pdlangs``/``dlangs_dist``
    (reference: SRC/double/pdlangs.c, dlangs_dist.c).
    norm ∈ {"M" (max |a_ij|), "1", "I" (inf), "F"}.
    """
    A = sp.csc_matrix(A)
    if norm in ("M", "m"):
        return float(np.abs(A.data).max()) if A.nnz else 0.0
    if norm in ("1", "O", "o"):
        return float(np.abs(A).sum(axis=0).max())
    if norm in ("I", "i"):
        return float(np.abs(A).sum(axis=1).max())
    if norm in ("F", "f", "E", "e"):
        return float(np.sqrt((np.abs(A.data) ** 2).sum()))
    raise ValueError(f"unknown norm {norm!r}")
