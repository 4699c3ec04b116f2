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


# ---------------------------------------------------------------------------
# Irregular (SuiteSparse-class) generators.
#
# The reference's whole test diet is irregular HB/MM matrices
# (reference: EXAMPLE/dcreate_matrix.c:1-235, TEST/pdtest.c:107-563) and
# BASELINE.md names SuiteSparse acceptance targets (audikw_1, nlpkkt80).
# This environment has no network egress, so instead of downloading we
# generate synthetic *analogs spanning the same structural classes*:
#   fem3d   — 3D Delaunay tetrahedral mesh, 3 dof/node elasticity-style
#             blocks (audikw_1 class: 3D structural FEM, natural 3-wide
#             supernodes, heavy irregular fill)
#   fem2d   — 2D Delaunay triangulation stiffness pattern (parabolic_fem /
#             ecology-class planar irregular mesh)
#   circuit — preferential-attachment power-law graph + diagonal coupling
#             (G3_circuit / memchip class: hub nodes, skewed degrees)
#   kkt     — saddle-point KKT system [[H Aᵀ],[A 0]] with an all-zero
#             (2,2) block (nlpkkt80 class: indefinite, zero diagonal —
#             exercises MC64 static pivoting)
#   aniso2d — strongly anisotropic 2D 5-point operator (stretched-grid
#             class: structured pattern, ill-conditioned values)
# All generators are deterministic per (n, seed).
# ---------------------------------------------------------------------------


def fem2d_delaunay(npts: int, seed: int = 0) -> sp.csc_matrix:
    """Graph Laplacian (+I) of a 2D Delaunay triangulation of random
    points — an irregular planar FEM stiffness analog."""
    from scipy.spatial import Delaunay
    rng = np.random.default_rng(seed)
    pts = rng.random((npts, 2))
    tri = Delaunay(pts)
    s = tri.simplices
    e = np.vstack([s[:, [0, 1]], s[:, [1, 2]], s[:, [2, 0]]])
    w = -1.0 - rng.random(len(e))          # random negative edge weights
    G = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([e[:, 0], e[:, 1]]),
                        np.concatenate([e[:, 1], e[:, 0]]))),
                      shape=(npts, npts)).tocsr()
    G.sum_duplicates()
    d = -np.asarray(G.sum(axis=1)).ravel() + 1.0
    return sp.csc_matrix(G + sp.diags(d))


def fem3d_delaunay(npts: int, seed: int = 0, dof: int = 3) -> sp.csc_matrix:
    """3D tetrahedral-mesh elasticity analog: vertex adjacency of a 3D
    Delaunay tetrahedralization, expanded to ``dof`` unknowns per node
    with dense dof×dof couplings and an SPD-ish diagonal shift. This is
    the audikw_1 structural class (3 dof/node, irregular 3D fill)."""
    from scipy.spatial import Delaunay
    rng = np.random.default_rng(seed)
    pts = rng.random((npts, 3))
    tri = Delaunay(pts)
    s = tri.simplices                       # (ntet, 4)
    pairs = np.vstack([s[:, [a, b]] for a in range(4) for b in range(a + 1, 4)])
    i = np.concatenate([pairs[:, 0], pairs[:, 1]])
    j = np.concatenate([pairs[:, 1], pairs[:, 0]])
    Adj = sp.coo_matrix((np.ones(len(i)), (i, j)), shape=(npts, npts)).tocsr()
    Adj.data[:] = 1.0                       # dedupe to pattern
    Adj.sum_duplicates()
    Adj.data[:] = 1.0
    if dof > 1:
        Adj = sp.kron(Adj, np.ones((dof, dof)), format="csr")
    n = npts * dof
    A = Adj.tocoo()
    vals = -rng.random(A.nnz)
    A = sp.csr_matrix((vals, (A.row, A.col)), shape=(n, n))
    d = -np.asarray(A.sum(axis=1)).ravel() + 1.0
    return sp.csc_matrix(A + sp.diags(d))


def circuit_graph(n: int, m: int = 3, seed: int = 0) -> sp.csc_matrix:
    """Circuit conductance matrix in the G3_circuit / memchip class:
    cells on a quasi-planar grid with 4-neighbor local wiring, a random
    fraction of medium-range wires (distance-decaying displacement), and
    a few high-degree hub nodes (power/clock rails). Real circuit
    matrices are mostly local with skewed hub rows — NOT expanders, so
    fill stays tractable while the degree distribution is irregular."""
    rng = np.random.default_rng(seed)
    k = int(np.ceil(np.sqrt(n)))
    ids = np.arange(n)
    x, y = ids % k, ids // k
    # local 4-neighbor wiring (with ~10% random opens)
    right = ids[(x < k - 1) & (ids + 1 < n)]
    up = ids[ids + k < n]
    src = np.concatenate([right, up])
    dst = np.concatenate([right + 1, up + k])
    keep = rng.random(len(src)) > 0.1
    src, dst = src[keep], dst[keep]
    # medium-range wires: m//2 per node on average, displacement with a
    # heavy-ish tail (geometric radius), random direction
    nw = (n * max(1, m // 2))
    ws = rng.integers(0, n, size=nw)
    r = (2 + rng.geometric(0.25, size=nw)).astype(np.int64)
    ang = rng.random(nw) * 2 * np.pi
    wx = (ws % k + np.round(r * np.cos(ang))).astype(np.int64) % k
    wy = (ws // k + np.round(r * np.sin(ang))).astype(np.int64)
    wd = (wy % ((n + k - 1) // k)) * k + wx
    ok = (wd < n) & (wd != ws)
    src = np.concatenate([src, ws[ok]])
    dst = np.concatenate([dst, wd[ok]])
    # hub rails: ~n/2000 hubs each strapping ~64 random cells
    nhub = max(1, n // 2000)
    hubs = rng.choice(n, size=nhub, replace=False)
    hs = np.repeat(hubs, 64)
    hd = rng.integers(0, n, size=len(hs))
    ok = hs != hd
    src = np.concatenate([src, hs[ok]])
    dst = np.concatenate([dst, hd[ok]])
    w = -(0.1 + rng.random(len(src)))
    G = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([src, dst]),
                        np.concatenate([dst, src]))), shape=(n, n)).tocsr()
    G.sum_duplicates()
    d = -np.asarray(G.sum(axis=1)).ravel() + 0.01
    return sp.csc_matrix(G + sp.diags(d))


def kkt_system(n_primal: int, n_con: int | None = None,
               seed: int = 0) -> sp.csc_matrix:
    """Saddle-point KKT matrix [[H Aᵀ],[A 0]] from a grid-structured QP —
    the nlpkkt80 class. The (2,2) block is exactly zero: every constraint
    row has a zero diagonal, so a static row permutation (MC64) is
    *required* for GESP to factor it."""
    rng = np.random.default_rng(seed)
    if n_con is None:
        n_con = n_primal // 2
    k = max(2, int(np.sqrt(n_primal)))
    H = laplacian_2d(k).tocoo()
    H = sp.coo_matrix((H.data, (H.row, H.col)), shape=(k * k, k * k))
    npr = k * k
    # sparse constraint Jacobian: each constraint couples 3 primals. The
    # anchor column is a DISTINCT primal per constraint (drawn without
    # replacement) so a perfect matching exists structurally — random
    # anchors collide and violate Hall's condition at this density.
    n_con = min(n_con, npr)
    rows = np.repeat(np.arange(n_con), 3)
    base = rng.permutation(npr)[:n_con]
    cols = (base[:, None] + np.array([0, 1, k])[None, :]).ravel() % npr
    Av = rng.standard_normal(3 * n_con) + 0.5
    Acon = sp.coo_matrix((Av, (rows, cols)), shape=(n_con, npr)).tocsr()
    Acon.sum_duplicates()
    K = sp.bmat([[H.tocsr() + sp.identity(npr), Acon.T],
                 [Acon, None]], format="csc")
    K.sort_indices()
    return sp.csc_matrix(K)


def aniso2d(k: int, eps: float = 1e-3) -> sp.csc_matrix:
    """Anisotropic 2D operator −u_xx − eps·u_yy on a k×k grid: structured
    pattern, strongly graded values (conditioning stress; the atmosmodd /
    stretched-mesh class)."""
    T = sp.diags([-1.0, 2.0 + 2.0 * eps, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.identity(k)
    A = sp.kron(I, T) + sp.kron(
        sp.diags([-eps, -eps], [-1, 1], shape=(k, k)), I)
    return sp.csc_matrix(A)


IRREGULAR_SUITE = {
    # name -> zero-arg constructor; sizes chosen so the f32 factor pool
    # fits a 16 GiB chip with honest irregular fill (see bench.py suite leg)
    "fem3d30k": lambda: fem3d_delaunay(10_000, seed=1, dof=3),
    "fem2d80k": lambda: fem2d_delaunay(80_000, seed=2),
    "circuit100k": lambda: circuit_graph(100_000, m=3, seed=3),
    "kkt60k": lambda: kkt_system(40_000, 20_000, seed=4),
    "aniso2d200": lambda: aniso2d(200),
}


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


def helmholtz_3d(k: int, kappa2: float = 2.0, sigma: float = 0.5,
                 dtype=np.complex64) -> sp.csc_matrix:
    """Complex shifted 3D Helmholtz operator −Δ − (κ² + iσ)I on a k³
    grid — the production-scale complex benchmark class (the z-precision
    suite's workload; reference: SRC/complex16/pzgstrf.c). The complex
    shift makes the operator invertible and genuinely complex-valued."""
    A = laplacian_3d(k, dtype=np.float64).astype(np.complex128)
    n = A.shape[0]
    A = A - sp.identity(n) * (kappa2 + 1j * sigma)
    return sp.csc_matrix(A, dtype=dtype)


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
