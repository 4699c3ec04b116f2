"""Transpose solves, condition estimation, norms."""

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu import Options, SparseLU, Trans
from superlu_dist_tpu.utils.testing import langs, random_sparse


@pytest.fixture(scope="module")
def lu_and_A():
    A = random_sparse(90, density=0.08, seed=11, diag_dominant=False)
    return SparseLU(A, Options(dtype="float64", block_size=16)), A


def test_transpose_solve(lu_and_A):
    lu, A = lu_and_A
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(A.shape[0])
    x = lu.solve(A.T @ xt, trans=Trans.TRANS)
    assert np.abs(x - xt).max() < 1e-10


def test_transpose_multirhs(lu_and_A):
    lu, A = lu_and_A
    rng = np.random.default_rng(1)
    Xt = rng.standard_normal((A.shape[0], 3))
    X = lu.solve(np.asarray(A.T @ Xt), trans=Trans.TRANS)
    assert np.abs(X - Xt).max() < 1e-10


def test_conj_transpose_solve():
    rng = np.random.default_rng(2)
    A = random_sparse(60, density=0.1, seed=5).astype(np.complex128)
    A = sp.csc_matrix(A)
    A.data = A.data + 1j * rng.standard_normal(A.nnz)
    lu = SparseLU(A, Options(dtype="complex128", block_size=16))
    xt = rng.standard_normal(60) + 1j * rng.standard_normal(60)
    x = lu.solve(np.asarray(A.conj().T @ xt), trans=Trans.CONJ)
    assert np.abs(x - xt).max() < 1e-10


def test_rcond(lu_and_A):
    lu, A = lu_and_A
    est = lu.rcond_1()
    truth = 1.0 / (langs("1", A)
                   * np.abs(np.linalg.inv(A.toarray())).sum(axis=0).max())
    assert truth / 30 < est < truth * 30


def test_rcond_ill_conditioned_tight():
    """Pin the dlacn2-style estimator on a hard case: a geometrically
    graded diagonal plus off-diagonal coupling (cond ~ 1e8). The Hager
    iteration must land within 10% of the exact dense 1-norm value and
    report its convergence state."""
    n = 120
    rng = np.random.default_rng(3)
    grades = np.logspace(0, -8, n)
    A = sp.diags(grades).tocsc() + 1e-10 * sp.csc_matrix(
        random_sparse(n, density=0.05, seed=13, diag_dominant=False))
    lu = SparseLU(A, Options(dtype="float64", block_size=16))
    est = lu.rcond_1()
    truth = 1.0 / (langs("1", A)
                   * np.abs(np.linalg.inv(A.toarray())).sum(axis=0).max())
    assert 0.9 * truth < est < 1.1 * truth, (est, truth)
    assert lu.stat.counters["rcond_iters"] >= 1
    assert lu.stat.counters["rcond_converged"] in (0, 1)


def test_langs():
    A = sp.csc_matrix(np.array([[1.0, -2.0], [0.0, 3.0]]))
    assert langs("M", A) == 3.0
    assert langs("1", A) == 5.0
    assert langs("I", A) == 3.0
    assert np.isclose(langs("F", A), np.sqrt(14.0))


def test_condition_number_option():
    from superlu_dist_tpu import Options, gssvx
    A = random_sparse(70, density=0.1, seed=9)
    b = np.asarray(A @ np.ones(70))
    res, _ = gssvx(A, b, Options(dtype="float64", block_size=16,
                                 condition_number=True))
    assert res.rcond is not None and 0 < res.rcond < 1
    assert "RCOND" in res.stat.utime


# ---------------------------------------------------------------------------
# distributed drivers: transpose/conj solves, rcond, diag_u on the mesh
# (reference: the trans branches of pdgstrs + the options->Trans contract,
#  superlu_defs.h:684-728, exercised for every precision)
# ---------------------------------------------------------------------------

import jax  # noqa: E402

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _make_driver(kind, A, opts):
    if kind == "single":
        return SparseLU(A, opts)
    if kind == "dist2d":
        from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
        from superlu_dist_tpu.parallel.grid import Grid2D
        return DistributedSparseLU(A, Grid2D(2, 4), opts)
    from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU
    from superlu_dist_tpu.parallel.grid import Grid3D
    return Distributed3DSparseLU(A, Grid3D(2, 2, 2), opts)


@needs_8
@pytest.mark.parametrize("kind", ["single", "dist2d", "dist3d"])
def test_trans_cond_all_drivers(kind):
    """The VERDICT r3 contract: Trans solves + rcond + diag_u parametrized
    over SparseLU / DistributedSparseLU / 3D, all agreeing."""
    import scipy.sparse.linalg as spla
    rng = np.random.default_rng(17)
    A = random_sparse(128, density=0.06, seed=21, diag_dominant=False)
    n = A.shape[0]
    opts = Options(dtype="float32", block_size=16)
    lu = _make_driver(kind, A, opts)
    b = rng.standard_normal(n)
    xt_ref = spla.spsolve(sp.csc_matrix(A.T).astype(np.float64), b)
    x = lu.solve(b, trans=Trans.TRANS)
    assert np.abs(x - xt_ref).max() / np.abs(xt_ref).max() < 1e-4
    # multi-RHS (f32 backward-substitution residual on a non-diagonally-
    # dominant random matrix: ~1e-4 relative is expected accuracy)
    B = rng.standard_normal((n, 3))
    X = lu.solve_transposed(B)
    R = np.asarray(A.T @ X) - B
    assert np.abs(R).max() / np.abs(B).max() < 5e-3
    # rcond agrees across drivers (identical algorithm + factor values)
    ref = SparseLU(A, opts) if kind != "single" else lu
    assert np.isclose(lu.rcond_1(), ref.rcond_1(), rtol=1e-3)
    # diag_u agrees (f32 executors differ by summation order only)
    assert np.allclose(lu.diag_u(), ref.diag_u(), rtol=1e-3, atol=1e-5)


@needs_8
@pytest.mark.parametrize("kind", ["dist2d", "dist3d"])
def test_trans_conj_complex_dist(kind):
    """Aᴴ solves through the distributed drivers (native complex on the
    CPU mesh; reference: pzgstrs CONJ branches)."""
    rng = np.random.default_rng(4)
    A = random_sparse(96, density=0.08, seed=6).astype(np.complex128)
    A = sp.csc_matrix(A)
    A.data = A.data + 0.5j * rng.standard_normal(A.nnz)
    lu = _make_driver(kind, A, Options(dtype="complex128", block_size=16))
    xt = rng.standard_normal(96) + 1j * rng.standard_normal(96)
    x = lu.solve(np.asarray(A.conj().T @ xt), trans=Trans.CONJ)
    assert np.abs(x - xt).max() < 1e-8
    x2 = lu.solve(np.asarray(A.T @ xt), trans=Trans.TRANS)
    assert np.abs(x2 - xt).max() < 1e-8


@needs_8
@pytest.mark.parametrize("kind", ["single", "dist2d", "dist3d"])
def test_trans_valid_after_refactor(kind):
    """Review regression: SAME_PATTERN refactor that changes the row
    permutation must invalidate the cached transpose-solve tapes (stale
    tapes produced err ~7e4 while NOTRANS stayed correct)."""
    import scipy.sparse.linalg as spla
    from superlu_dist_tpu import Fact
    from superlu_dist_tpu.utils.options import RowPerm
    rng = np.random.default_rng(5)
    A = random_sparse(96, density=0.08, seed=8, diag_dominant=False)
    n = A.shape[0]
    opts = Options(dtype="float32", block_size=16,
                   row_perm=RowPerm.LARGE_DIAG_MC64)
    lu = _make_driver(kind, A, opts)
    b = rng.standard_normal(n)
    x0 = lu.solve_transposed(b)     # build + cache the trans tapes
    # perturb values enough that MC64 picks a different matching
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 0.8 * np.abs(rng.standard_normal(A.nnz)))
    lu.refactor(A2, fact=Fact.SAME_PATTERN)
    xt_ref = spla.spsolve(sp.csc_matrix(A2.T).astype(np.float64), b)
    x = lu.solve_transposed(b)
    err = np.abs(x - xt_ref).max() / np.abs(xt_ref).max()
    assert err < 1e-3, f"stale trans tapes after refactor: err {err}"


@needs_8
@pytest.mark.parametrize("kind", ["dist2d", "dist3d"])
def test_condition_number_option_dist(kind):
    """options.condition_number flows through the distributed one-call
    drivers (pdgssvx's ConditionNumber contract on the mesh)."""
    A = random_sparse(90, density=0.08, seed=11, diag_dominant=False)
    n = A.shape[0]
    b = np.asarray(A @ np.ones(n))
    opts = Options(dtype="float32", block_size=16, condition_number=True)
    if kind == "dist2d":
        from superlu_dist_tpu.models.dist_driver import gssvx_dist
        from superlu_dist_tpu.parallel.grid import Grid2D
        res, _ = gssvx_dist(A, b, Grid2D(2, 4), opts)
    else:
        from superlu_dist_tpu.models.driver3d import gssvx3d
        from superlu_dist_tpu.parallel.grid import Grid3D
        res, _ = gssvx3d(A, b, Grid3D(2, 2, 2), opts)
    assert res.rcond is not None and 0 < res.rcond < 1
    assert "RCOND" in res.stat.utime
