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
