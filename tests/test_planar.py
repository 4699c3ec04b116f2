"""Planar-complex executor: forced (re, im)-plane arithmetic vs the
native complex executor (TPU has no complex dtype; on CPU both run, so the
planar path is validated against native complex end to end)."""

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu import Options, SparseLU, Trans
from superlu_dist_tpu.models.driver import gssvx
from superlu_dist_tpu.utils.testing import random_sparse


def _complex_matrix(n=120, seed=3, density=0.06):
    rng = np.random.default_rng(seed)
    A = sp.csc_matrix(random_sparse(n, density=density, seed=seed)
                      .astype(np.complex128))
    A.data = A.data + 1j * rng.standard_normal(A.nnz)
    return A


@pytest.fixture(scope="module")
def pair():
    A = _complex_matrix()
    opts = Options(dtype="complex64", block_size=32)
    import os
    os.environ["SLU_TPU_FORCE_PLANAR"] = "1"
    try:
        lu_p = SparseLU(A, opts)
    finally:
        os.environ["SLU_TPU_FORCE_PLANAR"] = "0"
    lu_c = SparseLU(A, opts)
    del os.environ["SLU_TPU_FORCE_PLANAR"]
    return A, lu_p, lu_c


def test_planar_pool_layout(pair):
    A, lu_p, lu_c = pair
    assert lu_p._use_planar() and not lu_c._use_planar()
    assert np.asarray(lu_p.pool).ndim == 4       # (slots, 2, bs, bs)
    assert np.asarray(lu_p.pool).dtype == np.float32


def test_planar_factor_matches_native(pair):
    A, lu_p, lu_c = pair
    pc = np.asarray(lu_p.pool)
    pc = pc[:, 0] + 1j * pc[:, 1]
    cc = np.asarray(lu_c.pool)
    scale = np.abs(cc).max()
    assert np.abs(pc - cc).max() < 1e-5 * scale


def test_planar_solve(pair):
    A, lu_p, lu_c = pair
    rng = np.random.default_rng(0)
    n = A.shape[0]
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = np.asarray(A @ xt)
    x = lu_p.solve(b)
    assert np.abs(x - xt).max() < 1e-3 * np.abs(xt).max()
    xc = lu_c.solve(b)
    assert np.abs(x - xc).max() < 1e-4 * np.abs(xt).max()


def test_planar_multirhs_and_refine(pair):
    A, lu_p, _ = pair
    rng = np.random.default_rng(1)
    n = A.shape[0]
    Xt = rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))
    B = np.asarray(A @ Xt)
    X = lu_p.solve(B)
    X, berr = lu_p.refine(B, X)
    assert berr.max() < 1e-6
    assert np.abs(X - Xt).max() < 1e-5 * np.abs(Xt).max()


def test_planar_transpose_and_conj(pair):
    A, lu_p, _ = pair
    rng = np.random.default_rng(2)
    n = A.shape[0]
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = lu_p.solve(np.asarray(A.T @ xt), trans=Trans.TRANS)
    assert np.abs(x - xt).max() < 1e-3 * np.abs(xt).max()
    x = lu_p.solve(np.asarray(A.conj().T @ xt), trans=Trans.CONJ)
    assert np.abs(x - xt).max() < 1e-3 * np.abs(xt).max()


def test_planar_diag_u_logdet(pair):
    A, lu_p, lu_c = pair
    dp, dc = lu_p.diag_u(), lu_c.diag_u()
    assert dp.dtype.kind == "c"
    assert np.abs(dp - dc).max() < 1e-4 * np.abs(dc).max()
    (ph_p, la_p), (ph_c, la_c) = lu_p.logdet(), lu_c.logdet()
    assert abs(la_p - la_c) < 1e-3 * abs(la_c)
    assert abs(ph_p - ph_c) < 1e-3


def test_planar_gssvx_end_to_end():
    A = _complex_matrix(n=80, seed=9)
    rng = np.random.default_rng(4)
    xt = rng.standard_normal(80) + 1j * rng.standard_normal(80)
    b = np.asarray(A @ xt)
    import os
    os.environ["SLU_TPU_FORCE_PLANAR"] = "1"
    try:
        res, lu = gssvx(A, b, Options(dtype="complex64", block_size=16))
    finally:
        del os.environ["SLU_TPU_FORCE_PLANAR"]
    assert res.berr.max() < 1e-6
    assert np.abs(res.x - xt).max() < 1e-4 * np.abs(xt).max()


def test_planar_complex128():
    A = _complex_matrix(n=64, seed=5)
    rng = np.random.default_rng(6)
    xt = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    b = np.asarray(A @ xt)
    import os
    os.environ["SLU_TPU_FORCE_PLANAR"] = "1"
    try:
        lu = SparseLU(A, Options(dtype="complex128", block_size=16))
    finally:
        del os.environ["SLU_TPU_FORCE_PLANAR"]
    assert np.asarray(lu.pool).dtype == np.float64
    x = lu.solve(b)
    assert np.abs(x - xt).max() < 1e-10 * np.abs(xt).max()


def test_planar_save_load(tmp_path, pair):
    from superlu_dist_tpu.models.driver import save_factors, load_factors
    A, lu_p, _ = pair
    path = tmp_path / "factors_planar.npz"
    save_factors(lu_p, path)
    lu2 = load_factors(path)
    assert lu2._use_planar()
    rng = np.random.default_rng(7)
    n = A.shape[0]
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = np.asarray(A @ xt)
    x = lu2.solve(b)
    assert np.abs(x - xt).max() < 1e-3 * np.abs(xt).max()
