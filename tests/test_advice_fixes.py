"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. gssvx honors Options.trans (reference: pdgssvx honors options->Trans,
   pdgssvx.c:622) — solve, refinement, and berr all use A / Aᵀ / Aᴴ.
2. Distributed drivers raise a clear NotImplementedError for transpose
   solves / rcond instead of crashing in the executor.
3. read_triple parses the two-token "n nnz" header and integer-valued data.
4. IterRefine.SLU_SINGLE keeps working-precision residuals (psgssvx), while
   SLU_DOUBLE promotes (psgssvx_d2).
5. BatchedSparseLU recomputes equilibration scalings + tiny-pivot threshold
   per matrix in the batch.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from superlu_dist_tpu import Options, SparseLU, Trans
from superlu_dist_tpu.models.driver import gssvx
from superlu_dist_tpu.utils.options import IterRefine
from superlu_dist_tpu.utils.testing import laplacian_2d, random_sparse

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.mark.parametrize("trans", [Trans.TRANS, Trans.CONJ])
def test_gssvx_honors_trans(trans):
    rng = np.random.default_rng(3)
    A = random_sparse(80, density=0.08, seed=7, diag_dominant=False)
    if trans == Trans.CONJ:
        A = sp.csc_matrix(A.astype(np.complex128))
        A.data = A.data + 1j * rng.standard_normal(A.nnz)
        opts = Options(dtype="complex128", block_size=16, trans=trans)
        op = A.conj().T
    else:
        opts = Options(dtype="float64", block_size=16, trans=trans)
        op = A.T
    xt = rng.standard_normal(A.shape[0])
    b = np.asarray(op @ xt)
    res, lu = gssvx(A, b, opts)
    # the solution must satisfy op x = b, not A x = b
    assert np.abs(op @ res.x - b).max() < 1e-9 * np.abs(b).max()
    assert res.berr.max() < 1e-12


def test_gssvx_trans_berr_without_refine():
    rng = np.random.default_rng(4)
    A = random_sparse(60, density=0.1, seed=9)
    xt = rng.standard_normal(60)
    b = np.asarray(A.T @ xt)
    opts = Options(dtype="float64", block_size=16, trans=Trans.TRANS,
                   iter_refine=IterRefine.NOREFINE)
    res, lu = gssvx(A, b, opts)
    assert np.abs(A.T @ res.x - b).max() < 1e-9 * np.abs(b).max()
    assert res.berr.max() < 1e-12    # berr of the Aᵀ system


@needs_8
def test_distributed_transpose_supported():
    """Round-4 capability: the distributed drivers solve Aᵀ (the former
    NotImplementedError guard; full coverage in test_trans_cond.py)."""
    import scipy.sparse.linalg as spla
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    from superlu_dist_tpu.parallel.grid import Grid2D
    A = laplacian_2d(8)
    n = A.shape[0]
    lu = DistributedSparseLU(A, Grid2D(2, 2),
                             Options(dtype="float32", block_size=16))
    b = np.ones(n)
    x = lu.solve(b, trans=Trans.TRANS)
    xr = spla.spsolve(A.T.tocsc(), b)
    assert np.abs(x - xr).max() / np.abs(xr).max() < 1e-5
    assert 0 < lu.rcond_1() < 1


def test_read_triple_two_token_header(tmp_path):
    from superlu_dist_tpu.utils.io import read_triple
    p = tmp_path / "id3.triple"
    p.write_text("3 3\n1 1 1\n2 2 2\n3 3 5\n")
    A = read_triple(p)
    assert A.shape == (3, 3)
    assert np.allclose(A.toarray(), np.diag([1.0, 2.0, 5.0]))


def test_read_triple_integer_values_three_token(tmp_path):
    from superlu_dist_tpu.utils.io import read_triple
    p = tmp_path / "int.triple"
    # integer-valued entries: the old '.'-sniff misparsed this form
    p.write_text("2 2 3\n1 1 4\n2 2 7\n1 2 1\n")
    A = read_triple(p)
    assert A.shape == (2, 2)
    assert np.allclose(A.toarray(), [[4.0, 1.0], [0.0, 7.0]])


def test_slu_single_refine_dtype():
    A = laplacian_2d(6)
    lu_s = SparseLU(A, Options(dtype="float32", block_size=16,
                               iter_refine=IterRefine.SLU_SINGLE))
    assert lu_s.refine_dtype == np.float32
    lu_d = SparseLU(A, Options(dtype="float32", block_size=16,
                               iter_refine=IterRefine.SLU_DOUBLE))
    assert lu_d.refine_dtype == np.float64
    # complex single stays complex64
    lu_c = SparseLU(A.astype(np.complex64),
                    Options(dtype="complex64", block_size=16,
                            iter_refine=IterRefine.SLU_SINGLE))
    assert lu_c.refine_dtype == np.complex64


def test_batched_per_matrix_scalings():
    from superlu_dist_tpu.models.batch import BatchedSparseLU
    A0 = laplacian_2d(7)
    n = A0.shape[0]
    # same pattern, wildly different row scales: with A0's scalings reused
    # the second factorization would be badly conditioned
    rng = np.random.default_rng(0)
    s = 10.0 ** rng.uniform(-6, 6, size=n)
    A1 = sp.csc_matrix(A0.multiply(s[:, None]))
    blu = BatchedSparseLU([A0, A1], Options(dtype="float32", block_size=16))
    # per-matrix scalings must differ
    assert not np.allclose(blu.row_scales[0], blu.row_scales[1])
    xt = rng.standard_normal((2, n))
    B = np.stack([np.asarray(A0 @ xt[0]), np.asarray(A1 @ xt[1])])
    X = blu.solve(B)
    X, berr = blu.refine(B, X)
    assert berr.max() < 1e-11
    assert np.abs(X - xt).max() < 1e-5 * np.abs(xt).max()
