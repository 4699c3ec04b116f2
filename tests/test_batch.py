"""Batched many-matrix interface (vmap same-pattern + block-diag composite)."""

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu import Options
from superlu_dist_tpu.models.batch import BatchedSparseLU, gssvx_batch
from superlu_dist_tpu.utils.testing import (THRESH, compute_resid,
                                            laplacian_2d, random_sparse)


def test_same_pattern_batch():
    base = laplacian_2d(7)
    rng = np.random.default_rng(0)
    As = []
    for i in range(4):
        A = base.copy()
        A.data = A.data * (1.0 + 0.1 * rng.standard_normal(A.nnz))
        As.append(sp.csc_matrix(A))
    n = base.shape[0]
    Xt = rng.standard_normal((4, n))
    Bs = np.stack([As[i] @ Xt[i] for i in range(4)])

    blu = BatchedSparseLU(As, Options(dtype="float32", block_size=16))
    X = blu.solve(Bs)
    X, berr = blu.refine(Bs, X)
    assert X.shape == (4, n)
    for i in range(4):
        assert compute_resid(As[i], X[i], Bs[i]) < THRESH
        assert np.abs(X[i] - Xt[i]).max() < 1e-8


def test_same_pattern_batch_rejects_mismatch():
    A1 = laplacian_2d(5)
    A2 = random_sparse(25, density=0.2, seed=1)
    with pytest.raises(ValueError):
        BatchedSparseLU([A1, A2], Options(dtype="float32", block_size=8))


def test_block_diag_composite_batch():
    rng = np.random.default_rng(2)
    As = [laplacian_2d(5),
          random_sparse(40, density=0.1, seed=3, diag_dominant=False),
          random_sparse(33, density=0.15, seed=4)]
    xs = [rng.standard_normal(A.shape[0]) for A in As]
    Bs = [np.asarray(A @ x) for A, x in zip(As, xs)]
    results, lu = gssvx_batch(As, Bs, Options(dtype="float32",
                                              block_size=16))
    assert len(results) == 3
    for res, A, b, xt in zip(results, As, Bs, xs):
        assert compute_resid(A, res.x, b) < THRESH
        assert res.berr.max() < 1e-12
        assert np.abs(res.x - xt).max() < 1e-6 * max(1, np.abs(xt).max())


def test_gssvx_batch_on_mesh():
    """The block-diagonal composite factors on a device mesh (the
    reference's batch runs through pdgssvx3d; reference:
    pdgssvx3d_csc_batch.c:80-503)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from superlu_dist_tpu.models.batch import gssvx_batch
    from superlu_dist_tpu.parallel.grid import Grid3D
    rng = np.random.default_rng(3)
    As, Bs, xs = [], [], []
    for i, n in enumerate((40, 56, 32)):
        A = random_sparse(n, density=0.1, seed=10 + i)
        xt = rng.standard_normal(n)
        As.append(A)
        xs.append(xt)
        Bs.append(np.asarray(A @ xt))
    res, lu = gssvx_batch(As, Bs, Options(dtype="float32", block_size=16),
                          grid=Grid3D(2, 2, 2))
    from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU
    assert isinstance(lu, Distributed3DSparseLU)
    for r, xt in zip(res, xs):
        assert np.abs(r.x - xt).max() < 1e-4
        assert float(np.max(r.berr)) < 1e-5


def test_gssvx_batch_on_2d_grid():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from superlu_dist_tpu import Grid2D
    from superlu_dist_tpu.models.batch import gssvx_batch
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    rng = np.random.default_rng(5)
    As, Bs, xs = [], [], []
    for i, n in enumerate((48, 36)):
        A = random_sparse(n, density=0.1, seed=20 + i)
        xt = rng.standard_normal(n)
        As.append(A)
        xs.append(xt)
        Bs.append(np.asarray(A @ xt))
    res, lu = gssvx_batch(As, Bs, Options(dtype="float32", block_size=16),
                          grid=Grid2D(2, 4))
    assert isinstance(lu, DistributedSparseLU)
    for r, xt in zip(res, xs):
        assert np.abs(r.x - xt).max() < 1e-4
