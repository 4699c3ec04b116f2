"""Complex64 via the real ring embedding (a+bi -> [[a,-b],[b,a]]).

On accelerators the embedding routes complex factorization through the
same fused f32 kernels; LU(embed(A)) = embed(LU(A)) exactly (ring
homomorphism). Reference parity: the z-precision suite (SRC/complex16/).
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu import Options, SparseLU, gssvx
from superlu_dist_tpu.utils.testing import laplacian_2d, laplacian_3d


@pytest.fixture
def embed_env():
    saved = {k: os.environ.get(k) for k in
             ("SLU_TPU_COMPLEX", "SLU_TPU_FORCE_PALLAS")}
    os.environ["SLU_TPU_COMPLEX"] = "embed"
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def _complex_fixture(n_grid=10, seed=3):
    rng = np.random.default_rng(seed)
    A = laplacian_2d(n_grid).tocsc().astype(np.complex64)
    A = A + 1j * sp.random(*A.shape, density=0.01,
                           random_state=rng.integers(1 << 30),
                           format="csc").astype(np.complex64)
    A = A + sp.eye(A.shape[0], dtype=np.complex64, format="csc") * (2 + 1j)
    return sp.csc_matrix(A)


def test_embed_matches_planar(embed_env):
    A = _complex_fixture()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = np.asarray(A @ xt)

    lu_e = SparseLU(A, Options(dtype="complex64", block_size=16))
    assert lu_e._embed
    x_e = lu_e.solve(b)

    os.environ["SLU_TPU_COMPLEX"] = "planar"
    lu_p = SparseLU(A, Options(dtype="complex64", block_size=16))
    assert not lu_p._embed
    x_p = lu_p.solve(b)

    scale = np.abs(x_p).max()
    assert np.abs(x_e - x_p).max() < 1e-4 * scale
    assert np.abs(A @ x_e - b).max() < 1e-4 * np.abs(b).max()


def test_embed_trans_conj_and_diag(embed_env):
    A = _complex_fixture(8, seed=5)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    lu = SparseLU(A, Options(dtype="complex64", block_size=16))
    assert lu._embed

    bt = np.asarray(A.T @ xt)
    x = lu.solve_transposed(bt)
    assert np.abs(A.T @ x - bt).max() < 1e-4 * np.abs(bt).max()

    bh = np.asarray(A.conj().T @ xt)
    xh = lu.solve_transposed(bh, conj=True)
    assert np.abs(A.conj().T @ xh - bh).max() < 1e-4 * np.abs(bh).max()

    # diag_u reconstructs complex U diagonals; logdet against dense
    du = lu.diag_u()
    assert du.dtype.kind == "c"
    sign, logabs = lu.logdet()
    dense_logabs = np.linalg.slogdet(A.toarray().astype(np.complex128))[1]
    assert abs(logabs - dense_logabs) < 1e-2 * max(abs(dense_logabs), 1.0)


def test_embed_refine_and_gssvx(embed_env):
    A = _complex_fixture(9, seed=7)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = np.asarray(A @ xt)
    res, lu = gssvx(A, b, Options(dtype="complex64", block_size=16))
    assert res.berr.max() < 1e-6
    assert np.abs(A @ res.x - b).max() < 1e-5 * np.abs(b).max()


def test_embed_save_load_roundtrip(embed_env, tmp_path):
    """Embedded complex factors must survive save/load: the loaded LU
    needs the embed flag to route solves through embed/unembed and the
    residual COO through the planar machinery (TPU cannot device_put
    complex arrays)."""
    import numpy as np
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.models.driver import load_factors, save_factors
    from superlu_dist_tpu.utils.testing import random_sparse

    A = random_sparse(60, density=0.08, seed=3).astype(np.complex64)
    A = A + 1j * 0.3 * random_sparse(60, density=0.08, seed=4).astype(
        np.complex64)
    A.setdiag(A.diagonal() + 4)
    lu = SparseLU(A, Options(dtype="complex64", block_size=8))
    rng = np.random.default_rng(0)
    b = np.asarray(A @ (rng.standard_normal(60)
                        + 1j * rng.standard_normal(60)))
    p = tmp_path / "f.npz"
    save_factors(lu, p)
    lu2 = load_factors(p)
    assert getattr(lu2, "_embed", False) == getattr(lu, "_embed", False)
    x = lu2.solve(b)
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-4
    xr, berr = lu2.refine(b, x)
    assert float(np.max(berr)) < 1e-13
