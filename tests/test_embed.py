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


# ---------------------------------------------------------------------------
# distributed embed: complex64 on the mesh via the f32 collective executors
# (reference: SRC/complex16/pzgstrf.c / pzgstrs.c on the same 2D/3D grids)
# ---------------------------------------------------------------------------

import jax

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
@pytest.mark.parametrize("kind", ["dist2d", "dist3d"])
def test_embed_distributed_matches_single(embed_env, kind):
    """gssvx_dist/gssvx3d on cg20.cua through the ring embedding must
    match the single-chip embed result (the f32 mesh machinery reused
    unchanged — the VERDICT r3 item 4 contract)."""
    from superlu_dist_tpu.utils.testing import reference_matrix
    A = reference_matrix("cg20.cua")
    if A is None:
        pytest.skip("reference fixture not available")
    A = A.astype(np.complex64)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = (rng.standard_normal(n)
          + 1j * rng.standard_normal(n)).astype(np.complex64)
    b = np.asarray(A @ xt)
    opts = Options(dtype="complex64", block_size=16)

    lu1 = SparseLU(A, opts)
    assert lu1._embed
    x1 = lu1.solve(b)

    if kind == "dist2d":
        from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
        from superlu_dist_tpu.parallel.grid import Grid2D
        lu2 = DistributedSparseLU(A, Grid2D(2, 4), opts)
    else:
        from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU
        from superlu_dist_tpu.parallel.grid import Grid3D
        lu2 = Distributed3DSparseLU(A, Grid3D(2, 2, 2), opts)
    assert lu2._embed, "distributed drivers must embed complex64"
    x2 = lu2.solve(b)
    assert np.abs(x2 - x1).max() < 1e-5
    assert np.abs(x2 - xt).max() / np.abs(xt).max() < 1e-4
    # refinement through the (planar-residual) host loop
    xr, berr = lu2.refine(b, x2)
    assert float(np.max(berr)) < 1e-13
    # diag_u re/im extraction from the embedded mesh pool
    assert np.abs(lu2.diag_u() - lu1.diag_u()).max() < 1e-4
    # Aᵀ and Aᴴ through the embedded mesh pool
    from superlu_dist_tpu import Trans
    xc = lu2.solve(np.asarray(A.conj().T @ xt), trans=Trans.CONJ)
    assert np.abs(xc - xt).max() / np.abs(xt).max() < 1e-4
    xT = lu2.solve(np.asarray(A.T @ xt), trans=Trans.TRANS)
    assert np.abs(xT - xt).max() / np.abs(xt).max() < 1e-4


def test_solve_rejects_bad_trans():
    """An unrecognized trans value must raise, not silently run NOTRANS
    (int codes 0/1/2 and letters 'N'/'T'/'C' are accepted)."""
    A = laplacian_2d(8)
    lu = SparseLU(A, Options(dtype="float64", block_size=16))
    b = np.ones(A.shape[0])
    x_t = lu.solve(b, trans=1)
    assert np.allclose(x_t, lu.solve_transposed(b), atol=1e-12)
    x_s = lu.solve(b, trans="N")
    assert np.allclose(x_s, lu.solve(b), atol=1e-12)
    with pytest.raises(ValueError):
        lu.solve(b, trans="bogus")
    with pytest.raises(ValueError):
        lu.solve(b, trans=7)
    with pytest.raises(ValueError):
        lu.solve(b, trans=-1)      # negative indexing must not map to CONJ
    with pytest.raises(ValueError):
        lu.solve(b, trans=True)    # bools are not trans codes


@needs_8
def test_embed_dist_in_mesh_refine(embed_env):
    """The ring-embedded mesh driver refines IN-MESH (one fused
    shard_map while_loop — the pzgsrfs analog), not via the host loop."""
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.testing import reference_matrix
    A = reference_matrix("cg20.cua")
    if A is None:
        pytest.skip("complex fixture not available")
    A = A.astype(np.complex64)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = (rng.standard_normal(n)
          + 1j * rng.standard_normal(n)).astype(np.complex64)
    b = np.asarray(A @ xt)
    lu = DistributedSparseLU(A, Grid2D(2, 4),
                             Options(dtype="complex64", block_size=16))
    assert lu._embed and lu._fused_cplx_ok()
    x = lu.solve(b)
    xr, berr = lu.refine(b, x)
    assert float(np.max(berr)) < 1e-13
    assert lu.stat.refine_steps >= 1


def test_complex_fused_refine_follows_refactor():
    """Review regression: the cached complex fused-refine must read the
    CURRENT matrix's COO values after a SamePattern_SameRowPerm
    refactor (a stale closure refined against the old matrix)."""
    from superlu_dist_tpu import Fact
    rng = np.random.default_rng(6)
    A = sp.random(80, 80, density=0.1, random_state=3, format="csc")
    A = (A + 1j * 0.4 * sp.random(80, 80, density=0.1, random_state=4,
                                  format="csc")).tocsc()
    A.setdiag(A.diagonal() + 5)
    lu = SparseLU(A, Options(dtype="complex128", block_size=16))
    b = np.asarray(A @ np.ones(80))
    lu.refine(b, lu.solve(b))     # caches the fused complex refine
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 0.3 * rng.standard_normal(A.nnz))
    lu.refactor(A2, fact=Fact.SAME_PATTERN_SAME_ROWPERM)
    b2 = np.asarray(A2 @ np.ones(80))
    x2, berr = lu.refine(b2, lu.solve(b2))
    assert float(np.max(berr)) < 1e-13, "refined against stale values"
    assert np.abs(x2 - 1).max() < 1e-10
