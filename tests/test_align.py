"""Etree-aligned block boundaries (ops/host/align.py).

The alignment pass must (a) preserve exact-solve correctness through every
driver path, (b) break the serial elimination chain that position blocking
produces under ND orderings (the reference gets this from the supernodal
etree's topological levels, supernodal_etree.c:32-1099), and (c) keep the
expansion bounded.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from superlu_dist_tpu import Options, SparseLU, gssvx
from superlu_dist_tpu.ops.host import align
from superlu_dist_tpu.ops.host import ordering as _ordering
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.options import ColPerm, Fact
from superlu_dist_tpu.utils.testing import laplacian_2d, laplacian_3d


def _nd_permuted(A):
    pc = _ordering.get_perm_c(ColPerm.METIS_AT_PLUS_A, sp.csc_matrix(A))
    return sp.csc_matrix(A)[pc, :][:, pc]


def test_expand_matrix_identity_pads():
    A = sp.csc_matrix(laplacian_2d(8))
    n = A.shape[0]
    expand = np.arange(n) + np.repeat(np.arange(4), n // 4)  # 1 pad per 16
    n_e = n + 4
    Ae = align.expand_matrix(A, expand, n_e)
    assert Ae.shape == (n_e, n_e)
    # pad diagonal entries are exactly 1, pads are fully decoupled
    dense = Ae.toarray()
    pads = np.setdiff1d(np.arange(n_e), expand)
    for p in pads:
        assert dense[p, p] == 1.0
        assert np.count_nonzero(dense[p, :]) == 1
        assert np.count_nonzero(dense[:, p]) == 1
    # original entries preserved
    assert np.allclose(dense[np.ix_(expand, expand)], A.toarray())


def test_sym_etree_matches_definition():
    A = sp.csc_matrix(laplacian_2d(6))
    parent = align.sym_etree(A)
    # etree of a symmetric pattern: parent[j] = min{i > j : L[i,j] != 0}
    # over the Cholesky fill; validate against dense symbolic Cholesky
    n = A.shape[0]
    M = (A.toarray() != 0).astype(float) + np.eye(n)
    for k in range(n):
        nz = np.flatnonzero(M[k + 1:, k]) + k + 1
        if len(nz):
            M[np.ix_(nz, nz)] = 1.0   # fill
            assert parent[k] == nz[0]
        else:
            assert parent[k] == -1


def test_alignment_breaks_serial_chain():
    A = _nd_permuted(laplacian_3d(14))
    bs = 32
    plain = block_symbolic(A, bs)
    res = align.aligned_blocking(A, bs)
    assert res is not None
    Aa = A[res.po, :][:, res.po]
    Ae = align.expand_matrix(Aa, res.expand, res.n_e)
    aligned = block_symbolic(Ae, bs)
    # parallelism recovered: many steps per level instead of a chain
    assert aligned.n_flevels < plain.n_flevels / 2
    assert aligned.nb / aligned.n_flevels >= 3.0
    # bounded expansion
    assert res.n_e <= 1.5 * plain.nb * bs
    # aligned blocking also reduces fill (blocks follow the structure)
    assert aligned.nslots <= plain.nslots * 1.2


@pytest.mark.parametrize("gen,m,bs", [(laplacian_3d, 9, 16),
                                      (laplacian_2d, 30, 16)])
def test_driver_exact_with_alignment(gen, m, bs, rng):
    A = sp.csc_matrix(gen(m))
    n = A.shape[0]
    b = rng.standard_normal(n)
    res, lu = gssvx(A, b, Options(block_size=bs, dtype="float64"))
    assert lu._expand is not None        # alignment actually engaged
    x_ref = spla.spsolve(A, b)
    assert np.abs(res.x - x_ref).max() / np.abs(x_ref).max() < 1e-9
    assert res.berr.max() < 1e-13
    # diag_u maps back through the expansion: logdet matches
    _, ld = lu.logdet()
    assert np.isclose(ld, np.linalg.slogdet(A.toarray())[1], rtol=1e-8)


def test_alignment_off_matches_on(rng):
    A = sp.csc_matrix(laplacian_3d(8))
    b = rng.standard_normal(A.shape[0])
    x_on, _ = gssvx(A, b, Options(block_size=16, dtype="float64"))
    x_off, lu_off = gssvx(A, b, Options(block_size=16, dtype="float64",
                                        align_blocks="off"))
    assert lu_off._expand is None
    assert np.allclose(x_on.x, x_off.x, rtol=1e-10, atol=1e-12)


def test_reuse_modes_with_alignment(rng):
    A = sp.csc_matrix(laplacian_3d(8)).astype(np.float64)
    n = A.shape[0]
    b = rng.standard_normal(n)
    lu = SparseLU(A, Options(block_size=16, dtype="float64"))
    assert lu._expand is not None
    A2 = A.copy()
    A2.data = A2.data * 1.7
    # SamePattern_SameRowPerm: reuses perms + plan + expansion
    lu.refactor(A2, fact=Fact.SAME_PATTERN_SAME_ROWPERM)
    x = lu.solve(b)
    assert np.abs(A2 @ x - b).max() / np.abs(b).max() < 1e-10
    # SamePattern: redoes row pivoting, reuses colperm + expansion
    lu.refactor(A2, fact=Fact.SAME_PATTERN)
    x = lu.solve(b)
    assert np.abs(A2 @ x - b).max() / np.abs(b).max() < 1e-10


def test_save_load_with_alignment(tmp_path, rng):
    from superlu_dist_tpu.models.driver import load_factors, save_factors
    A = sp.csc_matrix(laplacian_3d(8))
    n = A.shape[0]
    b = rng.standard_normal(n)
    lu = SparseLU(A, Options(block_size=16, dtype="float64"))
    assert lu._expand is not None
    p = tmp_path / "f.npz"
    save_factors(lu, p)
    lu2 = load_factors(p)
    assert np.allclose(lu2.solve(b), lu.solve(b), rtol=1e-12)


def test_complex_embed_alignment(rng):
    """complex64 embedding halves the effective block width; alignment must
    target complex columns so embedded blocks stay pair-aligned."""
    import os
    n0 = 12
    A = sp.csc_matrix(laplacian_3d(n0)).astype(np.complex64)
    A = A + 1j * sp.diags(0.1 * np.ones(A.shape[0]), format="csc",
                          dtype=np.complex64)
    b = (rng.standard_normal(A.shape[0])
         + 1j * rng.standard_normal(A.shape[0])).astype(np.complex64)
    os.environ["SLU_TPU_COMPLEX"] = "embed"
    try:
        res, lu = gssvx(A, b, Options(block_size=32, dtype="complex64"))
    finally:
        del os.environ["SLU_TPU_COMPLEX"]
    assert lu._embed and lu._expand is not None
    rel = np.abs(A @ res.x - b).max() / np.abs(b).max()
    assert rel < 1e-5
    assert res.berr.max() < 1e-6


def test_transpose_solve_with_alignment(rng):
    A = sp.csc_matrix(laplacian_3d(8))
    A = A + sp.random(A.shape[0], A.shape[0], density=0.002,
                      random_state=3, format="csc")  # break symmetry
    b = rng.standard_normal(A.shape[0])
    lu = SparseLU(A, Options(block_size=16, dtype="float64"))
    assert lu._expand is not None
    xt = lu.solve_transposed(b)
    assert np.abs(A.T @ xt - b).max() / np.abs(b).max() < 1e-10
