"""Host preprocessing: equilibration, MC64 matching, orderings, etree."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linear_sum_assignment

from superlu_dist_tpu.ops.host import equil, etree, mc64, ordering
from superlu_dist_tpu.utils.options import ColPerm
from superlu_dist_tpu.utils.testing import laplacian_2d, random_sparse


class TestEquil:
    def test_scaling_bounds(self):
        rng = np.random.default_rng(0)
        A = sp.random(40, 40, density=0.2, random_state=rng, format="csc")
        A.setdiag(rng.random(40) * 1e6 + 1)
        A2, R, C, equed = equil.equilibrate(A)
        # every row and column max of the scaled matrix is ~1
        m = np.abs(A2.toarray())
        assert m.max() <= 1 + 1e-12
        assert np.all(m.max(axis=1) > 1e-8)

    def test_zero_row_raises(self):
        A = sp.csc_matrix(np.array([[1.0, 0], [0, 0]]))
        with pytest.raises(equil.SingularMatrixError):
            equil.gsequ(A)

    def test_well_scaled_noop(self):
        A = sp.identity(10, format="csc") * 1.0
        _, _, _, equed = equil.equilibrate(A)
        from superlu_dist_tpu.utils.options import DiagScale
        assert equed == DiagScale.NOEQUIL


class TestMC64:
    @pytest.mark.parametrize("seed", range(5))
    def test_optimal_product(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 30))
        A = sp.random(n, n, density=0.4, random_state=rng, format="lil")
        p = rng.permutation(n)
        for j in range(n):
            A[p[j], j] = rng.random() + 0.1
        A = sp.csc_matrix(A)
        A.eliminate_zeros()
        rowperm, u, v, logc = mc64.maximum_product_matching(A)
        M = np.abs(A.toarray())
        L = np.where(M > 0, np.log(np.maximum(M, 1e-300)), -1e18)
        ri, ci = linear_sum_assignment(-L)
        assert abs(L[ri, ci].sum()
                   - sum(L[rowperm[j], j] for j in range(n))) < 1e-8

    def test_job5_scaling_property(self):
        A = random_sparse(60, density=0.1, seed=7, diag_dominant=False)
        rowperm, R1, C1 = mc64.ldperm(A, job=5)
        B = np.abs(np.diag(R1) @ A.toarray() @ np.diag(C1))
        assert B.max() <= 1 + 1e-8
        d = np.array([B[rowperm[j], j] for j in range(60)])
        assert np.allclose(d, 1.0, atol=1e-8)

    def test_structurally_singular(self):
        A = sp.csc_matrix((3, 3))
        A = sp.lil_matrix((3, 3))
        A[0, 0] = 1.0
        A[1, 0] = 1.0  # column 1,2 empty
        A[2, 0] = 1.0
        A[0, 1] = 1.0
        A[1, 1] = 1.0
        with pytest.raises(equil.SingularMatrixError):
            mc64.maximum_product_matching(sp.csc_matrix(A))


class TestOrdering:
    @pytest.mark.parametrize("strategy", [
        ColPerm.NATURAL, ColPerm.MMD_AT_PLUS_A, ColPerm.MMD_ATA,
        ColPerm.COLAMD, ColPerm.METIS_AT_PLUS_A])
    def test_valid_permutation(self, strategy):
        A = laplacian_2d(7)
        p = ordering.get_perm_c(strategy, A)
        assert sorted(p.tolist()) == list(range(A.shape[0]))

    def test_fill_reduction(self):
        """Orderings must beat natural order on LU fill for a 2D Laplacian."""
        import scipy.sparse.linalg as spla
        A = laplacian_2d(12).tocsc()
        fills = {}
        for strat in (ColPerm.NATURAL, ColPerm.MMD_AT_PLUS_A,
                      ColPerm.METIS_AT_PLUS_A):
            p = ordering.get_perm_c(strat, A)
            Ap = A[p][:, p]
            lu = spla.splu(Ap, permc_spec="NATURAL",
                           options=dict(SymmetricMode=True),
                           diag_pivot_thresh=0.0)
            fills[strat] = lu.L.nnz + lu.U.nnz
        assert fills[ColPerm.MMD_AT_PLUS_A] < fills[ColPerm.NATURAL]
        assert fills[ColPerm.METIS_AT_PLUS_A] < fills[ColPerm.NATURAL]


class TestEtree:
    def test_chain(self):
        # bidiagonal matrix → etree is a chain
        n = 6
        A = sp.diags([np.ones(n), np.ones(n - 1)], [0, -1], format="csc")
        parent = etree.col_etree(A)
        assert parent.tolist() == [1, 2, 3, 4, 5, -1]

    def test_postorder_valid(self):
        A = laplacian_2d(5)
        parent = etree.col_etree(A)
        post = etree.postorder(parent)
        assert sorted(post.tolist()) == list(range(A.shape[0]))
        # children appear before parents
        pos = np.empty(len(post), dtype=int)
        pos[post] = np.arange(len(post))
        for v, p in enumerate(parent):
            if p >= 0:
                assert pos[v] < pos[p]

    def test_levels(self):
        n = 6
        A = sp.diags([np.ones(n), np.ones(n - 1)], [0, -1], format="csc")
        lv = etree.tree_levels(etree.col_etree(A))
        assert lv.tolist() == [0, 1, 2, 3, 4, 5]


def test_hwpm_matching_quality_and_driver():
    """Parallel HWPM (auction; native/hwpm.cpp — the d_c2cpp_GetHWPM
    analog): must produce a perfect matching whose log-product weight is
    near the exact MC64 optimum, and the LARGE_DIAG_HWPM driver path must
    solve to full accuracy (permutation only, no scalings — matching the
    reference's HWPM semantics)."""
    import scipy.sparse as sp
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.ops.host.mc64 import (hwpm_rowperm,
                                                maximum_product_matching)
    from superlu_dist_tpu.utils.options import RowPerm

    rng = np.random.default_rng(5)
    A = sp.random(200, 200, density=0.05, random_state=rng, format="csc")
    A.setdiag(A.diagonal() + 0.05)
    p = hwpm_rowperm(A)
    assert sorted(p) == list(range(200))
    w = np.log(np.abs(sp.csc_matrix(A)[p, :].diagonal())).sum()
    pe, _, _, _ = maximum_product_matching(A)
    we = np.log(np.abs(sp.csc_matrix(A)[pe, :].diagonal())).sum()
    assert w >= we - 1e-2 * max(1.0, abs(we))

    b = np.asarray(A @ np.ones(200))
    lu = SparseLU(A, Options(dtype="float64",
                             row_perm=RowPerm.LARGE_DIAG_HWPM))
    x = lu.solve(b)
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-10
