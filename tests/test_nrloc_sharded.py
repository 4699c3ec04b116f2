"""Sharded NRLoc input: the dReDistribute_A analog (owner-computed pool
init from row chunks, device-side exchange; reference:
SRC/double/pddistribute.c:66-433)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.parallel import dist2d
from superlu_dist_tpu.parallel.grid import Grid2D
from superlu_dist_tpu.utils.nrloc import NRLocMatrix
from superlu_dist_tpu.utils.testing import laplacian_2d, random_sparse

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
@pytest.mark.parametrize("with_mc64", [False, True])
def test_nrloc_offsets_match_gathered_pool(with_mc64):
    """The per-entry (device, offset, value) mapping + exchange must
    reproduce init_local_pools built from the global permuted matrix."""
    from superlu_dist_tpu.utils.options import RowPerm
    A = random_sparse(96, density=0.08, seed=5, diag_dominant=True)
    n = A.shape[0]
    opts = Options(dtype="float32", block_size=16,
                   row_perm=(RowPerm.LARGE_DIAG_MC64 if with_mc64
                             else RowPerm.NOROWPERM))
    lu = SparseLU(A, opts)   # reuse its preprocessing outputs
    plan = lu.plan
    grid = Grid2D(2, 4)
    dplan = dist2d.partition_plan(plan, 2, 4)

    # reference pool from the global permuted/scaled matrix
    A3 = A.multiply(lu.row_scale[:, None]) \
          .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    A3 = lu._expand_A(sp.csc_matrix(A3))
    ref = np.asarray(dist2d.init_local_pools(plan, dplan, A3, np.float32,
                                             grid))

    # NRLoc mapping from raw row chunks of the ORIGINAL A
    chunks = NRLocMatrix.from_global(A, 3).chunks
    dev, off, val = dist2d.nrloc_entry_offsets(
        plan, dplan, chunks, lu.row_scale, lu.col_scale, lu.rowperm,
        lu.colperm, lu._expand, lu._n_e, n, with_identity=True)
    got = np.asarray(dist2d.init_local_pools_nrloc(
        plan, dplan, grid, dev, off, val, np.float32))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-6


def test_nrloc_local_flags():
    A = laplacian_2d(6)
    n = A.shape[0]
    full = NRLocMatrix.from_global(A, 2)
    assert not full.local
    part = NRLocMatrix([(0, sp.csr_matrix(A)[:10])], n, local=True)
    assert part.local
    with pytest.raises(ValueError):
        part.to_global()
    P = part.to_partial_csc()
    assert P.shape == (n, n) and P.nnz == sp.csr_matrix(A)[:10].nnz
    with pytest.raises(ValueError):
        NRLocMatrix([(0, sp.csr_matrix(A)[:10])], n)   # gap without local


@needs_8
def test_nrloc_offsets_match_gathered_pool_3d():
    """3D owner mapping + exchange reproduces init_local_pools3d."""
    from superlu_dist_tpu.parallel import dist3d
    from superlu_dist_tpu.parallel.grid import Grid3D
    A = random_sparse(96, density=0.08, seed=5, diag_dominant=True)
    n = A.shape[0]
    lu = SparseLU(A, Options(dtype="float32", block_size=16))
    plan = lu.plan
    grid = Grid3D(2, 2, 2)
    dplan = dist3d.partition_plan3d(plan, 2, 2, 2)

    A3 = A.multiply(lu.row_scale[:, None]) \
          .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    A3 = lu._expand_A(sp.csc_matrix(A3))
    ref = np.asarray(dist3d.init_local_pools3d(plan, dplan, A3,
                                               np.float32, grid))

    chunks = NRLocMatrix.from_global(A, 3).chunks
    dev, off, val = dist3d.nrloc_entry_offsets3d(
        plan, dplan, chunks, lu.row_scale, lu.col_scale, lu.rowperm,
        lu.colperm, lu._expand, lu._n_e, n, with_identity=True)
    got = np.asarray(dist3d.init_local_pools3d_nrloc(
        plan, dplan, grid, dev, off, val, np.float32))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-6
