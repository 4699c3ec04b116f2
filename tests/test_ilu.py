"""Level-based incomplete factorization (ILU(k) symbolic analog)."""

import numpy as np
import pytest

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.options import ColPerm, Equil, RowPerm
from superlu_dist_tpu.utils.testing import laplacian_2d


def test_ilu_pattern_monotone():
    """ILU(0) ⊆ ILU(1) ⊆ ... ⊆ complete, with ILU(0) = A's block pattern."""
    A = laplacian_2d(12)
    sizes = []
    for k in (0, 1, 3):
        plan = block_symbolic(A, 8, ilu_level=k)
        sizes.append(plan.nslots)
    full = block_symbolic(A, 8).nslots
    assert sizes[0] <= sizes[1] <= sizes[2] <= full
    p0 = block_symbolic(A, 8, ilu_level=0)
    assert p0.nslots == p0.a_blocks   # no fill at level 0


def test_ilu_preconditioned_iteration_converges():
    """ILU(1) + iterative refinement = preconditioned Richardson; converges
    on a diagonally dominant problem."""
    A = laplacian_2d(10)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = A @ xt
    lu = SparseLU(A, Options(dtype="float64", block_size=8, ilu_level=1,
                             row_perm=RowPerm.NOROWPERM, equil=Equil.NO,
                             col_perm=ColPerm.NATURAL,
                             max_refine_steps=60, refine_rthresh=1.0))
    x, berr = lu.refine(b, lu.solve(b))
    assert np.abs(x - xt).max() < 1e-8
