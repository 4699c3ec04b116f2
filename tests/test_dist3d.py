"""3D communication-avoiding factorization on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU, gssvx3d
from superlu_dist_tpu.parallel.grid import Grid3D
from superlu_dist_tpu.parallel.dist3d import partition_forest
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.options import ColPerm
from superlu_dist_tpu.utils.testing import (THRESH, compute_resid,
                                            laplacian_2d, random_sparse,
                                            reference_matrix)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def test_partition_forest_invariants():
    A = laplacian_2d(10)
    plan = block_symbolic(A, 8)
    for pz in (1, 2, 4):
        layer = partition_forest(plan, pz)
        assert layer.min() >= -1 and layer.max() < pz
        # ancestor closure: the top is closed under block-etree parents
        for k in range(plan.nb):
            p = plan.block_parent[k]
            if p >= 0 and layer[k] < 0:
                assert layer[p] < 0
        # cross-layer gemm independence
        for k in range(plan.nb):
            for t in range(plan.g_ptr[k], plan.g_ptr[k + 1]):
                a = plan.slot_step[plan.g_t[t]]
                if layer[a] >= 0:
                    assert layer[a] == layer[k]


@needs_8
@pytest.mark.parametrize("pz,pr,pc", [(2, 2, 2), (2, 1, 2), (4, 1, 2),
                                      (8, 1, 1), (1, 2, 2)])
def test_3d_grid_shapes(pz, pr, pc):
    A = laplacian_2d(9)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = A @ xt
    res, lu = gssvx3d(A, b, Grid3D(pz, pr, pc),
                      Options(dtype="float32", block_size=16))
    assert compute_resid(A, res.x, b) < THRESH
    assert res.berr.max() < 1e-13


@needs_8
def test_3d_matches_single_chip():
    A = random_sparse(130, density=0.04, seed=6)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = A @ rng.standard_normal(n)
    opts = Options(dtype="float64", block_size=16,
                   col_perm=ColPerm.METIS_AT_PLUS_A)
    x1 = SparseLU(A, opts).solve(b)
    lu3 = Distributed3DSparseLU(A, Grid3D(2, 2, 2), opts)
    x3 = lu3.solve(b)
    assert np.abs(x1 - x3).max() < 1e-9 * max(1.0, np.abs(x1).max())
    # a real forest split happened (unless the tree is degenerate)
    layers = lu3.dplan.step_layer
    if lu3.plan.nb >= 8:
        assert (layers >= 0).sum() > 0


@needs_8
def test_3d_complex_g20():
    A = reference_matrix("cg20.cua")
    if A is None:
        pytest.skip("no reference fixtures")
    n = A.shape[0]
    rng = np.random.default_rng(2)
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = np.asarray(A @ xt)
    res, _ = gssvx3d(A, b, Grid3D(2, 2, 2),
                     Options(dtype="complex64", block_size=32))
    assert res.berr.max() < 1e-13


def test_forest_load_balance():
    """Greedy subtree binning keeps per-layer work within a reasonable
    band (the SUPERLU_LBS load-balance goal)."""
    from superlu_dist_tpu.parallel.dist3d import step_costs
    A = laplacian_2d(16)
    plan = block_symbolic(A, 8)
    for pz in (2, 4):
        layer = partition_forest(plan, pz)
        cost = step_costs(plan)
        loads = [cost[layer == z].sum() for z in range(pz)]
        sub_total = sum(loads)
        if sub_total == 0:
            continue  # degenerate: everything in the top
        # no layer should carry more than ~2.5x its fair share of subtree work
        assert max(loads) <= 2.5 * sub_total / pz + cost.max()


@needs_8
def test_dist3d_profile_levels():
    """Per-level timing rows on the 3D mesh (layer + top phases), each
    elimination step counted exactly once."""
    from superlu_dist_tpu.utils.testing import laplacian_2d
    A = laplacian_2d(12)
    lu = Distributed3DSparseLU(A, Grid3D(2, 2, 2),
                               Options(dtype="float32", block_size=16))
    rows = lu.profile_levels()
    assert sum(r["steps"] for r in rows) == lu.plan.nb
    assert {r["phase"] for r in rows} <= {"layer", "top"}
    assert all(r["ms"] >= 0 for r in rows)
