"""2D mesh-distributed factorization/solve vs single-chip results.

The virtual 8-device CPU mesh stands in for a TPU slice (the reference's
oversubscribed-MPI testing strategy, .ci_tests.sh)."""

import numpy as np
import pytest

import jax

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.models.dist_driver import DistributedSparseLU, gssvx_dist
from superlu_dist_tpu.parallel.grid import Grid2D, Grid3D
from superlu_dist_tpu.utils.options import ColPerm
from superlu_dist_tpu.utils.testing import (THRESH, compute_resid,
                                            laplacian_2d, random_sparse,
                                            reference_matrix)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
@pytest.mark.parametrize("pr,pc", [(1, 1), (2, 2), (2, 4), (4, 2), (1, 8)])
def test_grid_shapes(pr, pc):
    A = laplacian_2d(9)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = A @ xt
    grid = Grid2D(pr, pc)
    res, lu = gssvx_dist(A, b, grid, Options(dtype="float32", block_size=16))
    assert compute_resid(A, res.x, b) < THRESH
    assert res.berr.max() < 1e-13


@needs_8
def test_matches_single_chip():
    """Distributed and single-chip factorizations agree to roundoff."""
    A = random_sparse(120, density=0.05, seed=4)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = A @ rng.standard_normal(n)
    opts = Options(dtype="float64", block_size=16,
                   col_perm=ColPerm.MMD_AT_PLUS_A)
    lu1 = SparseLU(A, opts)
    x1 = lu1.solve(b)
    lu2 = DistributedSparseLU(A, Grid2D(2, 2), opts)
    x2 = lu2.solve(b)
    assert np.abs(x1 - x2).max() < 1e-9 * max(1.0, np.abs(x1).max())
    # diag(U) agrees too
    assert np.allclose(lu1.diag_u(), lu2.diag_u(), rtol=1e-9)


@needs_8
def test_dist_multirhs_and_g20():
    A = reference_matrix("g20.rua")
    if A is None:
        A = laplacian_2d(20)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    xt = rng.standard_normal((n, 3))
    b = np.asarray(A @ xt)
    res, lu = gssvx_dist(A, b, Grid2D(2, 2),
                         Options(dtype="float32", block_size=32))
    assert res.berr.max() < 1e-13
    for j in range(3):
        assert compute_resid(A, res.x[:, j], b[:, j]) < THRESH


def test_grid_validation():
    with pytest.raises(ValueError):
        Grid2D(100, 100)


@needs_8
def test_block_cyclic_balance():
    """Block-cyclic ownership spreads Schur work across the grid."""
    from superlu_dist_tpu.parallel import dist2d
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic
    A = laplacian_2d(16)
    plan = block_symbolic(A, 8)
    dplan = dist2d.partition_plan(plan, 2, 2)
    g = np.asarray(dplan.gptr)[:, :, -1].ravel().astype(float)
    assert g.sum() == len(plan.g_l)
    if g.sum() >= 40:
        assert g.max() <= 3.0 * g.mean()


@needs_8
def test_compact_solve_comm_volume():
    """Solve collective volume is proportional to the per-level active
    rows (the fmod/fsendx participant-list analog, pdgstrs.c:344-827),
    not to nb x nlvl full-X psums; and the counter is recorded."""
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    from superlu_dist_tpu.parallel import dist2d
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic
    A = laplacian_2d(20)
    plan = block_symbolic(A, 16)
    dplan = dist2d.partition_plan(plan, 2, 2)
    vol = dplan.comm_volume(itemsize=4, nrhs=1)
    # full-X alternative: one (nb+1)-row psum per gemm level and the
    # replicated-inverse alternative: one (nb+1)-block psum per level
    full_solve = (plan.lsol_nlvl + plan.usol_nlvl) * (plan.nb + 1) * 16 * 4
    full_factor = plan.n_flevels * 2 * (plan.nb + 1) * 16 * 16 * 4
    assert vol["solve_psum_bytes"] < full_solve
    assert vol["factor_psum_bytes"] < full_factor
    # counter lands in Stats and numerics still match the dense solve
    rng = np.random.default_rng(5)
    xt = rng.standard_normal(A.shape[0])
    b = np.asarray(A @ xt)
    res, lu = gssvx_dist(A, b, Grid2D(2, 2),
                         Options(dtype="float64", block_size=16))
    assert "solve_psum_bytes" in lu.stat.counters
    assert compute_resid(A, res.x, b) < THRESH


@needs_8
def test_owner_local_inverses_sharded():
    """Factor returns owner-local diagonal inverses, sharded over the
    mesh (not nb-replicated): shape (pr, pc, dlen+1, B, B)."""
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    A = laplacian_2d(16)
    lu = DistributedSparseLU(A, Grid2D(2, 2),
                             Options(dtype="float32", block_size=16))
    dlen = lu.dplan.dstep.shape[-1]
    assert lu.linv.shape == (2, 2, dlen + 1, 16, 16)
    assert lu.uinv.shape == (2, 2, dlen + 1, 16, 16)


@needs_8
@pytest.mark.parametrize("kind", ["dist2d", "dist3d"])
def test_save_load_from_mesh_driver(kind, tmp_path):
    """Checkpoints written on any grid load as portable single-chip
    SolveOnly objects (save_factors gathers the sharded pool into the
    canonical layout; the WRITELU/SolveOnly contract)."""
    from superlu_dist_tpu.models.driver import load_factors, save_factors
    A = laplacian_2d(12)
    n = A.shape[0]
    b = np.asarray(A @ np.ones(n))
    opts = Options(dtype="float32", block_size=16)
    if kind == "dist2d":
        lu = DistributedSparseLU(A, Grid2D(2, 4), opts)
    else:
        from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU
        lu = Distributed3DSparseLU(A, Grid3D(2, 2, 2), opts)
    p = tmp_path / "f.npz"
    save_factors(lu, p)
    lu2 = load_factors(p)
    x, berr = lu2.refine(b, lu2.solve(b))
    assert np.abs(x - 1).max() < 1e-12 and float(np.max(berr)) < 1e-13
    xt = lu2.solve_transposed(b)
    assert np.abs(xt - 1).max() < 1e-5


@needs_8
def test_dist_ilu_preconditioner():
    """ILU(k) symbolic through the distributed executors (reference:
    ilu_level_symbfact + the distributed factorization consuming it)."""
    A = random_sparse(128, density=0.06, seed=4, diag_dominant=True)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = np.asarray(A @ rng.standard_normal(n))
    lu0 = SparseLU(A, Options(dtype="float32", block_size=16, ilu_level=0))
    lud = DistributedSparseLU(A, Grid2D(2, 4),
                              Options(dtype="float32", block_size=16,
                                      ilu_level=0))
    x0, xd = lu0.solve(b), lud.solve(b)
    # both are the SAME incomplete factorization -> same approximation
    assert np.allclose(x0, xd, rtol=1e-3, atol=1e-4)


@needs_8
def test_dist_profile_levels():
    """Per-level device timing on the mesh (the slu_SCT_printComm3D
    role): one prefix program, per-level rows with the work mix."""
    A = laplacian_2d(12)
    lu = DistributedSparseLU(A, Grid2D(2, 4),
                             Options(dtype="float32", block_size=16))
    rows = lu.profile_levels()
    assert len(rows) == lu.dplan.nlvl
    assert sum(r["steps"] for r in rows) == lu.plan.nb
    assert all(r["ms"] >= 0 for r in rows)
    # factors stay live
    b = np.asarray(A @ np.ones(A.shape[0]))
    assert np.abs(lu.solve(b) - 1).max() < 1e-5
