"""pdtest cross-product harness: the FULL configuration product with
pre-equilibrated/pre-factored staging, exactly the reference CI loop
(reference: TEST/pdtest.c:107-563 — equil states x fact modes x nrhs,
re-creating the matrix per config, staging reuse modes from a prior
factorization, accepting iff the residual test value < THRESH=20.0 from
TEST/pdtest.c:44), plus a mutation check proving the harness catches a
deliberately-broken reuse path."""

import itertools

import numpy as np
import pytest

import jax

from superlu_dist_tpu import Fact, Options, gssvx
from superlu_dist_tpu.utils.options import Equil, IterRefine, RowPerm
from superlu_dist_tpu.utils.testing import (THRESH, compute_resid,
                                            reference_matrix,
                                            unsymmetric_pattern)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _matrix():
    g20 = reference_matrix("g20.rua")
    return g20 if g20 is not None else unsymmetric_pattern(120, seed=3)


A_BASE = _matrix()

EQUILS = [Equil.YES, Equil.NO]
ROWPERMS = [RowPerm.NOROWPERM, RowPerm.LARGE_DIAG_MC64]
FACTS = [Fact.DOFACT, Fact.SAME_PATTERN, Fact.SAME_PATTERN_SAME_ROWPERM,
         Fact.FACTORED]
NRHS = [1, 3]


def _perturbed(A, seed):
    rng = np.random.default_rng(seed)
    B = A.copy()
    B.data = B.data * (1.0 + 0.05 * rng.standard_normal(A.nnz))
    return B


def _run_config(A, opts, fact, nrhs, grid=None):
    """One pdtest config: stage reuse modes from a prior factorization
    (pdtest.c:231-247), solve, residual-test each RHS."""
    n = A.shape[0]
    rng = np.random.default_rng(42)
    xt = rng.standard_normal((n, nrhs))
    b = np.asarray(A @ xt)

    def solve(A_, opts_, lu=None):
        if grid is None:
            return gssvx(A_, b, opts_, lu=lu)
        from superlu_dist_tpu.models.dist_driver import gssvx_dist
        if lu is not None:
            x = lu.solve(b) if opts_.fact == Fact.FACTORED else None
            if x is None:
                lu._factor(A_, fact=opts_.fact)
                x = lu.solve(b)
            xr, berr = lu.refine(b, x)
            from superlu_dist_tpu.models.driver import SolveResult
            return SolveResult(x=xr, berr=np.atleast_1d(berr),
                               stat=lu.stat), lu
        return gssvx_dist(A_, b, grid, opts_)

    if fact == Fact.DOFACT:
        res, lu = solve(A, opts)
    elif fact == Fact.FACTORED:
        _, lu = solve(A, opts)
        res, lu = solve(A, opts.replace(fact=Fact.FACTORED), lu=lu)
    else:
        # stage: factor a same-pattern different-value matrix first
        _, lu = solve(_perturbed(A, 7), opts)
        res, lu = solve(A, opts.replace(fact=fact), lu=lu)

    x = res.x if res.x.ndim == 2 else res.x[:, None]
    rt = max(compute_resid(A, x[:, j], b[:, j]) for j in range(nrhs))
    assert rt < THRESH, (
        f"residual test {rt:.2f} >= {THRESH} for fact={fact} "
        f"equil={opts.equil} rowperm={opts.row_perm} nrhs={nrhs}")
    assert float(np.max(res.berr)) < 1e-10


@pytest.mark.parametrize("equil,rowperm",
                         list(itertools.product(EQUILS, ROWPERMS)))
def test_pdtest_cross_product_single(equil, rowperm):
    """Single-chip leg: {equil} x {rowperm} x {fact incl. staging} x
    {nrhs} — the full inner product of pdtest.c's loops."""
    for fact, nrhs in itertools.product(FACTS, NRHS):
        opts = Options(dtype="float32", block_size=16, equil=equil,
                       row_perm=rowperm)
        _run_config(A_BASE, opts, fact, nrhs)


@needs_8
@pytest.mark.parametrize("fact", FACTS)
def test_pdtest_cross_product_dist(fact):
    """Distributed leg (grid axis coarsened to one 2x4 mesh, the
    pdtest -r/-c analog): {fact} x {nrhs} at the default equil/rowperm."""
    from superlu_dist_tpu.parallel.grid import Grid2D
    if fact in (Fact.SAME_PATTERN, Fact.SAME_PATTERN_SAME_ROWPERM,
                Fact.FACTORED):
        opts = Options(dtype="float32", block_size=16)
        _run_config(A_BASE, opts, fact, 1, grid=Grid2D(2, 4))
    else:
        for nrhs in NRHS:
            opts = Options(dtype="float32", block_size=16)
            _run_config(A_BASE, opts, fact, nrhs, grid=Grid2D(2, 4))


def test_mutation_broken_reuse_is_caught():
    """Mutation check: corrupt the stored row scaling between a
    factorization and its SamePattern_SameRowPerm reuse — the sweep's
    residual test must reject the result (proves the harness would catch
    a broken reuse path, the pdtest acceptance contract)."""
    A = A_BASE
    n = A.shape[0]
    rng = np.random.default_rng(1)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    opts = Options(dtype="float32", block_size=16,
                   iter_refine=IterRefine.NOREFINE)
    _, lu = gssvx(A, b, opts)
    lu.row_scale = lu.row_scale.copy()
    lu.row_scale[: max(5, n // 50)] *= 7.0    # the deliberate break
    res, _ = gssvx(_perturbed(A, 3), b,
                   opts.replace(fact=Fact.SAME_PATTERN_SAME_ROWPERM),
                   lu=lu)
    rt = compute_resid(_perturbed(A, 3), np.atleast_2d(res.x.T).T[:, 0], b)
    assert rt > THRESH, f"mutation escaped the harness: resid test {rt}"


@needs_8
@pytest.mark.parametrize("kind", ["dist2d", "dist3d"])
def test_options_trans_dist_drivers(kind):
    """options.trans flows through the distributed one-call drivers:
    solve, refinement residuals, and berr all use A^T (the options->Trans
    contract, superlu_defs.h:684-728)."""
    from superlu_dist_tpu import Trans
    A = A_BASE
    n = A.shape[0]
    rng = np.random.default_rng(12)
    xt = rng.standard_normal(n)
    b = np.asarray(A.T @ xt)
    opts = Options(dtype="float32", block_size=16, trans=Trans.TRANS)
    if kind == "dist2d":
        from superlu_dist_tpu.models.dist_driver import gssvx_dist
        from superlu_dist_tpu.parallel.grid import Grid2D
        res, _ = gssvx_dist(A, b, Grid2D(2, 4), opts)
    else:
        from superlu_dist_tpu.models.driver3d import gssvx3d
        from superlu_dist_tpu.parallel.grid import Grid3D
        res, _ = gssvx3d(A, b, Grid3D(2, 2, 2), opts)
    assert np.abs(res.x - xt).max() / np.abs(xt).max() < 1e-8
    assert float(np.max(res.berr)) < 1e-10


def test_pdtest_complex_axis():
    """pztest leg: the fact-staging sweep on the complex fixture
    (reference: TEST/pztest.c — same loops, z precision)."""
    from superlu_dist_tpu.utils.testing import reference_matrix
    C = reference_matrix("cg20.cua")
    if C is None:
        pytest.skip("complex fixture not available")
    opts = Options(dtype="complex128", block_size=16)
    for fact in (Fact.DOFACT, Fact.SAME_PATTERN,
                 Fact.SAME_PATTERN_SAME_ROWPERM, Fact.FACTORED):
        _run_config(C, opts, fact, 1)
