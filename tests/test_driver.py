"""pdtest-style configuration sweep on the expert driver.

Mirrors the reference regression harness (reference: TEST/pdtest.c:107-563):
for each input matrix, loop over the cross-product of configuration axes —
equilibration on/off, row-perm strategies, factorization reuse modes,
nrhs — solve, and accept iff the residual test value is below THRESH=20
(TEST/pdtest.c:44) and the refinement backward error reaches eps.
"""

import os

import numpy as np
import pytest

from superlu_dist_tpu import Fact, Options, gssvx
from superlu_dist_tpu.utils.options import ColPerm, Equil, IterRefine, RowPerm
from superlu_dist_tpu.utils.testing import (THRESH, compute_resid,
                                            laplacian_2d, random_sparse,
                                            reference_matrix,
                                            unsymmetric_pattern)


def _matrices():
    out = {"lap49": laplacian_2d(7),
           "unsym": unsymmetric_pattern(90, seed=2)}
    g20 = reference_matrix("g20.rua")
    if g20 is not None:
        out["g20"] = g20
    return out


MATRICES = _matrices()


def _check(A, opts, nrhs=1, lu=None, seed=0):
    n = A.shape[0]
    rng = np.random.default_rng(seed)
    xt = rng.standard_normal((n, nrhs))
    b = np.asarray(A @ xt)
    res, lu = gssvx(A, b, opts, lu=lu)
    x = res.x if res.x.ndim == 2 else res.x[:, None]
    rt = max(compute_resid(A, x[:, j], b[:, j]) for j in range(nrhs))
    assert rt < THRESH, f"residual test {rt} >= {THRESH} for {opts}"
    assert res.berr.max() < 1e-10
    return res, lu


@pytest.mark.parametrize("name", sorted(MATRICES))
@pytest.mark.parametrize("equil", [Equil.YES, Equil.NO])
def test_equil_axis(name, equil):
    A = MATRICES[name]
    _check(A, Options(dtype="float32", block_size=16, equil=equil))


@pytest.mark.parametrize("rowperm", [RowPerm.NOROWPERM,
                                     RowPerm.LARGE_DIAG_MC64])
def test_rowperm_axis(rowperm):
    A = MATRICES["lap49"]  # diagonally dominant: NOROWPERM is safe
    _check(A, Options(dtype="float32", block_size=16, row_perm=rowperm))


@pytest.mark.parametrize("colperm", [ColPerm.NATURAL, ColPerm.MMD_AT_PLUS_A,
                                     ColPerm.COLAMD, ColPerm.METIS_AT_PLUS_A])
def test_colperm_axis(colperm):
    A = MATRICES["lap49"]
    _check(A, Options(dtype="float32", block_size=16, col_perm=colperm))


def test_fact_reuse_modes():
    """DOFACT → SamePattern → SamePattern_SameRowPerm → FACTORED staging
    (the pddrive1/2/3 example patterns)."""
    A = MATRICES["unsym"]
    opts = Options(dtype="float32", block_size=16)
    _, lu = _check(A, opts)

    rng = np.random.default_rng(9)
    A2 = A.copy()
    A2.data = A.data * (1.0 + 0.05 * rng.standard_normal(A.nnz))
    _, lu = _check(A2, opts.replace(fact=Fact.SAME_PATTERN), lu=lu, seed=1)

    A3 = A2.copy()
    A3.data = A2.data * (1.0 + 0.05 * rng.standard_normal(A2.nnz))
    _, lu = _check(A3, opts.replace(fact=Fact.SAME_PATTERN_SAME_ROWPERM),
                   lu=lu, seed=2)

    _, lu = _check(A3, opts.replace(fact=Fact.FACTORED), lu=lu, seed=3)


def test_norefine_path():
    A = MATRICES["lap49"]
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = A @ xt
    res, _ = gssvx(A, b, Options(dtype="float64", block_size=16,
                                 iter_refine=IterRefine.NOREFINE))
    assert compute_resid(A, res.x, b) < THRESH


def test_nrhs_sweep():
    A = MATRICES["lap49"]
    for nrhs in (1, 3):
        _check(A, Options(dtype="float32", block_size=16), nrhs=nrhs)


def test_stats_populated():
    A = MATRICES["lap49"]
    n = A.shape[0]
    b = np.asarray(A @ np.ones(n))
    res, _ = gssvx(A, b, Options(dtype="float32", block_size=16))
    rep = res.stat.report()
    assert "FACT" in rep and "SOLVE" in rep
    assert res.stat.ops["FACT"] > 0


def test_save_load_factors(tmp_path):
    """Checkpoint/resume of a factorization (SolveOnly analog)."""
    from superlu_dist_tpu.models.driver import load_factors, save_factors
    from superlu_dist_tpu import SparseLU
    A = MATRICES["lap49"]
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = A @ xt
    lu = SparseLU(A, Options(dtype="float32", block_size=16))
    p = tmp_path / "factors.npz"
    save_factors(lu, p)
    lu2 = load_factors(p)
    x, berr = lu2.refine(b, lu2.solve(b))
    assert berr.max() < 1e-13
    assert np.abs(x - xt).max() < 1e-8
    # transpose solve also works from the restored state
    from superlu_dist_tpu import Trans
    xt2 = lu2.solve(np.asarray(A.T @ xt), trans=Trans.TRANS)
    assert np.abs(xt2 - xt).max() < 1e-4


def test_refine_dtype_option():
    """Mixed-precision axis: float32 residuals converge to f32-quality,
    float64 residuals (default) to f64-quality."""
    A = MATRICES["lap49"]
    n = A.shape[0]
    rng = np.random.default_rng(1)
    xt = rng.standard_normal(n)
    b = A @ xt
    from superlu_dist_tpu import SparseLU
    lu32 = SparseLU(A, Options(dtype="float32", block_size=16,
                               refine_dtype="float32"))
    x32, berr32 = lu32.refine(b, lu32.solve(b))
    assert berr32.max() < 1e-5
    lu64 = SparseLU(A, Options(dtype="float32", block_size=16))
    x64, berr64 = lu64.refine(b, lu64.solve(b))
    assert berr64.max() < 1e-13


def test_schedule_counters_recorded():
    """SCT-analog static schedule histograms land in Stats.counters."""
    import numpy as np
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.utils.testing import laplacian_2d
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=16))
    c = lu.stat.counters
    assert c["sched_levels"] >= 1
    assert c["sched_gemms_total"] >= 0
    assert c["sched_steps_per_level_max"] >= 1


def test_fused_init_factor_driver_path(monkeypatch):
    """SLU_TPU_FUSED_INIT=1 routes the XLA executor through the fused
    scatter-init + factor program (the million-row capacity path — the
    pool never crosses a jit boundary inbound). Same answers, including
    through refactor staging."""
    monkeypatch.setenv("SLU_TPU_FUSED_INIT", "1")
    from superlu_dist_tpu.models.driver import SparseLU

    A = laplacian_2d(12).tocsc()
    n = A.shape[0]
    rng = np.random.default_rng(3)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    lu = SparseLU(A, Options(dtype="float32", block_size=16,
                             executor="xla"))
    assert lu._factor_takes_values
    x = lu.solve(b)
    x2, berr = lu.refine(b, x)
    assert compute_resid(A, x2, b) < THRESH
    assert float(np.max(berr)) < 1e-13
    # SamePattern_SameRowPerm refactor reruns the fused program
    A2 = (A * 1.5).tocsc()
    lu.refactor(A2, fact=Fact.SAME_PATTERN_SAME_ROWPERM)
    y = lu.solve(b)
    y2, berr2 = lu.refine(b, y)
    assert compute_resid(A2, y2, b) < THRESH
