"""Adaptive Schur-GEMM precision (Options.gemm_precision) — the
psgssvx_d2 escalation analog (reference: SRC/single/psgssvx_d2.c:516-1584,
psgsrfs_d2.c): factor with 3-pass bf16 GEMMs by default, automatically
re-factor at "highest" when refinement stalls."""

import numpy as np
import pytest

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.utils.testing import laplacian_2d


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")


def _solve_refine(lu, A):
    n = A.shape[0]
    b = np.asarray(A @ np.ones(n))
    x = lu.solve(b)
    return lu.refine(b, x)


def test_auto_runs_low_pass_first(interp):
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=8))
    assert lu.stat.counters.get("gemm_precision") == "default"
    _, berr = _solve_refine(lu, A)
    assert float(berr.max()) < 1e-13
    # interpret-mode dots are exact f32: no stall, no escalation
    assert "precision_escalated" not in lu.stat.counters


def test_highest_opts_out_of_low_pass(interp):
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             gemm_precision="highest"))
    assert lu.stat.counters.get("gemm_precision") == "highest"
    assert lu._gemm_prec_used == "highest"


def test_escalation_refactors_at_highest(interp, monkeypatch):
    """Simulated stall: the first refinement reports a stalled berr; the
    driver must re-factor at "highest" and recover to ≤ 1e-13
    automatically (VERDICT r5 item 7 contract)."""
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=8))
    assert lu._gemm_prec_used == "default"
    real_impl = lu._refine_impl
    calls = {"n": 0}

    def stalled_once(b, x0, trans=None, **kw):
        calls["n"] += 1
        x, berr = real_impl(b, x0, *(() if trans is None else (trans,)))
        if calls["n"] == 1:
            return x, np.full_like(np.atleast_1d(berr), 1e-8)
        return x, berr

    monkeypatch.setattr(lu, "_refine_impl", stalled_once)
    _, berr = _solve_refine(lu, A)
    assert calls["n"] == 2
    assert lu.stat.counters.get("precision_escalated") == 1
    assert lu._gemm_prec_used == "highest"
    assert float(np.max(berr)) < 1e-13
    # once escalated, further stalls do not re-trigger
    assert not lu._should_escalate(np.array([1e-8]))
    # ...and the escalation is STICKY: a SamePattern refactor starts at
    # "highest" directly (no bf16 retry/re-stall on every refactor)
    from superlu_dist_tpu.utils.options import Fact
    A2 = A.copy()
    A2.data = A2.data * 1.25
    lu.refactor(A2, fact=Fact.SAME_PATTERN_SAME_ROWPERM)
    assert lu._gemm_prec_used == "highest"


def test_escalation_disabled_outside_auto(interp, monkeypatch):
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             gemm_precision="bf16"))
    assert lu._gemm_prec_used == "default"
    assert not lu._should_escalate(np.array([1e-8]))


def test_norefine_caller_gets_highest(interp):
    """NOREFINE disarms the bf16-first attempt: the raw solve IS the
    final answer there, so it must come from a full-pass factor."""
    from superlu_dist_tpu.utils.options import IterRefine
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             iter_refine=IterRefine.NOREFINE))
    assert lu._gemm_prec_used == "highest"


def test_xla_path_reports_highest():
    """The non-fused executors ignore pass precision — the counter must
    say so (no phantom low-pass factor)."""
    A = laplacian_2d(12)
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             executor="xla"))
    assert lu._gemm_prec_used == "highest"
    assert not lu._should_escalate(np.array([1e-8]))

