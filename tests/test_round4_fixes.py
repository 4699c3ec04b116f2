"""Regression tests for the round-3 advisor/judge findings.

1. profile_levels: clear error without factorization inputs; release-first
   memory discipline with the profiled factors reinstalled (the instance
   stays solve-ready).
2. Failed/released factorizations raise a clear error from solve() instead
   of an AttributeError deep in the executor.
3. align_blocks="auto" stands down on the single-chip fused-Pallas path
   but stays active for the distributed drivers.
4. The fused init+factor executor (SLU_TPU_FUSED_INIT analog) scatters in
   the 3D pool shape and matches the separated path bit-for-bit.
5. Complex solves are device-resident (one dispatch, planes in/out) and
   match the host-transform path.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.utils.testing import laplacian_2d, random_sparse

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def test_profile_levels_reinstalls_factors():
    A = laplacian_2d(10)
    n = A.shape[0]
    lu = SparseLU(A, Options(dtype="float64", block_size=16))
    rng = np.random.default_rng(0)
    b = np.asarray(A @ rng.standard_normal(n))
    x_before = lu.solve(b)
    rows = lu.profile_levels()
    assert len(rows) == lu.plan.n_flevels
    assert lu.pool is not None            # factors reinstalled
    x_after = lu.solve(b)
    assert np.abs(x_after - x_before).max() < 1e-12


def test_profile_levels_without_inputs_raises():
    from superlu_dist_tpu.models.driver import load_factors, save_factors
    A = laplacian_2d(6)
    lu = SparseLU(A, Options(dtype="float64", block_size=8))
    import io
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.npz")
        save_factors(lu, p)
        lu2 = load_factors(p)
        with pytest.raises(RuntimeError, match="input"):
            lu2.profile_levels()
        # the restored instance still solves
        b = np.asarray(A @ np.ones(A.shape[0]))
        x = lu2.solve(b)
        assert np.abs(A @ x - b).max() < 1e-10


def test_released_factors_raise_clearly():
    A = laplacian_2d(6)
    lu = SparseLU(A, Options(dtype="float64", block_size=8))
    lu.pool = None     # simulate a failed mid-refactor state
    b = np.ones(A.shape[0])
    with pytest.raises(RuntimeError, match="incomplete or released"):
        lu.solve(b)
    with pytest.raises(RuntimeError, match="incomplete or released"):
        lu.solve_transposed(b)


def test_align_standdown_single_chip_interpret(monkeypatch):
    """Force-interpret marks the fused Pallas path active: auto alignment
    must stand down (no expansion), while mode="on" still aligns."""
    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")
    A = laplacian_2d(9)      # n=81 > 2*bs so alignment would engage
    lu = SparseLU(A, Options(dtype="float32", block_size=16,
                             align_blocks="auto"))
    assert lu._expand is None, "auto alignment should stand down"
    lu_on = SparseLU(A, Options(dtype="float32", block_size=16,
                                align_blocks="on"))
    assert lu_on._expand is not None
    b = np.asarray(A @ np.ones(A.shape[0]))
    for l in (lu, lu_on):
        x = l.solve(b)
        assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-4


def test_align_active_on_xla_path():
    """The XLA hybrid (non-fused) single-chip path keeps auto alignment:
    the level-batched executor profits from the schedule."""
    A = laplacian_2d(16)
    lu = SparseLU(A, Options(dtype="float32", block_size=16,
                             executor="xla", align_blocks="auto"))
    assert lu._expand is not None


@needs_8
def test_align_active_for_distributed():
    from superlu_dist_tpu.models.dist_driver import DistributedSparseLU
    from superlu_dist_tpu.parallel.grid import Grid2D
    A = laplacian_2d(12)
    lu = DistributedSparseLU(A, Grid2D(2, 4),
                             Options(dtype="float32", block_size=16))
    assert lu._expand is not None
    b = np.asarray(A @ np.ones(A.shape[0]))
    x = lu.solve(b)
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-4


def test_fused_values_factor_matches_separated(monkeypatch):
    from superlu_dist_tpu.ops.kernels import blocklu
    import jax.numpy as jnp
    A = random_sparse(120, density=0.06, seed=4)
    lu = SparseLU(A, Options(dtype="float32", block_size=16,
                             executor="xla"))
    plan = lu.plan
    A3 = lu._A_orig.multiply(lu.row_scale[:, None]) \
        .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    A3 = lu._expand_A(sp.csc_matrix(A3))
    thresh = jnp.float32(lu._thresh())
    tapes = blocklu.make_factor_tapes(plan)
    pool = blocklu.init_pool(plan, A3.data, np.float32)
    p1, l1, u1, t1 = blocklu.build_factor_fn(plan)(pool, thresh, tapes)
    triple = blocklu.staged_values(plan, A3.data, np.float32)
    p2, l2, u2, t2 = blocklu.build_factor_values_fn(plan)(
        triple, thresh, tapes)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert int(t1) == int(t2)


@pytest.mark.parametrize("mode", ["planar", "embed"])
def test_complex_device_resident_solve(mode, monkeypatch):
    monkeypatch.setenv("SLU_TPU_COMPLEX", mode)
    if mode == "planar":
        # on CPU the native-complex executor is the default; force the
        # planar (re,im)-planes executor the TPU backend would use
        monkeypatch.setenv("SLU_TPU_FORCE_PLANAR", "1")
    rng = np.random.default_rng(5)
    A = random_sparse(100, density=0.08, seed=6).astype(np.complex64)
    A = sp.csc_matrix(A)
    A.data = A.data + 1j * rng.standard_normal(A.nnz).astype(np.float32)
    lu = SparseLU(A, Options(dtype="complex64", block_size=16))
    assert lu._device_solve_ok
    b = np.asarray(A @ (rng.standard_normal(100)
                        + 1j * rng.standard_normal(100)))
    x = lu.solve(b)
    assert ("DEVC", 1) in lu._solve_fns, "device-resident path not taken"
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-4
    B = np.asarray(A @ (rng.standard_normal((100, 3))
                        + 1j * rng.standard_normal((100, 3))))
    X = lu.solve(B)
    assert np.abs(A @ X - B).max() / np.abs(B).max() < 1e-4


def test_executor_chain_falls_back_to_xla(monkeypatch):
    """clk -> flk -> XLA hybrid: when no fused kernel can segment the
    plan into SMEM, the driver runs the level-batched XLA executor (the
    n=885k capacity behavior, forced here with tiny caps)."""
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.ops.kernels import clk as _clk, flk as _flk

    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setattr(_clk, "PANEL_CAP", 2)
    monkeypatch.setattr(_flk, "MAX_SEG_WINDOWS", 1)
    A = laplacian_2d(10)
    n = A.shape[0]
    lu = SparseLU(A, Options(dtype="float32", block_size=8))
    assert lu.stat.counters.get("fused_fallback_xla") == 1
    b = np.asarray(A @ np.ones(n))
    x = lu.solve(b)
    assert np.abs(x - 1).max() < 1e-4


def test_align_stays_on_above_threshold(monkeypatch):
    """Above SLU_TPU_ALIGN_STANDDOWN_MAX the stand-down is inert — the
    capacity executors need the aligned schedule (n=885k: 47 GiB of
    per-level buffers without it)."""
    from superlu_dist_tpu import Options, SparseLU
    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("SLU_TPU_ALIGN_STANDDOWN_MAX", "50")
    A = laplacian_2d(10)          # n=100 > 50 -> alignment stays on
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             align_blocks="auto"))
    assert lu._expand is not None, "alignment must stay on above the cap"
