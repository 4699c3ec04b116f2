"""Tiled column-resident kernel (tck) vs the XLA executor.

tck generalizes clk to columns taller than the VMEM panel: a sliding
W-block tile, ascending-source GEMM chunks, explicit finalize sweep
(FINU/DIAG/TRSM jobs). Must agree with the XLA tape executor on every
pattern, including columns spanning several tiles.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.ops.kernels import tck
from superlu_dist_tpu.utils.testing import (laplacian_2d, laplacian_3d,
                                            random_sparse)


def _compare(A, bs, w):
    A = A.tocsc().astype(np.float64)
    plan = block_symbolic(A, bs=bs)
    pool0 = bl.init_pool(plan, A.data.astype(np.float32), np.float32)
    fx = bl.build_factor_fn(plan, chunk=16)
    px, lx, ux, _ = fx(jnp.array(pool0), jnp.asarray(0.0, jnp.float32),
                       bl.make_factor_tapes(plan))
    ft, tt = tck.build_factor_fn_tck(plan, w=w, interpret=True)
    pt, lt, ut, _ = ft(jnp.array(pool0), jnp.asarray(0.0, jnp.float32), tt)
    ns = plan.nslots
    d = np.abs(np.asarray(px)[:ns] - np.asarray(pt)[:ns]).max()
    scale = max(1.0, float(np.abs(np.asarray(px)).max()))
    assert d <= 1e-4 * scale
    nbp = bl.bucket125(plan.nb)
    dl = np.abs(np.asarray(lx)[:nbp] - np.asarray(lt)[:nbp]).max()
    assert dl <= 1e-3 * max(1.0, float(np.abs(np.asarray(lx)).max()))
    return plan, tt


def test_tck_single_tile_matches():
    _compare(laplacian_2d(12), 8, 16)


@pytest.mark.parametrize("w", [4, 8])
def test_tck_multi_tile_matches(w):
    plan, tapes = _compare(laplacian_3d(8), 8, w)
    jt = np.concatenate([np.asarray(t["jt"]) for t in tapes])
    assert int((jt == tck.J_LOAD).sum()) > plan.nb, "tiling not exercised"


def test_tck_unsymmetric_pattern():
    _compare(random_sparse(180, density=0.05, seed=4), 8, 4)


def test_tck_driver_fallback(monkeypatch):
    """Columns above clk's panel cap route to flk (measured faster than
    tck at lap3d50: 406 vs 542 ms); executor="tck" still selects tck."""
    import os
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.ops.kernels import clk as _clk

    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setattr(_clk, "PANEL_CAP", 4)   # force tiny panel cap
    A = laplacian_2d(16)
    lu = SparseLU(A, Options(dtype="float32", block_size=8))
    assert "flk_windows" in lu.stat.counters
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             executor="tck"))
    assert "tck_jobs" in lu.stat.counters
    b = np.asarray(A @ np.ones(A.shape[0]))
    x = lu.solve(b)
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-4
