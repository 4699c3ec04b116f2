"""Pallas executor path (interpret mode on CPU).

Exercises the B=128 tape-driven DMA kernels: bit-compatibility with the
XLA executor, cross-window read-modify-write accumulation (multiple steps
per elimination level), and the full driver round trip.
"""

import os

import numpy as np
import pytest

from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as B
from superlu_dist_tpu.ops.kernels import pallas_exec as PE
from superlu_dist_tpu.utils.testing import (THRESH, compute_resid,
                                            laplacian_2d, random_sparse)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def bushy():
    """Arrowhead of disjoint Laplacians + coupling border: the 128-blocking
    gets many independent steps per elimination level, so Schur updates
    accumulate into shared ancestor targets across DMA windows."""
    import scipy.sparse as sp
    K = 6
    blocks = [laplacian_2d(16) for _ in range(K)]   # 256 = 2 blocks each
    D = sp.block_diag(blocks, format="lil")
    n_inner = D.shape[0]
    m = 128                                          # border width = 1 block
    rng = np.random.default_rng(1)
    B_ = sp.lil_matrix((n_inner, m))
    C_ = sp.lil_matrix((m, n_inner))
    for j in range(m):
        for _ in range(3):
            i = rng.integers(0, n_inner)
            B_[i, j] = rng.standard_normal()
            C_[j, i] = rng.standard_normal()
    E = sp.lil_matrix(np.eye(m) * 50.0)
    A = sp.bmat([[D, B_], [C_, E]], format="csc")
    return sp.csc_matrix(A)


def _f64_truth(A, plan):
    """Ground-truth factors via the f64 XLA executor."""
    pool0 = B.init_pool(plan, A.tocsc().data.astype(np.float64), np.float64)
    fx = B.build_factor_fn(plan, chunk=16)
    tx = B.make_factor_tapes(plan)
    p, _, _, _ = fx(jnp.array(pool0), jnp.float64(1e-6), tx)
    return np.asarray(p)


def _f32_ref_err(A, plan, truth):
    """Per-block error of the f32 XLA executor against the f64 truth —
    the intrinsic f32 amplification of this pattern (what ANY correct
    f32 executor incurs)."""
    pool0 = B.init_pool(plan, A.tocsc().data, np.float32)
    fx = B.build_factor_fn(plan, chunk=16)
    tx = B.make_factor_tapes(plan)
    p, _, _, _ = fx(jnp.array(pool0), jnp.float32(1e-6), tx)
    nre = plan.nslots
    return np.abs(np.asarray(p)[:nre] - truth[:nre]).max(axis=(1, 2))


def _assert_f32_close_to_truth(pf32, truth, nre, what, ref_err,
                               ulps=64):
    """Per-block comparison against the f64 ground truth in f32-ulp terms
    at the pool scale (round-1 verdict: a 10% bounded check can mask a
    windowing hazard; this cannot). Blocks where f32 arithmetic itself
    amplifies (measured by the XLA f32 executor's own error vs truth)
    get the same allowance — a scheduling bug would NOT track it."""
    scale = max(1.0, float(np.abs(truth[:nre]).max()))
    tol = ulps * np.finfo(np.float32).eps * scale
    d = np.abs(np.asarray(pf32)[:nre] - truth[:nre]).max(axis=(1, 2))
    allow = tol + 8.0 * ref_err
    bad = d > allow
    assert not bad.any(), (
        f"{what}: {bad.sum()} blocks exceed tol; worst "
        f"{d[bad].max()} vs allowance {allow[bad].max()}")


def test_pallas_factor_matches_f64_truth(bushy):
    plan = block_symbolic(bushy, 128)
    assert plan.n_flevels < plan.nb, "need a bushy elimination tree"
    truth = _f64_truth(bushy, plan)
    ref_err = _f32_ref_err(bushy, plan, truth)
    pool0 = B.init_pool(plan, bushy.tocsc().data, np.float32)
    thresh = jnp.float32(1e-6)

    fp, tp = PE.build_factor_fn_pallas(plan, chunk=4, interpret=True)
    poolp, linvp, uinvp, _ = fp(jnp.array(pool0), thresh, tp)
    _assert_f32_close_to_truth(poolp, truth, plan.nslots, "pallas_exec",
                               ref_err)


@pytest.mark.slow   # ~21 s interpret; clk/flk driver roundtrips cover
def test_pallas_driver_roundtrip(bushy, monkeypatch):
    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")
    from superlu_dist_tpu import Options, SparseLU
    n = bushy.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = bushy @ xt
    lu = SparseLU(bushy, Options(dtype="float32", block_size=128))
    x = lu.solve(b)
    assert compute_resid(bushy, x, b, np.float32) < THRESH
    x2, berr = lu.refine(b, x)
    assert berr.max() < 1e-13


def test_pipelined_schur_matches(bushy):
    """The double-buffered (distance-2) Schur kernel matches the f64
    ground truth to f32 roundoff (not merely the serial kernel to 10%)."""
    import jax.numpy as jnp
    plan = block_symbolic(bushy, 128)
    truth = _f64_truth(bushy, plan)
    ref_err = _f32_ref_err(bushy, plan, truth)
    pool0 = B.init_pool(plan, bushy.tocsc().data, np.float32)
    thresh = jnp.float32(1e-6)
    f1, t1 = PE.build_factor_fn_pallas(plan, chunk=4, interpret=True,
                                       pipelined=True)
    p1 = f1(jnp.array(pool0), thresh, t1)[0]
    _assert_f32_close_to_truth(p1, truth, plan.nslots, "pipelined",
                               ref_err)


def _adversarial(seed, n=1280):
    """Random pattern with many duplicate Schur targets per level —
    stresses window packing / RMW hazard scheduling (the Pallas hybrid
    executor is 128-block only)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    M = sp.random(n, n, density=0.01, random_state=rng.integers(1 << 30),
                  format="csc")
    return sp.csc_matrix(M + M.T + sp.eye(n) * (3.0 * n))


@pytest.mark.parametrize("seed", [pytest.param(11, marks=pytest.mark.slow),
                                  pytest.param(12, marks=pytest.mark.slow),
                                  pytest.param(13, marks=pytest.mark.slow)])
def test_pallas_adversarial_patterns(seed):
    """Randomized duplicate-target stress for the window scheduler, each
    kernel variant against the f64 truth."""
    A = _adversarial(seed)
    plan = block_symbolic(A, 128)
    truth = _f64_truth(A, plan)
    ref_err = _f32_ref_err(A, plan, truth)
    pool0 = B.init_pool(plan, A.tocsc().data, np.float32)
    thresh = jnp.float32(1e-6)
    fp, tp = PE.build_factor_fn_pallas(plan, chunk=4, interpret=True)
    pf = fp(jnp.array(pool0), thresh, tp)[0]
    _assert_f32_close_to_truth(pf, truth, plan.nslots, "adversarial",
                               ref_err)


def test_fused_solve_segment_scan(monkeypatch):
    """Window streams beyond one segment must scan correctly: shrink the
    segment size so even a small plan needs several segments and compare
    against the XLA level-loop solve."""
    import numpy as np
    import jax.numpy as jnp
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic
    from superlu_dist_tpu.ops.kernels import blocklu as bl
    from superlu_dist_tpu.ops.kernels import pallas_exec as pe
    from superlu_dist_tpu.utils.testing import laplacian_2d

    monkeypatch.setattr(pe, "SOLVE_SEG_WINDOWS", 4)
    A = laplacian_2d(12).tocsc().astype(np.float64)
    plan = block_symbolic(A, bs=8)
    pool0 = bl.init_pool(plan, A.data.astype(np.float32), np.float32)
    fx = bl.build_factor_fn(plan, chunk=16)
    pool, linv, uinv, _ = fx(jnp.array(pool0), jnp.asarray(0.0, jnp.float32),
                             bl.make_factor_tapes(plan))
    n = A.shape[0]
    rng = np.random.default_rng(0)
    nbp = bl.bucket125(plan.nb)
    b = np.zeros((nbp * plan.bs, 1), np.float32)
    b[: plan.nb * plan.bs] = rng.standard_normal(
        (plan.nb * plan.bs, 1)).astype(np.float32)
    # XLA reference sweep
    lt = bl.make_solve_tapes(plan, "L")
    ut = bl.make_solve_tapes(plan, "U")
    x_ref = bl.build_solve_fn(plan, 1)(pool, linv, uinv, lt, ut,
                                       jnp.asarray(b))
    # segmented fused kernel (interpret)
    fn, (tl, tu), W = pe.build_solve_fn_pallas_fused(plan, 1, chunk=4,
                                                     interpret=True)
    assert len(tl) == 4 and tl[0].ndim == 2, "segmentation not exercised"
    bp = np.zeros((nbp * plan.bs, W), np.float32)
    bp[:, :1] = b
    x_seg = fn(pool, linv, uinv, tl, tu, jnp.asarray(bp))
    nr = plan.nb * plan.bs
    d = np.abs(np.asarray(x_seg)[:nr, 0] - np.asarray(x_ref)[:nr, 0])
    assert d.max() < 1e-4 * max(1.0, np.abs(np.asarray(x_ref)).max())
