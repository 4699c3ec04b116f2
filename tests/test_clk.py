"""Column-resident kernel (clk): interpret-mode equivalence + driver path.

The clk executor must produce the SAME factors as the XLA executor
(identical GEMM grouping per target would be too strong — the pair
regroup changes summation order — so compare against an f64 ground
truth and require f32-roundoff-level agreement, per the round-1 verdict
on weak 10%-tolerance comparisons).
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.ops.kernels import clk
from superlu_dist_tpu.utils.testing import laplacian_2d, laplacian_3d


def _factor_f64_ground_truth(A, plan):
    """Reference factors via the f64 XLA executor."""
    pool0 = bl.init_pool(plan, A.data.astype(np.float64), np.float64)
    tapes = bl.make_factor_tapes(plan)
    fn = bl.build_factor_fn(plan, chunk=8)
    p, li, ui, _ = fn(jnp.array(pool0), jnp.asarray(0.0, jnp.float64),
                      tapes)
    return np.asarray(p), np.asarray(li), np.asarray(ui)


@pytest.mark.parametrize("mat,bs", [("lap2d12", 16), ("lap3d8", 32),
                                    ("lap2d20", 8)])
def test_clk_matches_f64_ground_truth(mat, bs):
    A = {"lap2d12": laplacian_2d(12), "lap3d8": laplacian_3d(8),
         "lap2d20": laplacian_2d(20)}[mat].tocsc().astype(np.float32)
    plan = block_symbolic(A, bs)
    assert clk.clk_supported(plan)
    p64, li64, ui64 = _factor_f64_ground_truth(A, plan)

    pool0 = bl.init_pool(plan, A.data, np.float32)
    fn, tapes = clk.build_factor_fn_clk(plan, interpret=True)
    p, li, ui, tiny = fn(jnp.array(pool0), jnp.asarray(0.0, jnp.float32),
                         tapes)
    n, nb = plan.nslots, plan.nb
    scale = np.abs(p64[:n]).max()
    # f32 roundoff against f64 truth (64 ulp at the pool scale)
    tol = 64 * np.finfo(np.float32).eps * max(scale, 1.0)
    assert np.abs(np.asarray(p[:n]) - p64[:n]).max() < tol
    assert np.abs(np.asarray(li[:nb]) - li64[:nb]).max() < \
        64 * np.finfo(np.float32).eps * max(np.abs(li64[:nb]).max(), 1.0)
    assert int(tiny) == 0


def test_clk_adversarial_patterns():
    """Random sparse patterns stress pair scheduling, sync flags, and the
    fill-closure dst mapping."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 160
        d = rng.uniform(0.02, 0.08)
        M = sp.random(n, n, density=d, random_state=rng.integers(1 << 30),
                      format="csc")
        A = (M + M.T + sp.eye(n) * (n * 0.5)).tocsc().astype(np.float32)
        plan = block_symbolic(A, 16)
        if not clk.clk_supported(plan):
            continue
        p64, _, _ = _factor_f64_ground_truth(A, plan)
        pool0 = bl.init_pool(plan, A.data, np.float32)
        fn, tapes = clk.build_factor_fn_clk(plan, interpret=True)
        p, _, _, _ = fn(jnp.array(pool0), jnp.asarray(0.0, jnp.float32),
                        tapes)
        nsl = plan.nslots
        scale = max(np.abs(p64[:nsl]).max(), 1.0)
        err = np.abs(np.asarray(p[:nsl]) - p64[:nsl]).max()
        assert err < 512 * np.finfo(np.float32).eps * scale, \
            f"trial {trial}: {err} vs scale {scale}"


def test_clk_driver_roundtrip():
    """End-to-end through SparseLU with the clk executor forced."""
    from superlu_dist_tpu import Options, SparseLU
    A = laplacian_3d(8).astype(np.float32)
    old = dict(os.environ)
    os.environ["SLU_TPU_FORCE_PALLAS"] = "interpret"
    os.environ["SLU_TPU_EXECUTOR"] = "clk"
    try:
        lu = SparseLU(A, Options(dtype="float32", block_size=32))
        rng = np.random.default_rng(0)
        xt = rng.standard_normal(A.shape[0])
        b = np.asarray(A @ xt)
        x = lu.solve(b)
        resid = np.abs(A @ x - b).max() / np.abs(b).max()
        assert resid < 1e-5
    finally:
        os.environ.clear()
        os.environ.update(old)


def test_clk_ilu_falls_back():
    """ILU plans that drop fill break the closure; the tape builder must
    refuse (the driver then keeps the flk executor)."""
    A = laplacian_3d(8).tocsc().astype(np.float32)
    plan0 = block_symbolic(A, 8)
    plan = block_symbolic(A, 8, ilu_level=0)
    assert plan.nslots < plan0.nslots, "fixture must actually drop fill"
    with pytest.raises(ValueError):
        clk.build_clk_tapes(plan)


def test_clk_segmented_scan_path(monkeypatch):
    """Multi-segment chain (lax.scan over uniform-padded tapes) produces
    the same factors as the single-call path."""
    from superlu_dist_tpu.ops.kernels import clk as clkmod
    A = laplacian_3d(8).tocsc().astype(np.float32)
    plan = block_symbolic(A, 16)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    th = jnp.asarray(0.0, jnp.float32)
    fn1, t1 = clk.build_factor_fn_clk(plan, interpret=True)
    assert len(t1) == 1
    p1 = np.asarray(fn1(jnp.array(pool0), th, t1)[0])
    monkeypatch.setattr(clkmod, "SEG_JOBS", 8)
    fn2, t2 = clk.build_factor_fn_clk(plan, interpret=True)
    assert len(t2) > 3
    p2 = np.asarray(fn2(jnp.array(pool0), th, t2)[0])
    n = plan.nslots
    assert np.abs(p1[:n] - p2[:n]).max() == 0.0


def test_clk_gemm_precision_knob(monkeypatch):
    """SLU_TPU_CLK_GEMM_PRECISION plumbs through (opt-in bf16-pass Schur
    GEMMs; on hardware: 808 vs 701 GF/s at lap3d32 with refinement still
    reaching 8e-15 — BENCH_NOTES_r4). Interpret mode just validates the
    plumbing end-to-end."""
    import numpy as np
    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.ops.kernels import clk as _clk
    from superlu_dist_tpu.utils.testing import laplacian_2d
    monkeypatch.setenv("SLU_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("SLU_TPU_CLK_GEMM_PRECISION", "default")
    _clk._clk_seg_call.cache_clear()   # env read at kernel build
    A = laplacian_2d(8)
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             executor="clk"))
    b = np.asarray(A @ np.ones(A.shape[0]))
    x, berr = lu.refine(b, lu.solve(b))
    assert float(np.max(berr)) < 1e-13
    _clk._clk_seg_call.cache_clear()
