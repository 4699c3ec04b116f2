"""Fused left-looking kernel (flk) equivalence tests.

Strategy per VERDICT round-1 item 8: compare each executor against an
f64 ground-truth factorization of the same plan (not executor-vs-
executor with a loose bound), and require the flk error to be of the
same order as the reference XLA executor's f32 error.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.ops.kernels import flk
from superlu_dist_tpu.utils import testing


def _f64_truth(plan, A):
    pool = bl.init_pool(plan, A.data, np.float64)
    fn = bl.build_factor_fn(plan, chunk=16)
    tapes = bl.make_factor_tapes(plan)
    p, l, u, _ = fn(pool, jnp.float64(0.0), tapes)
    return np.asarray(p), np.asarray(l), np.asarray(u)


def _err(pool, truth, ns):
    d = np.abs(np.asarray(pool)[:ns] - truth[:ns])
    s = np.abs(truth[:ns]).max(axis=(1, 2), keepdims=True) + 1e-30
    return float((d / s).max())


def _adversarial(n, nnz_per_row, seed):
    """Random sparse pattern with a dominant diagonal — many duplicate
    update targets per level to stress window/tape construction."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rng.integers(0, n, n * nnz_per_row)
    vals = rng.standard_normal(n * nnz_per_row) * 0.3
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    A = A + sp.eye(n) * (nnz_per_row + 2.0)
    return sp.csc_matrix(A)


# the heavier interpret-mode cases run minutes-scale in CI; keep one
# structured + one adversarial case fast and mark the rest slow
CASES = [
    # one small adversarial pattern stays in the fast set so
    # pattern-irregular flk scheduling is covered by default
    # (the structured-Laplacian flk path is covered by the clk/driver
    # suites; the lap3d12 interpret case costs ~26 s -> slow bucket)
    ("adv300", lambda: _adversarial(300, 4, 0)),
    pytest.param("lap3d12", lambda: testing.laplacian_3d(12).tocsc(),
                 marks=pytest.mark.slow),
    pytest.param("adv600", lambda: _adversarial(600, 4, 0),
                 marks=pytest.mark.slow),
    pytest.param("lap2d24", lambda: testing.laplacian_2d(24).tocsc(),
                 marks=pytest.mark.slow),
    pytest.param("adv900", lambda: _adversarial(900, 6, 1),
                 marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name,make", CASES,
                         ids=["lap3d12", "adv300", "adv600", "lap2d24",
                              "adv900"])
def test_flk_matches_f64_truth(name, make):
    A = make()
    plan = block_symbolic(A, 128)
    pt, lt, ut = _f64_truth(plan, A)

    pool32 = bl.init_pool(plan, A.data, np.float32)
    fx = bl.build_factor_fn(plan, chunk=16)
    tx = bl.make_factor_tapes(plan)
    px, lx, ux, _ = fx(jnp.array(pool32), jnp.float32(0.0), tx)

    ff, tf = flk.build_factor_fn_flk(plan, interpret=True)
    pf, lf, uf, _ = ff(jnp.array(pool32), jnp.float32(0.0), tf)

    ns = plan.nslots
    e_x = _err(px, pt, ns)
    e_f = _err(pf, pt, ns)
    # both executors are f32 of the same math: each should sit at f32
    # rounding scale, and flk must not be meaningfully worse than XLA
    assert e_f < 1e-4, f"flk error vs f64 truth too large: {e_f}"
    assert e_f < 8.0 * max(e_x, 1e-6), (e_f, e_x)

    nb = plan.nb
    for inv, truth in ((lf, lt), (uf, ut)):
        d = np.abs(np.asarray(inv)[:nb] - truth[:nb]).max()
        assert d < 1e-3, d


def test_flk_tiny_pivot_count():
    """ReplaceTinyPivot semantics: an exactly-zero pivot is replaced and
    counted, matching the XLA executor."""
    n = 256
    # diagonal matrix with one exactly-zero pivot (no fill to repair it);
    # the explicit zero keeps the diagonal entry in the sparsity pattern
    A = sp.csc_matrix((np.where(np.arange(n) == 5, 0.0, 1.0),
                       (np.arange(n), np.arange(n))), shape=(n, n))
    plan = block_symbolic(A, 128)
    pool = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.float32(1e-3)

    fx = bl.build_factor_fn(plan, chunk=16)
    tx = bl.make_factor_tapes(plan)
    _, _, _, tiny_x = fx(jnp.array(pool), thresh, tx)

    ff, tf = flk.build_factor_fn_flk(plan, interpret=True)
    _, _, _, tiny_f = ff(jnp.array(pool), thresh, tf)
    assert int(tiny_f) >= 1
    assert int(tiny_f) == int(tiny_x)


def test_flk_through_driver_solve():
    """End-to-end: flk factors feed the existing solve path."""
    A = testing.laplacian_3d(10).tocsc()
    n = A.shape[0]
    plan = block_symbolic(A, 128)
    pool = bl.init_pool(plan, A.data, np.float32)
    ff, tf = flk.build_factor_fn_flk(plan, interpret=True)
    pf, lf, uf, _ = ff(jnp.array(pool), jnp.float32(0.0), tf)

    lt = bl.make_solve_tapes(plan, "L")
    ut = bl.make_solve_tapes(plan, "U")
    sfn = bl.build_solve_fn(plan, 1, chunk=16)
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = A @ xt
    nbp = bl.bucket125(plan.nb)
    bp = np.zeros((nbp * plan.bs, 1), np.float32)
    bp[:n, 0] = b
    y = np.asarray(sfn(pf, lf, uf, lt, ut, jnp.asarray(bp)))[:n, 0]
    assert np.abs(y - xt).max() / np.abs(xt).max() < 1e-4


def test_flk_segmented_scan_path(monkeypatch):
    """Multi-segment chain (lax.scan over uniform-padded tapes) produces
    the same factors as the single-call path."""
    import jax.numpy as jnp
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic
    from superlu_dist_tpu.ops.kernels import blocklu as bl
    from superlu_dist_tpu.ops.kernels import flk as flkmod
    from superlu_dist_tpu.utils.testing import laplacian_3d
    A = laplacian_3d(8).tocsc().astype(np.float32)
    plan = block_symbolic(A, 16)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    th = jnp.asarray(0.0, jnp.float32)
    fn1, t1 = flkmod.build_factor_fn_flk(plan, interpret=True)
    assert len(t1) == 1
    p1 = np.asarray(fn1(jnp.array(pool0), th, t1)[0])
    monkeypatch.setattr(flkmod, "SEG_W", 8)
    fn2, t2 = flkmod.build_factor_fn_flk(plan, interpret=True)
    assert len(t2) > 3
    p2 = np.asarray(fn2(jnp.array(pool0), th, t2)[0])
    n = plan.nslots
    assert np.abs(p1[:n] - p2[:n]).max() == 0.0
