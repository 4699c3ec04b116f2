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


def test_pallas_factor_matches_xla(bushy):
    plan = block_symbolic(bushy, 128)
    assert plan.n_flevels < plan.nb, "need a bushy elimination tree"
    pool0 = B.init_pool(plan, bushy.tocsc().data, np.float32)
    thresh = jnp.float32(1e-6)

    fx = B.build_factor_fn(plan, chunk=16)
    tx = B.make_factor_tapes(plan)
    poolx, linvx, uinvx, _ = fx(jnp.array(pool0), thresh, tx)

    fp, tp = PE.build_factor_fn_pallas(plan, chunk=4, interpret=True)
    poolp, linvp, uinvp, _ = fp(jnp.array(pool0), thresh, tp)

    nre = plan.nslots
    px = np.asarray(poolx)[:nre]
    pp = np.asarray(poolp)[:nre]
    scale = float(np.abs(px).max())
    d = np.abs(px - pp).max(axis=(1, 2))
    # Schur accumulation order differs between executors; f32 rounding can
    # be amplified through root diagonal LUs. Require near-exactness for
    # almost all blocks and boundedness everywhere (end-to-end accuracy is
    # asserted by the roundtrip test below).
    assert np.quantile(d, 0.9) < 1e-4 * scale
    assert d.max() < 0.1 * scale


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
    """The double-buffered (distance-2) Schur kernel matches the serial
    kernel on a bushy tree with cross-window accumulation."""
    import jax.numpy as jnp
    plan = block_symbolic(bushy, 128)
    pool0 = B.init_pool(plan, bushy.tocsc().data, np.float32)
    thresh = jnp.float32(1e-6)
    f0, t0 = PE.build_factor_fn_pallas(plan, chunk=4, interpret=True,
                                       pipelined=False)
    p0 = np.asarray(f0(jnp.array(pool0), thresh, t0)[0])
    f1, t1 = PE.build_factor_fn_pallas(plan, chunk=4, interpret=True,
                                       pipelined=True)
    p1 = np.asarray(f1(jnp.array(pool0), thresh, t1)[0])
    nre = plan.nslots
    scale = max(1e-9, float(np.abs(p0[:nre]).max()))
    d = np.abs(p0[:nre] - p1[:nre]).max(axis=(1, 2))
    assert np.quantile(d, 0.9) < 1e-4 * scale
    assert d.max() < 0.1 * scale
