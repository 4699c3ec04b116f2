"""Block symbolic plan invariants."""

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.testing import laplacian_2d, random_sparse


@pytest.mark.parametrize("bs", [4, 8, 16])
def test_plan_invariants(bs):
    A = laplacian_2d(6)
    plan = block_symbolic(A, bs)
    nb = plan.nb
    assert plan.n_pad == nb * bs >= A.shape[0]
    # tape pointer monotonicity
    for ptr in (plan.l_ptr, plan.u_ptr, plan.g_ptr):
        assert np.all(np.diff(ptr) >= 0)
    assert plan.l_ptr[-1] == len(plan.l_slots)
    assert plan.g_ptr[-1] == len(plan.g_l)
    # every slot index in range
    for arr in (plan.l_slots, plan.u_slots, plan.g_l, plan.g_u, plan.g_t,
                plan.diag_slot):
        if len(arr):
            assert arr.min() >= 0 and arr.max() < plan.nslots
    # init indices in range and unique (one value per pool cell)
    assert plan.init_idx.max() < plan.nslots * bs * bs
    assert len(np.unique(plan.init_idx)) == len(plan.init_idx)


def test_gemm_targets_follow_sources():
    """Every Schur update at step k targets blocks in later steps."""
    A = random_sparse(80, density=0.05, seed=1)
    plan = block_symbolic(A, 8)
    # reconstruct step of each L/U slot
    slot_step = np.full(plan.nslots, -1)
    for k in range(plan.nb):
        slot_step[plan.diag_slot[k]] = k
        slot_step[plan.l_slots[plan.l_ptr[k]:plan.l_ptr[k + 1]]] = k
        slot_step[plan.u_slots[plan.u_ptr[k]:plan.u_ptr[k + 1]]] = k
    for k in range(plan.nb):
        lo, hi = plan.g_ptr[k], plan.g_ptr[k + 1]
        assert np.all(slot_step[plan.g_l[lo:hi]] == k)
        assert np.all(slot_step[plan.g_u[lo:hi]] == k)
        assert np.all(slot_step[plan.g_t[lo:hi]] > k)


def test_solve_levels_respect_dependencies():
    A = laplacian_2d(6)
    plan = block_symbolic(A, 8)
    # L-solve: a gemm at level l must have its source finalized earlier
    lvl_of = np.empty(plan.nb + 1, dtype=int)
    lvl_of[plan.nb] = -1
    for l in range(plan.lsol_nlvl):
        for t in range(plan.lsol_dptr[l], plan.lsol_dptr[l + 1]):
            lvl_of[plan.lsol_diag[t]] = l
    for l in range(plan.lsol_nlvl):
        for t in range(plan.lsol_gptr[l], plan.lsol_gptr[l + 1]):
            src = plan.lsol_gsrc[t]
            dst = plan.lsol_gdst[t]
            assert lvl_of[src] < l
            assert lvl_of[dst] == l


def test_native_symbolic_threaded_matches_serial():
    """The subtree-threaded fill simulation must be bit-identical to the
    serial pass (psymbfact analog; regression: a wrong etree construction
    once leaked fill across thread bins and lost 17% of the blocks)."""
    import os
    from superlu_dist_tpu.ops.host.native import (get_lib,
                                                  native_block_symbolic)
    if get_lib() is None:
        pytest.skip("native engine unavailable")

    def run(nthreads, nb, keys):
        old = os.environ.get("SLU_TPU_SYMB_THREADS")
        os.environ["SLU_TPU_SYMB_THREADS"] = str(nthreads)
        try:
            return native_block_symbolic(nb, keys // nb, keys % nb)
        finally:
            if old is None:
                del os.environ["SLU_TPU_SYMB_THREADS"]
            else:
                os.environ["SLU_TPU_SYMB_THREADS"] = old

    cases = [
        (laplacian_2d(48), 8),                       # n=2304, nb=288
        (random_sparse(2100, density=0.003, seed=3), 8),
    ]
    for A, bs in cases:
        A = sp.csc_matrix(A)
        n = A.shape[0]
        nb = -(-n // bs)
        coo = A.tocoo()
        bi = (coo.row // bs).astype(np.int64)
        bj = (coo.col // bs).astype(np.int64)
        keys = np.unique(bi * nb + bj)
        keys = np.unique(np.concatenate(
            [keys, np.arange(nb, dtype=np.int64) * nb + np.arange(nb)]))
        r1 = run(1, nb, keys)
        r8 = run(8, nb, keys)
        assert r1 is not None and r8 is not None
        for name in r1:
            assert np.array_equal(r1[name], r8[name]), name
