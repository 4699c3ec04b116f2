"""Host-planning scale guards (VERDICT round-1 weak #6).

The round-1 suite never exercised the regime where bucketing, window
scheduling, tape segmentation, or forest peeling have interesting
structure (hundreds of levels, thousands of slots), so an O(n^2) blowup
in any host planner would ship unnoticed. These tests build real plans at
that scale — host side only, nothing jitted — under wall-clock budgets
that an accidental quadratic loop cannot meet.

Reference scale discipline: the reference's planners are C for exactly
this reason (mmd.c, get_perm_c.c, symbfact.c, pddistribute.c).
"""

import time

import numpy as np
import pytest
import scipy.sparse as sp

from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.testing import laplacian_3d


@pytest.fixture(scope="module")
def big_plan():
    """lap3d32 (n=32768) at bs=64: nb=512, ~13.7k slots, ~130 levels."""
    nx = 32
    A = sp.csr_matrix(laplacian_3d(nx))
    p = geometric_nd((nx, nx, nx))
    Ap = sp.csc_matrix(A[p][:, p])
    t0 = time.time()
    plan = block_symbolic(Ap, 64)
    dt = time.time() - t0
    assert dt < 30.0, f"symbolic at nb=512 took {dt:.1f}s"
    return plan


def test_symbolic_scale(big_plan):
    plan = big_plan
    assert plan.nb == 512
    assert plan.nslots > 10_000
    assert plan.n_flevels > 60


def test_factor_tape_scale(big_plan):
    from superlu_dist_tpu.ops.kernels import blocklu
    t0 = time.time()
    tapes = blocklu.make_factor_tapes(big_plan)
    lt = blocklu.make_solve_tapes(big_plan, "L")
    ut = blocklu.make_solve_tapes(big_plan, "U")
    dt = time.time() - t0
    assert dt < 30.0, f"tape build at 13.7k slots took {dt:.1f}s"
    del tapes, lt, ut


def test_clk_tape_scale():
    # bs=128 (the TPU bench shape: nb=256, ~4.3k slots) — bs=64 columns
    # exceed the VMEM panel capacity, so build the 128 plan here
    from superlu_dist_tpu.ops.kernels import clk
    nx = 32
    A = sp.csr_matrix(laplacian_3d(nx))
    p = geometric_nd((nx, nx, nx))
    plan = block_symbolic(sp.csc_matrix(A[p][:, p]), 128)
    assert clk.clk_supported(plan)
    t0 = time.time()
    tapes, consts = clk.build_clk_tapes(plan)
    dt = time.time() - t0
    nj = sum(len(t["j_fin"]) for t in tapes)
    assert nj > plan.nb
    assert dt < 60.0, f"clk tape build took {dt:.1f}s for {nj} jobs"


def test_window_schedule_scale(big_plan):
    from superlu_dist_tpu.ops.kernels import pallas_exec as pe
    plan = big_plan
    t0 = time.time()
    sched = pe.window_schedule(
        np.asarray(plan.g_l), np.asarray(plan.g_u), np.asarray(plan.g_t),
        np.asarray(plan.g_ptr), 8, plan.nslots, plan.nslots + 1)
    dt = time.time() - t0
    assert dt < 60.0, f"window scheduling took {dt:.1f}s"
    del sched


def test_partition_plan_scale(big_plan):
    from superlu_dist_tpu.parallel.dist2d import partition_plan
    t0 = time.time()
    dp = partition_plan(big_plan, 2, 4)
    dt = time.time() - t0
    assert dt < 60.0, f"2D partition at 13.7k slots took {dt:.1f}s"
    del dp
