"""Numeric factorization + solve correctness vs scipy and dense LU."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.utils.options import ColPerm, Equil, IterRefine, RowPerm
from superlu_dist_tpu.utils.testing import (compute_resid, laplacian_2d,
                                            random_sparse, THRESH,
                                            unsymmetric_pattern)


@pytest.fixture(scope="module")
def lap():
    return laplacian_2d(8)


@pytest.mark.parametrize("bs", [8, 16, 32])
def test_factor_matches_scipy(lap, bs):
    """LU solve (no refinement) reproduces the true solution to f32 accuracy."""
    n = lap.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = lap @ xt
    lu = SparseLU(lap, Options(dtype="float32", block_size=bs,
                               col_perm=ColPerm.MMD_AT_PLUS_A))
    x = lu.solve(b)
    ref = spla.spsolve(lap.tocsc(), b)
    assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-4
    assert compute_resid(lap, x, b, work_dtype=np.float32) < THRESH


def test_factor_exact_f64(lap):
    n = lap.shape[0]
    rng = np.random.default_rng(1)
    xt = rng.standard_normal(n)
    b = lap @ xt
    lu = SparseLU(lap, Options(dtype="float64", block_size=16))
    x = lu.solve(b)
    assert np.abs(x - xt).max() < 1e-10


def test_complex(lap):
    A = lap.astype(np.complex128) + 1j * sp.diags(np.ones(lap.shape[0]))
    A = sp.csc_matrix(A)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    xt = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = A @ xt
    lu = SparseLU(A, Options(dtype="complex64", block_size=16))
    x, berr = lu.refine(b, lu.solve(b))
    assert berr.max() < 1e-14


def test_tiny_pivot_replacement():
    """A matrix with an exactly-zero surviving pivot still factors (GESP:
    ReplaceTinyPivot substitutes sqrt(eps)·‖A‖ and refinement recovers)."""
    n = 8
    M = np.eye(n)
    M[0, 0] = 0.0   # first pivot exactly zero, nothing eliminates before it
    M[0, 1] = 1.0
    M[1, 0] = 1.0
    M[1, 1] = 1.0
    A = sp.csc_matrix(M)
    lu = SparseLU(A, Options(dtype="float64", block_size=8,
                             row_perm=RowPerm.NOROWPERM,
                             col_perm=ColPerm.NATURAL,
                             equil=Equil.NO))
    assert lu.stat.tiny_pivots >= 1
    rng = np.random.default_rng(3)
    xt = rng.standard_normal(n)
    b = M @ xt
    x, berr = lu.refine(b, lu.solve(b))
    assert compute_resid(A, x, b) < THRESH
    assert np.abs(x - xt).max() < 1e-10


def test_multirhs(lap):
    n = lap.shape[0]
    rng = np.random.default_rng(4)
    xt = rng.standard_normal((n, 7))
    b = lap @ xt
    lu = SparseLU(lap, Options(dtype="float32", block_size=16))
    x, berr = lu.refine(b, lu.solve(b))
    assert x.shape == (n, 7)
    assert berr.shape == (7,)
    assert berr.max() < 1e-13


def test_logdet(lap):
    lu = SparseLU(lap, Options(dtype="float64", block_size=16))
    sign, logabs = lu.logdet()
    s_ref, l_ref = np.linalg.slogdet(lap.toarray())
    assert np.isclose(logabs, l_ref, rtol=1e-8)
    assert np.isclose(sign, s_ref)


def test_diag_u_nonzero(lap):
    lu = SparseLU(lap, Options(dtype="float32", block_size=16))
    du = lu.diag_u()
    assert len(du) == lap.shape[0]
    assert np.all(np.abs(du) > 0)


def test_debug_utils(lap, tmp_path):
    """dutil-style debug helpers: L·U reconstruction, diag check, dump."""
    from superlu_dist_tpu.utils.debug import (check_factorization,
                                              check_zero_diagonal,
                                              compare_lu, dump_lu)
    lu = SparseLU(lap, Options(dtype="float64", block_size=16))
    assert check_factorization(lu) < 1e-10
    assert len(check_zero_diagonal(lu)) == 0
    p1 = tmp_path / "a.npz"
    p2 = tmp_path / "b.npz"
    dump_lu(lu, p1)
    dump_lu(lu, p2)
    assert compare_lu(p1, p2)


def test_singularity_info():
    """With ReplaceTinyPivot off, an exactly singular matrix reports
    info > 0 (the pdgstrf info contract)."""
    n = 8
    M = np.eye(n)
    M[3, 3] = 0.0
    M[3, :3] = 0.0    # row 3 exactly dependent -> zero pivot survives
    A = sp.csc_matrix(M)
    lu = SparseLU(A, Options(dtype="float64", block_size=8,
                             row_perm=RowPerm.NOROWPERM,
                             col_perm=ColPerm.NATURAL, equil=Equil.NO,
                             replace_tiny_pivot=False))
    assert lu.info > 0
    # with GESP replacement on, info stays 0 and a pivot is substituted
    lu2 = SparseLU(A, Options(dtype="float64", block_size=8,
                              row_perm=RowPerm.NOROWPERM,
                              col_perm=ColPerm.NATURAL, equil=Equil.NO))
    assert getattr(lu2, "info", 0) == 0
    assert lu2.stat.tiny_pivots >= 1


def test_masked_block_lu_inv_matches():
    """Scatter-free (Pallas-lowerable) block_lu_inv == standard one."""
    import jax
    import jax.numpy as jnp
    from superlu_dist_tpu.ops.kernels.blocklu import block_lu_inv
    rng = np.random.default_rng(0)
    for m in (8, 16, 64):
        A64 = rng.standard_normal((m, m)) + 10 * np.eye(m)
        # logic check in f64 (fma-fusion noise is ~1e-16 there): the two
        # variants compute the same recurrence
        with jax.enable_x64(True):
            lu0, li0, ui0, t0 = jax.jit(
                lambda a: block_lu_inv(a, jnp.float64(1e-8)))(
                    jnp.asarray(A64, jnp.float64))
            lu1, li1, ui1, t1 = jax.jit(
                lambda a: block_lu_inv(a, jnp.float64(1e-8), masked=True))(
                    jnp.asarray(A64, jnp.float64))
            assert np.abs(np.asarray(lu0) - np.asarray(lu1)).max() < 1e-6
            assert np.abs(np.asarray(li0) - np.asarray(li1)).max() < 1e-6
            assert np.abs(np.asarray(ui0) - np.asarray(ui1)).max() < 1e-6
            assert int(t0) == int(t1)
        # f32: inverse quality of the masked variant
        luf, lif, uif, _ = jax.jit(
            lambda a: block_lu_inv(a, jnp.float32(1e-8), masked=True))(
                jnp.asarray(A64, jnp.float32))
        Lm = np.tril(np.asarray(luf), -1) + np.eye(m)
        Um = np.triu(np.asarray(luf))
        assert np.abs(np.asarray(lif) @ Lm - np.eye(m)).max() < 1e-3
        assert np.abs(np.asarray(uif) @ Um - np.eye(m)).max() < 1e-3


def test_init_pool_device_path_matches_host(monkeypatch):
    """The on-device scatter (large pools) must build the exact pool the
    host numpy path builds (reference distribute analog:
    SRC/double/pddistribute.c:66-433 — owner-computed storage)."""
    from superlu_dist_tpu.ops.kernels import blocklu as _bl
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic

    A = laplacian_2d(12).tocsc()
    plan = block_symbolic(A, bs=8)
    host = np.asarray(_bl.init_pool(plan, A.data, np.float32))
    monkeypatch.setattr(_bl, "_INIT_DEVICE_MIN_BYTES", 0)
    dev = np.asarray(_bl.init_pool(plan, A.data, np.float32))
    assert host.shape == dev.shape
    np.testing.assert_array_equal(host, dev)


def test_debug_inspection_helpers(lap, tmp_path):
    """print_block / lu_summary / dump_pattern (dutil_dist dPrint_* role)."""
    import io
    from superlu_dist_tpu.utils import debug as dbg
    lu = SparseLU(lap, Options(dtype="float64", block_size=16))
    buf = io.StringIO()
    dbg.print_block(lu, 0, 0, file=buf)
    assert "slot" in buf.getvalue()
    buf = io.StringIO()
    dbg.print_block(lu, 0, lu.plan.nb - 1, file=buf)  # may be zero
    s = dbg.lu_summary(lu)
    assert "block size 16" in s and "elimination levels" in s
    p = tmp_path / "pat.pbm"
    dbg.dump_pattern(lu, p)
    head = p.read_text().splitlines()
    assert head[0] == "P1"


def test_factor_values_fused_matches_pool_path():
    """The fused scatter-init + factor executor (build_factor_values_fn,
    the million-row capacity path: the pool never enters through a jit
    boundary) must produce bit-identical factors to the init_pool +
    build_factor_fn pipeline."""
    import jax.numpy as jnp
    from superlu_dist_tpu.ops.kernels import blocklu as _bl
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic

    A = laplacian_2d(12).tocsc()
    plan = block_symbolic(A, bs=8)
    tapes = _bl.make_factor_tapes(plan)
    thresh = jnp.float32(1e-8)

    pool = _bl.init_pool(plan, A.data, np.float32)
    ref, lref, uref, tref = _bl.build_factor_fn(plan, chunk=16)(
        pool, thresh, tapes)

    triple = _bl.staged_values(plan, A.data, np.float32)
    fn = _bl.build_factor_values_fn(plan, chunk=16)
    out, lout, uout, tout = fn(triple, thresh, tapes)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(lref), np.asarray(lout))
    np.testing.assert_array_equal(np.asarray(uref), np.asarray(uout))
    assert int(tref) == int(tout)


def test_profile_factor_levels_matches_full_run():
    """The per-level profiled runner (SCT_t fine-grain profiler analog)
    must reproduce the fused executor's factorization exactly, and its
    per-level counters must sum to the plan totals."""
    import jax.numpy as jnp
    from superlu_dist_tpu.ops.kernels import blocklu as _bl
    from superlu_dist_tpu.ops.host.symbolic import block_symbolic

    A = laplacian_2d(12).tocsc()
    plan = block_symbolic(A, bs=8)
    tapes = _bl.make_factor_tapes(plan)
    pool = _bl.init_pool(plan, A.data, np.float32)
    ref = _bl.build_factor_fn(plan, chunk=16)(pool, jnp.float32(1e-8),
                                              tapes)

    rows, out = _bl.profile_factor_levels(plan, A.data, np.float32, 1e-8,
                                          chunk=16)
    assert len(rows) == plan.n_flevels
    assert sum(r["steps"] for r in rows) == plan.nb
    assert sum(r["gemms"] for r in rows) == len(plan.g_l)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))


def test_driver_profile_levels():
    """SparseLU.profile_levels surfaces the per-level profile."""
    from superlu_dist_tpu.models.driver import SparseLU
    A = laplacian_2d(10).tocsc()
    lu = SparseLU(A, Options(dtype="float32", block_size=8,
                             executor="xla"))
    rows = lu.profile_levels()
    assert len(rows) == lu.plan.n_flevels
    assert all(r["ms"] >= 0 for r in rows)
    assert lu.stat.counters["profiled_levels"] == len(rows)
