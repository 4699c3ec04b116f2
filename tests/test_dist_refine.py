"""Distributed SpMV + in-mesh iterative refinement (VERDICT r2 item 6).

The 2D driver's refinement must run entirely inside the mesh: residuals by
distributed SpMV (pdgsmv analog, reference: SRC/double/pdgsmv.c:1-383),
sweeps by the distributed solve core, the berr loop as one jitted
while_loop (pdgsrfs.c:129-251) — no host-side SpMV, no single-device
residuals.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superlu_dist_tpu import Options
from superlu_dist_tpu.models.dist_driver import DistributedSparseLU, gssvx_dist
from superlu_dist_tpu.parallel import dist2d
from superlu_dist_tpu.parallel.grid import Grid2D
from superlu_dist_tpu.utils.testing import (laplacian_2d, laplacian_3d,
                                            random_sparse)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_dist_spmv_matches_scipy():
    A = random_sparse(200, density=0.05, seed=5)
    grid = Grid2D(2, 4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 3))
    spmv = dist2d.build_dist_spmv_fn(A, grid, 3, np.float64)
    got = np.asarray(spmv(jnp.asarray(x)))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)


@needs_8
@pytest.mark.parametrize("pr,pc", [(2, 4), (2, 2)])
def test_dist_refine_in_mesh(pr, pc):
    A = laplacian_2d(14)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    lu = DistributedSparseLU(A, Grid2D(pr, pc),
                             Options(dtype="float32", block_size=16))
    x0 = lu.solve(b)
    x, berr = lu.refine(b, x0)
    # the FUSED distributed refine fn must have been built and used
    assert ("FR", 1) in lu._solve_fns
    assert float(np.max(berr)) < 1e-13   # f64 residual quality
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-12


@needs_8
def test_dist_refine_matches_single_chip():
    from superlu_dist_tpu.models.driver import gssvx
    A = laplacian_3d(7)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    B = rng.standard_normal((n, 3))
    res_d, lu_d = gssvx_dist(A, B, Grid2D(2, 2),
                             Options(dtype="float32", block_size=16))
    res_s, _ = gssvx(A, B, Options(dtype="float32", block_size=16))
    assert res_d.berr.max() < 1e-13
    np.testing.assert_allclose(res_d.x, res_s.x, rtol=1e-9, atol=1e-11)


@needs_8
def test_dist_refine_complex():
    A = laplacian_2d(10).astype(np.complex128)
    A = A + 1j * 0.3 * random_sparse(A.shape[0], density=0.01, seed=9) \
        .astype(np.complex128)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    res, lu = gssvx_dist(A, b, Grid2D(2, 2),
                         Options(dtype="complex128", block_size=8))
    assert ("FR", 1) in lu._solve_fns
    assert res.berr.max() < 1e-13
    assert np.abs(A @ res.x - b).max() / np.abs(b).max() < 1e-12


@needs_8
def test_dist3d_refine_in_mesh():
    """3D driver: refinement runs in the z x r x c mesh (pdgsrfs3d role)."""
    from superlu_dist_tpu.models.driver3d import Distributed3DSparseLU
    from superlu_dist_tpu.parallel.grid import Grid3D
    A = laplacian_3d(7)
    n = A.shape[0]
    rng = np.random.default_rng(6)
    b = rng.standard_normal(n)
    lu = Distributed3DSparseLU(A, Grid3D(2, 2, 2),
                               Options(dtype="float32", block_size=16))
    x0 = lu.solve(b)
    x, berr = lu.refine(b, x0)
    assert ("FR", 1) in lu._solve_fns
    assert float(np.max(berr)) < 1e-13
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-12
