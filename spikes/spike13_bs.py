"""Spike 13: sub-128 block sizes through the flk kernel on real TPU.

For each (matrix, bs): factor via SparseLU (flk path), check residual,
report steady-state factor time, useful/padded GF/s, pad ratio, solve time.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from superlu_dist_tpu import Options, SparseLU
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.utils.options import ColPerm
from superlu_dist_tpu.utils import testing


def scalar_lu_flops(A3):
    import scipy.sparse.linalg as spla
    lu = spla.splu(A3.tocsc().astype(np.float64), permc_spec="NATURAL",
                   diag_pivot_thresh=0.0, options=dict(SymmetricMode=False))
    L, U = lu.L.tocsc(), lu.U.tocsr()
    nnzL_col = np.diff(L.indptr) - 1
    nnzU_row = np.diff(U.indptr)
    return float(np.sum(nnzL_col) + np.sum(2.0 * nnzL_col * nnzU_row))


def run(name, A, bs, colperm=None):
    opts = Options(dtype="float32", block_size=bs)
    if colperm is not None:
        opts = Options(dtype="float32", block_size=bs,
                       col_perm=ColPerm.MY_PERMC, user_colperm=colperm)
    t0 = time.time()
    lu = SparseLU(A, opts)
    t_first = time.time() - t0
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = np.asarray(A @ rng.standard_normal(n))
    x = lu.solve(b)
    resid = float(np.abs(b - A @ x).max() / np.abs(b).max())

    A3 = lu._A_orig.multiply(lu.row_scale[:, None]) \
        .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    useful = scalar_lu_flops(A3)
    model = lu.plan.factor_flops

    pool0 = bl.init_pool(lu.plan, A3.data, lu.dtype)
    thresh = jnp.asarray(lu._thresh(), dtype=np.float32)
    best = np.inf
    for _ in range(3):
        pp = jnp.array(pool0)
        _ = np.asarray(pp[0, 0, :2])
        t0 = time.perf_counter()
        for _ in range(8):
            pp, _l, _u, _t = lu._factor_fn(pp, thresh, lu.tapes)
        _ = np.asarray(pp[0, 0, :2])
        best = min(best, (time.perf_counter() - t0) / 8)

    t0 = time.perf_counter()
    for _ in range(5):
        x = lu.solve(b)
    t_solve = (time.perf_counter() - t0) / 5

    print(f"[{name} bs={bs}] pallas={lu._use_pallas()} nb={lu.plan.nb} "
          f"slots={lu.plan.nslots} first={t_first:.1f}s "
          f"factor={best*1e3:.2f}ms useful={useful/best/1e9:.1f}GF/s "
          f"pad={model/max(useful,1):.1f}x solve={t_solve*1e3:.2f}ms "
          f"resid={resid:.1e}", flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    A20 = testing.laplacian_3d(20)
    gp = geometric_nd((20, 20, 20))
    for bs in (128, 64, 32):
        run("lap3d20_geo", A20, bs, gp)
    Abig = testing.reference_matrix("big.rua").astype(np.float64)
    for bs in (128, 64, 32, 16):
        run("big.rua", Abig, bs)


if __name__ == "__main__":
    main()
