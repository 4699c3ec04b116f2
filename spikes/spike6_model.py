"""Cost model: predicted fused-kernel factor time per (matrix, bs).

Per-op costs measured on TPU v5e (spike3/spike5):
  schur per-triple: {32: 240e-9, 64: 455e-9, 128: 1633e-9}   (C=16/16/8)
  trsm per-op: assume ~2/3 of a schur triple (2 DMAs vs 3)
  diag per-window (C lanes vmapped): {32: 31e-6, 64: 192e-6, 128: 570e-6}
"""

import sys
import time

import numpy as np

from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.utils.testing import laplacian_3d, reference_matrix
from superlu_dist_tpu.utils.options import Options, ColPerm
from superlu_dist_tpu.models.driver import SparseLU

T_SCHUR = {16: 180e-9, 32: 240e-9, 64: 455e-9, 128: 1633e-9}
T_TRSM = {k: v * 0.75 for k, v in T_SCHUR.items()}
T_DIAGW = {16: 20e-6, 32: 31e-6, 64: 192e-6, 128: 570e-6}
C_OF = {16: 16, 32: 16, 64: 16, 128: 8}


def scalar_lu_flops(A3):
    import scipy.sparse.linalg as spla
    lu = spla.splu(A3.tocsc().astype(np.float64), permc_spec="NATURAL",
                   diag_pivot_thresh=0.0, options=dict(SymmetricMode=False))
    L, U = lu.L.tocsc(), lu.U.tocsr()
    nnzL_col = np.diff(L.indptr) - 1
    nnzU_row = np.diff(U.indptr)
    return float(np.sum(nnzL_col) + np.sum(2.0 * nnzL_col * nnzU_row))


def analyze(name, A, colperm=None):
    import scipy.sparse as sp
    # preprocess once (equil+mc64+colperm) as the driver would
    opts = Options(dtype="float32", block_size=128)
    if colperm is not None:
        opts.col_perm = ColPerm.MY_PERMC
        opts.user_colperm = colperm
    lu = SparseLU.__new__(SparseLU)
    lu.options = opts
    from superlu_dist_tpu.utils.stats import Stats
    lu.stat = Stats()
    lu.n = A.shape[0]
    lu.dtype = np.dtype(np.float32)
    lu.plan = None
    A3 = lu._preprocess(sp.csc_matrix(A), False, False)
    useful = scalar_lu_flops(A3)
    print(f"[{name}] n={A.shape[0]} useful={useful/1e9:.3f} GF")
    for bs in (16, 32, 64, 128):
        t0 = time.time()
        plan = block_symbolic(A3, bs)
        tsym = time.time() - t0
        ng = len(plan.g_l)
        nt = len(plan.l_slots) + len(plan.u_slots)
        C = C_OF[bs]
        ndw = sum(-(-int(c) // C) for c in np.bincount(
            plan.step_level, minlength=plan.n_flevels))
        t_est = (ng * T_SCHUR[bs] + nt * T_TRSM[bs] + ndw * T_DIAGW[bs])
        pad = plan.factor_flops / useful
        print(f"  bs={bs:4d}: nb={plan.nb:6d} slots={plan.nslots:7d} "
              f"gemms={ng:8d} trsm={nt:7d} nlvl={plan.n_flevels:4d} "
              f"pad={pad:7.1f}x  est={t_est*1e3:8.2f} ms "
              f"(sym {tsym:.2f}s)  -> useful {useful/t_est/1e9:7.1f} GF/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "big"):
        A = reference_matrix("big.rua")
        analyze("big.rua", A.astype(np.float64))
    if which in ("all", "lap20"):
        analyze("lap3d20_geo", laplacian_3d(20), geometric_nd((20, 20, 20)))
    if which in ("all", "lap32"):
        analyze("lap3d32_geo", laplacian_3d(32), geometric_nd((32, 32, 32)))
