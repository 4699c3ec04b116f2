"""Benchmark: sparse LU factorization rate on the device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- value: useful (scalar-model) factorization GFLOP/s — flops counted on the
  true scalar L/U nonzero structure of the same permuted matrix (NOT the
  padded block model), directly comparable with CPU sparse-LU rates.
- vs_baseline: ratio against the only quantitative in-tree reference
  figure, 2.5 GFLOP/s (SMP factorization rate, reference:
  DOC/UG_superlu/intro.tex:699).

Default workload: 20³ 7-point Laplacian (n=8000) — a miniature of the 3D
PDE problems the reference's own benchmarks target (SuiteSparse set).
Override via SLU_TPU_BENCH_MATRIX=big.rua etc. Factor timing is amortized
over chained device calls to exclude the host-dispatch round trip (the
steady-state SamePattern_SameRowPerm refactorization cost).

Extra context (padded rate, solve, residuals) goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scalar_lu_flops(A3) -> float:
    """Exact GESP flop count on the scalar L/U structure of A3 (natural
    order): sum_j [ div flops + 2·|L_j|·|U_j| gemm flops ]."""
    import scipy.sparse.linalg as spla
    lu = spla.splu(A3.tocsc().astype(np.float64), permc_spec="NATURAL",
                   diag_pivot_thresh=0.0,
                   options=dict(SymmetricMode=False))
    L, U = lu.L.tocsc(), lu.U.tocsr()
    nnzL_col = np.diff(L.indptr) - 1
    nnzU_row = np.diff(U.indptr)
    return float(np.sum(nnzL_col) + np.sum(2.0 * nnzL_col * nnzU_row))


def main():
    import jax
    import jax.numpy as jnp

    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.ops.kernels import blocklu
    from superlu_dist_tpu.utils.testing import (laplacian_2d, laplacian_3d,
                                                reference_matrix)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    which = os.environ.get("SLU_TPU_BENCH_MATRIX", "lap3d20")
    if which.startswith("lap3d"):
        A = laplacian_3d(int(which[5:] or 20))
        name = which
    elif which.startswith("lap2d"):
        A = laplacian_2d(int(which[5:] or 70))
        name = which
    else:
        A = reference_matrix(which)
        name = which
        if A is None:
            A = laplacian_2d(70)
            name = "lap4900"
    n = A.shape[0]
    log(f"matrix {name}: n={n} nnz={A.nnz}")

    bs = int(os.environ.get("SLU_TPU_BENCH_BS", "128"))
    chunk = int(os.environ.get("SLU_TPU_BENCH_CHUNK", "64"))
    opts = Options(dtype="float32", block_size=bs, gemm_chunk=chunk)

    t0 = time.time()
    lu = SparseLU(A, opts)
    log(f"first factor (incl. compile): {time.time()-t0:.2f}s  "
        f"nb={lu.plan.nb} slots={lu.plan.nslots} nlvl={lu.plan.n_flevels} "
        f"pallas={lu._use_pallas()}")

    A3 = lu._A_orig.multiply(lu.row_scale[:, None]) \
        .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    useful_flops = scalar_lu_flops(A3)
    model_flops = lu.plan.factor_flops
    log(f"useful flops {useful_flops/1e9:.3f}G, padded-model "
        f"{model_flops/1e9:.3f}G (pad ratio {model_flops/useful_flops:.1f}x)")

    # amortized steady-state factor time: chain K factors on device, one
    # readback (the SamePattern_SameRowPerm refactorization path)
    pool0 = blocklu.init_pool(lu.plan, A3.data, lu.dtype)
    thresh = jnp.asarray(np.float32(lu._thresh()))
    K = int(os.environ.get("SLU_TPU_BENCH_REPS", "8"))
    pp = jnp.array(pool0)
    _ = np.asarray(pp[0, 0, :2])
    best = np.inf
    for _ in range(3):
        pp = jnp.array(pool0)
        _ = np.asarray(pp[0, 0, :2])
        t0 = time.time()
        for _ in range(K):
            pp, _l, _u, _t = lu._factor_fn(pp, thresh, lu.tapes)
        _ = np.asarray(pp[0, 0, :2])
        best = min(best, (time.time() - t0) / K)
    gflops_useful = useful_flops / best / 1e9
    log(f"factor {best*1e3:.2f} ms  useful {gflops_useful:.2f} GF/s  "
        f"padded {model_flops/best/1e9:.2f} GF/s")

    # solve + accuracy
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    x = lu.solve(b)
    t0 = time.time()
    for _ in range(5):
        x = lu.solve(b)
    log(f"solve (host-loop) {(time.time()-t0)/5*1e3:.2f} ms  "
        f"rel resid {np.abs(b - A @ x).max()/np.abs(b).max():.2e}")
    xr, berr = lu.refine(b, x)
    log(f"refined berr {berr.max():.2e}")

    baseline = 2.5  # GFLOP/s, DOC/UG_superlu/intro.tex:699
    print(json.dumps({
        "metric": f"factor_useful_gflops_{name}_bs{bs}_f32",
        "value": round(gflops_useful, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops_useful / baseline, 3),
    }))


if __name__ == "__main__":
    main()
