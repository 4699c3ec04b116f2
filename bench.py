"""Benchmark: factorization rate on the reference's big.rua fixture.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- value: useful (scalar-model) factorization GFLOP/s on the real device —
  flops counted on the true scalar L/U nonzero structure of the same
  permuted matrix (not the padded block model), so the number is directly
  comparable with CPU sparse-LU rates.
- vs_baseline: ratio against the only quantitative in-tree reference figure,
  2.5 GFLOP/s (SMP factorization rate, reference: DOC/UG_superlu/intro.tex:699).

Extra context (padded-model rate, solve throughput, timings) goes to stderr.
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
    nnzL_col = np.diff(L.indptr) - 1           # off-diagonal L entries/col
    nnzU_row = np.diff(U.indptr)               # U entries/row (incl diag)
    return float(np.sum(nnzL_col) + np.sum(2.0 * nnzL_col * nnzU_row))


def main():
    import jax
    import jax.numpy as jnp

    from superlu_dist_tpu import Options, SparseLU
    from superlu_dist_tpu.ops.kernels import blocklu
    from superlu_dist_tpu.utils.testing import (laplacian_2d,
                                                reference_matrix)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    which = os.environ.get("SLU_TPU_BENCH_MATRIX", "big.rua")
    if which == "big.rua":
        A = reference_matrix("big.rua")
        name = "big.rua"
        if A is None:
            A = laplacian_2d(70)
            name = "lap4900"
    elif which.startswith("lap3d"):
        from superlu_dist_tpu.utils.testing import laplacian_3d
        k = int(which[5:] or 20)
        A = laplacian_3d(k)
        name = which
    else:
        A = reference_matrix(which) or laplacian_2d(70)
        name = which
    n = A.shape[0]

    bs = int(os.environ.get("SLU_TPU_BENCH_BS", "64"))
    chunk = int(os.environ.get("SLU_TPU_BENCH_CHUNK", "64"))
    opts = Options(dtype="float32", block_size=bs, gemm_chunk=chunk)

    t0 = time.time()
    lu = SparseLU(A, opts)
    log(f"first factor (incl. compile): {time.time()-t0:.2f}s  "
        f"nb={lu.plan.nb} slots={lu.plan.nslots}")

    # permuted/scaled matrix actually factored — for the useful-flop count
    A3 = lu._A_orig.multiply(lu.row_scale[:, None]) \
        .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    useful_flops = scalar_lu_flops(A3)
    model_flops = lu.plan.factor_flops
    log(f"useful flops {useful_flops/1e9:.3f}G, padded-model flops "
        f"{model_flops/1e9:.3f}G (ratio {model_flops/useful_flops:.1f}x)")

    # warm repeated factorization (steady-state: SamePattern_SameRowPerm)
    pool0 = blocklu.init_pool(lu.plan, A3.data, lu.dtype)
    thresh = jnp.asarray(np.float32(lu._thresh()))
    reps = int(os.environ.get("SLU_TPU_BENCH_REPS", "5"))
    times = []
    for _ in range(reps):
        pool = jnp.array(pool0)  # factor donates its input
        t0 = time.time()
        out = lu._factor_fn(pool, thresh, lu.tapes)
        out[0].block_until_ready()
        times.append(time.time() - t0)
    t_fact = min(times)
    gflops_useful = useful_flops / t_fact / 1e9
    gflops_model = model_flops / t_fact / 1e9
    log(f"factor time {t_fact*1e3:.1f} ms  useful {gflops_useful:.2f} GF/s  "
        f"padded {gflops_model:.2f} GF/s  (times: "
        + " ".join(f"{t*1e3:.0f}" for t in times) + " ms)")

    # solve throughput (nnz/s through L+U, nrhs=1)
    b = np.asarray(A @ np.ones(n))
    x = lu.solve(b)  # compile
    t0 = time.time()
    nrep = 10
    for _ in range(nrep):
        x = lu.solve(b)
    t_solve = (time.time() - t0) / nrep
    lu_nnz = lu.plan.nslots * bs * bs
    log(f"solve time {t_solve*1e3:.2f} ms  ({lu_nnz/t_solve/1e9:.2f} Gnnz/s "
        "padded)")
    resid = np.abs(b - A @ x).max() / np.abs(b).max()
    log(f"solve relative residual {resid:.2e}")

    baseline = 2.5  # GFLOP/s, DOC/UG_superlu/intro.tex:699
    print(json.dumps({
        "metric": f"factor_useful_gflops_{name}_bs{bs}_f32",
        "value": round(gflops_useful, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops_useful / baseline, 3),
    }))


if __name__ == "__main__":
    main()
