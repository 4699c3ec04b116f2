"""Measure existing factor-executor knobs at lap3d32 scale on the TPU:
chunk size x pipelined (double-buffered schur) x precision."""

import sys
import time

import numpy as np
import jax.numpy as jnp

from superlu_dist_tpu.models.driver import SparseLU
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.utils.options import Options, ColPerm
from superlu_dist_tpu.utils.testing import laplacian_3d
from superlu_dist_tpu.ops.kernels import blocklu, pallas_exec


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    A = laplacian_3d(nx)
    opts = Options(dtype="float32", block_size=128,
                   col_perm=ColPerm.MY_PERMC,
                   user_colperm=geometric_nd((nx, nx, nx)))
    lu = SparseLU(A, opts)   # builds plan + pool + default executor
    plan = lu.plan
    A3 = lu._A_orig.multiply(lu.row_scale[:, None]) \
        .multiply(lu.col_scale[None, :]).tocsc()
    A3 = A3[lu.rowperm, :][lu.colperm, :][:, lu.colperm]
    pool0 = blocklu.init_pool(plan, A3.data, lu.dtype)
    thresh = jnp.asarray(lu._thresh(), np.float32)
    print(f"nb={plan.nb} slots={plan.nslots} gemms={len(plan.g_l)} "
          f"nlvl={plan.n_flevels}", flush=True)

    for chunk in (8, 16, 32):
        for pipe in (False, True):
            try:
                t0 = time.time()
                fn, tapes = pallas_exec.build_factor_fn_pallas(
                    plan, chunk=chunk, pipelined=pipe)
                pp = jnp.array(pool0)
                out = fn(pp, thresh, tapes)
                out[0].block_until_ready()
                tc = time.time() - t0
                best = np.inf
                for _ in range(3):
                    pp = jnp.array(pool0)
                    t0 = time.perf_counter()
                    reps = 5
                    for _ in range(reps):
                        pp, l_, u_, t_ = fn(pp, thresh, tapes)
                    pp.block_until_ready()
                    best = min(best, (time.perf_counter() - t0) / reps)
                print(f"chunk={chunk:3d} pipelined={int(pipe)}: "
                      f"{best*1e3:8.2f} ms  (compile {tc:.0f}s)", flush=True)
            except Exception as e:
                print(f"chunk={chunk} pipelined={int(pipe)}: FAILED "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
