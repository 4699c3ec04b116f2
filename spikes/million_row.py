"""Million-row end-to-end on one chip: lap3d100 (n=1e6), bs=64.

SuiteSparse-class capacity demo (VERDICT r2 item 4): the dense-128 pool
at n=1M is 14.8 GiB (too big for v5e's 16 GiB next to linv/uinv); bs=64
brings the pool to ~10.5 GiB and the XLA executor handles any bs.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/slu_tpu_jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")


def main(nx=100, bs=64, executor="xla"):
    import jax
    from superlu_dist_tpu import Options, gssvx
    from superlu_dist_tpu.utils.options import ColPerm
    from superlu_dist_tpu.ops.host.ordering import geometric_nd
    from superlu_dist_tpu.utils.testing import laplacian_3d

    print("device:", jax.devices()[0].device_kind, flush=True)
    n = nx ** 3
    t0 = time.time()
    A = laplacian_3d(nx)
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    print(f"built A n={n} nnz={A.nnz} in {time.time()-t0:.1f}s", flush=True)

    opts = Options(dtype="float32", block_size=bs,
                   executor=None if executor == "auto" else executor,
                   gemm_chunk=int(os.environ.get("SLU_TPU_BENCH_CHUNK", "64")),
                   col_perm=ColPerm.MY_PERMC,
                   user_colperm=geometric_nd((nx, nx, nx)))
    t0 = time.time()
    res, lu = gssvx(A, b, opts)
    t_total = time.time() - t0
    err = np.abs(res.x - xt).max() / np.abs(xt).max()
    print(f"total {t_total:.1f}s  berr {res.berr.max():.2e}  "
          f"x err vs truth {err:.2e}", flush=True)
    print(lu.stat.report(), flush=True)
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            print({k: round(v / 2**30, 2) for k, v in ms.items()
                   if "peak" in k or "limit" in k or "in_use" in k},
                  flush=True)
    except Exception:
        pass

    # steady-state refactor (SamePattern_SameRowPerm: reuse perms + plan)
    from superlu_dist_tpu.utils.options import Fact
    t0 = time.time()
    lu.refactor(A, fact=Fact.SAME_PATTERN_SAME_ROWPERM)
    print(f"steady refactor {time.time()-t0:.2f}s (incl. pool rebuild)",
          flush=True)
    t0 = time.time()
    x2 = lu.solve(b)
    print(f"warm solve {time.time()-t0:.2f}s  "
          f"resid {np.abs(A @ x2 - b).max() / np.abs(b).max():.2e}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64,
         sys.argv[3] if len(sys.argv) > 3 else "xla")
