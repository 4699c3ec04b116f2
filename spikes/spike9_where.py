"""Spike 9: where does lap3d32 factor time go?

Times the existing Pallas executor under chunk/pipelined variations, plus
ablations: factor with the gemm tape emptied (level+trsm+diag cost only),
and with trsm tapes also emptied (level+diag cost only).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.ops.kernels import pallas_exec as pe
from superlu_dist_tpu.utils.testing import laplacian_3d


def bench(fn, pool0, thresh, tapes, reps=8):
    pp = jnp.array(pool0)
    out = fn(pp, thresh, tapes)
    _ = np.asarray(out[0][0, 0, :2])
    best = np.inf
    for _r in range(3):
        pp = jnp.array(pool0)
        _ = np.asarray(pp[0, 0, :2])
        t0 = time.perf_counter()
        for _i in range(reps):
            pp, l, u, t = fn(pp, thresh, tapes)
        _ = np.asarray(pp[0, 0, :2])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    A = laplacian_3d(nx)
    perm = geometric_nd((nx, nx, nx))
    A = A[perm, :][:, perm].tocsc()
    plan = block_symbolic(A, 128)
    print(f"n={A.shape[0]} nb={plan.nb} slots={plan.nslots} "
          f"nlvl={plan.n_flevels} gemms={len(plan.g_l)} "
          f"l={len(plan.l_slots)} u={len(plan.u_slots)}")
    pool0 = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.float32(0.0)

    for chunk in (8, 16, 32):
        for pipe in (False, True):
            fn, tapes = pe.build_factor_fn_pallas(plan, chunk=chunk,
                                                  pipelined=pipe)
            t = bench(fn, pool0, thresh, tapes)
            print(f"chunk={chunk} pipelined={pipe}: {t*1e3:.2f} ms")

    # ablations at chunk=16
    fn, tapes = pe.build_factor_fn_pallas(plan, chunk=16)
    t_full = bench(fn, pool0, thresh, tapes)
    t2 = dict(tapes)
    t2["gptr"] = jnp.zeros_like(tapes["gptr"])       # no schur work
    t_nog = bench(fn, pool0, thresh, t2)
    t3 = dict(t2)
    t3["lptr"] = jnp.zeros_like(tapes["lptr"])       # no trsm either
    t3["uptr"] = jnp.zeros_like(tapes["uptr"])
    t_nog_nt = bench(fn, pool0, thresh, t3)
    t4 = dict(t3)
    t4["dptr"] = jnp.zeros_like(tapes["dptr"])       # empty everything
    t_empty = bench(fn, pool0, thresh, t4)
    print(f"full {t_full*1e3:.2f} | -schur {t_nog*1e3:.2f} | "
          f"-schur-trsm {t_nog_nt*1e3:.2f} | empty {t_empty*1e3:.2f} ms")
    print(f"=> schur {1e3*(t_full-t_nog):.2f} trsm {1e3*(t_nog-t_nog_nt):.2f} "
          f"diag {1e3*(t_nog_nt-t_empty):.2f} levels {1e3*t_empty:.2f} ms")


if __name__ == "__main__":
    main()
