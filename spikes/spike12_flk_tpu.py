"""Spike 12: flk kernel on real TPU — compile, correctness, timing."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.ops.kernels import flk
from superlu_dist_tpu.ops.kernels import pallas_exec as pe
from superlu_dist_tpu.utils import testing


def bench(fn, pool0, thresh, tapes, reps=8):
    pp = jnp.array(pool0)
    t0 = time.perf_counter()
    out = fn(pp, thresh, tapes)
    _ = np.asarray(out[0][0, 0, :2])
    t_compile = time.perf_counter() - t0
    best = np.inf
    for _r in range(3):
        pp = jnp.array(pool0)
        _ = np.asarray(pp[0, 0, :2])
        t0 = time.perf_counter()
        for _i in range(reps):
            out = fn(pp, thresh, tapes)
            pp = out[0]
        _ = np.asarray(pp[0, 0, :2])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, t_compile, out


def main():
    jobs = []
    for nx in (20, 32):
        A = testing.laplacian_3d(nx).tocsc()
        p = geometric_nd((nx, nx, nx))
        jobs.append((f"lap3d{nx}", A[p][:, p].tocsc()))
    B = testing.reference_matrix("big.rua")
    if B is not None:
        import scipy.sparse as sp
        jobs.append(("big.rua", sp.csc_matrix(B, dtype=np.float64)))

    for name, A in jobs:
        plan = block_symbolic(A, 128)
        pool0 = bl.init_pool(plan, A.data, np.float32)
        thresh = jnp.float32(0.0)

        f_old, t_old = pe.build_factor_fn_pallas(plan, chunk=16)
        best_o, tc_o, _ = bench(f_old, pool0, thresh, t_old)
        out_o = f_old(jnp.array(pool0), thresh, t_old)

        f_new, t_new = flk.build_factor_fn_flk(plan)
        best_n, tc_n, _ = bench(f_new, pool0, thresh, t_new)
        out_n = f_new(jnp.array(pool0), thresh, t_new)

        ns = plan.nslots
        d = float(jnp.max(jnp.abs(out_o[0][:ns] - out_n[0][:ns])))
        s = float(jnp.max(jnp.abs(out_o[0][:ns])))
        print(f"[{name}] nb={plan.nb} slots={ns} gemms={len(plan.g_l)}")
        print(f"  old per-level : {best_o*1e3:8.2f} ms (compile {tc_o:.0f}s)")
        print(f"  new flk fused : {best_n*1e3:8.2f} ms (compile {tc_n:.0f}s)"
              f"  pool rel diff {d/s:.2e}  speedup {best_o/best_n:.2f}x")


if __name__ == "__main__":
    main()
