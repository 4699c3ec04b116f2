"""Spike 18: clk per-job time breakdown via tape patching (no recompiles).

The tapes are runtime inputs, so zeroing job flags disables kernel
sections inside the SAME compiled executable:
  - j_m = 0     : no A-range wait, no wide GEMM, no panel scatter
  - j_finB = 0  : no linv wait, no B-finalize dot
  - j_fin = 0   : no diag LU, no TRSM chain, no panel store
  - j_start = 0 : no panel loads
Results are numerically garbage for the ablated variants — timing only.
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
from superlu_dist_tpu.ops.kernels import clk
from superlu_dist_tpu.utils import testing


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
            out = fn(pp, thresh, tapes)
            pp = out[0]
        _ = np.asarray(pp[0, 0, :2])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def patch(tapes, **kv):
    out = []
    for seg in tapes:
        s = dict(seg)
        for k, mode in kv.items():
            s[k] = jnp.zeros_like(seg[k]) if mode == 0 else seg[k]
        out.append(s)
    return tuple(out)


def run(name, A, gp, MC=8):
    A = A.tocsc().astype(np.float32)
    A = A[gp, :][:, gp]
    plan = block_symbolic(A, 128)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.asarray(0.0, np.float32)
    fn, tapes = clk.build_factor_fn_clk(plan, MC=MC)
    nj = sum(len(s["j_fin"]) for s in tapes)

    variants = {
        "full": tapes,
        "no_gemm": patch(tapes, j_m=0),
        "no_finB": patch(tapes, j_finB=0),
        "no_fin": patch(tapes, j_fin=0),
        "no_gemm_finB": patch(tapes, j_m=0, j_finB=0),
        "only_loads": patch(tapes, j_m=0, j_finB=0, j_fin=0),
    }
    base = None
    for vname, tp in variants.items():
        t = bench(fn, pool0, thresh, tp)
        if vname == "full":
            base = t
        print(f"[{name}] {vname:14s} {t*1e3:7.2f} ms  {t/nj*1e6:5.1f} us/job"
              + ("" if vname == "full" else
                 f"   (delta {(base-t)*1e3:+6.2f} ms)"), flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    run("lap3d20", testing.laplacian_3d(20), geometric_nd((20, 20, 20)))
    run("lap3d32", testing.laplacian_3d(32), geometric_nd((32, 32, 32)))


def run2(name, A, gp, MC=8):
    """fin-internal breakdown: kill just the TRSM chain (j_dpos=j_ncol)."""
    A = A.tocsc().astype(np.float32)
    A = A[gp, :][:, gp]
    plan = block_symbolic(A, 128)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.asarray(0.0, np.float32)
    fn, tapes = clk.build_factor_fn_clk(plan, MC=MC)
    nj = sum(len(s["j_fin"]) for s in tapes)
    notrsm = tuple(dict(s, j_dpos=s["j_ncol"]) for s in tapes)
    t0 = bench(fn, pool0, thresh, tapes)
    t1 = bench(fn, pool0, thresh, notrsm)
    print(f"[{name}] full {t0*1e3:.2f} ms | fin w/o TRSM chain {t1*1e3:.2f}"
          f" ms  (TRSM chain = {(t0-t1)*1e3:.2f} ms)", flush=True)
