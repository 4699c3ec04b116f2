"""Spike 17: clk time breakdown on real TPU (tape-patch ablations)."""

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


def run(name, A, gp, MC=8):
    A = A.tocsc().astype(np.float32)
    A = A[gp, :][:, gp]
    plan = block_symbolic(A, 128)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.asarray(0.0, np.float32)
    fn, tapes = clk.build_factor_fn_clk(plan, MC=MC)
    nj = len(tapes["j_fin"])
    nsync = int(np.asarray(tapes["j_sync"]).sum())
    nrun = int((np.asarray(tapes["j_run0"]) >= 0).sum())

    variants = {"full": tapes}
    t = dict(tapes); t["j_fin"] = jnp.zeros_like(tapes["j_fin"])
    variants["nofin"] = t
    t2 = dict(tapes); t2["j_start"] = jnp.zeros_like(tapes["j_start"])
    variants["nostart"] = t2
    t3 = dict(t); t3["j_start"] = jnp.zeros_like(tapes["j_start"])
    variants["neither"] = t3
    t4 = dict(tapes); t4["j_finB"] = jnp.zeros_like(tapes["j_finB"])
    variants["nofinB"] = t4
    t5 = dict(tapes); t5["j_sync"] = jnp.zeros_like(tapes["j_sync"])
    variants["nosync"] = t5

    out = [f"[{name} MC={MC}] nj={nj} sync={nsync} run={nrun} "
           f"slots={plan.nslots}"]
    for vn, tp in variants.items():
        tt = bench(fn, pool0, thresh, tp)
        out.append(f"  {vn:8s} {tt*1e3:8.2f} ms")
    print("\n".join(out), flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    run("lap3d32", testing.laplacian_3d(32), geometric_nd((32, 32, 32)))


if __name__ == "__main__":
    main()
