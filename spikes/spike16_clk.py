"""Spike 16: clk (column-resident) vs flk on real TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu as bl
from superlu_dist_tpu.ops.kernels import clk, flk
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
    return best, out


def run(name, A, gp, MC):
    A = A.tocsc().astype(np.float32)
    A = A[gp, :][:, gp]
    plan = block_symbolic(A, 128)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.asarray(0.0, np.float32)

    ffn, ftapes = flk.build_factor_fn_flk(plan)
    tf, outf = bench(ffn, pool0, thresh, ftapes)

    if not clk.clk_supported(plan):
        print(f"[{name}] clk unsupported (panel too large)", flush=True)
        return
    cfn, ctapes = clk.build_factor_fn_clk(plan, MC=MC)
    tc, outc = bench(cfn, pool0, thresh, ctapes)

    n = plan.nslots
    d = float(jnp.abs(outf[0][:n] - outc[0][:n]).max())
    s = float(jnp.abs(outf[0][:n]).max())
    print(f"[{name} MC={MC}] nb={plan.nb} slots={plan.nslots} "
          f"flk={tf*1e3:.2f}ms clk={tc*1e3:.2f}ms "
          f"speedup={tf/tc:.2f}x pooldiff={d:.2e}/{s:.1e}", flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    A20 = testing.laplacian_3d(20)
    gp20 = geometric_nd((20, 20, 20))
    A32 = testing.laplacian_3d(32)
    gp32 = geometric_nd((32, 32, 32))
    for MC in (8, 16):
        run("lap3d20", A20, gp20, MC)
    for MC in (8, 16):
        run("lap3d32", A32, gp32, MC)


if __name__ == "__main__":
    main()
