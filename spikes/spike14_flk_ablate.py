"""Spike 14: flk kernel time breakdown on real TPU.

Ablations (timing only; numerics invalid for ablated runs):
  full          — as shipped
  nofin         — w_fin := 0 (no diag LU / panel TRSM finalizes)
  nogemm        — w_nc := 0 (no contribution DMAs/GEMMs)
  noop          — both zeroed (pure grid + tape walk cost)
Also sweeps Kc.
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
from superlu_dist_tpu.ops.kernels import flk
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
            out = fn(pp, thresh, out and None or None, ) if False else fn(pp, thresh, tapes)
            pp = out[0]
        _ = np.asarray(pp[0, 0, :2])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def run(name, A, gp, Kc):
    A = A.tocsc().astype(np.float32)
    A = A[gp, :][:, gp]
    plan = block_symbolic(A, 128)
    pool0 = bl.init_pool(plan, A.data, np.float32)
    thresh = jnp.asarray(0.0, np.float32)
    tapes, consts = flk.build_flk_tapes(plan, Kc)
    fn = flk._flk_executor(consts["nw"], consts["nbp"], consts["poolp"],
                           Kc, 128, True, False)
    stats = dict(nb=plan.nb, slots=plan.nslots, nw=consts["nw"],
                 ngemm=len(plan.g_l))

    variants = {}
    variants["full"] = tapes
    t2 = dict(tapes); t2["w_fin"] = jnp.zeros_like(tapes["w_fin"])
    variants["nofin"] = t2
    t3 = dict(tapes); t3["w_nc"] = jnp.zeros_like(tapes["w_nc"])
    variants["nogemm"] = t3
    t4 = dict(t2); t4["w_nc"] = jnp.zeros_like(tapes["w_nc"])
    variants["noop"] = t4

    out = [f"[{name} Kc={Kc}] nb={stats['nb']} slots={stats['slots']} "
           f"nw={stats['nw']} ngemm={stats['ngemm']}"]
    for vn, tp in variants.items():
        t = bench(fn, pool0, thresh, tp)
        out.append(f"  {vn:7s} {t*1e3:8.2f} ms")
    print("\n".join(out), flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    A20 = testing.laplacian_3d(20)
    gp20 = geometric_nd((20, 20, 20))
    A32 = testing.laplacian_3d(32)
    gp32 = geometric_nd((32, 32, 32))
    for Kc in (8, 16):
        run("lap3d20", A20, gp20, Kc)
    for Kc in (8, 16):
        run("lap3d32", A32, gp32, Kc)


if __name__ == "__main__":
    main()
