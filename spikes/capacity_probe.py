"""Capacity probe: host-plan lap3d at large n, report pool bytes.

Measures whether million-row (SuiteSparse-class: audikw_1 n=944k,
nlpkkt80 n=1.06M) problems fit one chip's HBM under the current block
storage, at various block sizes, with the etree-aligned blocking.

Run:  python spikes/capacity_probe.py [nx ...] [--bs 128,64]
"""
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

from superlu_dist_tpu.ops.host import align as _align
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.utils.testing import laplacian_3d


def probe(nx: int, bs: int):
    n = nx ** 3
    t0 = time.time()
    A = laplacian_3d(nx).tocsc()
    perm = geometric_nd((nx, nx, nx))
    A3 = A[perm, :][:, perm]
    t_gen = time.time() - t0

    t0 = time.time()
    res = _align.aligned_blocking(A3, bs, max_inflate=1.5)
    t_align = time.time() - t0
    if res is not None:
        A3 = A3[res.po, :][:, res.po]
        A3 = _align.expand_matrix(A3, res.expand, res.n_e)
        inflate = res.n_e / n
    else:
        inflate = 1.0

    t0 = time.time()
    plan = block_symbolic(A3, bs)
    t_symb = time.time() - t0

    pool_gib = plan.pool_bytes(np.float32) / 2**30
    lvl, cnt = np.unique(plan.step_level, return_counts=True)
    serial = int((cnt == 1).sum())
    spl = plan.nb / plan.n_flevels
    print(f"nx={nx} n={n} bs={bs}: nb={plan.nb} nslots={plan.nslots} "
          f"pool={pool_gib:.2f} GiB inflate={inflate:.2f} "
          f"levels={plan.n_flevels} steps/lvl={spl:.1f} serial_lvls={serial} "
          f"gemms={len(plan.g_l)} "
          f"[gen {t_gen:.1f}s align {t_align:.1f}s symb {t_symb:.1f}s]",
          flush=True)
    return plan, pool_gib


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bss = [128, 64]
    for a in sys.argv[1:]:
        if a.startswith("--bs"):
            bss = [int(x) for x in a.split("=")[1].split(",")]
    nxs = [int(a) for a in args] or [50, 64, 80]
    for nx in nxs:
        for bs in bss:
            probe(nx, bs)
