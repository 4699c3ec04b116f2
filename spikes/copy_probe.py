"""Where does the 2x-pool copy in the XLA factor executor come from?

Compiles the factor fn for a mid-size plan and prints XLA's memory
analysis (peak vs pool bytes) + any full-pool copies in the optimized HLO.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/slu_tpu_jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from superlu_dist_tpu.ops.host import align as _align
from superlu_dist_tpu.ops.host.ordering import geometric_nd
from superlu_dist_tpu.ops.host.symbolic import block_symbolic
from superlu_dist_tpu.ops.kernels import blocklu
from superlu_dist_tpu.utils.testing import laplacian_3d


def main(nx=32, bs=64):
    n = nx ** 3
    A = laplacian_3d(nx).tocsc()
    perm = geometric_nd((nx, nx, nx))
    A3 = A[perm, :][:, perm]
    res = _align.aligned_blocking(A3, bs, max_inflate=1.5)
    if res is not None:
        A3 = A3[res.po, :][:, res.po]
        A3 = _align.expand_matrix(A3, res.expand, res.n_e)
    plan = block_symbolic(A3, bs)
    pool_gib = plan.pool_bytes(np.float32) / 2**30
    print(f"nx={nx} bs={bs} slots={plan.nslots} pool={pool_gib:.3f} GiB")

    tapes = blocklu.make_factor_tapes(plan)
    b = blocklu.factor_buckets(plan)
    core = blocklu.build_factor_core(plan, chunk=64)
    fn = jax.jit(core, donate_argnums=(0,))
    pool = blocklu.init_pool(plan, A3.data, np.float32)
    lowered = fn.lower(pool, jnp.float32(1e-6), tapes)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    print("peak:", getattr(ma, "temp_size_in_bytes", None),
          "args:", getattr(ma, "argument_size_in_bytes", None),
          "out:", getattr(ma, "output_size_in_bytes", None),
          "alias:", getattr(ma, "alias_size_in_bytes", None))
    txt = comp.as_text()
    import re
    pool_elems = b.poolp * bs * bs
    big = 0
    for m in re.finditer(r"f32\[(\d+)(?:,(\d+))?(?:,(\d+))?\]", txt):
        dims = [int(g) for g in m.groups() if g]
        sz = int(np.prod(dims))
        if sz >= pool_elems:
            big += 1
    print(f"pool-sized f32 tensors in optimized HLO: {big}")
    for line in txt.splitlines():
        if "copy" in line and f"{b.poolp},{bs},{bs}" in line.replace(" ", ""):
            print("COPY:", line.strip()[:160])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64)
