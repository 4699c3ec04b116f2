"""Compile-cache pre-warming (the deployment answer to first-touch cost).

The reference pays zero compile cost (pdgstrf.c is AOT C); the TPU build
compiles one program set per *bucket class* — the 2^k·{1,1.25,1.5,1.75}
quantization of every plan dimension (pool slots, block count, tape
segments, COO stream). Two matrices in the same class share byte-identical
programs, so after round 4's canonicalization work (traceback-free MLIR
locations, transforms/tapes as operands, bucket-padded COO) the persistent
compile cache (``SLU_TPU_CACHE_DIR``) turns every first factor in a warm
class into a cache load.

Measured on the remote TPU (lap3d20-class, n=8000, B=128, clk executor):

======================================  ========
cold cache (first process ever)          ~12 min
fresh process, same matrix               ~10 s
fresh process, DIFFERENT same-class
matrix (the production case)             ~8 s
======================================  ========

Usage — warm once per deployment (offline, any process)::

    from superlu_dist_tpu.utils.prewarm import prewarm
    prewarm(A_representative, Options(...))   # populates the cache

or from the shell::

    python -m superlu_dist_tpu.utils.prewarm path/to/matrix.rua

Every later process (batch jobs, serving replicas) that factors a matrix
in the same bucket class starts in seconds.
"""

from __future__ import annotations

import time

import numpy as np


def prewarm(A, options=None, *, nrhs=(1,), refine: bool = True) -> dict:
    """Factor + solve (+ refine) ``A`` once so every program of its
    bucket class lands in the persistent compile cache.

    Returns timing/bucket metadata. The factorization object is
    discarded — only the cache artifacts matter."""
    from ..models.driver import SparseLU
    from ..utils.options import Options
    options = options or Options()
    t0 = time.time()
    lu = SparseLU(A, options)
    t_factor = time.time() - t0
    n = lu.n
    rng = np.random.default_rng(0)
    b = np.asarray(A @ rng.standard_normal(n)).real.astype(
        np.result_type(lu.dtype, np.float32))
    if np.dtype(lu.dtype).kind == "c":
        b = b.astype(lu.dtype)
    t0 = time.time()
    for k in nrhs:
        bk = b if k == 1 else np.tile(b[:, None], (1, k))
        x = lu.solve(bk)
        if refine:
            lu.refine(bk, x)
    t_solve = time.time() - t0
    # gemm_precision="auto" factors at single-pass bf16; a serving-time
    # refinement stall re-factors at "highest" — warm THAT variant too,
    # so escalation never pays a cold kernel compile in production
    t_esc = 0.0
    if getattr(lu, "_gemm_prec_used", "highest") == "default" and \
            getattr(lu, "_escalate_ok", False):
        t0 = time.time()
        lu._refactor_values("highest")
        t_esc = time.time() - t0
    plan = lu.plan
    from ..ops.kernels.blocklu import bucket125, factor_buckets
    return dict(n=n, factor_s=round(t_factor, 2), solve_s=round(t_solve, 2),
                escalation_warm_s=round(t_esc, 2),
                bucket_nb=bucket125(plan.nb),
                bucket_pool=factor_buckets(plan).poolp)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("matrix", help="matrix file (HB/RB/MM/triple/binary)")
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--dtype", default=None)
    args = p.parse_args(argv)
    from ..utils.io import read_matrix
    from ..utils.options import Options
    A = read_matrix(args.matrix)
    kw = {}
    if args.block_size:
        kw["block_size"] = args.block_size
    if args.dtype:
        kw["dtype"] = args.dtype
    info = prewarm(A, Options(**kw))
    print(info)


if __name__ == "__main__":
    main()
