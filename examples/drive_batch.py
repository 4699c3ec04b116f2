#!/usr/bin/env python
"""Batched many-matrix solves — the vbatch / block-diagonal example family.

(reference: EXAMPLE/pddrive3d_block_diag.c, pddrive3d_vbatch.c,
 SRC/double/pdgssvx3d_csc_batch.c.)
"""

import sys

import numpy as np


def main():
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.batch import BatchedSparseLU, gssvx_batch
    from superlu_dist_tpu.utils.testing import laplacian_2d, random_sparse

    rng = np.random.default_rng(0)

    # same-pattern batch → one vmapped factorization
    base = laplacian_2d(10)
    As = []
    for i in range(8):
        A = base.copy()
        A.data = A.data * (1.0 + 0.1 * rng.standard_normal(A.nnz))
        As.append(A)
    Xt = rng.standard_normal((8, base.shape[0]))
    Bs = np.stack([As[i] @ Xt[i] for i in range(8)])
    blu = BatchedSparseLU(As, Options(dtype="float32", block_size=16))
    X, berr = blu.refine(Bs, blu.solve(Bs))
    print(f"vmapped batch of 8:  max err "
          f"{np.abs(X - Xt).max():.2e}  max berr {berr.max():.2e}")

    # heterogeneous batch → block-diagonal composite
    As2 = [laplacian_2d(6), random_sparse(50, 0.1, seed=1),
           random_sparse(75, 0.08, seed=2, diag_dominant=False)]
    xs = [rng.standard_normal(A.shape[0]) for A in As2]
    Bs2 = [np.asarray(A @ x) for A, x in zip(As2, xs)]
    results, lu = gssvx_batch(As2, Bs2, Options(dtype="float32",
                                                block_size=16))
    for i, res in enumerate(results):
        print(f"block-diag matrix {i}: n={As2[i].shape[0]:4d} "
              f"err={np.abs(res.x - xs[i]).max():.2e} "
              f"berr={res.berr.max():.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
