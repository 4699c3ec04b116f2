#!/usr/bin/env python
"""Factor-reuse staging patterns — the pddrive1/2/3 example family.

(reference: EXAMPLE/pddrive1.c same-A-new-B / FACTORED;
 EXAMPLE/pddrive2.c same-pattern-new-values / SamePattern;
 EXAMPLE/pddrive3.c same-pattern-same-rowperm / SamePattern_SameRowPerm.)
"""

import sys

import numpy as np


def main():
    from superlu_dist_tpu import Fact, Options, gssvx
    from superlu_dist_tpu.utils.io import read_matrix
    from superlu_dist_tpu.utils.testing import backward_error

    path = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/reference/EXAMPLE/g20.rua"
    A = read_matrix(path)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    opts = Options(dtype="float32", block_size=32)

    # ---- first factorization + solve (DOFACT) ----
    b1 = np.asarray(A @ rng.standard_normal(n))
    res1, lu = gssvx(A, b1, opts)
    print(f"DOFACT:                berr={res1.berr.max():.2e}")

    # ---- pddrive1: same A, new B (FACTORED) ----
    b2 = np.asarray(A @ rng.standard_normal(n))
    res2, lu = gssvx(A, b2, opts.replace(fact=Fact.FACTORED), lu=lu)
    print(f"FACTORED (new B):      berr={res2.berr.max():.2e}")

    # ---- pddrive2: same pattern, new values (SamePattern) ----
    A2 = A.copy()
    A2.data = A.data * (1.0 + 0.1 * rng.standard_normal(A.nnz))
    b3 = np.asarray(A2 @ rng.standard_normal(n))
    res3, lu = gssvx(A2, b3, opts.replace(fact=Fact.SAME_PATTERN), lu=lu)
    print(f"SamePattern:           berr={res3.berr.max():.2e}")

    # ---- pddrive3: same pattern + rowperm (SamePattern_SameRowPerm) ----
    A3 = A2.copy()
    A3.data = A2.data * (1.0 + 0.05 * rng.standard_normal(A2.nnz))
    b4 = np.asarray(A3 @ rng.standard_normal(n))
    res4, lu = gssvx(A3, b4,
                     opts.replace(fact=Fact.SAME_PATTERN_SAME_ROWPERM),
                     lu=lu)
    print(f"SamePattern_SameRowPerm: berr={res4.berr.max():.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
