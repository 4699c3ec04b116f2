#!/usr/bin/env python
"""Basic driver: read a matrix, solve A·X=B, report errors.

Analog of EXAMPLE/pddrive.c (reference: EXAMPLE/pddrive.c:101-350):
generate a true solution, build B = A·x_true, run the expert driver, print
the relative ∞-norm error and backward error plus the PStatPrint report.

Usage:
    python examples/drive.py [matrix.{rua,mtx,...}] [-r R -c C] [-s NRHS]
        [-b BLOCKSIZE] [-d DTYPE]

With -r/-c a 2D process grid runs on the available devices; default is the
single-chip path.
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("matrix", nargs="?",
                   default="/root/reference/EXAMPLE/g20.rua")
    p.add_argument("-r", type=int, default=0, help="process grid rows")
    p.add_argument("-c", type=int, default=0, help="process grid cols")
    p.add_argument("-s", "--nrhs", type=int, default=1)
    p.add_argument("-b", "--block-size", type=int, default=32)
    p.add_argument("-d", "--dtype", default="float32")
    args = p.parse_args()

    from superlu_dist_tpu import Options, gssvx
    from superlu_dist_tpu.utils.io import read_matrix
    from superlu_dist_tpu.utils.testing import (backward_error,
                                                inf_norm_error)

    A = read_matrix(args.matrix)
    n = A.shape[0]
    print(f"matrix {args.matrix}: n={n} nnz={A.nnz}")
    rng = np.random.default_rng(0)
    xtrue = rng.standard_normal((n, args.nrhs))
    if A.dtype.kind == "c":
        xtrue = xtrue + 1j * rng.standard_normal((n, args.nrhs))
        if args.dtype.startswith("float"):
            args.dtype = "complex64" if args.dtype == "float32" \
                else "complex128"
    b = np.asarray(A @ xtrue)

    opts = Options(dtype=args.dtype, block_size=args.block_size)
    if args.r and args.c:
        from superlu_dist_tpu.models.dist_driver import gssvx_dist
        from superlu_dist_tpu.parallel.grid import Grid2D
        res, lu = gssvx_dist(A, b, Grid2D(args.r, args.c), opts)
    else:
        res, lu = gssvx(A, b, opts)

    print(f"Sol  0: ||X-Xtrue||/||X|| = {inf_norm_error(res.x, xtrue):.6e}")
    print(f"        max berr          = {res.berr.max():.6e}")
    print(res.stat.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
