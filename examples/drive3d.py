#!/usr/bin/env python
"""3D communication-avoiding driver — the pddrive3d example.

(reference: EXAMPLE/pddrive3d.c:101: 3D grid -r × -c × -d, matrix
distributed over all ranks, pdgssvx3d.)

Run with virtual devices for local testing:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python examples/drive3d.py -r 2 -c 2 -d 2
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("matrix", nargs="?",
                   default="/root/reference/EXAMPLE/g20.rua")
    p.add_argument("-r", type=int, default=2)
    p.add_argument("-c", type=int, default=2)
    p.add_argument("-d", "--depth", type=int, default=2)
    p.add_argument("-b", "--block-size", type=int, default=32)
    args = p.parse_args()

    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.driver3d import gssvx3d
    from superlu_dist_tpu.parallel.grid import Grid3D
    from superlu_dist_tpu.utils.io import read_matrix
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.testing import inf_norm_error

    A = read_matrix(args.matrix)
    n = A.shape[0]
    # distributed-input path: chunks per rank, gathered by the driver
    nparts = args.r * args.c * args.depth
    A_loc = NRLocMatrix.from_global(A, nparts)

    rng = np.random.default_rng(0)
    xtrue = rng.standard_normal(n)
    b = np.asarray(A @ xtrue)

    grid = Grid3D(args.depth, args.r, args.c)
    res, lu = gssvx3d(A_loc.to_global(), b, grid,
                      Options(dtype="float32",
                              block_size=args.block_size))
    print(f"grid {grid}: err={inf_norm_error(res.x, xtrue):.3e} "
          f"berr={res.berr.max():.3e}")
    print(f"forest: top={int(res.stat.counters.get('anc_steps', -1))} "
          + " ".join(
              f"z{z}={int(res.stat.counters.get(f'layer{z}_steps', 0))}"
              for z in range(args.depth)))
    print(res.stat.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
