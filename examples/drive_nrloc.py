#!/usr/bin/env python
"""Row-distributed (NRformat_loc) input driver.

Analog of the reference's dcreate_matrix + pddrive flow (reference:
EXAMPLE/dcreate_matrix.c:1-235, EXAMPLE/pddrive.c:101-350): the matrix
arrives as block-row chunks — each "rank" owns m_loc consecutive rows —
and the distributed driver consumes them without ever forming global A
on more than one host.

Two modes:

* single process (default): the chunks are gathered host-side
  (dGatherNRformat_loc3d role) and solved on the available devices;
* multi process (launched with --spawn): each process passes ONLY its
  own chunk (``NRLocMatrix(..., local=True)``) — values are
  redistributed device-side straight into the block-cyclic pool
  (dReDistribute_A analog, reference: SRC/double/pddistribute.c:66-433)
  and global A values exist on process 0 alone.

Usage:
    python examples/drive_nrloc.py            # 1-process gather path
    python examples/drive_nrloc.py --spawn    # 2-process sharded path
"""

import argparse
import os
import socket
import subprocess
import sys

import numpy as np
import scipy.sparse as sp


def worker(pid: int, port: str):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    from superlu_dist_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.dist_driver import gssvx_dist
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)

    # THIS process's rows only — the true NRformat_loc convention
    Ar = sp.csr_matrix(A)
    half = n // 2
    lo, hi = (0, half) if pid == 0 else (half, n)
    A_loc = NRLocMatrix([(lo, Ar[lo:hi])], n, local=True)

    res, lu = gssvx_dist(A_loc, b, Grid2D(2, 4),
                         Options(dtype="float32", block_size=16))
    err = np.abs(res.x - xt).max() / np.abs(xt).max()
    print(f"[pid {pid}] err={err:.2e} berr={float(res.berr.max()):.2e}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spawn", action="store_true",
                    help="run the 2-process sharded-input path")
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.port)
        return

    if args.spawn:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid),
             "--port", str(port)]) for pid in range(2)]
        rc = [p.wait() for p in procs]
        sys.exit(max(rc))

    # single-process: full-coverage chunks, gathered host-side
    from superlu_dist_tpu import Options
    from superlu_dist_tpu.models.dist_driver import gssvx_dist
    from superlu_dist_tpu.parallel.grid import Grid2D
    from superlu_dist_tpu.utils.nrloc import NRLocMatrix
    from superlu_dist_tpu.utils.testing import laplacian_2d

    A = laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(n)
    b = np.asarray(A @ xt)
    nr = NRLocMatrix.from_global(A, nparts=4)
    import jax
    pr, pc = (2, 4) if len(jax.devices()) >= 8 else (1, 1)
    res, lu = gssvx_dist(nr, b, Grid2D(pr, pc),
                         Options(dtype="float32", block_size=16))
    err = np.abs(res.x - xt).max() / np.abs(xt).max()
    print(f"NRLoc gather path: err={err:.2e} "
          f"berr={float(res.berr.max()):.2e}")
    # scatter the solution back to the row owners (dScatter_B3d analog)
    chunks = nr.scatter_solution(res.x)
    print("chunk sizes:", [len(c) for c in chunks])


if __name__ == "__main__":
    main()
