"""Mesh-distributed expert driver (``pdgssvx`` on a real process grid).

Same host-side pipeline as :class:`SparseLU` (equilibrate → MC64 → column
ordering → block symbolic), but the device phase runs SPMD over a
``Grid2D`` mesh: the block pool is sharded block-cyclically, the
factorization broadcasts panels with masked psums over the mesh axes, and
the triangular solves psum per-level partial sums (see parallel/dist2d.py).

On multi-host TPU slices the same code runs unchanged: the Mesh spans all
slice devices and XLA lowers the psums to ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..utils.options import Options
from ..utils.stats import Stats
from ..parallel import dist2d
from ..parallel.grid import Grid2D
from .driver import SparseLU, _real_base


class DistributedSparseLU(SparseLU):

    _fused_refine_ok = False
    _embed_ok = False
    #: the distributed executors use native complex (CPU-mesh capable);
    #: planar recasting of the distributed path is not implemented yet
    _planar = False
    """2D block-cyclic distributed factorization (pdgssvx analog)."""

    def __init__(self, A: sp.spmatrix, grid: Grid2D,
                 options: Optional[Options] = None,
                 stat: Optional[Stats] = None):
        self.grid = grid
        super().__init__(A, options=options, stat=stat)

    # -- device phase overrides ----------------------------------------

    def _device_factor(self, A3: sp.csc_matrix):
        opts, stat, plan = self.options, self.stat, self.plan
        with stat.phase("DIST"):
            self.dplan = dist2d.partition_plan(plan, self.grid.nprow,
                                               self.grid.npcol)
            self.tapes = dist2d.make_dist_factor_tapes(self.dplan)
            self.stapes = dist2d.make_dist_solve_tapes(self.dplan)
            pools = dist2d.init_local_pools(plan, self.dplan, A3,
                                            self.dtype, self.grid)
            if (opts.dist_executor == "rdma"
                    and np.dtype(self.dtype) == np.float32):
                # fused one-kernel-per-device executor with remote-DMA
                # panel/inverse broadcasts (ICI puts on hardware;
                # interpret-simulated on the CPU mesh)
                import jax
                from ..parallel import dist2d_rdma
                interp = jax.devices()[0].platform != "tpu"
                self._factor_fn = dist2d_rdma.build_dist_factor_fn_rdma(
                    plan, self.dplan, self.grid, interpret=interp)
            else:
                self._factor_fn = dist2d.build_dist_factor_fn(
                    plan, self.dplan, self.grid, chunk=opts.gemm_chunk)
            stat.counters.update(self.dplan.comm_volume(
                np.dtype(self.dtype).itemsize))

        with stat.phase("FACT"):
            pools, linv, uinv, tiny = self._factor_fn(
                pools, jnp.asarray(self._thresh(),
                                   dtype=_real_base(self.dtype)),
                self.tapes)
            pools.block_until_ready()
        self.pool = pools
        self.linv = linv
        self.uinv = uinv
        stat.tiny_pivots += int(tiny)

    def _solve_fn(self, nrhs: int):
        if nrhs not in self._solve_fns:
            if (self.options.dist_executor == "rdma"
                    and np.dtype(self.dtype) == np.float32):
                import jax
                from ..parallel import dist2d_rdma
                interp = jax.devices()[0].platform != "tpu"
                self._solve_fns[nrhs] = \
                    dist2d_rdma.build_dist_solve_fn_rdma(
                        self.plan, self.dplan, self.grid, nrhs,
                        interpret=interp)
            else:
                self._solve_fns[nrhs] = dist2d.build_dist_solve_fn(
                    self.plan, self.dplan, self.grid, nrhs,
                    chunk=self.options.gemm_chunk)
        return self._solve_fns[nrhs]

    def _bpad_rows(self) -> int:
        return self.plan.nb * self.plan.bs

    def _solve_factored(self, bp: np.ndarray) -> np.ndarray:
        nrhs = bp.shape[1]
        return np.asarray(self._solve_fn(nrhs)(
            self.pool, self.linv, self.uinv, self.stapes,
            jnp.asarray(bp)))

    def solve_transposed(self, b, conj: bool = False) -> np.ndarray:
        """Aᵀ solves need distributed transpose tapes, which are not built
        for the mesh-sharded pool; the inherited single-device path would
        crash deep in the executor with a shape mismatch."""
        raise NotImplementedError(
            "transpose solve is not supported by the distributed drivers "
            "yet; use the single-chip SparseLU for Trans.TRANS/CONJ")

    def rcond_1(self) -> float:
        raise NotImplementedError(
            "rcond_1 needs transpose solves, which the distributed drivers "
            "do not support yet")

    def diag_u(self) -> np.ndarray:
        """Diagonal of U gathered from the distributed pool."""
        pool = np.asarray(self.pool)   # (pr, pc, n_local, B, B)
        plan, dplan = self.plan, self.dplan
        bs, nb = plan.bs, plan.nb
        out = np.empty(nb * bs, dtype=pool.dtype)
        for k in range(nb):
            s = plan.diag_slot[k]
            d = dplan.owner_dev[s]
            r, c = divmod(int(d), dplan.pc)
            blk = pool[r, c, dplan.local_slot[s]]
            out[k * bs:(k + 1) * bs] = np.diag(blk)
        return out[: self.n]


def gssvx_dist(A, b, grid: Grid2D, options: Optional[Options] = None):
    """Distributed one-call driver. Returns (SolveResult, DistributedSparseLU)."""
    from .driver import SolveResult
    from ..utils.options import IterRefine
    options = options or Options()
    stat = Stats()
    lu = DistributedSparseLU(A, grid, options=options, stat=stat)
    x = lu.solve(b)
    if options.iter_refine != IterRefine.NOREFINE:
        x, berr = lu.refine(b, x)
    else:
        xb = x[:, None] if x.ndim == 1 else x
        bb = np.asarray(b)
        bb = bb[:, None] if bb.ndim == 1 else bb
        berr, _ = lu._berr(xb, bb)
    return SolveResult(x=x, berr=np.atleast_1d(berr), stat=stat), lu
