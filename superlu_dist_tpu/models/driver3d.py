"""3D communication-avoiding expert driver (``pdgssvx3d`` analog).

Host preprocessing is identical to the 2D drivers (the reference also does
preprocessing on layer 0 and broadcasts, pdgssvx3d.c:628-959 — here the
host plays that role); the device phase partitions the elimination forest
over the z mesh axis (parallel/dist3d.py) so each layer factors its
subtrees independently, with one ancestor psum over 'z' replacing
per-step cross-layer communication.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from ..utils.options import Options
from ..utils.stats import Stats
from ..parallel import dist3d
from ..parallel.grid import Grid3D
from .driver import SparseLU, _real_base


class Distributed3DSparseLU(SparseLU):

    _planar = False   # distributed executors use native complex

    _fused_refine_ok = False
    _device_solve_ok = False
    """3D (z × r × c) distributed factorization."""

    def __init__(self, A: sp.spmatrix, grid: Grid3D,
                 options: Optional[Options] = None,
                 stat: Optional[Stats] = None):
        self.grid = grid
        super().__init__(A, options=options, stat=stat)

    def _device_factor(self, A3: sp.csc_matrix):
        opts, stat, plan = self.options, self.stat, self.plan
        g = self.grid
        with stat.phase("DIST"):
            self.dplan = dist3d.partition_plan3d(plan, g.npdep, g.nprow,
                                                 g.npcol)
            self.tapes = dist3d.make_dist3d_factor_tapes(self.dplan)
            self.stapes = dist3d.make_dist3d_solve_tapes(self.dplan)
            pools = dist3d.init_local_pools3d(plan, self.dplan, A3,
                                              self.dtype, g)
            self._factor_fn = dist3d.build_dist3d_factor_fn(
                plan, self.dplan, g, chunk=opts.gemm_chunk)
            stat.counters["anc_steps"] = float(
                np.sum(self.dplan.step_layer < 0))
            for z in range(g.npdep):
                stat.counters[f"layer{z}_steps"] = float(
                    np.sum(self.dplan.step_layer == z))

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
            self._solve_fns[nrhs] = dist3d.build_dist3d_solve_fn(
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
        raise NotImplementedError(
            "transpose solve is not supported by the distributed drivers "
            "yet; use the single-chip SparseLU for Trans.TRANS/CONJ")

    def rcond_1(self) -> float:
        raise NotImplementedError(
            "rcond_1 needs transpose solves, which the distributed drivers "
            "do not support yet")

    def diag_u(self) -> np.ndarray:
        pool = np.asarray(self.pool)   # (pz, pr, pc, n_local, B, B)
        plan, dplan = self.plan, self.dplan
        bs, nb = plan.bs, plan.nb
        out = np.empty(nb * bs, dtype=pool.dtype)
        for k in range(nb):
            s = plan.diag_slot[k]
            z = 0 if dplan.slot_is_anc[s] else int(dplan.step_layer[k])
            r, c = divmod(int(dplan.slot_rc[s]), dplan.pc)
            out[k * bs:(k + 1) * bs] = np.diag(
                pool[z, r, c, dplan.slot_local[s]])
        return out[self._diag_sel()]


def gssvx3d(A, b, grid: Grid3D, options: Optional[Options] = None):
    """3D one-call driver. Returns (SolveResult, Distributed3DSparseLU)."""
    from .driver import SolveResult
    from ..utils.options import IterRefine
    options = options or Options()
    stat = Stats()
    lu = Distributed3DSparseLU(A, grid, options=options, stat=stat)
    x = lu.solve(b)
    if options.iter_refine != IterRefine.NOREFINE:
        x, berr = lu.refine(b, x)
    else:
        xb = x[:, None] if x.ndim == 1 else x
        bb = np.asarray(b)
        bb = bb[:, None] if bb.ndim == 1 else bb
        berr, _ = lu._berr(xb, bb)
    return SolveResult(x=x, berr=np.atleast_1d(berr), stat=stat), lu
